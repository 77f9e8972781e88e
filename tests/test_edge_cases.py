"""Edge-case parity: degenerate shapes and adversarial gap structures.

These are the cases where affine-gap implementations classically diverge
(the reference's own '!X!' debugging trail, SW_ProcessingElement_v0.3.v:142,
records exactly such divergence against swalign)."""

import numpy as np

from swtpu.config import Penalties
from swtpu.ops import sentinel_pad_batch, sw_scores_scan
from swtpu.oracle import sw_score_batch, sw_score_single


def _check(q, t, pen=None):
    pen = pen or Penalties()
    q = np.atleast_2d(np.asarray(q, np.int8))
    t = np.atleast_2d(np.asarray(t, np.int8))
    ql = np.array([q.shape[1]])
    tl = np.array([t.shape[1]])
    want = sw_score_batch(q, t, ql, tl, pen)
    qp, tp = sentinel_pad_batch(
        q, ql, t, tl, max(8, q.shape[1]), max(8, t.shape[1])
    )
    got = np.asarray(sw_scores_scan(qp, tp, pen))
    np.testing.assert_array_equal(got, want)
    return int(want[0])


def test_single_base_match():
    assert _check([2], [2]) == 5


def test_single_base_mismatch():
    assert _check([2], [3]) == 0  # clamped local score


def test_all_match():
    q = [0, 1, 2, 3] * 2
    assert _check(q, q) == 40


def test_all_mismatch_is_zero():
    assert _check([0] * 8, [1] * 8) == 0


def test_single_gap_vs_mismatch_tradeoff():
    # q = AAAAGAAAA vs t = AAAAAAAA: the gapped path (8 matches, 1-base gap
    # at open+extend = -16) scores 40-16=24; the ungapped path (7 matches +
    # 1 mismatch within an 8-long window) scores 35-4=31 and must win.
    q = [2, 2, 2, 2, 3, 2, 2, 2, 2]
    t = [2, 2, 2, 2, 2, 2, 2, 2]
    assert _check(q, t) == 31


def test_forced_gap_cost_is_open_plus_k_extend():
    # q = C*4 G*k C*4 vs t = C*8: G never matches/pairs profitably, so the
    # best gapped path is 8 matches minus a k-long gap: 40 - 12 - 4k; the
    # ungapped alternative is a single 4-match run (20).  Verified against
    # the scalar oracle too.
    for k in (1, 2, 5):
        q = [1, 1, 1, 1] + [3] * k + [1, 1, 1, 1]
        t = [1] * 8
        got = _check(q, t)
        assert got == sw_score_single(np.array(q), np.array(t))
        gapped = 40 - 12 - 4 * k
        mism = 40 - 9 * k  # k mismatches instead of a gap (only if k small)
        assert got == max(gapped, mism, 20)


def test_zero_penalty_gaps():
    pen = Penalties(match=1, mismatch=-1, gap_open=0, gap_extend=0)
    assert _check([2, 3, 2], [2, 2], pen) == 2  # free gaps: all matches count


def test_negative_scores_clamp_to_zero():
    pen = Penalties(match=1, mismatch=-10, gap_open=-10, gap_extend=-10)
    assert _check([0, 1], [2, 3], pen) == 0


def test_asymmetric_lengths():
    rng = np.random.default_rng(0)
    q = rng.integers(0, 4, size=3)
    t = rng.integers(0, 4, size=200)
    _check(q, t)
    _check(t, q)


def test_score_symmetry():
    # merged-I recurrence is symmetric in (q, t)
    rng = np.random.default_rng(1)
    for _ in range(5):
        q = rng.integers(0, 4, size=rng.integers(2, 40))
        t = rng.integers(0, 4, size=rng.integers(2, 40))
        assert sw_score_single(q, t) == sw_score_single(t, q)
