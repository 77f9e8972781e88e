"""Integrity guards (the parity-checking analog)."""

import numpy as np
import pytest

from swtpu.bank import ScoreBank
from swtpu.config import SWConfig
from swtpu.oracle import score_many_vs_one
from swtpu.utils.guards import (
    IntegrityError,
    check_packed_query,
    check_packed_target,
    check_scores,
    checksum,
)


def test_valid_batch_passes():
    q = np.array([[0, 1, 2, 3, 5, 5]], np.int8)
    check_packed_query(q, np.array([4]))
    t = np.array([[3, 2, 4, 4]], np.int8)
    check_packed_target(t, np.array([2]))


def test_bad_code_detected():
    with pytest.raises(IntegrityError):
        check_packed_query(np.array([[0, 9]], np.int8))


def test_pad_inside_length_detected():
    with pytest.raises(IntegrityError):
        check_packed_target(np.array([[4, 1]], np.int8), np.array([2]))


def test_real_code_beyond_length_detected():
    with pytest.raises(IntegrityError):
        check_packed_target(np.array([[1, 1]], np.int8), np.array([1]))


def test_score_bound():
    check_scores(np.array([10]), [4], [8], match=5)  # bound 20
    with pytest.raises(IntegrityError):
        check_scores(np.array([25]), [4], [8], match=5)
    with pytest.raises(IntegrityError):
        check_scores(np.array([-1]), [4], [8], match=5)


def test_scorebank_with_integrity_on():
    rng = np.random.default_rng(0)
    targets = [rng.integers(0, 4, size=rng.integers(4, 90)).astype(np.int8) for _ in range(15)]
    query = rng.integers(0, 4, size=20).astype(np.int8)
    bank = ScoreBank(SWConfig(target_buckets=(32, 128)), backend="scan", verify_integrity=True)
    res = bank.score_database(query, targets)
    np.testing.assert_array_equal(res.scores, score_many_vs_one(query, targets))


def test_checksum_stable():
    a = np.arange(100, dtype=np.int32)
    assert checksum(a) == checksum(a.copy())
    b = a.copy(); b[3] += 1
    assert checksum(a) != checksum(b)


def test_corruption_injection_end_to_end():
    """parity_inject.c analog (pslse-master/test/tests/parity_inject.c):
    corruption injected between pack and dispatch (codes) or score and
    scatter (scores) must be rejected in situ by verify_integrity."""
    import pytest

    from swtpu.bank import ScoreBank
    from swtpu.config import SWConfig
    from swtpu.testing.faults import FaultConfig, score_database_with_faults
    from swtpu.utils.guards import IntegrityError

    rng = np.random.default_rng(3)
    targets = [
        rng.integers(0, 4, size=rng.integers(4, 40)).astype(np.int8)
        for _ in range(12)
    ]
    query = rng.integers(0, 4, size=16).astype(np.int8)
    bank = ScoreBank(
        SWConfig(target_buckets=(32, 64)), backend="scan",
        verify_integrity=True,
    )
    for kind in ("codes", "scores"):
        fc = FaultConfig(seed=7, corrupt_percent=100, corrupt_kind=kind)
        with pytest.raises(IntegrityError):
            score_database_with_faults(bank, query, targets, fc)
    # control: same pipeline, no corruption -> exact scores
    from swtpu.oracle import score_many_vs_one

    fc = FaultConfig(seed=7, corrupt_percent=0)
    scores, inj = score_database_with_faults(bank, query, targets, fc)
    np.testing.assert_array_equal(scores, score_many_vs_one(query, targets))
    assert inj.injected_corruptions == 0
