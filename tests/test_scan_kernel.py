"""lax.scan kernel == numpy oracle, on reference data and random batches."""

import numpy as np
import pytest

from swtpu.config import Penalties
from swtpu.io import encode_seq, read_fasta, read_query_and_db
from swtpu.ops import Q_PAD, T_PAD, sentinel_pad_batch, sw_scores_scan
from swtpu.oracle import score_many_vs_one, sw_score_batch
from swtpu.testing import REFERENCE_DATA_DIR, reference_data_available


def _random_ragged(rng, B, m_max, n_max):
    q_lens = rng.integers(1, m_max + 1, size=B)
    t_lens = rng.integers(1, n_max + 1, size=B)
    q = rng.integers(0, 4, size=(B, m_max)).astype(np.int8)
    t = rng.integers(0, 4, size=(B, n_max)).astype(np.int8)
    return q, q_lens, t, t_lens


@pytest.mark.parametrize("B,m,n,seed", [(8, 16, 16, 0), (32, 33, 47, 1), (16, 128, 128, 2)])
def test_scan_matches_oracle_random(B, m, n, seed):
    rng = np.random.default_rng(seed)
    q, q_lens, t, t_lens = _random_ragged(rng, B, m, n)
    want = sw_score_batch(q, t, q_lens, t_lens)
    qp, tp = sentinel_pad_batch(q, q_lens, t, t_lens)
    got = np.asarray(sw_scores_scan(qp, tp))
    np.testing.assert_array_equal(got, want)


def test_scan_custom_penalties():
    rng = np.random.default_rng(3)
    q, q_lens, t, t_lens = _random_ragged(rng, 16, 40, 60)
    pen = Penalties(match=3, mismatch=-2, gap_open=-5, gap_extend=-1)
    want = sw_score_batch(q, t, q_lens, t_lens, pen)
    qp, tp = sentinel_pad_batch(q, q_lens, t, t_lens)
    got = np.asarray(sw_scores_scan(qp, tp, pen))
    np.testing.assert_array_equal(got, want)


def test_sentinel_contract_padding_never_scores():
    # all-pad target vs real query must score 0
    q = np.full((2, 8), Q_PAD, np.int8)
    q[:, :4] = [[0, 1, 2, 3], [3, 2, 1, 0]]
    t = np.full((2, 8), T_PAD, np.int8)
    got = np.asarray(sw_scores_scan(q, t))
    np.testing.assert_array_equal(got, [0, 0])


@pytest.mark.skipif(not reference_data_available(), reason="no reference data")
def test_scan_matches_oracle_on_reference_sets():
    for db_file, query_file in [("data1.fa", "query1.fa"), ("data100.fa", "query100.fa")]:
        qrec = read_fasta(REFERENCE_DATA_DIR / query_file)[0]
        _, db = read_query_and_db(REFERENCE_DATA_DIR / db_file)
        query = encode_seq(qrec.seq)
        targets = [encode_seq(r.seq) for r in db]
        want = score_many_vs_one(query, targets)

        B = len(targets)
        n_max = max(len(x) for x in targets)
        t = np.zeros((B, n_max), np.int8)
        t_lens = np.zeros((B,), np.int32)
        for k, x in enumerate(targets):
            t[k, : len(x)] = x
            t_lens[k] = len(x)
        qb = np.tile(query[None, :], (B, 1)).astype(np.int8)
        q_lens = np.full((B,), len(query), np.int32)
        qp, tp = sentinel_pad_batch(qb, q_lens, t, t_lens)
        got = np.asarray(sw_scores_scan(qp, tp))
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("m,n", [(256, 64), (512, 40)])
def test_scan_long_queries(m, n):
    # query length scales freely (the reference's chaining-ports intent,
    # ScoreBank/ScoringModule_v1.1.v:36-54); 12-bit LEN_WIDTH implied 4095
    rng = np.random.default_rng(m)
    q, q_lens, t, t_lens = _random_ragged(rng, 4, m, n)
    want = sw_score_batch(q, t, q_lens, t_lens)
    qp, tp = sentinel_pad_batch(q, q_lens, t, t_lens)
    got = np.asarray(sw_scores_scan(qp, tp))
    np.testing.assert_array_equal(got, want)
