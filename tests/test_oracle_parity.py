"""Oracle parity against the reference repo's bundled goldens.

This is the contract test from SURVEY.md §7 step 1: the numpy oracle must
reproduce, bit-exactly, the triple-agreeing golden chain
RTL == swalign == ssearch36 on every bundled dataset.
"""

import pytest

from swtpu.io import encode_seq, read_query_and_db, read_fasta
from swtpu.oracle import score_many_vs_one, sw_score_single
from swtpu.testing import (
    REFERENCE_DATA_DIR,
    parse_rtl_out_file,
    parse_ssearch_scores,
    reference_data_available,
)

pytestmark = pytest.mark.skipif(
    not reference_data_available(), reason="reference data dir not mounted"
)

# (database fasta, query fasta, RTL golden)
RTL_CASES = [
    ("data1.fa", "query1.fa", "data1.fa_query1.fa_out.txt"),
    ("data10.fa", "query1.fa", "data10.fa_query1.fa_out.txt"),
    ("data10.fa", "query100.fa", "data10.fa_query100.fa_out.txt"),
    ("data20.fa", "query100.fa", "data20.fa_query100.fa_out.txt"),
    ("data40.fa", "query100.fa", "data40.fa_query100.fa_out.txt"),
    ("data60.fa", "query100.fa", "data60.fa_query100.fa_out.txt"),
    ("data100.fa", "query100.fa", "data100.fa_query100.fa_out.txt"),
    ("data500.fa", "query100.fa", "data500.fa_query100.fa_out.txt"),
]

SSEARCH_CASES = [
    ("data100.fa", "query100.fa", "score.txt"),
    ("data500.fa", "query100.fa", "score500.txt"),
]


def _load_pairs(db_file: str, query_file: str):
    qrecs = read_fasta(REFERENCE_DATA_DIR / query_file)
    assert len(qrecs) >= 1
    query = encode_seq(qrecs[0].seq)
    _, db = read_query_and_db(REFERENCE_DATA_DIR / db_file)
    names = [r.name for r in db]
    targets = [encode_seq(r.seq) for r in db]
    return query, names, targets


@pytest.mark.parametrize("db_file,query_file,golden", RTL_CASES)
def test_rtl_golden_parity(db_file, query_file, golden):
    query, names, targets = _load_pairs(db_file, query_file)
    golden_scores = parse_rtl_out_file(REFERENCE_DATA_DIR / golden)
    assert golden_scores, f"no scores parsed from {golden}"
    scores = score_many_vs_one(query, targets)
    by_name = dict(zip(names, scores))
    mismatches = {
        n: (int(by_name[n]), g)
        for n, g in golden_scores.items()
        if n in by_name and int(by_name[n]) != g
    }
    assert not mismatches, f"{golden}: oracle != RTL golden: {mismatches}"
    # every golden ID must exist in the FASTA
    missing = [n for n in golden_scores if n not in by_name]
    assert not missing, f"{golden}: IDs missing from FASTA: {missing}"


@pytest.mark.parametrize("db_file,query_file,golden", SSEARCH_CASES)
def test_ssearch_golden_parity(db_file, query_file, golden):
    query, names, targets = _load_pairs(db_file, query_file)
    golden_scores = parse_ssearch_scores(REFERENCE_DATA_DIR / golden)
    assert golden_scores, f"no scores parsed from {golden}"
    scores = score_many_vs_one(query, targets)
    by_name = dict(zip(names, scores))
    mismatches = {
        n: (int(by_name[n]), g)
        for n, g in golden_scores.items()
        if n in by_name and int(by_name[n]) != g
    }
    assert not mismatches, f"{golden}: oracle != ssearch36: {mismatches}"


def test_single_matches_batch():
    query, _, targets = _load_pairs("data1.fa", "query1.fa")
    batch = score_many_vs_one(query, targets[:5])
    for k in range(5):
        assert sw_score_single(query, targets[k]) == int(batch[k])


def test_self_alignment_is_perfect():
    # query vs itself = match * len (the fasta36 'res' file shows 160 for
    # the 32nt query: 32 * 5 = 160, data/res best-scores table).
    qrecs = read_fasta(REFERENCE_DATA_DIR / "query1.fa")
    q = encode_seq(qrecs[0].seq)
    assert sw_score_single(q, q) == 5 * len(q)
