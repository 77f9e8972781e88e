"""Checkpoint/resume job state + observability utilities."""

import numpy as np

from swtpu.bank import ScoreBank
from swtpu.bank.resume import score_database_resumable
from swtpu.config import SWConfig
from swtpu.oracle import score_many_vs_one
from swtpu.utils import BatchEvent, EventLog, GcupsMeter


def _workload(rng, n=25):
    targets = [
        rng.integers(0, 4, size=rng.integers(5, 250)).astype(np.int8)
        for _ in range(n)
    ]
    query = rng.integers(0, 4, size=20).astype(np.int8)
    return query, targets


def test_resumable_scoring_completes_and_resumes(tmp_path):
    rng = np.random.default_rng(0)
    query, targets = _workload(rng)
    want = score_many_vs_one(query, targets)
    bank = ScoreBank(SWConfig(target_buckets=(32, 128, 256)), backend="scan")
    state = tmp_path / "job.npz"

    res = score_database_resumable(bank, query, targets, state)
    np.testing.assert_array_equal(res.scores, want)
    assert state.exists()

    # resume with a poisoned backend: no batch may re-execute
    calls = {"n": 0}

    def poisoned(q, t, pen):
        calls["n"] += 1
        raise AssertionError("batch re-executed after completion")

    bank2 = ScoreBank(SWConfig(target_buckets=(32, 128, 256)), backend=poisoned)
    res2 = score_database_resumable(bank2, query, targets, state)
    np.testing.assert_array_equal(res2.scores, want)
    assert calls["n"] == 0


def test_resume_partial(tmp_path):
    rng = np.random.default_rng(1)
    query, targets = _workload(rng)
    want = score_many_vs_one(query, targets)
    state = tmp_path / "job.npz"

    # backend that dies after the first batch
    from swtpu.ops.scan import sw_scores_scan

    calls = {"n": 0}

    def flaky(q, t, pen):
        calls["n"] += 1
        if calls["n"] > 1:
            raise RuntimeError("simulated crash")
        return np.asarray(sw_scores_scan(q, t, pen))

    bank = ScoreBank(SWConfig(target_buckets=(32, 128, 256)), backend=flaky)
    try:
        score_database_resumable(bank, query, targets, state)
    except RuntimeError:
        pass
    assert state.exists()

    bank2 = ScoreBank(SWConfig(target_buckets=(32, 128, 256)), backend="scan")
    res = score_database_resumable(bank2, query, targets, state)
    np.testing.assert_array_equal(res.scores, want)


def test_event_log_roundtrip(tmp_path):
    path = tmp_path / "events.jsonl"
    log = EventLog(path)
    log.emit(BatchEvent("batch", 0.0, 0.5, reads=10, cells=1000, padded_cells=2000))
    log.emit(BatchEvent("job", 1.0, 2.0, reads=100, cells=99999, padded_cells=120000, note="done"))
    log.close()
    back = EventLog.parse(path)
    assert len(back) == 2
    assert back[0].cells == 1000
    assert abs(back[0].gcups - 1000 / 0.5 / 1e9) < 1e-12
    assert back[1].note == "done"


def test_gcups_meter_counts_real_cells():
    m = GcupsMeter()
    with m.batch(cells=1000, padded_cells=4000, reads=10):
        pass
    assert m.cells == 1000
    assert m.pad_efficiency == 0.25
    assert m.reads == 10


# ------------------- stream-backend resume (round 4: flagship-speed WED) --


def test_resume_stream_backend_completes(tmp_path):
    rng = np.random.default_rng(5)
    query, targets = _workload(rng, n=21)
    targets = [t[:90] for t in targets]  # stay on the single-tile path
    want = score_many_vs_one(query, targets)
    bank = ScoreBank(SWConfig(), backend="stream", interpret=True)
    state = tmp_path / "job.npz"
    res = score_database_resumable(bank, query, targets, state, chunk_reads=8)
    np.testing.assert_array_equal(res.scores, want)
    assert res.cells == len(query) * sum(len(t) for t in targets)

    # rerun skips every chunk: stub the kernel so any re-dispatch explodes
    import swtpu.ops.pallas_stream as ps_mod

    real = ps_mod.sw_scores_stream

    def poisoned(*a, **kw):
        raise AssertionError("stream chunk re-executed after completion")

    ps_mod.sw_scores_stream = poisoned
    try:
        res2 = score_database_resumable(
            bank, query, targets, state, chunk_reads=8
        )
    finally:
        ps_mod.sw_scores_stream = real
    np.testing.assert_array_equal(res2.scores, want)
    assert res2.cells == res.cells  # skipped chunks still accounted


def test_resume_stream_interrupt_midjob(tmp_path):
    """Kill the job after the first chunk; the rerun completes bit-exactly
    and never re-scores the finished chunk (the WED restart semantics,
    aligner_Header.h:28-49) — all at the stream backend, not a column-path
    downgrade."""
    import swtpu.ops.pallas_stream as ps_mod

    rng = np.random.default_rng(6)
    query, targets = _workload(rng, n=20)
    targets = [t[:90] for t in targets]
    want = score_many_vs_one(query, targets)
    state = tmp_path / "job.npz"
    bank = ScoreBank(SWConfig(), backend="stream", interpret=True)

    real = ps_mod.sw_scores_stream
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] > 1:
            raise RuntimeError("simulated mid-job kill")
        return real(*a, **kw)

    ps_mod.sw_scores_stream = flaky
    try:
        score_database_resumable(bank, query, targets, state, chunk_reads=8)
        raise AssertionError("expected simulated crash")
    except RuntimeError:
        pass
    finally:
        ps_mod.sw_scores_stream = real
    assert state.exists()

    second = {"n": 0}

    def counting(*a, **kw):
        second["n"] += 1
        return real(*a, **kw)

    ps_mod.sw_scores_stream = counting
    try:
        res = score_database_resumable(
            bank, query, targets, state, chunk_reads=8
        )
    finally:
        ps_mod.sw_scores_stream = real
    np.testing.assert_array_equal(res.scores, want)
    # 20 reads / 8 per chunk = 3 chunks; chunk 0 done -> only 2 re-run
    assert second["n"] == 2


def test_resume_stream_fingerprint_mismatch(tmp_path):
    """A state file from a DIFFERENT job must be ignored, not adopted."""
    rng = np.random.default_rng(7)
    query, targets = _workload(rng, n=12)
    targets = [t[:90] for t in targets]
    state = tmp_path / "job.npz"
    bank = ScoreBank(SWConfig(), backend="stream", interpret=True)
    score_database_resumable(bank, query, targets, state, chunk_reads=8)

    query2 = rng.integers(0, 4, size=20).astype(np.int8)
    want2 = score_many_vs_one(query2, targets)
    res = score_database_resumable(bank, query2, targets, state, chunk_reads=8)
    np.testing.assert_array_equal(res.scores, want2)


def test_resume_stream_dense_form(tmp_path):
    """EncodedDB/dense databases resume through the same chunker."""
    rng = np.random.default_rng(8)
    query = rng.integers(0, 4, size=20).astype(np.int8)
    mat = rng.integers(0, 4, size=(19, 40)).astype(np.int8)
    lens = rng.integers(5, 41, size=19).astype(np.int32)
    targets = [mat[i, : lens[i]] for i in range(19)]
    want = score_many_vs_one(query, targets)
    bank = ScoreBank(SWConfig(), backend="stream", interpret=True)
    state = tmp_path / "job.npz"
    res = score_database_resumable(
        bank, query, (mat, lens), state, chunk_reads=8
    )
    np.testing.assert_array_equal(res.scores, want)


def test_resume_state_invalidated_by_score_width(tmp_path):
    """Round-4 review fix: a state file from an EXACT run must not be
    adopted by a wrap-parity run (score_width is part of the job
    fingerprint) — resumed biased jobs re-score, never inherit exact
    scores."""
    from swtpu.oracle import sw_score_single_biased

    rng = np.random.default_rng(9)
    query = np.tile(np.arange(4, dtype=np.int8), 10)  # 40 nt
    targets = [query.copy(), rng.integers(0, 4, size=30).astype(np.int8)]
    # identical 40nt pair scores 200 exactly; at W=7 it wraps
    state = tmp_path / "job.npz"
    bank = ScoreBank(SWConfig(), backend="stream", interpret=True)
    r1 = score_database_resumable(bank, query, targets, state, chunk_reads=8)
    assert r1.scores[0] == 200

    bank_b = ScoreBank(
        SWConfig(score_width=7), backend="stream", interpret=True
    )
    want = np.array(
        [sw_score_single_biased(query, t, score_width=7) for t in targets],
        np.int32,
    )
    assert want[0] != 200
    r2 = score_database_resumable(bank_b, query, targets, state, chunk_reads=8)
    np.testing.assert_array_equal(r2.scores, want)


def test_resume_stream_padded_accounting_on_rerun(tmp_path):
    """A fully-resumed run reports the same padded_cells as the original
    (per-chunk padded counts persist in the state file)."""
    rng = np.random.default_rng(10)
    query, targets = _workload(rng, n=20)
    targets = [t[:90] for t in targets]
    state = tmp_path / "job.npz"
    bank = ScoreBank(SWConfig(), backend="stream", interpret=True)
    r1 = score_database_resumable(bank, query, targets, state, chunk_reads=8)
    r2 = score_database_resumable(bank, query, targets, state, chunk_reads=8)
    assert r1.padded_cells > 0
    assert r2.padded_cells == r1.padded_cells
    assert r2.cells == r1.cells
