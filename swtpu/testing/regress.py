"""Multi-process regression driver — the regress.py of swtpu.

Launches N scoring workers as OS processes on localhost (the PSLSE-style
fake cluster, SURVEY.md §4), optionally injects process-level faults
(killing a worker mid-run, like PSLSE's randomized PAGED/disconnect tests),
detects the failure, and re-runs — demonstrating failure detection +
rerun-the-shard recovery (SURVEY.md §5 'failure detection').
"""

from __future__ import annotations

import dataclasses
import os
import signal
import socket
import subprocess
import sys
import tempfile
import time
from pathlib import Path
from typing import List, Optional

import numpy as np


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@dataclasses.dataclass
class MultihostResult:
    scores: np.ndarray
    top_s: np.ndarray
    top_ids: np.ndarray
    attempts: int
    killed_pids: List[int]
    bad_shards: List[int] = dataclasses.field(default_factory=list)
    resumed_shards: List[int] = dataclasses.field(default_factory=list)


def run_multihost(
    q: np.ndarray,
    t: np.ndarray,
    ids: np.ndarray,
    nprocs: int = 2,
    topk: int = 4,
    kill_worker: Optional[int] = None,
    kill_after_s: float = 1.0,
    max_attempts: int = 3,
    timeout_s: float = 300.0,
    adversary_worker: Optional[int] = None,
    adversary_mode: str = "corrupt",
    audit_rows: int = 4,
    mode: str = "pairs",
    lens: Optional[np.ndarray] = None,
    shard_bounds: Optional[List] = None,
    resume_dir: Optional[Path] = None,
) -> MultihostResult:
    """Score (q, t) across `nprocs` localhost processes; returns merged,
    cross-checked results.  If kill_worker is set, that worker is SIGKILLed
    on the first attempt and the whole job re-runs (shard-rerun recovery).

    mode 'pairs': q is [B, m], row i scores against t row i (the dense
    collective-topk path).  mode 'database': q is ONE 1-D query replicated
    against every t row (pad rows with T_PAD, pass `lens`) — each worker
    routes its shard through the PRODUCTION score_database_multihost stream
    path (flagship wavefront backend).

    If adversary_worker is set, that worker acts as a lying device (the
    PSLSE Test-AFU analog: fake hardware that misbehaves,
    pslse-master/test/afu/AFU.cpp) on EVERY attempt; the driver must catch
    it — via the checksum cross-check (guards.checksum, the odd-parity
    analog), the algebraic score-bound check, or an independent oracle
    audit of `audit_rows` sample rows per shard — and recover by re-scoring
    the bad shard itself (shard-rerun recovery, SURVEY.md §5).

    shard_bounds: optional explicit [(lo, hi), ...] per process for RAGGED
    shard sizes (database mode; the stream path auto-negotiates the
    cross-host geometry).  Default: equal split.

    resume_dir: persistent directory for per-shard completion CURSORS (the
    WED status/progress fields made durable, aligner_Header.h:28-49;
    database mode only).  Each worker writes `shard_<pid>.npz` atomically
    the moment its scores exist; a rerun (this attempt loop, or a whole
    new driver run over the same directory) loads valid cursors from disk,
    launches workers ONLY for unfinished shards (a smaller collective
    world), and merges host-side — finished shards are never re-scored.
    The merged top-K is recomputed by the driver with the canonical
    (score desc, id asc) order, identical to the collective merge."""
    B = t.shape[0]
    if shard_bounds is None:
        assert B % nprocs == 0
    else:
        assert len(shard_bounds) == nprocs and shard_bounds[-1][1] == B
    job_fp = None
    if resume_dir is not None:
        assert mode == "database", "cursors are database-mode job state"
        resume_dir = Path(resume_dir)
        resume_dir.mkdir(parents=True, exist_ok=True)
        if shard_bounds is None:
            step = B // nprocs
            shard_bounds = [(p * step, (p + 1) * step) for p in range(nprocs)]
        # job fingerprint: a cursor from a DIFFERENT job (stale resume_dir)
        # must never merge — its rows could be out of range or its scores
        # belong to another database
        import zlib

        job_fp = zlib.crc32(
            np.ascontiguousarray(q).tobytes()
            + np.ascontiguousarray(t).tobytes()
            + np.ascontiguousarray(ids).tobytes()
        ) & 0x7FFFFFFF
    if lens is None:
        lens = np.full(B, t.shape[1], np.int32)
    # audit view: in database mode every row pairs the one query (tiled;
    # sentinel pads never change a score, so padded audits stay exact)
    q2d = np.tile(np.asarray(q)[None, :], (B, 1)) if mode == "database" else q
    killed: List[int] = []
    resumed: List[int] = []
    for attempt in range(1, max_attempts + 1):
        with tempfile.TemporaryDirectory(prefix="swtpu_mh_") as td:
            tdp = Path(td)
            inp = tdp / "input.npz"
            np.savez(inp, q=q, t=t, ids=ids, mode=mode, lens=lens)
            port = _free_port()
            procs = []
            env = dict(os.environ)
            env["JAX_PLATFORMS"] = "cpu"
            env["JAX_PLATFORM_NAME"] = "cpu"
            env.pop("XLA_FLAGS", None)
            cursors = {}
            if resume_dir is not None:
                cursors = _load_cursors(resume_dir, nprocs, job_fp, B)
                resumed = sorted(cursors)
            launch = [p for p in range(nprocs) if p not in cursors]
            world = len(launch)
            for rank, pid in enumerate(launch):
                out = tdp / f"out_{pid}.npz"
                cmd = [
                    sys.executable, "-m", "swtpu.testing.worker",
                    "--coordinator", f"127.0.0.1:{port}",
                    "--nprocs", str(world), "--pid", str(rank),
                    "--input", str(inp), "--output", str(out),
                    "--topk", str(topk),
                ]
                if adversary_worker == pid:
                    cmd += ["--adversary", adversary_mode]
                if shard_bounds is not None:
                    cmd += ["--lo", str(shard_bounds[pid][0]),
                            "--hi", str(shard_bounds[pid][1])]
                if resume_dir is not None:
                    cmd += ["--cursor", str(resume_dir / f"shard_{pid}.npz"),
                            "--cursor-fp", str(job_fp)]
                procs.append(subprocess.Popen(cmd, env=env, cwd=str(Path(__file__).parents[2])))
            # kill the named SHARD's process (launch order shifts when
            # resumed shards skip launching); a resumed shard can't be killed
            do_kill = (
                kill_worker is not None and attempt == 1
                and kill_worker in launch
            )
            if do_kill:
                time.sleep(kill_after_s)
                procs[launch.index(kill_worker)].send_signal(signal.SIGKILL)
                killed.append(kill_worker)
            deadline = time.time() + timeout_s
            rcs = [None] * len(procs)
            while time.time() < deadline and any(r is None for r in rcs):
                for i, p in enumerate(procs):
                    rcs[i] = p.poll()
                time.sleep(0.2)
            for p in procs:
                if p.poll() is None:
                    p.kill()
            if any(rc != 0 for rc in rcs):
                continue  # failure detected -> rerun
            # merge + cross-check (cursors count as delivered shards)
            scores = np.zeros((B,), np.int32)
            top_s = top_ids = None
            ok = True
            shard_rows_of = {}
            for pid, d in cursors.items():
                scores[d["local_rows"]] = d["local_scores"]
                shard_rows_of[pid] = (d["local_rows"], d)
            for pid in range(nprocs):
                if pid in cursors:
                    continue
                f = tdp / f"out_{pid}.npz"
                if not f.exists():
                    ok = False
                    break
                d = np.load(f)
                scores[d["local_rows"]] = d["local_scores"]
                shard_rows_of[pid] = (d["local_rows"], d)
                if top_s is None:
                    top_s, top_ids = d["top_s"], d["top_ids"]
                else:
                    if not (np.array_equal(top_s, d["top_s"]) and np.array_equal(top_ids, d["top_ids"])):
                        raise AssertionError("workers disagree on merged top-K")
            if not ok:
                continue
            if resume_dir is not None:
                # resumed shards never joined this attempt's collective:
                # the driver owns the merge — canonical (score desc, id
                # asc), identical to _merge_topk's order
                order = np.lexsort((ids, -scores))[:topk]
                top_s = scores[order].astype(np.int32)
                top_ids = ids[order].astype(np.int32)
            # device-boundary integrity pass (the parity/check_errors
            # analog): checksum, score bounds, then an independent oracle
            # audit of a few rows per shard — catches a shard whose
            # *device* lies even when every process exits 0
            bad = _find_bad_shards(q2d, t, shard_rows_of, audit_rows)
            if bad:
                # shard-rerun recovery: re-score ONLY the bad shards with
                # the host kernel and rebuild the merged top-K
                from swtpu.ops.scan import sw_scores_scan

                for pid in bad:
                    rows = shard_rows_of[pid][0]
                    scores[rows] = np.asarray(sw_scores_scan(q2d[rows], t[rows]))
                # (score desc, id asc) — the same tie order as the
                # collective merge (_merge_topk) and ScoreResult.top_k
                order = np.lexsort((ids, -scores))[: len(top_s)]
                top_s = scores[order].astype(top_s.dtype)
                top_ids = ids[order].astype(top_ids.dtype)
            return MultihostResult(
                scores, top_s, top_ids, attempt, killed, list(bad),
                resumed_shards=resumed,
            )
    raise RuntimeError(f"multihost job failed after {max_attempts} attempts")


def _load_cursors(resume_dir: Path, nprocs: int, job_fp: int, B: int) -> dict:
    """Valid per-shard completion cursors on disk: {pid: npz dict}.  A
    cursor whose checksum fails (torn write), whose job fingerprint does
    not match (stale resume_dir from a different job), or whose rows fall
    outside this job's batch is discarded and its shard re-scores."""
    from swtpu.utils.guards import checksum

    out = {}
    for pid in range(nprocs):
        f = resume_dir / f"shard_{pid}.npz"
        if not f.exists():
            continue
        try:
            d = dict(np.load(f))
        except Exception:
            continue
        if not {"local_rows", "local_scores", "checksum"} <= set(d):
            continue
        if int(d["checksum"]) != checksum(np.asarray(d["local_scores"])):
            continue
        if "job_fp" in d and int(d["job_fp"]) != job_fp:
            continue
        rows = np.asarray(d["local_rows"])
        if rows.size and (rows.min() < 0 or rows.max() >= B):
            continue
        out[pid] = d
    return out


def _find_bad_shards(q, t, shard_rows_of, audit_rows: int) -> List[int]:
    """Integrity checks per shard: (1) guards.checksum of the delivered
    score payload vs the worker's checksum (wire corruption); (2) algebraic
    score bounds (guards.check_scores); (3) oracle audit — re-score
    `audit_rows` evenly-spaced rows with the independent numpy oracle."""
    from swtpu.oracle import sw_score_single
    from swtpu.utils.guards import IntegrityError, check_scores, checksum

    bad: List[int] = []
    for pid, (rows, d) in sorted(shard_rows_of.items()):
        s = d["local_scores"]
        if "checksum" in d and int(d["checksum"]) != checksum(np.asarray(s)):
            bad.append(pid)
            continue
        try:
            check_scores(
                s, np.full(len(rows), q.shape[1]), np.full(len(rows), t.shape[1]),
                match=5,
            )
        except IntegrityError:
            bad.append(pid)
            continue
        n = len(rows)
        sample = np.unique(np.linspace(0, n - 1, min(audit_rows, n)).astype(int))
        for k in sample:
            r = int(rows[k])
            if int(s[k]) != sw_score_single(q[r], t[r]):
                bad.append(pid)
                break
    return bad
