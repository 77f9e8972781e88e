"""Resumable scoring jobs — persistent work-queue semantics.

The reference's WED (work element descriptor) is a restartable job record
with status/progress fields and a chain pointer
(capi_sample_aligner/software-C,C++/include/aligner_Header.h:28-49); the
host polls it and the AFU updates it.  swtpu's equivalent for a long
database scan: a job state file holding an input fingerprint, the per-batch
completion bitmap, and partial scores, written atomically after every batch
— a rerun picks up at the first unfinished batch (SURVEY.md §5
'checkpoint/resume': resumable sharded scan, not model checkpoints).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from pathlib import Path
from typing import Sequence, Union

import numpy as np

from swtpu.bank.packer import pack_many_vs_one
from swtpu.bank.scorebank import ScoreBank, ScoreResult

STATE_VERSION = 1


def _fingerprint(query: np.ndarray, targets: Sequence[np.ndarray], config) -> str:
    h = hashlib.sha256()
    h.update(np.asarray(query, np.int8).tobytes())
    h.update(np.int64(len(targets)).tobytes())
    for t in targets:
        h.update(np.int64(len(t)).tobytes())
        h.update(np.asarray(t, np.int8).tobytes())
    h.update(json.dumps([config.penalties.astuple(), list(config.target_buckets)]).encode())
    return h.hexdigest()[:32]


def score_database_resumable(
    bank: ScoreBank,
    query: np.ndarray,
    targets: Sequence[np.ndarray],
    state_path: Union[str, Path],
) -> ScoreResult:
    """Like ScoreBank.score_database, but persists progress after each
    batch.  If `state_path` already holds a matching job, completed batches
    are skipped."""
    state_path = Path(state_path)
    cfg = bank.config
    fp = _fingerprint(query, targets, cfg)
    t0 = time.perf_counter()
    batches = pack_many_vs_one(
        query, targets, bucket_lens=cfg.target_buckets,
        q_width=max(8, -(-len(query) // 8) * 8),
    )
    n_batches = len(batches)

    scores = np.zeros((len(targets),), dtype=np.int32)
    done = np.zeros((n_batches,), dtype=bool)
    if state_path.exists():
        st = np.load(state_path, allow_pickle=False)
        if (
            st["version"] == STATE_VERSION
            and st["fingerprint"] == fp
            and st["n_batches"] == n_batches
        ):
            scores = st["scores"].copy()
            done = st["done"].copy()

    cells = padded = 0
    for bi, batch in enumerate(batches):
        cells += batch.cells
        padded += batch.padded_cells
        if done[bi]:
            continue
        s = bank._score_batch(batch.q, batch.t)
        live = batch.ids >= 0
        scores[batch.ids[live]] = s[live]
        done[bi] = True
        tmp = state_path.with_suffix(".tmp.npz")
        np.savez(
            tmp, version=STATE_VERSION, fingerprint=fp,
            n_batches=n_batches, scores=scores, done=done,
        )
        os.replace(tmp, state_path)
    return ScoreResult(scores, cells, padded, time.perf_counter() - t0)
