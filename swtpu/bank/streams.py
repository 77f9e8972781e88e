"""Host-side packing for the streamed wavefront kernel.

The reference's feeders stage targets and shift them into the PE array
back-to-back, pairing completions with IDs via per-toggle FIFOs
(ScoreBank/SM_Feeder2.v); the bank's priority encoder picks the first
feeder with room (ScoreBank/PrioEncoder.v:16-22).  Here: each of S streams
is one feeder lane; reads are assigned greedily to the currently-shortest
stream (the load-balancing the priority encoder approximates), concatenated
with a first-char flag, and every read's score-emission coordinate
(stream, step) is computed up front — the ID-FIFO pairing made static.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import numpy as np

from swtpu.ops.common import Q_PAD

STREAM_PAD = 4  # drain/pad char (never matches; no flag)
FLAG = 8
LANES = 128
DRAIN = LANES - 1


@dataclasses.dataclass
class StreamBatch:
    """Packed streams + emission map.

    q: [N, 128//segments] int8 per-stream query (replicated, sentinel-padded).
    stream: [N, T] int8 flagged char streams, T % STEP_CHUNK == 0.
    emit_stream / emit_step: [n_reads] gather coordinates into the strip.
    cells: real DP cells (query_len * sum target lens).
    segments: queries per lane column the batch was packed for.
    """

    q: np.ndarray
    stream: np.ndarray
    emit_stream: np.ndarray
    emit_step: np.ndarray
    cells: int
    segments: int = 1

    @property
    def total_steps(self) -> int:
        return self.stream.shape[0] * self.stream.shape[1]


def pack_streams(
    query: np.ndarray,
    targets: Sequence[np.ndarray],
    n_streams: int = 256,
    segments: int = 1,
) -> StreamBatch:
    """Assign reads to streams (greedy shortest-stream), concatenate with
    flags, compute emission coordinates.

    segments: queries per lane column in the kernel (1/2/4).  Short queries
    (<= 128//segments bases) at segments=4 quadruple wavefront utilization."""
    qcap = LANES // segments
    drain = qcap - 1
    if len(query) > qcap:
        raise ValueError(
            f"query of {len(query)} bases exceeds capacity {qcap} at "
            f"segments={segments}"
        )
    n_reads = len(targets)
    S = n_streams
    # Fast path: equal-length reads, count divisible by S.  Greedy
    # shortest-stream degenerates to round-robin there, so this produces the
    # identical packing without the per-read Python loop (matters at the
    # multi-100k-read batches the benches use).
    if n_reads and n_reads % S == 0:
        tmat = targets if isinstance(targets, np.ndarray) else None
        if tmat is None and all(
            isinstance(t, np.ndarray) and t.ndim == 1 and len(t) == len(targets[0])
            for t in targets[: min(n_reads, 64)]
        ):
            lens = {len(t) for t in targets}
            if len(lens) == 1:
                tmat = np.stack(targets)
        if tmat is not None and tmat.ndim == 2:
            return _pack_streams_equal(query, tmat.astype(np.int8), S, segments)
    chunks: List[List[np.ndarray]] = [[] for _ in range(S)]
    fill = np.zeros(S, dtype=np.int64)
    emit_stream = np.zeros(n_reads, dtype=np.int32)
    emit_step = np.zeros(n_reads, dtype=np.int64)
    cells = 0
    for r, t in enumerate(targets):
        t = np.asarray(t, dtype=np.int8)
        if len(t) == 0:
            emit_stream[r] = 0
            emit_step[r] = -1  # zero-length read: score 0 by definition
            continue
        s = int(np.argmin(fill))
        flagged = t.copy()
        flagged[0] |= FLAG
        chunks[s].append(flagged)
        emit_stream[r] = s
        emit_step[r] = fill[s] + len(t) - 1 + drain
        fill[s] += len(t)
        cells += len(query) * len(t)

    from swtpu.ops.pallas_stream import STEP_CHUNK

    T = int(fill.max()) + drain if n_reads else STEP_CHUNK
    T = -(-T // STEP_CHUNK) * STEP_CHUNK
    stream = np.full((S, T), STREAM_PAD, dtype=np.int8)
    for s in range(S):
        if chunks[s]:
            cat = np.concatenate(chunks[s])
            stream[s, : len(cat)] = cat

    q = np.full((S, qcap), Q_PAD, dtype=np.int8)
    q[:, : len(query)] = np.asarray(query, dtype=np.int8)[None, :]
    return StreamBatch(q, stream, emit_stream, emit_step, cells, segments)


def _pack_streams_equal(
    query: np.ndarray, tmat: np.ndarray, S: int, segments: int
) -> StreamBatch:
    """Vectorized round-robin packing of a [B, n] equal-length read matrix."""
    from swtpu.ops.pallas_stream import STEP_CHUNK

    qcap = LANES // segments
    drain = qcap - 1
    B, n = tmat.shape
    per = B // S  # reads per stream
    flagged = tmat.copy()
    flagged[:, 0] |= FLAG
    # read r -> stream r % S, slot r // S (greedy == round-robin here)
    body = flagged.reshape(per, S, n).transpose(1, 0, 2).reshape(S, per * n)
    T = -(-(per * n + drain) // STEP_CHUNK) * STEP_CHUNK
    stream = np.full((S, T), STREAM_PAD, dtype=np.int8)
    stream[:, : per * n] = body
    r = np.arange(B, dtype=np.int64)
    emit_stream = (r % S).astype(np.int32)
    emit_step = (r // S) * n + (n - 1) + drain
    q = np.full((S, qcap), Q_PAD, dtype=np.int8)
    q[:, : len(query)] = np.asarray(query, dtype=np.int8)[None, :]
    return StreamBatch(
        q, stream, emit_stream, emit_step, len(query) * B * n, segments
    )


def gather_stream_scores(strip: np.ndarray, batch: StreamBatch) -> np.ndarray:
    """strip [S, T] -> per-read scores in submission order."""
    scores = np.zeros(len(batch.emit_step), dtype=np.int32)
    live = batch.emit_step >= 0
    scores[live] = strip[batch.emit_stream[live], batch.emit_step[live]]
    return scores


def score_streams(
    query: np.ndarray,
    targets: Sequence[np.ndarray],
    n_streams: int = 256,
    penalties=None,
    interpret: bool = False,
    segments: int = 1,
) -> np.ndarray:
    """End-to-end streamed scoring: pack -> wavefront kernel -> gather."""
    from swtpu.config import DEFAULT_PENALTIES
    from swtpu.ops.pallas_stream import sw_scores_stream_strip

    pen = penalties or DEFAULT_PENALTIES
    batch = pack_streams(query, targets, n_streams, segments=segments)
    strip = np.asarray(
        sw_scores_stream_strip(
            batch.q, batch.stream, pen, interpret=interpret, segments=segments
        )
    )
    return gather_stream_scores(strip, batch)
