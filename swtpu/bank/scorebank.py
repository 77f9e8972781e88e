"""ScoreBank — the high-level batched scoring engine.

TPU-native equivalent of the reference's top-level bank
(ScoreBank/ScoreBank_v2.v): load penalties once, load a query, stream a
database of targets through, and collect ID-tagged scores — plus the
capability the reference declared but never finished: bank-wide best-hit /
top-K reporting (the dangling `max`/`vld_max` ports,
ScoreBank/ScoreBank_v2.v:42-43, and the ResBuffer stub,
CAPI_template/ResBuffer.v).

Where the hardware dispatches each read to the first non-full feeder via a
priority encoder (ScoreBank_v2.v:141-165), swtpu buckets reads by length
into a handful of static shapes and lets XLA pipeline the dense batches
through the scoring kernel.
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional, Sequence

import numpy as np

from swtpu.bank.packer import pack_many_vs_one
from swtpu.config import SWConfig


def _dense_form(targets):
    """(mat, lens) if `targets` is an EncodedDB or (mat, lens) tuple."""
    from swtpu.io.loader import EncodedDB

    if isinstance(targets, EncodedDB):
        return targets.mat, targets.lens
    if (
        isinstance(targets, tuple)
        and len(targets) == 2
        and isinstance(targets[0], np.ndarray)
        and targets[0].ndim == 2
    ):
        return targets[0], np.asarray(targets[1], np.int32)
    return None, None


@dataclasses.dataclass
class ScoreResult:
    """Scores for one query against a database, in database read order."""

    scores: np.ndarray  # [n_reads] int32
    cells: int  # real DP cells scored (for GCUPS)
    padded_cells: int  # total padded cells dispatched
    elapsed_s: float

    @property
    def gcups(self) -> float:
        return self.cells / self.elapsed_s / 1e9 if self.elapsed_s > 0 else 0.0

    def top_k(self, k: int) -> List[tuple]:
        """(score, read_index) best hits, stable order — the reference's
        unfinished `max`/`vld_max` intent."""
        idx = np.argsort(-self.scores, kind="stable")[:k]
        return [(int(self.scores[i]), int(i)) for i in idx]


@dataclasses.dataclass
class LoadedDatabase:
    """A packed database RESIDENT ON DEVICE across queries.

    The reference re-streams its library from host DRAM through the
    feeders for every query (SM_Feeder2.v); a TPU has 16 GB of HBM, so the
    TPU-idiomatic inversion is to keep the packed streams on-chip and ship
    only the query register (~KB) per job: the many-queries-vs-one-database
    serving pattern at kernel speed instead of host-link speed.  Build
    with :meth:`ScoreBank.load_database`, score with
    :meth:`ScoreBank.score_loaded`.
    """

    stream: object  # [T, N] int8 device array (KERNEL layout, resident)
    emit_stream_dev: object  # [n_reads] int32 device
    emit_step_dev: object  # [n_reads] int32 device
    t_lens: np.ndarray  # per-read true lengths (cells + guard bounds)
    total_chars: int
    n_reads: int
    rows: int
    k_max: int  # query-tile capacity the stream was drain-padded for
    segments: int = 1  # queries per lane column (short-query occupancy)
    emit_regular: object = None  # strided-extract pattern (streams.py)


class ScoreBank:
    """Batched many-vs-one scorer with pluggable kernel backend.

    backend: 'scan' (portable lax.scan), 'pallas' (TPU kernel), or a
    callable (q, t, penalties) -> scores for testing.
    """

    def __init__(
        self,
        config: SWConfig = SWConfig(),
        backend: str = "auto",
        interpret: Optional[bool] = None,
        verify_integrity: bool = False,
    ):
        self.config = config
        import jax

        if config.score_width is not None and backend not in ("pallas", "stream"):
            # SCORE_WIDTH wrap-parity lives in the stream kernel (int32
            # biased lanes — round 4) and the column kernel (int16_biased):
            # auto-resolve to the flagship stream kernel on TPU, the column
            # kernel elsewhere; never silently override an explicitly
            # requested backend (a callable test backend or 'scan' would
            # otherwise stop being exercised)
            if backend != "auto":
                raise ValueError(
                    "score_width requires the 'stream' or 'pallas' backend "
                    f"(got {backend!r})"
                )
            backend = "stream" if jax.default_backend() == "tpu" else "pallas"
        elif backend == "auto":
            # the flagship path IS the default, exactly as the reference's
            # bank instantiates its fastest array (ScoreBank_v2.v:117): the
            # streamed multi-row wavefront (419.8 GCUPS measured, f32 state) on TPU —
            # score_database dispatches it for every query length (chained
            # tiles past 128 bases), and score_pairs' dense fallback inside
            # the stream backend uses the column kernel
            backend = "stream" if jax.default_backend() == "tpu" else "scan"
        self.backend = backend
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self._interpret = interpret
        # parity-checking analog (SURVEY.md §5): validate packed batches and
        # score bounds; cheap relative to scoring, off by default in prod
        self.verify_integrity = verify_integrity

    def _stream_dtype(self) -> str:
        if self.config.score_width is not None:
            # wrap emulation is integer bit-twiddling; f32 lanes can't wrap
            return "int32"
        sdt = self.config.stream_state_dtype
        if sdt == "auto":
            # float32 is exact for every reachable score and measured ~15%
            # faster than int32 at rows=16 (BENCH_NOTES.md); interpret/test
            # mode stays int32 for bit-identical CPU goldens
            return "int32" if self._interpret else "float32"
        return sdt

    def _score_batch(self, q: np.ndarray, t: np.ndarray) -> np.ndarray:
        pen = self.config.penalties
        if callable(self.backend):
            return np.asarray(self.backend(q, t, pen))
        if self.backend == "scan":
            from swtpu.ops.scan import sw_scores_scan

            return np.asarray(sw_scores_scan(q, t, pen))
        if self.backend == "stream":
            if self.config.score_width is not None:
                # biased long-query/bucketed fallback: the chained biased
                # tiles live in the column kernel
                from swtpu.ops.pallas_kernel import sw_scores_pallas

                return np.asarray(
                    sw_scores_pallas(
                        q, t, pen, interpret=self._interpret,
                        state_dtype="int16_biased",
                        score_width=self.config.score_width,
                    )
                )
            # long-query fallback path: the column kernel (interpret mode
            # compiles slowly, so CPU testing uses scan instead)
            if self._interpret:
                from swtpu.ops.scan import sw_scores_scan

                return np.asarray(sw_scores_scan(q, t, pen))
            from swtpu.ops.pallas_kernel import sw_scores_pallas

            return np.asarray(sw_scores_pallas(q, t, pen))
        if self.backend == "pallas":
            from swtpu.ops.pallas_kernel import sw_scores_pallas

            if self.config.score_width is not None:
                return np.asarray(
                    sw_scores_pallas(
                        q, t, pen, interpret=self._interpret,
                        state_dtype="int16_biased",
                        score_width=self.config.score_width,
                    )
                )
            return np.asarray(sw_scores_pallas(q, t, pen, interpret=self._interpret))
        raise ValueError(f"unknown backend {self.backend!r}")

    def score_database(
        self,
        query: np.ndarray,
        targets,
        event_log=None,
    ) -> ScoreResult:
        """Score every target read against `query`; returns read-order scores.

        targets: a sequence of 1-D code arrays, or an
        :class:`swtpu.io.loader.EncodedDB` (the fast dense form — the whole
        database stays one int8 matrix, no per-read Python objects).

        event_log: optional swtpu.utils.EventLog receiving one structured
        record per dispatched batch (the trace-array/debug.log analog)."""
        cfg = self.config
        tmat, tlens = _dense_form(targets)
        n_reads = len(tlens) if tlens is not None else len(targets)
        if self.backend == "stream":
            from swtpu.bank.streams import LANES as STREAM_QCAP

            if len(query) <= STREAM_QCAP:
                return self._score_database_stream(
                    query, targets, event_log, tmat=tmat, tlens=tlens
                )
            # longer queries chain 128-row wavefront tiles, carrying the
            # tail-row D/G/H strips between tiles — the reference's
            # reserved chaining-port intent (ScoringModule_v1.1.v:36-54)
            # at the fast kernel's speed.  score_width composes: the
            # chained tiles carry BIASED strips (round 5 — the PE is W-bit
            # at every query length, SW_ProcessingElement_v1.0.v:15-20)
            return self._score_database_stream_long(
                query, targets, event_log, tmat=tmat, tlens=tlens
            )
        t0 = time.perf_counter()
        batches = pack_many_vs_one(
            query,
            tmat if tlens is not None else targets,
            bucket_lens=cfg.target_buckets,
            q_width=max(8, -(-len(query) // 8) * 8),
            lens=tlens,
        )
        scores = np.zeros((n_reads,), dtype=np.int32)
        cells = 0
        padded = 0
        for batch in batches:
            tb = time.perf_counter()
            if self.verify_integrity:
                from swtpu.utils.guards import check_packed_query, check_packed_target

                check_packed_query(batch.q, batch.q_lens)
                check_packed_target(batch.t, batch.t_lens)
            s = self._score_batch(batch.q, batch.t)
            if self.verify_integrity:
                from swtpu.utils.guards import check_scores

                check_scores(s, batch.q_lens, batch.t_lens, cfg.penalties.match)
            live = batch.ids >= 0
            scores[batch.ids[live]] = s[live]
            cells += batch.cells
            padded += batch.padded_cells
            if event_log is not None:
                from swtpu.utils import BatchEvent

                event_log.emit(
                    BatchEvent(
                        "batch",
                        t_wall=time.time(),
                        elapsed_s=time.perf_counter() - tb,
                        reads=int(live.sum()),
                        cells=batch.cells,
                        padded_cells=batch.padded_cells,
                        note=f"bucket_len={batch.t.shape[1]}",
                    )
                )
        elapsed = time.perf_counter() - t0
        return ScoreResult(scores, cells, padded, elapsed)

    def score_pairs(
        self,
        queries: Sequence[np.ndarray],
        targets: Sequence[np.ndarray],
        event_log=None,
    ) -> ScoreResult:
        """Score explicit (query, target) pairs (many-vs-many workloads).

        Pairs are grouped by (query-width, target-bucket) shape and
        dispatched densely; results return in submission order.

        event_log: optional swtpu.utils.EventLog receiving one structured
        record per dispatched chunk (same observability as score_database)."""
        from swtpu.bank.packer import pack_pairs
        from swtpu.bank.buckets import plan_buckets

        if len(queries) != len(targets):
            raise ValueError("queries and targets must pair up")
        if self.backend == "stream":
            from swtpu.bank.streams import LANES as STREAM_QCAP

            if all(len(q) <= STREAM_QCAP for q in queries):
                # many-vs-many at wavefront speed: per-stream query registers
                # (the reference's per-module ld_q, ScoreBank_v2.v:99-102)
                return self._score_pairs_stream(queries, targets, event_log)
            # mixed-length pair sets stay on the wavefront too (round-3
            # verdict: one 200-base query must not drop the whole set to
            # the column path): short-query pairs ride the pair streams,
            # and each distinct >128-base query's pairs chain query
            # tiles through the long-query kernel — per-module ld_q
            # (ScoreBank_v2.v:99-102) composed with the chaining ports
            # (ScoringModule_v1.1.v:36-54).  score_width composes with the
            # chain (biased boundary strips, round 5).
            return self._score_pairs_stream_mixed(
                queries, targets, event_log
            )
        cfg = self.config
        t0 = time.perf_counter()
        n = len(queries)
        t_plan = plan_buckets([len(t) for t in targets], cfg.target_buckets)
        q_plan = plan_buckets([len(q) for q in queries], cfg.query_buckets)
        scores = np.zeros((n,), dtype=np.int32)
        cells = padded = 0
        groups = {}
        for i in range(n):
            groups.setdefault((q_plan.assignments[i], t_plan.assignments[i]), []).append(i)
        for (qb, tb), idxs in groups.items():
            tc = time.perf_counter()
            batch = pack_pairs(
                [queries[i] for i in idxs],
                [targets[i] for i in idxs],
                q_width=q_plan.bucket_lens[qb],
                t_width=t_plan.bucket_lens[tb],
                ids=np.asarray(idxs, np.int32),
            )
            s = self._score_batch(batch.q, batch.t)
            scores[batch.ids] = s
            cells += batch.cells
            padded += batch.padded_cells
            if event_log is not None:
                from swtpu.utils import BatchEvent

                event_log.emit(
                    BatchEvent(
                        "pair_batch", t_wall=time.time(),
                        elapsed_s=time.perf_counter() - tc,
                        reads=len(idxs), cells=batch.cells,
                        padded_cells=batch.padded_cells,
                        note=f"q_width={q_plan.bucket_lens[qb]} "
                        f"t_width={t_plan.bucket_lens[tb]}",
                    )
                )
        return ScoreResult(scores, cells, padded, time.perf_counter() - t0)

    def load_database(self, targets, max_query_len: int = 128) -> LoadedDatabase:
        """Pack `targets` once and leave the streams resident on device.

        The stream crosses the host link ONCE (2-bit wire + on-device
        expansion when wire_2bit is set); every subsequent
        :meth:`score_loaded` ships only the ~16 KB query register and reads
        back n_reads int32 scores.  `max_query_len` sets the query-tile
        capacity: past 128 bases the stream gains the chained kernel's
        extra drain steps (pack once, serve any length up to it); at 32 or
        fewer bases the database packs segments=4 (64: segments=2) so short
        queries keep full wavefront occupancy — the same auto-segmentation
        as score_database.

        Requires the stream backend."""
        import jax

        from swtpu.bank.streams import (
            LANES, pack_stream_wire, pack_streams, pack_streams_long,
        )

        if self.backend != "stream":
            raise ValueError(
                f"load_database requires the stream backend (got "
                f"{self.backend!r})"
            )
        # auto-segmentation mirrors score_database: <=32-base capacity packs
        # 4 query segments per lane column, <=64 packs 2
        if max_query_len <= LANES // 4:
            segments = 4
        elif max_query_len <= LANES // 2:
            segments = 2
        else:
            segments = 1
        rows = self.config.stream_rows
        if rows == 0:
            rows = (
                {1: 16, 2: 8, 4: 4}[segments] if not self._interpret else 1
            )
        phys = self.config.stream_phys if not self._interpret else 8
        tmat, tlens = _dense_form(targets)
        k_max = max(1, -(-int(max_query_len) // LANES))
        # probe query: stream layout and emission coordinates are
        # query-independent (drain = 128//(rows*segments) - 1); for a
        # multi-tile capacity, pack_streams_long owns the extra-drain math
        if k_max > 1:
            probe = np.zeros((k_max * LANES,), np.int8)
            pack = lambda t, lens: pack_streams_long(
                probe, t, n_streams=phys, rows=rows, lens=lens
            )
        else:
            probe = np.zeros((1,), np.int8)
            pack = lambda t, lens: pack_streams(
                probe, t, n_streams=phys * segments, segments=segments,
                lens=lens, rows=rows,
            )
        if tlens is not None:
            batch = pack(tmat, tlens)
            t_lens = np.asarray(tlens, np.int64)
        else:
            batch = pack(targets, None)
            t_lens = np.fromiter((len(t) for t in targets), np.int64)
        # the probe query makes batch.cells meaningless (its length is a
        # layout placeholder, not a real query); real cell accounting lives
        # in _finish_loaded, which scales total_chars by the served query
        batch.cells = 0
        if self.verify_integrity:
            from swtpu.utils.guards import check_stream_batch

            check_stream_batch(batch)
        stream = batch.stream
        # resident layout is the KERNEL's [T, N]: per-query dispatches skip
        # the full-stream relayout (sw_scores_stream_kernel_layout) — the
        # one-time transpose happens on device at load
        if self.config.wire_2bit and not self._interpret:
            # one 2.5-bit/char crossing, expanded + transposed on device
            from swtpu.ops.pallas_stream import unpack_stream_wire

            codes, flags = pack_stream_wire(stream)
            dev_stream = jax.jit(
                lambda c, f: unpack_stream_wire(c, f).T
            )(jax.device_put(codes), jax.device_put(flags))
        else:
            dev_stream = jax.device_put(np.ascontiguousarray(stream.T))
        return LoadedDatabase(
            stream=dev_stream,
            emit_stream_dev=jax.device_put(batch.emit_stream),
            emit_step_dev=jax.device_put(batch.emit_step.astype(np.int32)),
            t_lens=t_lens,
            total_chars=int(t_lens.sum()),
            n_reads=len(t_lens),
            rows=rows,
            k_max=k_max,
            segments=segments,
            emit_regular=batch.emit_regular,
        )

    def _dispatch_loaded(self, query: np.ndarray, db: LoadedDatabase):
        """Async device dispatch for one query against a loaded database;
        returns the un-materialized device scores array."""
        from swtpu.bank.streams import LANES
        from swtpu.ops.common import Q_PAD
        from swtpu.ops.pallas_stream import (
            _q_kernel_layout, sw_scores_stream_kernel_layout,
            sw_scores_stream_long_kernel_layout,
        )

        query = np.asarray(query, np.int8)
        N = np.shape(db.stream)[1]  # logical streams (kernel layout [T, N])
        qcap = LANES // db.segments
        kw = dict(
            penalties=self.config.penalties, interpret=self._interpret,
            rows=db.rows, state_dtype=self._stream_dtype(),
        )
        if len(query) <= qcap:
            q = np.full((N, qcap), Q_PAD, np.int8)
            q[:, : len(query)] = query[None, :]
            qk = _q_kernel_layout(q, db.segments, db.rows)
            return sw_scores_stream_kernel_layout(
                qk, db.stream, db.emit_stream_dev, db.emit_step_dev,
                segments=db.segments, score_width=self.config.score_width,
                emit_regular=db.emit_regular, **kw,
            )
        if db.segments > 1:
            raise ValueError(
                f"query of {len(query)} bases exceeds the segmented "
                f"capacity {qcap} this database was loaded for — reload "
                "with a larger max_query_len"
            )
        K = -(-len(query) // LANES)
        if K > db.k_max:
            raise ValueError(
                f"query of {len(query)} bases needs {K} tiles; database "
                f"was loaded with max_query_len for {db.k_max} — reload "
                "with a larger max_query_len"
            )
        q = np.full((N, K * LANES), Q_PAD, np.int8)
        q[:, : len(query)] = query[None, :]
        # the chained kernel consumes the resident [T, N] layout directly —
        # no per-call relayout, no second HBM copy (score_width composes:
        # biased chained tiles, round 5)
        return sw_scores_stream_long_kernel_layout(
            q, db.stream, db.emit_stream_dev, db.emit_step_dev,
            score_width=self.config.score_width,
            emit_regular=db.emit_regular, **kw,
        )

    def _finish_loaded(self, dev_scores, query, db: LoadedDatabase, t0,
                       elapsed_override=None, event_log=None, kind="loaded"):
        from swtpu.bank.streams import LANES

        scores = np.asarray(dev_scores)
        if self.verify_integrity:
            from swtpu.utils.guards import check_scores

            check_scores(
                scores, np.full(db.n_reads, len(query)), db.t_lens,
                self.config.penalties.match,
            )
        cells = int(len(query)) * db.total_chars
        # K query tiles each sweep the physical wavefront capacity
        # (LANES//segments rows per logical stream position) — same
        # accounting as the database stream paths
        K = max(1, -(-len(query) // LANES))
        padded = (
            int(np.shape(db.stream)[0]) * int(np.shape(db.stream)[1])
            * (LANES // db.segments) * K
        )
        elapsed = (
            elapsed_override if elapsed_override is not None
            else time.perf_counter() - t0
        )
        if event_log is not None:
            # per-query serving record (the per-alignment cycle accounting,
            # afu.v:497-532) so `swtpu events` can summarize serve sessions
            from swtpu.utils import BatchEvent

            event_log.emit(
                BatchEvent(
                    kind, t_wall=time.time(), elapsed_s=elapsed,
                    reads=db.n_reads, cells=cells, padded_cells=padded,
                    note=f"qlen={len(query)} resident_reads={db.n_reads}",
                )
            )
        return ScoreResult(scores, cells, padded, elapsed)

    def score_loaded(
        self, query: np.ndarray, db: LoadedDatabase, event_log=None
    ) -> ScoreResult:
        """Score `query` against a device-resident database: only the query
        register crosses H2D; the packed streams never leave HBM."""
        t0 = time.perf_counter()
        return self._finish_loaded(
            self._dispatch_loaded(query, db), query, db, t0,
            event_log=event_log,
        )

    def score_loaded_many(
        self, queries: Sequence[np.ndarray], db: LoadedDatabase,
        event_log=None,
    ) -> List[ScoreResult]:
        """Score a batch of queries against one loaded database with
        pipelined dispatch: every query's kernel is enqueued before any
        result materializes, so per-call dispatch/sync overhead amortizes
        across the batch (the serving form of the feeders' back-to-back
        target streaming).

        Per-result `elapsed_s` is the batch wall time divided evenly —
        under pipelined dispatch individual query timings don't exist;
        summing the results' elapsed_s gives the true batch time."""
        t0 = time.perf_counter()
        devs = [self._dispatch_loaded(q, db) for q in queries]
        for d in devs:
            np.asarray(d)  # materialize in dispatch order
        share = (time.perf_counter() - t0) / max(len(queries), 1)
        return [
            self._finish_loaded(
                d, q, db, t0, elapsed_override=share, event_log=event_log,
                kind="loaded_many",
            )
            for d, q in zip(devs, queries)
        ]

    def topk_loaded(
        self, query: np.ndarray, db: LoadedDatabase, k: int = 10,
        event_log=None,
    ) -> List[tuple]:
        """Best-hit reporting straight off the device: the top-K cut runs
        on-chip (two-level O(n) pass) and only 2k scalars cross D2H —
        for serving workloads that never need the full score vector.
        Tie order matches ScoreResult.top_k (score desc, id asc)."""
        t0 = time.perf_counter()
        devs = self._dispatch_topk_loaded(query, db, k)
        return self._finish_topk_loaded(devs, query, db, t0,
                                        event_log=event_log)

    def _finish_topk_loaded(self, devs, query, db: LoadedDatabase, t0,
                            event_log=None):
        """Materializing half of topk_loaded (+ the serving event)."""
        fs, fids = np.asarray(devs[0]), np.asarray(devs[1])
        if event_log is not None:
            from swtpu.utils import BatchEvent

            event_log.emit(
                BatchEvent(
                    "loaded_topk", t_wall=time.time(),
                    elapsed_s=time.perf_counter() - t0,
                    reads=db.n_reads,
                    cells=int(len(query)) * db.total_chars,
                    padded_cells=0,
                    note=f"qlen={len(query)} k={len(fs)}",
                )
            )
        return [(int(s), int(i)) for s, i in zip(fs, fids)]

    def load_database_sharded(
        self, targets, mesh, max_query_len: int = 128, axis: str = "data"
    ):
        """Mesh-wide :meth:`load_database`: per-device resident stream
        shards (the reference's per-module resident feeders,
        ScoreBank_v2.v:77-139) serving any query with one shard_map
        dispatch.  See swtpu.bank.serving."""
        from swtpu.bank.serving import load_database_sharded

        return load_database_sharded(
            self, targets, mesh, max_query_len=max_query_len, axis=axis
        )

    def score_loaded_sharded(self, query, db, event_log=None) -> ScoreResult:
        """Score one query against a mesh-resident database (full read-order
        score vector; the query register broadcasts, `ld_q` v2.v:99-102)."""
        from swtpu.bank.serving import score_loaded_sharded

        return score_loaded_sharded(self, query, db, event_log=event_log)

    def score_loaded_many_sharded(
        self, queries, db, event_log=None
    ) -> List[ScoreResult]:
        """Pipelined many-query serving over the mesh."""
        from swtpu.bank.serving import score_loaded_many_sharded

        return score_loaded_many_sharded(self, queries, db, event_log=event_log)

    def topk_loaded_sharded(self, query, db, k: int = 10, event_log=None):
        """Mesh-wide best hits: per-shard cut + collective merge; only 2k
        scalars cross D2H (the `max`/`vld_max` intent at the MODULES axis)."""
        from swtpu.bank.serving import topk_loaded_sharded

        return topk_loaded_sharded(self, query, db, k=k, event_log=event_log)

    def _dispatch_topk_loaded(self, query, db: LoadedDatabase, k: int):
        """Async half of topk_loaded: enqueue the kernel + on-device top-K
        cut, return un-materialized (scores [k], ids [k]) device arrays —
        lets serving front-ends pipeline dispatches across clients."""
        import jax.numpy as jnp

        from swtpu.parallel.sharded import local_topk_jit

        dev = self._dispatch_loaded(query, db)
        ids = jnp.arange(db.n_reads, dtype=jnp.int32)
        return local_topk_jit(dev, ids, min(k, db.n_reads))

    def _score_pairs_stream_mixed(
        self,
        queries: Sequence[np.ndarray],
        targets: Sequence[np.ndarray],
        event_log=None,
    ) -> ScoreResult:
        """Pair sets with at least one query longer than one wavefront tile:
        partition by query length.  Pairs whose query fits one tile go
        through the pair-stream kernel together; each distinct long query's
        pairs become a many-vs-one job on the chained-tile kernel (the
        long queries are deduped, so pairs sharing a 500-base query still
        amortize one pack + one kernel)."""
        from swtpu.bank.streams import LANES as STREAM_QCAP, dedupe_queries

        t0 = time.perf_counter()
        n = len(queries)
        short_idx = [i for i in range(n) if len(queries[i]) <= STREAM_QCAP]
        long_idx = [i for i in range(n) if len(queries[i]) > STREAM_QCAP]
        scores = np.zeros((n,), dtype=np.int32)
        cells = padded = 0
        if short_idx:
            res = self._score_pairs_stream(
                [queries[i] for i in short_idx],
                [targets[i] for i in short_idx],
                event_log,
            )
            scores[np.asarray(short_idx, np.int64)] = res.scores
            cells += res.cells
            padded += res.padded_cells
        qlist, uid = dedupe_queries([queries[i] for i in long_idx])
        groups: list = [[] for _ in qlist]
        for pos, i in enumerate(long_idx):
            groups[uid[pos]].append(i)
        for u, group in enumerate(groups):
            res = self._score_database_stream_long(
                qlist[u], [targets[i] for i in group], event_log
            )
            scores[np.asarray(group, np.int64)] = res.scores
            cells += res.cells
            padded += res.padded_cells
        return ScoreResult(scores, cells, padded, time.perf_counter() - t0)

    def _score_pairs_stream(
        self, queries: Sequence[np.ndarray], targets: Sequence[np.ndarray],
        event_log=None,
    ) -> ScoreResult:
        """Many-vs-many on the streamed wavefront: distinct queries load
        into per-stream query registers (pack_pair_streams), targets ride
        streams owned by their query.  Pair sets with more distinct queries
        than logical streams split into multiple kernel invocations."""
        from swtpu.bank.streams import pack_pair_streams
        from swtpu.ops.pallas_stream import sw_scores_stream

        t0 = time.perf_counter()
        n = len(queries)
        qmax = max((len(q) for q in queries), default=0)
        from swtpu.bank.streams import LANES as STREAM_QCAP

        if qmax <= STREAM_QCAP // 4:
            segments = 4
        elif qmax <= STREAM_QCAP // 2:
            segments = 2
        else:
            segments = 1
        rows = self.config.stream_rows
        if rows == 0:
            rows = {1: 16, 2: 8, 4: 4}[segments] if not self._interpret else 1
        # S=512 physical streams, the measured sweet spot (the 419.4-GCUPS
        # pairs_k17 number ran S=512 — BENCH_NOTES.md)
        phys = self.config.stream_phys if not self._interpret else 8
        S = phys * segments
        # group pair indices by distinct query (the packer's own dedup, so
        # the chunk bound and the packer's U always agree); chunk groups to
        # <= S queries
        from swtpu.bank.streams import dedupe_queries

        qlist, uid = dedupe_queries(queries)
        groups: list = [[] for _ in qlist]
        for i, u in enumerate(uid):
            groups[u].append(i)
        chunks = [groups[i : i + S] for i in range(0, len(groups), S)]
        scores = np.zeros((n,), dtype=np.int32)
        cells = padded = 0
        for chunk in chunks:
            tc = time.perf_counter()
            idxs = [i for g in chunk for i in g]
            batch = pack_pair_streams(
                [queries[i] for i in idxs], [targets[i] for i in idxs],
                n_streams=S, segments=segments, rows=rows,
            )
            if self.verify_integrity:
                from swtpu.utils.guards import check_stream_batch

                check_stream_batch(batch)
            s = np.asarray(
                sw_scores_stream(
                    batch.q, batch.stream,
                    batch.emit_stream, batch.emit_step.astype(np.int32),
                    self.config.penalties, interpret=self._interpret,
                    segments=segments, rows=rows,
                    state_dtype=self._stream_dtype(),
                    score_width=self.config.score_width,
                    emit_regular=batch.emit_regular,
                )
            )
            if self.verify_integrity:
                from swtpu.utils.guards import check_scores

                check_scores(
                    s,
                    np.fromiter((len(queries[i]) for i in idxs), np.int64),
                    np.fromiter((len(targets[i]) for i in idxs), np.int64),
                    self.config.penalties.match,
                )
            scores[np.asarray(idxs, np.int64)] = s
            cells += batch.cells
            chunk_padded = batch.stream.shape[0] * batch.stream.shape[1] * (
                STREAM_QCAP // segments
            )
            padded += chunk_padded
            if event_log is not None:
                from swtpu.utils import BatchEvent

                event_log.emit(
                    BatchEvent(
                        "pair_stream", t_wall=time.time(),
                        elapsed_s=time.perf_counter() - tc,
                        reads=len(idxs), cells=batch.cells,
                        padded_cells=chunk_padded,
                        note=f"streams={batch.stream.shape[0]} "
                        f"T={batch.stream.shape[1]} queries={len(chunk)}",
                    )
                )
        return ScoreResult(scores, cells, padded, time.perf_counter() - t0)

    def _score_database_stream_long(
        self, query, targets, event_log=None, tmat=None, tlens=None
    ) -> ScoreResult:
        """Queries longer than 128 bases on the streamed wavefront: K-tile
        chaining (swtpu.ops.pallas_stream.sw_scores_stream_long).  Covers the
        reference's full LEN_WIDTH envelope (4095 bases, ScoreBank_v2.v:14-15)
        and beyond, at the multi-row kernel's rate instead of the ~7x slower
        column kernel."""
        from swtpu.bank.streams import pack_streams_long, LANES
        from swtpu.ops.pallas_stream import sw_scores_stream_long

        t0 = time.perf_counter()
        n_reads = len(tlens) if tlens is not None else len(targets)
        rows = self.config.stream_rows
        if rows == 0:
            # chained tiles are always segments=1, so rows=16 is legal; the
            # unrolled R=16 body is slow to build in interpret mode -> rows=1
            rows = 16 if not self._interpret else 1
        # S=512 physical streams is the measured sweet spot for the rows=16
        # kernel (BENCH_NOTES.md: S=256/512/1024 -> 321/323.5/294 int32;
        # every round-3 f32 measurement incl. the long_k* campaign ran S=512)
        phys = self.config.stream_phys if not self._interpret else 8
        if tlens is not None:
            batch = pack_streams_long(
                query, tmat, n_streams=phys, rows=rows, lens=tlens
            )
        else:
            batch = pack_streams_long(query, targets, n_streams=phys, rows=rows)
        if self.verify_integrity:
            from swtpu.utils.guards import check_stream_batch

            check_stream_batch(batch)
        if self.config.wire_2bit and not self._interpret:
            # same 3.2x H2D cut as the short-query path (round-2 advisor):
            # ship 2-bit codes + flag bitmap, expand on device
            from swtpu.bank.streams import pack_stream_wire
            from swtpu.ops.pallas_stream import sw_scores_stream_long_packed

            codes, flags = pack_stream_wire(batch.stream)
            scores = np.asarray(
                sw_scores_stream_long_packed(
                    batch.q, codes, flags,
                    batch.emit_stream, batch.emit_step.astype(np.int32),
                    self.config.penalties, interpret=self._interpret,
                    rows=rows, state_dtype=self._stream_dtype(),
                    score_width=self.config.score_width,
                    emit_regular=batch.emit_regular,
                )
            )
        else:
            scores = np.asarray(
                sw_scores_stream_long(
                    batch.q, batch.stream,
                    batch.emit_stream, batch.emit_step.astype(np.int32),
                    self.config.penalties, interpret=self._interpret, rows=rows,
                    state_dtype=self._stream_dtype(),
                    score_width=self.config.score_width,
                    emit_regular=batch.emit_regular,
                )
            )
        if self.verify_integrity:
            from swtpu.utils.guards import check_scores

            t_lens = tlens if tlens is not None else np.fromiter(
                (len(t) for t in targets), np.int64, n_reads
            )
            check_scores(
                scores, np.full(n_reads, len(query)), t_lens,
                self.config.penalties.match,
            )
        elapsed = time.perf_counter() - t0
        K = batch.q.shape[1] // LANES
        padded = batch.stream.shape[0] * batch.stream.shape[1] * LANES * K
        if event_log is not None:
            from swtpu.utils import BatchEvent

            event_log.emit(
                BatchEvent(
                    "stream_long", t_wall=time.time(), elapsed_s=elapsed,
                    reads=n_reads, cells=batch.cells, padded_cells=padded,
                    note=f"streams={batch.stream.shape[0]} "
                    f"T={batch.stream.shape[1]} tiles={K}",
                )
            )
        return ScoreResult(scores, batch.cells, padded, elapsed)

    def _score_database_stream_chunked(
        self, query, targets, event_log, tmat, tlens,
        segments: int, rows: int, phys: int, t0: float,
    ) -> ScoreResult:
        """Pipelined stream scoring: the database splits into chunks of
        `SWConfig.stream_chunk_reads`; each chunk's pack + wire-compress runs
        on the host WHILE the previous chunk's H2D transfer and kernel are in
        flight (JAX async dispatch), and nothing blocks until every chunk is
        dispatched.  The TPU-native form of the feeders' double buffering —
        the next target stages while the current one streams
        (SM_Feeder2.v:104-110) over the pipelined tagged DMA (dma.v:472-491).

        Chunk stream lengths snap to a power-of-two ladder so equal-rung
        chunks reuse ONE compiled executable (static shapes under jit).

        Dispatch runs on ONE worker thread: measured on the tunnel-attached
        dev chip, a jit call's H2D blocks the calling thread for most of the
        transfer (JAX async dispatch is not async past the tunnel client),
        so same-thread chunking LOST 15-25% (campaign r4b e2e_overlap:
        0.35 -> 0.29 Mreads/s).  With the worker thread, numpy packing
        (which releases the GIL) genuinely overlaps the in-flight
        transfer."""
        import jax
        from concurrent.futures import ThreadPoolExecutor

        from swtpu.bank.streams import (
            LANES, STREAM_PAD, pack_stream_wire, pack_streams,
        )
        from swtpu.ops.pallas_stream import (
            STEP_CHUNK, sw_scores_stream, sw_scores_stream_packed,
        )

        C = self.config.stream_chunk_reads
        n_reads = len(tlens) if tlens is not None else len(targets)
        S = phys * segments
        pending = []  # (lo, hi, future -> device scores [C], cells, padded)
        cells = padded = 0
        kw = dict(
            penalties=self.config.penalties, interpret=self._interpret,
            segments=segments, rows=rows,
            state_dtype=self._stream_dtype(),
            score_width=self.config.score_width,
        )
        wire = self.config.wire_2bit and not self._interpret
        dq_box = {}

        def dispatch(q, stream, es, ep, regular):
            dq = dq_box.get("q")
            if dq is None:
                dq = dq_box["q"] = jax.device_put(q)
            if wire:
                codes, flags = pack_stream_wire(stream)
                return sw_scores_stream_packed(
                    dq, codes, flags, es, ep, emit_regular=regular, **kw
                )
            return sw_scores_stream(dq, stream, es, ep, emit_regular=regular,
                                    **kw)

        ex = ThreadPoolExecutor(max_workers=1)
        try:
            for lo in range(0, n_reads, C):
                hi = min(lo + C, n_reads)
                if tlens is not None:
                    batch = pack_streams(
                        query, tmat[lo:hi], n_streams=S, segments=segments,
                        lens=tlens[lo:hi], rows=rows,
                    )
                else:
                    batch = pack_streams(
                        query, [targets[i] for i in range(lo, hi)],
                        n_streams=S, segments=segments, rows=rows,
                    )
                if self.verify_integrity:
                    from swtpu.utils.guards import check_stream_batch

                    check_stream_batch(batch)
                # snap T to the power-of-two ladder (extra drain pads are
                # score-inert; every emission precedes them)
                T = batch.stream.shape[1]
                Tq = STEP_CHUNK
                while Tq < T:
                    Tq *= 2
                stream = batch.stream
                if Tq != T:
                    stream = np.full((S, Tq), STREAM_PAD, np.int8)
                    stream[:, :T] = batch.stream
                # fixed-width emission maps (pad slots emit 0, discarded)
                es = np.zeros((C,), np.int32)
                ep = np.full((C,), -1, np.int32)
                es[: hi - lo] = batch.emit_stream
                ep[: hi - lo] = batch.emit_step.astype(np.int32)
                # full chunks reuse the packer's own pattern; the padded
                # tail chunk (-1 rows) can never be regular
                regular = batch.emit_regular if hi - lo == C else None
                fut = ex.submit(dispatch, batch.q, stream, es, ep, regular)
                chunk_padded = stream.shape[0] * Tq * (LANES // segments)
                pending.append((lo, hi, fut, batch.cells, chunk_padded))
            scores = np.zeros((n_reads,), dtype=np.int32)
            for lo, hi, fut, c, p in pending:
                scores[lo:hi] = np.asarray(fut.result())[: hi - lo]
                cells += c
                padded += p
        finally:
            ex.shutdown(wait=True)
        if self.verify_integrity:
            from swtpu.utils.guards import check_scores

            t_lens = tlens if tlens is not None else np.fromiter(
                (len(t) for t in targets), np.int64, n_reads
            )
            check_scores(
                scores, np.full(n_reads, len(query)), t_lens,
                self.config.penalties.match,
            )
        elapsed = time.perf_counter() - t0
        if event_log is not None:
            from swtpu.utils import BatchEvent

            event_log.emit(
                BatchEvent(
                    "stream_pipelined", t_wall=time.time(), elapsed_s=elapsed,
                    reads=n_reads, cells=cells, padded_cells=padded,
                    note=f"chunks={len(pending)} chunk_reads={C} streams={S}",
                )
            )
        return ScoreResult(scores, cells, padded, elapsed)

    def _score_database_stream(
        self, query, targets, event_log=None, tmat=None, tlens=None
    ) -> ScoreResult:
        """Streamed wavefront path: no length buckets at all — ragged reads
        concatenate back-to-back per stream (the systolic feeder design)."""
        from swtpu.bank.streams import pack_streams, LANES
        from swtpu.ops.pallas_stream import sw_scores_stream

        t0 = time.perf_counter()
        n_reads = len(tlens) if tlens is not None else len(targets)
        # segment short queries 4-per-column (100% wavefront occupancy for
        # the reference's 32nt datasets)
        if len(query) <= LANES // 4:
            segments = 4
        elif len(query) <= LANES // 2:
            segments = 2
        else:
            segments = 1
        rows = self.config.stream_rows
        if rows == 0:
            # auto: fold query rows per sublane to amortize sublane rolls
            # (measured sweet spots, BENCH_NOTES.md: rows=16 -> 323 GCUPS at
            # segments=1; segmented configs cap at rows*segments = 16);
            # interpret mode stays at 1 row (folding only pays on hardware)
            rows = {1: 16, 2: 8, 4: 4}[segments] if not self._interpret else 1
        # logical streams = physical lane columns x segments; S=512 physical
        # is the measured sweet spot (BENCH_NOTES.md)
        phys = self.config.stream_phys if not self._interpret else 8
        chunk_reads = self.config.stream_chunk_reads
        if chunk_reads and n_reads > chunk_reads:
            return self._score_database_stream_chunked(
                query, targets, event_log, tmat=tmat, tlens=tlens,
                segments=segments, rows=rows, phys=phys, t0=t0,
            )
        if tlens is not None:
            batch = pack_streams(
                query, tmat, n_streams=phys * segments, segments=segments,
                lens=tlens, rows=rows,
            )
        else:
            batch = pack_streams(
                query, targets, n_streams=phys * segments, segments=segments,
                rows=rows,
            )
        if self.verify_integrity:
            # in-situ parity checking on the DEFAULT (flagship) path — the
            # reference guards every bus (afu.v:73-76), not just slow ones
            from swtpu.utils.guards import check_stream_batch

            check_stream_batch(batch)
        if self.config.wire_2bit and not self._interpret:
            # ship the stream at 2.5 bits/char and expand on device — the
            # reference's 4-bases/byte transfer economy (aligner_Header.c:30-41)
            from swtpu.bank.streams import pack_stream_wire
            from swtpu.ops.pallas_stream import sw_scores_stream_packed

            codes, flags = pack_stream_wire(batch.stream)
            scores = np.asarray(
                sw_scores_stream_packed(
                    batch.q, codes, flags,
                    batch.emit_stream, batch.emit_step.astype(np.int32),
                    self.config.penalties, interpret=self._interpret,
                    segments=segments, rows=rows,
                    state_dtype=self._stream_dtype(),
                    score_width=self.config.score_width,
                    emit_regular=batch.emit_regular,
                )
            )
        else:
            scores = np.asarray(
                sw_scores_stream(
                    batch.q, batch.stream,
                    batch.emit_stream, batch.emit_step.astype(np.int32),
                    self.config.penalties, interpret=self._interpret,
                    segments=segments, rows=rows,
                    state_dtype=self._stream_dtype(),
                    score_width=self.config.score_width,
                    emit_regular=batch.emit_regular,
                )
            )
        if self.verify_integrity:
            from swtpu.utils.guards import check_scores

            t_lens = tlens if tlens is not None else np.fromiter(
                (len(t) for t in targets), np.int64, n_reads
            )
            check_scores(
                scores, np.full(n_reads, len(query)), t_lens,
                self.config.penalties.match,
            )
        elapsed = time.perf_counter() - t0
        # physical wavefront capacity: LANES DP rows per lane column per
        # step, shared by `segments` queries (same accounting as the pairs
        # path: stream rows x steps x rows-per-column)
        padded = batch.stream.shape[0] * batch.stream.shape[1] * (
            LANES // segments
        )
        if event_log is not None:
            from swtpu.utils import BatchEvent

            event_log.emit(
                BatchEvent(
                    "stream", t_wall=time.time(), elapsed_s=elapsed,
                    reads=n_reads, cells=batch.cells,
                    padded_cells=padded,
                    note=f"streams={batch.stream.shape[0]} T={batch.stream.shape[1]}",
                )
            )
        return ScoreResult(scores, batch.cells, padded, elapsed)
