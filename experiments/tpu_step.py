"""One-compile-per-run TPU steps (tunnel-friendly).  Usage:
python -u experiments/tpu_step.py <step>
Steps: probe | parity | bench_s256 | bench_s1024 | bench_f32 | bench_col | bench_i16
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parents[1] / ".jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def timed(run, reps=2):
    run()
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        run()
        best = min(best, time.time() - t0)
    return best


def probe():
    t0 = time.time()
    x = jax.device_put(np.ones((8, 8), np.float32))
    _ = np.asarray(x * 2)
    log(f"probe ok {time.time()-t0:.1f}s")


def parity():
    from swtpu.bank.streams import gather_stream_scores, pack_streams
    from swtpu.ops.pallas_stream import sw_scores_stream_strip
    from swtpu.oracle import score_many_vs_one

    rng = np.random.default_rng(0)
    targets = [rng.integers(0, 4, size=rng.integers(3, 40)).astype(np.int8) for _ in range(20)]
    query = rng.integers(0, 4, size=17).astype(np.int8)
    want = score_many_vs_one(query, targets)
    b = pack_streams(query, targets, n_streams=128)
    log(f"S=128 T={b.stream.shape[1]} compiling/running...")
    strip = np.asarray(sw_scores_stream_strip(b.q, b.stream))
    got = gather_stream_scores(strip, b)
    bad = np.nonzero(got != want)[0]
    log(f"parity: {len(bad)} mismatches / {len(targets)}")
    for i in bad[:5]:
        s, e = b.emit_stream[i], b.emit_step[i]
        log(f"  read {i}: want {want[i]} got {got[i]} s={s} e={e} len={len(targets[i])}"
            f" strip[{s},{max(0,e-3)}:{e+4}]={strip[s, max(0,e-3):e+4]}")
    if len(bad) == 0:
        log("PARITY OK")


def _parity_rows(rows, segments=1, S=128, state_dtype="int32"):
    """Compiled-TPU parity of the multi-row kernel vs the numpy oracle."""
    from swtpu.bank.streams import gather_stream_scores, pack_streams
    from swtpu.ops.pallas_stream import sw_scores_stream_strip
    from swtpu.oracle import score_many_vs_one

    rng = np.random.default_rng(rows * 100 + segments)
    targets = [
        rng.integers(0, 4, size=rng.integers(3, 90)).astype(np.int8)
        for _ in range(40)
    ]
    qlen = min(128 // segments, 128) - 3
    query = rng.integers(0, 4, size=qlen).astype(np.int8)
    want = score_many_vs_one(query, targets)
    b = pack_streams(query, targets, n_streams=S * segments,
                     segments=segments, rows=rows)
    log(f"rows={rows} seg={segments} T={b.stream.shape[1]} compiling/running...")
    strip = np.asarray(
        sw_scores_stream_strip(b.q, b.stream, segments=segments, rows=rows,
                               state_dtype=state_dtype)
    )
    got = gather_stream_scores(strip, b)
    bad = np.nonzero(got != want)[0]
    log(f"parity rows={rows} seg={segments}: {len(bad)} mismatches / {len(targets)}")
    for i in bad[:5]:
        log(f"  read {i}: want {want[i]} got {got[i]} len={len(targets[i])}")
    if len(bad) == 0:
        log("PARITY OK")


def _stream_bench(S):
    from swtpu.bank.streams import pack_streams
    from swtpu.ops.pallas_stream import sw_scores_stream

    rng = np.random.default_rng(0)
    m = n = 128
    B, Bs = 65536, 8192
    qh = rng.integers(0, 4, (B, m)).astype(np.int8)
    th = rng.integers(0, 4, (B, n)).astype(np.int8)
    cells, cells_s = B * m * n, Bs * m * n
    targets = list(th)
    big = pack_streams(qh[0], targets, n_streams=S)
    small = pack_streams(qh[0], targets[:Bs], n_streams=S)
    dq, ds_ = jax.device_put(big.q), jax.device_put(big.stream)
    es, ep = jax.device_put(big.emit_stream), jax.device_put(big.emit_step.astype(np.int32))
    dqs, dss = jax.device_put(small.q), jax.device_put(small.stream)
    ess, eps = jax.device_put(small.emit_stream), jax.device_put(small.emit_step.astype(np.int32))
    log(f"stream S={S}: T={big.stream.shape[1]} compiling/running...")
    tb = timed(lambda: np.asarray(sw_scores_stream(dq, ds_, es, ep)))
    tsml = timed(lambda: np.asarray(sw_scores_stream(dqs, dss, ess, eps)))
    g = (cells - cells_s) / (tb - tsml) / 1e9
    log(f"stream S={S}: big {tb*1e3:.1f} small {tsml*1e3:.1f} -> {g:.1f} GCUPS")


def _col_bench(state_dtype):
    from swtpu.ops.pallas_kernel import sw_scores_pallas

    rng = np.random.default_rng(0)
    m = n = 128
    B, Bs = 65536, 8192
    q = jax.device_put(rng.integers(0, 4, (B, m)).astype(np.int8))
    t = jax.device_put(rng.integers(0, 4, (B, n)).astype(np.int8))
    qs, ts = q[:Bs], t[:Bs]
    cells, cells_s = B * m * n, Bs * m * n
    kw = dict(block_pairs=1024, unroll=1, state_dtype=state_dtype)
    log(f"column {state_dtype} compiling/running...")
    tb = timed(lambda: np.asarray(sw_scores_pallas(q, t, **kw)))
    tsml = timed(lambda: np.asarray(sw_scores_pallas(qs, ts, **kw)))
    g = (cells - cells_s) / (tb - tsml) / 1e9
    log(f"column {state_dtype}: -> {g:.1f} GCUPS")


def _chain_stream(S=256, ks=(1, 11), state_dtype="int32", rows=1, chunk=None,
                  segments=1, score_width=None):
    """Robust timing: k *data-dependent* kernel calls inside one jit, so
    per-kernel device time = (T[k2]-T[k1])/(k2-k1) with every fixed cost
    (dispatch, transfers, tunnel jitter) cancelled.

    Multi-row bodies compile slowly on the remote service; pass short `ks`
    (e.g. (1, 5)) and/or a smaller `chunk`, and warm each k in its own run
    (ks=(k,)) so every process stays under the task cap and lands in the
    persistent cache."""
    import functools

    import jax.numpy as jnp

    from swtpu.bank.streams import pack_streams
    from swtpu.ops.pallas_stream import _strip_call, _to_kernel_layout

    from swtpu.config import DEFAULT_PENALTIES as pen

    rng = np.random.default_rng(0)
    m = n = 128 // segments  # segments=4: the reference's 32nt regime
    B = 65536 * segments * segments
    qh = rng.integers(0, 4, (1, m)).astype(np.int8)
    th = rng.integers(0, 4, (B, n)).astype(np.int8)
    targets = list(th)
    big = pack_streams(qh[0], targets, n_streams=S * segments,
                       segments=segments, rows=rows)
    qk, sk = _to_kernel_layout(big.q, big.stream, segments, rows)
    dq, ds_ = jax.device_put(qk), jax.device_put(sk)
    ma, mi, go, ge = pen.astuple()
    cells = B * m * n

    @functools.partial(jax.jit, static_argnames="k")
    def chain(qk, sk, k):
        acc = jnp.zeros((), jnp.int32)
        s_in = sk
        for _ in range(k):
            strip = _strip_call(qk, s_in, ma, mi, go, ge, False,
                                state_dtype=state_dtype, rows=rows,
                                chunk=chunk, seg=segments,
                                score_width=score_width)
            v = strip[-1, 0]  # data-dependent scalar
            acc = acc + v
            # force next call to depend on this result without changing data
            s_in = jnp.where(v < -(2**30), s_in + jnp.int8(1), s_in)
        return acc

    times = {}
    for k in ks:
        t0 = time.time()
        _ = np.asarray(chain(dq, ds_, k))  # compile+warm
        log(f"chain k={k}: compile+warm {time.time()-t0:.0f}s")
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            _ = np.asarray(chain(dq, ds_, k))
            best = min(best, time.time() - t0)
        times[k] = best
        log(f"chain k={k}: {best*1e3:.1f} ms")
    if len(ks) < 2:
        return
    k1, k2 = ks[0], ks[-1]
    per = (times[k2] - times[k1]) / (k2 - k1)
    w = f" W={score_width}" if score_width else ""
    log(f"stream S={S} seg={segments} {state_dtype}{w} rows={rows} chained: {per*1e3:.2f} ms/kernel"
        f" -> {cells/per/1e9:.1f} GCUPS")


def _chain_col(state_dtype="int32", ks=(1, 11)):
    import functools

    import jax.numpy as jnp

    from swtpu.ops.pallas_kernel import sw_scores_pallas

    rng = np.random.default_rng(0)
    m = n = 128
    B = 65536
    q = jax.device_put(rng.integers(0, 4, (B, m)).astype(np.int8))
    t = jax.device_put(rng.integers(0, 4, (B, n)).astype(np.int8))
    cells = B * m * n

    @functools.partial(jax.jit, static_argnames="k")
    def chain(q, t, k):
        acc = jnp.zeros((), jnp.int32)
        q_in = q
        for _ in range(k):
            s = sw_scores_pallas(q_in, t, block_pairs=1024, unroll=1,
                                 state_dtype=state_dtype)
            v = s[0]
            acc = acc + v
            q_in = jnp.where(v < -(2**30), q_in + jnp.int8(1), q_in)
        return acc

    times = {}
    for k in ks:
        _ = np.asarray(chain(q, t, k))
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            _ = np.asarray(chain(q, t, k))
            best = min(best, time.time() - t0)
        times[k] = best
        log(f"chain k={k}: {best*1e3:.1f} ms")
    k1, k2 = ks
    per = (times[k2] - times[k1]) / (k2 - k1)
    log(f"column {state_dtype} chained: {per*1e3:.2f} ms/kernel -> {cells/per/1e9:.1f} GCUPS")


def _e2e_dataset(db, queryf, scale=0):
    """Score a reference FASTA end-to-end on the real TPU via the ScoreBank
    stream backend (exercises segments=4 for 32nt queries), diff against the
    RTL golden, and (scale>0) measure end-to-end GCUPS/reads-per-second on
    the dataset tiled to ~`scale` reads (VERDICT item 4)."""
    from swtpu.bank.scorebank import ScoreBank
    from swtpu.cli import _load
    from swtpu.io.loader import EncodedDB
    from swtpu.testing.goldens import REFERENCE_DATA_DIR, parse_rtl_out_file

    query, names, targets = _load(
        str(REFERENCE_DATA_DIR / queryf), str(REFERENCE_DATA_DIR / db)
    )
    bank = ScoreBank(backend="stream", interpret=False)
    res = bank.score_database(query, targets)  # compile + warm
    res = bank.score_database(query, targets)
    golden = parse_rtl_out_file(REFERENCE_DATA_DIR / f"{db}_{queryf}_out.txt")
    bad = [
        nm for i, nm in enumerate(names)
        if nm in golden and golden[nm] != int(res.scores[i])
    ]
    log(
        f"e2e {db} vs {queryf}: {len(golden)} golden ids, "
        f"{len(bad)} mismatches ({bad[:5]}), {res.elapsed_s*1e3:.0f} ms"
    )
    if bad:
        return
    log("GOLDEN PARITY OK")
    if not scale:
        return
    reps = -(-scale // len(targets))
    mat = np.tile(targets.mat if isinstance(targets, EncodedDB) else np.stack(list(targets)), (reps, 1))
    lens = np.tile(targets.lens if isinstance(targets, EncodedDB) else
                   np.asarray([len(t) for t in targets]), reps)
    big = EncodedDB(["r"] * len(lens), mat, lens)
    r1 = bank.score_database(query, big)  # warm at this scale
    r1 = bank.score_database(query, big)
    ok = np.array_equal(
        r1.scores[: len(res.scores)], res.scores
    ) and np.array_equal(r1.scores[-len(res.scores):], res.scores)
    log(
        f"e2e scaled x{reps} ({len(lens)} reads): {r1.elapsed_s*1e3:.0f} ms "
        f"end-to-end -> {r1.gcups:.1f} GCUPS, "
        f"{len(lens)/r1.elapsed_s/1e6:.2f} Mreads/s, tiled-parity={'OK' if ok else 'FAIL'}"
    )


def _e2e_overlap(chunks=(0, 1 << 17), B=1 << 18, n=128, reps=3):
    """VERDICT r3 #2: transfer/compute overlap.  End-to-end ScoreBank
    timing (pack + wire + H2D + kernel + D2H) on B equal 128-nt reads,
    monolithic dispatch vs the pipelined chunked path; parity enforced
    between configs and against the oracle on a 64-read window."""
    from swtpu.bank.scorebank import ScoreBank
    from swtpu.config import SWConfig
    from swtpu.oracle import score_many_vs_one

    rng = np.random.default_rng(0)
    query = rng.integers(0, 4, size=128).astype(np.int8)
    th = rng.integers(0, 4, size=(B, n)).astype(np.int8)
    lens = np.full(B, n, np.int32)
    want64 = score_many_vs_one(query, list(th[:64]))
    base_scores = None
    for C in chunks:
        bank = ScoreBank(
            SWConfig(stream_chunk_reads=C), backend="stream", interpret=False
        )
        t0 = time.time()
        r = bank.score_database(query, (th, lens))  # compile + warm
        log(f"e2e chunk={C}: compile+warm {time.time()-t0:.0f}s")
        if not np.array_equal(r.scores[:64], want64):
            log(f"e2e chunk={C}: PARITY MISMATCH vs oracle")
            return
        if base_scores is None:
            base_scores = r.scores
        elif not np.array_equal(r.scores, base_scores):
            log(f"e2e chunk={C}: MISMATCH vs monolithic scores")
            return
        best = 1e9
        for _ in range(reps):
            r = bank.score_database(query, (th, lens))
            best = min(best, r.elapsed_s)
        log(
            f"e2e chunk={C}: best {best*1e3:.0f} ms -> "
            f"{B/best/1e6:.2f} Mreads/s, {r.cells/best/1e9:.1f} GCUPS e2e"
        )


def _loaded_db(B=1 << 18, n=128, reps=4):
    """Round-4: device-resident database serving.  Load once (one 2-bit
    wire crossing), then per-query e2e = query H2D (~64 KB) + kernel +
    score D2H — the many-queries pattern at kernel speed."""
    from swtpu.bank.scorebank import ScoreBank
    from swtpu.oracle import score_many_vs_one

    rng = np.random.default_rng(0)
    th = rng.integers(0, 4, size=(B, n)).astype(np.int8)
    lens = np.full(B, n, np.int32)
    bank = ScoreBank(backend="stream", interpret=False)
    t0 = time.time()
    db = bank.load_database((th, lens), max_query_len=2048)
    log(f"load_database: {B} reads in {time.time()-t0:.1f}s "
        f"(stream {np.shape(db.stream)})")
    for qlen in (128, 1024):
        query = rng.integers(0, 4, size=qlen).astype(np.int8)
        want64 = score_many_vs_one(query, list(th[:64]))
        t0 = time.time()
        r = bank.score_loaded(query, db)  # compile + warm
        log(f"score_loaded qlen={qlen}: compile+warm {time.time()-t0:.0f}s")
        if not np.array_equal(r.scores[:64], want64):
            log(f"qlen={qlen}: PARITY MISMATCH")
            return
        best = 1e9
        for _ in range(reps):
            r = bank.score_loaded(query, db)
            best = min(best, r.elapsed_s)
        log(
            f"score_loaded qlen={qlen}: best {best*1e3:.0f} ms -> "
            f"{B/best/1e6:.2f} Mreads/s per query, "
            f"{r.cells/best/1e9:.1f} GCUPS e2e"
        )


def _loaded_seg(B=1 << 18, n=32, nq=4):
    """Segmented short-query serving: a 32nt-class database loaded
    segments=4 (full wavefront occupancy), queries served per register."""
    from swtpu.bank.scorebank import ScoreBank
    from swtpu.oracle import score_many_vs_one

    rng = np.random.default_rng(0)
    th = rng.integers(0, 4, size=(B, n)).astype(np.int8)
    lens = np.full(B, n, np.int32)
    bank = ScoreBank(backend="stream", interpret=False)
    t0 = time.time()
    db = bank.load_database((th, lens), max_query_len=32)
    log(f"load seg db: {B} reads in {time.time()-t0:.1f}s "
        f"(segments={db.segments} rows={db.rows})")
    query = rng.integers(0, 4, size=32).astype(np.int8)
    want64 = score_many_vs_one(query, list(th[:64]))
    t0 = time.time()
    r = bank.score_loaded(query, db)
    log(f"score_loaded 32nt: compile+warm {time.time()-t0:.0f}s")
    if not np.array_equal(r.scores[:64], want64):
        log("PARITY MISMATCH")
        return
    best = 1e9
    for _ in range(nq):
        r = bank.score_loaded(query, db)
        best = min(best, r.elapsed_s)
    log(
        f"score_loaded 32nt seg4: best {best*1e3:.0f} ms -> "
        f"{B/best/1e6:.2f} Mreads/s per query, {r.cells/best/1e9:.1f} GCUPS e2e"
    )


def _loaded_serve(B=1 << 18, n=128, nq=8):
    """Serving-path variants on the resident database: on-device top-K
    (2k scalars D2H instead of 1 MB of scores) and pipelined multi-query
    dispatch."""
    from swtpu.bank.scorebank import ScoreBank
    from swtpu.oracle import score_many_vs_one

    rng = np.random.default_rng(0)
    th = rng.integers(0, 4, size=(B, n)).astype(np.int8)
    lens = np.full(B, n, np.int32)
    bank = ScoreBank(backend="stream", interpret=False)
    t0 = time.time()
    db = bank.load_database((th, lens))
    log(f"load_database: {B} reads in {time.time()-t0:.1f}s")
    queries = [rng.integers(0, 4, size=128).astype(np.int8) for _ in range(nq)]
    # warm both executables
    r = bank.score_loaded(queries[0], db)
    want = score_many_vs_one(queries[0], list(th[:64]))
    if not np.array_equal(r.scores[:64], want):
        log("PARITY MISMATCH")
        return
    t0 = time.time()
    top = bank.topk_loaded(queries[0], db, k=10)
    log(f"topk_loaded warm (incl. compile): {time.time()-t0:.1f}s")
    host_top = r.top_k(10)
    log(f"topk parity: {'OK' if top == host_top else 'MISMATCH'} ({top[:3]})")
    best = 1e9
    for _ in range(4):
        t0 = time.time()
        bank.topk_loaded(queries[1], db, k=10)
        best = min(best, time.time() - t0)
    log(f"topk_loaded per query: {best*1e3:.0f} ms -> {B/best/1e6:.2f} Mreads/s")
    # pipelined multi-query
    bank.score_loaded_many(queries[:2], db)  # warm
    t0 = time.time()
    results = bank.score_loaded_many(queries, db)
    dt = time.time() - t0
    ok = np.array_equal(results[0].scores[:64], want)
    log(
        f"score_loaded_many: {nq} queries in {dt*1e3:.0f} ms -> "
        f"{nq*B/dt/1e6:.2f} Mreads/s aggregate, parity {'OK' if ok else 'FAIL'}"
    )


def _shmosaic_smoke():
    """VERDICT r3 #1 (part 1): the production sharded stream scorer
    (make_sharded_stream_scorer) compiled as REAL Mosaic (interpret=False)
    under shard_map on a mesh(1) over the real chip — the one multi-chip
    compile this environment can validate.  Full parity on ragged reads +
    collective top-K."""
    from swtpu.bank.streams import pack_streams_sharded, scatter_sharded_scores
    from swtpu.oracle import score_many_vs_one
    from swtpu.parallel import make_mesh, make_sharded_stream_scorer

    rng = np.random.default_rng(7)
    targets = [
        rng.integers(0, 4, size=rng.integers(3, 90)).astype(np.int8)
        for _ in range(41)
    ]
    query = rng.integers(0, 4, size=100).astype(np.int8)
    want = score_many_vs_one(query, targets)
    batch = pack_streams_sharded(query, targets, n_shards=1, n_streams=128)
    mesh = make_mesh(1)
    scorer = make_sharded_stream_scorer(mesh, interpret=False, k=3)
    t0 = time.time()
    s, ts, tids = scorer(
        batch.q, batch.stream, batch.emit_stream,
        batch.emit_step.astype(np.int32), batch.ids,
    )
    s, ts, tids = np.asarray(s), np.asarray(ts), np.asarray(tids)
    log(f"sharded mosaic smoke: compiled+ran in {time.time()-t0:.0f}s")
    got = scatter_sharded_scores(s, batch, len(targets))
    bad = np.nonzero(got != want)[0]
    log(f"parity: {len(bad)} mismatches / {len(targets)}")
    top_ok = list(ts) == sorted(want, reverse=True)[:3]
    log(f"collective top-3: {ts} ids={tids} ({'OK' if top_ok else 'MISMATCH'})")
    if len(bad) == 0 and top_ok:
        log("SHARDED MOSAIC SMOKE OK")


def _parity_biased(rows=16, S=128, W=7):
    """Compiled-TPU parity of the biased (wrap-parity) stream kernel vs the
    contract oracle, on wrap-inducing high-identity reads (round-4: the
    SCORE_WIDTH mode at flagship speed)."""
    from swtpu.bank.streams import pack_streams
    from swtpu.oracle import sw_score_single_biased
    from swtpu.ops.pallas_stream import sw_scores_stream

    rng = np.random.default_rng(50 + rows)
    query = rng.integers(0, 4, size=100).astype(np.int8)
    targets = [
        rng.integers(0, 4, size=int(rng.integers(5, 90))).astype(np.int8)
        for _ in range(30)
    ]
    for k in (20, 40, 60, 80, 100):  # wrap regime at W=7 (ceiling 63)
        targets.append(query[:k].copy())
    want = np.array(
        [sw_score_single_biased(query, t, score_width=W) for t in targets],
        np.int32,
    )
    b = pack_streams(query, targets, n_streams=S, rows=rows)
    log(f"biased rows={rows} W={W} T={b.stream.shape[1]} compiling/running...")
    got = np.asarray(
        sw_scores_stream(
            b.q, b.stream, b.emit_stream, b.emit_step.astype(np.int32),
            rows=rows, state_dtype="int32", score_width=W,
        )
    )
    bad = np.nonzero(got != want)[0]
    log(f"biased parity rows={rows}: {len(bad)} mismatches / {len(targets)}")
    for i in bad[:5]:
        log(f"  read {i}: want {want[i]} got {got[i]}")
    if len(bad) == 0:
        log("BIASED PARITY OK")


def _shmosaic_long(qlen=300, rows=16, S=128):
    """Round-4 review fix validation: the sharded stream scorer's
    chained-tile dispatch (queries > 128 bases) as real Mosaic on mesh(1)."""
    from swtpu.bank.streams import pack_streams_sharded, scatter_sharded_scores
    from swtpu.oracle import score_many_vs_one
    from swtpu.parallel import make_mesh, make_sharded_stream_scorer

    rng = np.random.default_rng(8)
    targets = [
        rng.integers(0, 4, size=rng.integers(3, 90)).astype(np.int8)
        for _ in range(41)
    ]
    query = rng.integers(0, 4, size=qlen).astype(np.int8)
    want = score_many_vs_one(query, targets)
    batch = pack_streams_sharded(
        query, targets, n_shards=1, n_streams=S, rows=rows
    )
    mesh = make_mesh(1)
    scorer = make_sharded_stream_scorer(mesh, interpret=False, k=3, rows=rows)
    t0 = time.time()
    s, ts, tids = scorer(
        batch.q, batch.stream, batch.emit_stream,
        batch.emit_step.astype(np.int32), batch.ids,
    )
    s, ts = np.asarray(s), np.asarray(ts)
    log(f"sharded long mosaic: compiled+ran in {time.time()-t0:.0f}s")
    got = scatter_sharded_scores(s, batch, len(targets))
    bad = np.nonzero(got != want)[0]
    top_ok = list(ts) == sorted(want, reverse=True)[:3]
    log(f"parity: {len(bad)} mismatches / {len(targets)}; top-3 "
        f"{'OK' if top_ok else 'MISMATCH'}")
    if len(bad) == 0 and top_ok:
        log("SHARDED LONG MOSAIC OK")


def _parity_biased_seg(rows=4, segments=4, S=128, W=7):
    """Biased wrap-parity on the segmented short-query config (the 32nt
    workload class), compiled Mosaic."""
    from swtpu.bank.streams import pack_streams
    from swtpu.oracle import sw_score_single_biased
    from swtpu.ops.pallas_stream import sw_scores_stream

    rng = np.random.default_rng(60)
    query = rng.integers(0, 4, size=30).astype(np.int8)
    targets = [
        rng.integers(0, 4, size=int(rng.integers(5, 60))).astype(np.int8)
        for _ in range(30)
    ]
    for k in (15, 22, 30):
        targets.append(np.tile(query[:k], 3).copy())  # wrap regime
    want = np.array(
        [sw_score_single_biased(query, t, score_width=W) for t in targets],
        np.int32,
    )
    b = pack_streams(
        query, targets, n_streams=S * segments, segments=segments, rows=rows
    )
    log(f"biased seg={segments} rows={rows} W={W} compiling/running...")
    got = np.asarray(
        sw_scores_stream(
            b.q, b.stream, b.emit_stream, b.emit_step.astype(np.int32),
            segments=segments, rows=rows, state_dtype="int32", score_width=W,
        )
    )
    bad = np.nonzero(got != want)[0]
    log(f"biased seg parity: {len(bad)} mismatches / {len(targets)}")
    if len(bad) == 0:
        log("BIASED SEG PARITY OK")


def _shmosaic_chain(ks=(1, 5), rows=16, S=512, B=65536, state_dtype="float32",
                    check_top=True, k_top=3, use_regular=False):
    """VERDICT r3 #1: the flagship config (rows=16, f32, S=512) as real
    Mosaic under shard_map on mesh(1) — scan-chain GCUPS + 64-read parity.
    Calls the literal production function (make_sharded_stream_scorer with
    k=3: per-shard scoring + collective top-K merge)."""
    import functools

    import jax.numpy as jnp

    from swtpu.bank.streams import pack_streams_sharded
    from swtpu.oracle import score_many_vs_one
    from swtpu.parallel import make_mesh, make_sharded_stream_scorer

    rng = np.random.default_rng(0)
    m = n = 128
    query = rng.integers(0, 4, size=m).astype(np.int8)
    th = rng.integers(0, 4, size=(B, n)).astype(np.int8)
    batch = pack_streams_sharded(
        query, list(th), n_shards=1, n_streams=S, rows=rows
    )
    want = score_many_vs_one(query, th[:64])
    want_top3 = None
    if check_top:
        t0 = time.time()
        want_top3 = np.sort(score_many_vs_one(query, th))[-3:][::-1]
        log(f"oracle top-3 in {time.time()-t0:.0f}s: {want_top3}")
    mesh = make_mesh(1)
    if use_regular:
        log(f"regular extraction: {batch.emit_regular}")
    scorer = make_sharded_stream_scorer(
        mesh, interpret=False, rows=rows, state_dtype=state_dtype, k=k_top,
        emit_regular=batch.emit_regular if use_regular else None,
    )
    dq = jax.device_put(batch.q)
    dstream = jax.device_put(batch.stream)
    des = jax.device_put(batch.emit_stream)
    dep = jax.device_put(batch.emit_step.astype(np.int32))
    dids = jax.device_put(batch.ids)
    cells = batch.cells

    @functools.partial(jax.jit, static_argnames="k")
    def chain(q, stream, es, ep, ids, k):
        def body(carry, _):
            q_c, acc = carry
            if k_top:
                s, ts, tids = scorer(q_c, stream, es, ep, ids)
            else:
                s = scorer(q_c, stream, es, ep, ids)
                ts = s[0, :3]
            v = s[0, 0]
            q_n = jnp.where(v < -(2 ** 30), q_c + jnp.int8(1), q_c)
            return (q_n, acc + v), (s[0, :64], ts)

        (_, acc), (wins, ts) = jax.lax.scan(
            body, (q, jnp.int32(0)), None, length=k
        )
        return acc, wins[-1], ts[-1]

    times = {}
    for k in ks:
        t0 = time.time()
        out = [np.asarray(x) for x in chain(dq, dstream, des, dep, dids, k)]
        log(f"shmosaic k={k}: compile+warm {time.time()-t0:.0f}s")
        ok = np.array_equal(out[1], want)
        top_ok = want_top3 is None or np.array_equal(out[2], want_top3)
        log(f"shmosaic parity first-64: {'OK' if ok else 'MISMATCH'}; "
            f"top-3 {'OK' if top_ok else 'unchecked'} ({out[2]})")
        if not ok:
            return
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            _ = [np.asarray(x) for x in chain(dq, dstream, des, dep, dids, k)]
            best = min(best, time.time() - t0)
        times[k] = best
        log(f"shmosaic k={k}: {best*1e3:.1f} ms")
    if len(ks) < 2:
        return
    k1, k2 = ks[0], ks[-1]
    per = (times[k2] - times[k1]) / (k2 - k1)
    log(
        f"sharded-mosaic mesh(1) rows={rows} S={S} {state_dtype}: "
        f"{per*1e3:.2f} ms/kernel -> {cells/per/1e9:.1f} GCUPS "
        f"(floor {cells*k2/times[k2]/1e9:.1f})"
    )


def _bench_stage(name, **env):
    """Run one bench.py stage in-process (env set before bench imports)."""
    import os

    os.environ.update(env)
    import bench

    res = bench.STAGES[name]()
    log(f"bench stage {name} env={env}: {res}")


def warm_entry():
    """Compile __graft_entry__.entry()'s exact jit into .jaxcache (the
    driver compile-checks it; the entry is force-committed)."""
    import importlib.util

    from swtpu.oracle import score_many_vs_one

    spec = importlib.util.spec_from_file_location(
        "graft_entry", str(Path(__file__).parents[1] / "__graft_entry__.py")
    )
    ge = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ge)
    fn, args = ge.entry()
    t0 = time.time()
    out = np.asarray(jax.jit(fn)(*args))
    log(f"entry compiled+ran in {time.time()-t0:.0f}s, out shape {out.shape}")
    # parity of the first 64 scores vs the oracle (args are the packed batch)
    rng = np.random.default_rng(0)
    q = rng.integers(0, 4, size=128).astype(np.int8)
    t = rng.integers(0, 4, size=(8192, 128)).astype(np.int8)
    want = score_many_vs_one(q, t[:64])
    ok = np.array_equal(out[:64], want)
    log(f"entry parity first-64: {'OK' if ok else 'MISMATCH'}")


def _chain_long(K, ks=(1, 5), state_dtype="float32", rows=16, S=512, B=65536,
                score_width=None, parity_reads=64, n=128, chunk=None):
    """Long-query chained-tile kernel (sw_scores_stream_long) throughput via
    the in-jit scan-chain method, with a parity window (vs the exact oracle,
    or the BIASED contract oracle when score_width is set — round-5
    wrap-parity on the chained tiles)."""
    import functools

    import jax.numpy as jnp

    from swtpu.bank.streams import pack_streams_long
    from swtpu.oracle import score_many_vs_one, sw_score_single_biased
    from swtpu.ops.pallas_stream import sw_scores_stream_long

    rng = np.random.default_rng(0)
    m = K * 128
    query = rng.integers(0, 4, size=m).astype(np.int8)
    th = rng.integers(0, 4, size=(B, n)).astype(np.int8)
    if score_width is not None:
        # wrap-regime coverage: the first reads are high-identity slices of
        # the query; with n >= ~(2^(W-1))/match the exact score blows past
        # the W-bit ceiling and the wrap genuinely fires
        for i in range(8):
            th[i] = np.resize(query[i:], n)
    b = pack_streams_long(
        query, th, n_streams=S, rows=rows,
        lens=np.full(B, n, np.int32),
    )
    dq, ds_ = jax.device_put(b.q), jax.device_put(b.stream)
    P = parity_reads
    es = jax.device_put(b.emit_stream[:P])
    ep = jax.device_put(b.emit_step[:P].astype(np.int32))
    if score_width is not None:
        state_dtype = "int32"
        want = np.array(
            [sw_score_single_biased(query, t, score_width=score_width)
             for t in th[:P]], np.int32,
        )
        exact = score_many_vs_one(query, th[:2])
        log(f"biased parity window: exact[0]={exact[0]} "
            f"biased[0]={want[0]} (wrap {'FIRES' if want[0] != exact[0] else 'inactive'})")
    else:
        want = score_many_vs_one(query, th[:P])
    cells = b.cells

    @functools.partial(jax.jit, static_argnames="k")
    def chain(q, stream, es, ep, k):
        def body(carry, _):
            q_c, acc = carry
            s = sw_scores_stream_long(
                q_c, stream, es, ep, state_dtype=state_dtype, rows=rows,
                score_width=score_width, chunk=chunk,
            )
            v = s[0]
            q_n = jnp.where(v < -(2**30), q_c + jnp.int8(1), q_c)
            return (q_n, acc + v), s

        (_, acc), ys = jax.lax.scan(body, (q, jnp.int32(0)), None, length=k)
        return acc, ys[-1]

    times = {}
    for k in ks:
        t0 = time.time()
        out = [np.asarray(x) for x in chain(dq, ds_, es, ep, k)]
        log(f"long K={K} k={k}: compile+warm {time.time()-t0:.0f}s")
        ok = np.array_equal(out[1], want)
        log(f"long K={K}{' W='+str(score_width) if score_width else ''} "
            f"parity first-{len(want)}: {'OK' if ok else 'MISMATCH'}")
        if not ok:
            return
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            _ = [np.asarray(x) for x in chain(dq, ds_, es, ep, k)]
            best = min(best, time.time() - t0)
        times[k] = best
        log(f"long K={K} k={k}: {best*1e3:.1f} ms")
    if len(ks) < 2:
        return
    k1, k2 = ks[0], ks[-1]
    per = (times[k2] - times[k1]) / (k2 - k1)
    log(
        f"stream_long K={K} S={S} {state_dtype} rows={rows}"
        f"{' W='+str(score_width) if score_width else ''} chained: "
        f"{per*1e3:.2f} ms/kernel -> {cells/per/1e9:.1f} GCUPS "
        f"(floor {cells*k2/times[k2]/1e9:.1f})"
    )


def _chain_pairs(ks=(1, 5), state_dtype="float32", rows=16, S=512,
                 U=64, per_q=4096):
    """Many-vs-many (pack_pair_streams: distinct queries in per-stream query
    registers) throughput via the scan-chain method + 64-pair parity."""
    import functools

    import jax.numpy as jnp

    from swtpu.bank.streams import pack_pair_streams
    from swtpu.config import DEFAULT_PENALTIES as pen
    from swtpu.oracle import sw_score_batch
    from swtpu.ops.pallas_stream import _strip_call, _to_kernel_layout

    rng = np.random.default_rng(0)
    n = 128
    qpool = [rng.integers(0, 4, size=128).astype(np.int8) for _ in range(U)]
    B = U * per_q
    th = rng.integers(0, 4, size=(B, n)).astype(np.int8)
    queries = [qpool[i % U] for i in range(B)]
    t0 = time.time()
    b = pack_pair_streams(queries, list(th), n_streams=S, rows=rows)
    log(f"pack_pair_streams: {B} pairs, {U} queries in {time.time()-t0:.1f}s "
        f"T={b.stream.shape[1]}")
    qk, sk = _to_kernel_layout(b.q, b.stream, 1, rows)
    dq, ds_ = jax.device_put(qk), jax.device_put(sk)
    es = jax.device_put(b.emit_stream[:64])
    ep = jax.device_put(b.emit_step[:64].astype(np.int32))
    want = sw_score_batch(
        np.stack(queries[:64]), th[:64],
    )
    ma, mi, go, ge = pen.astuple()
    cells = b.cells

    @functools.partial(jax.jit, static_argnames="k")
    def chain(qk, sk, es, ep, k):
        def body(carry, _):
            qk_c, acc = carry
            strip = _strip_call(qk_c, sk, ma, mi, go, ge, False,
                                state_dtype=state_dtype, rows=rows)
            v = strip[-1, 0]
            qk_n = jnp.where(v < -(2**30), qk_c + jnp.int8(1), qk_c)
            return (qk_n, acc + v), strip[ep, es]

        (_, acc), ys = jax.lax.scan(body, (qk, jnp.int32(0)), None, length=k)
        return acc, ys[-1]

    times = {}
    for k in ks:
        t0 = time.time()
        out = [np.asarray(x) for x in chain(dq, ds_, es, ep, k)]
        log(f"pairs k={k}: compile+warm {time.time()-t0:.0f}s")
        ok = np.array_equal(out[1], want)
        log(f"pairs parity first-64: {'OK' if ok else 'MISMATCH'}")
        if not ok:
            return
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            _ = [np.asarray(x) for x in chain(dq, ds_, es, ep, k)]
            best = min(best, time.time() - t0)
        times[k] = best
        log(f"pairs k={k}: {best*1e3:.1f} ms")
    if len(ks) < 2:
        return
    k1, k2 = ks[0], ks[-1]
    per = (times[k2] - times[k1]) / (k2 - k1)
    log(
        f"pair_streams U={U} S={S} {state_dtype} rows={rows} chained: "
        f"{per*1e3:.2f} ms/kernel -> {cells/per/1e9:.1f} GCUPS "
        f"(floor {cells*k2/times[k2]/1e9:.1f})"
    )




def _loaded_sharded(B=1 << 18, n=128, reps=4, topk=True):
    """Round-5 (VERDICT #1): the sharded device-resident serving path on
    mesh(1) over the real chip — load_database_sharded + shard_map'd
    score_loaded_sharded / topk_loaded_sharded, compiled Mosaic.  Parity
    window vs the oracle + one Mreads/s-per-query point."""
    from swtpu.bank.scorebank import ScoreBank
    from swtpu.oracle import score_many_vs_one
    from swtpu.parallel import make_mesh

    rng = np.random.default_rng(0)
    th = rng.integers(0, 4, size=(B, n)).astype(np.int8)
    lens = np.full(B, n, np.int32)
    bank = ScoreBank(backend="stream", interpret=False)
    mesh = make_mesh(1)
    t0 = time.time()
    db = bank.load_database_sharded((th, lens), mesh, max_query_len=1024)
    log(f"load_database_sharded: {B} reads in {time.time()-t0:.1f}s "
        f"(stream {np.shape(db.stream)} shards={db.n_shards} "
        f"regular={db.emit_regular})")
    for qlen in (128, 1024):
        query = rng.integers(0, 4, size=qlen).astype(np.int8)
        want64 = score_many_vs_one(query, list(th[:64]))
        t0 = time.time()
        r = bank.score_loaded_sharded(query, db)  # compile + warm
        log(f"score_loaded_sharded qlen={qlen}: compile+warm {time.time()-t0:.0f}s")
        if not np.array_equal(r.scores[:64], want64):
            log(f"qlen={qlen}: PARITY MISMATCH "
                f"got {r.scores[:8]} want {want64[:8]}")
            return
        best = 1e9
        for _ in range(reps):
            r = bank.score_loaded_sharded(query, db)
            best = min(best, r.elapsed_s)
        log(
            f"score_loaded_sharded qlen={qlen}: best {best*1e3:.0f} ms -> "
            f"{B/best/1e6:.2f} Mreads/s per query, "
            f"{r.cells/best/1e9:.1f} GCUPS e2e"
        )
        if topk and qlen == 128:
            t0 = time.time()
            top = bank.topk_loaded_sharded(query, db, k=5)
            log(f"topk_loaded_sharded: compile+warm {time.time()-t0:.0f}s "
                f"top={top[:3]}")
            # cross-check vs full scores
            want_top = r.top_k(5)
            log(f"topk parity: {'OK' if top == want_top else 'MISMATCH'}")
            best = 1e9
            for _ in range(reps):
                t0 = time.time()
                bank.topk_loaded_sharded(query, db, k=5)
                best = min(best, time.time() - t0)
            log(f"topk_loaded_sharded: best {best*1e3:.0f} ms -> "
                f"{B/best/1e6:.2f} Mreads/s per query (2k-scalar D2H)")


def _gather_ablate(B=1 << 18, n=128, S=512, rows=16, reps=4):
    """Round-5 isolation: the same kernel + three extraction epilogues —
    scattered gather (round-4 product), flat 1-D gather, strided regular
    extraction — timed via the k-chain method so dispatch cancels."""
    import functools

    import jax.numpy as jnp

    from swtpu.bank.streams import pack_streams
    from swtpu.ops.pallas_stream import _strip_call, _to_kernel_layout
    from swtpu.config import DEFAULT_PENALTIES

    rng = np.random.default_rng(0)
    query = rng.integers(0, 4, size=128).astype(np.int8)
    th = rng.integers(0, 4, size=(B, n)).astype(np.int8)
    b = pack_streams(query, th, n_streams=S, rows=rows)
    qk, sk = _to_kernel_layout(b.q, b.stream, 1, rows)
    dq, ds = jax.device_put(qk), jax.device_put(sk)
    des = jax.device_put(b.emit_stream.astype(np.int32))
    dep = jax.device_put(b.emit_step.astype(np.int32))
    ma, mi, go, ge = DEFAULT_PENALTIES.astuple()
    reg = b.emit_regular
    log(f"emit_regular={reg} T={b.stream.shape[1]}")

    def mk(extract):
        @functools.partial(jax.jit, static_argnames="k")
        def chain(qk_, sk_, es, ep, k):
            def body(carry, _):
                q_c, acc = carry
                strip = _strip_call(
                    q_c, sk_, ma, mi, go, ge, False,
                    state_dtype="float32", rows=rows,
                )
                sc = extract(strip, es, ep)
                v = sc[0]
                q_n = jnp.where(v < -(2 ** 30), q_c + jnp.int8(1), q_c)
                return (q_n, acc + v), sc[:64]
            (_, acc), wins = jax.lax.scan(body, (qk_, jnp.int32(0)), None, length=k)
            return acc, wins[-1]
        return chain

    def ex_gather(strip, es, ep):
        return strip[ep, es]

    def ex_flat(strip, es, ep):
        return strip.reshape(-1)[ep * strip.shape[1] + es]

    first, stride, count = reg

    def ex_reg(strip, es, ep):
        return jax.lax.slice_in_dim(
            strip, first, first + (count - 1) * stride + 1, stride, axis=0
        ).reshape(-1)

    want = None
    for name, ex in (("gather2d", ex_gather), ("flat", ex_flat), ("regular", ex_reg)):
        chain = mk(ex)
        times = {}
        for k in (1, 17):
            t0 = time.time()
            out = [np.asarray(x) for x in chain(dq, ds, des, dep, k)]
            log(f"{name} k={k}: compile+warm {time.time()-t0:.0f}s")
            if want is None:
                want = out[1]
            elif not np.array_equal(out[1], want):
                log(f"{name}: EXTRACT MISMATCH")
                break
            best = 1e9
            for _ in range(reps):
                t0 = time.time()
                _ = [np.asarray(x) for x in chain(dq, ds, des, dep, k)]
                best = min(best, time.time() - t0)
            times[k] = best
        if len(times) == 2:
            per = (times[17] - times[1]) / 16
            log(f"extract={name}: {per*1e3:.2f} ms/kernel -> "
                f"{b.cells/per/1e9:.1f} GCUPS")


def _serve_socket_hw(B=1 << 18, n=128, n_clients=2, per_client=6):
    """Round-5 stretch #9 on hardware: the multi-client socket daemon
    fronting a DEVICE-RESIDENT database on the real chip — N concurrent
    clients, SEQ + TOP interleaved, responses parity-checked, queries/s
    measured (the PSLSE multi-context pattern at kernel speed)."""
    import socket
    import tempfile
    import threading

    from swtpu.bank.scorebank import ScoreBank
    from swtpu.oracle import score_many_vs_one
    from swtpu.server import ServeEngine, client_request, serve_socket
    from swtpu.io.encode import CODE_BASES

    rng = np.random.default_rng(0)
    th = rng.integers(0, 4, size=(B, n)).astype(np.int8)
    lens = np.full(B, n, np.int32)
    bank = ScoreBank(backend="stream", interpret=False)
    t0 = time.time()
    db = bank.load_database((th, lens), max_query_len=128)
    log(f"serve_socket_hw: loaded {B} reads in {time.time()-t0:.1f}s")
    names = [f"db{i+1}" for i in range(B)]
    engine = ServeEngine(bank, names, None, db=db)
    path = tempfile.mktemp(prefix="swtpu_hw_", suffix=".sock")
    ready = threading.Event()
    th_srv = threading.Thread(
        target=serve_socket,
        kwargs=dict(engine=engine, unix_path=path, ready_event=ready),
        daemon=True,
    )
    th_srv.start()
    assert ready.wait(30)
    srv = ready.server
    queries = [rng.integers(0, 4, size=int(rng.integers(40, 129))).astype(np.int8)
               for _ in range(n_clients * per_client)]
    # (full 262Ki-read oracle per query is too slow here; correctness is
    # covered by the response-shape checks + the SEQ 64-read parity window
    # at the end — the kernels themselves are parity-proven elsewhere)
    results = {}
    errs = []

    def client(cid):
        try:
            sck = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            sck.connect(path)
            t0 = time.time()
            n_ok = 0
            for j in range(per_client):
                qi = cid * per_client + j
                seq = "".join(CODE_BASES[int(c)] for c in queries[qi])
                top = client_request(sck, f"TOP 3 {seq}")
                if len(top) != 3 or not top[0].startswith("# top:"):
                    errs.append(f"client{cid} q{j}: bad TOP {top[:1]}")
                    continue
                n_ok += 1
            dt = time.time() - t0
            sck.sendall(b"QUIT\n")
            sck.close()
            results[cid] = (n_ok, dt)
        except Exception as e:  # noqa: BLE001
            errs.append(f"client{cid}: {e!r}")

    # warm the kernel once through the engine (first client would pay it)
    t0 = time.time()
    engine.handle("TOP 3 " + "".join(CODE_BASES[int(c)] for c in queries[0]))
    log(f"serve_socket_hw: warm dispatch {time.time()-t0:.0f}s")
    threads = [threading.Thread(target=client, args=(c,)) for c in range(n_clients)]
    t0 = time.time()
    for t_ in threads:
        t_.start()
    for t_ in threads:
        t_.join(300)
    wall = time.time() - t0
    total = sum(r[0] for r in results.values())
    for e in errs[:5]:
        log(f"  ERR {e}")
    log(f"serve_socket_hw: {n_clients} concurrent clients x {per_client} "
        f"TOP queries vs {B}-read resident db: {total} ok in {wall:.1f}s "
        f"-> {total/wall:.1f} queries/s ({total/wall*B/1e6:.2f} Mreads/s agg)")
    # parity: one SEQ answer vs the oracle on a 64-read window
    seq = "".join(CODE_BASES[int(c)] for c in queries[0])
    lines = engine.handle(f"SEQ {seq}")
    got64 = np.array([int(l.rsplit("\t", 1)[1]) for l in lines[:64]], np.int32)
    want64 = score_many_vs_one(queries[0], list(th[:64]))
    log(f"serve_socket_hw parity first-64: "
        f"{'OK' if np.array_equal(got64, want64) else 'MISMATCH'}")
    srv.shutdown()


def _loaded_sharded_seg(B=1 << 18, n=32, reps=4):
    """Sharded segmented serving on mesh(1): a 32nt-class database loaded
    segments=4 across the mesh (the short-read serving class that hit 4.5
    Mreads/s single-chip in round 4)."""
    from swtpu.bank.scorebank import ScoreBank
    from swtpu.oracle import score_many_vs_one
    from swtpu.parallel import make_mesh

    rng = np.random.default_rng(0)
    th = rng.integers(0, 4, size=(B, n)).astype(np.int8)
    lens = np.full(B, n, np.int32)
    bank = ScoreBank(backend="stream", interpret=False)
    mesh = make_mesh(1)
    t0 = time.time()
    db = bank.load_database_sharded((th, lens), mesh, max_query_len=32)
    log(f"loaded_sharded_seg: {B} reads in {time.time()-t0:.1f}s "
        f"(segments={db.segments} rows={db.rows} regular={db.emit_regular})")
    query = rng.integers(0, 4, size=32).astype(np.int8)
    want64 = score_many_vs_one(query, list(th[:64]))
    t0 = time.time()
    r = bank.score_loaded_sharded(query, db)
    log(f"score_loaded_sharded 32nt: compile+warm {time.time()-t0:.0f}s")
    if not np.array_equal(r.scores[:64], want64):
        log("PARITY MISMATCH")
        return
    best = 1e9
    for _ in range(reps):
        r = bank.score_loaded_sharded(query, db)
        best = min(best, r.elapsed_s)
    log(f"score_loaded_sharded 32nt: best {best*1e3:.0f} ms -> "
        f"{B/best/1e6:.2f} Mreads/s per query, {r.cells/best/1e9:.1f} GCUPS e2e")


STEPS = {
    "probe": probe,
    "parity": parity,
    "bench_s256": lambda: _stream_bench(256),
    "bench_s1024": lambda: _stream_bench(1024),
    "bench_f32": lambda: _col_bench("float32"),
    "bench_col": lambda: _col_bench("int32"),
    "bench_i16": lambda: _col_bench("int16"),
    "chain_stream": lambda: _chain_stream(256),
    "chain_stream_f32": lambda: _chain_stream(256, state_dtype="float32"),
    "chain_stream_s512": lambda: _chain_stream(512),
    "chain_stream_s512_f32": lambda: _chain_stream(512, state_dtype="float32"),
    "parity_r2": lambda: _parity_rows(2),
    "parity_r8": lambda: _parity_rows(8),
    "parity_r16": lambda: _parity_rows(16),
    "parity_r4_seg4": lambda: _parity_rows(4, segments=4),
    "parity_r16_seg4": lambda: _parity_rows(16, segments=4),
    "chain_stream_r2": lambda: _chain_stream(512, rows=2),
    # multi-row bodies compile slowly: warm k=1 and k=5 in separate runs
    # (persistent cache), then the measuring step is compile-free
    "warm_r4_k1": lambda: _chain_stream(512, ks=(1,), rows=4),
    "warm_r4_k5": lambda: _chain_stream(512, ks=(5,), rows=4),
    "chain_stream_r4": lambda: _chain_stream(512, ks=(1, 5), rows=4),
    "warm_r8_k1": lambda: _chain_stream(512, ks=(1,), rows=8),
    "warm_r8_k5": lambda: _chain_stream(512, ks=(5,), rows=8),
    "chain_stream_r8": lambda: _chain_stream(512, ks=(1, 5), rows=8),
    "warm_r16_k1": lambda: _chain_stream(512, ks=(1,), rows=16),
    "warm_r16_k5": lambda: _chain_stream(512, ks=(5,), rows=16),
    "chain_stream_r16": lambda: _chain_stream(512, ks=(1, 5), rows=16),
    "warm_r8_f32_k1": lambda: _chain_stream(512, ks=(1,), rows=8, state_dtype="float32"),
    "warm_r8_f32_k5": lambda: _chain_stream(512, ks=(5,), rows=8, state_dtype="float32"),
    "chain_stream_r8_f32": lambda: _chain_stream(512, ks=(1, 5), rows=8, state_dtype="float32"),
    "chain_stream_r8_s1024": lambda: _chain_stream(1024, ks=(1, 5), rows=8),
    "chain_stream_r16_s1024": lambda: _chain_stream(1024, ks=(1, 5), rows=16),
    "chain_stream_r16_s256": lambda: _chain_stream(256, ks=(1, 5), rows=16),
    "chain_stream_r16_c16": lambda: _chain_stream(512, ks=(1, 5), rows=16, chunk=16),
    "chain_stream_r16_f32": lambda: _chain_stream(512, ks=(1, 5), rows=16, state_dtype="float32"),
    # round-3 S-tuning at the f32 headline config (the int32 sweet spot was
    # S=512; f32 may shift it)
    "chain_stream_r16_f32_s256": lambda: _chain_stream(256, ks=(1, 5), rows=16, state_dtype="float32"),
    "chain_stream_r16_f32_s1024": lambda: _chain_stream(1024, ks=(1, 5), rows=16, state_dtype="float32"),
    "chain_stream_r16_seg4": lambda: _chain_stream(512, ks=(1, 5), rows=16, segments=4),
    "chain_stream_r4_seg4": lambda: _chain_stream(512, ks=(1, 5), rows=4, segments=4),
    "chain_stream_r8_seg4": lambda: _chain_stream(512, ks=(1, 5), rows=8, segments=4),
    "chain_stream_r8_seg2": lambda: _chain_stream(512, ks=(1, 5), rows=8, segments=2),
    "parity_i16": lambda: _parity_rows(1, state_dtype="int16"),
    "parity_r8_i16": lambda: _parity_rows(8, state_dtype="int16"),
    "chain_stream_i16": lambda: _chain_stream(512, state_dtype="int16"),
    "warm_r8_i16_k1": lambda: _chain_stream(512, ks=(1,), rows=8, state_dtype="int16"),
    "warm_r8_i16_k5": lambda: _chain_stream(512, ks=(5,), rows=8, state_dtype="int16"),
    "chain_stream_r8_i16": lambda: _chain_stream(512, ks=(1, 5), rows=8, state_dtype="int16"),
    "warm_r4_i16_k1": lambda: _chain_stream(512, ks=(1,), rows=4, state_dtype="int16"),
    "warm_r4_i16_k5": lambda: _chain_stream(512, ks=(5,), rows=4, state_dtype="int16"),
    "chain_stream_r4_i16": lambda: _chain_stream(512, ks=(1, 5), rows=4, state_dtype="int16"),
    # round-3 steps: bench.py headline stages (warmed per-k), f32 parity,
    # graft-entry prewarm, long-query chained timing, many-vs-many timing
    "parity_r16_f32": lambda: _parity_rows(16, state_dtype="float32"),
    "parity_r8_f32": lambda: _parity_rows(8, state_dtype="float32"),
    "bench_c32_w1": lambda: _bench_stage(
        "stream_chain", SWTPU_BENCH_KS="1", SWTPU_BENCH_CHUNK="32"),
    "bench_c32_w33": lambda: _bench_stage(
        "stream_chain", SWTPU_BENCH_KS="33", SWTPU_BENCH_CHUNK="32"),
    "bench_c32": lambda: _bench_stage(
        "stream_chain", SWTPU_BENCH_CHUNK="32"),
    "bench_warm_k1": lambda: _bench_stage("stream_chain", SWTPU_BENCH_KS="1"),
    "bench_warm_k33": lambda: _bench_stage("stream_chain", SWTPU_BENCH_KS="33"),
    "bench_chain": lambda: _bench_stage("stream_chain"),
    "bench_warm_i32_k1": lambda: _bench_stage("stream_chain_i32", SWTPU_BENCH_KS="1"),
    "bench_warm_i32_k33": lambda: _bench_stage("stream_chain_i32", SWTPU_BENCH_KS="33"),
    "bench_chain_i32": lambda: _bench_stage("stream_chain_i32"),
    "bench_small_warm": lambda: _bench_stage("stream_small"),
    "bench_col_stage": lambda: _bench_stage("column"),
    "warm_entry": warm_entry,
    "long_k2_w1": lambda: _chain_long(2, ks=(1,)),
    "long_k2": lambda: _chain_long(2, ks=(1, 5)),
    "long_k4_w1": lambda: _chain_long(4, ks=(1,)),
    "long_k4": lambda: _chain_long(4, ks=(1, 5)),
    "long_k16_w1": lambda: _chain_long(16, ks=(1,)),
    "long_k16": lambda: _chain_long(16, ks=(1, 3)),
    "long_k4_i32": lambda: _chain_long(4, ks=(1, 5), state_dtype="int32"),
    "pairs_w1": lambda: _chain_pairs(ks=(1,)),
    "pairs": lambda: _chain_pairs(ks=(1, 5)),
    # longer chains for jitter-robust slopes (scan bodies are cache-hits
    # after the k=5 runs; only the trip count changes)
    "pairs_k17": lambda: _chain_pairs(ks=(1, 17)),
    "long_k4_17": lambda: _chain_long(4, ks=(1, 17)),
    # segmented short-query configs at f32 (the data1-class 32nt workload:
    # seg=4 x rows=4; 64nt: seg=2 x rows=8)
    "chain_r4_seg4_f32": lambda: _chain_stream(512, ks=(1, 5), rows=4, segments=4, state_dtype="float32"),
    "chain_r8_seg2_f32": lambda: _chain_stream(512, ks=(1, 5), rows=8, segments=2, state_dtype="float32"),
    "e2e_data1": lambda: _e2e_dataset("data1.fa", "query1.fa", scale=1 << 18),
    "e2e_data100": lambda: _e2e_dataset("data100.fa", "query100.fa", scale=1 << 18),
    "e2e_data500": lambda: _e2e_dataset("data500.fa", "query100.fa"),
    # round-4: the flagship kernel as real Mosaic under shard_map (VERDICT #1)
    "shmosaic_smoke": _shmosaic_smoke,
    "shmosaic_w1": lambda: _shmosaic_chain(ks=(1,)),
    "shmosaic_w5": lambda: _shmosaic_chain(ks=(5,)),
    "shmosaic_chain": lambda: _shmosaic_chain(ks=(1, 5)),
    "shmosaic_chain17": lambda: _shmosaic_chain(ks=(1, 17)),
    # round-4: e2e transfer/compute overlap A/B (warm each config in its
    # own step so no single process exceeds a compile budget)
    "e2e_overlap_w0": lambda: _e2e_overlap(chunks=(0,), reps=1),
    "e2e_overlap_w17": lambda: _e2e_overlap(chunks=(0, 1 << 17), reps=1),
    "e2e_overlap": lambda: _e2e_overlap(chunks=(0, 1 << 17, 1 << 16)),
    "loaded_db": _loaded_db,
    "loaded_serve": _loaded_serve,
    "loaded_seg": _loaded_seg,
    # round-4: sharded chain at the bench's big batch (robust slope; the
    # full-database oracle top-3 is skipped at this size)
    "shmosaic_big_w1": lambda: _shmosaic_chain(ks=(1,), B=262144, check_top=False),
    "shmosaic_big_w33": lambda: _shmosaic_chain(ks=(33,), B=262144, check_top=False),
    "shmosaic_big": lambda: _shmosaic_chain(ks=(1, 33), B=262144, check_top=False),
    # k_top=0 isolates the collective-top-K tail from the kernel rate
    "shmosaic_k0_w1": lambda: _shmosaic_chain(ks=(1,), B=262144, check_top=False, k_top=0),
    "shmosaic_k0_w33": lambda: _shmosaic_chain(ks=(33,), B=262144, check_top=False, k_top=0),
    "shmosaic_k0": lambda: _shmosaic_chain(ks=(1, 33), B=262144, check_top=False, k_top=0),
    # round-4: SCORE_WIDTH wrap-parity on the flagship stream kernel
    "biased_parity_r16": lambda: _parity_biased(rows=16),
    "biased_parity_r1": lambda: _parity_biased(rows=1),
    "biased_parity_r4_seg4": lambda: _parity_biased_seg(),
    "shmosaic_long": _shmosaic_long,
    "biased_w1": lambda: _chain_stream(512, ks=(1,), rows=16, score_width=12),
    "biased_w5": lambda: _chain_stream(512, ks=(5,), rows=16, score_width=12),
    # _chain_stream unrolls k in the jit body: measure at the warmed ks only
    "biased_chain": lambda: _chain_stream(512, ks=(1, 5), rows=16, score_width=12),
    # robust k=33 slope for the biased config via bench's lax.scan chain
    # (the body compiles once whatever k is; parity vs the biased oracle)
    "biased_bench_w1": lambda: _bench_stage(
        "stream_chain", SWTPU_BENCH_KS="1", SWTPU_BENCH_SCORE_WIDTH="12"),
    "biased_bench_w33": lambda: _bench_stage(
        "stream_chain", SWTPU_BENCH_KS="33", SWTPU_BENCH_SCORE_WIDTH="12"),
    "biased_bench_chain": lambda: _bench_stage(
        "stream_chain", SWTPU_BENCH_SCORE_WIDTH="12"),
    # round-5 steps: extraction-tax isolation + regular-extract product path,
    # sharded loaded-db serving on mesh(1), biased long chain at 512 nt
    "gather_ablate_w": lambda: _gather_ablate(reps=1),
    "gather_ablate": _gather_ablate,
    "shmosaic_reg_w1": lambda: _shmosaic_chain(ks=(1,), B=262144, check_top=False, use_regular=True),
    "shmosaic_reg_w33": lambda: _shmosaic_chain(ks=(33,), B=262144, check_top=False, use_regular=True),
    "shmosaic_reg": lambda: _shmosaic_chain(ks=(1, 33), B=262144, check_top=False, use_regular=True),
    "loaded_sharded": _loaded_sharded,
    "biased_long_w1": lambda: _chain_long(4, ks=(1,), score_width=12, parity_reads=35),
    "biased_long": lambda: _chain_long(4, ks=(1, 17), score_width=12, parity_reads=35),
    # wrap-FIRING regime: 512-nt reads against the 512-nt query — exact
    # self-score 2560 > the 12-bit +2047 ceiling
    "biased_long_wrap_w1": lambda: _chain_long(
        4, ks=(1,), score_width=12, parity_reads=20, n=512, B=16384),
    "biased_long_wrap": lambda: _chain_long(
        4, ks=(1, 17), score_width=12, parity_reads=20, n=512, B=16384),
    # round-5 exploratory: chunk=16 at rows=16 f32 (the 512-step-unrolled
    # body previously blew the compile budget; worth one 1500-s attempt
    # now that the server cache turns compiles around fast)
    "chain_r8_seg2_c16_w1": lambda: _chain_stream(
        512, ks=(1,), rows=8, segments=2, chunk=16, state_dtype="float32"),
    "chain_r8_seg2_c16": lambda: _chain_stream(
        512, ks=(1, 17), rows=8, segments=2, chunk=16, state_dtype="float32"),
    "long_k4_c16_w1": lambda: _chain_long(4, ks=(1,), chunk=16),
    "long_k4_c16": lambda: _chain_long(4, ks=(1, 17), chunk=16),
    "long_k4_c32_w1": lambda: _chain_long(4, ks=(1,), chunk=32),
    "long_k4_c32": lambda: _chain_long(4, ks=(1, 17), chunk=32),
    "chain_r8_seg2_c32_w1": lambda: _chain_stream(
        512, ks=(1,), rows=8, segments=2, chunk=32, state_dtype="float32"),
    "chain_r8_seg2_c32": lambda: _chain_stream(
        512, ks=(1, 17), rows=8, segments=2, chunk=32, state_dtype="float32"),
    "chain_r16_c32_f32_w1": lambda: _chain_stream(
        512, ks=(1,), rows=16, chunk=32, state_dtype="float32"),
    "chain_r16_c32_f32": lambda: _chain_stream(
        512, ks=(1, 17), rows=16, chunk=32, state_dtype="float32"),
    "chain_r16_c16_f32_w1": lambda: _chain_stream(
        512, ks=(1,), rows=16, chunk=16, state_dtype="float32"),
    "chain_r16_c16_f32": lambda: _chain_stream(
        512, ks=(1, 17), rows=16, chunk=16, state_dtype="float32"),
    "serve_socket_hw": _serve_socket_hw,
    "loaded_sharded_seg": _loaded_sharded_seg,
    "chain_col": lambda: _chain_col("int32"),
    "chain_col_i16": lambda: _chain_col("int16"),
    "chain_col_f32": lambda: _chain_col("float32"),
}

if __name__ == "__main__":
    step = sys.argv[1]
    if step not in STEPS:
        raise SystemExit(f"unknown step {step}; have {sorted(STEPS)}")
    STEPS[step]()
    log("STEP DONE")
