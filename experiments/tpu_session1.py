"""Single sequential TPU session: stream-kernel parity debug + benches.

Run detached; writes progress to stdout (redirect to a log)."""

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


def main():
    from swtpu.bank.streams import gather_stream_scores, pack_streams
    from swtpu.ops.pallas_kernel import sw_scores_pallas
    from swtpu.ops.pallas_stream import sw_scores_stream, sw_scores_stream_strip
    from swtpu.oracle import score_many_vs_one

    t0 = time.time()
    x = jax.device_put(np.ones((8, 8), np.float32))
    _ = np.asarray(x * 2)
    log(f"tunnel probe ok ({time.time()-t0:.1f}s)")

    # ---- parity debug (small) ----
    rng = np.random.default_rng(0)
    targets = [rng.integers(0, 4, size=rng.integers(3, 40)).astype(np.int8) for _ in range(20)]
    query = rng.integers(0, 4, size=17).astype(np.int8)
    want = score_many_vs_one(query, targets)
    b = pack_streams(query, targets, n_streams=128)
    log(f"parity case: S=128 T={b.stream.shape[1]}; compiling...")
    strip = np.asarray(sw_scores_stream_strip(b.q, b.stream))
    got = gather_stream_scores(strip, b)
    bad = np.nonzero(got != want)[0]
    log(f"parity: {len(bad)} mismatches of {len(targets)}")
    if len(bad):
        for i in bad[:5]:
            s, e = b.emit_stream[i], b.emit_step[i]
            log(f"  read {i}: want {want[i]} got {got[i]} stream {s} step {e} "
                f"len {len(targets[i])} strip[{s},{max(0,e-3)}:{e+4}]={strip[s, max(0,e-3):e+4]}")
        log("strip[0,:16] =", strip[0, :16])
        log("PARITY FAILED — stopping before benches")
        return 1
    log("PARITY OK")

    # ---- stream benches ----
    m = n = 128
    B, Bs = 65536, 8192
    qh = rng.integers(0, 4, (B, m)).astype(np.int8)
    th = rng.integers(0, 4, (B, n)).astype(np.int8)
    cells, cells_s = B * m * n, Bs * m * n
    targets = list(th)
    for S in (256, 1024):
        big = pack_streams(qh[0], targets, n_streams=S)
        small = pack_streams(qh[0], targets[:Bs], n_streams=S)
        dq, ds_ = jax.device_put(big.q), jax.device_put(big.stream)
        es, ep = jax.device_put(big.emit_stream), jax.device_put(big.emit_step.astype(np.int32))
        dqs, dss = jax.device_put(small.q), jax.device_put(small.stream)
        ess, eps = jax.device_put(small.emit_stream), jax.device_put(small.emit_step.astype(np.int32))
        log(f"stream S={S}: T={big.stream.shape[1]}; compiling...")
        tb = timed(lambda: np.asarray(sw_scores_stream(dq, ds_, es, ep)))
        tsml = timed(lambda: np.asarray(sw_scores_stream(dqs, dss, ess, eps)))
        g = (cells - cells_s) / (tb - tsml) / 1e9
        log(f"stream S={S}: big {tb*1e3:.1f} small {tsml*1e3:.1f} -> {g:.1f} GCUPS")
        got = np.asarray(sw_scores_stream(dqs, dss, ess, eps))
        want_b = np.asarray(sw_scores_pallas(qh[:Bs], th[:Bs], block_pairs=1024, unroll=1))
        log(f"stream S={S} parity vs column: {'OK' if (got == want_b).all() else 'FAIL'}")

    # ---- column f32 ----
    q = jax.device_put(qh)
    t = jax.device_put(th)
    qs, ts = q[:Bs], t[:Bs]
    for name, kw in (
        ("col_i32", dict(block_pairs=1024, unroll=1)),
        ("col_f32", dict(block_pairs=1024, unroll=1, state_dtype="float32")),
    ):
        log(f"{name}: compiling...")
        tb = timed(lambda: np.asarray(sw_scores_pallas(q, t, **kw)))
        tsml = timed(lambda: np.asarray(sw_scores_pallas(qs, ts, **kw)))
        g = (cells - cells_s) / (tb - tsml) / 1e9
        log(f"{name}: -> {g:.1f} GCUPS")
    log("SESSION DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
