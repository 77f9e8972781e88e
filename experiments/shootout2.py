"""Shootout round 2: stream wavefront (32-step chunks) vs column variants."""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def timed(run, reps=2):
    run()
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        run()
        best = min(best, time.time() - t0)
    return best


def main():
    import jax

    from swtpu.bank.streams import pack_streams
    from swtpu.ops.pallas_kernel import sw_scores_pallas
    from swtpu.ops.pallas_stream import sw_scores_stream

    rng = np.random.default_rng(0)
    m = n = 128
    B, Bs = 65536, 8192
    qh = rng.integers(0, 4, (B, m)).astype(np.int8)
    th = rng.integers(0, 4, (B, n)).astype(np.int8)
    cells, cells_s = B * m * n, Bs * m * n
    query = qh[0]
    targets = list(th)

    print("# packing streams...", flush=True)
    results = {}
    for S in (256, 1024):
        big = pack_streams(query, targets, n_streams=S)
        small = pack_streams(query, targets[:Bs], n_streams=S)
        dq, ds_ = jax.device_put(big.q), jax.device_put(big.stream)
        es, ep = jax.device_put(big.emit_stream), jax.device_put(big.emit_step.astype(np.int32))
        dqs, dss = jax.device_put(small.q), jax.device_put(small.stream)
        ess, eps = jax.device_put(small.emit_stream), jax.device_put(small.emit_step.astype(np.int32))
        print(f"# S={S}: T={big.stream.shape[1]}", flush=True)
        tb = timed(lambda: np.asarray(sw_scores_stream(dq, ds_, es, ep)))
        tsml = timed(lambda: np.asarray(sw_scores_stream(dqs, dss, ess, eps)))
        g = (cells - cells_s) / (tb - tsml) / 1e9
        results[f"stream_S{S}"] = g
        print(f"stream S={S}: big {tb*1e3:.1f} small {tsml*1e3:.1f} -> {g:.1f} GCUPS", flush=True)
        # parity
        got = np.asarray(sw_scores_stream(dqs, dss, ess, eps))
        want = np.asarray(sw_scores_pallas(qh[:Bs], th[:Bs], block_pairs=1024, unroll=1))
        assert (got == want).all(), "stream != column!"
        print("parity ok", flush=True)

    q = jax.device_put(qh)
    t = jax.device_put(th)
    qs, ts = q[:Bs], t[:Bs]
    for name, kw in (
        ("col_i32", dict(block_pairs=1024, unroll=1)),
        ("col_f32", dict(block_pairs=1024, unroll=1, state_dtype="float32")),
    ):
        tb = timed(lambda: np.asarray(sw_scores_pallas(q, t, **kw)))
        tsml = timed(lambda: np.asarray(sw_scores_pallas(qs, ts, **kw)))
        g = (cells - cells_s) / (tb - tsml) / 1e9
        results[name] = g
        print(f"{name}: big {tb*1e3:.1f} small {tsml*1e3:.1f} -> {g:.1f} GCUPS", flush=True)
    print("RESULTS", results, flush=True)


if __name__ == "__main__":
    main()
