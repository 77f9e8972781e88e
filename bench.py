"""swtpu headline benchmark: GCUPS/chip for the inner SW scoring kernel.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = 256 GCUPS, the reference's whole 8-module FPGA ScoreBank
(BASELINE.md: 8 modules x 128 PEs x 250 MHz, derived).

Kernel under test: the streamed anti-diagonal wavefront
(swtpu/ops/pallas_stream.py) fed by the round-robin stream packer — the
TPU-native form of the reference's ScoringModule+feeder pipeline
(ScoreBank/ScoringModule_v1.1.v, SM_Feeder2.v).

Timing methodology: the TPU here sits behind a network tunnel where
dispatch+D2H costs tens of ms and `block_until_ready` can return
optimistically, so per-call wall times lie in both directions.  We:
  - reduce results on device (max + checksum scalars), so D2H is O(1);
  - fully materialize (np.asarray) as the only reliable sync;
  - time a big and a small batch and take the difference, so every fixed
    cost (dispatch, sync, tunnel RTT) cancels;
  - spot-check 64 scores against the numpy oracle so the headline can never
    come from a silently-wrong kernel.
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

BASELINE_GCUPS = 256.0
S_STREAMS = int(os.environ.get("SWTPU_BENCH_STREAMS", "512"))
STATE_DTYPE = os.environ.get("SWTPU_BENCH_STATE_DTYPE", "int32")


def _enable_compile_cache():
    import jax

    cache = Path(__file__).resolve().parent / ".jaxcache"
    cache.mkdir(exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _prep(B, m, n, rng):
    """Pack B random n-nt reads against one m-nt query for the wavefront."""
    import jax

    from swtpu.bank.streams import pack_streams

    q = rng.integers(0, 4, size=m).astype(np.int8)
    t = rng.integers(0, 4, size=(B, n)).astype(np.int8)
    b = pack_streams(q, t, n_streams=S_STREAMS)
    dev = (
        jax.device_put(b.q),
        jax.device_put(b.stream),
        jax.device_put(b.emit_stream),
        jax.device_put(b.emit_step.astype(np.int32)),
    )
    return q, t, dev, b.cells


def measure_gcups(m=128, n=128, sizes=(32768, 262144), reps=6):
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)

    if not on_tpu:
        from swtpu.ops.scan import sw_scores_scan

        pts = []
        for B in (1024, 4096):
            q = jax.device_put(rng.integers(0, 4, size=(B, m)).astype(np.int8))
            t = jax.device_put(rng.integers(0, 4, size=(B, n)).astype(np.int8))
            run = lambda: np.asarray(sw_scores_scan(q, t))
            run()
            best = min(
                (lambda t0: (run(), time.time() - t0)[1])(time.time())
                for _ in range(reps)
            )
            pts.append((B * m * n, best))
        return (pts[1][0] - pts[0][0]) / (pts[1][1] - pts[0][1]) / 1e9

    from swtpu.ops.pallas_stream import sw_scores_stream
    from swtpu.oracle import score_many_vs_one

    @jax.jit
    def scored(q, stream, es, ep):
        s = sw_scores_stream(q, stream, es, ep, state_dtype=STATE_DTYPE)
        # O(1) D2H: best hit + checksum + a 64-score parity window
        return jnp.max(s), jnp.sum(s), s[:64]

    times = {}
    for B in sizes:
        qh, th, dev, cells = _prep(B, m, n, rng)
        run = lambda: [np.asarray(x) for x in scored(*dev)]
        out = run()  # compile + warm
        want = score_many_vs_one(qh, th[:64])
        if not np.array_equal(out[2], want):
            raise RuntimeError(
                f"parity check failed at B={B}: got {out[2][:8]} want {want[:8]}"
            )
        best = min(
            (lambda t0: (run(), time.time() - t0)[1])(time.time())
            for _ in range(reps)
        )
        times[B] = (cells, best)
        print(f"# B={B}: {best*1e3:.1f} ms (cells={cells:.3g})", file=sys.stderr)
    (c1, t1), (c2, t2) = times[sizes[0]], times[sizes[1]]
    return (c2 - c1) / (t2 - t1) / 1e9


def main():
    # The TPU sits behind a tunnel that can wedge; never hang the driver.
    # Run the measurement in a worker thread with a hard deadline.
    import threading

    result = {}

    def work():
        try:
            result["gcups"] = measure_gcups()
        except Exception as e:  # pragma: no cover
            result["error"] = str(e)[:200]

    th = threading.Thread(target=work, daemon=True)
    th.start()
    th.join(timeout=float(os.environ.get("SWTPU_BENCH_DEADLINE_S", "480")))
    if "gcups" in result:
        gcups = result["gcups"]
    else:
        print(f"# bench failed/timed out: {result.get('error', 'deadline')}",
              file=sys.stderr)
        gcups = 0.0
    print(
        json.dumps(
            {
                "metric": "GCUPS/chip (SW affine-gap scoring, 128x128)",
                "value": round(gcups, 1),
                "unit": "GCUPS",
                "vs_baseline": round(gcups / BASELINE_GCUPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
