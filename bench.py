"""swtpu headline benchmark: GCUPS/chip for the inner SW scoring kernel.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} and exits 0.
Baseline = 256 GCUPS, the reference's whole 8-module FPGA ScoreBank
(BASELINE.md: 8 modules x 128 PEs x 250 MHz, derived).

Kernel under test: the streamed anti-diagonal wavefront
(swtpu/ops/pallas_stream.py) fed by the round-robin stream packer — the
TPU-native form of the reference's ScoringModule+feeder pipeline
(ScoreBank/ScoringModule_v1.1.v, SM_Feeder2.v).

Robustness: the TPU here sits behind a network tunnel that can wedge for
long stretches if a client dies mid-compile; a measurement that hangs must
never take the driver down with it.  Structure:
  - every measurement runs in a CHILD process with its own hard timeout;
    a hung child is killed by exact PID and the parent moves on;
  - stages run best-first (full-size stream kernel) and degrade (smaller
    sizes, then the column kernel) so *some* nonzero measured number prints
    before the deadline whenever the chip answers at all;
  - a cheap probe (tiny device_put+op) gates the expensive stages and is
    retried, because wedges are transient;
  - the parent always prints the JSON line and exits 0 via os._exit.
The persistent compile cache (.jaxcache, force-committed for the headline
shapes) makes the happy path compile-free.

Timing methodology (inside each stage): dispatch+D2H costs tens of ms over
the tunnel and `block_until_ready` can return optimistically, so:
  - results reduce on device (max + checksum + 64-score window) -> O(1) D2H;
  - np.asarray (materialization) is the only reliable sync;
  - a big and a small batch are timed and differenced, cancelling every
    fixed cost (dispatch, sync, tunnel RTT);
  - 64 scores are checked against the numpy oracle so the headline can
    never come from a silently-wrong kernel.
"""

import json
import os
import subprocess
import sys
import time

BASELINE_GCUPS = 256.0
METRIC = "GCUPS/chip (SW affine-gap scoring, 128x128)"
DEADLINE_S = float(os.environ.get("SWTPU_BENCH_DEADLINE_S", "460"))
S_STREAMS = int(os.environ.get("SWTPU_BENCH_STREAMS", "512"))
STATE_DTYPE = os.environ.get("SWTPU_BENCH_STATE_DTYPE", "int32")
SEGMENTS = int(os.environ.get("SWTPU_BENCH_SEGMENTS", "1"))
ROWS = int(os.environ.get("SWTPU_BENCH_ROWS", "16"))


# ---------------------------------------------------------------- stages --
# Each stage is a function run in a child process; it prints one JSON line
# {"gcups": x} on success.  Import jax only inside stages.

def _enable_compile_cache():
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jaxcache")
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def stage_probe():
    """Tiny device_put + op: proves the tunnel answers."""
    import numpy as np
    import jax

    x = jax.device_put(np.ones((8, 8), np.float32))
    v = float(np.asarray(x * 2).sum())
    return {"gcups": 0.0, "probe": v}


def _measure_stream_chain(ks=(1, 9), B=65536):
    """Steady-state kernel throughput via k data-dependent kernel calls
    inside ONE jit: per-kernel device time = (T[k2]-T[k1])/(k2-k1), with
    every fixed cost (dispatch ~30ms, D2H sync, tunnel RTT) cancelled by
    construction — the jitter-immune method BENCH_NOTES.md documents.  The
    big-minus-small subtraction stages remain as fallbacks; their fixed
    costs drift between sizes on the tunnel (measured: 220 GCUPS captured
    for a 323-GCUPS kernel), which this method is immune to.  A 64-score
    oracle-parity window gathers from the final strip inside the same jit."""
    import functools

    import numpy as np
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()
    from swtpu.bank.streams import pack_streams
    from swtpu.ops.pallas_stream import _strip_call, _to_kernel_layout
    from swtpu.config import DEFAULT_PENALTIES
    from swtpu.oracle import score_many_vs_one

    rng = np.random.default_rng(0)
    m = n = 128 // SEGMENTS if SEGMENTS > 1 else 128
    q = rng.integers(0, 4, size=m).astype(np.int8)
    t = rng.integers(0, 4, size=(B, n)).astype(np.int8)
    b = pack_streams(q, t, n_streams=S_STREAMS, segments=SEGMENTS, rows=ROWS)
    qk, sk = _to_kernel_layout(b.q, b.stream, SEGMENTS, ROWS)
    dq, ds = jax.device_put(qk), jax.device_put(sk)
    de_st = jax.device_put(b.emit_stream[:64].astype(np.int32))
    de_sp = jax.device_put(b.emit_step[:64].astype(np.int32))
    ma, mi, go, ge = DEFAULT_PENALTIES.astuple()

    @functools.partial(jax.jit, static_argnames="k")
    def chain(qk, sk, es, ep, k):
        acc = jnp.zeros((), jnp.int32)
        s_in = sk
        strip = None
        for _ in range(k):
            strip = _strip_call(
                qk, s_in, ma, mi, go, ge, False, seg=SEGMENTS,
                state_dtype=STATE_DTYPE, rows=ROWS,
            )
            v = strip[-1, 0]  # data-dependent scalar
            acc = acc + v
            # force sequential dependence without changing the data
            s_in = jnp.where(v < -(2 ** 30), s_in + jnp.int8(1), s_in)
        return acc, strip[ep, es]

    times = {}
    for k in ks:
        t0 = time.time()
        out = [np.asarray(x) for x in chain(dq, ds, de_st, de_sp, k)]
        print(f"# chain k={k}: compile+warm {time.time()-t0:.0f}s", file=sys.stderr)
        want = score_many_vs_one(q, t[:64])
        if not np.array_equal(out[1], want):
            raise RuntimeError(
                f"parity check failed at k={k}: got {out[1][:8]} want {want[:8]}"
            )
        best = min(
            (lambda t0: ([np.asarray(x) for x in chain(dq, ds, de_st, de_sp, k)],
                         time.time() - t0)[1])(time.time())
            for _ in range(4)
        )
        times[k] = best
        print(f"# chain k={k}: {best*1e3:.1f} ms", file=sys.stderr)
    k1, k2 = ks[0], ks[-1]
    per = (times[k2] - times[k1]) / (k2 - k1)
    if per <= 0:
        raise RuntimeError(f"non-positive slope: {times}")
    return b.cells / per / 1e9


def stage_stream_chain():
    return {"gcups": _measure_stream_chain()}


def _measure_stream(sizes, reps):
    import numpy as np
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()
    from swtpu.bank.streams import pack_streams
    from swtpu.ops.pallas_stream import sw_scores_stream
    from swtpu.oracle import score_many_vs_one

    rng = np.random.default_rng(0)
    m = n = 128 // SEGMENTS if SEGMENTS > 1 else 128

    @jax.jit
    def scored(q, stream, es, ep):
        s = sw_scores_stream(
            q, stream, es, ep, state_dtype=STATE_DTYPE, segments=SEGMENTS,
            rows=ROWS,
        )
        # O(1) D2H: best hit + checksum + a 64-score parity window
        return jnp.max(s), jnp.sum(s), s[:64]

    q = rng.integers(0, 4, size=m).astype(np.int8)
    times = {}
    for B in sizes:
        t = rng.integers(0, 4, size=(B, n)).astype(np.int8)
        b = pack_streams(q, t, n_streams=S_STREAMS, segments=SEGMENTS, rows=ROWS)
        dev = (
            jax.device_put(b.q),
            jax.device_put(b.stream),
            jax.device_put(b.emit_stream),
            jax.device_put(b.emit_step.astype(np.int32)),
        )
        run = lambda: [np.asarray(x) for x in scored(*dev)]
        out = run()  # compile + warm
        want = score_many_vs_one(q, t[:64])
        if not np.array_equal(out[2], want):
            raise RuntimeError(
                f"parity check failed at B={B}: got {out[2][:8]} want {want[:8]}"
            )
        best = min(
            (lambda t0: (run(), time.time() - t0)[1])(time.time())
            for _ in range(reps)
        )
        times[B] = (b.cells, best)
        print(f"# B={B}: {best*1e3:.1f} ms (cells={b.cells:.3g})", file=sys.stderr)
    (c1, t1), (c2, t2) = times[sizes[0]], times[sizes[1]]
    return (c2 - c1) / (t2 - t1) / 1e9


def stage_stream_big():
    return {"gcups": _measure_stream((32768, 262144), reps=6)}


def stage_stream_small():
    return {"gcups": _measure_stream((8192, 65536), reps=4)}


def stage_column():
    """Last-resort degraded stage: the column kernel at modest sizes."""
    import numpy as np
    import jax

    _enable_compile_cache()
    from swtpu.ops.pallas_kernel import sw_scores_pallas

    rng = np.random.default_rng(0)
    m = n = 128
    pts = []
    for B in (8192, 32768):
        q = jax.device_put(rng.integers(0, 4, (B, m)).astype(np.int8))
        t = jax.device_put(rng.integers(0, 4, (B, n)).astype(np.int8))
        run = lambda: np.asarray(sw_scores_pallas(q, t, block_pairs=1024))
        run()
        best = min(
            (lambda t0: (run(), time.time() - t0)[1])(time.time())
            for _ in range(3)
        )
        pts.append((B * m * n, best))
    return {"gcups": (pts[1][0] - pts[0][0]) / (pts[1][1] - pts[0][1]) / 1e9}


def stage_cpu():
    """CPU fallback so local (non-TPU) runs still produce a number."""
    import numpy as np
    import jax

    # jax is pre-imported at interpreter start on this box, so the platform
    # must be pinned via config, not env vars (see tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

    from swtpu.ops.scan import sw_scores_scan

    rng = np.random.default_rng(0)
    m = n = 128
    pts = []
    for B in (1024, 4096):
        q = jax.device_put(rng.integers(0, 4, size=(B, m)).astype(np.int8))
        t = jax.device_put(rng.integers(0, 4, size=(B, n)).astype(np.int8))
        run = lambda: np.asarray(sw_scores_scan(q, t))
        run()
        best = min(
            (lambda t0: (run(), time.time() - t0)[1])(time.time())
            for _ in range(4)
        )
        pts.append((B * m * n, best))
    return {"gcups": (pts[1][0] - pts[0][0]) / (pts[1][1] - pts[0][1]) / 1e9}


STAGES = {
    "probe": stage_probe,
    "stream_chain": stage_stream_chain,
    "stream_big": stage_stream_big,
    "stream_small": stage_stream_small,
    "column": stage_column,
    "cpu": stage_cpu,
}


def _run_stage_child(name):
    fn = STAGES[name]
    try:
        out = fn()
        print("BENCH_RESULT " + json.dumps(out), flush=True)
    except Exception as e:  # noqa: BLE001
        print("BENCH_RESULT " + json.dumps({"error": str(e)[:300]}), flush=True)
    # never let interpreter teardown (tunnel client threads) hang or abort
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)


# ---------------------------------------------------------------- parent --

def _spawn(name, timeout_s):
    """Run one stage in a child; kill by exact PID on timeout."""
    t0 = time.time()
    proc = subprocess.Popen(
        [sys.executable, "-u", os.path.abspath(__file__), "--stage", name],
        stdout=subprocess.PIPE,
        stderr=sys.stderr,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
        start_new_session=True,
    )
    try:
        out, _ = proc.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        try:
            import signal

            os.killpg(proc.pid, signal.SIGKILL)  # exact pgid we created
        except Exception:
            proc.kill()
        proc.wait()
        print(f"# stage {name}: timed out after {timeout_s:.0f}s", file=sys.stderr)
        return None
    dt = time.time() - t0
    for line in (out or "").splitlines():
        if line.startswith("BENCH_RESULT "):
            res = json.loads(line[len("BENCH_RESULT "):])
            if "error" in res:
                print(f"# stage {name}: error: {res['error']}", file=sys.stderr)
                return None
            print(f"# stage {name}: ok in {dt:.0f}s", file=sys.stderr)
            return res
    print(f"# stage {name}: no result (rc={proc.returncode})", file=sys.stderr)
    return None


def main():
    t_start = time.time()
    budget = lambda: DEADLINE_S - (time.time() - t_start)

    def emit(gcups):
        print(
            json.dumps(
                {
                    "metric": METRIC,
                    "value": round(gcups, 1),
                    "unit": "GCUPS",
                    "vs_baseline": round(gcups / BASELINE_GCUPS, 3),
                }
            ),
            flush=True,
        )
        os._exit(0)

    # Which backend? (cheap: read env/driver intent without importing jax
    # in the parent — a child probe decides.)
    on_tpu = os.environ.get("JAX_PLATFORMS", "") in ("", "tpu", "axon", "tpu,cpu")

    if not on_tpu:
        res = _spawn("cpu", min(240, budget()))
        emit(res["gcups"] if res else 0.0)

    # 1) probe the tunnel; retry while we have budget (wedges are transient)
    probed = False
    for attempt in range(4):
        if budget() < 90:
            break
        if _spawn("probe", min(75, budget() - 10)) is not None:
            probed = True
            break
        time.sleep(min(20, max(0, budget() - 60)))
    if not probed:
        # chip never answered; a CPU number is better than 0.0 but would be
        # mislabeled — report 0 honestly, cleanly.
        print("# TPU unreachable after retries", file=sys.stderr)
        emit(0.0)

    # 2) staged measurement, best first
    plan = [
        ("stream_chain", 330),
        ("stream_big", 250),
        ("stream_small", 200),
        ("column", 150),
    ]
    for name, need in plan:
        if budget() < 60:
            break
        res = _spawn(name, min(need, budget() - 15))
        if res and res.get("gcups", 0) > 0:
            emit(res["gcups"])
    emit(0.0)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--stage":
        _run_stage_child(sys.argv[2])
    else:
        main()
