"""swtpu headline benchmark: GCUPS/chip for the inner SW scoring kernel.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} and exits 0.
Baseline = 256 GCUPS, the reference's whole 8-module FPGA ScoreBank
(BASELINE.md: 8 modules x 128 PEs x 250 MHz, derived).

Kernel under test: the streamed multi-row anti-diagonal wavefront
(swtpu/ops/pallas_stream.py, rows=16) fed by the round-robin stream packer —
the TPU-native form of the reference's ScoringModule+feeder pipeline
(ScoreBank/ScoringModule_v1.1.v, SM_Feeder2.v).

Robustness: the TPU here sits behind a network tunnel that can wedge for
long stretches if a client dies mid-compile; a measurement that hangs must
never take the driver down with it.  Structure:
  - every measurement runs in a CHILD process with its own hard timeout;
    a hung child is killed by exact PID and the parent moves on;
  - the headline stage carries its own raw-throughput FLOOR: even if the
    slope estimate degenerates, the stage returns cells/wall-time of a
    k-kernel in-jit chain — an honest lower bound, never discarded;
  - degraded stages (smaller chain, column kernel) follow, and the parent
    emits the BEST number any stage produced: 0.0 is only possible if the
    chip never answered at all;
  - a cheap probe (tiny device_put+op) gates the expensive stages and is
    retried, because wedges are transient;
  - the parent always prints the JSON line and exits 0 via os._exit.
The persistent compile cache (.jaxcache, force-committed for the headline
shapes) makes the happy path compile-free.

Timing methodology (inside the headline stage): dispatch+D2H costs tens of
ms over the tunnel and `block_until_ready` can return optimistically, so:
  - k data-dependent kernel calls run inside ONE jit via lax.scan (the body
    compiles ONCE whatever k is — the round-2 unrolled chain recompiled the
    kernel per call site and blew the compile budget);
  - np.asarray (materialization) is the only reliable sync; only O(1)
    reductions and a 64-score window leave the device;
  - per-kernel device time = (T[k2]-T[k1])/(k2-k1): every fixed cost
    (dispatch ~30ms, sync, tunnel RTT) cancels by construction;
  - the k2 run's cells*k2/T[k2] is the floor if the slope degenerates;
  - the 64-score window is checked against the numpy oracle so the headline
    can never come from a silently-wrong kernel.
"""

import json
import os
import subprocess
import sys
import time

BASELINE_GCUPS = 256.0
METRIC = "GCUPS/chip (SW affine-gap scoring, 128x128)"
DEADLINE_S = float(os.environ.get("SWTPU_BENCH_DEADLINE_S", "520"))
S_STREAMS = int(os.environ.get("SWTPU_BENCH_STREAMS", "512"))
STATE_DTYPE = os.environ.get("SWTPU_BENCH_STATE_DTYPE", "float32")
ROWS = int(os.environ.get("SWTPU_BENCH_ROWS", "16"))
# ks override lets the TPU campaign warm each scan length in its own
# process (persistent cache) so no single run exceeds the task cap
KS = tuple(
    int(x) for x in os.environ.get("SWTPU_BENCH_KS", "").split(",") if x
)
# nonzero: measure the SCORE_WIDTH wrap-parity kernel instead (int32
# biased lanes; parity checks against the biased contract oracle)
SCORE_WIDTH = int(os.environ.get("SWTPU_BENCH_SCORE_WIDTH", "0")) or None
# nonzero: override the kernel's grid-chunk (unrolled steps per grid
# iteration) for A/B tuning runs
CHUNK = int(os.environ.get("SWTPU_BENCH_CHUNK", "0")) or None


# ---------------------------------------------------------------- stages --
# Each stage is a function run in a child process; it prints one JSON line
# {"gcups": x, ...} on success.  Import jax only inside stages.

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


def _measure_scan_chain(B, ks, reps, state_dtype=None):
    """k sequentially-dependent kernel calls inside ONE jit (lax.scan), for
    k in `ks`.  Returns (gcups_slope_or_None, gcups_floor)."""
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
    m = n = 128
    q = rng.integers(0, 4, size=m).astype(np.int8)
    t = rng.integers(0, 4, size=(B, n)).astype(np.int8)
    b = pack_streams(q, t, n_streams=S_STREAMS, rows=ROWS)
    qk, sk = _to_kernel_layout(b.q, b.stream, 1, ROWS)
    dq, ds = jax.device_put(qk), jax.device_put(sk)
    de_st = jax.device_put(b.emit_stream[:64].astype(np.int32))
    de_sp = jax.device_put(b.emit_step[:64].astype(np.int32))
    ma, mi, go, ge = DEFAULT_PENALTIES.astuple()
    if SCORE_WIDTH:
        from swtpu.oracle import sw_score_single_biased

        want = np.array(
            [sw_score_single_biased(q, tt, score_width=SCORE_WIDTH)
             for tt in t[:64]], np.int32,
        )
    else:
        want = score_many_vs_one(q, t[:64])
    dtype = "int32" if SCORE_WIDTH else (state_dtype or STATE_DTYPE)

    @functools.partial(jax.jit, static_argnames="k")
    def chain(qk, sk, es, ep, k):
        def body(carry, _):
            qk_c, acc = carry
            strip = _strip_call(
                qk_c, sk, ma, mi, go, ge, False,
                state_dtype=dtype, rows=ROWS, score_width=SCORE_WIDTH,
                chunk=CHUNK,
            )
            v = strip[-1, 0]  # data-dependent scalar
            # force sequential dependence without changing the query values
            qk_n = jnp.where(v < -(2 ** 30), qk_c + jnp.int8(1), qk_c)
            return (qk_n, acc + v), strip[ep, es]

        (_, acc), wins = jax.lax.scan(body, (qk, jnp.int32(0)), None, length=k)
        return acc, wins[-1]

    times = {}
    for k in ks:
        t0 = time.time()
        out = [np.asarray(x) for x in chain(dq, ds, de_st, de_sp, k)]
        print(f"# chain k={k}: compile+warm {time.time()-t0:.0f}s", file=sys.stderr)
        if not np.array_equal(out[1], want):
            raise RuntimeError(
                f"parity check failed at k={k}: got {out[1][:8]} want {want[:8]}"
            )
        best = min(
            (lambda t0: ([np.asarray(x) for x in chain(dq, ds, de_st, de_sp, k)],
                         time.time() - t0)[1])(time.time())
            for _ in range(reps)
        )
        times[k] = best
        print(f"# chain k={k}: {best*1e3:.1f} ms", file=sys.stderr)
    k1, k2 = ks[0], ks[-1]
    floor = b.cells * k2 / times[k2] / 1e9
    if k1 == k2:
        return None, floor  # warm-only run: no slope
    per = (times[k2] - times[k1]) / (k2 - k1)
    slope = None
    # the slope is only trusted when the delta dominates tunnel jitter
    # (round-2 lesson: an 8ms drift between runs flipped a 13ms delta
    # negative and the whole number was discarded)
    if per > 0 and (times[k2] - times[k1]) > 0.3 * times[k2]:
        slope = b.cells / per / 1e9
    return slope, floor


def stage_stream_chain():
    """Headline: B=262144 targets, ks=(1, 33) — slope cancels all fixed
    costs; the k=33 run is the raw floor."""
    slope, floor = _measure_scan_chain(B=262144, ks=KS or (1, 33), reps=4)
    best = floor if slope is None else min(max(slope, floor), 3.0 * floor)
    return {"gcups": best, "floor": floor, "slope": slope or 0.0}


def stage_product_sharded():
    """PRODUCT-path stage (round-5, driver-auditable): the literal
    production multi-chip function — make_sharded_stream_scorer on mesh(1)
    with the collective top-K AND full-result extraction (strided regular
    fast path) — at the headline batch.  This is the number a user of
    score_database_multihost sees per chip, not the bare kernel."""
    import functools

    import numpy as np
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()
    from swtpu.bank.streams import pack_streams_sharded
    from swtpu.oracle import score_many_vs_one
    from swtpu.parallel import make_mesh, make_sharded_stream_scorer

    rng = np.random.default_rng(0)
    B, m, n = 262144, 128, 128
    query = rng.integers(0, 4, size=m).astype(np.int8)
    th = rng.integers(0, 4, size=(B, n)).astype(np.int8)
    batch = pack_streams_sharded(
        query, list(th), n_shards=1, n_streams=S_STREAMS, rows=ROWS
    )
    want = score_many_vs_one(query, th[:64])
    mesh = make_mesh(1)
    scorer = make_sharded_stream_scorer(
        mesh, interpret=False, rows=ROWS, state_dtype=STATE_DTYPE, k=3,
        emit_regular=batch.emit_regular,
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
            s, ts, tids = scorer(q_c, stream, es, ep, ids)
            v = s[0, 0]
            q_n = jnp.where(v < -(2 ** 30), q_c + jnp.int8(1), q_c)
            return (q_n, acc + v), (s[0, :64], ts)

        (_, acc), (wins, ts) = jax.lax.scan(
            body, (q, jnp.int32(0)), None, length=k
        )
        return acc, wins[-1], ts[-1]

    times = {}
    for k in KS or (1, 33):
        t0 = time.time()
        out = [np.asarray(x) for x in chain(dq, dstream, des, dep, dids, k)]
        print(f"# product k={k}: compile+warm {time.time()-t0:.0f}s",
              file=sys.stderr)
        if not np.array_equal(out[1], want):
            raise RuntimeError(f"product parity failed at k={k}")
        best = min(
            (lambda t0: ([np.asarray(x) for x in
                          chain(dq, dstream, des, dep, dids, k)],
                         time.time() - t0)[1])(time.time())
            for _ in range(3)
        )
        times[k] = best
        print(f"# product k={k}: {best*1e3:.1f} ms", file=sys.stderr)
    ks_run = sorted(times)
    k1, k2 = ks_run[0], ks_run[-1]
    floor = cells * k2 / times[k2] / 1e9
    if k1 == k2:
        return {"gcups": floor, "floor": floor, "slope": 0.0}
    per = (times[k2] - times[k1]) / (k2 - k1)
    slope = cells / per / 1e9 if (
        per > 0 and (times[k2] - times[k1]) > 0.3 * times[k2]
    ) else None
    best = floor if slope is None else min(max(slope, floor), 3.0 * floor)
    return {"gcups": best, "floor": floor, "slope": slope or 0.0}


def stage_stream_chain_i32():
    """Insurance: the headline chain with int32 state (the round-2-measured
    323-GCUPS config) in case the f32 default ever fails its parity check
    on a new toolchain."""
    slope, floor = _measure_scan_chain(
        B=262144, ks=KS or (1, 33), reps=4, state_dtype="int32"
    )
    best = floor if slope is None else min(max(slope, floor), 3.0 * floor)
    return {"gcups": best, "floor": floor, "slope": slope or 0.0}


def stage_stream_small():
    """Degraded: smaller batch (8MB stream), raw floor still honest."""
    slope, floor = _measure_scan_chain(B=65536, ks=KS or (1, 17), reps=4)
    best = floor if slope is None else min(max(slope, floor), 3.0 * floor)
    return {"gcups": best, "floor": floor, "slope": slope or 0.0}


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
    d = pts[1][1] - pts[0][1]
    if d > 0:
        return {"gcups": (pts[1][0] - pts[0][0]) / d / 1e9}
    return {"gcups": pts[1][0] / pts[1][1] / 1e9}  # raw lower bound


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
    "product_sharded": stage_product_sharded,
    "stream_chain_i32": stage_stream_chain_i32,
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
            print(f"# stage {name}: ok in {dt:.0f}s: {res}", file=sys.stderr)
            return res
    print(f"# stage {name}: no result (rc={proc.returncode})", file=sys.stderr)
    return None


def main():
    t_start = time.time()
    budget = lambda: DEADLINE_S - (time.time() - t_start)

    def emit(gcups):
        print(
            "# companion hardware records (BENCH_NOTES.md): PRODUCT sharded "
            "shard_map + top-K + full extraction 403-430 GCUPS/chip "
            "(round-5 strided extraction; was 269.7); wrap-parity W=12 "
            "300.3 short / 266.4 chained-512nt; sharded loaded-db serving "
            "1.3-4.6 Mreads/s per query (mesh(1)); socket daemon on-chip "
            "2 concurrent clients parity OK",
            file=sys.stderr,
        )
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

    # 1) probe the tunnel ONCE (round-3 lesson: two 110-s probe timeouts ate
    # 42% of the budget before the fallback plan rescued the run — the
    # stages already carry their own hard timeouts, so the probe's only job
    # is picking the plan order, and one attempt is enough for that).  A
    # loaded-but-healthy tunnel has answered probes in ~55 s, so the probe
    # timeout must stay well past that.
    probed = False
    if budget() > 130:
        probed = _spawn("probe", min(110, budget() - 10)) is not None

    # 2) staged measurement: best-first, each stage self-contains its floor;
    # the parent keeps the best number seen and emits it at the end — a
    # successful headline stage emits immediately.  Failed probes REORDER
    # the plan cheapest-first (stream_small moves 4x less H2D over the
    # tunnel, so it fits a recovering window the big chain cannot) instead
    # of aborting: every stage carries its own hard timeout, so trying is
    # strictly better than emitting 0.0 — a wedge costs budget, never a hang.
    if probed:
        plan = [
            # the PRODUCT stage runs first (driver-auditable product-path
            # record, round-4 verdict #7): cache-warm it takes ~45 s; a
            # cold compile times out harmlessly and the headline still runs
            ("product_sharded", 150, False),
            ("stream_chain", 280, True),
            ("stream_chain_i32", 200, True),
            ("stream_small", 150, False),
            ("column", 120, False),
        ]
    else:
        print("# probes failed — cheapest-first plan", file=sys.stderr)
        plan = [
            ("stream_small", 170, False),
            ("stream_chain", 280, True),
        ]
    best = 0.0
    for name, need, is_headline in plan:
        if budget() < 45:
            break
        res = _spawn(name, min(need, budget() - 15))
        if res and res.get("gcups", 0) > 0:
            if is_headline:
                # the headline stage's k=33 slope is the robust methodology
                # (330+ ms delta vs tunnel jitter); it OVERRIDES any
                # shorter-chain stage that ran first, rather than letting a
                # jitter-optimistic small-stage slope win a max()
                best = res["gcups"]
                break
            best = max(best, res["gcups"])
    emit(best)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--stage":
        _run_stage_child(sys.argv[2])
    else:
        main()
