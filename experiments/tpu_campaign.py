"""Sequential TPU experiment campaign (tunnel-safe).

Runs a queue of one-compile-per-run steps, each in a child process with a
hard timeout (killed by exact PID on expiry — never by pattern).  Between
steps a cheap probe gates progress; on probe failure the campaign sleeps
and retries, because tunnel wedges are transient.  At most ONE TPU process
exists at any time.

Usage: python -u experiments/tpu_campaign.py [queue-name]
Log: experiments/campaign.log (append-only, timestamped).
"""

import os
import signal
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
LOG = ROOT / "experiments" / "campaign.log"

QUEUES = {
    # round 5: extraction-tax isolation + regular-extract product path,
    # sharded loaded-db serving on mesh(1), biased long chain at 512 nt,
    # then a bench rehearsal to confirm the headline cache is intact
    # r5e: re-warm every driver-visible executable at the new chunk=16
    # flagship default, parity-check, then rehearse the exact driver bench
    # r5g: re-warm + re-prove the chained/segmented classes at the new
    # chunk=16 defaults, then two final bench rehearsals
    # r5h: beyond chunk=16 — 32-step body + S re-sweep at the new chunk
    "r5n": [
        (["experiments/tpu_step.py", "serve_socket_hw"], 1500),
    ],
    "r5m": [
        (["experiments/tpu_step.py", "bench_warm_i32_k1"], 1500),
        (["experiments/tpu_step.py", "bench_warm_i32_k33"], 1500),
        (["experiments/tpu_step.py", "bench_chain_i32"], 560),
        (["bench.py"], 560),
    ],
    "r5l": [
        (["experiments/tpu_step.py", "bench_small_warm"], 1500),
        (["experiments/tpu_step.py", "bench_col_stage"], 1500),
    ],
    "r5k": [
        (["experiments/tpu_step.py", "e2e_data1"], 1500),
        (["experiments/tpu_step.py", "e2e_data100"], 1500),
        (["experiments/tpu_step.py", "loaded_serve"], 1500),
        (["experiments/tpu_step.py", "warm_entry"], 560),
        (["bench.py"], 560),
    ],
    "r5j": [
        (["experiments/tpu_step.py", "biased_bench_w1"], 1500),
        (["experiments/tpu_step.py", "biased_bench_w33"], 1500),
        (["experiments/tpu_step.py", "biased_bench_chain"], 560),
        (["experiments/tpu_step.py", "long_k4_c32_w1"], 1500),
        (["experiments/tpu_step.py", "long_k4_c32"], 900),
        (["experiments/tpu_step.py", "chain_r8_seg2_c32_w1"], 1500),
        (["experiments/tpu_step.py", "chain_r8_seg2_c32"], 900),
    ],
    "r5i": [
        (["experiments/tpu_step.py", "bench_c32_w1"], 1500),
        (["experiments/tpu_step.py", "bench_c32_w33"], 1500),
        (["experiments/tpu_step.py", "bench_c32"], 560),
        (["experiments/tpu_step.py", "bench_c32"], 560),
        (["experiments/tpu_step.py", "bench_chain"], 560),
        (["experiments/tpu_step.py", "bench_chain"], 560),
    ],
    "r5h": [
        (["experiments/tpu_step.py", "chain_r16_c32_f32_w1"], 1500),
        (["experiments/tpu_step.py", "chain_r16_c32_f32"], 900),
        (["experiments/tpu_step.py", "chain_stream_r16_f32_s256"], 1500),
        (["experiments/tpu_step.py", "chain_stream_r16_f32_s1024"], 1500),
    ],
    "r5g": [
        (["experiments/tpu_step.py", "long_k4_w1"], 1500),
        (["experiments/tpu_step.py", "long_k4_17"], 900),
        (["experiments/tpu_step.py", "biased_long_w1"], 1500),
        (["experiments/tpu_step.py", "biased_long"], 900),
        (["experiments/tpu_step.py", "chain_r8_seg2_f32"], 1500),
        (["experiments/tpu_step.py", "chain_r4_seg4_f32"], 1500),
        (["experiments/tpu_step.py", "loaded_sharded"], 1500),
        (["experiments/tpu_step.py", "loaded_db"], 1500),
        (["bench.py"], 560),
        (["bench.py"], 560),
    ],
    "r5f": [
        (["experiments/tpu_step.py", "chain_r8_seg2_c16_w1"], 1500),
        (["experiments/tpu_step.py", "chain_r8_seg2_c16"], 900),
        (["experiments/tpu_step.py", "long_k4_c16_w1"], 1500),
        (["experiments/tpu_step.py", "long_k4_c16"], 900),
        (["experiments/tpu_step.py", "bench_warm_i32_k1"], 1500),
        (["experiments/tpu_step.py", "bench_warm_i32_k33"], 1500),
    ],
    "r5e": [
        (["experiments/tpu_step.py", "parity_r16_f32"], 1500),
        (["experiments/tpu_step.py", "bench_warm_k1"], 1500),
        (["experiments/tpu_step.py", "bench_warm_k33"], 1500),
        (["experiments/tpu_step.py", "shmosaic_reg_w1"], 1500),
        (["experiments/tpu_step.py", "shmosaic_reg_w33"], 1500),
        (["experiments/tpu_step.py", "warm_entry"], 1500),
        (["experiments/tpu_step.py", "loaded_sharded"], 1500),
        (["experiments/tpu_step.py", "biased_long_w1"], 1500),
        (["bench.py"], 560),
        (["bench.py"], 560),
    ],
    "r5d": [
        (["experiments/tpu_step.py", "chain_r16_c16_f32_w1"], 1500),
        (["experiments/tpu_step.py", "chain_r16_c16_f32"], 900),
    ],
    "r5c": [
        (["experiments/tpu_step.py", "loaded_sharded_seg"], 1500),
        (["experiments/tpu_step.py", "serve_socket_hw"], 1500),
        (["bench.py"], 560),
    ],
    "r5b": [
        (["experiments/tpu_step.py", "biased_long_wrap_w1"], 1500),
        (["experiments/tpu_step.py", "biased_long_wrap"], 1000),
    ],
    "r5": [
        (["experiments/tpu_step.py", "probe"], 300),
        (["experiments/tpu_step.py", "warm_entry"], 1500),
        (["experiments/tpu_step.py", "gather_ablate"], 1500),
        (["experiments/tpu_step.py", "shmosaic_reg_w1"], 1500),
        (["experiments/tpu_step.py", "shmosaic_reg_w33"], 1500),
        (["experiments/tpu_step.py", "shmosaic_reg"], 560),
        (["experiments/tpu_step.py", "loaded_sharded"], 1500),
        (["experiments/tpu_step.py", "biased_long_w1"], 1500),
        (["experiments/tpu_step.py", "biased_long"], 1000),
        (["bench.py"], 560),
    ],
    # round 3: make the driver bench real (scan-chain stages, warmed per-k),
    # confirm f32 parity on hardware, prewarm the graft entry, measure the
    # long-query chained path and many-vs-many pair streams, then rehearse
    # the exact driver command end-to-end
    "r3": [
        (["experiments/tpu_step.py", "parity_r16_f32"], 560),
        (["experiments/tpu_step.py", "parity_r8_f32"], 560),
        (["experiments/tpu_step.py", "bench_warm_k1"], 560),
        (["experiments/tpu_step.py", "bench_warm_k33"], 560),
        (["experiments/tpu_step.py", "bench_chain"], 560),
        (["experiments/tpu_step.py", "bench_warm_i32_k1"], 560),
        (["experiments/tpu_step.py", "bench_warm_i32_k33"], 560),
        (["experiments/tpu_step.py", "warm_entry"], 560),
        (["experiments/tpu_step.py", "bench_small_warm"], 560),
        (["experiments/tpu_step.py", "long_k4_w1"], 560),
        (["experiments/tpu_step.py", "long_k4"], 560),
        (["experiments/tpu_step.py", "long_k2_w1"], 560),
        (["experiments/tpu_step.py", "long_k2"], 560),
        (["experiments/tpu_step.py", "long_k16_w1"], 560),
        (["experiments/tpu_step.py", "long_k16"], 560),
        (["experiments/tpu_step.py", "pairs_w1"], 560),
        (["experiments/tpu_step.py", "pairs"], 560),
        (["experiments/tpu_step.py", "e2e_data1"], 560),
        (["experiments/tpu_step.py", "e2e_data100"], 560),
        (["experiments/tpu_step.py", "e2e_data500"], 560),
        (["bench.py"], 560),
    ],
    # r3 remainder: the rows=16 f32 compiles need ~10 min (measured: the
    # parity_r16_f32 compile ran 10-11 min; the 560 s step cap killed
    # bench_warm_k1 mid-compile).  Campaign children are detached from the
    # driver's ~590 s task cap, so compile-heavy warm steps get 1500 s;
    # measured (cache-warm) steps keep tighter caps.
    "r3b": [
        (["experiments/tpu_step.py", "bench_warm_k1"], 1500),
        (["experiments/tpu_step.py", "bench_warm_k33"], 1500),
        (["experiments/tpu_step.py", "bench_chain"], 560),
        (["experiments/tpu_step.py", "warm_entry"], 1500),
        (["experiments/tpu_step.py", "bench_warm_i32_k1"], 1500),
        (["experiments/tpu_step.py", "bench_warm_i32_k33"], 1500),
        (["experiments/tpu_step.py", "bench_small_warm"], 1500),
        (["experiments/tpu_step.py", "parity_r8_f32"], 1500),
        (["experiments/tpu_step.py", "long_k4_w1"], 1500),
        (["experiments/tpu_step.py", "long_k4"], 900),
        (["experiments/tpu_step.py", "long_k2_w1"], 1500),
        (["experiments/tpu_step.py", "long_k2"], 900),
        (["experiments/tpu_step.py", "long_k16_w1"], 1500),
        (["experiments/tpu_step.py", "long_k16"], 900),
        (["experiments/tpu_step.py", "pairs_w1"], 1500),
        (["experiments/tpu_step.py", "pairs"], 900),
        (["experiments/tpu_step.py", "e2e_data1"], 900),
        (["experiments/tpu_step.py", "e2e_data100"], 900),
        (["experiments/tpu_step.py", "e2e_data500"], 900),
        (["bench.py"], 560),
    ],
    # post-r3b: S-tune the f32 headline config (each step compiles its own
    # shapes; run after r3b so the queue stays serialized)
    "r3c": [
        (["experiments/tpu_step.py", "chain_stream_r16_f32_s256"], 1500),
        (["experiments/tpu_step.py", "chain_stream_r16_f32_s1024"], 1500),
        (["bench.py"], 560),
    ],
    # jitter-robust k=17 re-measures of the pairs / long chains (bodies
    # cached by r3b)
    "r3d": [
        # rehearsal first: the campaign's probe gate means bench.py starts
        # the moment the tunnel is healthy (both prior rehearsals landed in
        # post-load unavailability windows)
        (["bench.py"], 560),
        (["experiments/tpu_step.py", "pairs_k17"], 900),
        (["experiments/tpu_step.py", "long_k4_17"], 900),
        (["experiments/tpu_step.py", "chain_r4_seg4_f32"], 1500),
        (["experiments/tpu_step.py", "chain_r8_seg2_f32"], 1500),
    ],
    # re-warm the graft entry after it switched to the f32 product default,
    # then rehearse the driver bench once more
    "r3e": [
        (["experiments/tpu_step.py", "warm_entry"], 1500),
        (["bench.py"], 560),
    ],
    # round 4: flagship kernel as real Mosaic under shard_map on mesh(1)
    # (VERDICT #1).  Smoke first (rows=1, fast compile) to prove the path,
    # then the rows=16 f32 headline config (compiles ~10-11 min per new
    # executable; scan bodies cache across trip counts, so w1 pays and the
    # rest should hit).
    "r4": [
        (["experiments/tpu_step.py", "shmosaic_smoke"], 900),
        (["experiments/tpu_step.py", "shmosaic_w1"], 1500),
        (["experiments/tpu_step.py", "shmosaic_w5"], 1500),
        (["experiments/tpu_step.py", "shmosaic_chain"], 900),
        (["experiments/tpu_step.py", "shmosaic_chain17"], 900),
    ],
    # round 4b: e2e overlap A/B, big-batch sharded slope, biased-stream
    # hardware parity + throughput
    "r4b": [
        (["experiments/tpu_step.py", "e2e_overlap_w0"], 1500),
        (["experiments/tpu_step.py", "e2e_overlap_w17"], 1500),
        (["experiments/tpu_step.py", "e2e_overlap"], 1500),
        (["experiments/tpu_step.py", "shmosaic_big_w1"], 1500),
        (["experiments/tpu_step.py", "shmosaic_big_w33"], 1500),
        (["experiments/tpu_step.py", "shmosaic_big"], 900),
        (["experiments/tpu_step.py", "biased_parity_r16"], 1500),
        (["experiments/tpu_step.py", "biased_w1"], 1500),
        (["experiments/tpu_step.py", "biased_w5"], 1500),
        (["experiments/tpu_step.py", "biased_chain"], 900),
        (["bench.py"], 560),
    ],
    # round 4e: serving-path variants (on-device top-K, pipelined
    # multi-query) + final bench rehearsal
    "r4e": [
        (["experiments/tpu_step.py", "loaded_serve"], 1500),
        (["experiments/tpu_step.py", "warm_entry"], 900),
        (["bench.py"], 560),
    ],
    # round 4h: segmented short-query serving class
    "r4h": [
        (["experiments/tpu_step.py", "loaded_seg"], 1500),
        (["bench.py"], 560),
    ],
    # round 4g: e2e re-measure with the native one-pass wire packer
    "r4g": [
        (["experiments/tpu_step.py", "e2e_overlap"], 1500),
        (["experiments/tpu_step.py", "loaded_db"], 1500),
        (["bench.py"], 560),
    ],
    # round 4f: sharded chained-tile dispatch (review fix) as real Mosaic
    "r4f": [
        (["experiments/tpu_step.py", "shmosaic_long"], 1500),
        (["bench.py"], 560),
    ],
    # round 4c: overlap re-measure with the dispatch worker thread (the
    # r4b finding: same-thread chunking lost 15-25% because the tunnel
    # client blocks the dispatching thread through most of the H2D)
    "r4c": [
        (["experiments/tpu_step.py", "e2e_overlap"], 1500),
        (["experiments/tpu_step.py", "shmosaic_k0_w1"], 1500),
        (["experiments/tpu_step.py", "shmosaic_k0_w33"], 1500),
        (["experiments/tpu_step.py", "shmosaic_k0"], 900),
        (["experiments/tpu_step.py", "biased_bench_w1"], 1500),
        (["experiments/tpu_step.py", "biased_bench_w33"], 1500),
        (["experiments/tpu_step.py", "biased_bench_chain"], 900),
        (["bench.py"], 560),
    ],
    # round 4d: compile the NEW two-level top-K merge on hardware
    # (shmosaic_w1 re-runs with the updated _merge_topk HLO), biased
    # segmented parity, fast-window overlap retest, bench rehearsal
    "r4d": [
        (["experiments/tpu_step.py", "shmosaic_w1"], 1500),
        (["experiments/tpu_step.py", "biased_parity_r4_seg4"], 1500),
        (["experiments/tpu_step.py", "loaded_db"], 1500),
        (["experiments/tpu_step.py", "e2e_overlap"], 1500),
        (["bench.py"], 560),
    ],
    "perf1": [
        # (argv, timeout_s)
        (["experiments/tpu_step.py", "probe"], 120),
        (["experiments/microbench_ops.py"], 560),
        (["experiments/kernel_ablate.py", "512", "int32"], 560),
        (["experiments/tpu_step.py", "chain_stream_s512"], 480),
        (["experiments/tpu_step.py", "chain_stream_s512_f32"], 480),
    ],
    "perf2": [
        (["experiments/kernel_ablate.py", "512", "int16"], 560),
        (["experiments/kernel_ablate.py", "512", "float32"], 560),
        (["experiments/kernel_ablate.py", "1024", "int32"], 560),
    ],
    # multi-row wavefront: rolls amortized by R (the round-2 perf lever).
    # warm_* steps compile ONE jit each into the persistent cache so no
    # single process exceeds the task cap; the chain_* steps then measure
    # compile-free.
    "rows2": [
        (["experiments/tpu_step.py", "warm_r8_k1"], 560),
        (["experiments/tpu_step.py", "warm_r8_k5"], 560),
        (["experiments/tpu_step.py", "chain_stream_r8"], 560),
        (["experiments/tpu_step.py", "warm_r4_k1"], 560),
        (["experiments/tpu_step.py", "warm_r4_k5"], 560),
        (["experiments/tpu_step.py", "chain_stream_r4"], 560),
        (["experiments/tpu_step.py", "warm_r16_k1"], 560),
        (["experiments/tpu_step.py", "warm_r16_k5"], 560),
        (["experiments/tpu_step.py", "chain_stream_r16"], 560),
    ],
    "rows3": [
        (["experiments/tpu_step.py", "parity_i16"], 560),
        (["experiments/tpu_step.py", "parity_r8_i16"], 560),
        (["experiments/tpu_step.py", "warm_r8_i16_k1"], 560),
        (["experiments/tpu_step.py", "warm_r8_i16_k5"], 560),
        (["experiments/tpu_step.py", "chain_stream_r8_i16"], 560),
        (["experiments/tpu_step.py", "warm_r8_f32_k1"], 560),
        (["experiments/tpu_step.py", "warm_r8_f32_k5"], 560),
        (["experiments/tpu_step.py", "chain_stream_r8_f32"], 560),
    ],
    "e2e": [
        (["experiments/tpu_step.py", "e2e_data1"], 560),
        (["experiments/tpu_step.py", "e2e_data100"], 560),
        (["experiments/tpu_step.py", "e2e_data500"], 560),
    ],
    # remainder after the first sweep: f32 A/B, segmented chains, datasets
    # end-to-end, and warming the bench headline shapes into .jaxcache
    "sweep2": [
        (["experiments/tpu_step.py", "chain_stream_r16_f32"], 560),
        (["experiments/tpu_step.py", "chain_stream_r4_seg4"], 560),
        (["experiments/tpu_step.py", "chain_stream_r8_seg4"], 560),
        (["experiments/tpu_step.py", "chain_stream_r8_seg2"], 560),
        (["experiments/tpu_step.py", "e2e_data1"], 560),
        (["experiments/tpu_step.py", "e2e_data100"], 560),
        (["experiments/tpu_step.py", "e2e_data500"], 560),
    ],
    # post-rows2 sweep: rows=16 parity + tuning, segmented short-query
    # chains, int16 at rows<=8, then the reference datasets end-to-end
    "sweep": [
        (["experiments/tpu_step.py", "parity_r16"], 560),
        (["experiments/tpu_step.py", "parity_r16_seg4"], 560),
        (["experiments/tpu_step.py", "parity_i16"], 560),
        (["experiments/tpu_step.py", "parity_r8_i16"], 560),
        (["experiments/tpu_step.py", "chain_stream_r16_s1024"], 560),
        (["experiments/tpu_step.py", "chain_stream_r16_s256"], 560),
        (["experiments/tpu_step.py", "chain_stream_r16_c16"], 560),
        (["experiments/tpu_step.py", "chain_stream_r16_f32"], 560),
        (["experiments/tpu_step.py", "chain_stream_r16_seg4"], 560),
        (["experiments/tpu_step.py", "chain_stream_r4_seg4"], 560),
        (["experiments/tpu_step.py", "chain_stream_r8_i16"], 560),
        (["experiments/tpu_step.py", "chain_stream_r4_i16"], 560),
        (["experiments/tpu_step.py", "e2e_data1"], 560),
        (["experiments/tpu_step.py", "e2e_data100"], 560),
        (["experiments/tpu_step.py", "e2e_data500"], 560),
    ],
}


def log(msg):
    line = f"[{time.strftime('%Y-%m-%d %H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def run_child(argv, timeout_s):
    proc = subprocess.Popen(
        [sys.executable, "-u"] + argv,
        cwd=ROOT,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        start_new_session=True,
    )
    try:
        out, _ = proc.communicate(timeout=timeout_s)
        return proc.returncode, out
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except Exception:
            proc.kill()
        proc.wait()
        return -9, "(timed out)"


def probe_ok():
    rc, out = run_child(["experiments/tpu_step.py", "probe"], 120)
    return rc == 0 and "probe ok" in out


def main():
    queue = QUEUES[sys.argv[1] if len(sys.argv) > 1 else "perf1"]
    deadline = time.time() + float(os.environ.get("CAMPAIGN_BUDGET_S", "7200"))
    log(f"campaign start: {len(queue)} steps")
    # gate on a healthy tunnel first
    while time.time() < deadline:
        if probe_ok():
            log("probe ok — tunnel healthy")
            break
        log("probe failed — sleeping 300 s")
        time.sleep(300)
    else:
        log("campaign abandoned: tunnel never answered")
        return
    for argv, timeout_s in queue:
        if time.time() > deadline:
            log("campaign budget exhausted")
            break
        name = " ".join(argv)
        log(f"step start: {name}")
        rc, out = run_child(argv, timeout_s)
        for line in out.splitlines():
            log(f"  | {line}")
        log(f"step done: {name} rc={rc}")
        if rc != 0:
            # re-probe before continuing; wedged tunnel poisons everything.
            # Wedges can last an hour — keep probing until the budget runs
            # out rather than abandoning the queue.
            while time.time() < deadline and not probe_ok():
                log("tunnel wedged after failure — sleeping 300 s")
                time.sleep(300)
    log("campaign end")


if __name__ == "__main__":
    main()
