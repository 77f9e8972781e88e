"""Kernel shootout on real TPU: column-sublane vs column-lane vs wavefront.

Methodology: B=65536 pairs at 128x128 (1.07G cells), fully-synchronized
timing, with a small-B run subtracted to cancel fixed tunnel overheads.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def timed(run, reps=3):
    run()
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        run()
        best = min(best, time.time() - t0)
    return best


def main():
    import jax

    from swtpu.ops.pallas_kernel import sw_scores_pallas
    from swtpu.ops.pallas_lane import sw_scores_pallas_lane
    from swtpu.bank.streams import pack_streams, gather_stream_scores
    from swtpu.ops.pallas_stream import sw_scores_stream_strip

    import os

    rng = np.random.default_rng(0)
    m = n = 128
    B, Bs = 65536, 8192
    only = os.environ.get("SHOOTOUT_ONLY", "")
    q = jax.device_put(rng.integers(0, 4, (B, m)).astype(np.int8))
    t = jax.device_put(rng.integers(0, 4, (B, n)).astype(np.int8))
    qs, ts = q[:Bs], t[:Bs]
    cells, cells_s = B * m * n, Bs * m * n

    def report(name, big, small):
        tb, tsml = timed(big), timed(small)
        per = tb - tsml
        print(f"{name}: big {tb*1e3:.1f} ms, small {tsml*1e3:.1f} ms -> "
              f"{(cells-cells_s)/per/1e9:.1f} GCUPS", flush=True)

    if not only or only == "sublane":
        report(
            "column-sublane int32",
            lambda: np.asarray(sw_scores_pallas(q, t, block_pairs=1024, unroll=1)),
            lambda: np.asarray(sw_scores_pallas(qs, ts, block_pairs=1024, unroll=1)),
        )
    if not only or only == "lane":
        report(
            "column-lane    int32",
            lambda: np.asarray(sw_scores_pallas_lane(q, t, block_pairs=512)),
            lambda: np.asarray(sw_scores_pallas_lane(qs, ts, block_pairs=512)),
        )
    if only and only != "stream":
        return

    # wavefront: pack once (host-side), time kernel+gather
    t_host = np.asarray(t)
    targets = list(t_host)
    query = np.asarray(q[0])
    for S in (256, 512):
        batch = pack_streams(query, targets, n_streams=S)
        batch_s = pack_streams(query, targets[:Bs], n_streams=S)
        qd, sd = jax.device_put(batch.q), jax.device_put(batch.stream)
        qsd, ssd = jax.device_put(batch_s.q), jax.device_put(batch_s.stream)
        print(f"# wavefront S={S}: T={batch.stream.shape[1]} steps", flush=True)
        report(
            f"wavefront S={S} int32",
            lambda: np.asarray(sw_scores_stream_strip(qd, sd)),
            lambda: np.asarray(sw_scores_stream_strip(qsd, ssd)),
        )
    # correctness spot-check on the last config
    strip = np.asarray(sw_scores_stream_strip(qd, sd))
    got = gather_stream_scores(strip, batch)
    from swtpu.ops.scan import sw_scores_scan
    want = np.asarray(sw_scores_scan(np.tile(query[None, :64], (1,2)).reshape(1,128).repeat(64, 0), t[:64]))
    # simpler: compare against column kernel on first 64
    from swtpu.ops.pallas_kernel import sw_scores_pallas as col
    want2 = np.asarray(col(q[:64], t[:64], block_pairs=128, unroll=1))
    assert (got[:64] == want2).all(), "wavefront != column kernel!"
    print("wavefront parity vs column kernel: OK", flush=True)


if __name__ == "__main__":
    main()
