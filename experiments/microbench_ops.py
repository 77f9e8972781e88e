"""Microbenchmark: per-op cost of the SW kernel's primitive patterns on TPU.

Measures the compound "shifted max-plus" pattern (roll + add + max) that
dominates the scoring kernels, across axis (lane vs sublane), dtype, and
shape — to decide kernel layout.  Methodology: difference two step counts
of a dependent-chain fori_loop, fully synchronized, so fixed tunnel/dispatch
overheads cancel.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, L = 512, 128
OPS_PER_STEP = 8


def make_kernel(pattern, dtype, steps):
    def kern(x_ref, o_ref):
        y = x_ref[...]
        c = jnp.array(1, dtype)

        def body(i, y):
            for k in range(OPS_PER_STEP):
                if pattern == "roll_lane":
                    y = jnp.maximum(y, pltpu.roll(y, 1, axis=1) + c)
                elif pattern == "roll_sub":
                    y = jnp.maximum(y, pltpu.roll(y, 1, axis=0) + c)
                elif pattern == "addmax":
                    y = jnp.maximum(y + c, y)
                elif pattern == "select":
                    y = jnp.where(y > c, y, y + c)
                else:
                    raise ValueError(pattern)
            # keep values bounded
            return y - y // jnp.array(7, dtype) * jnp.array(7, dtype)

        y = jax.lax.fori_loop(0, steps, body, y)
        o_ref[...] = y

    return kern


def run(pattern, dtype, steps):
    x = jnp.asarray(np.random.default_rng(0).integers(0, 5, (S, L)), dtype)
    f = pl.pallas_call(
        make_kernel(pattern, dtype, steps),
        out_shape=jax.ShapeDtypeStruct((S, L), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    g = jax.jit(lambda x: f(x))
    _ = np.asarray(g(x))
    best = 1e9
    for _ in range(4):
        t0 = time.time()
        _ = np.asarray(g(x))
        best = min(best, time.time() - t0)
    return best


def main():
    lo, hi = 2000, 20000
    for dtype in (jnp.int32, jnp.int16, jnp.float32, jnp.bfloat16):
        for pattern in ("addmax", "select", "roll_lane", "roll_sub"):
            try:
                t_lo = run(pattern, dtype, lo)
                t_hi = run(pattern, dtype, hi)
                per_op = (t_hi - t_lo) / ((hi - lo) * OPS_PER_STEP)
                elems = S * L
                print(
                    f"{dtype.__name__:9s} {pattern:10s}: {per_op*1e9:7.2f} ns/op "
                    f"-> {elems/per_op/1e12:6.2f} Telem/s",
                    flush=True,
                )
            except Exception as e:
                print(f"{dtype.__name__:9s} {pattern:10s}: FAILED {str(e)[:80]}", flush=True)


if __name__ == "__main__":
    main()
