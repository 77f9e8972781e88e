"""Stream-kernel ablation timings (TPU): where do the cycles go?

Builds timing-only variants of the wavefront step with op groups removed
(results are WRONG for ablated variants — this measures cost, not scores):
  full      — the real D/G + tail-acc step (swtpu/ops/pallas_stream.py)
  norolls   — pltpu.roll(X) replaced by X (isolates sublane-roll cost)
  nosel     — boundary selects replaced by raw values
  arith     — only the max/add arithmetic core
  minimal   — a single max+add per plane (floor: loop/grid overhead)

Usage: python -u experiments/kernel_ablate.py [S] [chunks]
One compile per variant; difference big/small chunk counts so fixed costs
cancel.  Run only when the tunnel probe is healthy.
"""

import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir", str(Path(__file__).parents[1] / ".jaxcache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

LANES = 128
STEP_CHUNK = 32
MA, MI, GO, GE = 5, -4, -12, -4


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def make_kernel(variant, dt=jnp.int32):
    roll = (lambda x, k: x) if variant == "norolls" else (
        lambda x, k: pltpu.roll(x, k, axis=0)
    )
    sel = variant not in ("nosel", "arith", "minimal")

    def kern(q_ref, s_ref, out_ref, gp, d1p, d2p, hp, cp, ap):
        S = q_ref.shape[1]
        chunk = s_ref.shape[0]
        zero = jnp.array(0, dt)
        c = pl.program_id(0)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, 1), 0)
        seghead = row_iota == 0

        @pl.when(c == 0)
        def _init():
            z = jnp.zeros((LANES, S), dt)
            gp[...] = z
            d1p[...] = z
            d2p[...] = z
            hp[...] = z
            cp[...] = jnp.full((LANES, S), 4, jnp.int32)
            ap[...] = jnp.zeros((8, S), dt)

        q = q_ref[...].astype(jnp.int32)
        sc = s_ref[...].astype(jnp.int32)
        Gp, D1, D2, Hp, C = gp[...], d1p[...], d2p[...], hp[...], cp[...]
        acc = ap[0, :]
        oeme = jnp.array(GO, dt)
        gext = jnp.array(GE, dt)
        strip_rows = []
        for r in range(chunk):
            if variant == "minimal":
                D1 = jnp.maximum(D1 + gext, D2)
                D2 = D1
                strip_rows.append(D1[LANES - 1 : LANES, :].astype(jnp.int32))
                continue
            C = pltpu.roll(C, 1, axis=0) if variant != "norolls" else C
            newc = sc[r : r + 1, :]
            C = jnp.where(row_iota == 0, newc, C)
            f0 = C >= 8
            cval = C & 7
            s = jnp.where(cval == q, MA, MI).astype(dt)
            if variant == "arith":
                Mc = jnp.maximum(roll(D2, 1) + s, 0)
                Ic = jnp.maximum(roll(Gp, 1), Gp) + gext
                Hc = jnp.maximum(roll(Hp, 1), Mc)
            else:
                bmask = jnp.logical_or(seghead, f0)
                diag = jnp.where(bmask, zero, roll(D2, 1)) if sel else roll(D2, 1)
                Mc = jnp.maximum(diag + s, 0)
                G_up = jnp.where(seghead, zero, roll(Gp, 1)) if sel else roll(Gp, 1)
                G_left = jnp.where(f0, zero, Gp) if sel else Gp
                Ic = jnp.maximum(G_up, G_left) + gext
                Hc = jnp.maximum(
                    jnp.where(seghead, zero, roll(Hp, 1)) if sel else roll(Hp, 1),
                    Mc,
                )
            a = jnp.maximum(
                jnp.where(f0[LANES - 1, :], zero, acc) if sel else acc,
                Hc[LANES - 1, :],
            )
            acc = a
            strip_rows.append(a[None, :].astype(jnp.int32))
            D2 = D1
            D1 = jnp.maximum(Mc, Ic)
            Gp = jnp.maximum(Mc + oeme, Ic)
            Hp = Hc
        out_ref[...] = jnp.concatenate(strip_rows, axis=0)
        gp[...] = Gp
        d1p[...] = D1
        d2p[...] = D2
        hp[...] = Hp
        cp[...] = C
        ap[0, :] = acc

    return kern


def run_variant(variant, S, nc, dt=jnp.int32):
    T = nc * STEP_CHUNK
    rng = np.random.default_rng(0)
    qT = rng.integers(0, 4, (LANES, S)).astype(np.int8)
    stream = rng.integers(0, 4, (T, S)).astype(np.int8)
    f = pl.pallas_call(
        make_kernel(variant, dt),
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((LANES, S), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((STEP_CHUNK, S), lambda c: (c, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (STEP_CHUNK, S), lambda c: (c, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T, S), jnp.int32),
        scratch_shapes=[pltpu.VMEM((LANES, S), dt) for _ in range(4)]
        + [pltpu.VMEM((LANES, S), jnp.int32), pltpu.VMEM((8, S), dt)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )
    g = jax.jit(lambda q, s: f(q, s)[-1, 0])
    dq, ds = jax.device_put(qT), jax.device_put(stream)
    _ = np.asarray(g(dq, ds))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        _ = np.asarray(g(dq, ds))
        best = min(best, time.time() - t0)
    return best, T


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    dt_name = sys.argv[2] if len(sys.argv) > 2 else "int32"
    dt = {"int32": jnp.int32, "int16": jnp.int16, "float32": jnp.float32,
          "bfloat16": jnp.bfloat16}[dt_name]
    nc_lo, nc_hi = 64, 512
    for variant in ("minimal", "arith", "norolls", "nosel", "full"):
        try:
            t_lo, T_lo = run_variant(variant, S, nc_lo, dt)
            t_hi, T_hi = run_variant(variant, S, nc_hi, dt)
            per_step = (t_hi - t_lo) / (T_hi - T_lo)
            cells = LANES * S
            log(
                f"{dt_name} {variant:8s}: {per_step*1e9:8.1f} ns/step "
                f"-> {cells/per_step/1e9:7.1f} Gcell/s"
            )
        except Exception as e:  # noqa: BLE001
            log(f"{dt_name} {variant:8s}: FAILED {str(e)[:160]}")


if __name__ == "__main__":
    main()
