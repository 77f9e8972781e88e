"""Pallas TPU kernel, lane-major variant: query positions on VPU *lanes*.

Second point in the kernel design lineage (the analog of the reference's
explored-designs/ PE evolution): the column-per-step recurrence is identical
to swtpu.ops.pallas_kernel, but the layout is transposed —

    state M, I, H : [Bt, m]   — pairs on sublanes, query dim on lanes
    query  q      : [Bt, m]   int32
    targets t     : [Bt, n]   int8; column j broadcast from a lane slice

With m <= 128 every query-dim shift (the diagonal hand-off and the max-plus
prefix scan) is a single-vreg lane rotate, where the sublane-major layout
pays cross-register shuffles each roll.  Target columns are consumed from
aligned 128-column chunks (int8 lane tile) with static in-chunk offsets.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from swtpu.config import DEFAULT_PENALTIES, Penalties

LANE_TILE = 128


def _shift_right(x: jnp.ndarray, k: int, fill: jnp.ndarray, col_iota) -> jnp.ndarray:
    """out[:, i] = x[:, i-k] along the query (lane) axis; cols < k get fill."""
    rolled = pltpu.roll(x, k, axis=1)
    return jnp.where(col_iota < k, fill, rolled)


def _sw_kernel_lane(q_ref, t_ref, out_ref, *, ma, mi, go, ge, unroll):
    bt, m = q_ref.shape
    n = t_ref.shape[1]
    dt = jnp.int32
    neg = jnp.array(-(2**30), dt)
    zero = jnp.array(0, dt)
    col_iota = jax.lax.broadcasted_iota(dt, (1, m), 1)
    q = q_ref[:, :].astype(dt)
    i0_bias = jnp.where(col_iota == 0, jnp.array(ge, dt), neg)
    oe = jnp.array(go + ge, dt)
    gext = jnp.array(ge, dt)

    def one_column(t_col, carry):
        M, I, H = carry
        s = jnp.where(q == t_col, ma, mi).astype(dt)
        diag = jnp.maximum(M, I)
        diag_s = _shift_right(diag, 1, zero, col_iota)
        M_new = jnp.maximum(diag_s + s, 0)
        M_up = _shift_right(M_new, 1, zero, col_iota)
        base = jnp.maximum(
            jnp.maximum(M_up, M) + oe,
            jnp.maximum(I + gext, i0_bias),
        )
        x = base
        k = 1
        while k < m:
            x = jnp.maximum(
                x, _shift_right(x, k, neg, col_iota) + jnp.array(k * ge, dt)
            )
            k *= 2
        H = jnp.maximum(H, M_new)
        return M_new, x, H

    def chunk_step(jc, carry):
        start = pl.multiple_of(jc * LANE_TILE, LANE_TILE)
        tc = t_ref[:, pl.ds(start, LANE_TILE)].astype(dt)
        for r in range(LANE_TILE):
            t_col = jax.lax.broadcast_in_dim(tc[:, r], (bt, 1), (0,))
            carry = one_column(t_col, carry)
        return carry

    init = (
        jnp.zeros((bt, m), dt),
        jnp.zeros((bt, m), dt),
        jnp.zeros((bt, m), dt),
    )
    _, _, H = jax.lax.fori_loop(0, n // LANE_TILE, chunk_step, init, unroll=unroll)
    out_ref[:, 0] = jnp.max(H, axis=1)


@functools.partial(
    jax.jit, static_argnames=("penalties", "block_pairs", "interpret", "unroll")
)
def sw_scores_pallas_lane(
    q: jnp.ndarray,
    t: jnp.ndarray,
    penalties: Penalties = DEFAULT_PENALTIES,
    block_pairs: int = 512,
    interpret: bool = False,
    unroll: int = 1,
) -> jnp.ndarray:
    """Lane-major Pallas scorer.  Requires m <= 128 (single lane tile);
    longer queries use the sublane-major kernel or query chaining.

    Args/returns: as sw_scores_pallas.
    """
    from swtpu.ops.common import Q_PAD, T_PAD

    ma, mi, go, ge = penalties.astuple()
    B, m = q.shape
    n = t.shape[1]
    if m > LANE_TILE:
        raise ValueError(f"lane kernel requires m <= {LANE_TILE}, got {m}")
    bt = min(block_pairs, max(8, B))

    Bp = -(-B // bt) * bt
    mp = LANE_TILE  # pad query dim to the full lane tile
    chunk = LANE_TILE
    np_ = -(-n // chunk) * chunk
    if Bp != B or mp != m:
        q = jnp.pad(q, ((0, Bp - B), (0, mp - m)), constant_values=Q_PAD)
    if Bp != B or np_ != n:
        t = jnp.pad(t, ((0, Bp - B), (0, np_ - n)), constant_values=T_PAD)
    m, n = mp, np_
    nb = Bp // bt

    kernel = functools.partial(
        _sw_kernel_lane, ma=ma, mi=mi, go=go, ge=ge, unroll=unroll
    )
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bt, m), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, n), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=10 * m * n * Bp, bytes_accessed=(m + n) * Bp + 4 * Bp, transcendentals=0
        ),
        interpret=interpret,
    )(q.astype(jnp.int32), t.astype(jnp.int8))
    return out[:B, 0]
