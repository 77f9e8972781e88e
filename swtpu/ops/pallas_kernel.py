"""Pallas TPU kernel for batched Smith-Waterman scoring.

TPU-native redesign of the reference's systolic ScoringModule
(ScoreBank/ScoringModule_v1.1.v): instead of one processing element per
query base advancing one anti-diagonal per clock, the kernel vectorizes the
*batch of alignment pairs* across VPU lanes and computes one full DP column
(all query rows of every pair in the block) per inner-loop step.

Layout (chosen so the per-step target-base broadcast is free):

    state M, I, H : [m, Bt]  — query dim on sublanes, pairs on lanes
    query  q      : [m, Bt]  int8
    targets t     : [n, Bt]  int8 — step j reads row j, broadcasting the
                               per-pair target base across all query rows

The merged in-del matrix's intra-column dependency
``I[i] = max(base[i], I[i-1] + ge)`` is a tropical (max-plus) prefix scan,
done in log2(m) Hillis-Steele steps of sublane-roll + add + max — the
vectorized equivalent of the PE chain's per-cycle systolic ripple
(ScoreBank/SW_ProcessingElement_v1.0.v:126-129).

Grid: one program per pair-block; XLA pipelines the HBM->VMEM streaming of
query/target blocks across programs (the role of the reference's SM_feeder
double-buffering, ScoreBank/SM_Feeder2.v:104-110).

Inputs must follow the sentinel-padding contract (swtpu.ops.common), so the
kernel contains no masks or length logic at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from swtpu.config import DEFAULT_PENALTIES, Penalties


def _shift_down(x: jnp.ndarray, k: int, fill: jnp.ndarray, row_iota) -> jnp.ndarray:
    """out[i] = x[i-k] along the query (sublane) axis; rows < k get `fill`."""
    rolled = pltpu.roll(x, k, axis=0)
    return jnp.where(row_iota < k, fill, rolled)


# Target rows are consumed in aligned chunks of `chunk` rows so the dynamic
# sublane start index is provably a multiple of the int8 tile height (32);
# within a chunk the per-row steps are Python-unrolled with static offsets.
T_CHUNK = 32


def _sw_kernel(
    q_ref, t_ref, out_ref, *, ma, mi, go, ge, unroll, chunk, dt=jnp.int32,
    biased_width=None,
):
    m, bt = q_ref.shape
    n = t_ref.shape[0]
    # f32 state is exact for integer scores below 2^24; int16 holds scores
    # to 8191 with headroom for the prefix-scan bias terms; int32 default.
    if dt == jnp.float32:
        neg = jnp.array(-(2**23), dt)
    elif dt == jnp.int16:
        neg = jnp.array(-(2**13), dt)
    else:
        neg = jnp.array(-(2**30), dt)
    zero = jnp.array(0, dt)
    if biased_width is not None:
        # SCORE_WIDTH wrap-parity mode: state holds W-bit *biased unsigned*
        # values (score + 2^(W-1)) in 32-bit lanes (the VPU has no 12-bit
        # datapath — the RTL's register width is emulated, not stored).
        # Only the M update needs the wrap (`& mask`) + sign-bit clamp
        # (SW_ProcessingElement_v1.0.v:15-20 + the M_bus select): the I
        # chain provably never wraps step-wise, because every cell refreshes
        # it with M_open >= ZERO + open + extend > 0 (requires
        # 2^(W-1) >= |open+extend| + |extend|, validated by the caller), so
        # its max-plus prefix scan runs in plain arithmetic — masking inside
        # the scan would be WRONG: a k-jump (x + k*ge) can dip below zero
        # and wrap even though no sequential step would.
        mask = jnp.array((1 << biased_width) - 1, dt)
        zbit = jnp.array(1 << (biased_width - 1), dt)
        zero = zbit  # biased representation of score 0 (boundary ties)
    # iota builds in int32 whatever the state dtype is: Mosaic's tpu.iota
    # is integer-only (a float iota is a verification error), and the iota
    # feeds comparisons exclusively
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    # compare in int32 so the predicate has int32 layout (int8 i1 vectors
    # force an unsupported relayout on current Mosaic)
    q = q_ref[:, :].astype(dt)
    # candidate fed to row 0 by the boundary I[-1][j] = 0 (RTL ZERO ties,
    # SW_ProcessingElement_v1.0.v:156-164)
    i0_bias = jnp.where(row_iota == 0, zero + jnp.array(ge, dt), neg)
    oe = jnp.array(go + ge, dt)
    gext = jnp.array(ge, dt)

    def one_column(t_row, carry):
        M, I, H = carry
        s = jnp.where(q == t_row, ma, mi).astype(dt)
        diag = jnp.maximum(M, I)
        diag_s = _shift_down(diag, 1, zero, row_iota)
        if biased_width is not None:
            ms = (diag_s + s) & mask
            M_new = jnp.where((ms & zbit) != 0, ms, zbit)
        else:
            M_new = jnp.maximum(diag_s + s, 0)
        M_up = _shift_down(M_new, 1, zero, row_iota)
        base = jnp.maximum(
            jnp.maximum(M_up, M) + oe,
            jnp.maximum(I + gext, i0_bias),
        )
        # max-plus prefix scan along query rows
        x = base
        k = 1
        while k < m:
            x = jnp.maximum(x, _shift_down(x, k, neg, row_iota) + jnp.array(k * ge, dt))
            k *= 2
        H = jnp.maximum(H, M_new)
        return M_new, x, H

    def chunk_step(jc, carry):
        start = pl.multiple_of(jc * chunk, chunk)
        tc = t_ref[pl.ds(start, chunk), :].astype(dt)
        for r in range(chunk):
            carry = one_column(tc[r : r + 1, :], carry)
        return carry

    init = (
        jnp.full((m, bt), zero, dt),
        jnp.full((m, bt), zero, dt),  # boundary column I = 0 (RTL ZERO tie)
        jnp.full((m, bt), zero, dt),
    )
    _, _, H = jax.lax.fori_loop(0, n // chunk, chunk_step, init, unroll=unroll)
    out_ref[0, :] = (jnp.max(H, axis=0) - zero).astype(jnp.int32)


def _sw_kernel_chained(
    q_ref, t_ref, ms_ref, is_ref, h_ref, out_h, out_ms, out_is,
    *, ma, mi, go, ge, unroll, chunk, dt=jnp.int32, biased_width=None,
):
    """One query tile of the chained DP: rows [tile*mt, tile*mt+mt) of the
    full query, all target columns.

    The strip refs carry the previous tile's LAST-ROW state per target
    column — ms/is = M/I at (prev tile's last row, j) — exactly the data the
    reference's reserved chaining ports would ship between cascaded
    ScoringModules (ScoreBank/ScoringModule_v1.1.v:36-54).  First tile gets
    all-zero strips (the zero boundary).  out_ms/out_is are this tile's
    last-row strips; out_h accumulates the running high score.
    """
    mt, bt = q_ref.shape
    n = t_ref.shape[0]
    if dt == jnp.float32:
        neg = jnp.array(-(2**23), dt)
    elif dt == jnp.int16:
        neg = jnp.array(-(2**13), dt)
    else:
        neg = jnp.array(-(2**30), dt)
    zero = jnp.array(0, dt)
    if biased_width is not None:
        # SCORE_WIDTH wrap-parity (see _sw_kernel: only the M update wraps;
        # the I path provably never does for validated widths); the
        # inter-tile strips carry biased values so wrap semantics survive
        # chaining.
        mask = jnp.array((1 << biased_width) - 1, dt)
        zbit = jnp.array(1 << (biased_width - 1), dt)
        zero = zbit
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (mt, 1), 0)  # int-only iota
    row0 = row_iota == 0
    q = q_ref[:, :].astype(dt)
    oe = jnp.array(go + ge, dt)
    gext = jnp.array(ge, dt)

    def one_column(t_row, ms_j, is_j, carry):
        M, I, H, dprev = carry
        s = jnp.where(q == t_row, ma, mi).astype(dt)
        diag = jnp.maximum(M, I)
        # row 0's diagonal neighbour is (prev tile's last row, j-1)
        diag_s = jnp.where(row0, dprev, pltpu.roll(diag, 1, axis=0))
        if biased_width is not None:
            ms = (diag_s + s) & mask
            M_new = jnp.where((ms & zbit) != 0, ms, zbit)
        else:
            M_new = jnp.maximum(diag_s + s, 0)
        # row 0's up-neighbour M is the incoming strip at column j
        M_up = jnp.where(row0, ms_j, pltpu.roll(M_new, 1, axis=0))
        # row 0's intra-column I seed: I(prev last row, j) + ge
        i0_bias = jnp.where(row0, is_j + gext, neg)
        base = jnp.maximum(
            jnp.maximum(M_up, M) + oe,
            jnp.maximum(I + gext, i0_bias),
        )
        x = base
        k = 1
        while k < mt:
            x = jnp.maximum(x, _shift_down(x, k, neg, row_iota) + jnp.array(k * ge, dt))
            k *= 2
        H = jnp.maximum(H, M_new)
        return M_new, x, H, jnp.maximum(ms_j, is_j)

    last = mt - 1

    def chunk_step(jc, carry):
        start = pl.multiple_of(jc * chunk, chunk)
        tc = t_ref[pl.ds(start, chunk), :].astype(dt)
        msc = ms_ref[pl.ds(start, chunk), :].astype(dt)
        isc = is_ref[pl.ds(start, chunk), :].astype(dt)
        ms_rows = []
        is_rows = []
        for r in range(chunk):
            carry = one_column(
                tc[r : r + 1, :], msc[r : r + 1, :], isc[r : r + 1, :], carry
            )
            M_new, x = carry[0], carry[1]
            ms_rows.append(M_new[last : last + 1, :])
            is_rows.append(x[last : last + 1, :])
        out_ms[pl.ds(start, chunk), :] = jnp.concatenate(ms_rows, axis=0).astype(
            jnp.int32
        )
        out_is[pl.ds(start, chunk), :] = jnp.concatenate(is_rows, axis=0).astype(
            jnp.int32
        )
        return carry

    init = (
        jnp.full((mt, bt), zero, dt),
        jnp.full((mt, bt), zero, dt),
        jnp.full((mt, bt), zero, dt),
        jnp.full((1, bt), zero, dt),  # diag at column -1 = zero boundary
    )
    carry = jax.lax.fori_loop(0, n // chunk, chunk_step, init, unroll=unroll)
    H = carry[2]
    out_h[0, :] = jnp.maximum(h_ref[0, :], jnp.max(H, axis=0).astype(jnp.int32))


def _block_pairs_default(m: int) -> int:
    # keep ~3 int32 state arrays + temps comfortably inside VMEM
    if m <= 128:
        return 1024
    if m <= 256:
        return 512
    return 256


# Queries longer than this are scored by chaining query tiles of this many
# rows, carrying last-row M/I strips between tiles (the reference's reserved
# module-chaining ports, ScoreBank/ScoringModule_v1.1.v:36-54).  LEN_WIDTH=12
# in the RTL (ScoreBank/ScoreBank_v2.v:14-15) declares the 4095-base intent.
QUERY_TILE = 256


def _block_pairs_chained(n: int) -> int:
    # in+out strips are 16 B/column/pair (2x int32 in, 2x int32 out) plus the
    # int8 target block; keep the working set ~<= 8 MB of the ~16 MB VMEM so
    # grid pipelining has room to double-buffer
    budget = 8 * 2**20
    bt = budget // max(1, n * 17)
    return max(128, min(512, (bt // 128) * 128))


@functools.partial(
    jax.jit,
    static_argnames=(
        "penalties", "block_pairs", "interpret", "unroll", "state_dtype",
        "score_width",
    ),
)
def sw_scores_pallas(
    q: jnp.ndarray,
    t: jnp.ndarray,
    penalties: Penalties = DEFAULT_PENALTIES,
    block_pairs: int | None = None,
    interpret: bool = False,
    unroll: int = 4,
    state_dtype: str = "int32",
    score_width: int = 12,
) -> jnp.ndarray:
    """Score a batch of (query, target) pairs on TPU.

    Args:
      q: [B, m] int8 base codes, sentinel-padded (Q_PAD).
      t: [B, n] int8 base codes, sentinel-padded (T_PAD).
      penalties: static scoring penalties.
      block_pairs: pairs per kernel block (lane-tiled); auto if None.
      interpret: run in Pallas interpreter mode (CPU testing).
      unroll: inner-loop unroll factor.
      state_dtype: "int32" (exact, default) | "float32" | "int16" (narrow
        exact modes) | "int16_biased" — SCORE_WIDTH wrap-parity mode that
        reproduces the RTL's biased `score_width`-bit register arithmetic
        including overflow wrap + sign-bit clamp (oracle:
        `sw_score_single_biased`; SW_ProcessingElement_v1.0.v:15-20).
      score_width: register width for "int16_biased" (RTL default 12).

    Returns: [B] int32 scores.
    """
    from swtpu.ops.common import Q_PAD, T_PAD

    ma, mi, go, ge = penalties.astuple()
    B, m = q.shape
    n = t.shape[1]
    biased_width = None
    if state_dtype == "int16_biased":
        # 32-bit lanes carry the W-bit biased values; the emulated register
        # width is score_width, not the lane width.  The no-wrap proof for
        # the I chain needs ZERO + open + 2*extend >= 0 (see _sw_kernel).
        if not 2 <= score_width <= 30:
            raise ValueError(
                f"score_width={score_width} out of range (need 2..30: the "
                "biased values live in 32-bit lanes)"
            )
        if (1 << (score_width - 1)) + (go + ge) + ge < 0:
            raise ValueError(
                f"score_width={score_width} too narrow for penalties "
                f"(need 2^(W-1) >= {-(go + 2 * ge)})"
            )
        biased_width = score_width
        state_dtype = "int32"
    dt = jnp.dtype(state_dtype).type if state_dtype != "int32" else jnp.int32
    chained = m > QUERY_TILE
    if chained:
        bt = block_pairs or _block_pairs_chained(n)
    else:
        bt = block_pairs or _block_pairs_default(m)
    bt = min(bt, max(128, B))
    # interpreter mode has no tile-alignment constraints; a small chunk and
    # unroll=1 keep the traced program (chunk x unrolled column bodies)
    # tractable — unroll is a TPU-perf knob only
    chunk = 8 if interpret else T_CHUNK
    if interpret:
        unroll = 1

    # static-shape padding, all with sentinels (provably score-neutral):
    #   pairs  -> whole number of lane blocks
    #   query  -> multiple of 8 sublanes (int32 state tile height), or of
    #             QUERY_TILE rows when tile-chaining
    #   target -> multiple of `chunk` rows (aligned chunked loads)
    Bp = -(-B // bt) * bt
    mq = QUERY_TILE if chained else 8
    mp = -(-m // mq) * mq
    np_ = -(-n // chunk) * chunk
    if Bp != B or mp != m:
        q = jnp.pad(q, ((0, Bp - B), (0, mp - m)), constant_values=Q_PAD)
    if Bp != B or np_ != n:
        t = jnp.pad(t, ((0, Bp - B), (0, np_ - n)), constant_values=T_PAD)
    m, n = mp, np_
    nb = Bp // bt

    qT = q.astype(jnp.int8).T  # [m, Bp]
    tT = t.astype(jnp.int8).T  # [n, Bp]

    if chained:
        return _chained_call(
            qT, tT, ma, mi, go, ge, interpret, unroll, chunk, dt, bt, nb,
            biased_width=biased_width,
        )[0, :B]

    kernel = functools.partial(
        _sw_kernel, ma=ma, mi=mi, go=go, ge=ge, unroll=unroll, chunk=chunk,
        dt=dt, biased_width=biased_width,
    )
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((m, bt), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, bt), lambda b: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bt), lambda b: (0, b), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Bp), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=10 * m * n * Bp, bytes_accessed=(m + n) * Bp + 4 * Bp, transcendentals=0
        ),
        interpret=interpret,
    )(qT, tT)
    return out[0, :B]


def _chained_call(
    qT, tT, ma, mi, go, ge, interpret, unroll, chunk, dt, bt, nb,
    biased_width=None,
):
    """Chain QUERY_TILE-row kernel invocations over the query dimension,
    threading last-row M/I strips and the running high score through HBM
    between tiles (SURVEY.md §5 long-context; the chaining-ports analog)."""
    m, Bp = qT.shape
    n = tT.shape[0]
    mt = QUERY_TILE
    kernel = functools.partial(
        _sw_kernel_chained, ma=ma, mi=mi, go=go, ge=ge, unroll=unroll,
        chunk=chunk, dt=dt, biased_width=biased_width,
    )
    strip_spec = pl.BlockSpec((n, bt), lambda b: (0, b), memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((1, bt), lambda b: (0, b), memory_space=pltpu.VMEM)
    # boundary strips/high score: biased zero when wrap-parity is on
    z0 = (1 << (biased_width - 1)) if biased_width is not None else 0
    h = jnp.full((1, Bp), z0, jnp.int32)
    ms = jnp.full((n, Bp), z0, jnp.int32)
    is_ = jnp.full((n, Bp), z0, jnp.int32)
    for k in range(m // mt):
        qtile = jax.lax.slice(qT, (k * mt, 0), ((k + 1) * mt, Bp))
        h, ms, is_ = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((mt, bt), lambda b: (0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, bt), lambda b: (0, b), memory_space=pltpu.VMEM),
                strip_spec,
                strip_spec,
                h_spec,
            ],
            out_specs=(h_spec, strip_spec, strip_spec),
            out_shape=(
                jax.ShapeDtypeStruct((1, Bp), jnp.int32),
                jax.ShapeDtypeStruct((n, Bp), jnp.int32),
                jax.ShapeDtypeStruct((n, Bp), jnp.int32),
            ),
            cost_estimate=pl.CostEstimate(
                flops=10 * mt * n * Bp,
                bytes_accessed=(mt + n) * Bp + 16 * n * Bp,
                transcendentals=0,
            ),
            interpret=interpret,
        )(qtile, tT, ms, is_, h)
    return h - z0
