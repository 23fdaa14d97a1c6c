"""Fused (norm-affine → SiLU → dropout →) 3×3 conv Pallas TPU kernels.

Why: the reference's UNet spends its FLOPs in cuDNN 3×3 convs
(/root/reference/src/models/components/shared_encoder.py:15-19 and the
torchcfm UNetModel's ResBlocks). On TPU, XLA's conv kernels measured only
~45% MFU at the flagship level shapes — forward AND backward — while MXU
matmul chains run much hotter (scripts/conv_probe.py, round 3). These kernels
express the 3×3 SAME conv as 9 shifted MXU matmuls over row-chunks streamed
HBM→VMEM with double-buffered DMA, and fuse the ResBlock prologue
(GroupNorm affine + FiLM scale-shift + SiLU + dropout) into the input stream
so the normalized activation never round-trips HBM.

Layout contract (TPU tiling):
- x (B, H, W, C) bf16 · w (3, 3, C, D) · out (B, H, W, D) bf16
- C, D multiples of 128 (MXU lane width); W a multiple of 16 (bf16 sublane);
  H a multiple of the row chunk TH (16 / 8 / H).
- ``scale``/``shift``: per-(B, C) f32 affine applied BEFORE the activation:
  n = dropout(act(x·scale + shift)). GroupNorm(+FiLM) folds into exactly this
  form (see fold_norm_affine).
- SAME zero padding applies to the *normalized* tensor (reference semantics:
  torch pads the conv input, i.e. after norm/act/dropout), enforced by
  masking off-image halo rows after the prologue.
- Dropout masks are a pure function of (seed, sample, ABSOLUTE row) so the
  same logical row gets the same mask whether it enters a chunk as main data
  or as a neighbour's halo — and so the backward kernels can regenerate
  identical masks without storing them.

Backward: input-grad is the same conv with tap-flipped transposed weights
(:func:`conv3x3_input_grad`) followed by the elementwise prologue gradient
(:func:`prologue_grad`); weight-grad is a dedicated accumulation kernel
(:func:`conv3x3_weight_grad`). models/unet.py assembles them via custom_vjp.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUBLANE_BF16 = 16


import os

_TH_PREF = int(os.environ.get("S2S_CONV_TH", "16"))  # perf experiment knob


def _chunk_rows(H: int) -> int:
    for th in (_TH_PREF, 16, 8):
        if H % th == 0 and H >= th:
            return th
    return H


def supported(x_shape, w_shape) -> bool:
    """Whether the fused kernel handles this conv (else caller uses XLA)."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    B, H, W, C = x_shape
    kh, kw, Ci, D = w_shape
    return (
        kh == 3 and kw == 3 and Ci == C
        and C % LANE == 0 and D % LANE == 0
        and W % SUBLANE_BF16 == 0 and H % _chunk_rows(H) == 0 and H >= 8
    )


def fold_norm_affine(mean, rstd, gamma, beta, film_scale=None, film_shift=None):
    """Fold GroupNorm stats (+ optional FiLM) into per-(B, C) scale/shift.

    GroupNorm: n = (x − mean)·rstd·γ + β with mean/rstd per (B, C) (already
    broadcast from groups); FiLM: n·(1 + s) + t. Returns (scale, shift) f32
    such that the whole prologue is x·scale + shift.
    """
    gamma = gamma.astype(jnp.float32)[None, :]
    beta = beta.astype(jnp.float32)[None, :]
    scale = rstd.astype(jnp.float32) * gamma
    shift = beta - mean.astype(jnp.float32) * scale
    if film_scale is not None:
        fs = 1.0 + film_scale.astype(jnp.float32)
        scale = scale * fs
        shift = shift * fs + film_shift.astype(jnp.float32)
    return scale, shift


def _keep_mask(seed0, b, abs_row, W: int, C: int, rate: float):
    """(W, C) f32 dropout keep·1/(1−p) mask, deterministic per (seed, b, row)."""
    pltpu.prng_seed(seed0 + b * 1_000_003 + abs_row)
    bits = pltpu.bitcast(pltpu.prng_random_bits((W, C)), jnp.uint32)
    thresh = jnp.uint32(int(rate * 2**32))
    return (bits >= thresh).astype(jnp.float32) * (1.0 / (1.0 - rate))


def _prologue(xin, k, b, seed_ref, scale_vec, shift_vec, *,
              TH: int, H: int, W: int, C: int,
              act, affine: bool, dropout_rate: float, halo: bool):
    """normalized bf16 block from a raw (TH+halo*2, W, C) bf16 block.

    Off-image halo rows are zeroed AFTER the prologue (SAME-pad semantics on
    the normalized tensor).
    """
    rows = TH + 2 * int(halo)
    if affine:
        z = xin.astype(jnp.float32) * scale_vec[None, None, :] + shift_vec[None, None, :]
    else:
        z = xin.astype(jnp.float32)
    n = z * jax.nn.sigmoid(z) if act == "silu" else z
    if dropout_rate > 0.0:
        seed0 = seed_ref[0]
        masks = [
            _keep_mask(seed0, b, k * TH - int(halo) + r, W, C, dropout_rate)
            for r in range(rows)
        ]
        n = n * jnp.stack(masks)
    if halo:
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0)
        abs_rows = k * TH - 1 + row_ids
        valid = (abs_rows >= 0) & (abs_rows < H)
        n = jnp.where(valid, n, 0.0)
    return n.astype(jnp.bfloat16)


def _col_shifts(n, W: int):
    """(n[:, c−1], n[:, c], n[:, c+1]) with zero edges — the dx = 0/1/2 taps.
    pltpu.roll is a cheap sublane rotate, but Mosaic only implements rotates
    for 32-bit data ("Rotate with non-32-bit data" for bf16, whose sublanes
    are packed 2-per-register-row) — so rotate an f32 view and downcast. Still
    far cheaper than sublane-misaligned slices of a width-padded buffer, which
    force a full VPU relayout per tap (measured: erased the whole MXU win)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)
    nf = n.astype(jnp.float32)
    zero = jnp.zeros_like(nf)
    right = jnp.where(col == 0, zero, pltpu.roll(nf, 1, 1)).astype(n.dtype)
    # pltpu.roll requires shift >= 0: rotating by W-1 == rotating by -1
    left = jnp.where(col == W - 1, zero, pltpu.roll(nf, W - 1, 1)).astype(n.dtype)
    return right, n, left


def _in_dmas(x_hbm, xbuf, sems, b, k, slot, TH: int, H: int):
    """3 static-size DMAs: TH main rows + clamped top/bottom halo rows.
    Off-image halo rows carry duplicated edge data; the prologue masks them."""
    row0 = k * TH
    return (
        pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(row0, TH)], xbuf.at[slot, pl.ds(1, TH)],
            sems.at[slot, 0],
        ),
        pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(jnp.maximum(row0 - 1, 0), 1)],
            xbuf.at[slot, pl.ds(0, 1)], sems.at[slot, 1],
        ),
        pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(jnp.minimum(row0 + TH, H - 1), 1)],
            xbuf.at[slot, pl.ds(TH + 1, 1)], sems.at[slot, 2],
        ),
    )


def _conv_kernel(
    x_hbm, scale_ref, shift_ref, seed_ref, w_ref, bias_ref, out_hbm,
    xbuf, obuf, in_sems, out_sems,
    *,
    TH: int, H: int, W: int, C: int, D: int,
    act, affine: bool, dropout_rate: float,
):
    """grid = (B,), H streamed in TH-row chunks with 2-slot double buffering."""
    b = pl.program_id(0)
    n_chunks = H // TH

    def out_dma(k, slot):
        return pltpu.make_async_copy(
            obuf.at[slot], out_hbm.at[b, pl.ds(k * TH, TH)], out_sems.at[slot],
        )

    for dma in _in_dmas(x_hbm, xbuf, in_sems, b, 0, 0, TH, H):
        dma.start()

    def body(k, _):
        slot = jax.lax.rem(k, 2)
        nslot = jax.lax.rem(k + 1, 2)

        @pl.when(k + 1 < n_chunks)
        def _():
            for dma in _in_dmas(x_hbm, xbuf, in_sems, b, k + 1, nslot, TH, H):
                dma.start()

        for dma in _in_dmas(x_hbm, xbuf, in_sems, b, k, slot, TH, H):
            dma.wait()

        n = _prologue(
            xbuf[slot], k, b, seed_ref, scale_ref[b], shift_ref[b],
            TH=TH, H=H, W=W, C=C, act=act, affine=affine,
            dropout_rate=dropout_rate, halo=True,
        )
        # Column taps via hardware sublane rotate (pltpu.roll) — slicing a
        # width-(W+2) pad at offsets 1/2 is a sublane-misaligned access that
        # forces a VPU relayout per tap (measured: erased the whole MXU win).
        # Row taps are leading-dim slices (address offsets, free).
        shifted = _col_shifts(n, W)

        # 2-D (TH·W, C) @ (C, D) tap matmuls — the (TH·W) merge is layout-free
        # (C stays the lane dim) and a single large-M matmul pipelines the MXU
        # better than a 3-D batched form.
        acc = jnp.zeros((TH * W, D), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                patch = shifted[dx][dy : dy + TH].reshape(TH * W, C)
                acc = acc + jax.lax.dot_general(
                    patch, w_ref[dy, dx],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        acc = acc.reshape(TH, W, D) + bias_ref[0][None, None, :]

        @pl.when(k >= 2)
        def _():
            out_dma(k - 2, slot).wait()

        obuf[slot] = acc.astype(jnp.bfloat16)
        out_dma(k, slot).start()
        return ()

    jax.lax.fori_loop(0, n_chunks, body, ())

    if n_chunks >= 2:
        out_dma(n_chunks - 2, (n_chunks - 2) % 2).wait()
    out_dma(n_chunks - 1, (n_chunks - 1) % 2).wait()


def fused_conv3x3(
    x: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array] = None,
    scale: Optional[jax.Array] = None,
    shift: Optional[jax.Array] = None,
    act: Optional[str] = None,
    dropout_rate: float = 0.0,
    seed: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """y = conv3x3_same(dropout(act(x·scale + shift)), w) + bias, one kernel.

    x (B,H,W,C) bf16 · w (3,3,C,D) · scale/shift (B,C) f32 or None ·
    bias (D,) or None → bf16 (B,H,W,D). Gate with :func:`supported`.
    """
    B, H, W, C = x.shape
    D = w.shape[-1]
    assert supported(x.shape, w.shape), (x.shape, w.shape)
    TH = _chunk_rows(H)
    affine = scale is not None
    if scale is None:
        scale = jnp.zeros((B, C), jnp.float32)
        shift = jnp.zeros((B, C), jnp.float32)
    if bias is None:
        bias = jnp.zeros((D,), jnp.float32)
    seed = (
        jnp.zeros((1,), jnp.int32)
        if seed is None
        else jnp.asarray(seed, jnp.int32).reshape(1)
    )

    kernel = functools.partial(
        _conv_kernel,
        TH=TH, H=H, W=W, C=C, D=D,
        act=act, affine=affine, dropout_rate=float(dropout_rate),
    )
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # x stays in HBM; DMA'd
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scale (B, C)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # shift (B, C)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w (3,3,C,D)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias (1, D)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, H, W, D), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, TH + 2, W, C), jnp.bfloat16),
            pltpu.VMEM((2, TH, W, D), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * 9 * C * D,
            bytes_accessed=x.size * 2 + B * H * W * D * 2 + w.size * 2,
            transcendentals=x.size if act == "silu" else 0,
        ),
        interpret=interpret,
    )(
        x.astype(jnp.bfloat16),
        scale.astype(jnp.float32),
        shift.astype(jnp.float32),
        seed,
        w.astype(jnp.bfloat16),
        bias.astype(jnp.float32).reshape(1, D),
    )


def conv3x3_input_grad(dy: jax.Array, w: jax.Array, interpret: bool = False) -> jax.Array:
    """dn = conv3x3_same(dy, flip(w)ᵀ): the input-gradient of a SAME 3×3 conv
    is itself a SAME 3×3 conv with taps flipped and channels swapped — reuses
    the forward kernel at full speed. Returns the gradient w.r.t. the
    *normalized* input; chain :func:`prologue_grad` for the raw-x gradient."""
    wt = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)  # (3,3,D,C)
    return fused_conv3x3(dy, wt, interpret=interpret)


# --------------------------------------------------------- prologue gradient


def _prologue_grad_kernel(
    x_ref, dn_ref, scale_ref, shift_ref, seed_ref, dx_ref, dscale_ref, dshift_ref,
    *, TH: int, H: int, W: int, C: int, act, affine: bool, dropout_rate: float,
):
    """Elementwise VJP of n = dropout(act(x·scale + shift)) given dn:
    dz = dn·mask·act'(z);  dx = dz·scale;  dscale = Σ_hw dz·x;  dshift = Σ_hw dz.
    grid = (B, H/TH); the per-(B, C) sums accumulate into revisited blocks."""
    k = pl.program_id(1)
    b = pl.program_id(0)
    x = x_ref[0].astype(jnp.float32)
    dn = dn_ref[0].astype(jnp.float32)
    if affine:
        a = scale_ref[b][None, None, :]
        z = x * a + shift_ref[b][None, None, :]
    else:
        a = jnp.ones((1, 1, C), jnp.float32)
        z = x
    if act == "silu":
        sig = jax.nn.sigmoid(z)
        dact = sig * (1.0 + z * (1.0 - sig))
    else:
        dact = jnp.ones_like(z)
    dz = dn * dact
    if dropout_rate > 0.0:
        seed0 = seed_ref[0]
        masks = [
            _keep_mask(seed0, b, k * TH + r, W, C, dropout_rate) for r in range(TH)
        ]
        dz = dz * jnp.stack(masks)
    dx_ref[0] = (dz * a).astype(dx_ref.dtype)

    @pl.when(k == 0)
    def _():
        dscale_ref[b] = jnp.zeros((C,), jnp.float32)
        dshift_ref[b] = jnp.zeros((C,), jnp.float32)

    dscale_ref[b] += jnp.sum(dz * x, axis=(0, 1))
    dshift_ref[b] += jnp.sum(dz, axis=(0, 1))


def prologue_grad(
    x: jax.Array,
    dn: jax.Array,
    scale: Optional[jax.Array] = None,
    shift: Optional[jax.Array] = None,
    act: Optional[str] = None,
    dropout_rate: float = 0.0,
    seed: Optional[jax.Array] = None,
    interpret: bool = False,
):
    """(dx, dscale (B,C) f32, dshift (B,C) f32) of
    n = dropout(act(x·scale + shift)) given dn. Pallas (not XLA) so the
    dropout mask regenerates bit-identically from the same
    per-(b, absolute-row) PRNG stream the forward kernel used."""
    B, H, W, C = x.shape
    TH = _chunk_rows(H)
    affine = scale is not None
    if scale is None:
        scale = jnp.zeros((B, C), jnp.float32)
        shift = jnp.zeros((B, C), jnp.float32)
    seed = (
        jnp.zeros((1,), jnp.int32)
        if seed is None
        else jnp.asarray(seed, jnp.int32).reshape(1)
    )
    kernel = functools.partial(
        _prologue_grad_kernel,
        TH=TH, H=H, W=W, C=C, act=act, affine=affine,
        dropout_rate=float(dropout_rate),
    )
    dx, dscale, dshift = pl.pallas_call(
        kernel,
        grid=(B, H // TH),
        in_specs=[
            pl.BlockSpec((1, TH, W, C), lambda b, k: (b, k, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, W, C), lambda b, k: (b, k, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scale (B, C), whole array
            pl.BlockSpec(memory_space=pltpu.VMEM),  # shift (B, C), whole array
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TH, W, C), lambda b, k: (b, k, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dscale (B, C), revisited
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dshift (B, C), revisited
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
            jax.ShapeDtypeStruct((B, C), jnp.float32),
            jax.ShapeDtypeStruct((B, C), jnp.float32),
        ),
        interpret=interpret,
    )(x, dn.astype(x.dtype), scale.astype(jnp.float32), shift.astype(jnp.float32), seed)
    return dx, dscale, dshift


# ------------------------------------------------------------- weight grad


def _wgrad_kernel(
    x_hbm, dy_hbm, scale_ref, shift_ref, seed_ref, dw_ref, dbias_ref,
    xbuf, ybuf, in_sems, acc_ref, bacc_ref,
    *,
    TH: int, H: int, W: int, C: int, D: int,
    act, affine: bool, dropout_rate: float,
):
    """grid = (B,) sequential; dW accumulated in VMEM scratch across the grid.

    dW[t, c, d] = Σ_{b,r,col} n[b, r+dy(t)−1, col+dx(t)−1, c] · g[b, r, col, d]
    with n the recomputed normalized input (never read from HBM).
    """
    b = pl.program_id(0)
    n_chunks = H // TH

    @pl.when(b == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        bacc_ref[...] = jnp.zeros_like(bacc_ref)

    def dy_dma(k, slot):
        return pltpu.make_async_copy(
            dy_hbm.at[b, pl.ds(k * TH, TH)], ybuf.at[slot], in_sems.at[slot, 3],
        )

    for dma in _in_dmas(x_hbm, xbuf, in_sems, b, 0, 0, TH, H):
        dma.start()
    dy_dma(0, 0).start()

    def body(k, _):
        slot = jax.lax.rem(k, 2)
        nslot = jax.lax.rem(k + 1, 2)

        @pl.when(k + 1 < n_chunks)
        def _():
            for dma in _in_dmas(x_hbm, xbuf, in_sems, b, k + 1, nslot, TH, H):
                dma.start()
            dy_dma(k + 1, nslot).start()

        for dma in _in_dmas(x_hbm, xbuf, in_sems, b, k, slot, TH, H):
            dma.wait()
        dy_dma(k, slot).wait()

        n = _prologue(
            xbuf[slot], k, b, seed_ref, scale_ref[b], shift_ref[b],
            TH=TH, H=H, W=W, C=C, act=act, affine=affine,
            dropout_rate=dropout_rate, halo=True,
        )
        shifted = _col_shifts(n, W)

        # (TH·W, C) merge is layout-free (C stays the lane dim); Mosaic's
        # tpu.matmul cannot contract two dims at once.
        g = ybuf[slot].reshape(TH * W, D)  # bf16
        for t in range(9):
            dy_, dx_ = divmod(t, 3)
            patch = shifted[dx_][dy_ : dy_ + TH].reshape(TH * W, C)
            contrib = jax.lax.dot_general(
                patch, g,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (C, D)
            acc_ref[pl.ds(t * C, C)] += contrib
        bacc_ref[...] += jnp.sum(g.astype(jnp.float32), axis=0).reshape(1, D)
        return ()

    jax.lax.fori_loop(0, n_chunks, body, ())
    # Every grid step refreshes the (revisited) output block so Pallas's
    # write-back after any step stores a fully-initialized value.
    dw_ref[...] = acc_ref[...]
    dbias_ref[...] = bacc_ref[...]


def conv3x3_weight_grad(
    x: jax.Array,
    dy: jax.Array,
    scale: Optional[jax.Array] = None,
    shift: Optional[jax.Array] = None,
    act: Optional[str] = None,
    dropout_rate: float = 0.0,
    seed: Optional[jax.Array] = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """(dW (3,3,C,D) f32, dbias (D,) f32) of the fused conv, recomputing the
    normalized input stream instead of reading a saved activation."""
    B, H, W, C = x.shape
    D = dy.shape[-1]
    TH = _chunk_rows(H)
    affine = scale is not None
    if scale is None:
        scale = jnp.zeros((B, C), jnp.float32)
        shift = jnp.zeros((B, C), jnp.float32)
    seed = (
        jnp.zeros((1,), jnp.int32)
        if seed is None
        else jnp.asarray(seed, jnp.int32).reshape(1)
    )
    kernel = functools.partial(
        _wgrad_kernel,
        TH=TH, H=H, W=W, C=C, D=D,
        act=act, affine=affine, dropout_rate=float(dropout_rate),
    )
    dw_flat, dbias = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((9 * C, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((9 * C, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, TH + 2, W, C), jnp.bfloat16),
            pltpu.VMEM((2, TH, W, D), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.VMEM((9 * C, D), jnp.float32),
            pltpu.VMEM((1, D), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * 9 * C * D,
            bytes_accessed=x.size * 2 + dy.size * 2,
            transcendentals=x.size if act == "silu" else 0,
        ),
        interpret=interpret,
    )(
        x.astype(jnp.bfloat16),
        dy.astype(jnp.bfloat16),
        scale.astype(jnp.float32),
        shift.astype(jnp.float32),
        seed,
    )
    return dw_flat.reshape(3, 3, C, D), dbias.reshape(D)


# ------------------------------------------------- composed GN→SiLU→conv op


def gn_stats(x: jax.Array, groups: int, eps: float = 1e-5):
    """Per-(B, C) GroupNorm (mean, rstd) in f32, broadcast from the groups.
    Plain differentiable jnp — autodiff supplies the exact stats backward, so
    the Pallas custom-VJP core only handles the (x, scale, shift) affine."""
    B, H, W, C = x.shape
    xg = x.astype(jnp.float32).reshape(B, H * W, groups, C // groups)
    mean = jnp.mean(xg, axis=(1, 3))
    # clamp: E[x^2]-E[x]^2 can cancel below -eps in f32 for near-constant
    # channels with large means -> rsqrt(negative) = NaN (norms._stats has
    # the same guard; the fused and unfused paths must agree)
    var = jnp.maximum(jnp.mean(jnp.square(xg), axis=(1, 3)) - jnp.square(mean), 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    reps = C // groups
    return (
        jnp.repeat(mean, reps, axis=1),
        jnp.repeat(rstd, reps, axis=1),
    )


@functools.lru_cache(maxsize=None)
def _core_fn(act: Optional[str], dropout_rate: float, interpret: bool):
    """conv3x3(dropout(act(x·scale + shift)), w) + bias with a Pallas custom
    VJP treating (x, scale, shift, w, bias) as independent inputs. The only
    residuals are the raw inputs — the normalized activation is recomputed by
    the backward kernels instead of being stored (the usual conv residual)."""

    def primal(x, scale, shift, w, bias, seed):
        return fused_conv3x3(
            x, w, bias, scale=scale, shift=shift, act=act,
            dropout_rate=dropout_rate, seed=seed, interpret=interpret,
        )

    core = jax.custom_vjp(primal)

    def fwd(x, scale, shift, w, bias, seed):
        return primal(x, scale, shift, w, bias, seed), (x, scale, shift, w, seed)

    def bwd(res, dy):
        x, scale, shift, w, seed = res
        dn = conv3x3_input_grad(dy, w, interpret=interpret)
        dx, dscale, dshift = prologue_grad(
            x, dn, scale=scale, shift=shift, act=act,
            dropout_rate=dropout_rate, seed=seed, interpret=interpret,
        )
        dw, dbias = conv3x3_weight_grad(
            x, dy, scale=scale, shift=shift, act=act,
            dropout_rate=dropout_rate, seed=seed, interpret=interpret,
        )
        return dx, dscale, dshift, dw.astype(w.dtype), dbias, None

    core.defvjp(fwd, bwd)
    return core


def norm_act_conv(
    x: jax.Array,
    w: jax.Array,
    bias: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    film_scale: Optional[jax.Array] = None,
    film_shift: Optional[jax.Array] = None,
    groups: int = 32,
    eps: float = 1e-5,
    act: Optional[str] = "silu",
    dropout_rate: float = 0.0,
    seed: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """GroupNorm(+FiLM)→SiLU→dropout→3×3 conv as ONE fused Pallas pipeline.

    The ADM ResBlock prologue+conv (models/unet.py:ResBlock; reference
    counterpart: the torchcfm UNetModel res block). Fully differentiable:
    stats and the affine fold are plain jnp (autodiff composes their exact
    backward with the Pallas core's custom VJP). Residual memory = raw inputs
    only; the normalized activation never exists in HBM in either pass.
    """
    mean, rstd = gn_stats(x, groups, eps)
    scale, shift = fold_norm_affine(mean, rstd, gamma, beta, film_scale, film_shift)
    seed = (
        jnp.zeros((1,), jnp.int32)
        if seed is None
        else jnp.asarray(seed, jnp.int32).reshape(1)
    )
    core = _core_fn(act, float(dropout_rate), interpret)
    return core(x.astype(jnp.bfloat16), scale, shift, w, bias, seed)


__all__ = [
    "fused_conv3x3",
    "conv3x3_input_grad",
    "conv3x3_weight_grad",
    "prologue_grad",
    "fold_norm_affine",
    "gn_stats",
    "norm_act_conv",
    "supported",
]
