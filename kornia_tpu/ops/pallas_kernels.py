"""Pallas TPU kernels for the hot paths (SURVEY.md §7: "The one hot
kernel" tier).

`streaming_min2`: flash-attention-style streaming nearest-neighbor — the
descriptor distance matrix is computed tile-by-tile on the MXU and reduced
to per-row (min1, min2, argmin1) on the fly, so the (N, M) matrix never
touches HBM. For N=M=8192, D=128 this avoids 256 MB of HBM traffic per
direction — the matcher becomes compute-bound instead of bandwidth-bound.

Falls back to the XLA path on non-TPU backends (interpret mode in tests).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["streaming_min2", "match_nn_pallas", "match_smnn_pallas",
           "fused_separable_blur2d", "multi_level_blur"]

_BIG = 1e9  # plain float: jnp constants can't be captured inside kernels


def _min2_kernel(d1_ref, d2_ref, n2_ref, min1_ref, min2_ref, idx_ref):
    """Grid (i, j): rows tile i fixed while j streams over d2 tiles."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        min1_ref[:] = jnp.full_like(min1_ref, _BIG)
        min2_ref[:] = jnp.full_like(min2_ref, _BIG)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    d1 = d1_ref[:]  # (TN, D)
    d2 = d2_ref[:]  # (TM, D)
    n2 = n2_ref[:]  # (1, TM) squared norms of d2 rows
    n1 = jnp.sum(d1 * d1, axis=-1, keepdims=True)  # (TN, 1)
    dots = jax.lax.dot_general(
        d1, d2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dm = jnp.maximum(n1 + n2 - 2.0 * dots, 0.0)  # (TN, TM)

    TM = dm.shape[1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, dm.shape, 1)
    # tile-local top-2 (min): find min, mask exactly the argmin, find second
    tmin1 = jnp.min(dm, axis=1, keepdims=True)
    targ1 = jnp.argmin(dm, axis=1)
    masked = jnp.where(col_ids == targ1[:, None], _BIG, dm)
    tmin2 = jnp.min(masked, axis=1)
    tmin1 = tmin1[:, 0]
    targ1 = targ1 + j * TM

    # merge tile stats into running (min1, min2, idx)
    m1 = min1_ref[:][:, 0]
    m2 = min2_ref[:][:, 0]
    ix = idx_ref[:][:, 0]
    new_m1 = jnp.minimum(m1, tmin1)
    new_ix = jnp.where(tmin1 < m1, targ1, ix)
    # second-best = min of the losers and both second-bests
    new_m2 = jnp.minimum(jnp.maximum(m1, tmin1), jnp.minimum(m2, tmin2))
    min1_ref[:] = new_m1[:, None]
    min2_ref[:] = new_m2[:, None]
    idx_ref[:] = new_ix[:, None]


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_m", "interpret"))
def streaming_min2(d1: jax.Array, d2: jax.Array, tile_n: int = 256,
                   tile_m: int = 256, interpret: bool = False
                   ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-row nearest and second-nearest squared-L2 over d2.

    d1 (N, D), d2 (M, D) → (min1 (N,), min2 (N,), argmin1 (N,)).
    N, M should be multiples of the tile sizes (pad with _BIG rows).
    """
    N, D = d1.shape
    M = d2.shape[0]
    tile_n = min(tile_n, N)
    tile_m = min(tile_m, M)
    n2 = jnp.sum(d2 * d2, axis=-1)[None, :]  # (1, M)
    grid = (N // tile_n, M // tile_m)
    out_shape = (
        jax.ShapeDtypeStruct((N, 1), jnp.float32),
        jax.ShapeDtypeStruct((N, 1), jnp.float32),
        jax.ShapeDtypeStruct((N, 1), jnp.int32),
    )
    min1, min2, idx = pl.pallas_call(
        _min2_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, D), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_m, D), lambda i, j: (j, 0)),
            pl.BlockSpec((1, tile_m), lambda i, j: (0, j)),
        ],
        out_specs=(
            pl.BlockSpec((tile_n, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_n, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_n, 1), lambda i, j: (i, 0)),
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(d1.astype(jnp.float32), d2.astype(jnp.float32), n2.astype(jnp.float32))
    return min1[:, 0], min2[:, 0], idx[:, 0]


def match_nn_pallas(d1: jax.Array, d2: jax.Array, interpret: bool = False):
    """Nearest-neighbor matching via the streaming kernel."""
    m1, _, idx = streaming_min2(d1, d2, interpret=interpret)
    matches = jnp.stack([jnp.arange(d1.shape[0]), idx], -1)
    return m1[:, None], matches


def match_smnn_pallas(d1: jax.Array, d2: jax.Array, th: float = 0.95,
                      interpret: bool = False):
    """Symmetric-ratio mutual NN (reference matching.py:197 semantics) with
    both passes streamed — no (N, M) matrix in HBM."""
    f_min1, f_min2, f_idx = streaming_min2(d1, d2, interpret=interpret)
    b_min1, b_min2, b_idx = streaming_min2(d2, d1, interpret=interpret)
    ratio_f = jnp.sqrt(f_min1 / jnp.maximum(f_min2, 1e-12))
    ratio_b = jnp.sqrt(b_min1 / jnp.maximum(b_min2, 1e-12))
    mutual = b_idx[f_idx] == jnp.arange(d1.shape[0])
    valid = mutual & (ratio_f <= th) & (ratio_b[f_idx] <= th) & \
        (f_min1 < _BIG / 2)
    ratio_max = jnp.maximum(ratio_f, ratio_b[f_idx])
    matches = jnp.stack([jnp.arange(d1.shape[0]), f_idx], -1)
    return ratio_max[:, None], matches, valid


# -----------------------------------------------------------------------------
# Fused separable blur
# -----------------------------------------------------------------------------


def _blur_kernel_mm2(x_ref, sv_ref, sh_ref, o_ref, *, precision):
    """Both passes as MXU matmuls with the border handling folded into the
    banded operator matrices: out = S_v · x · S_hᵀ. No padded copy of the
    input ever touches HBM — exactly one read and one write per pixel."""
    x = x_ref[...]                            # (NB, H, W)
    prec = (jax.lax.Precision.HIGHEST if precision == "float32"
            else jax.lax.Precision.DEFAULT)
    # acc[n, i, w] = sum_h sv[i, h] x[n, h, w]
    acc = jax.lax.dot_general(
        sv_ref[...], x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)  # (H, NB, W)
    # out[n, i, j] = sum_w acc[i, n, w] sh[j, w]
    out = jax.lax.dot_general(
        acc, sh_ref[...], (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)  # (H, NB, W)
    o_ref[...] = jnp.swapaxes(out, 0, 1).astype(o_ref.dtype)


def _band_matrix(kernel: jax.Array, size: int, border_type: str) -> jax.Array:
    """(size, size) 'same'-correlation operator with the border rule folded
    in: row i sums kernel[k] into column reflect/clamp/wrap(i + k - pad)."""
    k = kernel.shape[-1]
    pad = k // 2
    rows = jnp.arange(size)[:, None]
    taps = rows + jnp.arange(k)[None, :] - pad  # (size, k)
    if border_type == "reflect":
        idx = jnp.abs(taps)
        idx = jnp.where(idx >= size, 2 * (size - 1) - idx, idx)
        valid = jnp.ones_like(taps, dtype=bool)
    elif border_type == "replicate":
        idx = jnp.clip(taps, 0, size - 1)
        valid = jnp.ones_like(taps, dtype=bool)
    elif border_type == "circular":
        idx = jnp.mod(taps, size)
        valid = jnp.ones_like(taps, dtype=bool)
    else:  # constant (zeros): taps outside contribute nothing
        valid = (taps >= 0) & (taps < size)
        idx = jnp.clip(taps, 0, size - 1)
    w = jnp.where(valid, kernel.astype(jnp.float32)[None, :], 0.0)
    S = jnp.zeros((size, size), jnp.float32)
    return S.at[rows, idx].add(w)


def _mm2_pallas_raw(xf: jax.Array, sv: jax.Array, sh: jax.Array,
                    interpret: bool, out_dtype) -> jax.Array:
    """One pallas_call computing Sv . x . Sh^T per image; xf (N, H, W)."""
    N, H, W = xf.shape
    per_img = 3 * H * W * 4
    fixed = (H * H + W * W) * 4
    NB = 1
    # NB in {8, 1} ONLY: Mosaic's layout inference fails the (H, NB, W)
    # -> (NB, H, W) shape cast for small odd batches (measured: NB=2 at
    # 240x320 dies with "unsupported shape cast"; NB=8 and NB=1 lower
    # cleanly at every shape exercised)
    if N % 8 == 0 and 8 * per_img + fixed <= 6 * 1024 * 1024:
        NB = 8
    return pl.pallas_call(
        functools.partial(_blur_kernel_mm2, precision="float32"),
        grid=(N // NB,),
        in_specs=[
            pl.BlockSpec((NB, H, W), lambda n: (n, 0, 0)),
            pl.BlockSpec((H, H), lambda n: (0, 0)),
            pl.BlockSpec((W, W), lambda n: (0, 0)),
        ],
        out_specs=pl.BlockSpec((NB, H, W), lambda n: (n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, W), out_dtype),
        interpret=interpret,
    )(xf.astype(jnp.float32), sv, sh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _mm2_op(xf, sv, sh, interpret):
    return _mm2_pallas_raw(xf, sv, sh, interpret, xf.dtype)


def _mm2_fwd(xf, sv, sh, interpret):
    return _mm2_op(xf, sv, sh, interpret), (xf, sv, sh)


def _mm2_bwd(interpret, res, g):
    """Adjoint of out = Sv x Sh^T: dx = Sv^T g Sh — the SAME fused kernel
    with transposed band operators; kernel-operator grads via einsums."""
    xf, sv, sh = res
    g32 = g.astype(jnp.float32)
    x32 = xf.astype(jnp.float32)
    dx = _mm2_pallas_raw(g32, sv.T, sh.T, interpret, jnp.float32)
    xsh = jnp.einsum("nhw,jw->nhj", x32, sh,
                     precision=jax.lax.Precision.HIGHEST)
    dsv = jnp.einsum("nij,nhj->ih", g32, xsh,
                     precision=jax.lax.Precision.HIGHEST)
    svx = jnp.einsum("ih,nhw->niw", sv, x32,
                     precision=jax.lax.Precision.HIGHEST)
    dsh = jnp.einsum("nij,niw->jw", g32, svx,
                     precision=jax.lax.Precision.HIGHEST)
    return dx.astype(xf.dtype), dsv, dsh


_mm2_op.defvjp(_mm2_fwd, _mm2_bwd)


@functools.partial(jax.jit,
                   static_argnames=("border_type", "interpret", "variant"))
def fused_separable_blur2d(x: jax.Array, kernel_y: jax.Array,
                           kernel_x: jax.Array,
                           border_type: str = "reflect",
                           interpret: bool = False,
                           variant: str = "mm2") -> jax.Array:
    """Separable 2D correlation fully fused in one Pallas kernel
    (ops/filters.py filter2d_separable semantics).

    Default "mm2": both passes as MXU matmuls against banded border-aware
    operator matrices — out = S_v . x . S_h^T, ONE HBM read + write per
    pixel. Measured 414.9 GB/s on a v5e at (32, 3, 256, 256), k=5
    (benchmarks/blur_probe.py), at FULL f32 precision, vs the XLA
    two-pass path which lowers f32 convs to bf16 MXU multiplies (3.7e-3
    max error on [0,1] images). Earlier sublane-shift variants measured
    61-126 GB/s and were removed. "xla_mm2" runs the same banded-matmul
    formulation without Pallas (portability fallback).

    x (B, C, H, W); kernel_y (ky,), kernel_x (kx,). Image blocks live in
    VMEM: intended for H, W <= ~768.
    """
    B, C, H, W = x.shape
    ky = kernel_y.shape[-1]
    kx = kernel_x.shape[-1]
    xf = x.reshape(B * C, H, W)

    if variant in ("mm2", "xla_mm2"):
        sv = _band_matrix(kernel_y.reshape(-1), H, border_type)  # (H, H)
        sh = _band_matrix(kernel_x.reshape(-1), W, border_type)  # (W, W)
        if variant == "xla_mm2":
            acc = jnp.einsum("ih,nhw->niw", sv, xf.astype(jnp.float32),
                             precision=jax.lax.Precision.HIGHEST)
            out = jnp.einsum("niw,jw->nij", acc, sh,
                             precision=jax.lax.Precision.HIGHEST)
            return out.astype(x.dtype).reshape(B, C, H, W)
        out = _mm2_op(xf, sv, sh, interpret)
        return out.astype(x.dtype).reshape(B, C, H, W)

    raise ValueError(f"unknown fused-blur variant: {variant!r}")


# -----------------------------------------------------------------------------
# Multi-level blur: every pyramid level of an octave in ONE pallas_call
# -----------------------------------------------------------------------------


def _ml_blur_kernel(x_ref, sv_ref, sh_ref, o_ref):
    """One (level, image-block) program: out = SV_l · x · SH_lᵀ."""
    x = x_ref[...]                            # (NB, H, W)
    sv = sv_ref[0]                            # (H, H)
    sh = sh_ref[0]                            # (W, W)
    acc = jax.lax.dot_general(
        sv, x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # (H, NB, W)
    out = jax.lax.dot_general(
        acc, sh, (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # (H, NB, W)
    o_ref[...] = jnp.swapaxes(out, 0, 1)[None].astype(o_ref.dtype)


def _ml_blur_raw(xf: jax.Array, SV: jax.Array, SH: jax.Array,
                 interpret: bool) -> jax.Array:
    """(L, N, H, W) levels from base xf (N, H, W) and per-level cumulative
    band operators SV (L, H, H), SH (L, W, W)."""
    L = SV.shape[0]
    N, H, W = xf.shape
    per_img = 3 * H * W * 4
    fixed = (H * H + W * W) * 4
    NB = 1
    # NB in {8, 1} ONLY (see _mm2_pallas_raw: Mosaic shape-cast limits)
    if N % 8 == 0 and 8 * per_img + fixed <= 6 * 1024 * 1024:
        NB = 8
    return pl.pallas_call(
        _ml_blur_kernel,
        grid=(L, N // NB),
        in_specs=[
            pl.BlockSpec((NB, H, W), lambda l, n: (n, 0, 0)),
            pl.BlockSpec((1, H, H), lambda l, n: (l, 0, 0)),
            pl.BlockSpec((1, W, W), lambda l, n: (l, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, NB, H, W), lambda l, n: (l, n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((L, N, H, W), xf.dtype),
        interpret=interpret,
    )(xf.astype(jnp.float32), SV, SH)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ml_op(xf, SV, SH, interpret):
    return _ml_blur_raw(xf, SV, SH, interpret)


def _ml_fwd(xf, SV, SH, interpret):
    return _ml_op(xf, SV, SH, interpret), (SV, SH)


def _ml_adj_kernel(g_ref, sv_ref, sh_ref, o_ref):
    """Adjoint program: per-level dx_l = SV_lᵀ g_l SH_l."""
    g = g_ref[0]                              # (NB, H, W)
    sv = sv_ref[0]                            # (H, H) — already transposed
    sh = sh_ref[0]                            # (W, W)
    acc = jax.lax.dot_general(
        sv, g, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    out = jax.lax.dot_general(
        acc, sh, (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    o_ref[...] = jnp.swapaxes(out, 0, 1)[None].astype(o_ref.dtype)


def _ml_bwd(interpret, res, g):
    """Adjoint of out_l = SV_l x SH_lᵀ: dx = Σ_l SV_lᵀ g_l SH_l. The
    operators derive from STATIC sigmas (never trained): zero grads."""
    SV, SH = res
    L, N, H, W = g.shape
    per_img = 3 * H * W * 4
    fixed = (H * H + W * W) * 4
    NB = 8 if (N % 8 == 0 and 8 * per_img + fixed <= 6 * 1024 * 1024) else 1
    dx_l = pl.pallas_call(
        _ml_adj_kernel,
        grid=(L, N // NB),
        in_specs=[
            pl.BlockSpec((1, NB, H, W), lambda l, n: (l, n, 0, 0)),
            pl.BlockSpec((1, H, H), lambda l, n: (l, 0, 0)),
            pl.BlockSpec((1, W, W), lambda l, n: (l, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, NB, H, W), lambda l, n: (l, n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((L, N, H, W), jnp.float32),
        interpret=interpret,
    )(g.astype(jnp.float32), jnp.swapaxes(SV, 1, 2),
      jnp.swapaxes(SH, 1, 2))
    return jnp.sum(dx_l, 0), jnp.zeros_like(SV), jnp.zeros_like(SH)


_ml_op.defvjp(_ml_fwd, _ml_bwd)


def multi_level_blur(x: jax.Array, kernels_y, kernels_x,
                     border_type: str = "replicate",
                     interpret: bool = False,
                     variant: str = "pallas") -> jax.Array:
    """All L blur levels of a scale-pyramid octave in ONE kernel call.

    The sequential chain level_i = blur(level_{i-1}, k_i) is expressed as
    cumulative banded-operator products: level_i = (Sv_i···Sv_1) · base ·
    (Sh_1ᵀ···Sh_iᵀ) — EXACTLY the sequential semantics (operator
    composition folds each step's border rule), with every level
    independent, so one pallas_call with grid (L, N) replaces ~L
    serialized blur dispatches (ROOFLINE "What this says" #3a: per-level
    shapes under-tile the MXU and the dependency chain serializes DMA).

    x: (B, C, H, W) base level; kernels_y/x: list of L 1-D incremental
    kernels (level i's blur relative to level i-1). Returns
    (L, B, C, H, W) — level 0 is kernels[0] applied to x (pass a trivial
    [1.0] kernel to keep the base unblurred).
    """
    B, C, H, W = x.shape
    L = len(kernels_y)
    sv_list, sh_list = [], []
    SVc = jnp.eye(H, dtype=jnp.float32)
    SHc = jnp.eye(W, dtype=jnp.float32)
    for ky, kx in zip(kernels_y, kernels_x):
        SVc = _cum_op(_band_matrix(jnp.reshape(ky, (-1,)), H, border_type),
                      SVc)
        SHc = _cum_op(_band_matrix(jnp.reshape(kx, (-1,)), W, border_type),
                      SHc)
        sv_list.append(SVc)
        sh_list.append(SHc)
    SV = jnp.stack(sv_list)
    SH = jnp.stack(sh_list)
    xf = x.reshape(B * C, H, W).astype(jnp.float32)
    if variant == "xla":
        acc = jnp.einsum("lih,nhw->lniw", SV, xf,
                         precision=jax.lax.Precision.HIGHEST)
        out = jnp.einsum("lniw,ljw->lnij", acc, SH,
                         precision=jax.lax.Precision.HIGHEST)
    else:
        out = _ml_op(xf, SV, SH, interpret)
    return out.reshape(L, B, C, H, W).astype(x.dtype)


def _cum_op(step: jax.Array, cum: jax.Array) -> jax.Array:
    """step @ cum at full f32 precision (cumulative operator product)."""
    return jnp.matmul(step, cum, precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# Affine patch sampling: per-keypoint DMA window + 2-hot matmul bilinear
# ---------------------------------------------------------------------------

_WIN_H = 128   # sublane-aligned window height; ALSO the one-hot
               # matmul contraction dim — 128 is pad-free on the
               # MXU (136 padded its lanes to 256, ~1.9x waste)
_WIN_W = 256   # lane-aligned window width (128 | 256)


_KP_BLK = 8  # keypoints per program (sublane-aligned block)


def _patch_sample_kernel(corners_ref, px_ref, py_ref, atlas_ref, out_ref,
                         win_ref, sem_ref, *, mode="split"):
    """8 keypoints per program: DMA each keypoint's (136, 256) atlas
    window into VMEM, then evaluate all S bilinear samples with TWO dense
    ops — a (S, 136) row-select matrix matmul'd against the window
    on the MXU, and a lane-wise 2-hot column select-reduce on the VPU. No
    per-element gather ever happens: XLA's TPU gather costs ~12 ns per
    element (measured, ROADMAP.md round-3 profile), which made LAF patch
    extraction the front end's biggest stage.

    mode="split" (default): the row pass runs at FULL bf16 MXU rate —
    the selector matrices are exact ONE-HOT (0/1 is bf16-exact) and the
    window is hi/lo bf16-split (hi = bf16 round, lo = residual), so four
    DEFAULT-precision matmuls reconstruct the f32 row values to within
    2^-18 ≈ 4e-6 absolute on [0,1] images — 3x fewer MXU passes than
    mode="highest" (one 6-pass HIGHEST matmul of fractional weights,
    bit-comparable to the XLA f32 path; Mosaic has no 3-pass HIGH)."""
    n = pl.program_id(0)

    def dma_for(nb, slot):
        # corners are aligned by construction (see patch_sample_mxu);
        # the hint lets Mosaic prove the sliced DMA is tile-aligned
        cy = pl.multiple_of(corners_ref[n * _KP_BLK + nb, 0], 8)
        cx = pl.multiple_of(corners_ref[n * _KP_BLK + nb, 1], 128)
        return pltpu.make_async_copy(
            atlas_ref.at[pl.ds(cy, _WIN_H), pl.ds(cx, _WIN_W)],
            win_ref.at[slot], sem_ref.at[slot])

    S = px_ref.shape[1]
    # loop-invariant iotas, hoisted out of the per-keypoint loop
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (2 * S, _WIN_H), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (S, _WIN_H), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (S, _WIN_W), 1)

    # 4-deep DMA pipeline: keep three windows in flight ahead of the
    # compute (2-slot double buffering left the per-keypoint loop
    # latency-bound on the 139 KB window fetch)
    _NS = 4
    for ahead in range(min(_NS - 1, _KP_BLK)):
        dma_for(ahead, ahead % _NS).start()
    for nb in range(_KP_BLK):
        slot = nb % _NS
        if nb + _NS - 1 < _KP_BLK:
            dma_for(nb + _NS - 1, (nb + _NS - 1) % _NS).start()
        dma_for(nb, slot).wait()
        cx = corners_ref[n * _KP_BLK + nb, 1]
        cy = corners_ref[n * _KP_BLK + nb, 0]
        x = px_ref[nb, :] - cx.astype(jnp.float32)
        y = py_ref[nb, :] - cy.astype(jnp.float32)
        x = jnp.clip(x, 0.0, _WIN_W - 1.001)
        y = jnp.clip(y, 0.0, _WIN_H - 1.001)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = x - x0
        ty = y - y0
        y0i = y0.astype(jnp.int32)[:, None]
        if mode == "split":
            # ONE wide (2S, 136) x (136, 512) dot per keypoint: the
            # y0/y0+1 one-hot selectors stacked along M, the hi/lo
            # bf16-split window along N — same MACs as four separate
            # dots but a single maximally-wide MXU op
            w0 = win_ref[slot]
            hi = w0.astype(jnp.bfloat16).astype(jnp.float32)
            lo = w0 - hi
            wcat = jnp.concatenate([hi, lo], axis=1)  # (136, 512)
            y0cat = jnp.concatenate([y0i, y0i + 1], axis=0)  # (2S, 1)
            ohcat = (rows2 == y0cat).astype(jnp.float32)
            D = jax.lax.dot(ohcat, wcat,
                            preferred_element_type=jnp.float32)  # (2S, 512)
            P0 = D[:S, :_WIN_W] + D[:S, _WIN_W:]
            P1 = D[S:, :_WIN_W] + D[S:, _WIN_W:]
            P = (1.0 - ty[:, None]) * P0 + ty[:, None] * P1
        elif mode == "bf16":
            # single DEFAULT-precision pass: the MXU rounds the
            # fractional 2-hot weights and the window to bf16 (~4e-3 abs
            # on [0,1] images) — 4x fewer MACs than split. For descriptor
            # pipelines only: SIFT gradient-histogram descriptors are
            # invariant to intensity noise far above 4e-3, while the
            # exact modes remain for parity-grade sampling.
            wy = (jnp.where(rows == y0i, 1.0 - ty[:, None], 0.0)
                  + jnp.where(rows == y0i + 1, ty[:, None], 0.0))
            P = jax.lax.dot(wy, win_ref[slot],
                            preferred_element_type=jnp.float32)  # (S, 256)
        else:
            wy = (jnp.where(rows == y0i, 1.0 - ty[:, None], 0.0)
                  + jnp.where(rows == y0i + 1, ty[:, None], 0.0))
            # HIGHEST: the 2-hot interp weights and the image must not
            # round to bf16 (default MXU precision costs ~4e-3 on [0,1]
            # images; Mosaic supports only DEFAULT/HIGHEST).
            P = jax.lax.dot(wy, win_ref[slot],
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)  # (S, 256)
        x0i = x0.astype(jnp.int32)[:, None]
        wx = (jnp.where(cols == x0i, 1.0 - tx[:, None], 0.0)
              + jnp.where(cols == x0i + 1, tx[:, None], 0.0))
        out_ref[nb, :] = jnp.sum(P * wx, axis=1)


@functools.partial(jax.jit, static_argnames=("interpret", "mode"))
def patch_sample_mxu(atlas: jax.Array, px: jax.Array, py: jax.Array,
                     interpret: bool = False,
                     mode: str = "split") -> jax.Array:
    """Bilinear-sample S points per keypoint from a 2D atlas.

    atlas: (H, W) f32, W >= 256, H >= 128. px/py: (N, S) absolute pixel
    coords. Each keypoint's DMA window is anchored at its SAMPLE BOUNDING
    BOX (not a center): coverage is exact whenever the per-keypoint
    extent max-min is <= 118 px (y) / 126 px (x) — twice the old center-anchored
    budget, so moderately anisotropic LAFs fit (ADVICE r3 medium; callers
    mask-and-fall-back past that, feature/laf.py). Samples outside the
    window clamp to its border.

    Alignment (ADVICE r3 high): the atlas is zero-padded to H % 8 == 0,
    W % 128 == 0 so the corner clamp bounds (H-136, W-256) are sublane/
    lane multiples — the kernel's `pl.multiple_of` DMA hints hold for
    every corner, including windows clamped at the atlas edge. Padded
    rows/cols are never sampled (coords stay inside the true atlas).

    Returns (N, S) samples, exact bilinear (matches the flat-gather
    grid_sample path to f32 rounding).
    """
    H, W = atlas.shape
    N, S = px.shape
    Hp = -(-max(H, _WIN_H) // 8) * 8
    Wp = -(-max(W, _WIN_W) // 128) * 128
    if (Hp, Wp) != (H, W):
        atlas = jnp.pad(atlas, ((0, Hp - H), (0, Wp - W)))
    # bbox corners BEFORE padding (zero-padded sample columns would drag
    # the min to the origin and mis-anchor real keypoints' windows)
    cx = jnp.clip(jnp.floor(jnp.min(px, 1)).astype(jnp.int32) // 128 * 128,
                  0, Wp - _WIN_W)
    cy = jnp.clip(jnp.floor(jnp.min(py, 1)).astype(jnp.int32) // 8 * 8,
                  0, Hp - _WIN_H)
    corners = jnp.stack([cy, cx], -1).astype(jnp.int32)  # (N, 2)
    Sp = -(-S // 8) * 8
    Np = -(-N // _KP_BLK) * _KP_BLK
    if Sp != S or Np != N:
        px = jnp.pad(px, ((0, Np - N), (0, Sp - S)))
        py = jnp.pad(py, ((0, Np - N), (0, Sp - S)))
        corners = jnp.pad(corners, ((0, Np - N), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Np // _KP_BLK,),
        in_specs=[
            pl.BlockSpec((_KP_BLK, Sp), lambda n, c: (n, 0)),
            pl.BlockSpec((_KP_BLK, Sp), lambda n, c: (n, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((_KP_BLK, Sp), lambda n, c: (n, 0)),
        scratch_shapes=[
            pltpu.VMEM((4, _WIN_H, _WIN_W), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_patch_sample_kernel, mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Np, Sp), jnp.float32),
        interpret=interpret,
    )(corners, px.astype(jnp.float32), py.astype(jnp.float32),
      atlas.astype(jnp.float32))
    return out[:N, :S]
