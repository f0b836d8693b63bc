"""Pallas TPU kernels for the ndzip codec — the performance path.

TPU-native design, exploiting what the hardware gives us instead of
translating the reference's CUDA structure:

* **Single-pass encode.**  The reference GPU encoder needs three kernels
  plus a device-wide scan pyramid (compress_block -> hierarchical scan ->
  compact_all_chunks, cuda_codec.inl:555-603) because thousands of thread
  blocks run concurrently.  A TPU core executes the Pallas grid
  *sequentially*, so a running stream offset lives in SMEM scratch and the
  whole encode — transform, bit transpose, zero-word compaction, offset
  table, stream assembly — happens in ONE kernel and ONE pass over the
  data.
* **Vector routing instead of warp ballots.**  Zero-word compaction is an
  in-row roll/select butterfly (flatvec.compact_rows) followed by a
  monotone OR-merge butterfly over rows (flatvec.merge_rows_or),
  replacing warp-ballot + popcount compaction (cuda_codec.inl:185-275);
  see compact_rows' note on why a gather-based rank search lost on
  compile time.  Decode re-expands with per-row gathers: each
  output row's <=2 source rows are selected by a data-dependent one-hot
  matmul on the MXU and placed with one lane gather.
* **Flat-layout Lorenzo transform.**  Blocks stay in a flat (32, 128)
  word layout; per-axis differences/prefix-sums are strided segmented
  shifts (ops/flatvec.py::segmented_*), identical code for 1/2/3D.
* **Stream assembly by overlapping row-aligned DMAs.**  Each grid step
  compacts its blocks *together with the carry of the previous step* and
  writes ALL staging rows at the current row base; the next step's write
  begins exactly at the first garbage word, so ascending writes leave a
  byte-exact stream (replaces compact_all_chunks gather).
* float64 = (lo, hi) uint32 pairs end to end; the 64x64 bit transpose is
  four 32x32 quadrant transposes (cf. cuda_codec.inl:236-264).

Streams are bit-identical to the reference CPU codec.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import format as fmt
from .ops import flatvec as fv
from .utils import maybe_enable_compilation_cache

maybe_enable_compilation_cache()

LANES = 128

#: set True (e.g. in CPU tests) to run kernels in the Pallas interpreter
INTERPRET = False

# Grid-step batch size (blocks per step) — the TPU analog of the
# reference's NDZIP_GPU_GROUP_SIZE build knob, overridable via env vars
# of the same names below (multiples of 8; every shape's kernel is
# specialized per G).  Bigger G amortizes per-step DMA/scalar overhead,
# but raises both VMEM use (fp64 decode at G=32 exceeds the ~16 MB
# scoped budget) and PER-SHAPE COMPILE TIME, measured fresh on v5e:
#
#              runtime (64 MiB)     first compile of a new shape
#   enc G=8    29.9 / 35.6 GB/s     ~1-3 min
#   enc G=16   30.7 / 37.5 GB/s     >10 min (compact_rows butterfly's
#                                   Mosaic compile grows superlinearly
#                                   in step height R = 1 + 33*G)
#   dec G=8    37.5 GB/s            ~1-2 min
#   dec G=16   48.7 GB/s            ~3-7 min
#   dec G=32   53.0 GB/s            ~7+ min
# (compile times have large variance on this image's remote compile
# service; treat them as a ranking)
#
# Defaults favor compile time (the reference ships AOT kernels and pays
# none); bench.py raises G_DEC to 32 for peak-throughput numbers, and
# deployments that reuse shapes (or a persistent compilation cache —
# see NDZIP_TPU_CACHE_DIR) should too.
def _env_g(name, default):
    v = os.environ.get(name)
    if not v:
        return default
    try:
        g = int(v)
    except ValueError as e:
        raise ValueError(f"{name}={v!r} is not an integer") from e
    if g <= 0 or g % 8 != 0:
        raise ValueError(
            f"{name}={g} invalid: grid-batch sizes must be positive "
            "multiples of 8 (the tile adapters slice 8-block groups)")
    return g


G_ENC = _env_g("NDZIP_TPU_G_ENC", 8)        # encode, both dtypes
G_DEC = _env_g("NDZIP_TPU_G_DEC", 16)       # fp32 decode
G_DEC64 = _env_g("NDZIP_TPU_G_DEC64", 16)   # fp64 decode
# Cap for EXACT minor-axis tilings the fp32 decode may pick above G_DEC
# (see _g_tiled_padded): 56 stays inside the ~16 MB VMEM budget (G=64
# fp32 decode brushes it) and covers the CESM-class 56-column grids.
G_EXACT_CAP = _env_g("NDZIP_TPU_G_EXACT_CAP", 56)

# Runtime kill-switches for individually-landed kernel changes, so a
# hardware-window regression bisects by rerunning with an env var instead
# of editing kernels (dev/HW_PLAYBOOK.md keeps the toggle-per-change
# inventory).  Each forces a fresh jit key via the module constant.
MERGE_GATE = os.environ.get("NDZIP_TPU_MERGE_GATE", "1") != "0"
PADDED_TILES = os.environ.get("NDZIP_TPU_PADDED_TILES", "1") != "0"
# XOR cell-swap butterfly tile adapters, measured faster than the lane
# gathers on v5e (dev/hw_logs_r4/tile_xpose.log: 3D 0.39 vs 0.56 ms,
# 2D store 0.32 vs 0.41 ms per 256 MiB).  =0 restores the gathers.
TILE_BFLY = os.environ.get("NDZIP_TPU_TILE_BFLY", "1") != "0"
# Encode assembly on the MXU (r4 experiment, re-run at s8 in r5; NOT
# adopted either way): the row-offset scan as one triangular matmul
# (_row_prefix_excl_mxu) was a wash in bf16 (32.9 vs 33.3 GB/s) and a
# slight loss at s8 (30.9, dev/hw_logs_r5/enc_mxu_scan.log); the step
# merge as one-hot matmul sums (_merge_rows_sum_mxu) lost outright in
# both arithmetics (27.6 bf16, 26.9 s8 — the (2R,R)x(2R,128) quarter
# contractions exceed the gated OR-merge butterfly even with the i8
# cast chains removed).  Both stay behind env vars for re-evaluation on
# other TPU generations.
MXU_SCAN = os.environ.get("NDZIP_TPU_MXU_SCAN", "0") == "1"
MXU_MERGE = os.environ.get("NDZIP_TPU_MXU_MERGE", "0") == "1"
# int8 MXU path for the byte-quartered matmuls (decode row select, lane
# count prefix, lane-segment cumsums of the inverse transform): v5e
# executes s8 x s8 -> s32 contractions at 2x the bf16 rate AND the
# operands skip the int->f32->bf16 cast chains (byte quarters are
# bias-128 shifted into s8; the bias folds back out as one static
# correction — see _select_window_rows / _lane_segment_cumsum_u32).
# DEFAULT ON since the r5 hardware A/B (dev/hw_logs_r5/, same window,
# bit-exact verify): fp32 1D decode 66.2 vs 58.4 GB/s, fp64 1D 52.1 vs
# 46.9, CESM 2D 51.2 vs 41.2, 256^3 45.5 vs 43.2; encode within noise.
# =0 restores the bf16 u8-quarter matmuls (kill-switch, HW_PLAYBOOK).
I8_MM = os.environ.get("NDZIP_TPU_I8_MM", "1") != "0"

# Fuse each byte-quartered matmul's four quarter contractions into ONE
# MXU issue (quarter operands stacked along lanes for the row select,
# along sublanes for the prefix cumsums), amortizing the shared
# operand's MXU load and 3 of 4 pipeline fills.  Measured on silicon
# (dev/hw_logs_r5/fused_mm_fp32_1d.log vs resume_baseline_fp32_1d.log):
# fp32 1D decode 67.50 vs 67.18 GB/s — inside the same-window run noise
# (the encode numbers, which this toggle cannot affect, moved +2% in the
# same pair).  The quarter matmuls are NOT issue-bound after all: the
# VPU concat/slice prep the fusion adds cancels the issue savings, and
# the fused kernels compile ~10x slower under Mosaic.  DEFAULT OFF;
# bit-exact both ways (verify_fused_mm.log, all 5 shapes).
FUSED_MM = os.environ.get("NDZIP_TPU_FUSED_MM", "0") != "0"

# strided-axis parameters of the block transform on the flat 4096-word
# layout, in forward axis order (format.FORWARD_AXIS_ORDER):
#   1D: one axis, stride 1, segment 4096
#   2D (64x64, flat = r*64+c): axis1 (stride 1, seg 64), axis0 (stride 64, seg 4096)
#   3D (16^3, flat = z*256+y*16+x): axis1=y (16,256), axis2=x (1,16), axis0=z (256,4096)
TRANSFORM_AXES = {
    1: ((1, 4096),),
    2: ((1, 64), (64, 4096)),
    3: ((16, 256), (1, 16), (256, 4096)),
}


def _u32(v):
    return jnp.uint32(v)


# --------------------------------------------------------------- bit pieces


def rotl1(x):
    return (x << _u32(1)) | (x >> _u32(31))


def rotr1(x):
    return (x >> _u32(1)) | (x << _u32(31))


def complement_negative(x):
    sign = (x >> _u32(31)) != 0
    return jnp.where(sign, x ^ _u32(0x7FFFFFFF), x)


def transpose_bits_lane32(a):
    """32x32 bit-matrix transpose applied to every aligned 32-lane segment
    of the last axis.  In the flat block layout, chunk c occupies flat words
    [32c, 32c+32) == lanes [32(c%4), ..) of row c//4, so this IS the chunk
    bit transpose — with zero layout changes.  Pairs (l, l+j) of the
    butterfly never cross a segment boundary because j <= 16.
    Matches transpose_bits_trivial (cpu_codec.inl:355-363); involution."""
    cols = jax.lax.broadcasted_iota(jnp.int32, a.shape, a.ndim - 1)
    masks = [(16, 0x0000FFFF), (8, 0x00FF00FF), (4, 0x0F0F0F0F),
             (2, 0x33333333), (1, 0x55555555)]
    for j, m in masks:
        partner = pltpu.roll(a, shift=LANES - j, axis=a.ndim - 1)  # a[l + j]
        is_upper = (cols & j) == 0
        t = (a ^ (partner >> _u32(j))) & _u32(m)
        t_back = pltpu.roll(t, shift=j, axis=a.ndim - 1)           # t[l - j]
        # one xor after the select (vs xor-per-branch): both branches
        # apply `a ^ <delta>`, so select the delta, not the result
        a = a ^ jnp.where(is_upper, t, t_back << _u32(j))
    return a


def _gather_lanes(x3, idx3):
    """take_along_axis along the last axis for 3D values (Pallas supports
    only 2D gathers; leading-dim merge is free)."""
    G, R, L = x3.shape
    out = jnp.take_along_axis(x3.reshape(G * R, L), idx3.reshape(G * R, L), axis=1)
    return out.reshape(G, R, L)


def heads_via_matmul(body):
    """Head bitmap words from the TRANSPOSED body: head bit (31-i) of
    chunk c is exactly (transposed word 32c+i != 0), so the head is a
    weighted sum of the nonzero mask — two default-precision bf16 matmuls
    (0/1 inputs and power-of-two weights are exact in bf16; 16-bit sums
    are exact in the f32 accumulator).  Returns (G, 32, 128) with the 4
    heads of row r at lanes 0..3 (chunk 4r+s at lane s), replacing
    segment_or32's 5 roll rounds."""
    G = body.shape[0]
    nz = (body != 0).astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
    m = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    sl = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    seg = (m >> 5) == sl                      # word m belongs to chunk slot sl
    i = m & 31
    w_hi = jnp.where(seg & (i < 16), (1 << (15 - (i & 15))), 0)
    w_lo = jnp.where(seg & (i >= 16), (1 << (15 - (i & 15))), 0)
    W_hi = w_hi.astype(jnp.float32).astype(jnp.bfloat16)
    W_lo = w_lo.astype(jnp.float32).astype(jnp.bfloat16)
    dn = (((2,), (0,)), ((), ()))
    h_hi = jax.lax.dot_general(nz, W_hi, dn, preferred_element_type=jnp.float32)
    h_lo = jax.lax.dot_general(nz, W_lo, dn, preferred_element_type=jnp.float32)
    return ((h_hi.astype(jnp.int32) << 16) | h_lo.astype(jnp.int32)).astype(jnp.uint32)


def head_row_from_h1(h1):
    """h1: (G, 32, 128) with row r's 4 head words at lanes 0..3 (zeros
    above).  Returns (G, 1, 128) with head[c] at lane c — the head row of
    the stream layout."""
    cols = jax.lax.broadcasted_iota(jnp.int32, h1.shape, 2)
    rows = jax.lax.broadcasted_iota(jnp.int32, h1.shape, 1)
    # shift row r's 4 values to lanes 4r..4r+3
    idx2 = (cols - (rows << 2)) & (LANES - 1)
    h2 = _gather_lanes(h1, idx2)
    # OR-fold the 32 rows (disjoint lanes) into one row
    for h in (16, 8, 4, 2, 1):
        h2 = h2[:, :h] | h2[:, h : 2 * h]
    return h2


def head_spread_to_flat(head_row, G):
    """Inverse broadcast: (G, 1, 128) head row -> (G, 32, 128) where every
    flat word position holds its chunk's head word."""
    b = jnp.broadcast_to(head_row, (G, 32, LANES))
    rows = jax.lax.broadcasted_iota(jnp.int32, b.shape, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, b.shape, 2)
    idx = (rows << 2) + (cols >> 5)
    return _gather_lanes(b, idx)


# ---------------------------------------------------------- tile adapters
#
# For 2D/3D grids whose minor block-grid axis is a multiple of G, the
# kernels read/write multi-block TILES straight from the (interior) array
# via BlockSpec index maps — the DMA engine does the strided block fetch —
# and rearrange tile <-> flat-block layout in-VMEM with lane gathers.
# This replaces the XLA gather/scatter transposes (minor dims 16/64 < one
# lane tile), which measured ~1.5-2.5 ms per 64 MiB on v5e.
#
# Tile shapes (G = blocks per grid step):
#   2D: (64, G*64)   — G x-adjacent 64x64 blocks
#   3D: (16, 16, G*16) — G x-adjacent 16^3 blocks
# Flat-block layout reminder: block word w at (row w//128, lane w%128).


def tile_to_blocks_2d(tile, G):
    """(64, G*64) -> (G, 32, 128): out[b, q, 64h+c] = tile[2q+h, 64b+c].
    Processed in 128-lane slices (2 blocks each) — Mosaic only gathers
    within one lane tile."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (2, 32, LANES), 2)
    b2 = jax.lax.broadcasted_iota(jnp.int32, (2, 32, LANES), 0)
    idx = ((b2 << 6) + (cols & 63)).reshape(2 * 32, LANES)
    outs = []
    for t in range(G // 2):
        sub = tile[:, 128 * t : 128 * (t + 1)].reshape(32, 2, LANES)
        parts = []
        for h in (0, 1):
            src = jnp.broadcast_to(sub[:, h, :], (2, 32, LANES))
            parts.append(jnp.take_along_axis(
                src.reshape(2 * 32, LANES), idx, axis=1).reshape(2, 32, LANES))
        outs.append(jnp.where(cols >= 64, parts[1], parts[0]))
    return jnp.concatenate(outs, axis=0)


def blocks_to_tile_2d(blocks, G):
    """Inverse of tile_to_blocks_2d: tile[r, l] =
    blocks[l>>6, r>>1, 64*(r&1) + (l&63)]."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (64, LANES), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (64, LANES), 1)
    idx = ((rows & 1) << 6) + (cols & 63)
    outs = []
    for t in range(G // 2):
        parts = []
        for db in (0, 1):
            src = jnp.broadcast_to(
                blocks[2 * t + db].reshape(32, 1, LANES),
                (32, 2, LANES)).reshape(64, LANES)
            parts.append(jnp.take_along_axis(src, idx, axis=1))
        outs.append(jnp.where(cols >= 64, parts[1], parts[0]))
    return jnp.concatenate(outs, axis=1)


def tile_to_blocks_3d(tile, G):
    """(16, 16, G*16) -> (G, 32, 128): out[b, 2z+h, 16*y9+x] =
    tile[z, 8h+y9, 16b+x].  Processed in 128-lane slices of 8 blocks —
    a slice's blocks source only its own lane tile, and Mosaic gathers
    within one lane tile only.  Requires G % 8 == 0."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (8, 32, LANES), 2)
    b8 = jax.lax.broadcasted_iota(jnp.int32, (8, 32, LANES), 0)
    idx = (b8 << 4) + (cols & 15)
    outs = []
    for t in range(G // 8):
        sub = tile[:, :, 128 * t : 128 * (t + 1)].reshape(16, 2, 8, LANES)
        out = jnp.zeros((8, 32, LANES), tile.dtype)
        for y9 in range(8):
            part = sub[:, :, y9, :].reshape(32, LANES)  # rows 2z+h
            src = jnp.broadcast_to(part, (8, 32, LANES))
            g = jnp.take_along_axis(
                src.reshape(8 * 32, LANES), idx.reshape(8 * 32, LANES), axis=1)
            out = jnp.where((cols >> 4) == y9, g.reshape(8, 32, LANES), out)
        outs.append(out)
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def blocks_to_tile_3d(blocks, G):
    """Inverse of tile_to_blocks_3d: tile[z, y, l] =
    blocks[l>>4, 2z+(y>>3), 16*(y&7) + (l&15)].  Processed in 128-lane
    slices — each slice only combines its own 8 blocks, so the select
    chain stays constant-depth as G grows."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (16, 16, LANES), 1)  # y
    cols = jax.lax.broadcasted_iota(jnp.int32, (16, 16, LANES), 2)
    idx = ((rows & 7) << 4) + (cols & 15)
    outs = []
    for t in range(G // 8):
        out = jnp.zeros((16, 16, LANES), blocks.dtype)
        for b8 in range(8):
            # rows of block 8t+b8 in [z, y] order: row 2z + (y>>3)
            src = blocks[8 * t + b8].reshape(16, 2, LANES)   # [z, h, lane]
            src = jnp.broadcast_to(src[:, :, None, :],
                                   (16, 2, 8, LANES)).reshape(16, 16, LANES)
            g = _gather_lanes(src, idx)                # period 16 in lanes
            out = jnp.where((cols >> 4) == b8, g, out)
        outs.append(out)
    return jnp.concatenate(outs, axis=2) if len(outs) > 1 else outs[0]


def _xor_cell_swap_2d(x):
    """2D analog of _xor_cell_swap_rows32 on a (64, 128) slab: exchange
    row bit 0 with the lane-cell bit (cells of 64 lanes):

        out[2q + c, 64h + l] = x[2q + h, 64c + l]

    One butterfly round; the lane roll by 64 is direction-symmetric."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (64, LANES), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (64, LANES), 1)
    bit_r = (rows & 1) != 0
    bit_c = cols >= 64
    pr = jnp.where(bit_r, pltpu.roll(x, shift=1, axis=0),
                   pltpu.roll(x, shift=63, axis=0))
    pc = pltpu.roll(pr, shift=64, axis=1)
    return jnp.where(bit_r != bit_c, pc, x)


def tile_to_blocks_2d_bfly(tile, G):
    """tile_to_blocks_2d via the XOR cell-swap butterfly (candidate
    replacement for the lane-gather adapter; see dev/tile_xpose_probe.py)."""
    outs = []
    for t in range(G // 2):
        o = _xor_cell_swap_2d(tile[:, 128 * t : 128 * (t + 1)])  # rows 2q+b
        outs.append(o.reshape(32, 2, LANES).transpose(1, 0, 2))  # (b, q, 128)
    return jnp.concatenate(outs, axis=0)


def blocks_to_tile_2d_bfly(blocks, G):
    """blocks_to_tile_2d via the XOR cell-swap butterfly."""
    outs = []
    for t in range(G // 2):
        b = blocks[2 * t : 2 * (t + 1)]                      # (2, 32, 128)
        q = b.transpose(1, 0, 2).reshape(64, LANES)          # rows 2q + b
        outs.append(_xor_cell_swap_2d(q))                    # rows 2q + h
    return jnp.concatenate(outs, axis=1)


def _xor_cell_swap_rows32(x):
    """Exchange the 3-bit HIGH row field (rows 32f+r, f in 0..7) with the
    3-bit lane-cell field (lanes 16c+x) of a (256, 128) slab:

        out[32c + r, 16f + x] = x[32f + r, 16c + x]

    3 XOR-butterfly rounds; row rolls are whole-sublane-tile moves (32k
    rows = 4k tiles) and lane rolls are multiples of 16 — no gathers.
    Self-inverse."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (256, LANES), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (256, LANES), 1)
    f_r = rows >> 5
    f_c = cols >> 4
    for k in (1, 2, 4):
        bit_r = (f_r & k) != 0
        bit_c = (f_c & k) != 0
        pr = jnp.where(bit_r, pltpu.roll(x, shift=32 * k, axis=0),
                       pltpu.roll(x, shift=256 - 32 * k, axis=0))
        pc = jnp.where(bit_c, pltpu.roll(pr, shift=16 * k, axis=1),
                       pltpu.roll(pr, shift=128 - 16 * k, axis=1))
        x = jnp.where(bit_r != bit_c, pc, x)
    return x


def tile_to_blocks_3d_bfly(tile, G):
    """tile_to_blocks_3d via the XOR cell-swap butterfly: one static axis
    permutation + 3 roll/select rounds per 128-lane slice instead of 8
    lane gathers (candidate replacement; see dev/tile_xpose_probe.py)."""
    outs = []
    for t in range(G // 8):
        q = tile[:, :, 128 * t : 128 * (t + 1)].reshape(16, 2, 8, LANES)
        q = q.transpose(2, 0, 1, 3).reshape(256, LANES)  # rows 32*y9 + 2z + h
        o = _xor_cell_swap_rows32(q)                     # rows 32*b + 2z + h
        outs.append(o.reshape(8, 32, LANES))
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def blocks_to_tile_3d_bfly(blocks, G):
    """blocks_to_tile_3d via the XOR cell-swap butterfly (see
    tile_to_blocks_3d_bfly)."""
    outs = []
    for t in range(G // 8):
        b = blocks[8 * t : 8 * (t + 1)].reshape(256, LANES)  # rows 32b + 2z + h
        o = _xor_cell_swap_rows32(b)                         # rows 32*y9 + 2z + h
        tile = o.reshape(8, 16, 2, LANES).transpose(1, 2, 0, 3)
        outs.append(tile.reshape(16, 16, LANES))
    return jnp.concatenate(outs, axis=2) if len(outs) > 1 else outs[0]


def forward_transform_flat(xf, dims):
    """xf: (G, 32, 128) uint32 flat blocks.  rotate -> diffs -> complement
    (common.hh:436-501)."""
    xf = rotl1(xf)
    for stride, seg in TRANSFORM_AXES[dims]:
        xf = fv.segmented_diff_flat(xf, stride, seg)
    return complement_negative(xf)


def _lane_tri_mask(seg):
    """(128, 128) bf16 mask: M[m, l] = 1 iff m <= l and both in the same
    `seg`-lane segment."""
    m = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    l = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    ok = (m <= l) & ((m // seg) == (l // seg))
    return ok.astype(jnp.float32).astype(jnp.bfloat16)


def _seg_pos_plus1_u32(shape, ndim, seg):
    """(lane % seg) + 1 as uint32 — the prefix length at each lane of a
    `seg`-segmented in-row scan (the bias-fold count for the i8 path)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, ndim - 1)
    return ((lane % seg) + 1).astype(jnp.uint32)


def _bias_byte_i8(x, sh):
    """Byte `sh` of integer words x, bias-128 shifted into s8, in two
    vector ops: a truncating cast keeps the low 8 bits and flipping the
    sign bit IS subtract-128 in 8-bit two's complement
    ((b ^ 0x80) as s8 == b - 128 for b in [0, 255])."""
    b = x if sh == 0 else x >> jnp.asarray(sh, x.dtype)
    return b.astype(jnp.int8) ^ jnp.int8(-128)


def _lane_segment_cumsum_u32(x, seg):
    """Wrapping uint32 inclusive cumsum within `seg`-lane segments (seg <=
    128, stride 1) via four u8-quarter matmuls: u8 inputs are exact in
    bf16, quarter sums (<= 128*255) exact in the f32 accumulator, and the
    int32 recombination (cs3<<24)+(cs2<<16)+(cs1<<8)+cs0 wraps to exactly
    the mod-2^32 prefix sum.  Replaces log2(seg) roll rounds of the
    inverse Lorenzo transform with MXU work.

    Under I8_MM the quarters run as s8 x s8 -> s32 (2x MXU rate, no cast
    chains): bytes are bias-shifted by -128 into s8, and because lane l's
    prefix sums exactly (l % seg) + 1 entries, the per-quarter bias folds
    across the <<8k recombination into ONE wrapping correction
    (l%seg + 1) * 0x80808080."""
    M = _lane_tri_mask(seg) if not I8_MM else None
    dn = (((x.ndim - 1,), (0,)), ((), ()))
    xi = x.astype(jnp.int32)
    R = x.shape[-2]
    if I8_MM:
        m_r = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
        m_c = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
        M8 = ((m_r <= m_c) & ((m_r // seg) == (m_c // seg))).astype(jnp.int8)
        if FUSED_MM:
            # quarters stacked along sublanes: one (M=4R, K=128) matmul
            # fills the systolic rows a lone M=R quarter leaves idle
            q4 = jnp.concatenate(
                [_bias_byte_i8(xi, 8 * k) for k in range(4)], axis=-2)
            cs = jax.lax.dot_general(
                q4, M8, dn, preferred_element_type=jnp.int32)
            acc = (cs[..., 0:R, :] + (cs[..., R:2 * R, :] << 8)
                   + (cs[..., 2 * R:3 * R, :] << 16)
                   + (cs[..., 3 * R:, :] << 24))
            corr = _seg_pos_plus1_u32(x.shape, x.ndim, seg) * _u32(0x80808080)
            return acc.astype(jnp.uint32) + corr
        acc = None
        for k in range(4):
            q8 = _bias_byte_i8(xi, 8 * k)
            cs = jax.lax.dot_general(
                q8, M8, dn, preferred_element_type=jnp.int32)
            term = cs << (8 * k)
            acc = term if acc is None else acc + term
        corr = _seg_pos_plus1_u32(x.shape, x.ndim, seg) * _u32(0x80808080)
        return acc.astype(jnp.uint32) + corr
    if FUSED_MM:
        q4 = jnp.concatenate(
            [((xi >> (8 * k)) & 0xFF) for k in range(4)],
            axis=-2).astype(jnp.float32).astype(jnp.bfloat16)
        cs = jax.lax.dot_general(
            q4, M, dn, preferred_element_type=jnp.float32).astype(jnp.int32)
        acc = (cs[..., 0:R, :] + (cs[..., R:2 * R, :] << 8)
               + (cs[..., 2 * R:3 * R, :] << 16) + (cs[..., 3 * R:, :] << 24))
        return acc.astype(jnp.uint32)
    acc = None
    for k in range(4):
        q = ((xi >> (8 * k)) & 0xFF).astype(jnp.float32).astype(jnp.bfloat16)
        cs = jax.lax.dot_general(
            q, M, dn, preferred_element_type=jnp.float32).astype(jnp.int32)
        term = cs << (8 * k)
        acc = term if acc is None else acc + term
    return acc.astype(jnp.uint32)


def _block_cumsum_u32(x):
    """Wrapping uint32 inclusive cumsum over each flat (32, 128) block of
    x (..., 32, 128): in-row quarters via MXU + a full-width row-offset
    scan within the block."""
    lane = _lane_segment_cumsum_u32(x, LANES).astype(jnp.int32)
    rows = jax.lax.broadcasted_iota(jnp.int32, lane.shape, lane.ndim - 2)
    inc = jnp.broadcast_to(lane[..., :, LANES - 1 :], lane.shape)
    k = 1
    while k < 32:
        rolled = pltpu.roll(inc, shift=k, axis=lane.ndim - 2)
        inc = jnp.where(rows >= k, inc + rolled, inc)
        k <<= 1
    excl = jnp.where(rows >= 1, pltpu.roll(inc, shift=1, axis=lane.ndim - 2), 0)
    return (lane + excl).astype(jnp.uint32)


def inverse_transform_flat(xf, dims):
    xf = complement_negative(xf)
    for stride, seg in reversed(TRANSFORM_AXES[dims]):
        if stride == 1 and seg == fmt.HC_SIZE:
            xf = _block_cumsum_u32(xf)
        elif stride == 1 and seg <= LANES:
            xf = _lane_segment_cumsum_u32(xf, seg)
        else:
            xf = fv.segmented_cumsum_flat(xf, stride, seg)
    return rotr1(xf)


def _quarter_prefix(x, M, dn):
    """The four u8-quarter prefix matmuls of _lane_segment_cumsum_u32,
    returning (cs0..cs3) int32 quarter prefix sums."""
    xi = x.astype(jnp.int32)
    out = []
    for k in range(4):
        q = ((xi >> (8 * k)) & 0xFF).astype(jnp.float32).astype(jnp.bfloat16)
        out.append(jax.lax.dot_general(
            q, M, dn, preferred_element_type=jnp.float32).astype(jnp.int32))
    return out


def _lane_segment_cumsum_pair(lo, hi, seg):
    """Wrapping uint64 in-segment prefix sum on (lo, hi) planes.  The lo
    plane's carry into hi is exact in int32: with A = cs0 + (cs1<<8) and
    B = cs2 + (cs3<<8) (both <= 2^23), carry = (B + (A>>16)) >> 16.

    Under I8_MM each quarter runs s8 x s8 -> s32 with the bias restored
    PER QUARTER (+ (l%seg + 1) * 128, exact nonneg int32) because the
    carry algebra needs the true quarter prefix values, not just their
    mod-2^32 recombination."""
    dn = (((lo.ndim - 1,), (0,)), ((), ()))
    if I8_MM:
        m_r = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
        m_c = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
        M8 = ((m_r <= m_c) & ((m_r // seg) == (m_c // seg))).astype(jnp.int8)
        corr = (_seg_pos_plus1_u32(lo.shape, lo.ndim, seg)
                .astype(jnp.int32) << 7)

        if FUSED_MM:
            # all 8 quarters (lo+hi) in ONE (M=8R, K=128) matmul
            R = lo.shape[-2]
            q8 = jnp.concatenate(
                [_bias_byte_i8(lo.astype(jnp.int32), 8 * k) for k in range(4)]
                + [_bias_byte_i8(hi.astype(jnp.int32), 8 * k) for k in range(4)],
                axis=-2)
            cs = jax.lax.dot_general(
                q8, M8, dn, preferred_element_type=jnp.int32)
            c0, c1, c2, c3, h0, h1, h2, h3 = (
                cs[..., k * R:(k + 1) * R, :] + corr for k in range(8))
        else:
            def _quarter_prefix_i8(x):
                xi = x.astype(jnp.int32)
                return [jax.lax.dot_general(
                            _bias_byte_i8(xi, 8 * k), M8, dn,
                            preferred_element_type=jnp.int32) + corr
                        for k in range(4)]

            c0, c1, c2, c3 = _quarter_prefix_i8(lo)
            h0, h1, h2, h3 = _quarter_prefix_i8(hi)
        A = c0 + (c1 << 8)        # <= 2^23, exact in int32
        B = c2 + (c3 << 8)        # <= 2^23, exact in int32
        lo_cs = (A + (B << 16)).astype(jnp.uint32)
        carry = (B + (A >> 16)) >> 16
        hi_cs = (h0 + (h1 << 8) + (h2 << 16) + (h3 << 24) + carry).astype(jnp.uint32)
        return lo_cs, hi_cs
    M = _lane_tri_mask(seg)
    c0, c1, c2, c3 = _quarter_prefix(lo, M, dn)
    A = c0 + (c1 << 8)        # <= 2^23, exact in int32
    B = c2 + (c3 << 8)        # <= 2^23, exact in int32
    lo_cs = (A + (B << 16)).astype(jnp.uint32)
    carry = (B + (A >> 16)) >> 16
    h0, h1, h2, h3 = _quarter_prefix(hi, M, dn)
    hi_cs = (h0 + (h1 << 8) + (h2 << 16) + (h3 << 24) + carry).astype(jnp.uint32)
    return lo_cs, hi_cs


def _block_cumsum_pair(lo, hi):
    """Wrapping uint64 prefix sum over each flat (32, 128) block on (lo,
    hi) planes: MXU in-row quarters + a full-width pair row-offset scan."""
    lo_cs, hi_cs = _lane_segment_cumsum_pair(lo, hi, LANES)
    rows = jax.lax.broadcasted_iota(jnp.int32, lo_cs.shape, lo_cs.ndim - 2)
    inc_lo = jnp.broadcast_to(lo_cs[..., :, LANES - 1 :], lo_cs.shape)
    inc_hi = jnp.broadcast_to(hi_cs[..., :, LANES - 1 :], hi_cs.shape)
    k = 1
    while k < 32:
        r_lo = pltpu.roll(inc_lo, shift=k, axis=lo_cs.ndim - 2)
        r_hi = pltpu.roll(inc_hi, shift=k, axis=lo_cs.ndim - 2)
        a_lo = inc_lo + r_lo
        a_hi = inc_hi + r_hi + (a_lo < inc_lo).astype(jnp.uint32)
        inc_lo = jnp.where(rows >= k, a_lo, inc_lo)
        inc_hi = jnp.where(rows >= k, a_hi, inc_hi)
        k <<= 1
    z = jnp.zeros((), jnp.uint32)
    e_lo = jnp.where(rows >= 1, pltpu.roll(inc_lo, shift=1, axis=lo_cs.ndim - 2), z)
    e_hi = jnp.where(rows >= 1, pltpu.roll(inc_hi, shift=1, axis=lo_cs.ndim - 2), z)
    out_lo = lo_cs + e_lo
    out_hi = hi_cs + e_hi + (out_lo < lo_cs).astype(jnp.uint32)
    return out_lo, out_hi


# =====================================================================
# fp32 encode
# =====================================================================


def _tiled_layout(shape, dims, G):
    """(block_shape, index_map) for the tiled fast path (multi-block tiles
    DMA'd straight to/from the FULL array; see the tile-adapter section),
    or None when the minor block-grid axis is not a multiple of G.
    Border axes are fine: every indexed tile starts at a multiple of the
    block shape and ends inside the array, so the pipeline DMAs never
    touch the border region (which is stored raw, outside the kernels).
    index_map takes the grid step only (wrap for scalar-prefetch specs)."""
    grid = fmt.grid_shape(shape)
    if dims == 2 and grid[1] % G == 0:
        gx = grid[1] // G
        return (64, G * 64), lambda g: (g // gx, g % gx)
    if dims == 3 and grid[2] % G == 0:
        gx = grid[2] // G
        gy = grid[1]
        return ((16, 16, G * 16),
                lambda g: (g // (gy * gx), (g // gx) % gy, g % gx))
    return None


def _tiled_input_spec(shape, dims, G):
    layout = _tiled_layout(shape, dims, G)
    if layout is None:
        return None
    block_shape, imap = layout
    return pl.BlockSpec(block_shape, imap)


def _g_tiled(shape, dims, largest):
    """Largest grid-batch size <= `largest` with a tiled layout for this
    shape (the minor block-grid axis must divide), or None when no
    candidate fits — then the XLA gather/scatter route runs at the full
    flat-path G instead.  Below G=8 the per-step overhead outweighs the
    gather/scatter it avoids, so small divisors fall back too."""
    G = largest
    while G >= 8:
        if _tiled_layout(shape, dims, G) is not None:
            return G
        G -= 8  # stay on the 8-block granularity the tile adapters slice
    return None


def _g_tiled_padded(shape, dims, largest, max_pad=0.2, exact_cap=None):
    """(G, gx) for the PADDED tiled decode: the minor block-grid axis is
    rounded up to gx tiles of G blocks each, the shortfall filled with
    fake blocks.  Fake blocks re-decode the row's last real block into
    tile regions that are either clipped (outside the array) or border
    cells that the caller's scatter overwrites, so they only cost
    throughput — accepted while the padding fraction is <= max_pad.

    G selection minimizes estimated work = total_slots * (1 + C/G)
    (C ~ 3 grid steps of fixed overhead, fit from the CESM G sweep,
    dev/cesm_g_probe.py) over two candidate families:
      * padded Gs up to `largest` (the configured knob), as before;
      * EXACT tilings (gm % G == 0, zero fake blocks) up to `exact_cap`,
        which may exceed `largest` — measured on CESM (grid 28x56):
        44.1 GB/s at the exact G=56 vs 36.6 at the padded G=16.
    `exact_cap` defaults to `largest`; the fp32 decoders raise it to
    G_EXACT_CAP (56 — G=64 fp32 decode brushes the ~16 MB VMEM budget,
    and the fp64 planes double per-G VMEM so fp64 keeps the default).
    Returns None for 1D or when every candidate pads too much (the
    gather route is better then)."""
    if dims == 1 or not PADDED_TILES:     # kill-switch -> gather route
        return None
    grid = fmt.grid_shape(shape)
    side = fmt.SIDE_LENGTH[dims]
    if any(s < side for s in shape):
        return None                       # no full blocks at all
    gm = grid[-1]
    cap = max(largest, exact_cap or 0)
    best = None  # (cost, G, gx)
    G = cap
    while G >= 8:
        gx = -(-gm // G)
        exact = gx * G == gm
        ok = exact if G > largest else (gx * G - gm) / gm <= max_pad
        if ok:
            cost = gx * G * (1.0 + 3.0 / G)
            if best is None or cost < best[0] - 1e-9:
                best = (cost, G, gx)
        G -= 8  # stay on the 8-block granularity the tile adapters slice
    return None if best is None else (best[1], best[2])


def _tiled_layout_padded(shape, dims, G, gx):
    """(block_shape, index_map, nb_padded) over the G-padded block grid
    (see _g_tiled_padded).  The minor-axis tile gx-1 may extend past the
    array; the pipeline clips those reads/writes."""
    grid = fmt.grid_shape(shape)
    if dims == 2:
        return (64, G * 64), (lambda g: (g // gx, g % gx)), grid[0] * gx * G
    gy = grid[1]
    return ((16, 16, G * 16),
            (lambda g: (g // (gy * gx), (g // gx) % gy, g % gx)),
            grid[0] * gy * gx * G)


def _padded_block_ids(shape, dims, G, gx):
    """Real-block index for every padded-grid block id (fake slots clamp
    to their row's last real block, whose window stays in-bounds)."""
    grid = fmt.grid_shape(shape)
    gm = grid[-1]
    lead = int(np.prod(grid[:-1]))
    ids = np.arange(lead * gx * G)
    row, col = ids // (gx * G), ids % (gx * G)
    return (row * gm + np.minimum(col, gm - 1)).astype(np.int32)


def _load_blocks(blocks_ref, mode, G):
    if mode == "tile2d":
        return (tile_to_blocks_2d_bfly if TILE_BFLY
                else tile_to_blocks_2d)(blocks_ref[:], G)
    if mode == "tile3d":
        return (tile_to_blocks_3d_bfly if TILE_BFLY
                else tile_to_blocks_3d)(blocks_ref[:], G)
    return blocks_ref[0].reshape(G, 32, LANES)


def _encode_kernel_fp32(dims, num_hc, G, nsteps, start_word, mode="flat"):
    """start_word: stream word offset where the first body word lands
    (= num_hc for a full single-stream encode where the header precedes the
    bodies; 0 for per-shard body-only encodes)."""
    R = 1 + G * 33  # carry row + G blocks of (1 head row + 32 body rows)

    def kernel(blocks_ref, body_ref, hdr_ref, staging, carry_row, hdr_row,
               sm, sem_body, sem_hdr):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            sm[0] = start_word // LANES  # current output row base
            sm[1] = start_word % LANES   # fill level of the partial row
            sm[2] = 0                    # total body words emitted
            carry_row[:] = jnp.zeros((1, LANES), jnp.uint32)

        xf = _load_blocks(blocks_ref, mode, G)
        xf = forward_transform_flat(xf, dims)

        # transposed words, already in (chunk, bit) stream order
        body = transpose_bits_lane32(xf)       # (G, 32, 128)
        # heads: bitpack of the transposed nonzero mask via MXU matmuls
        heads_rows = head_row_from_h1(heads_via_matmul(body))  # (G, 1, 128)
        dense = jnp.concatenate([heads_rows, body], axis=1)  # (G, 33, 128)

        # ---- step-flat assembly: carry row + all blocks
        fill = sm[1]
        step_flat = jnp.concatenate(
            [carry_row[:], dense.reshape(G * 33, LANES)], axis=0)  # (R, 128)
        rows, cols = (jax.lax.broadcasted_iota(jnp.int32, (R, LANES), d) for d in (0, 1))
        # validity straight off the flat layout (no 3D valid build + flat
        # relayout): head rows sit at rows 1+33b (a static mask), real
        # blocks satisfy rows < 1 + 33*(num_hc - step*G), and the carry
        # row occupies lanes < fill
        is_head = rows % 33 == 1
        real_rows = rows < 1 + 33 * (num_hc - step * G)
        # select between int32 operands, not bools: current Mosaic rejects
        # the i8->i1 trunci a bool-operand select needs on unaligned row
        # counts (vector<(1+33G)x128xi1>), observed live on the r4 tunnel
        # (dev/mosaic_repro.py)
        valid = jnp.where(
            rows == 0, (cols < fill).astype(jnp.int32),
            ((is_head | (step_flat != 0)) & real_rows).astype(jnp.int32))

        # step compaction: in-row butterfly (7 lane-only rounds), per-row
        # rotation to the global lane offset, then ONE single-plane OR-merge
        # over rows.  A row's rotated span covers <=2 output rows: lanes
        # >= rot go to prow, the wrap (lanes < rot) to prow + 1 — encoded
        # as per-slot shifts in the same butterfly.  Per lane the live
        # destinations are monotone (a wrapping row forces every later row
        # to a strictly larger prow, and tied destinations occupy disjoint
        # lanes), which is exactly merge_rows_or's contract.
        lane_cs = fv.lane_count_prefix(valid, i8=I8_MM)
        cnt = jnp.broadcast_to(lane_cs[:, LANES - 1 :], (R, LANES))
        off = (_row_prefix_excl_mxu(cnt, R) if MXU_SCAN
               else _row_prefix_excl(cnt, R))
        rot = off & (LANES - 1)
        prow = off >> 7
        j = (cols - rot) & (LANES - 1)
        can = j < cnt
        s_local = jnp.where(valid != 0, cols + 1 - lane_cs, -1)
        (comp,), _ = fv.compact_rows((step_flat,), s_local)
        (part,) = rotate_rows_to_offset((comp,), j, can)
        if MXU_MERGE:
            (merged,) = _merge_rows_sum_mxu((part,), prow, rot)
        else:
            s_merge = jnp.where(
                can, rows - prow - (cols < rot).astype(jnp.int32), -1)
            # shifts r - prow(r) are non-decreasing in r (prow steps by
            # <= 1 per row), so the last row bounds every live shift —
            # high merge rounds are skipped at runtime when compression
            # this step cannot reach them (they only fire on near-empty
            # steps)
            ms = (R - 1) - (off[R - 1, 0] >> 7) if MERGE_GATE else None
            (merged,) = fv.merge_rows_or((part,), s_merge, ms)
        # the previous step's output DMAs read staging/hdr_row; waiting
        # immediately before the first overwrite of those buffers lets
        # them overlap this step's whole compute phase (transform/
        # transpose/compaction/merge)
        @pl.when(step > 0)
        def _():
            pltpu.make_async_copy(
                staging.at[:], body_ref.at[pl.ds(0, R)], sem_body).wait()
            pltpu.make_async_copy(
                hdr_row.at[:], hdr_ref.at[pl.ds(0, 1)], sem_hdr).wait()

        staging[:] = merged
        csum = off + cnt

        # ---- header entries: offset-after for each block of this step
        ends = csum[1:].reshape(G, 33, LANES)[:, 32, LANES - 1 :]  # (G, 1)
        entries = (sm[2] - fill + ends.astype(jnp.int32))          # (G, 1)
        entries_row = entries.T                              # (1, G)
        pad = jnp.zeros((1, LANES - G), jnp.int32)
        hdr_row[:] = jnp.concatenate([entries_row, pad], axis=1).astype(jnp.uint32)

        # ---- DMAs: all staging rows at the current row base (ascending
        # overlapping writes), header row at row `step`
        off_row = sm[0]
        cp_body = pltpu.make_async_copy(
            staging.at[:], body_ref.at[pl.ds(off_row, R)], sem_body)
        cp_body.start()
        cp_hdr = pltpu.make_async_copy(
            hdr_row.at[:], hdr_ref.at[pl.ds(step, 1)], sem_hdr)
        cp_hdr.start()

        # ---- carry updates
        total_with_fill = csum[R - 1, LANES - 1]
        n_full = total_with_fill // LANES
        sm[0] = off_row + n_full
        sm[1] = total_with_fill % LANES
        sm[2] = sm[2] + (total_with_fill - fill)
        carry_row[:] = staging[pl.ds(n_full, 1), :]

        @pl.when(step == nsteps - 1)
        def _():
            pltpu.make_async_copy(
                staging.at[:], body_ref.at[pl.ds(0, R)], sem_body).wait()
            pltpu.make_async_copy(
                hdr_row.at[:], hdr_ref.at[pl.ds(0, 1)], sem_hdr).wait()

    return kernel, R


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _encode_blocks_fp32(blocks, dims, num_hc, start_word=None, min_rows=0):
    """blocks: (nb_pad, 4096) uint32 (padded to a multiple of G_ENC).
    Returns (body2d (rows,128) u32 with stream words from word `start_word`
    (default num_hc) onward, hdr2d (nsteps,128) u32 with G_ENC entries per
    row).  ``min_rows`` grows the output buffer (callers that assemble the
    final stream in place size it to bound + decode slack up front, so no
    bound-slice/pad copy runs after the kernel)."""
    if start_word is None:
        start_word = num_hc
    nb_pad = blocks.shape[0]
    G = G_ENC
    nsteps = nb_pad // G
    R = 1 + G * 33
    bound_rows = (start_word + nb_pad * (128 + fmt.HC_SIZE) + LANES - 1) // LANES + R + 2
    bound_rows = max(bound_rows, min_rows)
    kernel, R = _encode_kernel_fp32(dims, num_hc, G, nsteps, start_word)
    body, hdr = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[pl.BlockSpec((1, G * 32, LANES), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        out_shape=(jax.ShapeDtypeStruct((bound_rows, LANES), jnp.uint32),
                   jax.ShapeDtypeStruct((nsteps, LANES), jnp.uint32)),
        scratch_shapes=[
            pltpu.VMEM((R, LANES), jnp.uint32),   # staging
            pltpu.VMEM((1, LANES), jnp.uint32),   # carry row
            pltpu.VMEM((1, LANES), jnp.uint32),   # header row
            pltpu.SMEM((3,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=INTERPRET,
    )(blocks.reshape(nsteps, G * 32, LANES))
    return body, hdr


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _encode_interior_fp32(words, shape, num_hc, G, start_word=None, min_rows=0):
    """Tiled fast-path encode over the full array: multi-block tiles are
    DMA'd directly by the pipeline (no XLA gather transpose) and
    rearranged in-VMEM; border regions are never indexed (see
    _tiled_layout).  start_word=0 emits a body-only span (per-shard
    encodes); the default (num_hc) leaves room for the header.
    ``min_rows`` as in _encode_blocks_fp32."""
    if start_word is None:
        start_word = num_hc
    dims = len(shape)
    in_spec = _tiled_input_spec(shape, dims, G)
    nsteps = num_hc // G
    R = 1 + G * 33
    bound_rows = (start_word + num_hc * (128 + fmt.HC_SIZE) + LANES - 1) // LANES + R + 2
    bound_rows = max(bound_rows, min_rows)
    mode = "tile2d" if dims == 2 else "tile3d"
    kernel, R = _encode_kernel_fp32(dims, num_hc, G, nsteps, start_word, mode)
    body, hdr = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[in_spec],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        out_shape=(jax.ShapeDtypeStruct((bound_rows, LANES), jnp.uint32),
                   jax.ShapeDtypeStruct((nsteps, LANES), jnp.uint32)),
        scratch_shapes=[
            pltpu.VMEM((R, LANES), jnp.uint32),   # staging
            pltpu.VMEM((1, LANES), jnp.uint32),   # carry row
            pltpu.VMEM((1, LANES), jnp.uint32),   # header row
            pltpu.SMEM((3,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=INTERPRET,
    )(words)
    return body, hdr


# =====================================================================
# fp32 decode
# =====================================================================

WIN_ROWS = 34  # 4224 max block words + up to 127 alignment slack

# Decode-window row buckets for the adaptive fast path: the header offset
# table bounds every block's compressed length BEFORE decode launches (the
# random-access property the reference exploits, cuda_codec.inl:290-297),
# so the decoder can pick the smallest window covering the stream's
# largest block — fewer HBM rows DMA'd per block and a shorter
# select-matmul contraction, zero format change.  Buckets bound the number
# of compiled kernel variants (each (shape, G, win) is a fresh Mosaic
# compile).
WIN_BUCKETS = (12, 17, 22, 26, 34)


def win_rows_for(max_block_words: int) -> int:
    """Smallest supported decode-window row count for a stream whose
    largest block is `max_block_words` profile words: ceil((L+127)/128)
    covers the worst 127-lane start rotation.  Feed it
    ``max_block_words()`` of the actual stream; a too-small window
    silently corrupts output."""
    need = (int(max_block_words) + 2 * (LANES - 1)) // LANES
    for b in WIN_BUCKETS:
        if b >= need:
            return b
    return WIN_ROWS


def max_block_words(stream, shape, wb: int) -> int:
    """Largest compressed block length (in profile words) read from the
    stream's header offset table (host-side numpy)."""
    num_hc = fmt.num_hypercubes(tuple(shape))
    if num_hc == 0:
        return 0
    off = np.asarray(stream[:num_hc]).astype(np.int64)
    return int(np.max(np.diff(off, prepend=0)))


def _win_from_env() -> int | None:
    """NDZIP_TPU_WIN_ROWS: unset -> worst-case WIN_ROWS (no extra compile
    variants); 'adaptive' -> pick the bucket from each stream's header;
    an integer pins a fixed window row count (2..WIN_ROWS — larger would
    DMA past the decode padding; the host decompress() additionally
    rejects a pinned window smaller than the stream's largest block)."""
    v = os.environ.get("NDZIP_TPU_WIN_ROWS", "").strip().lower()
    if not v:
        return WIN_ROWS
    if v == "adaptive":
        return None
    iv = int(v)
    if not 2 <= iv <= WIN_ROWS:
        raise ValueError(
            f"NDZIP_TPU_WIN_ROWS={iv} outside [2, {WIN_ROWS}]")
    return iv


def rotate_rows_to_offset(comp_planes, j, can):
    """Per-row lane rotation of left-compacted rows to their global stream
    lane alignment: one STACKED data-dependent take_along_axis across all
    planes.  This is the encode kernels' only data-dependent gather site —
    each additional such site multiplies Mosaic compile time ~4-5x (two
    separate gathers pushed a fresh fp64 kernel past 10 minutes), so fp64
    routes both u32 planes through one gather stacked on the row axis."""
    R = comp_planes[0].shape[0]
    if len(comp_planes) == 1:
        rot = jnp.take_along_axis(comp_planes[0], j, axis=1)
        return (jnp.where(can, rot, _u32(0)),)
    stacked = jnp.concatenate(comp_planes, axis=0)
    jj = jnp.concatenate([j] * len(comp_planes), axis=0)
    rot = jnp.take_along_axis(stacked, jj, axis=1)
    return tuple(jnp.where(can, rot[i * R : (i + 1) * R], _u32(0))
                 for i in range(len(comp_planes)))


def _row_prefix_excl(x, nrows):
    """Exclusive prefix over the row axis (-2) at full lane width; input
    must already be broadcast across lanes."""
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 2)
    inc = x
    k = 1
    while k < nrows:
        rolled = pltpu.roll(inc, shift=k, axis=x.ndim - 2)
        inc = jnp.where(rows >= k, inc + rolled, inc)
        k <<= 1
    return jnp.where(rows >= 1, pltpu.roll(inc, shift=1, axis=x.ndim - 2), 0)


def _row_prefix_excl_mxu(cnt, R):
    """Exclusive row prefix of the (R, 128) lane-broadcast row totals as
    ONE strictly-lower-triangular matmul.  bf16 variant: totals <= 128
    are exact in bf16 and every prefix (< R*128 < 2^24) is exact in the
    f32 accumulator.  Under I8_MM the totals are bias-shifted by -128
    into s8 (cnt <= 128 itself does NOT fit) and the bias is restored as
    +128*row (the strict-lower prefix length is the row index) — s32
    exact throughout.  Replaces the log2(R) full-width roll rounds of
    _row_prefix_excl in the encode kernels — prefix work moves to the
    otherwise-idle MXU."""
    r_i = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    o_i = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    dn = (((0,), (0,)), ((), ()))
    if I8_MM:
        # i1 -> i32 -> i8: a direct bool vector cast hits Mosaic's
        # "Invalid vector register cast" on the real backend
        # (dev/hw_logs_r5/verify_mxu_i8.log), same class as the encode
        # kernels' bool-select restriction
        T8 = (r_i < o_i).astype(jnp.int32).astype(jnp.int8)
        c8 = _bias_byte_i8(cnt, 0)
        out = jax.lax.dot_general(
            T8, c8, dn, preferred_element_type=jnp.int32)
        rows = jax.lax.broadcasted_iota(jnp.int32, cnt.shape, cnt.ndim - 2)
        return out + (rows << 7)
    T = (r_i < o_i).astype(jnp.float32).astype(jnp.bfloat16)
    cb = cnt.astype(jnp.float32).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        T, cb, dn, preferred_element_type=jnp.float32)
    return out.astype(jnp.int32)


def _merge_rows_sum_mxu(parts, prow, rot):
    """The step merge as one-hot matmuls: row r's unwrapped lanes land in
    output row prow[r], its wrapped lanes (cols < rot[r]) in prow[r]+1,
    and same-destination contributions occupy disjoint lanes — so the
    OR-merge is a SUM, i.e. an MXU contraction with the one-hot
    destination matrix (cf. merge_rows_or's butterfly, which does the
    same routing in log2(R) VPU roll rounds).  u8 quarters keep u32
    values exact (one-hot x bytes in bf16, f32 accumulate).  `parts` is a
    tuple of (R, 128) planes with dead slots already zeroed; prow/rot are
    (R, 128) lane-broadcast."""
    R = parts[0].shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    wrap = cols < rot
    r_i = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    o_i = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    p_col = prow[:, 0:1]
    dn = (((0,), (0,)), ((), ()))
    if I8_MM:
        # s8 variant: each output slot's TRUE contribution is a single
        # byte (dead slots and disjoint lanes contribute exact zeros), so
        # the -128 bias enters once per SOURCE slot routed to the output:
        # true_k = dot_k + 128*count[o], where count[o] = number of
        # source slots with destination o — data-dependent, recovered
        # with one extra all-ones matmul shared by every quarter/plane.
        # Across the <<8k recombination the count bias folds to
        # count * 0x80808080 (mod 2^32).
        # i1 -> i32 -> i8 as in _row_prefix_excl_mxu (Mosaic rejects the
        # direct bool vector cast on the real backend)
        M8 = jnp.concatenate(
            [(p_col == o_i).astype(jnp.int32),
             (p_col + 1 == o_i).astype(jnp.int32)], axis=0).astype(jnp.int8)
        ones8 = jnp.ones((2 * R, LANES), jnp.int8)
        count = jax.lax.dot_general(
            M8, ones8, dn, preferred_element_type=jnp.int32)
        bias = count.astype(jnp.uint32) * _u32(0x80808080)
        outs = []
        for v in parts:
            stacked = jnp.concatenate(
                [jnp.where(wrap, _u32(0), v), jnp.where(wrap, v, _u32(0))],
                axis=0)
            acc = None
            for sh in (0, 8, 16, 24):
                q8 = _bias_byte_i8(stacked, sh)
                s = jax.lax.dot_general(
                    M8, q8, dn, preferred_element_type=jnp.int32)
                acc = s if acc is None else acc + (s << sh)
            outs.append(acc.astype(jnp.uint32) + bias)
        return tuple(outs)
    # bool -> i32 -> f32 -> bf16, the chain Mosaic accepts (cf.
    # heads_via_matmul; a direct i1 vector cast is rejected)
    M = jnp.concatenate(
        [(p_col == o_i).astype(jnp.int32),
         (p_col + 1 == o_i).astype(jnp.int32)], axis=0)
    Mb = M.astype(jnp.float32).astype(jnp.bfloat16)
    outs = []
    for v in parts:
        stacked = jnp.concatenate(
            [jnp.where(wrap, _u32(0), v), jnp.where(wrap, v, _u32(0))],
            axis=0)
        acc = None
        for sh in (0, 8, 16, 24):
            # cast chain as in _select_window_rows: byte extract in u32,
            # u32->i32->f32->bf16 (Mosaic has no direct u32<->f32 casts)
            q = ((stacked >> _u32(sh)) & _u32(0xFF)).astype(jnp.int32)
            qb = q.astype(jnp.float32).astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                Mb, qb, dn, preferred_element_type=jnp.float32).astype(jnp.int32)
            acc = s if acc is None else acc | (s << sh)
        outs.append(acc.astype(jnp.uint32))
    return tuple(outs)


def _select_window_rows(P_onehot, w):
    """Data-dependent row selection as an MXU one-hot matmul: P_onehot is
    a (G, R_out, W) bool/0-1 one-hot over source rows, w a (G, W, 128)
    uint32 window.  u8 quarters at DEFAULT precision: the MXU's bf16
    input rounding is exact for 0/1 one-hots and byte values <= 255, each
    output slot receives exactly one nonzero product, and f32
    accumulation keeps it exact — 4 single-pass bf16 matmuls beat 2
    u16-half matmuls at Precision.HIGHEST (which multi-passes the MXU).

    Under I8_MM the quarters run as s8 x s8 -> s32 contractions instead
    (2x MXU rate on v5e, no f32/bf16 cast chain): bytes are bias-shifted
    by -128 into s8 range, and because every output row selects EXACTLY
    one source word (callers clamp the one-hot index into the window),
    the bias folds across quarters into one +0x80808080 constant.

    Under FUSED_MM the four quarter contractions stack along the lane
    axis into ONE (K=W, N=512) matmul: the one-hot operand P loads into
    the MXU once instead of four times, and three matmul issues (each a
    full pipeline fill for a K<=34 contraction that uses <2% of the
    array) disappear.  Exactness is unchanged — the fused product is the
    same four quarter sums, just computed side by side."""
    dn = (((2,), (1,)), ((0,), (0,)))
    L = w.shape[-1]
    if I8_MM:
        P8 = P_onehot.astype(jnp.int8)
        if FUSED_MM:
            w4 = jnp.concatenate(
                [_bias_byte_i8(w, sh) for sh in (0, 8, 16, 24)], axis=-1)
            s = jax.lax.dot_general(
                P8, w4, dn, preferred_element_type=jnp.int32)
            acc = (s[..., 0:L] + (s[..., L:2 * L] << 8)
                   + (s[..., 2 * L:3 * L] << 16) + (s[..., 3 * L:] << 24))
            return acc.astype(jnp.uint32) + _u32(0x80808080)
        acc = None
        for sh in (0, 8, 16, 24):
            q8 = _bias_byte_i8(w, sh)
            s = jax.lax.dot_general(
                P8, q8, dn, preferred_element_type=jnp.int32)
            acc = s if acc is None else acc + (s << sh)
        return (acc.astype(jnp.uint32) + _u32(0x80808080))
    # Mosaic has no direct uint32<->float32 casts; route through int32.
    P = P_onehot.astype(jnp.float32).astype(jnp.bfloat16)
    if FUSED_MM:
        w4 = jnp.concatenate(
            [((w >> _u32(sh)) & _u32(0xFF)).astype(jnp.int32)
             for sh in (0, 8, 16, 24)], axis=-1)
        wb = w4.astype(jnp.float32).astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            P, wb, dn, preferred_element_type=jnp.float32).astype(jnp.int32)
        out = (s[..., 0:L] | (s[..., L:2 * L] << 8)
               | (s[..., 2 * L:3 * L] << 16) | (s[..., 3 * L:] << 24))
        return out.astype(jnp.uint32)
    out = None
    for sh in (0, 8, 16, 24):
        q = ((w >> _u32(sh)) & _u32(0xFF)).astype(jnp.int32)
        qb = q.astype(jnp.float32).astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            P, qb, dn, preferred_element_type=jnp.float32).astype(jnp.int32)
        out = s if out is None else out | (s << sh)
    return out.astype(jnp.uint32)


def _store_blocks(out_ref, xf, mode, G):
    if mode == "tile2d":
        out_ref[:] = (blocks_to_tile_2d_bfly if TILE_BFLY
                      else blocks_to_tile_2d)(xf, G)
    elif mode == "tile3d":
        out_ref[:] = (blocks_to_tile_3d_bfly if TILE_BFLY
                      else blocks_to_tile_3d)(xf, G)
    else:
        out_ref[0] = xf.reshape(G, fmt.HC_SIZE)


def _decode_kernel_fp32(dims, num_hc, G, nsteps, mode="flat", win_rows=WIN_ROWS):
    """Per-row gather decode: instead of derotating the whole window and
    running a log-depth expand butterfly (the two hottest stages of the v1
    kernel), each output row r selects its <=2 source rows with an MXU
    one-hot matmul and places its words with ONE lane gather.  Source
    position of dest (row r, lane l) = block_rot + 128 + sum(present
    before row r) + in-row rank(l); spans at most 2 window rows because a
    row re-expands exactly 128 words from <=128 sources.  ``win_rows``
    (<= WIN_ROWS) must cover the stream's largest block (win_rows_for)."""

    def kernel(starts_ref, stream_ref, out_ref, win, sems):
        step = pl.program_id(0)
        cur = jax.lax.rem(step, 2)

        # double-buffered window fetch: step s waits the windows issued at
        # step s-1 and prefetches step s+1's while it computes
        def issue(target_step, buf):
            for g in range(G):
                start = starts_ref[target_step * G + g]
                pltpu.make_async_copy(
                    stream_ref.at[pl.ds(start // LANES, win_rows)],
                    win.at[buf, g], sems.at[buf, g]).start()

        @pl.when(step == 0)
        def _():
            issue(step, cur)

        @pl.when(step + 1 < nsteps)
        def _():
            issue(step + 1, 1 - cur)

        for g in range(G):
            pltpu.make_async_copy(
                stream_ref.at[pl.ds(0, win_rows)],
                win.at[cur, g], sems.at[cur, g]).wait()

        w = win[cur]                                 # (G, win_rows, 128)
        # per-block rotation scalars broadcast to (G,1,128): Mosaic supports
        # scalar->lanes and sublane broadcasts, but not both at once from a
        # (G,1,1) vector
        rot0 = jnp.concatenate(
            [jnp.broadcast_to(starts_ref[step * G + g] % LANES, (1, 1, LANES))
             for g in range(G)], axis=0).astype(jnp.int32)      # (G, 1, 128)

        # heads row: window positions rot0 .. rot0+127 (rows 0-1); ONE
        # stacked gather for both candidate rows (each data-dependent
        # gather multiplies Mosaic compile time — see compact_rows)
        cols1 = jax.lax.broadcasted_iota(jnp.int32, (G, 1, LANES), 2)
        hsrc = rot0 + cols1
        hidx = hsrc & (LANES - 1)
        h_ab = _gather_lanes(
            w[:, 0:2, :], jnp.concatenate([hidx, hidx], axis=1))
        heads_row = jnp.where(hsrc < LANES, h_ab[:, 0:1, :], h_ab[:, 1:2, :])

        # present bits: spread each chunk's head to its 32 flat positions,
        # then test bit (31 - i) where i = flat % 32
        spread = head_spread_to_flat(heads_row, G)              # (G, 32, 128)
        cols32 = jax.lax.broadcasted_iota(jnp.uint32, spread.shape, 2) & _u32(31)
        present = ((spread >> (_u32(31) - cols32)) & _u32(1)).astype(jnp.int32)

        # source index of dest (r, l): in-row rank + row offset + heads
        lane_cs = fv.lane_count_prefix(present, i8=I8_MM)       # (G, 32, 128)
        cnt_b = jnp.broadcast_to(lane_cs[:, :, LANES - 1 :], lane_cs.shape)
        off_row = _row_prefix_excl(cnt_b, 32) + LANES           # + heads row
        srow = rot0 + off_row                                   # window word of rank 0
        p = srow // LANES                                       # in [1, 33]
        rot = srow % LANES

        q = jax.lax.broadcasted_iota(jnp.int32, (G, 32, win_rows), 2)
        p_col = p[:, :, 0:1]
        p_a, p_b = p_col, p_col + 1
        if I8_MM:
            # the i8 bias fold needs exactly one selected word per output
            # row; rows whose span ends before p (present all 0, value
            # masked downstream) clamp into the window instead of
            # selecting nothing
            p_a = jnp.minimum(p_a, win_rows - 1)
            p_b = jnp.minimum(p_b, win_rows - 1)
        P12 = jnp.concatenate([(q == p_a), (q == p_b)], axis=1)
        AB = _select_window_rows(P12, w)        # one fused matmul set
        A, B = AB[:, :32, :], AB[:, 32:, :]

        src = rot + lane_cs - 1                                 # in [0, 255)
        srcm = src & (LANES - 1)
        ab = _gather_lanes(jnp.concatenate([A, B], axis=1),
                           jnp.concatenate([srcm, srcm], axis=1))
        val = jnp.where(src < LANES, ab[:, :32, :], ab[:, 32:, :])
        body = jnp.where(present != 0, val, _u32(0))            # (G, 32, 128)

        xf = transpose_bits_lane32(body)             # inverse (involution)
        xf = inverse_transform_flat(xf, dims)
        _store_blocks(out_ref, xf, mode, G)

    return kernel


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _decode_blocks_fp32(stream2d, starts, dims, num_hc, win=WIN_ROWS):
    """stream2d: (rows,128) u32 padded stream; starts: (nb_pad,) i32 word
    offsets of each block (incl. header).  Returns blocks (nb_pad, 4096)."""
    nb_pad = starts.shape[0]
    G = G_DEC
    nsteps = nb_pad // G
    kernel = _decode_kernel_fp32(dims, num_hc, G, nsteps, win_rows=win)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, G, fmt.HC_SIZE), lambda g, starts: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, G, win, LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA((2, G)),
        ],
    )
    blocks = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nsteps, G, fmt.HC_SIZE), jnp.uint32),
        interpret=INTERPRET,
    )(starts, stream2d)
    return blocks.reshape(nb_pad, fmt.HC_SIZE)


def _minor_padded_shape(shape, dims, G, gx):
    """Kernel output shape for the padded tiled decode: the minor dim
    rounded up to the gx*G-tile span.  Writing full tiles into this
    padded array and slicing afterwards replaces per-tile CLIPPED stores
    (every minor-axis tail tile on an unaligned shape, e.g. CESM's
    3600-wide grid — half the tiles at gx=2) with full aligned stores."""
    side = fmt.SIDE_LENGTH[dims]
    m_pad = gx * G * side
    return shape[:-1] + (max(shape[-1], m_pad),)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _decode_interior_fp32(stream2d, starts, shape, num_hc, G, gx, win=WIN_ROWS):
    """Tiled fast-path decode over the G-padded block grid: writes a
    minor-dim-padded array directly via tiled out BlockSpecs (the pipeline
    DMAs the rearranged tiles; no XLA scatter transpose, no clipped
    stores) and slices to `shape`.  `starts` is in padded-grid order
    (_padded_block_ids); fake blocks land in the sliced-off pad or in
    border cells the caller's scatter overwrites."""
    dims = len(shape)
    out_shape = _minor_padded_shape(shape, dims, G, gx)
    block_shape, imap, nb_padded = _tiled_layout_padded(shape, dims, G, gx)
    nsteps = nb_padded // G
    mode = "tile2d" if dims == 2 else "tile3d"
    kernel = _decode_kernel_fp32(dims, num_hc, G, nsteps, mode, win_rows=win)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(block_shape, lambda g, starts: imap(g),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, G, win, LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA((2, G)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.uint32),
        interpret=INTERPRET,
    )(starts, stream2d)
    if out_shape != shape:
        out = jax.lax.slice(out, (0,) * dims, shape)
    return out


# =====================================================================
# fp64 — every 64-bit stream word is a (lo, hi) uint32 pair held in two
# separate (32, 128) "planes" per block (4096 u64 words).  Chunks are 64
# words, i.e. 64-lane segments; heads per block are 64 u64 words = the
# first 64 lanes of the dense head row.  Planes are compacted together
# (one shared rank search routes both) in u64-word granularity and
# interleaved into the byte-exact u32 stream IN-KERNEL
# (interleave_planes_rows).
# Mirrors the reference's 32-bit-register 64-bit formulation
# (cuda_codec.inl:236-264).
# =====================================================================


def rotl1_pair(lo, hi):
    one, t31 = _u32(1), _u32(31)
    return (lo << one) | (hi >> t31), (hi << one) | (lo >> t31)


def rotr1_pair(lo, hi):
    one, t31 = _u32(1), _u32(31)
    return (lo >> one) | (hi << t31), (hi >> one) | (lo << t31)


def complement_negative_pair(lo, hi):
    sign = (hi >> _u32(31)) != 0
    lo2 = jnp.where(sign, lo ^ _u32(0xFFFFFFFF), lo)
    hi2 = jnp.where(sign, hi ^ _u32(0x7FFFFFFF), hi)
    return lo2, hi2


def forward_transform_flat_pair(lo, hi, dims):
    lo, hi = rotl1_pair(lo, hi)
    for stride, seg in TRANSFORM_AXES[dims]:
        lo, hi = fv.segmented_diff_flat_pair(lo, hi, stride, seg)
    return complement_negative_pair(lo, hi)


def inverse_transform_flat_pair(lo, hi, dims):
    lo, hi = complement_negative_pair(lo, hi)
    for stride, seg in reversed(TRANSFORM_AXES[dims]):
        if stride == 1 and seg == fmt.HC_SIZE:
            lo, hi = _block_cumsum_pair(lo, hi)
        elif stride == 1 and seg <= LANES:
            lo, hi = _lane_segment_cumsum_pair(lo, hi, seg)
        else:
            lo, hi = fv.segmented_cumsum_flat_pair(lo, hi, stride, seg)
    return rotr1_pair(lo, hi)


def transpose_bits_lane64_pair(lo, hi):
    """64x64 bit transpose of every aligned 64-lane segment, on (lo, hi)
    plane pairs: four 32x32 quadrant transposes + a half-segment swap
    between planes (see ops/bitops.py::transpose_bits_pair32 for the
    quadrant algebra).  Involution."""
    t_lo = transpose_bits_lane32(lo)
    t_hi = transpose_bits_lane32(hi)
    cols = jax.lax.broadcasted_iota(jnp.int32, lo.shape, lo.ndim - 1)
    first_half = (cols & 63) < 32
    out_hi = jnp.where(first_half, t_hi, pltpu.roll(t_lo, shift=32, axis=lo.ndim - 1))
    out_lo = jnp.where(first_half, pltpu.roll(t_hi, shift=96, axis=lo.ndim - 1), t_lo)
    return out_lo, out_hi


def heads64_via_matmul(body_lo, body_hi):
    """u64 head bitmaps from the transposed body planes: bit (63-i) of
    chunk c's u64 head is (transposed u64 word 64c+i != 0), so both head
    planes are weighted sums of one nonzero mask over 64-lane segments —
    four default-precision bf16 matmuls (see heads_via_matmul for the
    exactness argument).  Returns (h1_lo, h1_hi), each (G, 32, 128) with
    row r's 2 head words at lanes 0..1."""
    nz = ((body_lo | body_hi) != 0).astype(jnp.int32).astype(
        jnp.float32).astype(jnp.bfloat16)
    m = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    sl = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    seg = (m >> 6) == sl                     # word m belongs to chunk slot sl
    i = m & 63
    pw = 1 << (15 - (i & 15))
    dn = (((2,), (0,)), ((), ()))

    def head16(lo_bound, hi_bound):
        W = jnp.where(seg & (i >= lo_bound) & (i < hi_bound), pw, 0)
        h = jax.lax.dot_general(
            nz, W.astype(jnp.float32).astype(jnp.bfloat16), dn,
            preferred_element_type=jnp.float32)
        return h.astype(jnp.int32)

    h_hi = (head16(0, 16) << 16) | head16(16, 32)    # head_hi plane
    h_lo = (head16(32, 48) << 16) | head16(48, 64)   # head_lo plane
    return h_lo.astype(jnp.uint32), h_hi.astype(jnp.uint32)


def head_row64_from_h1(h1):
    """h1: (G, 32, 128) with row r's 2 head words at lanes 0..1 (zeros
    above).  Returns (G, 1, 128) with head[c] at lane c (c < 64)."""
    cols = jax.lax.broadcasted_iota(jnp.int32, h1.shape, 2)
    rows = jax.lax.broadcasted_iota(jnp.int32, h1.shape, 1)
    idx2 = (cols - (rows << 1)) & (LANES - 1)
    h2 = _gather_lanes(h1, idx2)
    for h in (16, 8, 4, 2, 1):
        h2 = h2[:, :h] | h2[:, h : 2 * h]
    return h2


def head_spread64_to_flat(head_row, G):
    """(G, 1, 128) head row (head[c] at lane c < 64) -> (G, 32, 128) where
    every flat u64-word position holds its chunk's head-plane word."""
    b = jnp.broadcast_to(head_row, (G, 32, LANES))
    rows = jax.lax.broadcasted_iota(jnp.int32, b.shape, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, b.shape, 2)
    idx = (rows << 1) + (cols >> 6)
    return _gather_lanes(b, idx)


def interleave_planes_rows(lo, hi):
    """(R, 128) u64-word planes -> (2R, 128) u32 rows in stream layout
    (u32 index 2w+p of u64 word w): out[2r, l] = plane_{l&1}[r, l>>1],
    out[2r+1, l] = plane_{l&1}[r, 64 + (l>>1)].

    The (N, 2) minor-dim interleave is pathological for XLA on TPU (a
    measured ~13 ms for 68 MB); as four in-kernel lane gathers it is a
    couple of full-width passes."""
    R = lo.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, lo.shape, 1)
    par = (cols & 1) == 1
    j = cols >> 1
    even = jnp.where(par, jnp.take_along_axis(hi, j, axis=1),
                     jnp.take_along_axis(lo, j, axis=1))
    j_o = j + 64
    odd = jnp.where(par, jnp.take_along_axis(hi, j_o, axis=1),
                    jnp.take_along_axis(lo, j_o, axis=1))
    return jnp.stack([even, odd], axis=1).reshape(2 * R, LANES)


def deinterleave_window_rows(win32):
    """(G, 2W, 128) u32 stream rows -> ((G, W, 128) lo, (G, W, 128) hi)
    u64-word planes (inverse of interleave_planes_rows)."""
    Gd, W2, _ = win32.shape
    W = W2 // 2
    wr = win32.reshape(Gd, W, 2, LANES)
    we = wr[:, :, 0, :]
    wo = wr[:, :, 1, :]
    cols = jax.lax.broadcasted_iota(jnp.int32, (Gd, W, LANES), 2)
    j2 = (cols << 1) & (LANES - 1)   # lane of the lo half of word `col`
    first = cols < 64                # words 0..63 sit in the even u32 row
    lo = jnp.where(first, _gather_lanes(we, j2), _gather_lanes(wo, j2))
    hi = jnp.where(first, _gather_lanes(we, j2 + 1), _gather_lanes(wo, j2 + 1))
    return lo, hi


# ------------------------------------------------------------- fp64 encode


def _encode_kernel_fp64(dims, num_hc, G, nsteps, hw, mode="flat"):
    R = 1 + G * 33  # carry row + G blocks of (1 head row + 32 body rows)

    def kernel(lo_ref, hi_ref, body_ref, hdr_ref,
               stag_lo, stag_hi, stag32, carry_lo, carry_hi, hdr_row,
               sm, sem_body, sem_hdr):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            sm[0] = hw // LANES      # current output row base (u64-word rows)
            sm[1] = hw % LANES       # fill level of the partial row
            sm[2] = 0                # total body u64 words emitted
            carry_lo[:] = jnp.zeros((1, LANES), jnp.uint32)
            carry_hi[:] = jnp.zeros((1, LANES), jnp.uint32)

        lo = _load_blocks(lo_ref, mode, G)
        hi = _load_blocks(hi_ref, mode, G)
        lo, hi = forward_transform_flat_pair(lo, hi, dims)

        body_lo, body_hi = transpose_bits_lane64_pair(lo, hi)
        h1_lo, h1_hi = heads64_via_matmul(body_lo, body_hi)
        heads_lo = head_row64_from_h1(h1_lo)                # (G, 1, 128)
        heads_hi = head_row64_from_h1(h1_hi)
        dense_lo = jnp.concatenate([heads_lo, body_lo], axis=1)  # (G, 33, 128)
        dense_hi = jnp.concatenate([heads_hi, body_hi], axis=1)

        # ---- step-flat assembly: carry row + all blocks (both planes)
        fill = sm[1]
        step_lo = jnp.concatenate(
            [carry_lo[:], dense_lo.reshape(G * 33, LANES)], axis=0)  # (R, 128)
        step_hi = jnp.concatenate(
            [carry_hi[:], dense_hi.reshape(G * 33, LANES)], axis=0)
        rows, cols = (jax.lax.broadcasted_iota(jnp.int32, (R, LANES), d) for d in (0, 1))
        # validity straight off the flat layout (as in the fp32 kernel):
        # head rows (rows 1+33b) hold exactly 64 u64 head words, real
        # blocks satisfy the row bound, the carry row fills lanes < fill
        is_head = rows % 33 == 1
        real_rows = rows < 1 + 33 * (num_hc - step * G)
        # int32 operands (not bool) for the same Mosaic trunci reason as
        # the fp32 kernel; the inner head/body pick folds into one bool
        # expression so no bool-operand select remains
        body_nz = jnp.where(is_head, (cols < 64).astype(jnp.int32),
                            ((step_lo | step_hi) != 0).astype(jnp.int32))
        valid = jnp.where(
            rows == 0, (cols < fill).astype(jnp.int32),
            body_nz * real_rows.astype(jnp.int32))

        # step compaction: same two-phase route as the fp32 kernel (in-row
        # butterfly + per-row rotation + one single-plane-per-plane OR-merge
        # over rows, wrap encoded as per-slot shifts), with both u32 planes
        # co-routed on the shared shift plane.
        lane_cs = fv.lane_count_prefix(valid, i8=I8_MM)
        cnt = jnp.broadcast_to(lane_cs[:, LANES - 1 :], (R, LANES))
        off = (_row_prefix_excl_mxu(cnt, R) if MXU_SCAN
               else _row_prefix_excl(cnt, R))
        csum = off + cnt
        rot = off & (LANES - 1)
        prow = off >> 7
        j = (cols - rot) & (LANES - 1)
        can = j < cnt
        s_local = jnp.where(valid != 0, cols + 1 - lane_cs, -1)
        (comp_lo, comp_hi), _ = fv.compact_rows((step_lo, step_hi), s_local)
        part_lo, part_hi = rotate_rows_to_offset((comp_lo, comp_hi), j, can)
        if MXU_MERGE:
            c_lo, c_hi = _merge_rows_sum_mxu((part_lo, part_hi), prow, rot)
        else:
            s_merge = jnp.where(
                can, rows - prow - (cols < rot).astype(jnp.int32), -1)
            # see the fp32 kernel's note
            ms = (R - 1) - (off[R - 1, 0] >> 7) if MERGE_GATE else None
            c_lo, c_hi = fv.merge_rows_or((part_lo, part_hi), s_merge, ms)
        stag_lo[:] = c_lo
        stag_hi[:] = c_hi
        # the previous step's output DMAs read stag32/hdr_row (stag_lo/hi
        # are not DMA sources); waiting immediately before the stag32
        # overwrite overlaps the DMAs with this step's whole compute phase
        # including the merge
        @pl.when(step > 0)
        def _():
            pltpu.make_async_copy(
                stag32.at[:], body_ref.at[pl.ds(0, 2 * R)], sem_body).wait()
            pltpu.make_async_copy(
                hdr_row.at[:], hdr_ref.at[pl.ds(0, 1)], sem_hdr).wait()

        # interleave the compacted planes into u32 stream rows in-kernel
        # (XLA's (N, 2) minor-dim interleave measured ~13 ms for 68 MB)
        stag32[:] = interleave_planes_rows(c_lo, c_hi)

        # ---- header entries: offset-after (in u64 words) per block
        ends = csum[1:].reshape(G, 33, LANES)[:, 32, LANES - 1 :]  # (G, 1)
        entries = (sm[2] - fill + ends.astype(jnp.int32))
        entries_row = entries.T
        pad = jnp.zeros((1, LANES - G), jnp.int32)
        hdr_row[:] = jnp.concatenate([entries_row, pad], axis=1).astype(jnp.uint32)

        off_row = sm[0]
        pltpu.make_async_copy(
            stag32.at[:], body_ref.at[pl.ds(2 * off_row, 2 * R)], sem_body).start()
        pltpu.make_async_copy(
            hdr_row.at[:], hdr_ref.at[pl.ds(step, 1)], sem_hdr).start()

        total_with_fill = csum[R - 1, LANES - 1]
        n_full = total_with_fill // LANES
        sm[0] = off_row + n_full
        sm[1] = total_with_fill % LANES
        sm[2] = sm[2] + (total_with_fill - fill)
        carry_lo[:] = stag_lo[pl.ds(n_full, 1), :]
        carry_hi[:] = stag_hi[pl.ds(n_full, 1), :]

        @pl.when(step == nsteps - 1)
        def _():
            pltpu.make_async_copy(
                stag32.at[:], body_ref.at[pl.ds(0, 2 * R)], sem_body).wait()
            pltpu.make_async_copy(
                hdr_row.at[:], hdr_ref.at[pl.ds(0, 1)], sem_hdr).wait()

    return kernel, R


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _encode_blocks_fp64(blocks_lo, blocks_hi, dims, num_hc, start_word=None,
                        min_rows=0):
    """blocks_{lo,hi}: (nb_pad, 4096) uint32 planes.  Returns (body2d,
    hdr2d); body2d is the interleaved u32 stream (u32 index 2w+p of u64
    word w) from u64 word `start_word` (default: the header length)
    onward.  ``min_rows`` (u64 rows) as in _encode_blocks_fp32."""
    nb_pad = blocks_lo.shape[0]
    G = G_ENC
    nsteps = nb_pad // G
    R = 1 + G * 33
    hw = fmt.header_words(num_hc, 64) if start_word is None else start_word
    bound_rows = (hw + nb_pad * (64 + fmt.HC_SIZE) + LANES - 1) // LANES + R + 2
    bound_rows = max(bound_rows, min_rows)
    kernel, R = _encode_kernel_fp64(dims, num_hc, G, nsteps, hw)
    body, hdr = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[pl.BlockSpec((1, G * 32, LANES), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, G * 32, LANES), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        out_shape=(jax.ShapeDtypeStruct((2 * bound_rows, LANES), jnp.uint32),
                   jax.ShapeDtypeStruct((nsteps, LANES), jnp.uint32)),
        scratch_shapes=[
            pltpu.VMEM((R, LANES), jnp.uint32),       # staging lo (u64 plane)
            pltpu.VMEM((R, LANES), jnp.uint32),       # staging hi (u64 plane)
            pltpu.VMEM((2 * R, LANES), jnp.uint32),   # interleaved u32 rows
            pltpu.VMEM((1, LANES), jnp.uint32),       # carry lo
            pltpu.VMEM((1, LANES), jnp.uint32),       # carry hi
            pltpu.VMEM((1, LANES), jnp.uint32),       # header row
            pltpu.SMEM((3,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=INTERPRET,
    )(blocks_lo.reshape(nsteps, G * 32, LANES),
      blocks_hi.reshape(nsteps, G * 32, LANES))
    return body, hdr


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _encode_interior_fp64(lo, hi, shape, num_hc, G, start_word=None,
                          min_rows=0):
    """Tiled fast-path fp64 encode over the full (lo, hi) plane arrays.
    start_word (u64 units) = 0 emits a body-only span for per-shard
    encodes; default leaves room for the header.  ``min_rows`` (u64 rows)
    as in _encode_blocks_fp32."""
    dims = len(shape)
    block_shape, imap = _tiled_layout(shape, dims, G)
    nsteps = num_hc // G
    R = 1 + G * 33
    hw = fmt.header_words(num_hc, 64) if start_word is None else start_word
    bound_rows = (hw + num_hc * (64 + fmt.HC_SIZE) + LANES - 1) // LANES + R + 2
    bound_rows = max(bound_rows, min_rows)
    mode = "tile2d" if dims == 2 else "tile3d"
    kernel, R = _encode_kernel_fp64(dims, num_hc, G, nsteps, hw, mode)
    body, hdr = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[pl.BlockSpec(block_shape, imap),
                  pl.BlockSpec(block_shape, imap)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        out_shape=(jax.ShapeDtypeStruct((2 * bound_rows, LANES), jnp.uint32),
                   jax.ShapeDtypeStruct((nsteps, LANES), jnp.uint32)),
        scratch_shapes=[
            pltpu.VMEM((R, LANES), jnp.uint32),       # staging lo (u64 plane)
            pltpu.VMEM((R, LANES), jnp.uint32),       # staging hi (u64 plane)
            pltpu.VMEM((2 * R, LANES), jnp.uint32),   # interleaved u32 rows
            pltpu.VMEM((1, LANES), jnp.uint32),       # carry lo
            pltpu.VMEM((1, LANES), jnp.uint32),       # carry hi
            pltpu.VMEM((1, LANES), jnp.uint32),       # header row
            pltpu.SMEM((3,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=INTERPRET,
    )(lo, hi)
    return body, hdr


@functools.partial(jax.jit, static_argnums=(2,))
def _encode_fp64_device(lo, hi, shape):
    """Full device encode of an fp64 grid held as (lo, hi) uint32 plane
    arrays of `shape`.  Returns (stream_padded_u32, length_u32)."""
    dims = len(shape)
    num_hc = fmt.num_hypercubes(shape)
    border_idx = _border_indices(shape)
    bound = fmt.compressed_bound_u32(shape, 64)
    need = bound + 2 * WIN_ROWS * LANES   # decode-slack size (u32 words)
    need_rows64 = (need + 2 * LANES - 1) // (2 * LANES)
    hw = fmt.header_words(num_hc, 64)
    header_u32 = 2 * hw

    def border_vals_u32():
        return jnp.stack(
            [_border_take(lo, shape), _border_take(hi, shape)],
            axis=-1).reshape(-1)

    if num_hc == 0:
        out = jnp.zeros(2 * need_rows64 * LANES, jnp.uint32)
        if border_idx.size:
            out = jax.lax.dynamic_update_slice(out, border_vals_u32(), (0,))
        return out, jnp.int32(2 * border_idx.size)

    G = _g_tiled(shape, dims, G_ENC)
    if G is not None:
        body2d, hdr2d = _encode_interior_fp64(
            lo, hi, shape, num_hc, G, min_rows=need_rows64)
    else:
        G = G_ENC
        b_lo = _gather_blocks_xla(lo, shape)
        b_hi = _gather_blocks_xla(hi, shape)
        nb_pad = (num_hc + G - 1) // G * G
        if nb_pad != num_hc:
            z = jnp.zeros((nb_pad - num_hc, fmt.HC_SIZE), jnp.uint32)
            b_lo = jnp.concatenate([b_lo, z], 0)
            b_hi = jnp.concatenate([b_hi, z], 0)
        body2d, hdr2d = _encode_blocks_fp64(
            b_lo, b_hi, dims, num_hc, min_rows=need_rows64)

    header = hdr2d[:, :G].reshape(-1)[:num_hc]
    body_total = jax.lax.bitcast_convert_type(header[num_hc - 1], jnp.int32)

    out = body2d.reshape(-1)  # already the interleaved u32 stream
    out = jax.lax.dynamic_update_slice(out, header, (0,))
    if header_u32 > num_hc:  # zero pad entry for odd block counts
        out = jax.lax.dynamic_update_slice(
            out, jnp.zeros(header_u32 - num_hc, jnp.uint32), (num_hc,))
    if border_idx.size:
        out = jax.lax.dynamic_update_slice(
            out, border_vals_u32(), (header_u32 + 2 * body_total,))
    length = header_u32 + 2 * body_total + 2 * border_idx.size
    return out, length


# ------------------------------------------------------------- fp64 decode


def _decode_kernel_fp64(dims, num_hc, G, nsteps, mode="flat", win_rows=WIN_ROWS):
    """Per-row gather decode on (lo, hi) planes — see _decode_kernel_fp32
    for the design; heads occupy 64 u64 words (not 128)."""

    def kernel(starts_ref, stream_ref, out_lo_ref, out_hi_ref, win32, sem):
        step = pl.program_id(0)
        cur = jax.lax.rem(step, 2)

        def issue(target_step, buf):
            for g in range(G):
                start = starts_ref[target_step * G + g]
                pltpu.make_async_copy(
                    stream_ref.at[pl.ds(2 * (start // LANES), 2 * win_rows)],
                    win32.at[buf, g], sem.at[buf, g]).start()

        @pl.when(step == 0)
        def _():
            issue(step, cur)

        @pl.when(step + 1 < nsteps)
        def _():
            issue(step + 1, 1 - cur)

        for g in range(G):
            pltpu.make_async_copy(
                stream_ref.at[pl.ds(0, 2 * win_rows)],
                win32.at[cur, g], sem.at[cur, g]).wait()

        # split the interleaved u32 stream rows into u64-word planes
        win_lo, win_hi = deinterleave_window_rows(win32[cur])

        rot0 = jnp.concatenate(
            [jnp.broadcast_to(starts_ref[step * G + g] % LANES, (1, 1, LANES))
             for g in range(G)], axis=0).astype(jnp.int32)      # (G, 1, 128)

        # heads row: u64 words rot0 .. rot0+63 live in window rows 0-1.
        # ONE stacked gather serves both planes and both candidate rows
        # (each data-dependent gather multiplies Mosaic compile time).
        cols1 = jax.lax.broadcasted_iota(jnp.int32, (G, 1, LANES), 2)
        hsrc = rot0 + cols1
        hidx = hsrc & (LANES - 1)
        h4 = _gather_lanes(
            jnp.concatenate([win_lo[:, 0:2, :], win_hi[:, 0:2, :]], axis=1),
            jnp.concatenate([hidx] * 4, axis=1))
        near_h = hsrc < LANES

        def head_row(plane):                                    # (G, 1, 128)
            a, b = (0, 1) if plane == "lo" else (2, 3)
            return jnp.where(near_h, h4[:, a : a + 1, :], h4[:, b : b + 1, :])

        # present bits: chunk c's u64 head = (hi, lo) planes at lane c of
        # the head row; word i of a chunk (i = lane % 64) tests bit 63-i:
        # hi-plane bit 31-i for i < 32, lo-plane bit 63-i above.
        spread_lo = head_spread64_to_flat(head_row("lo"), G)    # (G, 32, 128)
        spread_hi = head_spread64_to_flat(head_row("hi"), G)
        colsb = jax.lax.broadcasted_iota(jnp.int32, spread_lo.shape, 2)
        i64 = colsb & 63
        j32 = (colsb & 31).astype(jnp.uint32)
        plane = jnp.where(i64 < 32, spread_hi, spread_lo)
        present = ((plane >> (_u32(31) - j32)) & _u32(1)).astype(jnp.int32)

        # source u64-word index of dest (r, l): rank + row offset + heads
        lane_cs = fv.lane_count_prefix(present, i8=I8_MM)       # (G, 32, 128)
        cnt_b = jnp.broadcast_to(lane_cs[:, :, LANES - 1 :], lane_cs.shape)
        off_row = _row_prefix_excl(cnt_b, 32) + 64              # 64 head words
        srow = rot0 + off_row
        p = srow // LANES                                       # in [0, 33)
        rot = srow % LANES

        q = jax.lax.broadcasted_iota(jnp.int32, (G, 32, win_rows), 2)
        p_col = p[:, :, 0:1]
        p_a, p_b = p_col, p_col + 1
        if I8_MM:
            # see the fp32 kernel: clamp so every row selects exactly one
            # word (i8 bias-fold requirement); clamped rows are masked
            p_a = jnp.minimum(p_a, win_rows - 1)
            p_b = jnp.minimum(p_b, win_rows - 1)
        P12 = jnp.concatenate([(q == p_a), (q == p_b)], axis=1)
        AB_lo = _select_window_rows(P12, win_lo)
        AB_hi = _select_window_rows(P12, win_hi)
        A_lo, B_lo = AB_lo[:, :32, :], AB_lo[:, 32:, :]
        A_hi, B_hi = AB_hi[:, :32, :], AB_hi[:, 32:, :]

        src = rot + lane_cs - 1
        srcm = src & (LANES - 1)
        near = src < LANES
        # ONE stacked gather places all four selected row sets
        g4 = _gather_lanes(
            jnp.concatenate([A_lo, B_lo, A_hi, B_hi], axis=1),
            jnp.concatenate([srcm] * 4, axis=1))
        c_lo = jnp.where(present != 0,
                         jnp.where(near, g4[:, :32, :], g4[:, 32:64, :]),
                         _u32(0))
        c_hi = jnp.where(present != 0,
                         jnp.where(near, g4[:, 64:96, :], g4[:, 96:, :]),
                         _u32(0))

        c_lo, c_hi = transpose_bits_lane64_pair(c_lo, c_hi)
        x_lo, x_hi = inverse_transform_flat_pair(c_lo, c_hi, dims)
        _store_blocks(out_lo_ref, x_lo, mode, G)
        _store_blocks(out_hi_ref, x_hi, mode, G)

    return kernel


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _decode_blocks_fp64(stream2d, starts, dims, num_hc, win=WIN_ROWS):
    """stream2d: (rows,128) u32 padded interleaved stream; starts:
    (nb_pad,) i32 u64-word offsets of each block (incl. header)."""
    nb_pad = starts.shape[0]
    G = G_DEC64
    nsteps = nb_pad // G
    kernel = _decode_kernel_fp64(dims, num_hc, G, nsteps, win_rows=win)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(pl.BlockSpec((1, G, fmt.HC_SIZE), lambda g, starts: (g, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, G, fmt.HC_SIZE), lambda g, starts: (g, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((2, G, 2 * win, LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA((2, G)),
        ],
    )
    b_lo, b_hi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((nsteps, G, fmt.HC_SIZE), jnp.uint32),
                   jax.ShapeDtypeStruct((nsteps, G, fmt.HC_SIZE), jnp.uint32)),
        interpret=INTERPRET,
    )(starts, stream2d)
    return b_lo.reshape(nb_pad, fmt.HC_SIZE), b_hi.reshape(nb_pad, fmt.HC_SIZE)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _decode_interior_fp64(stream2d, starts, shape, num_hc, G, gx, win=WIN_ROWS):
    """Tiled fast-path fp64 decode over the G-padded block grid: writes
    minor-dim-padded (lo, hi) plane arrays directly via tiled out
    BlockSpecs and slices (fake blocks / clipping-free stores as in
    _decode_interior_fp32)."""
    dims = len(shape)
    out_shape = _minor_padded_shape(shape, dims, G, gx)
    block_shape, imap, nb_padded = _tiled_layout_padded(shape, dims, G, gx)
    nsteps = nb_padded // G
    mode = "tile2d" if dims == 2 else "tile3d"
    kernel = _decode_kernel_fp64(dims, num_hc, G, nsteps, mode, win_rows=win)
    out_spec = pl.BlockSpec(block_shape, lambda g, starts: imap(g),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(out_spec, out_spec),
        scratch_shapes=[
            pltpu.VMEM((2, G, 2 * win, LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA((2, G)),
        ],
    )
    lo, hi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct(out_shape, jnp.uint32),
                   jax.ShapeDtypeStruct(out_shape, jnp.uint32)),
        interpret=INTERPRET,
    )(starts, stream2d)
    if out_shape != shape:
        lo = jax.lax.slice(lo, (0,) * dims, shape)
        hi = jax.lax.slice(hi, (0,) * dims, shape)
    return lo, hi


@functools.partial(jax.jit, static_argnums=(1, 2))
def _decode_fp64_device(stream, shape, win=WIN_ROWS):
    """stream: padded u32 stream (>= 2*(bound_u64_rows + WIN_ROWS)*128).
    Returns (lo, hi) uint32 plane arrays of `shape`.  ``win`` as in
    _decode_fp32_device (u64-word window rows)."""
    dims = len(shape)
    num_hc = fmt.num_hypercubes(shape)
    border_idx = _border_indices(shape)
    total = int(np.prod(shape))
    hw = fmt.header_words(num_hc, 64)
    header_u32 = 2 * hw

    flat_lo = jnp.zeros(total, jnp.uint32)
    flat_hi = jnp.zeros(total, jnp.uint32)
    body_total = jnp.int32(0)  # u64 words
    if num_hc:
        offsets = jax.lax.bitcast_convert_type(stream[:num_hc], jnp.int32)
        starts_blocks = jnp.concatenate([jnp.zeros(1, jnp.int32), offsets[:-1]])
        body_total = offsets[num_hc - 1]
        starts_full = hw + starts_blocks  # u64-word offsets incl. header

        rows32 = stream.shape[0] // LANES
        stream2d = stream[: rows32 * LANES].reshape(rows32, LANES)
        tc = _g_tiled_padded(shape, dims, G_DEC64)
        if tc is not None:
            G_t, gx = tc
            ids = jnp.asarray(_padded_block_ids(shape, dims, G_t, gx))
            arr_lo, arr_hi = _decode_interior_fp64(
                stream2d, starts_full[ids], shape, num_hc, G_t, gx, win)
        else:
            nb_pad = (num_hc + G_DEC64 - 1) // G_DEC64 * G_DEC64
            starts = starts_full
            if nb_pad != num_hc:
                starts = jnp.concatenate(
                    [starts,
                     jnp.broadcast_to(starts[num_hc - 1], (nb_pad - num_hc,))])
            b_lo, b_hi = _decode_blocks_fp64(stream2d, starts, dims, num_hc, win)
            if dims == 1:
                # 1D zero-copy assembly (see _decode_fp32_device): plane
                # outputs reshape straight to the interior; the border tail
                # (stream-interleaved (lo, hi) pairs) joins in the concat.
                int_lo = b_lo[:num_hc].reshape(num_hc * fmt.HC_SIZE)
                int_hi = b_hi[:num_hc].reshape(num_hc * fmt.HC_SIZE)
                if border_idx.size:
                    bvals = jax.lax.dynamic_slice(
                        stream, (header_u32 + 2 * body_total,),
                        (2 * border_idx.size,))
                    pairs_b = bvals.reshape(-1, 2)
                    return (jnp.concatenate([int_lo, pairs_b[:, 0]]).reshape(shape),
                            jnp.concatenate([int_hi, pairs_b[:, 1]]).reshape(shape))
                return int_lo.reshape(shape), int_hi.reshape(shape)
            flat_lo = _scatter_blocks_xla(b_lo[:num_hc], shape, flat_lo)
            flat_hi = _scatter_blocks_xla(b_hi[:num_hc], shape, flat_hi)
            arr_lo, arr_hi = flat_lo.reshape(shape), flat_hi.reshape(shape)
    else:
        arr_lo, arr_hi = flat_lo.reshape(shape), flat_hi.reshape(shape)

    if border_idx.size:
        border_vals = jax.lax.dynamic_slice(
            stream, (header_u32 + 2 * body_total,), (2 * border_idx.size,))
        pairs_b = border_vals.reshape(-1, 2)
        arr_lo = _border_place(arr_lo, pairs_b[:, 0], shape)
        arr_hi = _border_place(arr_hi, pairs_b[:, 1], shape)
    return arr_lo, arr_hi


# =====================================================================
# host-level assembly (XLA glue around the kernels)
# =====================================================================


def _gather_blocks_xla(words, shape):
    dims = len(shape)
    side = fmt.SIDE_LENGTH[dims]
    grid = fmt.grid_shape(shape)
    nb = int(np.prod(grid))
    interior = words[tuple(slice(0, g * side) for g in grid)]
    split_shape = tuple(x for g in grid for x in (g, side))
    arr = interior.reshape(split_shape)
    perm = tuple(range(0, 2 * dims, 2)) + tuple(range(1, 2 * dims, 2))
    return arr.transpose(perm).reshape(nb, fmt.HC_SIZE)


def _scatter_blocks_xla(blocks, shape, flat_words):
    dims = len(shape)
    side = fmt.SIDE_LENGTH[dims]
    grid = fmt.grid_shape(shape)
    arr = blocks.reshape(grid + (side,) * dims)
    inv_perm = []
    for d in range(dims):
        inv_perm += [d, dims + d]
    interior = arr.transpose(inv_perm).reshape(tuple(g * side for g in grid))
    full = flat_words.reshape(shape)
    full = full.at[tuple(slice(0, g * side) for g in grid)].set(interior)
    return full.reshape(-1)


def _border_indices(shape):
    slices = fmt.border_slices(shape)
    if not slices:
        return np.zeros(0, dtype=np.int64)
    return np.concatenate(
        [np.arange(off, off + cnt, dtype=np.int64) for off, cnt in slices])


def _cat_parts(parts, dtype):
    if not parts:
        return jnp.zeros(0, dtype)
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts)


def _border_take(words, shape):
    """Border values in stream order (common.hh:245-282) via <= 3
    static-slice box copies instead of an element-granularity gather.

    border_slices' recursion visits, per leading index p, the innermost
    bordered axis' runs first and the next axis' run after — so the
    border decomposes into at most `dims` axis-aligned boxes whose
    values interleave regularly per p.  Static slices + reshapes let XLA
    emit dense copies; the flat gather over border_element_count points
    (57k for 1800x3600) was the dominant cost of bordered-shape codecs."""
    dims = len(shape)
    side = fmt.SIDE_LENGTH[dims]
    if any(s < side for s in shape):
        return words.reshape(-1)            # whole array is border
    b = tuple(s // side * side for s in shape)
    if dims == 1:
        return words[b[0]:]
    if dims == 2:
        (s0, s1), (b0, b1) = shape, b
        parts = []
        if b1 < s1:
            parts.append(words[:b0, b1:].reshape(-1))
        if b0 < s0:
            parts.append(words[b0:, :].reshape(-1))
        return _cat_parts(parts, words.dtype)
    (s0, s1, s2), (b0, b1, b2) = shape, b
    parts_p = []                            # per-p interleaved segments
    if b2 < s2:
        parts_p.append(words[:b0, :b1, b2:].reshape(b0, -1))
    if b1 < s1:
        parts_p.append(words[:b0, b1:, :].reshape(b0, -1))
    parts = []
    if parts_p:
        pp = (parts_p[0] if len(parts_p) == 1
              else jnp.concatenate(parts_p, axis=1))
        parts.append(pp.reshape(-1))
    if b0 < s0:
        parts.append(words[b0:].reshape(-1))
    return _cat_parts(parts, words.dtype)


def _border_place(arr, bv, shape):
    """Inverse of _border_take: place the stream-order border vector into
    the shaped array with <= 3 static-origin dynamic_update_slices —
    replacing the N-D point scatter (.at[_border_nd].set), which XLA
    lowers to a serial per-element scatter (the dominant decode cost for
    bordered 2D/3D shapes)."""
    dims = len(shape)
    side = fmt.SIDE_LENGTH[dims]
    if any(s < side for s in shape):
        return bv.reshape(shape)
    b = tuple(s // side * side for s in shape)
    if dims == 1:
        if b[0] == shape[0]:
            return arr
        return jax.lax.dynamic_update_slice(arr, bv, (b[0],))
    if dims == 2:
        (s0, s1), (b0, b1) = shape, b
        pos = 0
        if b1 < s1:
            w = s1 - b1
            arr = jax.lax.dynamic_update_slice(
                arr, bv[: b0 * w].reshape(b0, w), (0, b1))
            pos = b0 * w
        if b0 < s0:
            arr = jax.lax.dynamic_update_slice(
                arr, bv[pos:].reshape(s0 - b0, s1), (b0, 0))
        return arr
    (s0, s1, s2), (b0, b1, b2) = shape, b
    wA = b1 * (s2 - b2)
    wB = (s1 - b1) * s2
    per_p = wA + wB
    pos = b0 * per_p
    if per_p:
        V = bv[:pos].reshape(b0, per_p)
        if wA:
            arr = jax.lax.dynamic_update_slice(
                arr, V[:, :wA].reshape(b0, b1, s2 - b2), (0, 0, b2))
        if wB:
            arr = jax.lax.dynamic_update_slice(
                arr, V[:, wA:].reshape(b0, s1 - b1, s2), (0, b1, 0))
    if b0 < s0:
        arr = jax.lax.dynamic_update_slice(
            arr, bv[pos:].reshape(s0 - b0, s1, s2), (b0, 0, 0))
    return arr


@functools.partial(jax.jit, static_argnums=(1,))
def _encode_fp32_device(words, shape):
    """Full device encode: words (shape) u32 -> (stream_padded_u32, length).
    The stream buffer is emitted at decode-slack size (bound + one decode
    window; see _with_decode_slack) straight from the kernel, so neither a
    bound-slice nor compress_device's pad ever copies the stream again."""
    dims = len(shape)
    num_hc = fmt.num_hypercubes(shape)
    border_idx = _border_indices(shape)
    bound = fmt.compressed_bound_u32(shape, 32)
    need = bound + WIN_ROWS * LANES
    need_rows = (need + LANES - 1) // LANES

    if num_hc == 0:
        out = jnp.zeros(need_rows * LANES, jnp.uint32)
        if border_idx.size:
            out = jax.lax.dynamic_update_slice(
                out, _border_take(words, shape), (0,))
        return out, jnp.int32(border_idx.size)

    G = _g_tiled(shape, dims, G_ENC)
    if G is not None:
        body2d, hdr2d = _encode_interior_fp32(
            words, shape, num_hc, G, min_rows=need_rows)
    else:
        G = G_ENC
        blocks = _gather_blocks_xla(words, shape)
        nb_pad = (num_hc + G - 1) // G * G
        if nb_pad != num_hc:
            blocks = jnp.concatenate(
                [blocks, jnp.zeros((nb_pad - num_hc, fmt.HC_SIZE), jnp.uint32)], 0)
        body2d, hdr2d = _encode_blocks_fp32(
            blocks, dims, num_hc, min_rows=need_rows)

    header = hdr2d[:, :G].reshape(-1)[:num_hc]
    body_total = jax.lax.bitcast_convert_type(header[num_hc - 1], jnp.int32)

    flat = body2d.reshape(-1)
    out = jax.lax.dynamic_update_slice(flat, header, (0,))
    if border_idx.size:
        border_vals = _border_take(words, shape)
        out = jax.lax.dynamic_update_slice(out, border_vals, (num_hc + body_total,))
    length = num_hc + body_total + border_idx.size
    return out, length


@functools.partial(jax.jit, static_argnums=(1, 2))
def _decode_fp32_device(stream, shape, win=WIN_ROWS):
    """stream: padded (>= bound + one window row) u32.  Returns words.
    ``win`` (static) must cover the stream's largest block — pick it with
    win_rows_for(max_block_words(...)); the worst-case default always
    does."""
    dims = len(shape)
    num_hc = fmt.num_hypercubes(shape)
    border_idx = _border_indices(shape)
    total = int(np.prod(shape))

    flat = jnp.zeros(total, jnp.uint32)
    body_total = jnp.int32(0)
    if num_hc:
        offsets = jax.lax.bitcast_convert_type(stream[:num_hc], jnp.int32)
        starts_blocks = jnp.concatenate([jnp.zeros(1, jnp.int32), offsets[:-1]])
        body_total = offsets[num_hc - 1]
        starts_full = num_hc + starts_blocks  # word offsets incl. header

        rows = (stream.shape[0]) // LANES
        stream2d = stream[: rows * LANES].reshape(rows, LANES)
        tc = _g_tiled_padded(shape, dims, G_DEC, exact_cap=G_EXACT_CAP)
        if tc is not None:
            G_t, gx = tc
            ids = jnp.asarray(_padded_block_ids(shape, dims, G_t, gx))
            arr = _decode_interior_fp32(
                stream2d, starts_full[ids], shape, num_hc, G_t, gx, win)
        else:
            nb_pad = (num_hc + G_DEC - 1) // G_DEC * G_DEC
            starts = starts_full
            if nb_pad != num_hc:
                starts = jnp.concatenate(
                    [starts,
                     jnp.broadcast_to(starts[num_hc - 1], (nb_pad - num_hc,))])
            blocks = _decode_blocks_fp32(stream2d, starts, dims, num_hc, win)
            if dims == 1:
                # 1D zero-copy assembly: the flat block layout IS row-major
                # output order, so the kernel's output reshapes straight to
                # the interior — no _scatter_blocks_xla pass (a full
                # read+write of the array, ~15% of 64 MiB decode).  The
                # border (if any) is the contiguous tail, appended from the
                # stream in the same concat.
                interior = blocks[:num_hc].reshape(num_hc * fmt.HC_SIZE)
                if border_idx.size:
                    border_vals = jax.lax.dynamic_slice(
                        stream, (num_hc + body_total,), (border_idx.size,))
                    return jnp.concatenate([interior, border_vals]).reshape(shape)
                return interior.reshape(shape)
            flat = _scatter_blocks_xla(blocks[:num_hc], shape, flat)
            arr = flat.reshape(shape)
    else:
        arr = flat.reshape(shape)

    if border_idx.size:
        border_vals = jax.lax.dynamic_slice(
            stream, (num_hc + body_total,), (border_idx.size,))
        arr = _border_place(arr, border_vals, shape)
    return arr


# =====================================================================
# device API (jax.Array in/out, data stays on the TPU)
# =====================================================================


def compress_device(data) -> tuple:
    """Device-resident compress — the TPU analog of the reference's
    device-pointer compressors (include/ndzip/cuda.hh:10-41,
    include/ndzip/sycl.hh:45-108): input and output never leave the chip,
    so a JAX program can compress an array it already holds on device
    (e.g. before a DCN transfer or a host checkpoint write).

    ``data``: a float32/uint32 ``jax.Array`` of 1-3 dims, or a
    ``(lo, hi)`` tuple of uint32 plane arrays for fp64 payloads (TPUs have
    no 64-bit integer lanes; see ops/u64pair for host-side splitting).

    Returns ``(stream, length)``: ``stream`` is a decode-ready u32 buffer
    (``format.compressed_bound_u32`` plus the decoder's window slack, so
    ``decompress_device`` consumes it without any further device copy),
    ``length`` a device int32 scalar of occupied u32 words.
    ``stream[:length]`` is byte-identical to every other backend's
    output."""
    if isinstance(data, tuple):
        lo, hi = data
        fmt.validate_shape(lo.shape)
        if lo.dtype != jnp.uint32 or hi.dtype != jnp.uint32:
            raise ValueError("fp64 device compress takes (lo, hi) uint32 planes")
        stream, length = _encode_fp64_device(lo, hi, lo.shape)
        return _with_decode_slack(stream, lo.shape, 64), length
    fmt.validate_shape(data.shape)
    if data.dtype == jnp.float32:
        data = jax.lax.bitcast_convert_type(data, jnp.uint32)
    elif data.dtype != jnp.uint32:
        raise ValueError(
            f"device compress supports float32/uint32 arrays or (lo, hi) "
            f"uint32 plane tuples, got {data.dtype}")
    stream, length = _encode_fp32_device(data, data.shape)
    return _with_decode_slack(stream, data.shape, 32), length


def _with_decode_slack(stream, shape, wb):
    """Zero-fill the stream buffer out to the decoder's required size
    (bound + one gather-window row) so the compress->decompress round
    trip stays on-device with no reallocation at decode time."""
    need = fmt.compressed_bound_u32(tuple(shape), wb) + \
        (wb // 32) * WIN_ROWS * LANES
    if stream.shape[0] < need:
        stream = _pad_stream_device(stream, need)
    return stream


def decompress_device(stream, shape, dtype=np.float32, win=None):
    """Device-resident decompress (cuda.hh:28-41 analog).  ``stream`` is a
    u32 device array holding the compressed chunk from word 0.
    ``compress_device``'s buffer is consumed as-is (no device copy);
    shorter buffers (e.g. ``stream[:length]``) are zero-padded to the
    decoder's bound + window slack first, one concatenate.  Returns a
    ``jax.Array`` of ``shape``: float32/uint32 for 32-bit dtypes, a
    ``(lo, hi)`` uint32 plane tuple for fp64."""
    shape = tuple(shape)
    fmt.validate_shape(shape)
    wb = fmt.word_bits_for_dtype(np.dtype(dtype))
    if win is None:
        env_win = _win_from_env()
        win = env_win if env_win is not None else WIN_ROWS  # device data:
        # the header lives on-chip, so 'adaptive' falls back to worst case
    need = fmt.compressed_bound_u32(shape, wb) + (wb // 32) * WIN_ROWS * LANES
    if stream.shape[0] < need:
        stream = _pad_stream_device(stream, need)
    if wb == 64:
        return _decode_fp64_device(stream, shape, win)
    out = _decode_fp32_device(stream, shape, win)
    if np.dtype(dtype) == np.float32:
        out = jax.lax.bitcast_convert_type(out, jnp.float32)
    return out


@functools.partial(jax.jit, static_argnums=(1,))
def _pad_stream_device(stream, need):
    return jnp.concatenate(
        [stream, jnp.zeros(need - stream.shape[0], jnp.uint32)])


# =====================================================================
# host API (numpy in/out)
# =====================================================================


def _pad_for_decode(stream: np.ndarray, shape, wb: int) -> np.ndarray:
    bound = fmt.compressed_bound_u32(tuple(shape), wb)
    padded = np.zeros(bound + (wb // 32) * WIN_ROWS * LANES, dtype=np.uint32)
    padded[: stream.size] = stream
    return padded


def compress(data: np.ndarray) -> tuple[np.ndarray, int]:
    data = np.ascontiguousarray(data)
    fmt.validate_shape(data.shape)
    wb = fmt.word_bits_for_dtype(data.dtype)
    if wb == 64:
        from .ops import u64pair

        lo, hi = u64pair.split(data.view(np.uint64))
        padded, length = _encode_fp64_device(
            jnp.asarray(lo), jnp.asarray(hi), data.shape)
        length = int(length)
        return np.asarray(padded[:length]), length // 2
    words = jnp.asarray(data.view(np.uint32))
    padded, length = _encode_fp32_device(words, data.shape)
    length = int(length)
    return np.asarray(padded[:length]), length


def decompress(stream: np.ndarray, shape, dtype, win=None) -> np.ndarray:
    shape = tuple(shape)
    fmt.validate_shape(shape)
    dtype = np.dtype(dtype)
    wb = fmt.word_bits_for_dtype(dtype)
    stream = np.asarray(stream)
    mbw = max_block_words(stream, shape, wb)
    need = (mbw + 2 * (LANES - 1)) // LANES
    if win is None:
        win = _win_from_env()
        if win is None:  # NDZIP_TPU_WIN_ROWS=adaptive: bucket from header
            win = win_rows_for(mbw)
    if not 2 <= win <= WIN_ROWS:
        raise ValueError(f"win={win} outside [2, {WIN_ROWS}]")
    if win < need:
        raise ValueError(
            f"decode window of {win} rows cannot cover this stream's "
            f"largest block ({need} rows needed) — output would be "
            "silently corrupt")
    padded = _pad_for_decode(stream, shape, wb)
    if wb == 64:
        from .ops import u64pair

        lo, hi = _decode_fp64_device(jnp.asarray(padded), shape, win)
        return u64pair.join(np.asarray(lo), np.asarray(hi)).view(dtype)
    words = _decode_fp32_device(jnp.asarray(padded), shape, win)
    return np.asarray(words).view(dtype)
