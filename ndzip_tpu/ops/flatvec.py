"""Flat-vector primitives for Pallas TPU kernels.

All arrays are laid out as (..., R, 128): a logically-flat word vector of
R*128 elements in row-major order living on (sublane, lane) tiles.  Every
primitive below is built purely from rolls, iota masks and selects — the ops
the VPU executes natively — so kernels never need gathers or scatters for
the ndzip codec's shift/scan/compaction structure.

These helpers also run under numpy semantics outside Pallas (pltpu.roll is
replaced by jnp.roll when not tracing a kernel), which lets unit tests
validate them in interpret mode.

Key algorithms:
  * shift_flat_left/right: shift the flat vector by a power-of-two amount
    (lane roll + row carry for k < 128, pure sublane roll otherwise).
  * flat_cumsum: inclusive prefix sum over the flat order (lane log-scan +
    row-total scan) — the in-kernel replacement for the reference's
    hierarchical_inclusive_scan (cuda_bits.cuh:266-333).
  * segmented ops: cumsum/diff along a strided sub-axis of the flat order,
    which implements the multidimensional Lorenzo transform on a flat
    (rows, 128) layout for every dimensionality.
  * compact_rows: in-row monotone compaction butterfly (lane rolls only).
  * merge_rows_or: monotone OR-merge butterfly over the row axis that
    assembles per-row compacted spans into the dense stream (together
    these replace warp-ballot compaction, cuda_codec.inl:185-275).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _row_col(shape):
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 2)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    return rows, cols


def _roll(x, shift, axis):
    return pltpu.roll(x, shift=shift, axis=axis)


def shift_flat_left(x, k, fill=None):
    """y[..., i] = x[..., i+k] in flat row-major order; `fill` at the end.
    k must be a power of two (or multiple of 128)."""
    if fill is None:
        fill = jnp.zeros((), x.dtype)
    R = x.shape[-2]
    rows, cols = _row_col(x.shape)
    if k % LANES == 0:
        r = k // LANES
        if r >= R:
            return jnp.full_like(x, fill)
        y = _roll(x, R - r, len(x.shape) - 2)
        return jnp.where(rows < R - r, y, fill)
    assert k < LANES
    # lane roll, then the wrapped lanes take the NEXT row's value via one
    # row roll of the already-lane-rolled array (rolls commute across
    # axes).  No separate last-row masking: the wrapped slots of the last
    # row all have flat >= R*LANES - k, which the final mask fills.
    a = _roll(x, LANES - k, len(x.shape) - 1)
    b = _roll(a, R - 1, len(x.shape) - 2)
    y = jnp.where(cols < LANES - k, a, b)
    flat = rows * LANES + cols
    return jnp.where(flat < R * LANES - k, y, fill)


def shift_flat_right(x, k, fill=None):
    """y[..., i] = x[..., i-k]; `fill` at the start.  k power of two."""
    if fill is None:
        fill = jnp.zeros((), x.dtype)
    R = x.shape[-2]
    rows, cols = _row_col(x.shape)
    if k % LANES == 0:
        r = k // LANES
        if r >= R:
            return jnp.full_like(x, fill)
        y = _roll(x, r, len(x.shape) - 2)
        return jnp.where(rows >= r, y, fill)
    assert k < LANES
    # see shift_flat_left: b = roll(a, 1, rows) reuses the lane roll, and
    # row 0's wrapped slots (flat < k) are filled by the final mask.
    a = _roll(x, k, len(x.shape) - 1)
    b = _roll(a, 1, len(x.shape) - 2)
    y = jnp.where(cols >= k, a, b)
    flat = rows * LANES + cols
    return jnp.where(flat >= k, y, fill)


def lane_cumsum(x):
    """Inclusive cumsum along the lane axis (last)."""
    _, cols = _row_col(x.shape)
    k = 1
    while k < LANES:
        x = jnp.where(cols >= k, x + _roll(x, k, len(x.shape) - 1), x)
        k <<= 1
    return x


def lane_count_prefix(x01, i8=False):
    """Inclusive in-row prefix count of a 0/1 integer array via ONE
    default-precision bf16 MXU matmul (exact: 0/1 inputs are exact in
    bf16, and counts <= 128 accumulate exactly in the f32 accumulator),
    replacing the 7 log-rounds of lane_cumsum.

    ``i8=True`` runs the same contraction as s8 x s8 -> s32 (exact
    outright: 0/1 operands, counts <= 128): 2x the MXU rate on v5e and
    none of the int->f32->bf16 operand cast passes (see codec_pallas
    I8_MM)."""
    m_r = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    m_c = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    dn = (((x01.ndim - 1,), (0,)), ((), ()))
    if i8:
        M8 = (m_r <= m_c).astype(jnp.int8)
        lane = jax.lax.dot_general(
            x01.astype(jnp.int8), M8, dn, preferred_element_type=jnp.int32)
        return lane.astype(x01.dtype)
    M = (m_r <= m_c).astype(jnp.float32).astype(jnp.bfloat16)
    xb = x01.astype(jnp.float32).astype(jnp.bfloat16)
    lane = jax.lax.dot_general(
        xb, M, dn, preferred_element_type=jnp.float32)
    return lane.astype(x01.dtype)


def flat_cumsum(x, lane_matmul=False):
    """Inclusive cumsum over the flat (R*128) order.

    The row-offset scan runs at FULL lane width (the row total broadcast to
    every lane) rather than on an (R, 1) column — thin columns waste 127/128
    of the VPU and measured ~7x slower than the full-width rounds.
    lane_matmul=True uses the bf16 MXU lane prefix (0/1 inputs only)."""
    R = x.shape[-2]
    rows, _ = _row_col(x.shape)
    lx = lane_count_prefix(x) if lane_matmul else lane_cumsum(x)
    inc = jnp.broadcast_to(lx[..., :, LANES - 1 : LANES], lx.shape)
    k = 1
    while k < R:
        rolled = _roll(inc, k, len(inc.shape) - 2)
        inc = jnp.where(rows >= k, inc + rolled, inc)
        k <<= 1
    excl = jnp.where(rows >= 1, _roll(inc, 1, len(inc.shape) - 2), 0)
    return lx + excl


def segmented_cumsum_flat(x, stride: int, seg: int):
    """Inclusive prefix sum along the strided sub-axis of the flat order:
    element i accumulates elements i - k*stride for k = 1.. while staying in
    the same segment of `seg` flat elements and the same residue class
    mod `stride`.  stride, seg are powers of two.  This implements a cumsum
    along one axis of a multidimensional block stored flat."""
    R = x.shape[-2]
    rows, cols = _row_col(x.shape)
    flat = rows * LANES + cols
    n = seg // stride  # elements along the axis
    k = 1
    while k < n:
        shifted = shift_flat_right(x, k * stride)
        ok = (flat & (seg - 1)) // stride >= k
        x = jnp.where(ok, x + shifted, x)
        k <<= 1
    return x


def segmented_diff_flat(x, stride: int, seg: int):
    """First-order difference along the strided sub-axis: x[i] -= x[i-stride]
    except at the first position of each segment axis slot."""
    R = x.shape[-2]
    rows, cols = _row_col(x.shape)
    flat = rows * LANES + cols
    shifted = shift_flat_right(x, stride)
    first = (flat & (seg - 1)) // stride == 0
    return jnp.where(first, x, x - shifted)


def segmented_diff_flat_pair(lo, hi, stride: int, seg: int):
    """64-bit segmented_diff_flat over (lo, hi) uint32 planes (wrapping
    subtraction with borrow; the TPU has no 64-bit integers)."""
    rows, cols = _row_col(lo.shape)
    flat = rows * LANES + cols
    s_lo = shift_flat_right(lo, stride)
    s_hi = shift_flat_right(hi, stride)
    d_lo = lo - s_lo
    borrow = (lo < s_lo).astype(lo.dtype)
    d_hi = hi - s_hi - borrow
    first = (flat & (seg - 1)) // stride == 0
    return jnp.where(first, lo, d_lo), jnp.where(first, hi, d_hi)


def segmented_cumsum_flat_pair(lo, hi, stride: int, seg: int):
    """64-bit segmented_cumsum_flat over (lo, hi) uint32 planes (log-depth
    scan with wrapping 64-bit adds)."""
    rows, cols = _row_col(lo.shape)
    flat = rows * LANES + cols
    n = seg // stride
    k = 1
    while k < n:
        s_lo = shift_flat_right(lo, k * stride)
        s_hi = shift_flat_right(hi, k * stride)
        a_lo = lo + s_lo
        carry = (a_lo < lo).astype(lo.dtype)
        a_hi = hi + s_hi + carry
        ok = (flat & (seg - 1)) // stride >= k
        lo = jnp.where(ok, a_lo, lo)
        hi = jnp.where(ok, a_hi, hi)
        k <<= 1
    return lo, hi


_DEAD_BIT = 1 << 30


def compact_rows(values, s):
    """In-row monotone left-compaction: every live element stays within
    its 128-lane row (shifts < 128), so each of the 7 rounds uses
    lane-only rolls with no cross-row carry.  `s` is the per-slot
    remaining left-shift (-1 dead, sentinel-bit tracked as in
    merge_rows_or); `values` may be a tuple.

    NOTE a rank binary search (7 chained data-dependent lane gathers +
    one value gather) is ~2.5% faster end-to-end for fp32 and ~15% for
    fp64 (one search routes both planes) — but Mosaic's compile time
    blows up exponentially in the gather-chain depth (>10 min for a
    fresh kernel vs ~1 min with this butterfly; a VMEM store/load
    barrier between rounds does not reset it).  Roll/select butterflies
    compile fine, so this stays the production path.

    Each round skips the roll edge mask: a wrapped partner comes from a
    lane l' < k whose remaining shift is a multiple of k (low bits
    already consumed) and <= l' < k (the destination l' - shift is
    non-negative for any valid left-compaction input), hence exactly 0 —
    its round bit is always clear, so it can never read as incoming.
    Dead slots carry _DEAD_BIT (bit 30), clear at every round bit k <
    128.  `ss - k` is `ss ^ k` because an incoming slot has bit k set."""
    single = not isinstance(values, tuple)
    vals = (values,) if single else values
    dead = jnp.full((), _DEAD_BIT, s.dtype)
    s = jnp.where(s < 0, dead, s)
    k = 1
    while k < LANES:
        ss = _roll(s, LANES - k, s.ndim - 1)               # s[l + k]
        incoming = (ss & k) != 0
        move = (s & k) != 0
        vals = tuple(jnp.where(incoming, _roll(v, LANES - k, v.ndim - 1), v)
                     for v in vals)
        s = jnp.where(incoming, ss ^ k, jnp.where(move, dead, s))
        k <<= 1
    return (vals[0] if single else vals), s


def merge_rows_or(values, s, max_shift=None):
    """Monotone upward ROW compaction with OR-merge on equal destinations.

    `values`: tuple of (R, 128) planes; `s`: (R, 128) int32 per-slot upward
    shift (row - dest_row), -1 for dead slots.  Lane columns are fully
    independent row butterflies; within each lane the live destinations
    must be non-decreasing over rows, and slots with equal destinations OR
    together (they occupy disjoint lanes in the kernels' use, so the OR is
    collision-free).  LSB->MSB rounds of sublane rolls; at round k all
    remaining live shifts are multiples of k, so a mover landing on a live
    stayer has the same destination (remaining shifts equal — the merged
    slot keeps routing correctly) and vacated slots go dead (replaced, not
    OR'd, by any later arrival).

    `max_shift` (optional int32 scalar): a runtime upper bound on every
    live shift in `s`.  Rounds k >= 64 whose bit cannot occur are skipped
    via lax.cond — in the encode kernels the shifts are the rows saved by
    compression, so at typical ratios the top rounds never fire (an
    all-zero step still takes them; the bound makes that exact, not
    heuristic).

    Dead slots are ZEROED up front and kept zero, which collapses the
    per-plane round update to base = move ? 0 : v; v = incoming ?
    base | v_in : base — a mover that vacates leaves 0 behind, so an
    arrival never needs a separate live-stayer test (OR with 0 is the
    replacement case).

    As in compact_rows, rounds skip the roll edge mask: a wrapped
    partner comes from a row r' < k whose remaining upward shift is a
    multiple of k and <= r' (destination row r' - shift >= 0), hence 0 —
    its round bit is always clear.  _DEAD_BIT (bit 30) is clear at every
    round bit (k <= R < 2^30), and `ss - k` is `ss ^ k`."""
    R = s.shape[-2]
    dead = jnp.full((), _DEAD_BIT, s.dtype)
    vals = tuple(jnp.where(s < 0, jnp.zeros((), v.dtype), v) for v in values)
    s = jnp.where(s < 0, dead, s)
    k = 1
    while k < R:
        def round_k(vals_s, k=k):
            vals, s = vals_s[:-1], vals_s[-1]
            ss = _roll(s, R - k, s.ndim - 2)               # s[r + k]
            incoming = (ss & k) != 0
            move = (s & k) != 0
            new_vals = []
            for v in vals:
                v_in = _roll(v, R - k, v.ndim - 2)
                base = jnp.where(move, jnp.zeros((), v.dtype), v)
                new_vals.append(jnp.where(incoming, base | v_in, base))
            s = jnp.where(incoming, ss ^ k, jnp.where(move, dead, s))
            return (*new_vals, s)
        if max_shift is not None and k >= 64:
            vals_s = jax.lax.cond(max_shift >= k, round_k,
                                  lambda t: t, (*vals, s))
        else:
            vals_s = round_k((*vals, s))
        vals, s = vals_s[:-1], vals_s[-1]
        k <<= 1
    return vals


