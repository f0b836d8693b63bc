"""Multi-chip block-parallel encode/decode over a jax.sharding.Mesh.

The reference is single-device (SURVEY.md §2.12); this layer is the
TPU-native distributed design it lacks:

* Hypercube blocks are independent, so the block-grid's major axis is
  sharded across devices (``shard_map`` over a 1D mesh).  Shards own
  contiguous block ranges, so the canonical stream order is preserved.
* Each shard encodes its blocks locally (same kernels as single-chip) and
  returns (header entries, padded body, body length).
* Per-shard body lengths are all-gathered (one tiny ICI collective — the
  distributed analog of the reference's device-wide offset scan,
  cuda_bits.cuh:266-333); an exclusive scan gives each shard's global body
  offset; header entries are rebased by that offset.
* Assembly into ONE bit-exact stream happens with per-shard
  dynamic_update_slices at the scanned offsets (device-side), or shard by
  shard on the host for file output.

Borders are global-array property and tiny; they are gathered outside the
shard_map.  The resulting stream is byte-identical to the single-chip /
reference CPU stream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import format as fmt
from ..ops import u64pair

AXIS = "blocks"


def make_mesh(devices=None, axis_name: str = AXIS) -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis_name,))


def _shard_grid(shape, n_shards):
    """Split the block-grid's major axis into n_shards contiguous ranges.
    Requires grid[0] % n_shards == 0 (callers pad or pick mesh sizes
    accordingly).  Returns blocks per shard."""
    grid = fmt.grid_shape(shape)
    if not grid or grid[0] % n_shards != 0:
        raise ValueError(
            f"block grid {grid} major axis not divisible by {n_shards} shards")
    per_shard = fmt.num_hypercubes(shape) // n_shards
    if per_shard == 0:
        raise ValueError(
            f"shape {shape} has no whole hypercube blocks to shard; "
            "all-border grids must use a single-device codec")
    return per_shard


def _use_pallas() -> bool:
    """Per-shard kernels: fused Pallas on TPU, XLA elsewhere (including the
    virtual CPU meshes used in tests and multi-chip dry runs)."""
    import jax

    from .. import codec_pallas

    return (jax.default_backend() in ("tpu", "axon")
            and not codec_pallas.INTERPRET)


def _local_encode_parts(words_local, local_shape, dims, wb):
    """Encode one shard's blocks; returns (entries u32 (local_hc,),
    body_padded u32, body_len i32).  Body contains only hypercube bodies
    (no header, no border)."""
    from .. import codec_xla

    if _use_pallas():
        return _local_encode_parts_pallas(words_local, local_shape, dims, wb)

    local_hc = fmt.num_hypercubes(local_shape)
    if wb == 32:
        blocks = codec_xla._gather_blocks(words_local, local_shape)
        dense, valid, lengths = _encode_blocks_xla32(blocks, dims)
    else:
        lo, hi = words_local
        b_lo = codec_xla._gather_blocks(lo, local_shape)
        b_hi = codec_xla._gather_blocks(hi, local_shape)
        dense, valid, lengths = _encode_blocks_xla64(b_lo, b_hi, dims)
    offsets_after = jnp.cumsum(lengths, dtype=jnp.int32)
    body_len = offsets_after[-1]

    bound = local_hc * fmt.Profile(wb, dims).compressed_block_length_bound
    bound_u32 = bound * (wb // 32)
    flat = dense.reshape(-1)
    fvalid = valid.reshape(-1)
    dest = jnp.cumsum(fvalid.astype(jnp.int32)) - 1
    if wb == 64:
        dest = 2 * jnp.repeat(dest, 2) + jnp.tile(
            jnp.arange(2, dtype=jnp.int32), dest.shape[0])
        fvalid = jnp.repeat(fvalid, 2)
        flat = dense.reshape(-1)  # (lo, hi) pairs interleaved by the caller
    dest = jnp.where(fvalid, dest, bound_u32)
    body = jnp.zeros(bound_u32, jnp.uint32).at[dest].set(
        flat, mode="drop", unique_indices=True)
    return offsets_after.astype(jnp.uint32), body, body_len * (wb // 32)


def _local_encode_parts_pallas(words_local, local_shape, dims, wb):
    """Pallas fast path of _local_encode_parts: the fused single-pass
    encode kernel with start_word=0 emits exactly the body span this shard
    contributes to the global stream (plus per-block offset entries).

    Shard-local shapes are block-aligned by construction, so 2D/3D shards
    take the tiled-BlockSpec interior kernel (multi-block tiles DMA'd
    directly by the pipeline) — the same fast path as the single-chip
    codec — rather than a pre-pass XLA gather transpose (measured
    ~1.5-2.5 ms per 64 MiB, the round-1 sharded-encode gap)."""
    from .. import codec_pallas, codec_xla

    local_hc = fmt.num_hypercubes(local_shape)
    G = codec_pallas.G_ENC
    nb_pad = (local_hc + G - 1) // G * G
    bound = local_hc * fmt.Profile(wb, dims).compressed_block_length_bound
    bound_u32 = bound * (wb // 32)
    G_t = codec_pallas._g_tiled(local_shape, dims, G) if dims > 1 else None

    def pad(blocks):
        if nb_pad == local_hc:
            return blocks
        return jnp.concatenate(
            [blocks, jnp.zeros((nb_pad - local_hc, fmt.HC_SIZE), jnp.uint32)], 0)

    if wb == 32:
        if G_t is not None:
            body2d, hdr2d = codec_pallas._encode_interior_fp32(
                words_local, local_shape, local_hc, G_t, 0)
            G = G_t
        else:
            blocks = pad(codec_xla._gather_blocks(words_local, local_shape))
            body2d, hdr2d = codec_pallas._encode_blocks_fp32(
                blocks, dims, local_hc, 0)
        entries = hdr2d[:, :G].reshape(-1)[:local_hc]
        body = body2d.reshape(-1)
        body = body[:bound_u32] if body.shape[0] >= bound_u32 else jnp.pad(
            body, (0, bound_u32 - body.shape[0]))
        blen_u32 = jax.lax.bitcast_convert_type(entries[local_hc - 1], jnp.int32)
        return entries, body, blen_u32
    lo, hi = words_local
    if G_t is not None:
        body2d, hdr2d = codec_pallas._encode_interior_fp64(
            lo, hi, local_shape, local_hc, G_t, 0)
        G = G_t
    else:
        b_lo = pad(codec_xla._gather_blocks(lo, local_shape))
        b_hi = pad(codec_xla._gather_blocks(hi, local_shape))
        body2d, hdr2d = codec_pallas._encode_blocks_fp64(
            b_lo, b_hi, dims, local_hc, 0)
    entries = hdr2d[:, :G].reshape(-1)[:local_hc]
    body = body2d.reshape(-1)  # already the interleaved u32 stream
    body = body[:bound_u32] if body.shape[0] >= bound_u32 else jnp.pad(
        body, (0, bound_u32 - body.shape[0]))
    blen_u32 = 2 * jax.lax.bitcast_convert_type(entries[local_hc - 1], jnp.int32)
    return entries, body, blen_u32


def _encode_blocks_xla32(blocks, dims):
    from .. import codec_xla
    from ..ops import bitops

    nb = blocks.shape[0]
    t = codec_xla.block_transform_u32(blocks, dims)
    chunks = t.reshape(nb, fmt.HC_SIZE // 32, 32)
    heads = jax.lax.reduce(chunks, jnp.uint32(0), jax.lax.bitwise_or, (2,))
    transposed = bitops.transpose_bits(chunks, jnp)
    body = transposed.reshape(nb, fmt.HC_SIZE)
    dense = jnp.concatenate([heads, body], axis=1)
    valid = jnp.concatenate([jnp.ones(heads.shape, bool), body != 0], axis=1)
    lengths = valid.sum(axis=1, dtype=jnp.int32)
    return dense, valid, lengths


def _encode_blocks_xla64(b_lo, b_hi, dims):
    from .. import codec_xla
    from ..ops import bitops

    nb = b_lo.shape[0]
    heads_n = fmt.HC_SIZE // 64
    t_lo, t_hi = codec_xla.block_transform_pair(b_lo, b_hi, dims)
    c_lo = t_lo.reshape(nb, heads_n, 64)
    c_hi = t_hi.reshape(nb, heads_n, 64)
    heads_lo = jax.lax.reduce(c_lo, jnp.uint32(0), jax.lax.bitwise_or, (2,))
    heads_hi = jax.lax.reduce(c_hi, jnp.uint32(0), jax.lax.bitwise_or, (2,))
    tt_hi, tt_lo = bitops.transpose_bits_pair32(c_hi, c_lo, jnp)
    body_lo = tt_lo.reshape(nb, fmt.HC_SIZE)
    body_hi = tt_hi.reshape(nb, fmt.HC_SIZE)
    dense_lo = jnp.concatenate([heads_lo, body_lo], axis=1)
    dense_hi = jnp.concatenate([heads_hi, body_hi], axis=1)
    valid = jnp.concatenate(
        [jnp.ones((nb, heads_n), bool), (body_lo | body_hi) != 0], axis=1)
    lengths = valid.sum(axis=1, dtype=jnp.int32)
    dense = jnp.stack([dense_lo, dense_hi], axis=-1)  # interleaved pairs
    return dense, valid, lengths


def compress_sharded(data, mesh: Mesh):
    """Compress a numpy/JAX array block-parallel over ``mesh``; returns
    (stream uint32 np.ndarray, length_words).  Bit-identical to the serial
    stream."""
    from jax import shard_map

    data = np.ascontiguousarray(data) if isinstance(data, np.ndarray) else data
    shape = tuple(data.shape)
    fmt.validate_shape(shape)
    dtype = np.dtype(data.dtype)
    wb = fmt.word_bits_for_dtype(dtype)
    dims = len(shape)
    n = mesh.devices.size
    axis = mesh.axis_names[0]
    num_hc = fmt.num_hypercubes(shape)
    per_shard = _shard_grid(shape, n)
    side = fmt.SIDE_LENGTH[dims]
    grid = fmt.grid_shape(shape)
    rows_per_shard = grid[0] // n * side

    # interior region, sharded along axis 0; borders handled globally
    interior = tuple(slice(0, g * side) for g in grid)
    local_shape = (rows_per_shard,) + tuple(g * side for g in grid[1:])
    bound_local_u32 = per_shard * fmt.Profile(wb, dims).compressed_block_length_bound * (wb // 32)

    def shard_fn(words):
        if wb == 32:
            w = words[0].reshape(local_shape)
            entries, body, blen = _local_encode_parts(w, local_shape, dims, wb)
        else:
            lo = words[0].reshape(local_shape)
            hi = words[1].reshape(local_shape)
            entries, body, blen = _local_encode_parts((lo, hi), local_shape, dims, wb)
        return entries, body, blen.reshape(1)

    if dtype == np.float32:
        host_words = (np.ascontiguousarray(data).view(np.uint32)[interior],)
    else:
        w64 = np.ascontiguousarray(data).view(np.uint64)[interior]
        lo, hi = u64pair.split(np.ascontiguousarray(w64))
        host_words = (lo, hi)

    mapped = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(tuple(P(axis) for _ in host_words),),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False)  # pallas_call outputs carry no vma annotation

    sharded_in = tuple(
        jax.device_put(w, NamedSharding(mesh, P(axis))) for w in host_words)
    entries, bodies, blens = jax.jit(mapped)(sharded_in)

    # global assembly (host side — the stream is a host artifact)
    entries = np.asarray(entries).reshape(n, per_shard)
    bodies = np.asarray(bodies).reshape(n, bound_local_u32)
    blens = np.asarray(blens).reshape(n)

    word_u32 = wb // 32
    shard_word_offsets = np.concatenate([[0], np.cumsum(blens)[:-1]]) // word_u32
    header = (entries + shard_word_offsets[:, None].astype(np.uint32)).reshape(-1)

    header_u32 = fmt.header_u32_words(num_hc, wb)
    parts = [np.zeros(header_u32, np.uint32)]
    parts[0][:num_hc] = header
    for k in range(n):
        parts.append(bodies[k][: blens[k]])
    flat = (np.ascontiguousarray(data).view(
        np.uint32 if wb == 32 else np.uint64)).reshape(-1)
    for off, cnt in fmt.border_slices(shape):
        seg = np.ascontiguousarray(flat[off : off + cnt])
        parts.append(seg.view(np.uint32))
    stream = np.concatenate(parts)
    return stream, stream.size // word_u32


def decompress_sharded(stream, shape, dtype, mesh: Mesh):
    """Block-parallel decode: each shard random-accesses its block range via
    the offset table and decodes locally; output is resharded to the array.
    """
    from jax import shard_map
    from .. import codec_xla

    shape = tuple(shape)
    dtype = np.dtype(dtype)
    wb = fmt.word_bits_for_dtype(dtype)
    dims = len(shape)
    n = mesh.devices.size
    axis = mesh.axis_names[0]
    num_hc = fmt.num_hypercubes(shape)
    per_shard = _shard_grid(shape, n)
    side = fmt.SIDE_LENGTH[dims]
    grid = fmt.grid_shape(shape)
    rows_per_shard = grid[0] // n * side
    local_shape = (rows_per_shard,) + tuple(g * side for g in grid[1:])

    from .. import codec_pallas

    use_pallas = _use_pallas()
    stream = np.asarray(stream)
    bound = fmt.compressed_bound_u32(shape, wb)
    pad_extra = (wb // 32) * codec_pallas.WIN_ROWS * 128 if use_pallas else 0
    padded = np.zeros(bound + pad_extra, np.uint32)
    padded[: stream.size] = stream

    header_u32 = fmt.header_u32_words(num_hc, wb)
    offsets = stream[:num_hc].astype(np.int64)
    starts = np.concatenate([[0], offsets[:-1]]).astype(np.int32)

    heads_n = fmt.HC_SIZE // wb
    win = heads_n + fmt.HC_SIZE  # words per window
    local_hc = per_shard
    G = codec_pallas.G_DEC if wb == 32 else codec_pallas.G_DEC64
    nb_pad = (local_hc + G - 1) // G * G

    def _pallas_starts(starts_abs):
        if nb_pad != local_hc:
            starts_abs = jnp.concatenate(
                [starts_abs,
                 jnp.broadcast_to(starts_abs[local_hc - 1], (nb_pad - local_hc,))])
        return starts_abs

    def shard_fn(stream_rep, starts_local):
        # gather each local block's window and decode
        if wb == 32:
            if use_pallas:
                starts_abs = _pallas_starts(header_u32 + starts_local)
                rows = stream_rep.shape[0] // 128
                stream2d = stream_rep[: rows * 128].reshape(rows, 128)
                blocks = codec_pallas._decode_blocks_fp32(
                    stream2d, starts_abs, dims, local_hc)[:local_hc]
            else:
                idx = header_u32 + starts_local[:, None] + jnp.arange(win, dtype=jnp.int32)
                idx = jnp.minimum(idx, bound - 1)
                windows = stream_rep[idx]
                blocks = _decode_windows_xla32(windows, dims)
            words = codec_xla._scatter_blocks(
                blocks, local_shape, jnp.zeros(int(np.prod(local_shape)), jnp.uint32))
            return words.reshape(local_shape)
        else:
            if use_pallas:
                rows = stream_rep.shape[0] // 128
                stream2d = stream_rep[: rows * 128].reshape(rows, 128)
                starts_abs = _pallas_starts(header_u32 // 2 + starts_local)
                b_lo, b_hi = codec_pallas._decode_blocks_fp64(
                    stream2d, starts_abs, dims, local_hc)
                b_lo, b_hi = b_lo[:local_hc], b_hi[:local_hc]
            else:
                widx = starts_local[:, None] + jnp.arange(win, dtype=jnp.int32)
                lo_idx = jnp.minimum(header_u32 + 2 * widx, bound - 1)
                win_lo = stream_rep[lo_idx]
                win_hi = stream_rep[jnp.minimum(lo_idx + 1, bound - 1)]
                b_lo, b_hi = _decode_windows_xla64(win_lo, win_hi, dims)
            z = jnp.zeros(int(np.prod(local_shape)), jnp.uint32)
            lo = codec_xla._scatter_blocks(b_lo, local_shape, z)
            hi = codec_xla._scatter_blocks(b_hi, local_shape, z)
            return jnp.stack([lo.reshape(local_shape), hi.reshape(local_shape)], axis=-1)

    mapped = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(axis),
        check_vma=False)  # pallas_call outputs carry no vma annotation
    out_local = jax.jit(mapped)(jnp.asarray(padded), jnp.asarray(starts))

    # assemble on host: interior + border
    word_dt = np.uint32 if wb == 32 else np.uint64
    words = np.zeros(shape, dtype=word_dt)
    interior = tuple(slice(0, g * side) for g in grid)
    if wb == 32:
        words[interior] = np.asarray(out_local).reshape(
            (grid[0] * side,) + tuple(g * side for g in grid[1:]))
    else:
        pairs = np.asarray(out_local).reshape(
            (grid[0] * side,) + tuple(g * side for g in grid[1:]) + (2,))
        words[interior] = u64pair.join(pairs[..., 0], pairs[..., 1])

    body_total = int(offsets[-1]) if num_hc else 0
    bpos = header_u32 + body_total * (wb // 32)
    flat = words.reshape(-1)
    for off, cnt in fmt.border_slices(shape):
        chunk = stream[bpos : bpos + cnt * (wb // 32)]
        flat[off : off + cnt] = np.ascontiguousarray(chunk).view(word_dt)
        bpos += cnt * (wb // 32)
    return flat.reshape(shape).view(dtype)


def _decode_windows_xla32(windows, dims):
    from .. import codec_xla
    from ..ops import bitops

    nb = windows.shape[0]
    heads_n = fmt.HC_SIZE // 32
    heads = windows[:, :heads_n]
    shifts = jnp.arange(31, -1, -1, dtype=jnp.uint32)
    present = ((heads[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)).astype(jnp.int32)
    ranks = jnp.cumsum(present, axis=2) - present
    counts = present.sum(axis=2)
    chunk_starts = heads_n + jnp.cumsum(counts, axis=1) - counts
    src = chunk_starts[:, :, None] + ranks
    gathered = jnp.take_along_axis(windows, src.reshape(nb, -1), axis=1)
    transposed = jnp.where(
        present.astype(bool), gathered.reshape(nb, heads_n, 32), jnp.uint32(0))
    chunks = bitops.transpose_bits(transposed, jnp)
    return codec_xla.inverse_block_transform_u32(chunks.reshape(nb, fmt.HC_SIZE), dims)


def _decode_windows_xla64(win_lo, win_hi, dims):
    from .. import codec_xla
    from ..ops import bitops

    nb = win_lo.shape[0]
    heads_n = fmt.HC_SIZE // 64
    heads_lo = win_lo[:, :heads_n]
    heads_hi = win_hi[:, :heads_n]
    shifts = jnp.arange(31, -1, -1, dtype=jnp.uint32)
    bits_hi = (heads_hi[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    bits_lo = (heads_lo[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    present = jnp.concatenate([bits_hi, bits_lo], axis=2).astype(jnp.int32)
    ranks = jnp.cumsum(present, axis=2) - present
    counts = present.sum(axis=2)
    chunk_starts = heads_n + jnp.cumsum(counts, axis=1) - counts
    src = (chunk_starts[:, :, None] + ranks).reshape(nb, -1)
    g_lo = jnp.take_along_axis(win_lo, src, axis=1).reshape(nb, heads_n, 64)
    g_hi = jnp.take_along_axis(win_hi, src, axis=1).reshape(nb, heads_n, 64)
    pb = present.astype(bool).reshape(nb, heads_n, 64)
    tt_lo = jnp.where(pb, g_lo, jnp.uint32(0))
    tt_hi = jnp.where(pb, g_hi, jnp.uint32(0))
    c_hi, c_lo = bitops.transpose_bits_pair32(tt_hi, tt_lo, jnp)
    return codec_xla.inverse_block_transform_pair(
        c_lo.reshape(nb, fmt.HC_SIZE), c_hi.reshape(nb, fmt.HC_SIZE), dims)
