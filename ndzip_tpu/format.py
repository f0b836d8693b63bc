"""ndzip stream-format geometry and layout math.

This module is the single source of truth for the ndzip stream format used by
every backend (numpy golden codec, C++ native codec, XLA codec, Pallas
kernels).  It contains only integer math — no array frameworks — so it can be
imported by host-side tooling without pulling in JAX.

Format summary (reference: /root/reference/src/ndzip/common.hh:328-393 and
/root/reference/src/ndzip/cpu_codec.inl:541-578):

* A grid of 1-3 dimensions of float32/float64 is partitioned into hypercube
  blocks of side length 4096 (1D), 64 (2D) or 16 (3D) — always 4096 elements
  per block (common.hh:368-381).
* The compressed stream is, in order:
    [header][hypercube bodies][border elements]
  - header: ``num_hypercubes`` uint32 entries; entry i is the cumulative
    word count ("offset after") of bodies 0..i, in units of the word type
    (uint32 for float, uint64 for double).  The header byte length is padded
    up to word alignment (common.hh:350-358).
  - each body: ``hc_size / word_bits`` head words first, then for each chunk
    of ``word_bits`` consecutive words (in order) whose head is nonzero, the
    nonzero bit-transposed words of that chunk, compacted in order
    (cpu_codec.inl:541-559).
  - border: grid elements not covered by a whole block, bit-cast verbatim in
    ``for_each_border_slice`` order (common.hh:245-306).
* Per-block transform before chunking: rotate-left-1 of each word, then a
  first-order difference along each axis (axis order below), then
  complement-negative sign mapping (common.hh:436-501).

All functions below take ``shape`` as a tuple of ints (first-major, i.e. the
reference's ``extent`` order) and ``word_bits`` in {32, 64}.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Iterator

MAX_DIMENSIONALITY = 3

#: Hypercube side length per dimensionality (common.hh:368-381).
SIDE_LENGTH = {1: 4096, 2: 64, 3: 16}

#: Elements per hypercube — equal for every dimensionality.
HC_SIZE = 4096

#: Forward-difference axis order of the block transform per dimensionality
#: (common.hh:469-501).  The inverse transform applies prefix sums along the
#: reversed order.
FORWARD_AXIS_ORDER = {1: (0,), 2: (1, 0), 3: (1, 2, 0)}


def word_bits_for_dtype(dtype) -> int:
    import numpy as np

    dt = np.dtype(dtype)
    if dt == np.float32 or dt == np.uint32 or dt == np.int32:
        return 32
    if dt == np.float64 or dt == np.uint64 or dt == np.int64:
        return 64
    raise ValueError(f"unsupported dtype {dt}; ndzip compresses float32/float64 grids")


@dataclass(frozen=True)
class Profile:
    """Binds (word width, dimensionality) — the analog of detail::profile
    (common.hh:383-393).  Six instances exist: {32,64} x {1,2,3}."""

    word_bits: int  # 32 or 64
    dims: int  # 1..3

    def __post_init__(self):
        assert self.word_bits in (32, 64)
        assert 1 <= self.dims <= MAX_DIMENSIONALITY

    @property
    def side_length(self) -> int:
        return SIDE_LENGTH[self.dims]

    @property
    def hc_size(self) -> int:
        return HC_SIZE

    @property
    def word_bytes(self) -> int:
        return self.word_bits // 8

    @property
    def heads_per_block(self) -> int:
        """Number of head-bitmap words per block (= number of chunks)."""
        return HC_SIZE // self.word_bits

    @property
    def compressed_block_length_bound(self) -> int:
        """Max words per compressed block: heads + all chunk words nonzero
        (common.hh:391-392)."""
        return HC_SIZE // self.word_bits * (self.word_bits + 1)

    @property
    def block_shape(self) -> tuple[int, ...]:
        return (self.side_length,) * self.dims


def profile_for(dtype, dims: int) -> Profile:
    return Profile(word_bits_for_dtype(dtype), dims)


def num_hypercubes(shape: tuple[int, ...]) -> int:
    side = SIDE_LENGTH[len(shape)]
    n = 1
    for s in shape:
        n *= s // side
    return n


def grid_shape(shape: tuple[int, ...]) -> tuple[int, ...]:
    """Number of whole blocks along each axis."""
    side = SIDE_LENGTH[len(shape)]
    return tuple(s // side for s in shape)


def hypercube_origins(shape: tuple[int, ...]) -> Iterator[tuple[int, ...]]:
    """Yield block origin coordinates in canonical (row-major block-grid)
    order — the order of for_each_hypercube (common.hh:414-433)."""
    side = SIDE_LENGTH[len(shape)]
    grid = grid_shape(shape)

    def rec(prefix: tuple[int, ...], d: int):
        if d == len(shape):
            yield prefix
            return
        for i in range(grid[d]):
            yield from rec(prefix + (i * side,), d + 1)

    yield from rec((), 0)


def header_u32_entries(num_hc: int) -> int:
    return num_hc


def header_words(num_hc: int, word_bits: int) -> int:
    """Header length in stream words (uint32 entries padded to word
    alignment; common.hh:350-352)."""
    word_bytes = word_bits // 8
    header_bytes = num_hc * 4
    padded = (header_bytes + word_bytes - 1) // word_bytes * word_bytes
    return padded // word_bytes


def header_u32_words(num_hc: int, word_bits: int) -> int:
    """Header length in uint32 units (including the zero pad entry for
    64-bit profiles with odd block counts; cuda_codec.inl:446-452)."""
    return header_words(num_hc, word_bits) * (word_bits // 32)


def linear_index(shape: tuple[int, ...], pos: tuple[int, ...]) -> int:
    idx = 0
    for s, p in zip(shape, pos):
        idx = idx * s + p
    return idx


def num_elements(shape: tuple[int, ...]) -> int:
    return math.prod(shape)


def border_slices(shape: tuple[int, ...]) -> list[tuple[int, int]]:
    """Enumerate the (linear offset, element count) runs of border elements
    in stream order (common.hh:245-282).

    Border elements are those outside any whole block.  If any axis is
    shorter than the side length the entire array is border.
    """
    dims = len(shape)
    side = SIDE_LENGTH[dims]

    for s in shape:
        if s // side == 0:
            # whole array is border (common.hh:272-276)
            return [(0, num_elements(shape))]

    smallest_dim_with_border = None
    for d in range(dims):
        if shape[d] % side != 0:
            smallest_dim_with_border = d  # last assignment wins (largest d)
    if smallest_dim_with_border is None:
        return []

    out: list[tuple[int, int]] = []

    def rec(pos: list[int], d: int):
        border_begin = shape[d] // side * side
        border_end = shape[d]
        if d < smallest_dim_with_border:
            for p in range(border_begin):
                pos2 = list(pos)
                pos2[d] = p
                rec(pos2, d + 1)
        if border_begin < border_end:
            begin_pos = list(pos)
            begin_pos[d] = border_begin
            end_pos = list(pos)
            end_pos[d] = border_end
            offset = linear_index(shape, tuple(begin_pos))
            count = linear_index(shape, tuple(end_pos)) - offset
            out.append((offset, count))

    rec([0] * dims, 0)
    return out


def border_element_count(shape: tuple[int, ...]) -> int:
    """common.hh:308-317."""
    side = SIDE_LENGTH[len(shape)]
    n_cube = 1
    n_all = 1
    for s in shape:
        n_cube *= s // side * side
        n_all *= s
    return n_all - n_cube


def compressed_bound_words(shape: tuple[int, ...], word_bits: int) -> int:
    """Upper bound of the compressed stream length in stream words
    (common.cc:31-52)."""
    num_hc = num_hypercubes(shape)
    p = Profile(word_bits, len(shape))
    return (
        header_words(num_hc, word_bits)
        + num_hc * p.compressed_block_length_bound
        + border_element_count(shape)
    )


def compressed_bound_u32(shape: tuple[int, ...], word_bits: int) -> int:
    return compressed_bound_words(shape, word_bits) * (word_bits // 32)


def validate_shape(shape: tuple[int, ...]):
    if not 1 <= len(shape) <= MAX_DIMENSIONALITY:
        raise ValueError(f"ndzip supports 1-{MAX_DIMENSIONALITY} dimensions, got {len(shape)}")
    for s in shape:
        if s < 0:
            raise ValueError(f"negative extent in shape {shape}")
