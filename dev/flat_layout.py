#!/usr/bin/env python
"""Developer tool: visualize/verify the flat (rows, 128) block layout the
Pallas kernels rely on — the TPU analog of the reference's bank-conflict
simulator (/root/reference/dev/gpu_hc_access.py).

The kernels assume, per (word_bits, dims) profile:
  * a block's 4096 words live flat at (row = w // 128, lane = w % 128);
  * chunk c (32 words fp32 / 64 words fp64) is one aligned 32/64-lane
    segment, so the bit transpose and head OR are segment-local;
  * the Lorenzo transform along each axis is a strided segmented
    shift on the flat order (codec_pallas.TRANSFORM_AXES).

Run:  python dev/flat_layout.py [--dims 2] [--word-bits 32]
Prints the axis->(stride, segment) table, checks it against the format
module's axis order, and shows which lanes a chunk / an axis-neighbor
touches (useful when changing layouts or adding profiles).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from ndzip_tpu import format as fmt
from ndzip_tpu.codec_pallas import TRANSFORM_AXES

LANES = 128


def axis_params(dims):
    """Derive (stride, segment) per forward axis from first principles and
    compare with TRANSFORM_AXES."""
    side = fmt.SIDE_LENGTH[dims]
    strides = [side ** (dims - 1 - d) for d in range(dims)]
    derived = []
    for axis in fmt.FORWARD_AXIS_ORDER[dims]:
        stride = strides[axis]
        seg = stride * side
        derived.append((stride, seg))
    return tuple(derived)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dims", type=int, default=2, choices=(1, 2, 3))
    p.add_argument("--word-bits", type=int, default=32, choices=(32, 64))
    args = p.parse_args(argv)
    dims, wb = args.dims, args.word_bits
    side = fmt.SIDE_LENGTH[dims]
    chunk = wb

    print(f"profile: {wb}-bit, {dims}D  side={side}  hc_size={fmt.HC_SIZE}")
    print(f"flat layout: word w -> (row w//128, lane w%128); "
          f"{fmt.HC_SIZE // 128} rows per block plane")

    derived = axis_params(dims)
    table = TRANSFORM_AXES[dims]
    ok = derived == table
    print(f"\ntransform axes (forward order {fmt.FORWARD_AXIS_ORDER[dims]}):")
    for (st, sg), (st2, sg2) in zip(derived, table):
        print(f"  stride={st:>4} segment={sg:>5}   "
              f"{'OK' if (st, sg) == (st2, sg2) else f'MISMATCH vs table ({st2},{sg2})'}")
    if not ok:
        print("ERROR: TRANSFORM_AXES disagrees with the derived parameters")
        return 1

    print(f"\nchunk geometry ({chunk} words per chunk, "
          f"{fmt.HC_SIZE // chunk} chunks per block):")
    for c in (0, 1, fmt.HC_SIZE // chunk - 1):
        w0 = c * chunk
        r0, l0 = divmod(w0, LANES)
        r1, l1 = divmod(w0 + chunk - 1, LANES)
        seg_ok = r0 == r1 and l0 % chunk == 0
        print(f"  chunk {c:>3}: rows {r0}..{r1}, lanes {l0}..{l1 + 1}  "
              f"{'segment-aligned OK' if seg_ok else 'NOT ALIGNED!'}")

    # neighbor distance per axis in flat words (what the segmented shifts move)
    print("\naxis-neighbor flat distances (== transform strides):")
    coords = np.indices((side,) * dims).reshape(dims, -1).T
    flat = np.ravel_multi_index(coords.T, (side,) * dims)
    for axis in range(dims):
        nb = coords.copy()
        nb[:, axis] += 1
        m = nb[:, axis] < side
        d = np.unique(np.ravel_multi_index(nb[m].T, (side,) * dims) - flat[m])
        print(f"  axis {axis}: distance(s) {d}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
