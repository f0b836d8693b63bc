#!/usr/bin/env python
"""Developer tool: chained-device-time probe for an arbitrary shape/dtype
(run on the real TPU).

Times one compress + one decompress of a synthetic smooth field (the
CESM-like profile: slowly varying 2D/3D structure plus small noise) at the
given shape via benchmark.chained_device_times — the same dispatch-free
two-point fori_loop slope protocol bench.py uses.  This is the tool for
checking named BASELINE.json configs (e.g. the 1800x3600 unaligned-minor
2D decode) without staging real dataset files.

Run:  python dev/shape_probe.py --shape 1800x3600 [--dtype float] [--reps 10,50]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def smooth_field(shape, dtype, seed=7):
    """Slowly-varying separable waves + 1e-3 noise: compresses at ratios
    comparable to the reference's climate/simulation datasets."""
    rng = np.random.default_rng(seed)
    axes = [np.linspace(0.0, 40.0 + 3.0 * i, s) for i, s in enumerate(shape)]
    field = np.ones(shape, np.float64)
    for i, ax in enumerate(axes):
        view = [None] * len(shape)
        view[i] = slice(None)
        field = field * np.sin(ax)[tuple(view)]
    field = field + 1e-3 * rng.standard_normal(shape)
    return field.astype(dtype)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--shape", required=True, help="e.g. 1800x3600")
    p.add_argument("--dtype", default="float", choices=["float", "double"])
    p.add_argument("--backend", default="pallas")
    p.add_argument("--reps", default="10,50")
    args = p.parse_args(argv)

    from ndzip_tpu.benchmark import chained_device_times

    shape = tuple(int(s) for s in args.shape.split("x"))
    dtype = np.float32 if args.dtype == "float" else np.float64
    data = smooth_field(shape, dtype)

    from ndzip_tpu import golden

    _, length = golden.compress(data)
    wb = data.dtype.itemsize
    ratio = length * 4 / data.nbytes

    chains = tuple(int(c) for c in args.reps.split(","))
    t0 = time.time()
    enc_ns, dec_ns = chained_device_times(data, backend=args.backend,
                                          chains=chains)
    gb = data.nbytes / 1e9
    print(f"shape={shape} dtype={np.dtype(dtype).name} ratio={ratio:.4f} "
          f"(wall {time.time() - t0:.0f}s incl. compile)")
    print(f"compress   {enc_ns/1e6:8.3f} ms  {gb/(enc_ns/1e9):7.2f} GB/s")
    print(f"decompress {dec_ns/1e6:8.3f} ms  {gb/(dec_ns/1e9):7.2f} GB/s")


if __name__ == "__main__":
    main()
