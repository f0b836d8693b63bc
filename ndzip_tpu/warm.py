"""Compile-cache warming tool — the deployment answer to JIT compile cost.

The reference ships AOT-compiled kernels (cuda_factory.cu) and pays no
first-call compile; a jitted TPU codec pays 1-10+ minutes of Mosaic
compile per fresh (shape, dtype, G) combination.  This tool populates the
persistent XLA compilation cache (``NDZIP_TPU_CACHE_DIR``) for a planned
set of shapes at the peak-throughput grid-batch config, so production
processes get peak-G throughput with a <~5 s first-call load instead of
the compile wall:

    NDZIP_TPU_CACHE_DIR=/var/cache/ndzip python -m ndzip_tpu.warm \
        --shapes 1073741824 512x512x512 --dtype float double --peak

``--peak`` pins the bench-grade grid batches (G_ENC=16, G_DEC=32 fp32 /
16 fp64) before the codec module loads; without it the compile-friendly
defaults are warmed.  Each (shape, dtype) warms both encode and decode.

Measured on v5e (64 MiB fp32 1D, fresh process): first compress of a
cold shape ~1-10 min (Mosaic compile); same shape from a warmed cache
~2-4 s (cache load + trace).
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def _parse_shape(s: str) -> tuple:
    try:
        return tuple(int(x) for x in s.replace(",", "x").split("x") if x)
    except ValueError:
        raise argparse.ArgumentTypeError(f"bad shape {s!r}; use e.g. 512x512x512")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="ndzip-tpu-warm",
        description="pre-populate the persistent compile cache for planned shapes")
    p.add_argument("--shapes", nargs="+", type=_parse_shape, required=True,
                   metavar="DxDxD", help="array extents, e.g. 16777216 1800x3600")
    p.add_argument("--dtype", nargs="+", choices=["float", "double"],
                   default=["float"], help="dtypes to warm (default: float)")
    p.add_argument("--peak", action="store_true",
                   help="warm at the peak-throughput grid batches "
                        "(G_ENC=16, G_DEC=32/16) instead of the defaults")
    p.add_argument("--win-rows", type=int, default=None,
                   help="also warm the decode at this adaptive window "
                        "bucket (codec_pallas.WIN_BUCKETS); default warms "
                        "only the worst-case window")
    p.add_argument("--cache-dir", default=None,
                   help="cache directory (default: $NDZIP_TPU_CACHE_DIR)")
    return p


def run(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.peak:
        # must precede the codec import: G knobs are read at module load
        os.environ.setdefault("NDZIP_TPU_G_ENC", "16")
        os.environ.setdefault("NDZIP_TPU_G_DEC", "32")
        os.environ.setdefault("NDZIP_TPU_G_DEC64", "16")
    if args.cache_dir:
        os.environ["NDZIP_TPU_CACHE_DIR"] = args.cache_dir
    if not os.environ.get("NDZIP_TPU_CACHE_DIR"):
        print("warning: NDZIP_TPU_CACHE_DIR not set — warming only this "
              "process's in-memory jit cache", file=sys.stderr)

    import numpy as np

    from . import format as fmt, utils

    utils.maybe_enable_compilation_cache()
    import jax

    if jax.default_backend() in ("tpu", "axon"):
        from . import codec_pallas as codec

        print(f"warming pallas kernels: G_ENC={codec.G_ENC} "
              f"G_DEC={codec.G_DEC} G_DEC64={codec.G_DEC64}", file=sys.stderr)
    else:
        from . import codec_xla as codec

        print(f"warming xla codec on {jax.default_backend()} "
              "(no TPU attached)", file=sys.stderr)
    rc = 0
    for shape in args.shapes:
        for tname in args.dtype:
            dtype = np.float32 if tname == "float" else np.float64
            try:
                fmt.validate_shape(shape)
            except ValueError as e:
                print(f"skip {shape} {tname}: {e}", file=sys.stderr)
                rc = 1
                continue
            t0 = time.perf_counter()
            data = np.zeros(shape, dtype)
            stream, _ = codec.compress(data)
            t1 = time.perf_counter()
            out = codec.decompress(stream, shape, dtype)
            if args.win_rows is not None and hasattr(codec, "WIN_BUCKETS"):
                # additionally warm the requested adaptive bucket (the
                # default warm above covers the worst-case window)
                out = codec.decompress(stream, shape, dtype,
                                       win=args.win_rows)
            t2 = time.perf_counter()
            ok = np.array_equal(out.view(np.uint8).reshape(-1),
                                data.view(np.uint8).reshape(-1))
            print(f"warmed {'x'.join(map(str, shape))} {tname}: "
                  f"encode {t1 - t0:.1f}s decode {t2 - t1:.1f}s"
                  f"{'' if ok else '  ROUND-TRIP MISMATCH'}", file=sys.stderr)
            if not ok:
                rc = 1
    return rc


def main():
    sys.exit(run())


if __name__ == "__main__":
    main()
