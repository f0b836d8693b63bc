#!/usr/bin/env python
"""Developer tool: measure the 3D tile<->block rearrangement variants on
the real TPU — static lane gathers (production round 1) vs the XOR
cell-swap butterfly (tile_to_blocks_3d_bfly) — in isolated Pallas kernels
over a bench-scale grid.

The adapters run once per kernel step in the tiled 3D encode (load) and
decode (store); the fp64 stage probe attributed ~0.7 ms/64 MiB to the
store side, making this the largest 3D-specific cost.

Run:  python dev/tile_xpose_probe.py [--g 16] [--steps 256]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

R1, R2 = 10, 50


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--g", type=int, default=16)
    p.add_argument("--steps", type=int, default=256)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from ndzip_tpu import codec_pallas as cp

    G, nsteps = args.g, args.steps
    mb = nsteps * G * 16 * 1024 * 4 / (1 << 20)
    print(f"# G={G} steps={nsteps} ({mb:.0f} MiB working set)")

    variants = {
        "3d_t2b_gather": (cp.tile_to_blocks_3d, (16, 16, G * 16), (G, 32, 128)),
        "3d_t2b_bfly": (cp.tile_to_blocks_3d_bfly, (16, 16, G * 16), (G, 32, 128)),
        "3d_b2t_gather": (cp.blocks_to_tile_3d, (G, 32, 128), (16, 16, G * 16)),
        "3d_b2t_bfly": (cp.blocks_to_tile_3d_bfly, (G, 32, 128), (16, 16, G * 16)),
        "2d_t2b_gather": (cp.tile_to_blocks_2d, (64, G * 64), (G, 32, 128)),
        "2d_t2b_bfly": (cp.tile_to_blocks_2d_bfly, (64, G * 64), (G, 32, 128)),
        "2d_b2t_gather": (cp.blocks_to_tile_2d, (G, 32, 128), (64, G * 64)),
        "2d_b2t_bfly": (cp.blocks_to_tile_2d_bfly, (G, 32, 128), (64, G * 64)),
    }

    rng = np.random.default_rng(0)

    def build(fn, in_shape, out_shape):
        def kernel(x_ref, o_ref):
            o_ref[:] = fn(x_ref[:].reshape(in_shape), G).reshape(o_ref.shape)

        flat_in = (nsteps,) + (int(np.prod(in_shape[:-1])), in_shape[-1])
        flat_out = (nsteps,) + (int(np.prod(out_shape[:-1])), out_shape[-1])

        @jax.jit
        def run(x):
            return pl.pallas_call(
                kernel,
                grid=(nsteps,),
                in_specs=[pl.BlockSpec((1,) + flat_in[1:], lambda g: (g, 0, 0))],
                out_specs=pl.BlockSpec((1,) + flat_out[1:], lambda g: (g, 0, 0)),
                out_shape=jax.ShapeDtypeStruct(flat_out, jnp.uint32),
                interpret=cp.INTERPRET,
            )(x)

        x = jnp.asarray(rng.integers(0, 2**32, size=flat_in, dtype=np.uint32))
        return run, x

    def timed(run, x):
        def loop(reps):
            @jax.jit
            def f(w):
                def body(i, acc):
                    out = run(w ^ i.astype(jnp.uint32))
                    return acc + jax.lax.bitcast_convert_type(
                        out[0, 0, 0], jnp.int32)
                return jax.lax.fori_loop(0, reps, body, jnp.int32(0))
            return f

        def t(f):
            int(f(x))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                int(f(x))
                best = min(best, time.perf_counter() - t0)
            return best

        return (t(loop(R2)) - t(loop(R1))) / (R2 - R1)

    for name, (fn, in_shape, out_shape) in variants.items():
        run, x = build(fn, in_shape, out_shape)
        ms = timed(run, x) * 1e3
        print(f"{name:<12} {ms:8.3f} ms  ({mb / ms:7.1f} GB/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
