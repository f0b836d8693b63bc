#!/usr/bin/env python
"""Developer tool: absolute-floor probe for the fused encode kernel's IO
pipeline (run on the real TPU).

The stage-ablation probe (kernel_stage_probe.py) attributes compute stages
but leaves the pipeline cost (input BlockSpec DMAs, staging writes, output
DMAs + waits, per-step overhead) unaccounted.  This tool times stripped
kernels with the SAME grid / in_specs / out_specs / DMA structure as
_encode_blocks_fp32 and varying compute:

  floor    load -> trivial xor -> staging -> DMA out (single buffer,
           wait at next step top — the production round-1 structure)
  dbuf     same, but double-buffered staging so DMA k overlaps step k+1
  compute  floor + transform + transpose + heads (no compaction)

Run:  python dev/enc_floor_probe.py [--g 8] [--mb 64]
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
    p.add_argument("--g", type=int, default=8)
    p.add_argument("--mb", type=float, default=64.0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ndzip_tpu import codec_pallas as cp, format as fmt

    G = args.g
    LANES = 128
    R = 1 + G * 33
    n = int(args.mb * (1 << 20)) // 4
    num_hc = n // fmt.HC_SIZE
    nsteps = num_hc // G
    shape = (num_hc * fmt.HC_SIZE,)
    bound_rows = (num_hc + num_hc * (128 + fmt.HC_SIZE) + LANES - 1) // LANES + R + 2

    def make_kernel(mode):
        nbuf = 2 if mode == "dbuf" else 1

        def kernel(blocks_ref, body_ref, staging, sm, sem):
            step = pl.program_id(0)
            buf = step % nbuf

            @pl.when(step == 0)
            def _():
                sm[0] = 0

            @pl.when(step >= nbuf)
            def _():
                pltpu.make_async_copy(
                    staging.at[buf], body_ref.at[pl.ds(0, R)], sem).wait()

            xf = blocks_ref[0].reshape(G, 32, LANES)
            if mode == "compute":
                xf = cp.forward_transform_flat(xf, 1)
                body = cp.transpose_bits_lane32(xf)
                heads_rows = cp.head_row_from_h1(cp.heads_via_matmul(body))
                dense = jnp.concatenate([heads_rows, body], axis=1)
            else:
                dense = jnp.concatenate(
                    [xf[:, :1] ^ jnp.uint32(step), xf], axis=1)
            flat_rows = dense.reshape(G * 33, LANES)
            staging[pl.ds(buf, 1), pl.ds(1, G * 33)] = flat_rows[None]
            off_row = sm[0]
            pltpu.make_async_copy(
                staging.at[buf], body_ref.at[pl.ds(off_row, R)], sem).start()
            sm[0] = off_row + (R * 2) // 3  # emulate ~66% occupancy advance

            @pl.when(step == nsteps - 1)
            def _():
                pltpu.make_async_copy(
                    staging.at[buf], body_ref.at[pl.ds(0, R)], sem).wait()

        return kernel, nbuf

    def build(mode):
        kernel, nbuf = make_kernel(mode)

        @jax.jit
        def run(blocks):
            return pl.pallas_call(
                kernel,
                grid=(nsteps,),
                in_specs=[pl.BlockSpec((1, G * 32, LANES), lambda g: (g, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                out_shape=jax.ShapeDtypeStruct((bound_rows, LANES), jnp.uint32),
                scratch_shapes=[
                    pltpu.VMEM((nbuf, R, LANES), jnp.uint32),
                    pltpu.SMEM((1,), jnp.int32),
                    pltpu.SemaphoreType.DMA(()),
                ],
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
            )(blocks.reshape(nsteps, G * 32, LANES))

        return run

    rng = np.random.default_rng(0)
    words = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))

    def timed(run):
        def loop(reps):
            @jax.jit
            def f(w):
                def bodyf(i, acc):
                    out = run(w ^ i.astype(jnp.uint32))
                    return acc + jax.lax.bitcast_convert_type(out[0, 0], jnp.int32)
                return jax.lax.fori_loop(0, reps, bodyf, jnp.int32(0))
            return f

        def t(f):
            int(f(words))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                int(f(words))
                best = min(best, time.perf_counter() - t0)
            return best

        return (t(loop(R2)) - t(loop(R1))) / (R2 - R1)

    for mode in ("floor", "dbuf", "compute"):
        ms = timed(build(mode)) * 1e3
        print(f"{mode:<8} {ms:8.3f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
