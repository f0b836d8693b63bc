#!/usr/bin/env python
"""Developer tool: split the fused-codec step into Pallas-kernel time vs
XLA glue (header splice, bound slice, border gather) by timing the bare
pallas_call against the full device function on identical data.

Run:  python dev/enc_glue_probe.py [--mb 64]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

R1, R2 = 10, 50


def _slope(make):
    def t(f, *a):
        int(f(*a))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(f(*a))
            best = min(best, time.perf_counter() - t0)
        return best

    f1, a1 = make(R1)
    f2, a2 = make(R2)
    return (t(f2, *a2) - t(f1, *a1)) / (R2 - R1)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mb", type=float, default=64.0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ndzip_tpu import codec_pallas as cp, format as fmt

    n = int(args.mb * (1 << 20)) // 4
    shape = (n,)
    num_hc = n // fmt.HC_SIZE
    rng = np.random.default_rng(0)
    data = (np.sin(np.arange(n, dtype=np.float32) * 1e-4)
            + 0.001 * rng.standard_normal(n).astype(np.float32))
    words = jnp.asarray(data.view(np.uint32))

    def full(reps):
        @jax.jit
        def loop(w):
            def body(i, acc):
                pd, ln = cp._encode_fp32_device(w ^ i.astype(jnp.uint32), shape)
                return acc + ln + jax.lax.bitcast_convert_type(pd[0], jnp.int32)
            return jax.lax.fori_loop(0, reps, body, jnp.int32(0))
        return loop, (words,)

    def bare(reps):
        @jax.jit
        def loop(w):
            def body(i, acc):
                blocks = (w ^ i.astype(jnp.uint32)).reshape(num_hc, fmt.HC_SIZE)
                body2d, hdr2d = cp._encode_blocks_fp32(blocks, 1, num_hc)
                return (acc + jax.lax.bitcast_convert_type(body2d[0, 0], jnp.int32)
                        + jax.lax.bitcast_convert_type(hdr2d[0, 0], jnp.int32))
            return jax.lax.fori_loop(0, reps, body, jnp.int32(0))
        return loop, (words,)

    t_full = _slope(full) * 1e3
    t_bare = _slope(bare) * 1e3
    print(f"full device fn  {t_full:8.3f} ms")
    print(f"bare kernel     {t_bare:8.3f} ms")
    print(f"xla glue        {t_full - t_bare:8.3f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
