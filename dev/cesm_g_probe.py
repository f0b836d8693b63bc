#!/usr/bin/env python
"""Developer tool: CESM (1800x3600 fp32) decode/encode G sweep on the
real TPU.

The 2D block grid is 28x56; gm=56 means G in {8, 56} tiles EXACTLY
(zero fake blocks) while 16/32 pad to 64 slots (14% fake work).  The
round-4 border-box rebuild measured 37.4 GB/s at G_DEC=16 — this probe
answers whether the exact-tiling Gs beat it and which G the library's
shape-aware policy should pick.

Run:  python dev/cesm_g_probe.py [--gs 8,16,56] [--enc-gs 8]
"""

from __future__ import annotations

import argparse
import importlib
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

R1, R2 = 10, 50
SHAPE = (1800, 3600)


def make_data():
    rng = np.random.default_rng(0)
    y = np.linspace(0, 11.0, SHAPE[0], dtype=np.float64)[:, None]
    x2 = np.linspace(0, 7.0, SHAPE[1], dtype=np.float64)[None, :]
    return (np.sin(y) * np.cos(x2)
            + 0.001 * rng.standard_normal(SHAPE)).astype(np.float32)


def timed(loop, arg):
    best = float("inf")
    int(loop(arg))
    for _ in range(3):
        t0 = time.perf_counter()
        int(loop(arg))
        best = min(best, time.perf_counter() - t0)
    return best


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--gs", default="8,16,56")
    p.add_argument("--enc-gs", default="")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ndzip_tpu import utils
    utils.enable_compilation_cache()

    data = make_data()
    nbytes = data.nbytes

    from ndzip_tpu import codec_pallas as cp, golden
    g_stream, g_len = golden.compress(data)

    for G in [int(x) for x in args.gs.split(",") if x]:
        cp.G_DEC = G
        importlib.reload  # no-op; G is read at trace time
        try:
            s_x, l_x = cp.compress(data)
            win = cp.win_rows_for(cp.max_block_words(s_x, SHAPE, 32))
            out = cp.decompress(s_x, SHAPE, np.float32, win=win)
            assert np.array_equal(out.view(np.uint32), data.view(np.uint32))
            s_dev = jnp.asarray(cp._pad_for_decode(s_x, SHAPE, 32))

            def make_loop(reps, win=win):
                @jax.jit
                def loop(s):
                    def body(i, carry):
                        s_, acc = carry
                        s_ = jax.lax.dynamic_update_slice(
                            s_, i.astype(jnp.uint32)[None], (s_.shape[0] - 1,))
                        w = cp._decode_fp32_device(s_, SHAPE, win)
                        return s_, acc + jax.lax.bitcast_convert_type(
                            w.reshape(-1)[0].astype(jnp.uint32), jnp.int32)
                    return jax.lax.fori_loop(0, reps, body, (s, jnp.int32(0)))[1]
                return loop

            t1 = timed(make_loop(R1), s_dev)
            t2 = timed(make_loop(R2), s_dev)
            t = (t2 - t1) / (R2 - R1)
            tc = cp._g_tiled_padded(SHAPE, 2, G)
            print(f"dec G={G:3d} tiling={tc} : {nbytes / t / 1e9:7.3f} GB/s"
                  f"  ({t * 1e3:.3f} ms)", flush=True)
        except Exception as e:
            print(f"dec G={G:3d} FAILED: {type(e).__name__}: {e}"[:300],
                  flush=True)
        finally:
            jax.clear_caches()

    for G in [int(x) for x in args.enc_gs.split(",") if x]:
        cp.G_ENC = G
        try:
            words = jnp.asarray(data.view(np.uint32))

            def make_eloop(reps):
                @jax.jit
                def loop(w):
                    def body(i, acc):
                        p, ln = cp._encode_fp32_device(
                            w ^ i.astype(jnp.uint32), SHAPE)
                        return acc + ln + jax.lax.bitcast_convert_type(
                            p[0], jnp.int32)
                    return jax.lax.fori_loop(0, reps, body, jnp.int32(0))
                return loop

            s_x, l_x = cp.compress(data)
            assert l_x == g_len and s_x[:l_x].tobytes() == g_stream.tobytes()
            t1 = timed(make_eloop(R1), words)
            t2 = timed(make_eloop(R2), words)
            t = (t2 - t1) / (R2 - R1)
            print(f"enc G={G:3d} : {nbytes / t / 1e9:7.3f} GB/s"
                  f"  ({t * 1e3:.3f} ms)", flush=True)
        except Exception as e:
            print(f"enc G={G:3d} FAILED: {type(e).__name__}: {e}"[:300],
                  flush=True)
        finally:
            jax.clear_caches()
    return 0


if __name__ == "__main__":
    sys.exit(main())
