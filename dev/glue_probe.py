"""Measure the XLA glue cost around the 1D fp32 decode pallas kernel:
full _decode_fp32_device (incl. _scatter_blocks_xla copy) vs the
pallas_call alone, both timed with the two-point chained-loop method
(bench.py preamble).  For aligned 1D shapes the flat block layout IS
row-major output order, so any difference is pure XLA copy traffic."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from ndzip_tpu import codec_pallas as cp, golden, format as fmt

R1, R2 = 10, 50


def timed(loop, arg):
    int(loop(arg))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        int(loop(arg))
        best = min(best, time.perf_counter() - t0)
    return best


def slope(make_loop, arg):
    t1 = timed(make_loop(R1), arg)
    t2 = timed(make_loop(R2), arg)
    return (t2 - t1) / (R2 - R1)


def main():
    shape = (2**24,)
    rng = np.random.default_rng(0)
    data = (np.sin(np.arange(shape[0], dtype=np.float32) * 1e-4)
            + 0.001 * rng.standard_normal(shape[0]).astype(np.float32))
    stream, length = golden.compress(data)
    num_hc = fmt.num_hypercubes(shape)
    nbytes = data.nbytes

    win = cp.win_rows_for(cp.max_block_words(stream, shape, 32))
    G = cp.G_DEC
    print("win bucket:", win, "G_DEC:", G)

    sp = jnp.asarray(cp._pad_for_decode(stream, shape, 32))

    offsets = np.asarray(stream[:num_hc]).astype(np.int64)
    starts = (np.concatenate([[0], offsets[:-1]]).astype(np.int32) + num_hc)
    nb_pad = (num_hc + G - 1) // G * G
    if nb_pad != num_hc:
        starts = np.concatenate(
            [starts, np.full(nb_pad - num_hc, starts[-1], np.int32)])
    starts_j = jnp.asarray(starts)
    rows = sp.shape[0] // 128
    stream2d_const = sp[: rows * 128].reshape(rows, 128)

    def make_full(reps):
        @jax.jit
        def loop(s):
            def body(i, carry):
                s_, acc = carry
                s_ = jax.lax.dynamic_update_slice(
                    s_, i.astype(jnp.uint32)[None], (s_.shape[0] - 1,))
                w = cp._decode_fp32_device(s_, shape, win)
                return s_, acc + jax.lax.bitcast_convert_type(
                    w.reshape(-1)[0].astype(jnp.uint32), jnp.int32)
            return jax.lax.fori_loop(0, reps, body, (s, jnp.int32(0)))[1]
        return loop

    def make_pallas(reps):
        @jax.jit
        def loop(s2):
            def body(i, carry):
                s_, acc = carry
                s_ = jax.lax.dynamic_update_slice(
                    s_, i.astype(jnp.uint32)[None, None], (s_.shape[0] - 1, 0))
                b = cp._decode_blocks_fp32(s_, starts_j, 1, num_hc, win)
                return s_, acc + jax.lax.bitcast_convert_type(
                    b[0, 0].astype(jnp.uint32), jnp.int32)
            return jax.lax.fori_loop(0, reps, body, (s2, jnp.int32(0)))[1]
        return loop

    t_full = slope(make_full, sp)
    t_pal = slope(make_pallas, stream2d_const)
    print(f"full decode : {t_full*1e3:.3f} ms -> {nbytes/t_full/1e9:.1f} GB/s")
    print(f"pallas only : {t_pal*1e3:.3f} ms -> {nbytes/t_pal/1e9:.1f} GB/s")
    print(f"glue cost   : {(t_full-t_pal)*1e3:.3f} ms")


if __name__ == "__main__":
    main()
