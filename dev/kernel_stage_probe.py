#!/usr/bin/env python
"""Developer tool: in-kernel stage cost attribution for the fused Pallas
codec kernels (run on the real TPU).

The per-stage microbench (ndzip_tpu/ubench.py) times standalone ops; the
fused kernels' internal stage split can only be measured by ABLATION:
stub one stage (monkeypatch it to an identity of the same shape), rebuild
the jit cache, and re-time the end-to-end kernel — the delta is that
stage's cost.  Output is corrupt under every stub, so only timing (never
correctness) is read.  Interactions between stages make the attributions
approximate; treat them as a ranking, not a budget that sums to total.

This is the tool that found the encode merge split and the decode
one-hot-select cost (see docs/architecture.md's measured table history).

Run:  python dev/kernel_stage_probe.py [--which enc|dec] [--mb 64]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

R1, R2 = 10, 50


def _timed(make, *args):
    import jax

    def t(loop, *a):
        int(loop(*a))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(loop(*a))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(make(R2), *args) - t(make(R1), *args)) / (R2 - R1)


def _enc_probe(shape):
    import jax
    import jax.numpy as jnp

    from ndzip_tpu import codec_pallas as cp
    from ndzip_tpu.ops import flatvec as fv

    rng = np.random.default_rng(0)
    n = shape[0]
    data = (np.sin(np.arange(n, dtype=np.float32) * 1e-4)
            + 0.001 * rng.standard_normal(n).astype(np.float32))
    words = jnp.asarray(data.view(np.uint32))

    def run():
        def make(reps):
            @jax.jit
            def loop(w):
                def body(i, acc):
                    p, ln = cp._encode_fp32_device(w ^ i.astype(jnp.uint32), shape)
                    return acc + ln + jax.lax.bitcast_convert_type(p[0], jnp.int32)
                return jax.lax.fori_loop(0, reps, body, jnp.int32(0))
            return loop
        return _timed(make, words)

    stubs = [
        ("transform", cp, "forward_transform_flat", lambda xf, dims: xf),
        ("transpose", cp, "transpose_bits_lane32", lambda a: a),
        ("heads", cp, "heads_via_matmul", lambda body: body),
        ("inrow_bfly", fv, "compact_rows", lambda values, s: (values, s)),
        ("rowmerge", fv, "merge_rows_or",
         lambda values, s, max_shift=None: values),
        ("lanecnt", fv, "lane_count_prefix",
         lambda v, **k: jnp.broadcast_to(jnp.ones_like(v), v.shape)),
        ("rowscan", cp, "_row_prefix_excl", lambda x, nrows: x),
        ("rotgather", cp, "rotate_rows_to_offset",
         lambda planes, j, can: planes),
    ]
    return run, stubs


def _dec_probe(shape):
    import jax
    import jax.numpy as jnp

    from ndzip_tpu import codec_pallas as cp, format as fmt, golden
    from ndzip_tpu.ops import flatvec as fv

    rng = np.random.default_rng(0)
    n = shape[0]
    data = (np.sin(np.arange(n, dtype=np.float32) * 1e-4)
            + 0.001 * rng.standard_normal(n).astype(np.float32))
    g, gl = golden.compress(data)
    hs = np.zeros(fmt.compressed_bound_u32(shape, 32) + cp.WIN_ROWS * 128,
                  np.uint32)
    hs[:gl] = g[:gl]
    sd = jnp.asarray(hs)

    win = cp._win_from_env() or cp.win_rows_for(
        cp.max_block_words(hs, shape, 32))

    def run():
        def make(reps):
            @jax.jit
            def loop(s):
                def body(i, carry):
                    s_, acc = carry
                    s_ = jax.lax.dynamic_update_slice(
                        s_, i.astype(jnp.uint32)[None], (s_.shape[0] - 1,))
                    w = cp._decode_fp32_device(s_, shape, win)
                    return s_, acc + jax.lax.bitcast_convert_type(
                        w.reshape(-1)[0], jnp.int32)
                return jax.lax.fori_loop(0, reps, body, (s, jnp.int32(0)))[1]
            return loop
        return _timed(make, sd)

    stubs = [
        ("transpose", cp, "transpose_bits_lane32", lambda a: a),
        ("invtransform", cp, "inverse_transform_flat", lambda xf, dims: xf),
        ("headspread", cp, "head_spread_to_flat",
         lambda hr, G: jnp.broadcast_to(hr, (G, 32, 128))),
        ("rowselect", cp, "_select_window_rows",
         lambda P, w: jnp.zeros(P.shape[:2] + (128,), jnp.uint32)),
        ("lanecnt", fv, "lane_count_prefix",
         lambda v, **k: jnp.broadcast_to(jnp.ones_like(v), v.shape)),
        ("rowprefix", cp, "_row_prefix_excl", lambda x, nr, **k: x),
    ]
    return run, stubs


def main(argv=None):
    import jax

    p = argparse.ArgumentParser()
    p.add_argument("--which", choices=("enc", "dec"), default="enc")
    p.add_argument("--mb", type=float, default=64.0)
    args = p.parse_args(argv)
    shape = (int(args.mb * (1 << 20)) // 4,)

    run, stubs = (_enc_probe if args.which == "enc" else _dec_probe)(shape)
    jax.clear_caches()
    base = run()
    print(f"base          {base * 1e3:8.3f} ms")
    for name, mod, attr, stub in stubs:
        orig = getattr(mod, attr)
        setattr(mod, attr, stub)
        jax.clear_caches()
        try:
            t = run()
        finally:
            setattr(mod, attr, orig)
        print(f"-{name:<12} {t * 1e3:8.3f} ms  (stage {(base - t) * 1e3:6.3f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
