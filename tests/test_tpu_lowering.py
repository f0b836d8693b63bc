"""Cross-platform TPU lowering smoke: `jax.export(..., platforms=["tpu"])`
runs the Pallas -> Mosaic MLIR lowering locally (no TPU, no tunnel), which
is where Mosaic op-support errors surface — unsupported shape casts,
broadcasts, gathers wider than a lane tile (the divergence class interpret
mode cannot catch; see the verify skill's real-TPU section).  The full
Mosaic -> LLO backend compile still only happens on hardware
(`make test-tpu`), but every kernel/profile/G combination lowering clean
here has its op mix validated.

Each export costs ~0.5 s, so the whole matrix stays cheap.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import export

from ndzip_tpu import codec_pallas, format as fmt


@pytest.fixture(autouse=True)
def _compiled_mode(monkeypatch):
    # test_pallas.py flips the module-global INTERPRET at import; lowering
    # must run the real Mosaic path regardless of test ordering.
    monkeypatch.setattr(codec_pallas, "INTERPRET", False)


def _lower(fn, *specs):
    exp = export.export(jax.jit(fn), platforms=["tpu"])(*specs)
    assert len(exp.mlir_module()) > 0


def u32(shape):
    return jax.ShapeDtypeStruct(tuple(shape), jnp.uint32)


def dec_spec(shape, wb):
    bound = fmt.compressed_bound_u32(tuple(shape), wb)
    return u32((bound + (wb // 32) * codec_pallas.WIN_ROWS * codec_pallas.LANES,))


FP32_SHAPES = [
    ((2**20,), "1d flat"),
    ((4096 * 8 + 100,), "1d border"),
    ((128, 512), "2d tiled"),
    ((1800, 3600), "2d padded decode (CESM)"),
    ((128, 192), "2d gather fallback"),
    ((16, 32, 128), "3d tiled"),
    ((17, 32, 129), "3d tiled + border"),
]

FP64_SHAPES = [
    ((2**19,), "1d"),
    ((128, 128), "2d"),
    ((32, 16, 128), "3d"),
]


@pytest.mark.parametrize("shape,label", FP32_SHAPES)
def test_lowering_fp32(shape, label):
    _lower(lambda w: codec_pallas._encode_fp32_device(w, shape), u32(shape))
    _lower(lambda s: codec_pallas._decode_fp32_device(s, shape),
           dec_spec(shape, 32))


@pytest.mark.parametrize("shape,label", FP64_SHAPES)
def test_lowering_fp64(shape, label):
    _lower(lambda lo, hi: codec_pallas._encode_fp64_device(lo, hi, shape),
           u32(shape), u32(shape))
    _lower(lambda s: codec_pallas._decode_fp64_device(s, shape),
           dec_spec(shape, 64))


@pytest.mark.parametrize("g", [8, 16, 24, 32])
def test_lowering_g_variants(monkeypatch, g):
    """Every grid-batch size the selectors can now choose (multiples of 8
    including non-powers-of-two) lowers clean for encode and decode."""
    monkeypatch.setattr(codec_pallas, "G_ENC", g)
    monkeypatch.setattr(codec_pallas, "G_DEC", g)
    shape = (128, 64 * g)  # 2D grid minor = g: tiles exactly at G=g
    assert codec_pallas._g_tiled(shape, 2, g) == g
    _lower(lambda w: codec_pallas._encode_fp32_device(w, shape), u32(shape))
    _lower(lambda s: codec_pallas._decode_fp32_device(s, shape),
           dec_spec(shape, 32))


@pytest.mark.parametrize("win", list(codec_pallas.WIN_BUCKETS))
def test_lowering_win_buckets(win):
    """Every adaptive decode-window bucket lowers clean (flat + tiled,
    both dtypes) — each (shape, G, win) combination is a distinct Mosaic
    kernel."""
    _lower(lambda s: codec_pallas._decode_fp32_device(s, (2**20,), win),
           dec_spec((2**20,), 32))
    _lower(lambda s: codec_pallas._decode_fp32_device(s, (128, 512), win),
           dec_spec((128, 512), 32))
    _lower(lambda s: codec_pallas._decode_fp64_device(s, (2**19,), win),
           dec_spec((2**19,), 64))
