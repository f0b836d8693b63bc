"""Pallas kernel tests in interpreter mode (CPU).  Real-TPU runs are
exercised by bench.py and the verify flow; these tests validate kernel
logic (bit-equality vs golden) without TPU hardware."""

import numpy as np
import pytest

from ndzip_tpu import codec_pallas, golden

codec_pallas.INTERPRET = True

RNG = np.random.default_rng(11)

SHAPES = [
    ((4096 * 8,), "1d"),
    ((4096 * 8 + 100,), "1d border"),
    ((128, 192), "2d"),
    ((32, 32, 33), "3d border"),
    ((128, 512), "2d tiled fast path"),
    ((130, 513), "2d tiled + border"),
    ((16, 32, 128), "3d tiled fast path"),
    ((17, 32, 129), "3d tiled + border"),
]


def make_data(shape):
    data = RNG.standard_normal(shape).astype(np.float32)
    flat = data.reshape(-1)
    flat[:200] = 0
    flat[300:340] = flat[299]
    return data


@pytest.mark.parametrize("shape,label", SHAPES)
def test_pallas_encode_matches_golden(shape, label):
    data = make_data(shape)
    g, gl = golden.compress(data)
    s, l = codec_pallas.compress(data)
    assert l == gl
    assert s.tobytes() == g.tobytes()


@pytest.mark.parametrize("shape,label", SHAPES)
def test_pallas_decodes_golden(shape, label):
    data = make_data(shape)
    g, _ = golden.compress(data)
    out = codec_pallas.decompress(g, shape, np.float32)
    assert np.array_equal(out.view(np.uint32), data.view(np.uint32))


def test_pallas_all_zero_blocks():
    data = np.zeros((4096 * 8,), np.float32)
    g, gl = golden.compress(data)
    s, l = codec_pallas.compress(data)
    assert l == gl and s.tobytes() == g.tobytes()
    out = codec_pallas.decompress(s, data.shape, np.float32)
    assert np.array_equal(out, data)


SHAPES64 = [
    ((4096 * 8,), "1d"),
    ((4096 * 3 + 1,), "1d border, odd block count"),
    ((128, 70), "2d border"),
    ((16, 32, 32), "3d"),
    ((128, 512), "2d tiled fast path"),
    ((17, 16, 128), "3d tiled + axis-0 border"),
]


def make_data64(shape):
    data = RNG.standard_normal(shape)
    flat = data.reshape(-1)
    flat[:200] = 0
    flat[300:340] = flat[299]
    return data


@pytest.mark.parametrize("shape,label", SHAPES64)
def test_pallas_fp64_encode_matches_golden(shape, label):
    data = make_data64(shape)
    g, gl = golden.compress(data)
    s, l = codec_pallas.compress(data)
    assert l == gl
    assert s.tobytes() == g.tobytes()


@pytest.mark.parametrize("shape,label", SHAPES64)
def test_pallas_fp64_decodes_golden(shape, label):
    data = make_data64(shape)
    g, _ = golden.compress(data)
    out = codec_pallas.decompress(g, shape, np.float64)
    assert np.array_equal(out.view(np.uint64), data.view(np.uint64))


def test_pallas_fp64_all_zero_blocks():
    data = np.zeros((4096 * 8,), np.float64)
    g, gl = golden.compress(data)
    s, l = codec_pallas.compress(data)
    assert l == gl and s.tobytes() == g.tobytes()
    out = codec_pallas.decompress(s, data.shape, np.float64)
    assert np.array_equal(out, data)


def test_pallas_non_power_of_two_g(monkeypatch):
    """_g_tiled/_g_tiled_padded step G down by 8 (not halving), so
    non-power-of-two grid-batch sizes like 24 must trace and round-trip:
    the tile adapters slice 8-block groups and accept any multiple of 8."""
    monkeypatch.setattr(codec_pallas, "G_ENC", 24)
    monkeypatch.setattr(codec_pallas, "G_DEC", 24)
    # minor block grid = 192/64 * 8 = 24 blocks wide? 2D side=64:
    # shape (128, 64*24) -> grid (2, 24): 24 % 24 == 0 tiles at G=24.
    shape = (128, 64 * 24)
    assert codec_pallas._g_tiled(shape, 2, codec_pallas.G_ENC) == 24
    data = make_data(shape)
    g, gl = golden.compress(data)
    s, l = codec_pallas.compress(data)
    assert l == gl and s.tobytes() == g.tobytes()
    out = codec_pallas.decompress(g, shape, np.float32)
    assert np.array_equal(out.view(np.uint32), data.view(np.uint32))


def test_pallas_exact_g_above_knob_roundtrip(monkeypatch):
    """The decode G policy may pick an EXACT minor-axis tiling larger
    than G_DEC (zero fake blocks, fewer grid steps — the CESM win); the
    compiled path must round-trip bit-exactly at that batch size."""
    monkeypatch.setattr(codec_pallas, "G_DEC", 8)
    shape = (64, 64 * 24)  # grid (1, 24): exact G=24 > G_DEC=8
    assert codec_pallas._g_tiled_padded(
        shape, 2, 8, exact_cap=codec_pallas.G_EXACT_CAP) == (24, 1)
    data = make_data(shape)
    g, gl = golden.compress(data)
    out = codec_pallas.decompress(g, shape, np.float32)
    assert np.array_equal(out.view(np.uint32), data.view(np.uint32))


@pytest.mark.parametrize("dt", [np.float32, np.float64])
def test_pallas_adaptive_win_roundtrip(dt):
    """Decode with the smallest window bucket the stream's header allows
    (win_rows_for) is bit-exact, as is every larger bucket."""
    shape = (4096 * 3 + 50,)
    smooth = np.sin(np.arange(shape[0]) * 1e-3)
    data = (smooth + 1e-4 * RNG.standard_normal(shape)).astype(dt)
    g, _ = golden.compress(data)
    wb = 64 if dt == np.float64 else 32
    win = codec_pallas.win_rows_for(codec_pallas.max_block_words(g, shape, wb))
    assert win < codec_pallas.WIN_ROWS  # smooth data must hit a smaller bucket
    wdt = np.uint64 if dt == np.float64 else np.uint32
    for w in sorted({win, codec_pallas.WIN_ROWS}):
        out = codec_pallas.decompress(g, shape, dt, win=w)
        assert np.array_equal(out.view(wdt), data.view(wdt)), f"win={w}"


def test_win_rows_for_buckets():
    assert codec_pallas.win_rows_for(0) == codec_pallas.WIN_BUCKETS[0]
    assert codec_pallas.win_rows_for(4096 + 128) == codec_pallas.WIN_ROWS
    for b in codec_pallas.WIN_BUCKETS:
        # the largest block a bucket claims to cover actually fits it
        max_l = b * 128 - 254
        assert codec_pallas.win_rows_for(max_l) == b


def test_decompress_rejects_undersized_win():
    data = RNG.standard_normal(4096).astype(np.float32)  # incompressible
    g, _ = golden.compress(data)
    with pytest.raises(ValueError, match="cannot cover"):
        codec_pallas.decompress(g, data.shape, np.float32, win=2)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_decode_at_exact_minimal_window(seed):
    """Decode with win = the exact row count the stream needs (tighter
    than any bucket) must stay bit-exact — stresses the start-rotation
    coverage math of win_rows_for."""
    rng = np.random.default_rng(400 + seed)
    shape = (4096 * 3 + 11,)
    styles = [
        np.sin(np.arange(shape[0]) * 1e-3),
        np.repeat(rng.standard_normal(shape[0] // 97 + 1), 97)[: shape[0]],
        rng.standard_normal(shape[0]) * (rng.random(shape[0]) < 0.1),
    ]
    data = styles[seed].astype(np.float32)
    g, _ = golden.compress(data)
    need = (codec_pallas.max_block_words(g, shape, 32)
            + 2 * (codec_pallas.LANES - 1)) // codec_pallas.LANES
    win = max(2, need)
    out = codec_pallas.decompress(g, shape, np.float32, win=win)
    assert np.array_equal(out.view(np.uint32), data.view(np.uint32))
    if win > 2:  # one row fewer must be rejected by the host validator
        with pytest.raises(ValueError, match="cannot cover"):
            codec_pallas.decompress(g, shape, np.float32, win=win - 1)


@pytest.mark.parametrize("i8", [False, True])
@pytest.mark.parametrize("dt", [np.float32, np.float64])
def test_pallas_i8_matmul_paths(monkeypatch, i8, dt):
    """Both MXU arithmetic variants of the byte-quartered matmuls (bf16
    u8-quarters vs bias-folded s8 contractions, NDZIP_TPU_I8_MM) are
    bit-exact: decode row select, lane count prefix, and the lane-segment
    cumsums of the inverse transform all switch together.  Shapes are
    unique per (i8, dt) so each combination traces fresh kernels."""
    monkeypatch.setattr(codec_pallas, "I8_MM", i8)
    base = 4096 * 2 + (21 if dt == np.float32 else 57) + (4 if i8 else 0)
    shape = (base,)
    smooth = np.sin(np.arange(shape[0]) * 1e-3)
    data = (smooth + 1e-3 * RNG.standard_normal(shape)).astype(dt)
    data[:100] = 0
    g, gl = golden.compress(data)
    s, l = codec_pallas.compress(data)
    assert l == gl and s.tobytes() == g.tobytes()
    out = codec_pallas.decompress(g, shape, dt)
    wdt = np.uint64 if dt == np.float64 else np.uint32
    assert np.array_equal(out.view(wdt), data.view(wdt))
