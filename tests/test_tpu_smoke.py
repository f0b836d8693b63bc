"""Real-hardware smoke suite: Mosaic-compiled kernel behavior on the TPU.

The main test suite runs the Pallas kernels in interpret mode on CPU;
interpret-vs-Mosaic divergences (gather semantics, layout choices) are a
documented hazard of this codebase, so the compiled kernels need their own
regression gate — this file.  Run it with

    make test-tpu        # == NDZIP_TPU_TESTS_TPU=1 pytest tests/test_tpu_smoke.py

on a machine with a TPU attached.  Shapes are kept small and few (each
fresh (shape-class, G) costs minutes of Mosaic compile on first run; set
NDZIP_TPU_CACHE_DIR to make repeat runs take seconds).  Every path class
of the device codec is covered: flat 1D, tiled 2D/3D BlockSpec IO, the
padded tiled decode (fake blocks), the XLA-gather fallback, borders, both
dtypes, the sharded per-shard encode, and the public device API.

These tests are skipped automatically when no TPU backend is active (the
default CPU-pinned test run).
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

if not os.environ.get("NDZIP_TPU_TESTS_TPU"):
    pytest.skip("TPU smoke suite runs only under make test-tpu "
                "(NDZIP_TPU_TESTS_TPU=1)", allow_module_level=True)
if jax.default_backend() not in ("tpu", "axon"):
    pytest.skip(f"no TPU backend (default_backend={jax.default_backend()})",
                allow_module_level=True)

from ndzip_tpu import api, codec_pallas, golden  # noqa: E402
from ndzip_tpu.ops import u64pair  # noqa: E402

RNG = np.random.default_rng(23)

assert codec_pallas.INTERPRET is False


def make_data(shape, dtype=np.float32):
    data = RNG.standard_normal(shape).astype(dtype)
    flat = data.reshape(-1)
    flat[: min(200, flat.size)] = 0
    if flat.size > 340:
        flat[300:340] = flat[299]
    return data


# One shape per compiled-path class (comments name the path under test).
CASES = [
    ((4096 * 16 + 33,), np.float32),   # flat 1D + border tail
    ((192, 256), np.float32),          # tiled 2D BlockSpec IO
    ((130, 200), np.float32),          # padded tiled decode + 2D borders
    ((32, 32, 64), np.float32),        # tiled 3D
    ((4096 * 8 + 9,), np.float64),     # fp64 1D plane pair + border
    ((17, 18, 35), np.float64),        # fp64 3D padded/fallback + borders
]


@pytest.mark.parametrize("shape,dtype", CASES,
                         ids=[f"{s}-{np.dtype(d).name}" for s, d in CASES])
def test_mosaic_roundtrip_matches_golden(shape, dtype):
    data = make_data(shape, dtype)
    g, gl = golden.compress(data)
    s, l = codec_pallas.compress(data)
    assert l == gl
    assert s.tobytes() == g.tobytes()
    out = codec_pallas.decompress(s, shape, dtype)
    assert np.array_equal(out.view(np.uint8).reshape(-1),
                          data.view(np.uint8).reshape(-1))


def test_merge_gate_extremes_on_hardware():
    """Both branches of the encode merge's runtime round gate, on the
    SAME compiled kernel as the flat-1D case above (no extra compile):
    all-zero data maximizes the per-step shift bound (every gated round
    fires), i.i.d. uniform mantissa bits are near-incompressible (bound
    ~0, every gated round is skipped).  Streams must equal golden's
    either way."""
    shape = (4096 * 16 + 33,)
    zero = np.zeros(shape, np.float32)
    dense = RNG.integers(0, 2**32, shape, dtype=np.uint32).view(np.float32)
    for data in (zero, dense):
        g, gl = golden.compress(data)
        s, l = codec_pallas.compress(data)
        assert l == gl and s.tobytes() == g.tobytes()
        out = codec_pallas.decompress(s, shape, np.float32)
        assert np.array_equal(out.view(np.uint32), data.view(np.uint32))


def test_device_api_on_hardware():
    import jax.numpy as jnp

    shape = (4096 * 16 + 33,)
    data = make_data(shape)
    stream, length = api.compress_device(jnp.asarray(data))
    g, gl = golden.compress(data)
    assert int(length) == gl
    assert np.asarray(stream[: int(length)]).tobytes() == g.tobytes()
    out = api.decompress_device(stream, shape)
    assert np.array_equal(np.asarray(out), data)


def test_sharded_encode_parts_on_hardware():
    """The per-shard body-only encode (start_word=0) on the real kernels —
    single-device mesh, but the same code path multi-chip runs take."""
    from ndzip_tpu.parallel import compress_sharded, make_mesh

    mesh = make_mesh(jax.devices()[:1])
    data = make_data((192, 256))
    stream, length = compress_sharded(data, mesh)
    expect, elen = golden.compress(data)
    assert length == elen and stream.tobytes() == expect.tobytes()


def test_offloader_device_timing_on_hardware():
    data = make_data((4096 * 16 + 33,))
    off = api.Offloader(np.float32, 1, backend="pallas", timing_mode="device")
    stream, words = off.compress(data)
    assert off.timing.compress_ns > 0
    out = off.decompress(stream, data.shape)
    assert off.timing.decompress_ns > 0
    assert np.array_equal(out, data)


def test_adaptive_window_on_hardware():
    """Decode at the stream's adaptive window bucket on the compiled
    Mosaic path (one extra (shape, G, win) compile) — bit-equal to the
    worst-case-window decode of the same stream."""
    shape = (4096 * 8 + 9,)
    data = make_data(shape)
    g, _ = golden.compress(data)
    win = codec_pallas.win_rows_for(codec_pallas.max_block_words(g, shape, 32))
    assert win <= codec_pallas.WIN_ROWS
    out = codec_pallas.decompress(g, shape, np.float32, win=win)
    assert np.array_equal(out.view(np.uint32), data.view(np.uint32))


def test_sharded_device_resident_on_hardware():
    """compress_sharded_device -> decompress_sharded_device on the real
    kernels (single-device mesh; payload stays on the chip)."""
    import jax.numpy as jnp

    from ndzip_tpu.parallel import (
        compress_sharded_device,
        decompress_sharded_device,
        make_mesh,
    )

    mesh = make_mesh(jax.devices()[:1])
    shape = (4096 * 8 + 9,)
    data = make_data(shape)
    expect, elen = golden.compress(data)
    stream_dev, length_dev = compress_sharded_device(jnp.asarray(data), mesh)
    length = int(length_dev)
    assert length == elen
    assert np.asarray(stream_dev[:length]).tobytes() == expect.tobytes()
    out = decompress_sharded_device(stream_dev[:length], shape,
                                    np.float32, mesh)
    assert np.array_equal(np.asarray(out).view(np.uint32),
                          data.view(np.uint32))
