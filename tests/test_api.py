"""Public-API surface tests: factories, offloader, requirements
(reference surface: include/ndzip/ndzip.hh:228-269, offload.hh:8-71)."""

import numpy as np
import pytest

from ndzip_tpu import api


def test_unknown_backend_raises():
    with pytest.raises(ValueError, match="unknown backend"):
        api.make_compressor(np.float32, 1, backend="cuda")


def test_dtype_and_dims_validation():
    with pytest.raises(ValueError):
        api.make_compressor(np.int8, 1, backend="golden")
    with pytest.raises(ValueError):
        api.make_compressor(np.float32, 4, backend="golden")
    comp = api.make_compressor(np.float32, 2, backend="golden")
    with pytest.raises(ValueError, match="dimensionality"):
        comp.compress(np.zeros(16, np.float32))
    with pytest.raises(ValueError, match="dtype"):
        comp.compress(np.zeros((4, 4), np.float64))


def test_requirements_accumulate_and_validate():
    req = api.CompressorRequirements((4096,), (8192,))
    assert req.max_num_hypercubes == 2
    req.include((4096 * 5,))
    assert req.max_num_hypercubes == 5
    with pytest.raises(ValueError, match="dimensionality"):
        req.include((64, 64))


def test_requirements_precompile_xla():
    shape = (4096 * 2 + 7,)
    req = api.CompressorRequirements(shape)
    comp = api.make_compressor(np.float32, 1, backend="xla", requirements=req)
    data = np.sin(np.arange(shape[0], dtype=np.float32))
    stream, words = comp.compress(data)
    dec = api.make_decompressor(np.float32, 1, backend="xla")
    out = dec.decompress(stream, shape)
    assert np.array_equal(out, data)


def test_offloader_round_trip_and_timing():
    data = np.sin(np.arange(4096 * 3 + 5, dtype=np.float32))
    off = api.make_offloader("golden", np.float32, 1)
    stream, words = off.compress(data)
    assert off.timing.compress_ns > 0
    out = off.decompress(stream, data.shape)
    assert off.timing.decompress_ns > 0
    assert np.array_equal(out, data)
    assert off.compressed_length_bound(data.shape) >= words


def test_offloader_backend_resolution():
    off = api.make_offloader("auto", np.float64, 2)
    assert off.backend in ("pallas", "xla", "cpu", "golden")
    data = np.ones((70, 66), np.float64)
    stream, _ = off.compress(data)
    assert np.array_equal(off.decompress(stream, data.shape), data)
