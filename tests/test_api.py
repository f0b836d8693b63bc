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


def test_device_api_roundtrip_fp32():
    """compress_device/decompress_device keep data on-device end to end
    (cuda.hh:10-41 analog) and the stream is bit-identical to golden."""
    import jax
    import jax.numpy as jnp

    from ndzip_tpu import codec_pallas, golden

    prev_interpret = codec_pallas.INTERPRET
    codec_pallas.INTERPRET = True
    try:
        data = np.sin(np.arange(4096 * 2 + 9, dtype=np.float32) * 0.01)
        dev = jnp.asarray(data)
        stream, length = api.compress_device(dev)
        assert isinstance(stream, jax.Array) and isinstance(length, jax.Array)
        g, gl = golden.compress(data)
        assert int(length) == gl
        assert np.asarray(stream[: int(length)]).tobytes() == g.tobytes()

        out = api.decompress_device(stream, data.shape, np.float32)
        assert isinstance(out, jax.Array)
        assert out.dtype == jnp.float32
        assert np.array_equal(np.asarray(out), data)

        # compress_device's buffer is already decode-ready: it carries the
        # decoder's window slack, so the round trip involves no device
        # reallocation (the documented zero-copy contract)
        from ndzip_tpu import format as fmt
        need = fmt.compressed_bound_u32(data.shape, 32) + \
            codec_pallas.WIN_ROWS * codec_pallas.LANES
        assert stream.shape[0] >= need

        # short (exact-length) streams are padded internally
        out2 = api.decompress_device(stream[: int(length)], data.shape)
        assert np.array_equal(np.asarray(out2), data)
    finally:
        codec_pallas.INTERPRET = prev_interpret


def test_device_api_roundtrip_fp64_planes():
    import jax.numpy as jnp

    from ndzip_tpu import codec_pallas, golden
    from ndzip_tpu.ops import u64pair

    prev_interpret = codec_pallas.INTERPRET
    codec_pallas.INTERPRET = True
    try:
        data = np.cos(np.arange(4160, dtype=np.float64).reshape(65, 64))
        lo, hi = u64pair.split(data.view(np.uint64))
        stream, length = api.compress_device((jnp.asarray(lo), jnp.asarray(hi)))
        g, gl = golden.compress(data)
        assert np.asarray(stream[: int(length)]).tobytes() == g.tobytes()

        out_lo, out_hi = api.decompress_device(stream, data.shape, np.float64)
        got = u64pair.join(np.asarray(out_lo), np.asarray(out_hi)).view(np.float64)
        assert np.array_equal(got.reshape(data.shape), data)
    finally:
        codec_pallas.INTERPRET = prev_interpret


def test_device_api_rejects_bad_dtype():
    import jax.numpy as jnp

    with pytest.raises(ValueError, match="device compress"):
        api.compress_device(jnp.zeros(4096, jnp.int8))


def test_offloader_device_timing_mode():
    """timing_mode='device' stages input first and fences the jitted codec
    OF THE SELECTED BACKEND (offload.hh:16-24 kernel_duration semantics) —
    the xla leg must never dispatch the Pallas codec."""
    from ndzip_tpu import golden

    data = np.sin(np.arange(4096 * 2 + 3, dtype=np.float32))
    g, gl = golden.compress(data)
    off = api.Offloader(np.float32, 1, backend="xla", timing_mode="device")
    stream, words = off.compress(data)
    assert off.timing.compress_ns > 0
    assert words == gl and stream.tobytes() == g.tobytes()
    out = off.decompress(stream, data.shape)
    assert off.timing.decompress_ns > 0
    assert np.array_equal(out, data)

    # pallas leg (interpret mode on CPU): same semantics, same stream
    from ndzip_tpu import codec_pallas

    prev_interpret = codec_pallas.INTERPRET
    codec_pallas.INTERPRET = True
    try:
        offp = api.Offloader(np.float32, 1, backend="pallas",
                             timing_mode="device")
        stream_p, words_p = offp.compress(data)
        assert offp.timing.compress_ns > 0
        assert words_p == gl and stream_p.tobytes() == g.tobytes()
        out_p = offp.decompress(stream_p, data.shape)
        assert offp.timing.decompress_ns > 0
        assert np.array_equal(out_p, data)
    finally:
        codec_pallas.INTERPRET = prev_interpret

    # host backends silently fall back to wall timing
    off_host = api.Offloader(np.float32, 1, backend="golden", timing_mode="device")
    assert off_host.timing_mode == "wall"

    with pytest.raises(ValueError, match="timing_mode"):
        api.Offloader(np.float32, 1, timing_mode="events")


def test_offloader_measure_chained():
    data = np.sin(np.arange(4096 * 2, dtype=np.float32))
    off = api.Offloader(np.float32, 1, backend="xla")
    timing = off.measure(data, chains=(2, 10))
    assert timing.compress_ns > 0 and timing.decompress_ns > 0

    off_host = api.Offloader(np.float32, 1, backend="golden")
    with pytest.raises(ValueError, match="jitted backend"):
        off_host.measure(data)


def test_backend_env_override_and_probe(monkeypatch):
    """backend="auto" honors NDZIP_TPU_BACKEND, and an unusable/unreachable
    jax backend (probe returns None, the down-accelerator case) degrades
    auto-resolution to the host codecs instead of hanging."""
    monkeypatch.setenv("NDZIP_TPU_BACKEND", "golden")
    assert api._resolve_backend("auto") == "golden"
    monkeypatch.delenv("NDZIP_TPU_BACKEND")
    # explicit backends bypass both the env var and the probe
    assert api._resolve_backend("cpu") == "cpu"

    monkeypatch.setattr(api, "_probe_default_backend", lambda: None)
    assert api._resolve_backend("auto") in ("cpu", "golden")
    # on this suite's CPU platform the probe resolves and auto -> xla
    monkeypatch.undo()
    assert api._resolve_backend("auto") in ("xla", "pallas")


def test_sharded_backend_roundtrip():
    """api/CLI backend 'sharded': block-parallel over all visible devices,
    byte-identical streams."""
    import numpy as np

    from ndzip_tpu import api, golden

    data = np.sin(np.arange(4096 * 9 + 7) * 1e-3).astype(np.float32)
    c = api.make_compressor(np.float32, 1, "sharded")
    d = api.make_decompressor(np.float32, 1, "sharded")
    stream, words = c.compress(data)
    g, gl = golden.compress(data)
    assert words == gl and stream.tobytes() == g.tobytes()
    out = d.decompress(stream, data.shape)
    assert np.array_equal(out, data)
