"""Observability utilities (the NDZIP_VERBOSE-analog surface,
reference: common.hh:630-633, sycl_bits.hh:38-55)."""

import numpy as np

from ndzip_tpu import utils


def test_verbose_gate(monkeypatch, capsys):
    utils.verbose.cache_clear()
    monkeypatch.setenv("NDZIP_TPU_VERBOSE", "1")
    assert utils.verbose() is True
    utils.log("hello")
    assert "[ndzip-tpu] hello" in capsys.readouterr().err

    utils.verbose.cache_clear()
    monkeypatch.setenv("NDZIP_TPU_VERBOSE", "0")
    assert utils.verbose() is False
    utils.log("quiet")
    assert capsys.readouterr().err == ""
    utils.verbose.cache_clear()


def test_trace_prints_under_verbose(monkeypatch, capsys):
    utils.verbose.cache_clear()
    monkeypatch.setenv("NDZIP_TPU_VERBOSE", "1")
    with utils.trace("unit-test-region"):
        pass
    err = capsys.readouterr().err
    assert "[profile] unit-test-region" in err and "ms" in err
    utils.verbose.cache_clear()


def test_device_time_ns():
    import jax.numpy as jnp

    x = jnp.asarray(np.arange(1024, dtype=np.float32))
    ns = utils.device_time_ns(lambda a: a * 2, x)
    assert ns > 0


def test_compilation_cache(tmp_path, monkeypatch):
    import jax
    import jax.numpy as jnp

    cache = tmp_path / "xla-cache"
    got = utils.enable_compilation_cache(str(cache))
    assert got == str(cache) and cache.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(cache)
    # jitted programs still run with the cache enabled
    assert int(jax.jit(lambda a: a + 1)(jnp.int32(1))) == 2
    # maybe_* is a no-op without the env var (no exception, no state)
    monkeypatch.delenv("NDZIP_TPU_CACHE_DIR", raising=False)
    utils.maybe_enable_compilation_cache()
