"""Observability and configuration utilities.

The reference gates diagnostic output behind the ``NDZIP_VERBOSE`` env var
(common.hh:630-633) and threads per-kernel timings through SYCL profiling
events (sycl_bits.hh:38-55) / CUDA events (cuda_bits.cuh:252-259).  The
TPU-native equivalents:

* ``verbose()`` — ``NDZIP_TPU_VERBOSE`` env gate, cached at first call.
* ``log(...)`` — stderr logger active only under verbose.
* ``trace(label)`` — context manager that both annotates the JAX profiler
  trace (visible in TensorBoard/Perfetto captures) and, under verbose,
  prints ``[profile] <label> <ms>`` wall timings like the reference's
  ``submit_and_profile``.
* ``device_time_ns(fn, *args)`` — device-only duration of a jitted
  callable, measured by block_until_ready fencing (the host-side analog of
  ``kernel_duration``; see bench.py for the chained-loop variant that
  amortizes host sync overhead).
* ``profiler_trace(dir)`` — capture a full XLA profiler trace for offline
  analysis (the deep-dive analog of the reference's NDZIP_VERBOSE kernel
  dumps).
* ``enable_compilation_cache(path)`` — persistent XLA compilation cache
  for the codec's jitted programs; auto-enabled when
  ``NDZIP_TPU_CACHE_DIR`` is set.
"""

from __future__ import annotations

import contextlib
import functools
import os
import sys
import time


@functools.lru_cache(maxsize=1)
def verbose() -> bool:
    """common.hh:630-633 — cached env-var gate."""
    v = os.environ.get("NDZIP_TPU_VERBOSE", "")
    return v not in ("", "0", "false", "no")


def log(*args):
    if verbose():
        print("[ndzip-tpu]", *args, file=sys.stderr)


@contextlib.contextmanager
def trace(label: str):
    """Annotate the JAX profiler trace and print wall time under verbose
    (the analog of submit_and_profile, sycl_bits.hh:46-55)."""
    try:
        import jax.profiler

        ctx = jax.profiler.TraceAnnotation(label)
    except Exception:  # profiler unavailable (e.g. no jax)
        ctx = contextlib.nullcontext()
    t0 = time.perf_counter()
    with ctx:
        yield
    if verbose():
        ms = (time.perf_counter() - t0) * 1e3
        print(f"[profile] {label} {ms:.3f} ms", file=sys.stderr)


def device_time_ns(fn, *args) -> int:
    """Wall duration of fn(*args) fenced by block_until_ready on inputs and
    outputs — device time plus one dispatch, the per-call analog of the
    offloader's kernel_duration out-param (ndzip.hh:271).  One un-timed
    warm-up call first, so a fresh shape's jit trace + compile (minutes
    for the Mosaic kernels) never lands in the reported duration."""
    import jax

    jax.block_until_ready(fn(*args))
    jax.block_until_ready(args)
    t0 = time.perf_counter_ns()
    out = fn(*args)
    jax.block_until_ready(out)
    return time.perf_counter_ns() - t0


@functools.lru_cache(maxsize=None)
def enable_compilation_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``path`` (default:
    ``$NDZIP_TPU_CACHE_DIR`` or ``~/.cache/ndzip_tpu/xla``) so first-call
    compiles of the codec's jitted programs (notably the fp64 encode
    kernel, tens of seconds on TPU) are paid once per machine rather than
    once per process.  The reference ships AOT-compiled kernels and has no
    such cost (cuda_factory.cu); the persistent cache is the JIT-world
    equivalent.  Returns the cache directory."""
    import jax

    existing = jax.config.jax_compilation_cache_dir
    if existing and path is None:
        # The embedding application already configured a cache and the
        # caller expressed no preference — respect it (never clobber), but
        # lower the min-compile-time threshold if it would skip the
        # codec's kernels.  An explicit ``path`` argument overrides.
        cur = jax.config.jax_persistent_cache_min_compile_time_secs
        if cur is None or cur > 1.0:
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        log("compilation cache already at", existing, "(left as configured)")
        return existing
    path = path or os.environ.get("NDZIP_TPU_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "ndzip_tpu", "xla")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log("compilation cache at", path)
    return path


def maybe_enable_compilation_cache() -> None:
    """Opt-in hook: enables the persistent cache iff NDZIP_TPU_CACHE_DIR
    is set (called by the jitted backends at construction)."""
    if os.environ.get("NDZIP_TPU_CACHE_DIR"):
        enable_compilation_cache()


@contextlib.contextmanager
def profiler_trace(log_dir: str):
    """Capture an XLA profiler trace (TensorBoard format) around a region."""
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
