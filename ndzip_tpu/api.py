"""Public API: compressor / decompressor / offloader objects and factories.

Mirrors the reference public surface (include/ndzip/ndzip.hh:228-269 and
include/ndzip/offload.hh:8-71):

  * ``Compressor`` / ``Decompressor`` — stateful per-(dtype, dims) codec
    objects (analog of ``compressor<T>`` / ``decompressor<T>``).
  * ``make_compressor(dtype, dims, backend, threads)`` — factory
    (``make_compressor`` / ``make_decompressor``, ndzip.hh:249-253).
  * ``Offloader`` — round-trip host-pointer interface that also reports the
    device kernel duration in nanoseconds (``offloader<T>::compress(...,
    kernel_duration)``, offload.hh:16-24).
  * ``CompressorRequirements`` — accumulates the maximum block count over
    multiple shapes so device codecs can pre-build/compile once
    (ndzip.hh:255-269).

Backends: "golden" (numpy oracle), "cpu" (native C++), "xla" (jit XLA),
"pallas" (TPU kernels), "auto" (best available for the current platform).
All emit bit-identical streams.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np

from . import format as fmt


class CompressorRequirements:
    """ndzip.hh:255-269 — accumulate max #hypercubes over planned shapes."""

    def __init__(self, *shapes):
        self.dims = None
        self.max_num_hypercubes = 0
        self.shapes = []
        for s in shapes:
            self.include(s)

    def include(self, shape):
        shape = tuple(shape)
        fmt.validate_shape(shape)
        if self.dims is None:
            self.dims = len(shape)
        elif self.dims != len(shape):
            raise ValueError("all shapes in requirements must share dimensionality")
        self.shapes.append(shape)
        self.max_num_hypercubes = max(self.max_num_hypercubes, fmt.num_hypercubes(shape))
        return self


@dataclass
class KernelTiming:
    """Most recent device-kernel duration (ns); -1 when not measured."""

    compress_ns: int = -1
    decompress_ns: int = -1


def _require_dtype_dims(dtype, dims):
    dtype = np.dtype(dtype)
    wb = fmt.word_bits_for_dtype(dtype)
    if not 1 <= dims <= fmt.MAX_DIMENSIONALITY:
        raise ValueError(f"dims must be 1..{fmt.MAX_DIMENSIONALITY}")
    return dtype, wb


class Compressor:
    def __init__(self, dtype, dims):
        self.dtype, self.word_bits = _require_dtype_dims(dtype, dims)
        self.dims = dims

    def _check(self, data):
        if data.ndim != self.dims:
            raise ValueError(
                f"data dimensionality {data.ndim} does not match compressor dimensionality {self.dims}")
        if np.dtype(data.dtype) != self.dtype:
            raise ValueError(f"data dtype {data.dtype} != compressor dtype {self.dtype}")

    def compress(self, data) -> tuple[np.ndarray, int]:
        raise NotImplementedError


class Decompressor:
    def __init__(self, dtype, dims):
        self.dtype, self.word_bits = _require_dtype_dims(dtype, dims)
        self.dims = dims

    def decompress(self, stream, shape) -> np.ndarray:
        raise NotImplementedError


class _GoldenCompressor(Compressor):
    def compress(self, data):
        from . import golden

        data = np.ascontiguousarray(data)
        self._check(data)
        return golden.compress(data)


class _GoldenDecompressor(Decompressor):
    def decompress(self, stream, shape):
        from . import golden

        return golden.decompress(np.asarray(stream), tuple(shape), self.dtype)


class _NativeCompressor(Compressor):
    def __init__(self, dtype, dims, threads=1):
        super().__init__(dtype, dims)
        self.threads = threads

    def compress(self, data):
        from . import native

        data = np.ascontiguousarray(data)
        self._check(data)
        return native.compress(data, threads=self.threads)


class _NativeDecompressor(Decompressor):
    def __init__(self, dtype, dims, threads=1):
        super().__init__(dtype, dims)
        self.threads = threads

    def decompress(self, stream, shape):
        from . import native

        return native.decompress(np.asarray(stream), tuple(shape), self.dtype,
                                 threads=self.threads)


class _XlaCompressor(Compressor):
    def compress(self, data):
        from . import codec_xla

        data = np.ascontiguousarray(data)
        self._check(data)
        return codec_xla.compress(data)


class _XlaDecompressor(Decompressor):
    def decompress(self, stream, shape):
        from . import codec_xla

        return codec_xla.decompress(np.asarray(stream), tuple(shape), self.dtype)


class _PallasCompressor(Compressor):
    def compress(self, data):
        from . import codec_pallas

        data = np.ascontiguousarray(data)
        self._check(data)
        return codec_pallas.compress(data)


class _PallasDecompressor(Decompressor):
    def decompress(self, stream, shape):
        from . import codec_pallas

        return codec_pallas.decompress(np.asarray(stream), tuple(shape), self.dtype)


def _pallas_supported() -> bool:
    try:
        import jax

        if jax.default_backend() not in ("tpu", "axon"):
            return False
        from . import codec_pallas  # noqa: F401

        return True
    except Exception:
        return False


def _resolve_backend(backend: str) -> str:
    if backend != "auto":
        return backend
    if _pallas_supported():
        return "pallas"
    try:
        import jax  # noqa: F401

        return "xla"
    except Exception:
        pass
    from . import native

    return "cpu" if native.available() else "golden"


_COMPRESSORS = {
    "golden": _GoldenCompressor,
    "cpu": _NativeCompressor,
    "native": _NativeCompressor,
    "xla": _XlaCompressor,
    "pallas": _PallasCompressor,
}
_DECOMPRESSORS = {
    "golden": _GoldenDecompressor,
    "cpu": _NativeDecompressor,
    "native": _NativeDecompressor,
    "xla": _XlaDecompressor,
    "pallas": _PallasDecompressor,
}


def _precompile(backend: str, dtype, requirements: "CompressorRequirements"):
    """The TPU-native meaning of compressor_requirements (ndzip.hh:255-269):
    where the reference pre-sizes GPU scratch buffers for the largest
    planned input, a jit codec pre-COMPILES its per-shape programs so the
    first real compress call does not pay the (tens of seconds) trace +
    XLA compile cost."""
    wb = fmt.word_bits_for_dtype(dtype)
    for shape in requirements.shapes:
        if backend == "xla":
            from . import codec_xla

            codec_xla.encode_fn(shape, wb)
            codec_xla.decode_fn(shape, wb)
        elif backend == "pallas":
            from . import codec_pallas

            zero = np.zeros(shape, dtype)
            stream, _ = codec_pallas.compress(zero)
            codec_pallas.decompress(stream, shape, dtype)


def make_compressor(dtype, dims, backend="auto", threads=1, requirements=None) -> Compressor:
    backend = _resolve_backend(backend)
    cls = _COMPRESSORS.get(backend)
    if cls is None:
        raise ValueError(f"unknown backend {backend!r}; options: {sorted(_COMPRESSORS)}")
    if requirements is not None:
        _precompile(backend, dtype, requirements)
    if cls is _NativeCompressor:
        return cls(dtype, dims, threads=threads)
    return cls(dtype, dims)


def make_decompressor(dtype, dims, backend="auto", threads=1) -> Decompressor:
    backend = _resolve_backend(backend)
    cls = _DECOMPRESSORS.get(backend)
    if cls is None:
        raise ValueError(f"unknown backend {backend!r}; options: {sorted(_DECOMPRESSORS)}")
    if cls is _NativeDecompressor:
        return cls(dtype, dims, threads=threads)
    return cls(dtype, dims)


class Offloader:
    """Host-array in/out round-trip interface with kernel timing
    (offload.hh:8-71).  ``timing`` holds the last measured device duration;
    for host backends it is wall time of the codec call."""

    def __init__(self, dtype, dims, backend="auto", threads=1):
        self.backend = _resolve_backend(backend)
        self._comp = make_compressor(dtype, dims, self.backend, threads)
        self._dec = make_decompressor(dtype, dims, self.backend, threads)
        self.dtype = self._comp.dtype
        self.dims = dims
        self.timing = KernelTiming()

    def compress(self, data) -> tuple[np.ndarray, int]:
        t0 = time.perf_counter_ns()
        stream, words = self._comp.compress(data)
        self.timing.compress_ns = time.perf_counter_ns() - t0
        return stream, words

    def decompress(self, stream, shape) -> np.ndarray:
        t0 = time.perf_counter_ns()
        out = self._dec.decompress(stream, shape)
        self.timing.decompress_ns = time.perf_counter_ns() - t0
        return out

    def compressed_length_bound(self, shape) -> int:
        return fmt.compressed_bound_words(tuple(shape), self._comp.word_bits)


def make_offloader(backend, dtype, dims, threads: int = 1, **kwargs) -> Offloader:
    return Offloader(dtype, dims, backend=backend, threads=threads, **kwargs)
