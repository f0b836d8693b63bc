"""Device-resident compression: the data is a jax.Array the program
already holds on the accelerator, and the compressed stream stays there —
the workflow of the reference's `cuda_compressor` over device pointers
(/root/reference/include/ndzip/cuda.hh:10-41).  Typical use: compress a
shard right before a DCN transfer or a host checkpoint write.

Run with --tpu on a TPU host for the Pallas production path; by default it
forces the CPU platform and demonstrates the identical API surface over
the XLA backend (same bytes, interpreted speed).

Also shown: the Offloader's honest kernel timing — `timing_mode="device"`
fences staging first and times only the jitted codec (the reference's
`kernel_duration`, offload.hh:16-24), and `measure()` runs the two-point
chained-loop protocol for dispatch-free device numbers.
"""

import sys
from pathlib import Path

use_tpu = "--tpu" in sys.argv

import jax  # noqa: E402

if not use_tpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import ndzip_tpu  # noqa: E402
from ndzip_tpu import api  # noqa: E402

data = np.sin(np.arange(2**20, dtype=np.float32) * 1e-4)

if use_tpu:
    # --- production path: jax.Array in, jax.Array out, nothing leaves ----
    dev = jnp.asarray(data)                       # already on the TPU
    stream_dev, length = ndzip_tpu.compress_device(dev)
    print("stream device:", stream_dev.device, " length words:", int(length))
    back = ndzip_tpu.decompress_device(stream_dev, data.shape)
    assert np.array_equal(np.asarray(back), data)
    print("device round-trip OK (Pallas kernels)")

# --- host-array Offloader with device-fenced kernel timing ---------------
backend = "pallas" if use_tpu else "xla"
off = api.Offloader(np.float32, dims=1, backend=backend,
                    timing_mode="device")
stream, words = off.compress(data)
print(f"compress: {4 * words / data.nbytes:.3f} ratio, "
      f"{off.timing.compress_ns / 1e6:.2f} ms kernel time "
      f"(staging/dispatch-fenced, one dispatch included)")
out = off.decompress(stream[:words], data.shape)
assert np.array_equal(out, data)
print(f"decompress: {off.timing.decompress_ns / 1e6:.2f} ms kernel time")

# --- dispatch-free numbers: two-point chained-loop slope ------------------
t = off.measure(data)
gbps_c = data.nbytes / max(t.compress_ns, 1)
gbps_d = data.nbytes / max(t.decompress_ns, 1)
print(f"measure(): compress {gbps_c:.2f} GB/s, decompress {gbps_d:.2f} GB/s "
      f"({backend} backend, device time)")
