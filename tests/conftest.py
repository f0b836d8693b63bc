import os

# Tests always run on a virtual 8-device CPU mesh so sharding paths are
# exercised without TPU hardware (and without tying up the TPU tunnel).
# Must be set before jax is imported anywhere; the environment may preset
# JAX_PLATFORMS (e.g. to the axon TPU), so override unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
