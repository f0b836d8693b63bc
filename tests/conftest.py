import os

# Tests run on a virtual 8-device CPU mesh by default so sharding paths are
# exercised without TPU hardware (and without tying up the TPU tunnel).
# `make test-tpu` sets NDZIP_TPU_TESTS_TPU=1 to leave the real TPU backend
# active for the hardware smoke suite (test_tpu_smoke.py) — everything
# else auto-skips in that mode and vice versa.
#
# Pitfall (this image): the axon TPU plugin overrides the JAX_PLATFORMS
# environment variable during plugin registration, so the env var alone is
# NOT enough — the platform must be re-pinned via jax.config after import.
# The env vars are still set first for any subprocesses tests spawn.
TPU_MODE = bool(os.environ.get("NDZIP_TPU_TESTS_TPU"))

if not TPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_NUM_CPU_DEVICES"] = "8"

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
