import os

# Force CPU with a virtual 8-device mesh BEFORE jax import: multi-chip
# sharding tests run on the host platform (the TPU analog of the reference's
# single-machine `mpirun -np N` testing, benchmark_01.cc:251-272).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"  # the axon TPU plugin ignores JAX_PLATFORMS
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
