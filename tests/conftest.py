import os

# Tests run on a virtual 8-device CPU mesh with float64 enabled, mirroring
# the reference's 16-vs-32-rank parallelism testing strategy
# (reference testing_and_setup/testing/tests/parallelism.py) without TPU pods.
# Force CPU: the ambient environment may point JAX at a tunneled TPU
# (JAX_PLATFORMS=axon), which is slow for the many small test compiles and
# has no multi-device support. Tests always use the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The ambient axon sitecustomize forces jax_platforms='axon,cpu' regardless
# of JAX_PLATFORMS; override the config directly so tests really run on
# the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the EVP step takes minutes to compile on
# the 4-core CI CPU; cache it across test runs.
_CACHE = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
