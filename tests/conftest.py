import os

# Tests run on a virtual 8-device CPU mesh: f64 is IEEE there, so the
# double-word substrate is bit-exact (see NOTES_TPU_NUMERICS.md).
# --xla_cpu_max_isa=AVX disables LLVM FMA contraction, which would silently
# break the error-free transforms.
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           + " --xla_cpu_max_isa=AVX")

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS/JAX_PLATFORM_NAME env vars set
# in-process; the config route is reliable.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
