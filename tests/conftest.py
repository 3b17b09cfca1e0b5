"""Test configuration: run all tests on CPU with 8 virtual devices so the
multi-chip sharding path is exercised without a TPU pod (SURVEY.md §4)."""
import os

# Force CPU: the ambient environment may pin JAX_PLATFORMS to a real
# accelerator; tests must run on the 8-virtual-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Belt and braces: if a pytest plugin imported jax before this conftest
# ran, the env var above came too late — override via config (works any
# time before backend initialization).
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: protocol graphs are large; recompiling them
# on every pytest invocation would dominate suite time.
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
