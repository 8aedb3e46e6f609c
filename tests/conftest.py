"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled.

Multi-chip sharding paths are validated on host-platform fake devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8) as the single-machine
stand-in for a real TPU slice; f64 is required for the 1e-12
perfect-reconstruction gates carried over from the reference test suite.
"""

import os

# Force the CPU platform: the ambient environment may point JAX at a remote
# TPU (JAX_PLATFORMS=axon), but tests validate f64 semantics and virtual
# multi-device meshes, both of which are CPU-host features.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The interpreter's sitecustomize may have imported jax with
# JAX_PLATFORMS=axon already baked into the config; override it here too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# NOTE: the persistent compilation cache is deliberately NOT enabled here.
# With it on (cache_dir + min_compile_time/min_entry_size at 0) the suite
# segfaulted twice in this environment inside jax's native cache codecs —
# once in the read path (get_executable) and once in the write path
# (put_executable_and_time) — taking the whole pytest process down mid-run.
# Repeat-run speed is not worth a flaky CI signal.
