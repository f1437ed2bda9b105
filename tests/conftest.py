"""Run the test suite on a virtual 8-device CPU mesh.

NOTE: this image imports jax in `sitecustomize` at interpreter startup, so
JAX_PLATFORMS env tweaks are too late here — we must override via jax.config
*before the backend initializes*. The XLA flag must also be set before first
device use. This validates kernels and multi-chip sharding on CPU the
standard way (SURVEY.md §4g); the TPU tunnel is left alone for bench runs.
Set MCSLAM_TEST_PLATFORM to override.
"""
import os

import jax

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
jax.config.update("jax_platforms", os.environ.get("MCSLAM_TEST_PLATFORM", "cpu"))

# Persistent compilation cache: first run pays XLA compile cost, reruns don't.
# Threshold 0: the SLAM pipeline compiles many ~0.1s programs (bucketed BA
# shapes, per-stage kernels) whose *count* adds up — cache all of them.
jax.config.update("jax_compilation_cache_dir", "/tmp/mcslam_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
