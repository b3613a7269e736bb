"""Test configuration: run JAX on CPU with 8 virtual devices.

This is the TPU-world analog of a fake backend (SURVEY.md §4): the
multi-device mesh/sharding code paths are exercised on a virtual 8-device
CPU mesh; the same code jit-compiles unchanged on real TPU chips.

Note: the env var JAX_PLATFORMS is force-set to the TPU plugin in this
environment, so we must override via jax.config (which wins), and the
host-device-count XLA flag must be in place before backend init — hence
everything at module level, before any test imports jax transitively.
"""

import os

# silence XLA:CPU AOT cache-load spam: cached executables record the
# prefer-no-scatter/prefer-no-gather tuning pseudo-features which the host
# feature probe doesn't report, producing a huge (harmless) E-level log per
# load. Must be set before the backend initializes.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: identical HLO (same shapes/program) hits the
# cache across test files, processes, and suite re-runs — the test suite is
# compile-dominated on this 1-CPU host
from speech_separation_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()
