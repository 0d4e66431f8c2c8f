"""Test configuration: force the CPU backend with 8 virtual devices.

Mirrors the reference's "insecure fast params" test strategy
(/root/reference/tests/DirectSortNTest.cpp:24-27 uses HEStd_NotSet with small
rings): unit tests here run small rings on CPU; sharding tests use the 8
virtual CPU devices as a stand-in mesh for a TPU slice.

Note: in this container the axon TPU plugin forces jax_platforms at import
time, so the env var alone is not enough - we must update jax.config.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags += " --xla_force_host_platform_device_count=8"
# Pin XLA:CPU codegen to a portable ISA: persistent-cache AOT entries
# compiled with host-specific machine features can SIGILL/segfault when
# loaded on another host (and the loader only warns).  Same pin as
# __graft_entry__.dryrun_multichip, so suite and dryrun share entries.
if "xla_cpu_max_isa" not in _flags:
    _flags += " --xla_cpu_max_isa=AVX2"
os.environ["XLA_FLAGS"] = _flags.strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: FHE circuits retrace the same (level, sdeg)
# op combinations across test runs; caching compiles cuts the dev loop a lot.
# Same directory as bench.py / __graft_entry__ (keys include the platform,
# so CPU test compiles and TPU bench compiles coexist without collisions).
_CACHE = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
