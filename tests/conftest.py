"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated on host platform devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8), mirroring the
reference's in-process multi-party tests (SURVEY.md section 4.8). Real-TPU
benchmarking happens in bench.py, not here.
"""

import os

# The harness environment pins JAX_PLATFORMS=axon (a tunneled TPU with slow
# cold init). Tests must run on the virtual CPU mesh, so force-override.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The fused integer pipelines produce single fusions with thousands of LLVM
# instructions; at the default backend opt level the CPU compile of one such
# program takes >10 minutes on this 1-core host. Opt level 0 compiles the
# same (bit-exact) program in seconds. TPU runs (bench.py) are unaffected.
if "xla_backend_optimization_level" not in flags:
    flags = (flags + " --xla_backend_optimization_level=0"
             " --xla_llvm_disable_expensive_passes=true"
             " --xla_cpu_use_thunk_runtime=false").strip()
# This host has ONE core; the default multi-threaded Eigen pool spawns 8
# spinning workers that multiply the cost of every eager dispatch (keygen
# and reference paths) several-fold. Collectives on the virtual mesh were
# verified to work single-threaded (psum + tiled all_to_all).
if "xla_cpu_multi_thread_eigen" not in flags:
    flags = (flags + " --xla_cpu_multi_thread_eigen=false").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# Persistent compilation cache: XLA compiles of the fused FHE pipelines are
# expensive on this single-core host; cache them across pytest runs.
_cache_dir = os.path.expanduser("~/.cache/tpufhe_jax")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
