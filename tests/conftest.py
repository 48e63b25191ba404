"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated on host platform devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8), mirroring the
reference's in-process multi-party tests (SURVEY.md section 4.8). Real-TPU
benchmarking happens in bench.py, not here.

The XLA flag set is the canonical one from tpufhe.hostflags — shared with
__graft_entry__.dryrun_multichip so the expensive sharded-pipeline compile
cache entries (keyed on the serialized compile options, i.e. on these
flags) are written once and hit by both. Do not add/remove flags here
without changing hostflags.py instead.
"""

import os
import sys

# The harness environment pins JAX_PLATFORMS=axon (a tunneled TPU with slow
# cold init). Tests must run on the virtual CPU mesh, so force-override.
os.environ["JAX_PLATFORMS"] = "cpu"

_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo_root not in sys.path:
    sys.path.insert(0, _repo_root)

from tpufhe.hostflags import apply_cpu_mesh_flags  # noqa: E402

apply_cpu_mesh_flags(8)

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# Persistent compilation cache: XLA compiles of the fused FHE pipelines are
# expensive on this single-core host; cache them across pytest runs.
_cache_dir = os.path.expanduser("~/.cache/tpufhe_jax")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
