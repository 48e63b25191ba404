"""Canonical XLA_FLAGS for the virtual CPU mesh (tests + multi-chip dryrun).

This module must stay importable WITHOUT importing jax: its whole point is
to compose the XLA_FLAGS string *before* jax initializes, and it is shared
by tests/conftest.py and __graft_entry__.dryrun_multichip so both produce
the SAME DebugOptions — the persistent compile cache keys include the
serialized compile options, so any flag drift between the two forks every
expensive cache entry (the sequence-sharded pipeline's cold compile is
minutes-to-hours on this 1-core host).

Flag rationale:
- ``--xla_backend_optimization_level=0`` / ``--xla_llvm_disable_expensive_passes``:
  the fused integer pipelines emit ~300 LLVM kernel modules per program;
  default opt level costs >10 min per compile on one core, level 0 compiles
  in seconds with bit-identical integer results.
- ``--xla_cpu_multi_thread_eigen=false``: one physical core; the default
  8-thread spinning pool multiplies every dispatch cost.
- ``--xla_cpu_collective_call_terminate_timeout_seconds`` /
  ``--xla_cpu_collective_timeout_seconds``: the in-process CPU communicator
  hard-aborts (abort() → rc 134) any collective rendezvous where some
  participant thread is >40 s late. Eight virtual devices time-sharing one
  core routinely exceed that skew on cold compiles or large shards — this
  was the MULTICHIP_r02/r03 failure (``xla::cpu::InProcessCommunicator``
  rendezvous abort). NOTE: the previously-used
  ``--xla_cpu_use_thunk_runtime=false`` is a NO-OP in this jaxlib ("no
  longer supported" per libjax_common.so) — raising the rendezvous
  timeouts is the mitigation that actually takes effect, verified by a
  deliberately-skewed all_to_all that survives a 72 s skew with these
  flags and aborts at 40 s without them.
"""

from __future__ import annotations

import os

# One flag string, one source of truth. 7200 s ≈ "never" relative to any
# realistic dryrun/test, while still guaranteeing eventual termination.
CPU_MESH_BASE_FLAGS = (
    "--xla_backend_optimization_level=0",
    "--xla_llvm_disable_expensive_passes=true",
    "--xla_cpu_multi_thread_eigen=false",
    "--xla_cpu_collective_call_terminate_timeout_seconds=7200",
    "--xla_cpu_collective_timeout_seconds=7200",
    # jaxlib 0.9's new CPU fusion emitters have a catastrophic codegen
    # pathology on this package's bitcast+concatenate fusions: ONE fused
    # kernel of the degree-64 mul+relin program executed for 29.5 s of
    # pure CPU (xplane: bitcast_concatenate_fusion.15) and large programs
    # never finished — this is what made the round-5 cold dryrun/tests
    # hang at 100% CPU AFTER compiling. With the legacy emitters the same
    # executable runs in milliseconds (measured 30 s -> 0.0 s).
    "--xla_cpu_use_fusion_emitters=false",
)


def cpu_mesh_xla_flags(n_devices: int) -> str:
    """The full XLA_FLAGS value for an n-device virtual CPU mesh."""
    return " ".join(
        (f"--xla_force_host_platform_device_count={n_devices}",)
        + CPU_MESH_BASE_FLAGS
    )


def apply_cpu_mesh_flags(n_devices: int, env: dict | None = None) -> None:
    """Merge the canonical flags into ``env`` (default: os.environ).

    Existing occurrences of the same flags are left alone (caller wins);
    missing ones are appended. Must run before jax is imported to have any
    effect.
    """
    target = os.environ if env is None else env
    flags = target.get("XLA_FLAGS", "")
    for f in (
        f"--xla_force_host_platform_device_count={n_devices}",
    ) + CPU_MESH_BASE_FLAGS:
        name = f.split("=")[0]
        if name not in flags:
            flags = (flags + " " + f).strip()
    target["XLA_FLAGS"] = flags
