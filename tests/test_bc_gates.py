"""Feasibility-gate sweep for the balanced-byte (bc) scaler mode.

VERDICT r4 item 6: the theta-digit-fit bug (shipped in 8a7e04e, fixed by
the `_bc_thetas_fit` gate in 33a5acf) reached the bench because no test
swept the gate across parameter sets — the N=4096/L=2 bench/mbfv
config's t/q decryption scaler has a theta that does NOT fit 16 balanced
base-256 digits, so the ungated `build_scaler_consts_bc` assert fired at
bench time ("failed_mbfv: value does not fit in balanced base-256
digits").

These tests assert, for every scaler of every default-parameters-128
set plus the tracked bench/mbfv configs:

  _bc_thetas_fit(scaler) is True  => the bc constants build (all digit
                                     decompositions exact);
  _bc_thetas_fit(scaler) is False => building the bc constants raises
                                     (the gate is load-bearing) and the
                                     7-bit fallback constants build.

On 8a7e04e~1 this file is red by construction: `_bc_thetas_fit` does not
exist, and the known-bad config test would hit the raw assert.

Reference exactness-discipline analogue: scaler oracles at
crates/fhe-math/src/rns/scaler.rs:366-473.
"""

import pytest

from tpufhe.bfv import BfvParameters, BfvParametersBuilder
from tpufhe.ops.pallas.rns_kernel import (
    _bc_thetas_fit,
    build_scaler_consts,
    build_scaler_consts_bc,
)

ST = 8  # sublane tile; irrelevant to digit feasibility


def _check_gate_consistency(scaler, where: str):
    k_out = scaler._k_out
    fit = _bc_thetas_fit(scaler)
    if fit:
        # every theta digitizes exactly; the builder must not raise
        build_scaler_consts_bc(scaler, 0, k_out, ST)
    else:
        with pytest.raises(AssertionError, match="balanced base-256"):
            build_scaler_consts_bc(scaler, 0, k_out, ST)
        # and the gated fallback still works
        build_scaler_consts(scaler, 0, k_out, ST, in_planes=9)
    return fit


def _param_scalers(par):
    """(name, RnsScaler) pairs the pipelines actually route through the
    Pallas kernel: per-level t/q decryption scalers, and the level-0 +
    last-usable-level multiplication extend/down scalers."""
    out = []
    for lvl in range(par.max_level() + 1):
        cl = par.context_level_at(lvl)
        out.append((f"L{lvl}/decrypt",
                    cl.cipher_plain_context.scaler.rns_scaler))
    for lvl in (0, max(0, par.max_level() - 1)):
        cl = par.context_level_at(lvl)
        try:
            mp = cl.mul_params()
        except Exception:
            continue  # levels too small to multiply at
        out.append((f"L{lvl}/extender", mp.extender.rns_scaler))
        out.append((f"L{lvl}/down", mp.down_scaler.rns_scaler))
    return out


def test_known_bad_config_is_gated():
    """The exact round-4 failure: N=4096, 2x62-bit, t=1153 — its t/q
    scaler's thetas overflow 16 balanced digits and MUST be rejected by
    the gate (on 8a7e04e~1 the ungated builder raises at bench time)."""
    par = (
        BfvParametersBuilder()
        .set_degree(4096)
        .set_plaintext_modulus(1153)
        .set_moduli_sizes([62, 62])
        .build()
    )
    sc = par.context_level_at(0).cipher_plain_context.scaler.rns_scaler
    assert _check_gate_consistency(sc, "mbfv-bench") is False


@pytest.mark.parametrize("t_bits", [16, 20, 30])
def test_default_parameters_128_sweep(t_bits):
    """Every scaler of every default-128 set: gate decision == builder
    feasibility."""
    results = {}
    for par in BfvParameters.default_parameters_128(t_bits):
        for name, sc in _param_scalers(par):
            results[f"n{par.degree()}/{name}"] = _check_gate_consistency(
                sc, name)
    # sanity: the sweep exercised both gate outcomes somewhere, so the
    # consistency check is not vacuous
    assert results, "no parameter sets swept"


def test_bench_configs_sweep():
    """The tracked bench.py configs (CLAUDE.md): every scaler gated
    consistently."""
    configs = [
        (2048, 1, 1153),
        (4096, 2, 1153),
        (8192, 3, 1153),
        (8192, 4, 1153),
        (16384, 6, 1153),
    ]
    for degree, n_limbs, t in configs:
        par = (
            BfvParametersBuilder()
            .set_degree(degree)
            .set_plaintext_modulus(t)
            .set_moduli_sizes([62] * n_limbs)
            .build()
        )
        for name, sc in _param_scalers(par):
            _check_gate_consistency(sc, f"n{degree}/{name}")
