"""Bench-harness integrity: bench.py must import cleanly and expose every
config callable main() wires up (a missing def shipped in round 5 as
rc=1 in the official record — bench_scaling swallowed by an edit)."""

import ast
import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_exposes_all_configs():
    m = _load_bench()
    for fn in (
        "bench_mul_relin",
        "bench_enc_dec",
        "bench_sampling",
        "bench_add_ptmul",
        "bench_rotate",
        "bench_inner_sum",
        "bench_dot_product",
        "bench_mbfv",
        "bench_pir_response",
        "bench_scaling",
        "main",
    ):
        assert callable(getattr(m, fn, None)), f"bench.py lost {fn}"


def test_bench_main_references_resolve():
    """Every name referenced inside main()'s config list is defined at
    module scope (AST-level, no execution)."""
    src = open(os.path.join(REPO, "bench.py")).read()
    tree = ast.parse(src)
    defined = {n.name for n in tree.body
               if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))}
    main = next(n for n in tree.body
                if isinstance(n, ast.FunctionDef) and n.name == "main")
    for node in ast.walk(main):
        if isinstance(node, ast.Name) and node.id.startswith("bench_"):
            assert node.id in defined, f"main() references missing {node.id}"
