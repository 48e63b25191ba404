"""End-to-end application tests (PIR, voting, basic walkthrough)."""

import numpy as np

from tpufhe.models import (
    run_bfv_basic,
    run_bfv_ops,
    run_mulpir,
    run_rgsw,
    run_sealpir,
    run_voting,
)


def test_bfv_basic():
    res = run_bfv_basic(num_moduli=3, degree=16)
    assert res["add"][0] == res["add"][1]
    assert res["mul_relin"][0] == res["mul_relin"][1]


def test_bfv_ops():
    res = run_bfv_ops(num_moduli=3, degree=16)
    for name, (got, want) in res.items():
        assert got == want, name


def test_rgsw_example():
    res = run_rgsw(num_moduli=3, degree=16)
    assert res["product"][0] == res["product"][1]
    assert res["matches_ct_mul"][0] == res["matches_ct_mul"][1]
    # mod switching truncates: fewer bytes, less absolute noise headroom
    assert res["bytes"][1] < res["bytes"][0]


def test_voting():
    got, want = run_voting(num_voters=6, num_parties=3, degree=64)
    assert got == want


def test_mulpir():
    answer, expected = run_mulpir(database_size=32, elements_size=8, degree=64)
    assert answer == expected


def test_sealpir():
    answer, expected = run_sealpir(database_size=32, elements_size=8, degree=64)
    assert answer == expected
