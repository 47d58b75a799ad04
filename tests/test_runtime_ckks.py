"""DSL programs executing on the CKKS (approximate float) backend — a
capability the reference only planned (HAVE_SEAL_CKKS)."""

import pytest

from abc_tpu.runtime.ckks_backend import CkksCiphertextFactory

from helpers import run_program


@pytest.fixture(scope="module")
def factory():
    return CkksCiphertextFactory(n=512, levels=3, seed=2)


def approx(got, expected, tol=1e-2):
    assert len(got) >= len(expected)
    for g, e in zip(got, expected):
        assert abs(g - e) <= tol, f"{got[:len(expected)]} != {expected}"


def test_float_add_mul(factory):
    rv, pairs = run_program(
        "secret double a = {1.5, 2.0, -0.5}; secret double b = {0.5, 0.25, 4.0};",
        "secret double s = a +++ b; secret double p = a *** b;",
        "ys = s; yp = p;", factory)
    out = dict(pairs)
    approx(factory.decrypt(out["ys"]), [2.0, 2.25, 3.5])
    approx(factory.decrypt(out["yp"]), [0.75, 0.5, -2.0])


def test_float_polynomial(factory):
    # (a*b) + a at two levels
    rv, pairs = run_program(
        "secret double a = {2.0, 3.0};",
        "secret double y = a *** a;",
        "y = y;", factory)
    approx(factory.decrypt(pairs[0][1]), [4.0, 9.0])


def test_float_rotation(factory):
    rv, pairs = run_program(
        "secret double v = {1.0, 2.0, 3.0, 4.0};",
        "v = rotate(v, 1);",
        "y = v;", factory)
    approx(factory.decrypt(pairs[0][1]), [2.0, 3.0, 4.0])


def test_plain_minus_ciphertext(factory):
    rv, pairs = run_program(
        "secret double a = {1.0, 2.0}; double p = {10.0, 10.0};",
        "secret double d = p --- a;",
        "y = d;", factory)
    approx(factory.decrypt(pairs[0][1]), [9.0, 8.0])
