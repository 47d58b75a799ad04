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


def test_lazy_relin_and_rescale_counts():
    """The CKKS runtime defers relinearization AND rescale (mirrors the BFV
    lazy backend, tests/test_lazy_relin.py): a sum of products decrypts
    directly from the size-3 form — 0 relins, 0 rescales; a product that
    feeds another multiply pays exactly one of each."""
    from abc_tpu.runtime.ckks_backend import CkksCiphertextFactory
    from abc_tpu.runtime.values import Cleartext
    from abc_tpu.utils.datatype import Type

    factory = CkksCiphertextFactory(n=1024, levels=3, seed=4)
    ctx = factory.context

    def enc(vals):
        return factory.create_ciphertext(Cleartext(list(vals), Type.DOUBLE))

    a, b, c, d = (enc([v] * 4) for v in (1.5, 2.0, 3.0, 0.5))
    for k in ctx.counters:
        ctx.counters[k] = 0
    s = a.multiply(b).add(c.multiply(d))        # 1.5*2 + 3*0.5 = 4.5
    got = factory.decrypt(s)[0]
    assert abs(got - 4.5) < 1e-2
    assert ctx.counters["mult"] == 2
    assert ctx.counters["relin"] == 0           # decrypted from size-3

    for k in ctx.counters:
        ctx.counters[k] = 0
    deep = a.multiply(b).multiply(c)            # (1.5*2)*3 = 9
    assert abs(factory.decrypt(deep)[0] - 9.0) < 1e-2
    assert ctx.counters["relin"] == 1           # only the inner product
