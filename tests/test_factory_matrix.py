"""Ciphertext-factory op matrix — port of SealCiphertextFactoryTest.cpp
(16 cases) and DummyCiphertextFactoryTest.cpp (13 cases): createCiphertext
slot expansion, rotate lhs/rhs full-slot semantics (original unchanged),
and the ctxt-ctxt / ctxt-plain op matrix with the reference's exact
vectors. The reference's *Inplace variants mutate; this API is immutable,
so each value-returning case also asserts the operands are unchanged —
the same property the Inplace tests protect. The reference runs on
SealCiphertextFactory(4096); n=1024 here (semantics are n-independent).
"""

import pytest

from abc_tpu.runtime.bfv_backend import BfvCiphertextFactory
from abc_tpu.runtime.dummy import DummyCiphertextFactory
from abc_tpu.runtime.values import Cleartext
from abc_tpu.utils.datatype import Type

DATA1 = [3, 3, 1, 4, 5, 9]
DATA2 = [0, 1, 2, 1, 10, 21]


@pytest.fixture(scope="module", params=["bfv", "dummy"])
def factory(request):
    if request.param == "bfv":
        return BfvCiphertextFactory(slots=1024, engine="np64", seed=7)
    return DummyCiphertextFactory(1024)


def _enc(factory, vals):
    return factory.create_ciphertext(Cleartext(list(vals), Type.INT))


def _check(factory, ct, expected):
    """checkCiphertextData (SealCiphertextFactoryTest.cpp:22-42): expected
    prefix + last-element expansion across ALL remaining slots."""
    got = factory.decrypt(ct)
    assert len(got) == factory.slot_count
    assert got[:len(expected)] == list(expected)
    assert all(v == expected[-1] for v in got[len(expected):])


def test_create_ciphertext(factory):
    """createCiphertext (SealCiphertextFactoryTest.cpp:44-49 /
    DummyCiphertextFactoryTest.cpp:37-46)."""
    _check(factory, _enc(factory, DATA1), DATA1)


def test_rotate_lhs(factory):
    """rotateCiphertextLhs (SealCiphertextFactoryTest.cpp:51-82): +4 left
    rotation over the 2x(n/2) row layout — moved prefix, row wraparound,
    expansion fill; original ciphertext unchanged. The reference's DUMMY
    backend THROWS on rotate (DummyCiphertext.cpp:244-249) — ours
    implements it (capability delta, PARITY.md)."""
    data = [123456, 3, 1, 4, 5, 9, 5, 2, 1, 5]
    steps = 4
    ct = _enc(factory, data)
    rot = ct.rotate_rows(steps)
    _check(factory, ct, data)            # original unchanged
    dv = factory.decrypt(rot)
    half = factory.slot_count // 2
    for i in range(len(dv)):
        if i < min(len(data) - steps, half - steps):
            assert dv[i] == data[i + steps]
        elif half - steps <= i < half:
            assert dv[i] == data[i - (half - steps)]
        else:
            assert dv[i] == data[-1]


def test_rotate_rhs(factory):
    """rotateCiphertextRhs (SealCiphertextFactoryTest.cpp:84-111): -24
    right rotation pulls expansion fill in front of the moved data."""
    data = [123456, 3, 1, 4, 5, 9, 5, 2, 1, 5]
    steps = -24
    ct = _enc(factory, data)
    rot = ct.rotate_rows(steps)
    _check(factory, ct, data)
    dv = factory.decrypt(rot)
    half = factory.slot_count // 2
    for i in range(half):                # first row only (rhs spec region)
        if i < -steps or i >= -steps + len(data):
            assert dv[i] == data[-1]
        else:
            assert dv[i] == data[i + steps]


def test_ctxt_ctxt_ops(factory):
    """add/sub/multiply (SealCiphertextFactoryTest.cpp:146-245 /
    DummyCiphertextFactoryTest.cpp:48-146): exact vectors; operands stay
    unchanged (the property the *Inplace variants protect)."""
    a, b = _enc(factory, DATA1), _enc(factory, DATA2)
    _check(factory, a.add(b), [x + y for x, y in zip(DATA1, DATA2)])
    _check(factory, a.subtract(b), [x - y for x, y in zip(DATA1, DATA2)])
    _check(factory, a.multiply(b), [x * y for x, y in zip(DATA1, DATA2)])
    _check(factory, a, DATA1)
    _check(factory, b, DATA2)


def test_ctxt_plain_ops(factory):
    """addPlain/subPlain/multiplyPlain (SealCiphertextFactoryTest.cpp:
    247-341 / DummyCiphertextFactoryTest.cpp:148-246)."""
    a = _enc(factory, DATA1)
    p = Cleartext(list(DATA2), Type.INT)
    _check(factory, a.add_plain(p), [x + y for x, y in zip(DATA1, DATA2)])
    _check(factory, a.subtract_plain(p),
           [x - y for x, y in zip(DATA1, DATA2)])
    _check(factory, a.multiply_plain(p),
           [x * y for x, y in zip(DATA1, DATA2)])
    _check(factory, a, DATA1)
