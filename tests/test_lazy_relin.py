"""Lazy relinearization + transparent rotation hoisting: op-count
assertions for the runtime backend (VERDICT r1 item 4: "rotation/relin
counts asserted in tests").

The reference relinearizes after EVERY ciphertext multiply
(SealCiphertext.cpp:121-124). Here the runtime defers the key switch:
size-3 products flow through additions and plaintext ops, and decrypt
reads c0 + c1*s + c2*s^2 directly — so an accumulation tree of products
costs at most ONE relinearization, and a tree that is only decrypted
costs ZERO.
"""

import numpy as np
import pytest

from abc_tpu.runtime.bfv_backend import BfvCiphertextFactory
from abc_tpu.runtime.values import Cleartext
from abc_tpu.utils.datatype import Type


@pytest.fixture(scope="module")
def factory():
    return BfvCiphertextFactory(slots=1024, engine="np64")


def _counters(factory):
    return factory.context.counters


def _reset(factory):
    for k in factory.context.counters:
        factory.context.counters[k] = 0


def _enc(factory, vals):
    return factory.create_ciphertext(Cleartext(list(int(v) for v in vals), Type.INT))


def test_sum_of_products_zero_relin(factory):
    """sum_k (a_k * b_k) decrypted directly: 4 multiplies, 0 relins."""
    rng = np.random.default_rng(0)
    av = rng.integers(0, 50, (4, 8))
    bv = rng.integers(0, 50, (4, 8))
    cts = [_enc(factory, a) for a in av] + [_enc(factory, b) for b in bv]
    _reset(factory)
    acc = cts[0].multiply(cts[4])
    for k in range(1, 4):
        acc = acc.add(cts[k].multiply(cts[4 + k]))
    got = factory.decrypt(acc)[:8]
    want = (av.astype(np.int64) * bv.astype(np.int64)).sum(axis=0)
    assert list(got) == list(want)
    c = _counters(factory)
    assert c["mult"] == 4
    assert c["relin"] == 0          # decrypt reads the size-3 sum directly
    assert c["galois"] == 0


def test_product_then_rotate_one_relin(factory):
    """(a*b) rotated: the deferred key switch fires exactly once."""
    a = _enc(factory, range(1, 9))
    b = _enc(factory, range(2, 10))
    _reset(factory)
    out = a.multiply(b).rotate_rows(1)
    got = factory.decrypt(out)[:7]
    want = [(i + 1) * (i + 2) for i in range(1, 8)]
    assert list(got) == want
    c = _counters(factory)
    assert c["relin"] == 1
    assert c["galois"] == 1


def test_tree_of_products(factory):
    """(a*b)*(c*d): each inner product relinearizes once when consumed by
    the outer multiply; the outer product itself is never relinearized."""
    vals = [2, 3, 5, 7]
    cts = [_enc(factory, [v] * 4) for v in vals]
    _reset(factory)
    out = cts[0].multiply(cts[1]).multiply(cts[2].multiply(cts[3]))
    assert factory.decrypt(out)[0] == 2 * 3 * 5 * 7
    c = _counters(factory)
    assert c["mult"] == 3
    assert c["relin"] == 2          # the two inner products only


def test_mixed_size_add_and_plain_ops(factory):
    """size-3 (+|-) size-2 aligns by zero-padding; plaintext ops apply to
    size-3 operands without forcing a key switch."""
    a = _enc(factory, [3] * 4)
    b = _enc(factory, [4] * 4)
    x = _enc(factory, [10] * 4)
    _reset(factory)
    prod = a.multiply(b)                       # size 3
    s = prod.add(x)                            # 3 + 2 -> pad
    s = x.subtract(prod)                       # 2 - 3 -> pad
    s = s.add_plain(Cleartext([1] * 4, Type.INT))
    s = s.multiply_plain(Cleartext([2] * 4, Type.INT))
    assert factory.decrypt(s)[0] == (10 - 12 + 1) * 2
    assert _counters(factory)["relin"] == 0


def test_noise_budget_reads_size3(factory):
    """noiseBits works on the pre-relin size-3 form (it is LOWER noise than
    the relinearized form — the key-switch error hasn't been added yet)."""
    a = _enc(factory, [5] * 4)
    b = _enc(factory, [6] * 4)
    prod = a.multiply(b)
    nb3 = prod.noise_bits()
    nb2 = type(prod)(factory.context.relinearize(prod.ct), factory).noise_bits()
    assert nb3 >= nb2 > 0


def test_rotations_share_decomposition(factory):
    """k rotations of the SAME ciphertext: 1 decomposition, k-1 cache hits
    (transparent hoisting in BfvContext.apply_galois)."""
    ct = _enc(factory, range(16))
    _reset(factory)
    outs = [ct.rotate_rows(s) for s in (1, 2, 3, 5)]
    c = _counters(factory)
    assert c["galois"] == 4
    assert c["decomp"] == 1
    assert c["decomp_hit"] == 3
    for s, o in zip((1, 2, 3, 5), outs):
        assert factory.decrypt(o)[0] == s


def test_rotation_cache_distinguishes_ciphertexts(factory):
    """Rotating DIFFERENT ciphertexts never false-hits the cache."""
    a = _enc(factory, range(8))
    b = _enc(factory, range(8, 16))
    _reset(factory)
    a.rotate_rows(1)
    b.rotate_rows(1)
    c = _counters(factory)
    assert c["decomp"] == 2
    assert c["decomp_hit"] == 0


def test_executor_program_counts(factory):
    """A DSL program whose body is a sum of rotated products: run through
    the full three-AST executor protocol on the real BFV backend and assert
    the op counts — 1 decomposition (the second rotation of x cache-hits),
    0 relinearizations (the size-3 sum is decrypted directly)."""
    from tests.helpers import run_program

    _reset(factory)
    rv, out = run_program(
        "secret int x = {1, 2, 3, 4};",
        "secret int y = x *** rotate(x, 1) +++ x *** rotate(x, 2); return y;",
        "y = y;",
        factory=factory)
    c = _counters(factory)
    assert c["galois"] == 2
    assert c["decomp"] == 1 and c["decomp_hit"] == 1
    assert c["mult"] == 2
    assert c["relin"] == 0
    name, val = out[0]
    assert factory.decrypt(val)[0] == 1 * 2 + 1 * 3


def test_repeated_multiplicand_shares_operand_ntt(factory):
    """A ciphertext multiplied repeatedly lifts+transforms ONCE (transparent
    operand-NTT cache, BfvContext._operand_cached — SEAL transform_to_ntt
    applied automatically); squaring shares the operand too."""
    a = _enc(factory, [3] * 4)
    xs = [_enc(factory, [v] * 4) for v in (2, 4, 5)]
    _reset(factory)
    outs = [x.multiply(a) for x in xs]           # a is the shared factor
    c = _counters(factory)
    assert c["mult"] == 3
    assert c["op_ntt"] == 4                       # 3 x's + a once
    assert c["op_ntt_hit"] == 2                   # a's 2nd and 3rd reuse
    for x, o in zip((2, 4, 5), outs):
        assert factory.decrypt(o)[0] == 3 * x

    _reset(factory)
    sq = a.multiply(a)
    c = _counters(factory)
    assert factory.decrypt(sq)[0] == 9
    assert c["op_ntt"] + c["op_ntt_hit"] <= 2     # shared operand lift
