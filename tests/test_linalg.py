"""Hoisted rotations + BSGS packed matrix-vector product (crypto/linalg.py).

Oracle protocol: decrypt-and-compare against numpy (the reference's
MatrixVectorProductTest pattern, packed instead of scalar)."""

import numpy as np

from abc_tpu.crypto.bfv import BfvContext
from abc_tpu.crypto.linalg import matvec_bsgs, matvec_naive
from abc_tpu.crypto.params import BfvParams


def _ctx(n=256):
    return BfvContext(BfvParams.create(n, seed=5))


def test_hoisted_rotations_match_sequential():
    ctx = _ctx(2048)
    vals = list(range(1, 9))
    ct = ctx.encrypt(ctx.encode(vals))
    steps = [0, 1, 2, 5, -3]
    hoisted = ctx.hoisted_rotations(ct, steps)
    for s, h in zip(steps, hoisted):
        want = ctx.decode(ctx.decrypt(ctx.rotate_rows(ct, s)))[:8]
        got = ctx.decode(ctx.decrypt(h))[:8]
        assert got == want, (s, got, want)
        assert ctx.noise_budget(h) > 20


def test_matvec_bsgs_matches_numpy():
    ctx = _ctx(1024)
    k = 512
    rng = np.random.default_rng(0)
    mat = rng.integers(-3, 4, size=(k, k))
    x = rng.integers(-5, 6, size=k)
    ct = ctx.encrypt(ctx.encode([int(v) for v in x] * 2))
    out = matvec_bsgs(ctx, ct, mat)
    got = np.asarray(ctx.decode(ctx.decrypt(out))[:k])
    np.testing.assert_array_equal(got, mat @ x)


def test_matvec_naive_matches_numpy():
    ctx = _ctx(1024)
    k = 512
    rng = np.random.default_rng(1)
    mat = rng.integers(0, 3, size=(k, k))
    x = rng.integers(0, 4, size=k)
    ct = ctx.encrypt(ctx.encode([int(v) for v in x] * 2))
    out = matvec_naive(ctx, ct, mat)
    got = np.asarray(ctx.decode(ctx.decrypt(out))[:k])
    np.testing.assert_array_equal(got, mat @ x)


def test_matvec_bsgs_ckks_matches_numpy():
    """CKKS BSGS matvec (crypto/linalg.matvec_bsgs_ckks): encrypted
    mat @ x over the n/2 complex slots matches the numpy product, with
    O(sqrt k) key switches — g baby rotations sharing one hoisted
    decomposition + ~k/g giant rotations."""
    import numpy as np
    from abc_tpu.crypto.ckks import CkksContext, CkksParams
    from abc_tpu.crypto.linalg import matvec_bsgs_ckks

    params = CkksParams.create(512, levels=3, engine="np64", seed=3)
    ctx = CkksContext(params)
    k = params.slot_count
    rng = np.random.default_rng(0)
    mat = rng.uniform(-1, 1, (k, k))
    vec = rng.uniform(-1, 1, k)
    ct = ctx.encrypt(ctx.encode(vec, level=params.L))
    for key in ctx.counters:
        ctx.counters[key] = 0
    y = matvec_bsgs_ckks(ctx, ct, mat)
    got = np.real(ctx.decode(ctx.decrypt(y)))
    assert np.max(np.abs(got - mat @ vec)) < 1e-2
    g = int(np.sqrt(k))
    # baby (g-1 nonzero) + giant (k//g - 1 nonzero) rotations, not k-1
    assert ctx.counters["galois"] <= 2 * g + 2 < k - 1
    assert ctx.counters["decomp"] <= k // g + 1   # one shared baby decomp
