"""MXU four-step NTT prototype (ops/mxu_ntt.py) — bit-exactness vs the
np64 oracle at small primes. The performance go/no-go (measured on the
real chip: NO-GO at feasible primes) is recorded in docs/DESIGN_NOTES.md
§"MXU four-step: MEASURED"."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from abc_tpu.crypto.ntt import NttContext  # noqa: E402
from abc_tpu.ops.mxu_ntt import compile_fwd, make_plan  # noqa: E402


@pytest.mark.parametrize("n,q", [(2048, 12289), (8192, 65537),
                                 (8192, 114689)])
def test_fourstep_matches_np64_oracle(n, q):
    """Forward four-step output order and values are bit-identical to the
    stack's NTT convention (natural → eval at ψ^(2·brv(p)+1))."""
    ctx = NttContext(n, [q], engine="np64")
    plan = make_plan(n, q)
    assert plan.R * plan.C == n
    assert plan.d == -(-q.bit_length() // 7)
    rng = np.random.default_rng(0)
    x = rng.integers(0, q, size=(n,), dtype=np.uint64).astype(np.uint32)
    got = np.asarray(compile_fwd(plan)(jnp.asarray(x)))
    want = ctx.fwd(x.reshape(1, n))[0]
    np.testing.assert_array_equal(got, np.asarray(want))


def test_fourstep_batched_limbs():
    n, q = 2048, 12289
    ctx = NttContext(n, [q], engine="np64")
    plan = make_plan(n, q)
    rng = np.random.default_rng(1)
    x = rng.integers(0, q, size=(4, n), dtype=np.uint64).astype(np.uint32)
    got = np.asarray(compile_fwd(plan)(jnp.asarray(x)))
    want = np.stack([ctx.fwd(x[i].reshape(1, n))[0] for i in range(4)])
    np.testing.assert_array_equal(got, want)


def test_min_prime_constraint_documented():
    """q ≡ 1 (mod 2n) forces q ≥ 2n+1: no 14-bit prime exists at n=8192
    (the round-3 design-note framing this prototype corrects)."""
    assert 2 * 8192 + 1 > (1 << 14)
    with pytest.raises(ValueError):
        make_plan(8192, 12289)    # 12289 has no 16384th roots
