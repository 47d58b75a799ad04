"""Native C++ engine tests: bit-exactness vs the NumPy reference and wiring
into the host NTT contexts (the role SEAL's native code plays in the
reference)."""

import os

import numpy as np
import pytest

from abc_tpu.crypto.ntt import NttContext
from abc_tpu.crypto.numthy import gen_ntt_primes

native = pytest.importorskip("abc_tpu.ops.native")
if not native.available():
    pytest.skip("no C compiler for the native engine", allow_module_level=True)


def make_tables(n=512, L=3):
    os.environ["ABC_TPU_NO_NATIVE"] = "1"       # pure NumPy reference
    ref_ctx = NttContext(n, gen_ntt_primes(30, L, n))
    del os.environ["ABC_TPU_NO_NATIVE"]
    return ref_ctx


def test_native_bit_exact_vs_numpy():
    ctx = make_tables()
    nat = native.NativeNtt(ctx)
    rng = np.random.default_rng(0)
    x = np.stack([rng.integers(0, q, ctx.n, dtype=np.uint64).astype(np.uint32)
                  for q in ctx.moduli])
    np.testing.assert_array_equal(nat.fwd(x), ctx.fwd(x))
    f = ctx.fwd(x)
    np.testing.assert_array_equal(nat.inv(f), ctx.inv(f))
    np.testing.assert_array_equal(nat.pointwise_mul(f, f),
                                  ctx.pointwise_mul(f, f))


def test_native_batched_rows():
    ctx = make_tables()
    nat = native.NativeNtt(ctx)
    rng = np.random.default_rng(1)
    x = np.stack([np.stack([rng.integers(0, q, ctx.n, dtype=np.uint64)
                            .astype(np.uint32) for q in ctx.moduli])
                  for _ in range(3)])
    np.testing.assert_array_equal(nat.fwd(x), ctx.fwd(x))


def test_np64_context_uses_native_transparently():
    # default np64 context attaches the native engine; results must be
    # bit-identical to the pure NumPy path
    n, L = 512, 3
    primes = gen_ntt_primes(30, L, n)
    ctx_native = NttContext(n, primes)
    os.environ["ABC_TPU_NO_NATIVE"] = "1"
    ctx_numpy = NttContext(n, primes)
    del os.environ["ABC_TPU_NO_NATIVE"]
    assert hasattr(ctx_native, "_native")
    rng = np.random.default_rng(2)
    x = np.stack([rng.integers(0, q, n, dtype=np.uint64).astype(np.uint32)
                  for q in primes])
    np.testing.assert_array_equal(ctx_native.fwd(x), ctx_numpy.fwd(x))
    np.testing.assert_array_equal(ctx_native.negacyclic_mul(x, x),
                                  ctx_numpy.negacyclic_mul(x, x))
