"""Coefficient-sharded distributed NTT (parallel/dist_ntt.py).

Runs on the 8-virtual-device CPU mesh (conftest.py) and asserts
BIT-IDENTICAL results against the single-device NttContext transforms —
the "same sharded program on 1 chip vs N devices, compare outputs"
protocol of SURVEY.md §4.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from abc_tpu.crypto.ntt import NttContext  # noqa: E402
from abc_tpu.crypto.numthy import gen_ntt_primes  # noqa: E402
from abc_tpu.parallel.dist_ntt import DistNttContext  # noqa: E402


def _mesh(D):
    return Mesh(np.asarray(jax.devices()[:D]), ("coeff",))


def _ctx(n, L=3):
    moduli = gen_ntt_primes(30, L, n)
    return NttContext(n, moduli, engine="jx32"), moduli


def _rand(moduli, n, batch=(), seed=0):
    L = len(moduli)
    rng = np.random.default_rng(seed)
    hi = np.asarray(moduli, dtype=np.uint64).reshape(L, 1)
    return rng.integers(0, hi, size=batch + (L, n),
                        dtype=np.uint64).astype(np.uint32)


@pytest.mark.parametrize("D", [2, 4, 8])
def test_fwd_matches_local(D):
    n = 256
    ctx, moduli = _ctx(n)
    dist = DistNttContext(ctx, D)
    a = _rand(moduli, n)
    fwd = jax.jit(dist.make_fwd(_mesh(D)))
    got = np.asarray(fwd(jnp.asarray(a)))
    want = np.asarray(ctx.fwd(jnp.asarray(a)))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("D", [2, 8])
def test_inv_roundtrip(D):
    n = 128
    ctx, moduli = _ctx(n, L=2)
    dist = DistNttContext(ctx, D)
    a = _rand(moduli, n, seed=1)
    mesh = _mesh(D)
    fwd = jax.jit(dist.make_fwd(mesh))
    inv = jax.jit(dist.make_inv(mesh))
    back = np.asarray(inv(fwd(jnp.asarray(a))))
    np.testing.assert_array_equal(back, a)


def test_inv_matches_local():
    n, D = 256, 4
    ctx, moduli = _ctx(n)
    dist = DistNttContext(ctx, D)
    a = _rand(moduli, n, seed=2)
    inv = jax.jit(dist.make_inv(_mesh(D)))
    got = np.asarray(inv(jnp.asarray(a)))
    want = np.asarray(ctx.inv(jnp.asarray(a)))
    np.testing.assert_array_equal(got, want)


def test_batched_ciphertext_shapes():
    """[k, L, n] ciphertext layout with extra leading spec."""
    n, D = 128, 8
    ctx, moduli = _ctx(n, L=2)
    dist = DistNttContext(ctx, D)
    a = _rand(moduli, n, batch=(2,), seed=3)
    fwd = jax.jit(dist.make_fwd(_mesh(D), extra_specs=(None,)))
    got = np.asarray(fwd(jnp.asarray(a)))
    want = np.asarray(ctx.fwd(jnp.asarray(a)))
    np.testing.assert_array_equal(got, want)


def test_negacyclic_mul_matches_local():
    n, D = 256, 8
    ctx, moduli = _ctx(n)
    dist = DistNttContext(ctx, D)
    a = _rand(moduli, n, seed=4)
    b = _rand(moduli, n, seed=5)
    mul = jax.jit(dist.make_negacyclic_mul(_mesh(D)))
    got = np.asarray(mul(jnp.asarray(a), jnp.asarray(b)))
    want = np.asarray(ctx.negacyclic_mul(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("nc", [1, 2, 4])
def test_pipelined_exchanges_bit_exact(nc):
    """Chunked exchange pipelining (round-4 verdict item 6) must not
    change a single bit: nc independent (ppermute → butterfly) chains per
    cross stage, same math."""
    n, D = 256, 8
    ctx, moduli = _ctx(n)
    dist = DistNttContext(ctx, D, pipeline_chunks=nc)
    a = _rand(moduli, n, seed=7)
    fwd = jax.jit(dist.make_fwd(_mesh(D)))
    inv = jax.jit(dist.make_inv(_mesh(D)))
    got = np.asarray(fwd(jnp.asarray(a)))
    np.testing.assert_array_equal(got, np.asarray(ctx.fwd(jnp.asarray(a))))
    back = np.asarray(inv(jnp.asarray(got)))
    np.testing.assert_array_equal(back, a)


def test_pipelined_exchange_census():
    """The compiled HLO must carry nc independent collective-permutes per
    cross stage (the overlap opportunity XLA's async scheduler exploits on
    real ICI), with the SAME total payload bytes as the sequential
    schedule."""
    from abc_tpu.parallel.report import collective_report

    n, D = 256, 8
    ctx, moduli = _ctx(n)
    a = jnp.asarray(_rand(moduli, n, seed=8))
    stats = {}
    for nc in (1, 2):
        dist = DistNttContext(ctx, D, pipeline_chunks=nc)
        fwd = jax.jit(dist.make_fwd(_mesh(D)))
        stats[nc] = collective_report(fwd, a)["collective-permute"]
    logD = 3
    assert stats[1]["ops"] == logD          # sequential: 1 permute/stage
    assert stats[2]["ops"] == 2 * logD      # pipelined: nc permutes/stage
    assert stats[1]["bytes"] == stats[2]["bytes"]   # same traffic, split
