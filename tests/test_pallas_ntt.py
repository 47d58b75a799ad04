"""Pallas NTT kernels (ops/pallas_ntt.py) — interpret-mode bit-exactness.

The compiled path is validated on real TPU hardware by bench.py / the perf
harness; these tests run the same kernel logic through the Pallas
interpreter on CPU and assert bit-identical results against the jnp
stage-loop engine (NttContext) that the rest of the suite already trusts.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from abc_tpu.crypto.ntt import NttContext  # noqa: E402
from abc_tpu.crypto.numthy import gen_ntt_primes  # noqa: E402
from abc_tpu.ops import pallas_ntt as pn  # noqa: E402


def _ctx(n, L=2):
    moduli = gen_ntt_primes(30, L, n)
    return NttContext(n, moduli, engine="jx32"), moduli


def _rand(moduli, n, batch=(), seed=0):
    L = len(moduli)
    rng = np.random.default_rng(seed)
    hi = np.asarray(moduli, dtype=np.uint64).reshape(L, 1)
    return rng.integers(0, hi, size=batch + (L, n),
                        dtype=np.uint64).astype(np.uint32)


def _args(ctx, moduli):
    tabs = pn.get_tables(ctx)
    q = jnp.asarray(np.asarray(moduli, dtype=np.uint32))
    return q, [jnp.asarray(t) for t in tabs]


@pytest.mark.parametrize("n", [256, 2048])
def test_fwd_matches_stage_loop(n):
    ctx, moduli = _ctx(n)
    a = _rand(moduli, n)
    q, (fpw, fps, flw, fls, *_rest) = _args(ctx, moduli)
    got = pn.pallas_fwd_ntt(jnp.asarray(a), q, fpw, fps, flw, fls, n=n,
                            interpret=True)
    want = ctx.fwd(jnp.asarray(a))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("n", [256, 2048])
def test_inv_roundtrip(n):
    ctx, moduli = _ctx(n)
    a = _rand(moduli, n, seed=1)
    q, (fpw, fps, flw, fls, ipw, ips, ilw, ils, ninv, ninv_sh) = \
        _args(ctx, moduli)
    f = pn.pallas_fwd_ntt(jnp.asarray(a), q, fpw, fps, flw, fls, n=n,
                          interpret=True)
    back = pn.pallas_inv_ntt(f, q, ipw, ips, ilw, ils, ninv, ninv_sh, n=n,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(back), a)


def test_inv_matches_stage_loop():
    n = 256
    ctx, moduli = _ctx(n)
    a = _rand(moduli, n, seed=3)
    q, (_, _, _, _, ipw, ips, ilw, ils, ninv, ninv_sh) = _args(ctx, moduli)
    got = pn.pallas_inv_ntt(jnp.asarray(a), q, ipw, ips, ilw, ils, ninv,
                            ninv_sh, n=n, interpret=True)
    want = ctx.inv(jnp.asarray(a))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_batched_rows():
    n = 256
    ctx, moduli = _ctx(n, L=3)
    a = _rand(moduli, n, batch=(2, 2), seed=2)
    q, (fpw, fps, flw, fls, *_rest) = _args(ctx, moduli)
    got = pn.pallas_fwd_ntt(jnp.asarray(a), q, fpw, fps, flw, fls, n=n,
                            interpret=True)
    want = ctx.fwd(jnp.asarray(a))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("n", [256, 2048])
def test_full_plane_batched_fwd_bit_exact(n):
    """The batched-only full-plane lane-table variant (single lazy-Shoup
    multiply on lane stages) must be bit-identical to the stage loop —
    round-4 lever from docs/NTT_ABLATION.md."""
    ctx, moduli = _ctx(n, L=3)
    a = _rand(moduli, n, batch=(8,), seed=4)
    q, (fpw, fps, *_rest) = _args(ctx, moduli)
    flw, fls = pn._gather_lane_planes(jnp.asarray(ctx.fwd_tw),
                                      jnp.asarray(ctx.fwd_tw_sh), n=n)
    got = pn.pallas_fwd_ntt_fp(jnp.asarray(a), q, fpw, fps, flw, fls, n=n,
                               interpret=True)
    want = ctx.fwd(jnp.asarray(a))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_full_plane_batched_inv_bit_exact():
    n = 256
    ctx, moduli = _ctx(n, L=3)
    a = _rand(moduli, n, batch=(8,), seed=5)
    q, (_, _, _, _, ipw, ips, _, _, ninv, ninv_sh) = _args(ctx, moduli)
    ilw, ils = pn._gather_lane_planes(jnp.asarray(ctx.inv_tw),
                                      jnp.asarray(ctx.inv_tw_sh), n=n)
    got = pn.pallas_inv_ntt_fp(jnp.asarray(a), q, ipw, ips, ilw, ils,
                               ninv, ninv_sh, n=n, interpret=True)
    want = ctx.inv(jnp.asarray(a))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_table_cache_keys_by_content_not_identity():
    """Regression: the packed-table cache was keyed by id(ctx); a collected
    context's id can be recycled by a NEW context of a different size,
    serving stale tables (surfaced in the round-3 bench as a reshape error
    when the n=8192 suite context was freed before the n=16384 one was
    built). Content keys (n, moduli) make equal-parameter contexts share a
    build and different-parameter contexts never collide."""
    from abc_tpu.crypto.ntt import NttContext
    from abc_tpu.ops import pallas_ntt

    m1 = NttContext(2048, gen_primes(2048, 2), engine="jx32")
    m2 = NttContext(2048, m1.moduli, engine="jx32")    # same params
    m3 = NttContext(4096, gen_primes(4096, 2), engine="jx32")
    t1 = pallas_ntt.get_tables(m1)
    t2 = pallas_ntt.get_tables(m2)
    t3 = pallas_ntt.get_tables(m3)
    assert t1 is t2                       # shared build for equal params
    assert t3 is not t1
    assert t3[0].shape[-2] == 4096 // 128  # n=4096 rows, not stale n=2048


def gen_primes(n, count):
    from abc_tpu.crypto.numthy import gen_ntt_primes
    return gen_ntt_primes(30, count, n)
