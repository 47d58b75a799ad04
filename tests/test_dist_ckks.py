"""Sharded CKKS multiply+relin (parallel/dist_ckks.py) — bit-identical to
the single-device CkksContext.multiply on the virtual CPU mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from abc_tpu.crypto.ckks import CkksCiphertext, CkksContext, CkksParams  # noqa: E402
from abc_tpu.parallel.dist_ckks import DistCkksMultiplier  # noqa: E402


@pytest.mark.parametrize("D", [2, 4])
def test_sharded_multiply_matches_local(D):
    n, levels = 128, 3
    params = CkksParams.create(n, levels=levels, engine="jx32", seed=11)
    ctx = CkksContext(params)
    ctx.get_relin_key()
    mesh = Mesh(np.asarray(jax.devices()[:D]), ("coeff",))
    dist = DistCkksMultiplier(ctx, mesh)

    vals = np.linspace(-1.0, 1.0, n // 2)
    a = ctx.encrypt(ctx.encode(vals))
    b = ctx.encrypt(ctx.encode(vals[::-1].copy()))
    a_dev = jnp.asarray(np.asarray(a.data))
    b_dev = jnp.asarray(np.asarray(b.data))

    got = np.asarray(jax.jit(dist)(a_dev, b_dev))
    want = np.asarray(ctx.multiply(
        CkksCiphertext(a_dev, a.level, a.scale),
        CkksCiphertext(b_dev, b.level, b.scale), rescale=False).data)
    np.testing.assert_array_equal(got, want)


def test_sharded_multiply_decrypts_correctly():
    n, levels, D = 128, 3, 8
    params = CkksParams.create(n, levels=levels, engine="jx32", seed=12)
    ctx = CkksContext(params)
    ctx.get_relin_key()
    mesh = Mesh(np.asarray(jax.devices()[:D]), ("coeff",))
    dist = DistCkksMultiplier(ctx, mesh)

    vals = np.linspace(0.1, 0.9, n // 2)
    a = ctx.encrypt(ctx.encode(vals))
    b = ctx.encrypt(ctx.encode(vals))
    out = jax.jit(dist)(jnp.asarray(np.asarray(a.data)),
                        jnp.asarray(np.asarray(b.data)))
    ct = CkksCiphertext(np.asarray(out), a.level, a.scale * b.scale)
    got = ctx.decode(ctx.decrypt(ct)).real[:n // 2]
    np.testing.assert_allclose(got, vals * vals, atol=0.05)
