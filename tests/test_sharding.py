"""Multi-chip sharding tests on the virtual 8-device CPU mesh: the sharded
key-switch/rotation must be bit-identical to the single-device path."""

import numpy as np
import pytest

import jax

from abc_tpu.crypto.bfv import BfvCiphertext, BfvContext
from abc_tpu.crypto.numthy import gen_ntt_primes
from abc_tpu.crypto.params import BfvParams


def make_ctx(L=4, n=1024, engine="jx32", seed=3):
    t = gen_ntt_primes(20, 1, n)[0]
    primes = gen_ntt_primes(30, L + 1, n, exclude=[t])
    params = BfvParams(n=n, coeff_modulus=primes, plain_modulus=t,
                       engine=engine, seed=seed)
    return BfvContext(params)


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_sharded_rotation_bit_exact():
    from abc_tpu.parallel.sharding import make_mesh, sharded_rotate_rows

    ctx = make_ctx()
    mesh = make_mesh(dp=2, limb=4)
    vals = list(range(16))
    ct = ctx.encrypt(ctx.encode(vals))

    ref = ctx.rotate_rows(ct, 3)

    import jax.numpy as jnp
    data = jnp.asarray(np.asarray(ct.data))
    sharded = sharded_rotate_rows(ctx, mesh, data, 3)
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(ref.data))

    got = ctx.decode(ctx.decrypt(BfvCiphertext(sharded)))[:10]
    assert got == vals[3:13]


def test_sharded_key_switch_jits():
    from abc_tpu.parallel.sharding import make_mesh, sharded_key_switch

    ctx = make_ctx()
    mesh = make_mesh(dp=1, limb=4)
    ct = ctx.encrypt(ctx.encode([1, 2, 3]))
    ksk = ctx.get_relin_key()

    import jax.numpy as jnp
    d = jnp.asarray(np.asarray(ct.data))[1]

    jitted = jax.jit(lambda x: sharded_key_switch(ctx, mesh, x, ksk))
    k0, k1 = jitted(d)
    rk0, rk1 = ctx._key_switch(d, ksk)
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(rk0))
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(rk1))
