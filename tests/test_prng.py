"""Cross-engine tests of the counter PRNG (crypto/prng.py): the np64 host
path and the jx32 in-jit device path must produce BIT-IDENTICAL uniform RNS
polynomials — this is what lets jx32 contexts generate key material on
device without breaking the np64↔jx32 ciphertext-equality contract."""

import numpy as np
import pytest

from abc_tpu.crypto.prng import (
    derive_key, random_bits_np, threefry2x32, uniform_rns_jx, uniform_rns_np)

# primes in [2^29, 2^30) — the jx32 Barrett range all parameter presets use
MODULI = [536903681, 537133057, 537395201]


def test_threefry_kat():
    """Known-answer: Threefry-2x32, 20 rounds, zero key/counter.

    Reference vector from the Random123 suite (threefry2x32 KAT:
    key=0, ctr=0 → 0x6b200159 0x99ba4efe)."""
    x0, x1 = threefry2x32(np, 0, 0, np.zeros(1, np.uint32),
                          np.zeros(1, np.uint32))
    assert (int(x0[0]), int(x1[0])) == (0x6B200159, 0x99BA4EFE)


def test_threefry_ones_kat():
    """Random123 KAT: key=(-1,-1), ctr=(-1,-1) → 0x1cb996fc 0xbb002be7."""
    ones = np.full(1, 0xFFFFFFFF, np.uint32)
    x0, x1 = threefry2x32(np, 0xFFFFFFFF, 0xFFFFFFFF, ones, ones)
    assert (int(x0[0]), int(x1[0])) == (0x1CB996FC, 0xBB002BE7)


def test_streams_differ():
    a = random_bits_np(123, "pk", (4,))
    b = random_bits_np(123, "relin/d0", (4,))
    c = random_bits_np(124, "pk", (4,))
    assert not np.array_equal(a[0], b[0])
    assert not np.array_equal(a[0], c[0])
    # deterministic
    a2 = random_bits_np(123, "pk", (4,))
    assert np.array_equal(a[0], a2[0]) and np.array_equal(a[1], a2[1])


def test_crc32_colliding_labels_get_distinct_keys():
    """Round-4 advisor fix: label separation must not rest on 32 bits of
    crc32 — "plumless"/"buckeroo" is the classic crc32 collision pair, and
    a silent key collision between two stream labels would reuse the same
    uniform `a` across two RLWE samples. derive_key now spreads 128 bits
    of SHA-256 through the key words."""
    import zlib
    assert zlib.crc32(b"plumless") == zlib.crc32(b"buckeroo")  # the premise
    assert derive_key(123, "plumless") != derive_key(123, "buckeroo")
    a = random_bits_np(123, "plumless", (8,))
    b = random_bits_np(123, "buckeroo", (8,))
    assert not np.array_equal(a[0], b[0])


def test_seed_domain_split():
    """split_domain: deterministic, domain-separated, and the BfvContext
    public/secret domains actually differ (publishing the public seed must
    not hand out the error-stream keys — advisor round-3 medium)."""
    from abc_tpu.crypto.prng import split_domain
    pub = split_domain(42, "public")
    sec = split_domain(42, "secret")
    assert pub == split_domain(42, "public")        # deterministic
    assert pub != sec
    assert pub != split_domain(43, "public")
    assert 0 <= pub < 2 ** 63 and 0 <= sec < 2 ** 63


def test_bfv_public_seed_is_not_master_or_secret_domain():
    from abc_tpu.crypto.bfv import BfvContext
    from abc_tpu.crypto.params import BfvParams
    from abc_tpu.crypto.prng import split_domain
    ctx = BfvContext(BfvParams.create(1024, engine="np64", seed=77))
    assert ctx.public_seed != 77
    assert ctx.public_seed == split_domain(77, "public")
    assert ctx.public_seed != ctx._sec_seed
    # reproducibility contract survives the split: same master seed ⇒ same
    # keys and ciphertexts
    ctx2 = BfvContext(BfvParams.create(1024, engine="np64", seed=77))
    assert np.array_equal(ctx.pk_a_ntt, ctx2.pk_a_ntt)
    assert np.array_equal(ctx.pk_b_ntt, ctx2.pk_b_ntt)
    ct = ctx.encrypt(ctx.encode([1, 2, 3]))
    ct2 = ctx2.encrypt(ctx2.encode([1, 2, 3]))
    assert np.array_equal(ct.data, ct2.data)
    assert ctx.decode(ctx.decrypt(ct))[:3] == [1, 2, 3]


def test_uniform_np_in_range():
    u = uniform_rns_np(7, "x", MODULI, 256)
    assert u.shape == (3, 256) and u.dtype == np.uint32
    for l, q in enumerate(MODULI):
        assert u[l].max() < q
    # distribution sanity: mean near q/2 (loose)
    for l, q in enumerate(MODULI):
        assert abs(u[l].astype(np.float64).mean() / q - 0.5) < 0.1


def test_np_jx_bit_identical():
    import jax
    with jax.default_device(jax.devices("cpu")[0]):
        for stream in ["pk", "galois_3/d2", "enc/17"]:
            want = uniform_rns_np(987654321, stream, MODULI, 512)
            got = np.asarray(jax.jit(
                lambda: uniform_rns_jx(987654321, stream, MODULI, 512))())
            assert np.array_equal(want, got), stream


def test_jx_inside_jit_trace():
    """uniform_rns_jx is safe under an outer jit with other traced work."""
    import jax
    import jax.numpy as jnp

    with jax.default_device(jax.devices("cpu")[0]):
        @jax.jit
        def f(x):
            u = uniform_rns_jx(42, "k", MODULI, 128)
            return x + u.astype(jnp.uint32)

        out = np.asarray(f(jnp.zeros((3, 128), jnp.uint32)))
    assert np.array_equal(out, uniform_rns_np(42, "k", MODULI, 128))
