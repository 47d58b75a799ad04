"""CKKS scheme tests: canonical-embedding encode/decode, approximate
homomorphic ops, leveled rescaling, rotations, cross-engine bit-exactness.

The reference only planned CKKS (HAVE_SEAL_CKKS define, CMakeLists.txt:216,
empty README section); tests are authored for the new implementation.
"""

import numpy as np
import pytest

from abc_tpu.crypto.ckks import CkksCiphertext, CkksContext, CkksParams


@pytest.fixture(scope="module")
def ctx():
    return CkksContext(CkksParams.create(256, levels=3, seed=1))


def dec(ctx, ct, k=4):
    return np.real(ctx.decode(ctx.decrypt(ct))[:k])


def test_encode_decode_roundtrip(ctx):
    vals = [1.5, -2.25, 3.0, 0.5]
    z = ctx.decode(ctx.encode(vals))
    np.testing.assert_allclose(np.real(z[:4]), vals, atol=1e-6)
    assert abs(np.imag(z)).max() < 1e-9


def test_encode_decode_complex(ctx):
    vals = [1 + 2j, -0.5 - 1j]
    z = ctx.decode(ctx.encode(vals))
    np.testing.assert_allclose(z[:2], vals, atol=1e-6)


def test_encrypt_decrypt_approximate(ctx):
    vals = [3.14159, -2.71828, 0.0, 100.5]
    got = dec(ctx, ctx.encrypt(ctx.encode(vals)))
    np.testing.assert_allclose(got, vals, atol=1e-3)


def test_add_sub(ctx):
    a = ctx.encrypt(ctx.encode([1.0, 2.0, 3.0]))
    b = ctx.encrypt(ctx.encode([0.5, -0.5, 10.0]))
    np.testing.assert_allclose(dec(ctx, ctx.add(a, b), 3), [1.5, 1.5, 13.0],
                               atol=1e-3)
    np.testing.assert_allclose(dec(ctx, ctx.sub(a, b), 3), [0.5, 2.5, -7.0],
                               atol=1e-3)


def test_multiply_with_relin_and_rescale(ctx):
    a = ctx.encrypt(ctx.encode([1.0, 2.0, 3.0, 4.0]))
    b = ctx.encrypt(ctx.encode([0.5, 0.25, 2.0, -1.0]))
    p = ctx.multiply(a, b)
    assert p.level == ctx.params.L - 1          # one level consumed
    assert p.size == 2                          # relinearized
    np.testing.assert_allclose(dec(ctx, p), [0.5, 0.5, 6.0, -4.0], rtol=1e-3,
                               atol=1e-3)


def test_multiply_depth_two(ctx):
    a = ctx.encrypt(ctx.encode([2.0, -1.5]))
    b = ctx.encrypt(ctx.encode([3.0, 2.0]))
    c = ctx.encrypt(ctx.encode([0.5, 4.0]))
    p = ctx.multiply(ctx.multiply(a, b), c)     # auto level alignment
    assert p.level == ctx.params.L - 2
    np.testing.assert_allclose(dec(ctx, p, 2), [3.0, -12.0], rtol=2e-2,
                               atol=2e-2)


def test_rescale_tracks_scale(ctx):
    a = ctx.encrypt(ctx.encode([1.0]))
    b = ctx.encrypt(ctx.encode([1.0]))
    p = ctx.multiply(a, b, rescale=False)
    assert p.scale == pytest.approx(ctx.params.scale ** 2)
    r = ctx.rescale(p)
    q_dropped = ctx.params.data_primes[p.level - 1]
    assert r.scale == pytest.approx(ctx.params.scale ** 2 / q_dropped)
    assert r.level == p.level - 1


def test_rotation(ctx):
    a = ctx.encrypt(ctx.encode([1.0, 2.0, 3.0, 4.0]))
    np.testing.assert_allclose(dec(ctx, ctx.rotate(a, 1), 3), [2.0, 3.0, 4.0],
                               atol=1e-3)
    # negative rotation wraps the other way within the n/2 slots
    half = ctx.params.n // 2
    r = ctx.rotate(a, -1)
    z = np.real(ctx.decode(ctx.decrypt(r)))
    np.testing.assert_allclose(z[1:5], [1.0, 2.0, 3.0, 4.0], atol=1e-3)


def test_rotation_after_multiply(ctx):
    a = ctx.encrypt(ctx.encode([1.0, 2.0, 3.0, 4.0]))
    p = ctx.multiply(a, a)                      # squares, level drops
    r = ctx.rotate(p, 2)                        # leveled galois key switch
    np.testing.assert_allclose(dec(ctx, r, 2), [9.0, 16.0], rtol=1e-3, atol=1e-3)


def test_mod_drop_alignment(ctx):
    a = ctx.encrypt(ctx.encode([5.0]))
    b = ctx.encrypt(ctx.encode([7.0]))
    p = ctx.multiply(a, b)                      # level L-1
    s = ctx.add(p, ctx.multiply(a, b))          # both aligned at L-1
    np.testing.assert_allclose(dec(ctx, s, 1), [70.0], rtol=1e-3)


def test_jx32_engine_bit_exact():
    c_np = CkksContext(CkksParams.create(256, levels=3, seed=7, engine="np64"))
    c_jx = CkksContext(CkksParams.create(256, levels=3, seed=7, engine="jx32"))
    vals_a, vals_b = [1.0, -2.0, 0.25], [3.0, 0.5, -4.0]
    a_np = c_np.encrypt(c_np.encode(vals_a))
    b_np = c_np.encrypt(c_np.encode(vals_b))
    a_jx = c_jx.encrypt(c_jx.encode(vals_a))
    b_jx = c_jx.encrypt(c_jx.encode(vals_b))
    np.testing.assert_array_equal(np.asarray(a_jx.data), a_np.data)
    r_np = c_np.rotate(c_np.multiply(a_np, b_np), 1)
    r_jx = c_jx.rotate(c_jx.multiply(a_jx, b_jx), 1)
    np.testing.assert_array_equal(np.asarray(r_jx.data), r_np.data)


def test_hoisted_rotations_match_sequential():
    import numpy as np
    from abc_tpu.crypto.ckks import CkksCiphertext, CkksContext, CkksParams
    params = CkksParams.create(512, levels=3, seed=9)
    ctx = CkksContext(params)
    vals = np.linspace(-1.0, 1.0, params.n // 2)
    ct = ctx.encrypt(ctx.encode(vals))
    steps = [0, 1, 3, -2]
    hoisted = ctx.hoisted_rotations(ct, steps)
    for s, h in zip(steps, hoisted):
        want = ctx.decode(ctx.decrypt(ctx.rotate(ct, s))).real
        got = ctx.decode(ctx.decrypt(h)).real
        np.testing.assert_allclose(got, want, atol=1e-3)


def test_rotations_share_decomposition():
    """Transparent hoisting in CkksContext.rotate: k rotations of the SAME
    ciphertext cost ONE key-switch decomposition (mirrors
    BfvContext._decompose_cached; tests/test_lazy_relin.py)."""
    import numpy as np
    from abc_tpu.crypto.ckks import CkksCiphertext, CkksContext, CkksParams

    params = CkksParams.create(1024, levels=3, engine="np64", seed=5)
    ctx = CkksContext(params)
    vals = np.arange(params.slot_count, dtype=np.float64)
    ct = ctx.encrypt(ctx.encode(vals, level=params.L))
    for k in ctx.counters:
        ctx.counters[k] = 0
    outs = [ctx.rotate(ct, s) for s in (1, 2, 5)]
    assert ctx.counters["galois"] == 3
    assert ctx.counters["decomp"] == 1
    assert ctx.counters["decomp_hit"] == 2
    for s, o in zip((1, 2, 5), outs):
        got = ctx.decode(ctx.decrypt(o))
        want = np.roll(vals, -s)
        assert np.max(np.abs(np.real(got) - want)) < 1e-2


# ---------------------------------------------------------------- hybrid KS
# CKKS analogue of the BFV ks_digits tests (tests/test_bfv.py): the leveled
# hybrid construction must stay correct at every level, including levels that
# cut a digit in half (partial digit = sub-product of the active primes).

@pytest.fixture(scope="module")
def ctx_k2():
    return CkksContext(CkksParams.create(256, levels=4, seed=7, ks_digits=2))


def test_hybrid_decompose_shape(ctx_k2):
    """k=2, levels=4: the decomposition carries ceil(l/2) digit rows over
    l+2 extended-base limbs — the row saving that motivates hybrid KS."""
    ctx = ctx_k2
    L, n = ctx.params.L, ctx.params.n
    assert ctx.params.num_ks_digits == 2
    d = np.zeros((L, n), dtype=np.uint32)
    D = ctx._decompose_ntt(d, L)
    assert D.shape == (2, L + 2, n)             # 2*(4+2)=12 rows vs 4*5=20
    D3 = ctx._decompose_ntt(d[:3], 3)           # partial second digit
    assert D3.shape == (2, 3 + 2, n)


def test_hybrid_multiply_relin_rescale(ctx_k2):
    ctx = ctx_k2
    a = ctx.encrypt(ctx.encode([1.0, 2.0, 3.0, 4.0]))
    b = ctx.encrypt(ctx.encode([0.5, 0.25, 2.0, -1.0]))
    p = ctx.multiply(a, b)
    assert p.level == ctx.params.L - 1 and p.size == 2
    np.testing.assert_allclose(dec(ctx, p), [0.5, 0.5, 6.0, -4.0], rtol=1e-3,
                               atol=1e-3)


def test_hybrid_multiply_depth_two_partial_digit(ctx_k2):
    """The second multiply relinearizes at level 3 (= a PARTIAL digit with
    k=2: digits {q0,q1}, {q2}) — exercises the level-restricted sub-product
    recombination path."""
    ctx = ctx_k2
    a = ctx.encrypt(ctx.encode([2.0, -1.5]))
    b = ctx.encrypt(ctx.encode([3.0, 2.0]))
    c = ctx.encrypt(ctx.encode([0.5, 4.0]))
    p = ctx.multiply(ctx.multiply(a, b), c)
    assert p.level == ctx.params.L - 2
    np.testing.assert_allclose(dec(ctx, p, 2), [3.0, -12.0], rtol=2e-2,
                               atol=2e-2)


def test_hybrid_rotation_full_and_partial_level(ctx_k2):
    ctx = ctx_k2
    half = ctx.params.slot_count
    vals = np.arange(half, dtype=np.float64)
    ct = ctx.encrypt(ctx.encode(vals))
    got = np.real(ctx.decode(ctx.decrypt(ctx.rotate(ct, 3))))
    np.testing.assert_allclose(got, np.roll(vals, -3), atol=1e-2)
    low = ctx.mod_drop_to(ct, 3)                # partial digit level
    got = np.real(ctx.decode(ctx.decrypt(ctx.rotate(low, -2))))
    np.testing.assert_allclose(got, np.roll(vals, 2), atol=1e-2)


def test_hybrid_jx32_bit_exact_np64():
    """The k=2 key-switch path must be bit-identical across engines (same
    seed => same keys => same uint32 arrays)."""
    import jax
    with jax.default_device(jax.devices("cpu")[0]):
        p64 = CkksParams.create(256, levels=4, seed=11, ks_digits=2)
        p32 = CkksParams.create(256, levels=4, seed=11, ks_digits=2,
                                engine="jx32")
        c64, c32 = CkksContext(p64), CkksContext(p32)
        vals = [1.25, -0.75, 2.0]
        a64 = c64.encrypt(c64.encode(vals))
        a32 = c32.encrypt(c32.encode(vals))     # same rng stream as c64
        np.testing.assert_array_equal(np.asarray(a32.data), a64.data)
        r64 = c64.rotate(c64.multiply(a64, a64), 1)
        r32 = c32.rotate(c32.multiply(a32, a32), 1)
        np.testing.assert_array_equal(np.asarray(r64.data),
                                      np.asarray(r32.data))


def test_hybrid_checkpoint_roundtrip(tmp_path):
    from abc_tpu.utils.checkpoint import load_ckks_context, save_ckks_context
    ctx = CkksContext(CkksParams.create(256, levels=4, seed=3, ks_digits=2))
    ct = ctx.encrypt(ctx.encode([4.5, -1.0]))
    ctx.get_relin_key()
    path = str(tmp_path / "ckks_k2.npz")
    save_ckks_context(ctx, path)
    ctx2 = load_ckks_context(path)
    assert ctx2.params.ks_digits == 2
    got = np.real(ctx2.decode(ctx2.decrypt(
        ctx2.multiply(ct, ct))))[:2]
    np.testing.assert_allclose(got, [20.25, 1.0], rtol=1e-3, atol=1e-3)


def test_key_material_is_order_independent():
    """Round 4: CKKS keys now come from the counter PRNG at (seed, key id)
    — two equal-seed contexts must produce IDENTICAL keys regardless of
    the order keys are materialized in (previously the shared host
    Generator made key values depend on build order)."""
    import numpy as np
    from abc_tpu.crypto.ckks import CkksCiphertext, CkksContext, CkksParams

    p = CkksParams.create(512, levels=2, engine="np64", seed=99)
    c1 = CkksContext(p)
    c2 = CkksContext(CkksParams.create(512, levels=2, engine="np64",
                                       seed=99))
    g = 3
    r1 = c1.get_relin_key()          # relin first, then galois
    k1 = c1.get_galois_key(g)
    k2 = c2.get_galois_key(g)        # galois first, then relin
    r2 = c2.get_relin_key()
    for a, b in ((r1, r2), (k1, k2)):
        assert np.array_equal(np.asarray(a[0]), np.asarray(b[0]))
        assert np.array_equal(np.asarray(a[1]), np.asarray(b[1]))
    assert c1.public_seed == c2.public_seed != 99


def test_device_keygen_bit_exact_vs_host():
    """Round 4: jx32 CKKS contexts build switching keys ON DEVICE through
    BfvContext's batched composition; the result must equal the np64 host
    build bit-for-bit (same counter-PRNG streams, same error draws, same
    target-secret identity)."""
    import numpy as np
    from abc_tpu.crypto.ckks import CkksCiphertext, CkksContext, CkksParams

    pn = CkksParams.create(512, levels=2, engine="np64", seed=77)
    pj = CkksParams.create(512, levels=2, engine="jx32", seed=77)
    cn, cj = CkksContext(pn), CkksContext(pj)
    g = 3
    for a, b in ((cn.get_relin_key(), cj.get_relin_key()),
                 (cn.get_galois_key(g), cj.get_galois_key(g))):
        assert np.array_equal(np.asarray(a[0]), np.asarray(b[0]))
        assert np.array_equal(np.asarray(a[1]), np.asarray(b[1]))


# ---- round-5 automatic level/scale alignment (VERDICT weak 6) -------------

def test_add_mixed_levels_auto_aligns(ctx):
    """Fresh (level L) + rescaled product (level L-1): add mod-drops the
    fresher operand automatically — no manual choreography."""
    a = ctx.encrypt(ctx.encode([1.0, 2.0]))
    b = ctx.encrypt(ctx.encode([3.0, 4.0]))
    p = ctx.multiply(a, b)                      # level L-1, post-rescale
    s = ctx.add(p, a)                           # L-1 vs L
    assert s.level == ctx.params.L - 1
    np.testing.assert_allclose(dec(ctx, s, 2), [4.0, 10.0], rtol=1e-2,
                               atol=1e-2)


def test_add_unrescaled_product_auto_rescales(ctx):
    """Raw product at scale² + fresh at scale: add rescales the product
    side down, then aligns levels (previously raised 'rescale first')."""
    a = ctx.encrypt(ctx.encode([1.0, 2.0]))
    b = ctx.encrypt(ctx.encode([3.0, 4.0]))
    p = ctx.multiply(a, b, rescale=False)       # scale², level L
    s = ctx.add(p, a)
    np.testing.assert_allclose(dec(ctx, s, 2), [4.0, 10.0], rtol=1e-2,
                               atol=1e-2)


def test_sub_scale_drift_absorbed(ctx):
    """Two products rescaled by DIFFERENT primes carry slightly different
    scales; sub relabels to the common scale (drift ~2^-11 relative)."""
    a = ctx.encrypt(ctx.encode([2.0]))
    b = ctx.encrypt(ctx.encode([5.0]))
    p1 = ctx.multiply(a, b)                     # level L-1, scale s²/q_{L-1}
    p2 = ctx.multiply(ctx.multiply(a, a), b)    # level L-2 after 2 rescales
    s = ctx.sub(p2, p1)                         # 20 - 10
    np.testing.assert_allclose(dec(ctx, s, 1), [10.0], rtol=1e-2, atol=1e-2)


def test_add_bridges_fresh_operand_down_not_up():
    """Fresh (scale 2^28, full level) + twice-rescaled (scale ~2^24, one
    limb left): alignment must BRIDGE the fresh side down through its
    spare levels, keeping the common scale the SMALL one. Lifting the
    rescaled side up to 2^28 instead leaves <2 bits of coefficient
    headroom in the one remaining 30-bit limb — the DC coefficient wraps
    q0 and every slot shifts by q0/scale ≈ +4 (the
    tests/test_auto_params_fuzz.py seed-4 failure, fixed round 5)."""
    c = CkksContext(CkksParams.create(256, levels=3, seed=2,
                                      scale_bits=28))
    # mean ≈ -1.6 so the result's DC coefficient lands in (q0/2, q0) at a
    # lifted 2^28 scale but comfortably inside at the bridged ~2^24 scale
    vals = [-1.6] * 4
    w = c.encrypt(c.encode(vals))
    acc = c.rescale(c._scale_lift(w, round(c.params.data_primes[2]
                                           / 2 ** 4)))    # scale ~2^24, L2
    acc = c.rescale(c._scale_lift(acc, round(c.params.data_primes[1]
                                             / 2 ** 0)))  # scale ~2^24, L1
    s = c.add(acc, w)
    assert s.scale < 2 ** 26, "fresh side must bridge DOWN"
    np.testing.assert_allclose(dec(c, s, 4), [2 * v for v in vals],
                               rtol=1e-2, atol=1e-2)


def test_device_decrypt_bit_exact_vs_host():
    """jx32 contexts decrypt ON DEVICE (round 5): the [level, n] residues
    must equal the np64 host decrypt bit-for-bit, at full level, after a
    rescale, and for a lazy size-3 product."""
    pn = CkksParams.create(256, levels=3, seed=21, engine="np64")
    pj = CkksParams.create(256, levels=3, seed=21, engine="jx32")
    cn, cj = CkksContext(pn), CkksContext(pj)
    vals = [1.25, -0.5, 3.0]
    ct_n = cn.encrypt(cn.encode(vals))
    ct_j = CkksCiphertext(np.asarray(ct_n.data), ct_n.level, ct_n.scale)
    for make in (
        lambda c, ct: ct,                                  # fresh
        lambda c, ct: c.multiply(ct, ct),                  # relin+rescale
        lambda c, ct: c.multiply(ct, ct, relinearize=False,
                                 rescale=False),           # lazy size-3
    ):
        a = cn.decrypt(make(cn, ct_n))
        b = cj.decrypt(make(cj, ct_j))
        assert a.level == b.level and a.scale == b.scale
        assert np.array_equal(np.asarray(a.coeffs_rns),
                              np.asarray(b.coeffs_rns))
    # end-to-end value check through the device path
    got = cj.decode(cj.decrypt(cj.multiply(ct_j, ct_j))).real[:3]
    np.testing.assert_allclose(got, np.asarray(vals) ** 2, rtol=1e-2,
                               atol=1e-2)
