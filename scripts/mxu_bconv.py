"""MXU base-conversion prototype (round-5, VERDICT weak 7).

The BEHZ fast base conversion is the contraction
    out[d, j] = Σ_i y[i, j] · T[i, d]   mod q_d          (i over K limbs)
— structurally a [D, K] × [K, n] MATMUL over the limb axis, unlike the
NO-GO butterfly MXU path (docs/DESIGN_NOTES.md): the contraction is dense
and batched, so it CAN be phrased as f32 MXU matmuls with exact 8-bit
digit decomposition:

    y = Σ_a ya·2^{8a},  T = Σ_b Tb·2^{8b}  (digits < 2^8)
    S_ab[d, j] = Σ_i Tb[i, d]·ya[i, j]     — f32 matmul, products < 2^16,
                                             sums < K·2^16 ≤ 2^24 exact
    out = Σ_s (Σ_{a+b=s} S_ab mod q_d) · (2^{8s} mod q_d)   mod q_d

Pencil: 16 matmuls of [D, K]×[K, n]; at K = L ≈ 6-14 the MXU contraction
dimension is far under its 128 lanes (~5-11%% utilization), so the win is
not obvious — hence this measured A/B. Run on the real chip:

    python scripts/mxu_bconv.py            # TPU (via axon)
    python scripts/mxu_bconv.py cpu        # CPU sanity (exactness only)

Protocol: exactness assert vs the shipping VPU `_fastconv`, then K_EST
alternating two-point chain estimates per variant (median), per the rig
rules (~22 ms fixed dispatch; single estimates drift ±10%%).
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from abc_tpu.utils.compcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from abc_tpu.crypto.numthy import gen_ntt_primes  # noqa: E402
from abc_tpu.ops.modarith import barrett_mu, jx32  # noqa: E402

N = 8192
K = 6            # source limbs (n=8192 preset: L=6)
D = 8            # destination limbs (Bsk = L+2)
CHAIN = 512
REPEATS = 3
K_EST = 5


def _acc_mod(terms, q, axis=0):
    acc = None
    n_terms = terms.shape[axis]
    for i in range(n_terms):
        t = jnp.take(terms, i, axis=axis)
        acc = t if acc is None else jx32.add(acc, t, q)
    return acc


def vpu_fastconv(y, table, q_cols, mu_cols):
    """The shipping path (crypto/behz.py _fastconv): broadcast + Barrett."""
    prod = jx32.mul(y[:, None, :], table[:, :, None],
                    q_cols[None, :, :], mu_cols[None, :, :])
    return _acc_mod(prod, q_cols, axis=0)


def mxu_fastconv(y, t_digits, p8s, q_cols, mu_cols):
    """8-bit digit-decomposed f32 matmuls on the MXU.

    y: [K, n] u32; t_digits: [4, K, D] f32 (8-bit digits of T);
    p8s: [7, D, 1] u32 (2^{8s} mod q_d)."""
    # decompose y into 4 exact 8-bit digit planes, f32
    ya = jnp.stack([((y >> (8 * a)) & jnp.uint32(0xFF)).astype(jnp.float32)
                    for a in range(4)])                        # [4, K, n]
    out = None
    for s in range(7):
        acc = None
        for a in range(max(0, s - 3), min(4, s + 1)):
            b = s - a
            # [D, K] @ [K, n] — MXU; exact in f32 (< 2^24)
            part = jnp.matmul(t_digits[b].T, ya[a],
                              preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        # acc < (#pairs ≤ 4)·K·2^16 < 2^25 — exact f32 integer; reduce
        m = acc.astype(jnp.uint32)
        m = jnp.where(m >= q_cols, m - q_cols, m)   # < 2·q after one sub?
        m = jnp.where(m >= q_cols, m - q_cols, m)
        # m < 2^25 < q for 30-bit primes — the subs are no-ops, kept for
        # safety at smaller primes
        term = jx32.mul(m, p8s[s], q_cols, mu_cols)
        out = term if out is None else jx32.add(out, term, q_cols)
    return out


def main():
    rng = np.random.default_rng(7)
    src = gen_ntt_primes(30, K, N)
    dst = gen_ntt_primes(30, D, N, exclude=src)
    T = np.stack([[p % d for d in dst] for p in src]).astype(np.uint32)
    q_cols = jnp.asarray(np.asarray(dst, dtype=np.uint32).reshape(D, 1))
    mu_cols = jnp.asarray(np.asarray([barrett_mu(d) for d in dst],
                                     dtype=np.uint32).reshape(D, 1))
    t_dev = jnp.asarray(T)
    t_digits = jnp.stack(
        [((jnp.asarray(T) >> (8 * b)) & jnp.uint32(0xFF)).astype(jnp.float32)
         for b in range(4)])                                   # [4, K, D]
    p8s = jnp.asarray(np.stack(
        [[pow(2, 8 * s, d) for d in dst] for s in range(7)]
    ).astype(np.uint32).reshape(7, D, 1))

    y0 = jnp.asarray(rng.integers(0, min(src), size=(K, N),
                                  dtype=np.uint64).astype(np.uint32))

    # --- exactness ---------------------------------------------------------
    ref = jax.jit(lambda y: vpu_fastconv(y, t_dev, q_cols, mu_cols))(y0)
    got = jax.jit(lambda y: mxu_fastconv(y, t_digits, p8s, q_cols,
                                         mu_cols))(y0)
    assert np.array_equal(np.asarray(ref), np.asarray(got)), \
        "MXU digit decomposition is NOT exact"
    print(f"exactness OK (K={K}, D={D}, n={N})")

    # --- two-point chained timing, alternating variants --------------------
    # chain steps stay dependent: feed the output back through a cheap mod
    # into the y-shape (slice D→K rows)
    def step_vpu(y):
        return vpu_fastconv(y, t_dev, q_cols, mu_cols)[:K]

    def step_mxu(y):
        return mxu_fastconv(y, t_digits, p8s, q_cols, mu_cols)[:K]

    def make_chain(step, c):
        @jax.jit
        def chained(y):
            return jax.lax.fori_loop(0, c, lambda i, v: step(v), y)
        return chained

    def timed(f):
        jax.block_until_ready(f(y0))
        ts = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            jax.block_until_ready(f(y0))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    fns = {name: {c: make_chain(step, c) for c in (CHAIN, CHAIN // 2)}
           for name, step in (("vpu", step_vpu), ("mxu", step_mxu))}
    est = {"vpu": [], "mxu": []}
    for _ in range(K_EST):
        for name in ("vpu", "mxu"):
            tf = timed(fns[name][CHAIN])
            th = timed(fns[name][CHAIN // 2])
            est[name].append((tf - th) / (CHAIN // 2))
    for name in ("vpu", "mxu"):
        e = sorted(est[name])
        med = e[len(e) // 2]
        print(f"{name}: {med * 1e6:.2f} us/conv  "
              f"[{e[0] * 1e6:.2f}-{e[-1] * 1e6:.2f}]")
    ratio = sorted(est["vpu"])[K_EST // 2] / sorted(est["mxu"])[K_EST // 2]
    print(f"mxu_speedup_over_vpu: {ratio:.2f}x "
          f"({'GO' if ratio > 1.1 else 'NO-GO'}) on "
          f"{jax.default_backend()}")


if __name__ == "__main__":
    main()
