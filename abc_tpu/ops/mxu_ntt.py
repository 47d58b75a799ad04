"""MXU four-step NTT prototype — small-prime negacyclic NTT as int8 matmuls.

THE go/no-go experiment three rounds of DESIGN_NOTES paper math deferred
(docs/DESIGN_NOTES.md §"Why the Pallas NTT is roll-based"): at small primes
the four-step factorization n = R·C turns the transform into two dense
integer matmuls that run on the MXU instead of VPU butterflies.

    X2d = (T ∘ (A · Y)) · Bᵀ,   Y = x.reshape(R, C),  out = X2d.reshape(n)

with (ψ a primitive 2n-th root, ψ' = ψ^C, ω = ψ^(2R); derivation: write
output p = h·C + l, then brv_n(p) = brv_C(l)·R + brv_R(h), so the
ψ-exponent e_p = 2·brv_n(p)+1 satisfies e_p ≡ 2·brv_R(h)+1 (mod 2R)):

    A[h, j1] = ψ'^((2·brv_R(h)+1)·j1)      [R, R]  negacyclic R-point DFT
    T[h, j2] = ψ^((2·brv_R(h)+1)·j2)       [R, C]  cross twiddle
    B[l, j2] = ω^(brv_C(l)·j2)             [C, C]  cyclic C-point DFT

This reproduces EXACTLY the stack's forward convention (natural input →
position p holds the eval at ψ^(2·brv_n(p)+1)) — asserted bit-for-bit
against the np64 NttContext oracle in tests/test_mxu_ntt.py.

Integer mapping to the MXU: every operand is decomposed into base-2^7
digits (int8-safe), one s8×s8→s32 matmul per digit pair, recombined with
Shoup multiplies by the 2^(7k) mod q residues. A d-digit prime costs d²
matmuls + (2d−1) recombination buckets per matmul stage:

    14-bit primes (n ≤ 2048, e.g. 12289): d=2 → 4 matmuls, 3 buckets
    17-bit primes (n = 8192 minimum: q ≡ 1 mod 2n forces q ≥ 16385, so
    the round-3 "≤15-bit at n=8192" framing was infeasible — the smallest
    8192-degree negacyclic primes are 65537/114689/147457): d=3 →
    9 matmuls, 5 buckets.

Prototype scope (deliberate): forward transform only, single-shot jnp
(XLA dots — no Pallas), correctness + measured throughput to settle the
go/no-go. See docs/DESIGN_NOTES.md §"MXU four-step: measured" for the
verdict numbers.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import numpy as np

from abc_tpu.crypto.numthy import find_minimal_2nth_root

DIGIT_BITS = 7
DIGIT_MASK = (1 << DIGIT_BITS) - 1


def _brv(k: int, bits: int) -> int:
    r = 0
    for _ in range(bits):
        r = (r << 1) | (k & 1)
        k >>= 1
    return r


@functools.lru_cache(maxsize=None)
def _ord(base: int, q: int) -> int:
    o, acc = 1, base % q
    while acc != 1:
        acc = acc * base % q
        o += 1
    return o


def _digits(m: np.ndarray, d: int) -> np.ndarray:
    """[..., d] int8 base-2^7 digit planes of a uint32 array."""
    planes = [((m >> (DIGIT_BITS * k)) & DIGIT_MASK).astype(np.int8)
              for k in range(d)]
    return np.stack(planes, axis=0)


class FourStepPlan(NamedTuple):
    n: int
    R: int
    C: int
    q: int
    d: int               # digit planes per operand
    A_dig: np.ndarray    # [d, R, R] int8
    B_dig: np.ndarray    # [d, C, C] int8  (Bᵀ digits, ready for V @ Bt)
    T_w: np.ndarray      # [R, C] uint32 twiddles
    T_sh: np.ndarray     # [R, C] uint32 Shoup companions
    f_w: np.ndarray      # [2d-1] uint32 2^(7k) mod q bucket residues
    f_sh: np.ndarray     # [2d-1] uint32 companions
    mu32: int            # floor(2^32 / q) for the pre-reduction


def make_plan(n: int, q: int, R: int | None = None) -> FourStepPlan:
    logn = n.bit_length() - 1
    if R is None:
        R = min(128, n // 16)        # MXU-friendly outer size
    C = n // R
    logR, logC = R.bit_length() - 1, C.bit_length() - 1
    psi = find_minimal_2nth_root(n, q)
    psi_p = pow(psi, C, q)           # primitive 2R-th root
    omega = pow(psi, 2 * R, q)       # primitive C-th root
    h = np.arange(R)
    eh = np.array([2 * _brv(int(v), logR) + 1 for v in h], dtype=object)
    j1 = np.arange(R)
    j2 = np.arange(C)
    ell = np.array([_brv(int(v), logC) for v in np.arange(C)], dtype=object)

    def powm(base, rows, cols):
        o = _ord(base, q)
        e = (rows.reshape(-1, 1) * cols.reshape(1, -1)) % o
        lut = {x: pow(base, x, q) for x in set(int(v) for v in e.ravel())}
        return np.array([[lut[int(x)] for x in row] for row in e],
                        dtype=np.uint64).astype(np.uint32)

    A = powm(psi_p, eh, j1)                       # [R, R]
    T = powm(psi, eh, j2)                         # [R, C]
    B = powm(omega, ell, j2)                      # [C, C] (l rows)
    d = -(-q.bit_length() // DIGIT_BITS)
    f = np.array([pow(2, DIGIT_BITS * k, q) for k in range(2 * d - 1)],
                 dtype=np.uint64)
    shoup = lambda w: ((w.astype(np.uint64) << np.uint64(32)) //
                       np.uint64(q)).astype(np.uint32)
    return FourStepPlan(
        n=n, R=R, C=C, q=q, d=d,
        A_dig=_digits(A, d), B_dig=_digits(B.T.copy(), d),
        T_w=T, T_sh=shoup(T),
        f_w=f.astype(np.uint32), f_sh=shoup(f),
        mu32=(1 << 32) // q)


# --------------------------------------------------------------------------
# device path (jnp — XLA lowers the int8 dots onto the MXU)
# --------------------------------------------------------------------------

def _shoup_mul(a, w, wsh, q):
    """a·w mod q representative in [0, 2q) — lazy Shoup, a < 4q."""
    import jax.numpy as jnp
    mask = jnp.uint32(0xFFFF)
    a0, a1 = a & mask, a >> 16
    b0, b1 = wsh & mask, wsh >> 16
    t = a1 * b0 + ((a0 * b0) >> 16)
    t2 = a0 * b1 + (t & mask)
    hi = a1 * b1 + (t >> 16) + (t2 >> 16)
    return a * w - hi * q


def _reduce32(v, mu32, q):
    """v mod q representative in [0, 2q) for any uint32 v (Barrett with
    mu = floor(2^32/q))."""
    import jax.numpy as jnp
    mask = jnp.uint32(0xFFFF)
    a0, a1 = v & mask, v >> 16
    b0, b1 = jnp.uint32(mu32) & mask, jnp.uint32(mu32) >> 16
    t = a1 * b0 + ((a0 * b0) >> 16)
    t2 = a0 * b1 + (t & mask)
    hi = a1 * b1 + (t >> 16) + (t2 >> 16)
    return v - hi * jnp.uint32(q)


def _norm(v, q):
    import jax.numpy as jnp
    v = jnp.where(v >= 2 * q, v - 2 * q, v)
    return jnp.where(v >= q, v - q, v)


def _digit_matmul_mod(x_u32, m_dig, plan, x_on_left: bool):
    """(x @ M) or (M @ x) mod q via int8 digit-plane MXU matmuls.

    x_u32: [..., P, Q] uint32 residues < q. m_dig: [d, M_rows, M_cols]
    int8 static digits. Buckets by digit weight, reduces each bucket to
    [0, 2q), recombines with Shoup multiplies by 2^(7k) mod q."""
    import jax.numpy as jnp
    d, q = plan.d, plan.q
    xs = [((x_u32 >> jnp.uint32(DIGIT_BITS * k)) &
           jnp.uint32(DIGIT_MASK)).astype(jnp.int8) for k in range(d)]
    buckets = [None] * (2 * d - 1)
    for i in range(d):
        for j in range(d):
            if x_on_left:
                prod = jax.lax.dot_general(
                    xs[i], m_dig[j],
                    (((xs[i].ndim - 1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            else:
                prod = jax.lax.dot_general(
                    m_dig[j], xs[i],
                    (((1,), (xs[i].ndim - 2,)), ((), ())),
                    preferred_element_type=jnp.int32)
                # dot_general(M[j], x) puts M's rows first; batch dims of x
                # move behind — handled below for the 3D case
                if xs[i].ndim == 3:
                    prod = jnp.moveaxis(prod, 1, 0)
            k = i + j
            buckets[k] = prod if buckets[k] is None else buckets[k] + prod
    acc = None
    for k, b in enumerate(buckets):
        r = _reduce32(b.astype(jnp.uint32), plan.mu32, q)      # < 2q
        term = _shoup_mul(r, jnp.uint32(int(plan.f_w[k])),
                          jnp.uint32(int(plan.f_sh[k])), jnp.uint32(q))
        acc = term if acc is None else acc + term              # < (2k+2)q
        if k % 2 == 1:                # keep the running sum under 32 bits
            acc = jnp.where(acc >= 4 * q, acc - 4 * q, acc)
            acc = jnp.where(acc >= 2 * q, acc - 2 * q, acc)
    return _norm(acc, jnp.uint32(q))


def compile_fwd(plan: FourStepPlan):
    """Jitted forward negacyclic NTT of [..., n] uint32 via MXU digit
    matmuls; bit-identical to NttContext.fwd at the same (n, q). Tables
    live on device inside the closure (plans hold numpy arrays, which are
    not hashable as jit statics)."""
    import jax.numpy as jnp
    R, C, q, n = plan.R, plan.C, plan.q, plan.n
    A_dig = jnp.asarray(plan.A_dig)
    B_dig = jnp.asarray(plan.B_dig)
    T_w, T_sh = jnp.asarray(plan.T_w), jnp.asarray(plan.T_sh)

    @jax.jit
    def fwd(x):
        batch = x.shape[:-1]
        Y = x.reshape(batch + (R, C))
        if Y.ndim == 2:
            U = _digit_matmul_mod(Y, A_dig, plan, x_on_left=False)  # A @ Y
        else:
            Yf = Y.reshape((-1, R, C))
            U = _digit_matmul_mod(Yf, A_dig, plan, x_on_left=False)
            U = U.reshape(batch + (R, C))
        V = _norm(_shoup_mul(U, T_w, T_sh, jnp.uint32(q)), jnp.uint32(q))
        X2 = _digit_matmul_mod(V, B_dig, plan, x_on_left=True)      # V @ Bᵀ
        return X2.reshape(batch + (n,))
    return fwd
