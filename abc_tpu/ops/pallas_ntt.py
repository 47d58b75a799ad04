"""Fused Pallas TPU kernels for the negacyclic NTT — roll-based butterflies.

Why: the jnp stage-loop NTT materializes every butterfly stage to HBM —
measured ~2-6 GB/s effective on v5e (28 round trips of the [L, n] array per
transform). These kernels hold each limb's row in VMEM as an [R, 128] tile
(R = n/128) across all log2(n) stages: one HBM read + one write for the data.

Mosaic-friendly structure: a butterfly stage with stride t is expressed as
two circular ROLLS (sublane rolls for t ≥ 128, lane rolls for t < 128) plus
elementwise selects — no value reshapes or transposes (Mosaic's layout
inference rejects those for small tiles):

    u' = u + w·x[p+t]          (u positions: (j mod 2t) < t)
    v' = x[p−t] − w·x[p]       (v positions)

Multiply strategy (v3): SHOUP with lazy reduction —

    wv = a·w − umulhi(a, w_shoup)·q ∈ [0, 2q)      (16 u32 ops)

vs Montgomery REDC's 32 ops. The twiddle tables double (value + companion
plane per stage), but tables load once per limb per call (limb-outer grid)
and the kernel is VPU-compute-bound, so halving the multiply cost wins.
Stage values ride in [0, 4q) Harvey-style (4q < 2^32 for 30-bit primes)
with one entry reduction per stage and a final two-step normalization —
outputs stay bit-identical to the jnp/np64 paths (asserted in interpret
mode on CPU and compiled on TPU).

Table packing (v4 — the kernel is TABLE-BANDWIDTH-bound, not compute-bound;
an ablation with multiplies/rolls/masks removed moved the time < 6%):
  * the log2(R) sublane-phase stages (t ≥ 128) have lane-constant twiddles,
    so they pack into ONE [R, 128] plane (stage per column, broadcast across
    lanes in-kernel) instead of a full plane per stage;
  * the 7 lane-phase stages (t < 128) DO vary per lane — but each stage's
    [R, 128] twiddle plane factors EXACTLY as an outer product
    A_s[r]·B_s[c] mod q (the twiddle index (r·128+c)//(2t) splits as
    r·(128/(2t)) + c//(2t) and the ψ-power table is multiplicative across
    that split; asserted at build time). So instead of streaming
    7·[R,128]·2 planes per limb (~3.7 MB/limb at n=16384, ~51 MB per
    14-limb transform — measured to dominate at ~430 GB/s), the kernel
    loads A_s as 7 extra COLUMNS of the already-resident packed plane and
    B_s as a tiny [8, 128] block, recombining in-kernel with a second
    lazy-Shoup multiply: wv = ((x·B) mod' q · A) mod' q, both companions
    precomputed, both products in [0, 2q) — congruent mod q to the fused
    product, so the final two-step normalization still yields bit-identical
    outputs. Table traffic drops ~14×; the kernel moves from HBM-bound to
    VPU-bound.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
LANE_STAGES = 7  # log2(LANE): stages with stride < 128


# --------------------------------------------------------------------------
# host-side table preparation
# --------------------------------------------------------------------------

def build_tables(n: int, tab_w: np.ndarray, tab_sh: np.ndarray,
                 q_list: np.ndarray) -> Tuple[np.ndarray, np.ndarray,
                                              np.ndarray, np.ndarray]:
    """Pack one twiddle-table pair (values + Shoup companions) for the
    kernels: (packed_w [L,R,128], packed_sh [L,R,128],
              laneB_w [L,8,128], laneB_sh [L,8,128]).

    tab_*: [L, n] in psi^bitrev layout (NttContext convention: the stage
    with m blocks uses entries table[m + block_index]).

    packed_* columns 0..s1-1 hold the sublane-phase stage twiddles (lane
    constant); columns s1..s1+6 hold the lane-phase ROW factors A_s[r] =
    tab[m_s + r·128//(2t_s)] — actual table entries, so their companions
    come from tab_sh at the same index. laneB_* row k holds the lane factor
    B_s[c] = tab[m_s + c//(2t_s)]·tab[m_s]^{-1} mod q with a freshly
    computed companion. The exact outer-product identity
    A_s[r]·B_s[c] ≡ plane_s[r, c] (mod q) is asserted per stage and limb."""
    L = tab_w.shape[0]
    logn = n.bit_length() - 1
    R = n // LANE
    s1 = logn - LANE_STAGES                       # sublane-phase stage count
    packed_w = np.zeros((L, R, LANE), dtype=np.uint32)
    packed_sh = np.zeros((L, R, LANE), dtype=np.uint32)
    for s in range(s1):
        m = 1 << s
        t = n // (2 * m)
        r = np.arange(R)
        idx = m + r // (2 * t // LANE)
        packed_w[:, :, s] = tab_w[:, idx]
        packed_sh[:, :, s] = tab_sh[:, idx]
    laneB_w = np.zeros((L, 8, LANE), dtype=np.uint32)
    laneB_sh = np.zeros((L, 8, LANE), dtype=np.uint32)
    r = np.arange(R)
    c = np.arange(LANE)
    for k in range(LANE_STAGES):
        s = s1 + k
        m = 1 << s
        t = n // (2 * m)
        a_idx = m + (r * LANE) // (2 * t)
        packed_w[:, :, s] = tab_w[:, a_idx]       # A_s[r] (+ companion)
        packed_sh[:, :, s] = tab_sh[:, a_idx]
        b_idx = m + c // (2 * t)
        for l in range(L):
            q = int(q_list[l])
            base = int(tab_w[l, m])
            inv0 = pow(base, q - 2, q)            # q prime
            B = (tab_w[l, b_idx].astype(np.uint64) * inv0) % q
            laneB_w[l, k] = B.astype(np.uint32)
            laneB_sh[l, k] = np.asarray(
                [(int(b) << 32) // q for b in B], dtype=np.uint64
            ).astype(np.uint32)
            # outer-product exactness: A[r]·B[c] ≡ table[m + j//(2t)] mod q
            plane = tab_w[l, m + (r[:, None] * LANE + c[None, :]) // (2 * t)]
            recon = (tab_w[l, a_idx].astype(np.uint64)[:, None]
                     * B[None, :]) % q
            if not np.array_equal(recon.astype(np.uint32), plane):
                raise RuntimeError(
                    f"twiddle plane not rank-1 at stage {s}, limb {l}: the "
                    f"outer-product factorization A[r]*B[c] does not "
                    f"reconstruct the stage twiddles — NTT outputs would be "
                    f"silently wrong")
    return packed_w, packed_sh, laneB_w, laneB_sh


def lane_plane_indices(n: int) -> np.ndarray:
    """[7, n] int32: for each lane-phase stage k (stride t < 128), the
    twiddle-table index m + j//(2t) of element j — the FULL per-element
    twiddle plane as a gather of the [L, n] psi^brv table. Used by the
    batched-only full-plane kernel variant (tables are built by an
    on-device gather, so no host→device transfer of the ~12.8 MB planes)."""
    logn = n.bit_length() - 1
    s1 = logn - LANE_STAGES
    j = np.arange(n, dtype=np.int64)
    idx = np.empty((LANE_STAGES, n), dtype=np.int32)
    for k in range(LANE_STAGES):
        s = s1 + k
        m = 1 << s
        t = n // (2 * m)
        idx[k] = (m + j // (2 * t)).astype(np.int32)
    return idx


_TABLE_CACHE: Dict[int, Tuple] = {}


def get_tables(ctx) -> Tuple:
    """Cached packed twiddle tables + scalars for an NttContext.

    Returns (fwd_packed_w, fwd_packed_sh, fwd_planes_w, fwd_planes_sh,
             inv_packed_w, inv_packed_sh, inv_planes_w, inv_planes_sh,
             ninv [L,1], ninv_sh [L,1]).

    Keyed by CONTENT (n, moduli) — the tables are a deterministic function
    of those, so equal-parameter contexts share one build. An id(ctx) key
    (as before round 3) is unsound: a collected context's id can be
    recycled by a NEW context of a different size, silently serving stale
    tables (surfaced as a reshape error when the n=8192 suite context was
    freed before the n=16384 one was built)."""
    key = (ctx.n, tuple(ctx.moduli))
    if key not in _TABLE_CACHE:
        n = ctx.n
        # host_tables avoids a device→host read of jnp tables (the axon
        # tunnel makes that pathologically slow)
        host = getattr(ctx, "host_tables", None)

        def tab(name):
            return host[name] if host and name in host \
                else np.asarray(getattr(ctx, name))

        q_list = tab("q").astype(np.uint64).reshape(-1)
        fpw, fps, flw, fls = build_tables(n, tab("fwd_tw"),
                                          tab("fwd_tw_sh"), q_list)
        ipw, ips, ilw, ils = build_tables(n, tab("inv_tw"),
                                          tab("inv_tw_sh"), q_list)
        ninv = tab("n_inv").astype(np.uint32).reshape(-1, 1)
        ninv_sh = tab("n_inv_sh").astype(np.uint32).reshape(-1, 1)
        _TABLE_CACHE[key] = (fpw, fps, flw, fls, ipw, ips, ilw, ils,
                             ninv, ninv_sh)
    return _TABLE_CACHE[key]


# --------------------------------------------------------------------------
# kernel math
# --------------------------------------------------------------------------

def _umulhi(a, b):
    mask = jnp.uint32(0xFFFF)
    a0, a1 = a & mask, a >> 16
    b0, b1 = b & mask, b >> 16
    t = a1 * b0 + ((a0 * b0) >> 16)
    t2 = a0 * b1 + (t & mask)
    return a1 * b1 + (t >> 16) + (t2 >> 16)


def _mul_shoup_lazy(a, w, wsh, q):
    """Shoup product with deferred correction: a·w − ⌊a·wsh/2^32⌋·q ∈ [0, 2q)
    for any uint32 a (we use a < 4q), w < q, wsh = ⌊w·2^32/q⌋. All u32
    arithmetic wraps mod 2^32; the true value is < 2q so it is exact."""
    return a * w - _umulhi(a, wsh) * q


def _mul_shoup(a, w, wsh, q):
    """Exact Shoup product, result < q."""
    r = _mul_shoup_lazy(a, w, wsh, q)
    return jnp.where(r >= q, r - q, r)


def _roll(x, shift: int, t: int):
    """Partner gather (pltpu.roll: rolled[p] = x[(p − shift) mod N]; only
    non-negative shifts, so −s ≡ N − s)."""
    if t >= LANE:
        size = x.shape[0]
        return pltpu.roll(x, (shift * (t // LANE)) % size, axis=0)
    return pltpu.roll(x, (shift * t) % LANE, axis=1)


def _is_u_mask(n: int, t: int):
    """[R, 128] bool: (j mod 2t) < t for j = r·128 + c."""
    R = n // LANE
    if t >= LANE:
        r_ids = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 0)
        return (r_ids % (2 * t // LANE)) < (t // LANE)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)
    return (c_ids % (2 * t)) < t


def _stage_mul(n, s, sel, pw, psh, lw, lsh, q, full_lane: bool = False):
    """wv ∈ [0, 2q) ≡ sel·w_s (mod q) for stage s.

    Sublane-phase stages (lane-constant twiddles) use one lazy Shoup
    product with the packed-column twiddle. Lane-phase stages recombine the
    rank-1 factorization w = A[r]·B[c] with TWO lazy Shoup products
    ((sel·B)·A) — both companions precomputed, both results in [0, 2q),
    congruent mod q to the fused product (see module doc) — UNLESS
    full_lane, where lw/lsh are the full [7, R, 128] per-stage twiddle
    planes and the product is a SINGLE lazy Shoup multiply (the
    batched-only variant: the 12.8 MB/limb-group plane stream amortizes
    over the batch grid axis, buying back the second multiply the rank-1
    factorization pays — docs/NTT_ABLATION.md "the next lever")."""
    R = n // LANE
    logn = n.bit_length() - 1
    s1 = logn - LANE_STAGES
    if s < s1:
        w = jnp.broadcast_to(pw[:, s:s + 1], (R, LANE))
        wsh = jnp.broadcast_to(psh[:, s:s + 1], (R, LANE))
        return _mul_shoup_lazy(sel, w, wsh, q)
    k = s - s1
    if full_lane:
        return _mul_shoup_lazy(sel, lw[k], lsh[k], q)
    b = jnp.broadcast_to(lw[k:k + 1, :], (R, LANE))
    bsh = jnp.broadcast_to(lsh[k:k + 1, :], (R, LANE))
    a = jnp.broadcast_to(pw[:, s:s + 1], (R, LANE))
    ash = jnp.broadcast_to(psh[:, s:s + 1], (R, LANE))
    return _mul_shoup_lazy(_mul_shoup_lazy(sel, b, bsh, q), a, ash, q)


def _fwd_kernel(n: int, G: int, full_lane: bool, q_ref, x_ref, pw_ref,
                psh_ref, lw_ref, lsh_ref, out_ref):
    i = pl.program_id(0)
    logn = n.bit_length() - 1
    # Harvey-style lazy butterflies: the stage invariant is x < 4q
    # (4q < 2^32 for 30-bit primes); one entry reduction to < 2q, lazy
    # Shoup products in [0, 2q), outputs back under 4q. Exact values
    # restored by the final two-step normalization — outputs bit-identical.
    for g in range(G):
        q = q_ref[i * G + g, 0]
        two_q = q + q
        x = x_ref[0, 0, g]
        pw, psh = pw_ref[g], psh_ref[g]
        lw, lsh = lw_ref[g], lsh_ref[g]
        R = n // LANE
        for s in range(logn):
            t = n // (2 << s)
            xr = jnp.where(x >= two_q, x - two_q, x)          # < 2q
            if s == 0:
                # single block (t = n/2): both output halves are formed
                # from the SAME static slices — u' = top + w·bot,
                # v' = top + (2q − w·bot) — zero rolls, zero selects, and
                # the (constant) twiddle multiply runs on half the rows
                w0 = jnp.broadcast_to(pw[:R // 2, 0:1], (R // 2, LANE))
                w0sh = jnp.broadcast_to(psh[:R // 2, 0:1], (R // 2, LANE))
                top = xr[:R // 2]
                m_bot = _mul_shoup_lazy(xr[R // 2:], w0, w0sh, q)
                x = jnp.concatenate([top + m_bot,
                                     top + (two_q - m_bot)], axis=0)
                continue
            is_u = _is_u_mask(n, t)
            # multiply EVERYWHERE by the own-position stage twiddle (the
            # twiddle is block-constant within 2t, so the u side's needed
            # product w·x[p+t] is just m[p+t]): one select fewer per stage
            # than multiplying a partner-selected operand, and a measured
            # ~1-3% faster with bit-identical output (A/B on the real chip)
            m_all = _stage_mul(n, s, xr, pw, psh, lw, lsh, q, full_lane)
            pm = _roll(m_all, -1, t)
            px = _roll(xr, 1, t)
            x = jnp.where(is_u, xr + pm, px + (two_q - m_all))  # < 4q
        x = jnp.where(x >= two_q, x - two_q, x)
        out_ref[0, 0, g] = jnp.where(x >= q, x - q, x)


def _inv_kernel(n: int, G: int, full_lane: bool, q_ref, x_ref, pw_ref,
                psh_ref, lw_ref, lsh_ref, ninv_ref, ninvsh_ref, out_ref):
    i = pl.program_id(0)
    logn = n.bit_length() - 1
    # Gentleman-Sande with the x < 2q lazy invariant: sums reduced once,
    # differences fed to the lazy Shoup product as (u − v + 2q) < 4q.
    for g in range(G):
        q = q_ref[i * G + g, 0]
        two_q = q + q
        x = x_ref[0, 0, g]
        pw, psh = pw_ref[g], psh_ref[g]
        lw, lsh = lw_ref[g], lsh_ref[g]
        R = n // LANE
        for s in range(logn - 1, -1, -1):
            t = n // (2 << s)
            if s == 0:
                # single block (t = n/2), mirror of the forward kernel's
                # zero-roll form: u' = reduce(top + bot),
                # v' = w·(top + 2q − bot) from static slices
                w0 = jnp.broadcast_to(pw[:R // 2, 0:1], (R // 2, LANE))
                w0sh = jnp.broadcast_to(psh[:R // 2, 0:1], (R // 2, LANE))
                top, bot = x[:R // 2], x[R // 2:]
                u_new = top + bot                              # < 4q
                u_new = jnp.where(u_new >= two_q, u_new - two_q, u_new)
                v_new = _mul_shoup_lazy(top + (two_q - bot), w0, w0sh, q)
                x = jnp.concatenate([u_new, v_new], axis=0)    # < 2q
                continue
            is_u = _is_u_mask(n, t)
            hi = _roll(x, -1, t)
            lo = _roll(x, 1, t)
            u_new = x + hi                                     # < 4q
            u_new = jnp.where(u_new >= two_q, u_new - two_q, u_new)
            v_new = _stage_mul(n, s, lo + (two_q - x), pw, psh, lw, lsh, q,
                               full_lane)
            x = jnp.where(is_u, u_new, v_new)                  # < 2q
        ninv = jnp.broadcast_to(ninv_ref[i * G + g, 0], x.shape)
        ninvsh = jnp.broadcast_to(ninvsh_ref[i * G + g, 0], x.shape)
        out_ref[0, 0, g] = _mul_shoup(x, ninv, ninvsh, q)


# --------------------------------------------------------------------------
# callable wrappers
# --------------------------------------------------------------------------
#
# Grid layout: (ngroups, B) where each grid step processes a GROUP of G
# limbs (statically unrolled in-kernel). Measured on v5e: a grid step costs
# ~7.5 µs of launch/DMA-orchestration overhead REGARDLESS of the body (a
# zero-stage kernel at grid (14,1) still takes ~105 µs/transform), so the
# old one-limb-per-step layout was overhead-bound, not compute- or
# bandwidth-bound. Grouping all limbs of a transform into one step removes
# ~(L−L/G)·7.5 µs. G is capped by the ~16 MB VMEM (double-buffered x/out +
# packed tables ≈ 32·G·n bytes); when G < L the limb axis is padded to a
# multiple of G with copies of limb 0 (their outputs are sliced away).

VMEM_BUDGET = 12 << 20

# per-limb VMEM bytes: rank-1 kernels stream ~32·n (double-buffered x/out +
# packed tables); the full-plane variant adds the 7 lane-stage plane pairs
# (56·n) → ~88·n, so its limb groups are smaller (e.g. G=7 vs 14 at n=16384)
_BYTES_RANK1 = 32
_BYTES_FULL = 88


def _group(L: int, n: int, bytes_per: int = _BYTES_RANK1) -> Tuple[int, int]:
    gmax = max(1, VMEM_BUDGET // (bytes_per * n))
    ngroups = -(-L // min(L, gmax))
    G = -(-L // ngroups)        # even split: G=7/7 beats 8/6-with-padding
    return G, ngroups


def _prep(a, q, n, bytes_per: int = _BYTES_RANK1):
    batch_shape = a.shape[:-2]
    L = a.shape[-2]
    assert q.shape[0] == L, "limb axis must match the moduli table"
    B = int(np.prod(batch_shape)) if batch_shape else 1
    sub = n // LANE
    G, ngroups = _group(L, n, bytes_per)
    Lp = G * ngroups
    a4 = a.reshape(B, L, sub, LANE)
    if Lp != L:
        a4 = jnp.concatenate([a4, a4[:, :Lp - L]], axis=1)
    a5 = a4.reshape(B, ngroups, G, sub, LANE)
    return B, L, G, ngroups, sub, a5


def _pad_limbs(t, Lp):
    """Pad a limb-leading table to Lp rows with copies of the first rows
    (loop-invariant: XLA hoists the concat out of scan/fori bodies)."""
    L = t.shape[0]
    if L == Lp:
        return t
    return jnp.concatenate([t, t[:Lp - L]], axis=0)


def _xblk(G, sub):
    return pl.BlockSpec((1, 1, G, sub, LANE),
                        (lambda l, b: (b, l, 0, 0, 0)),
                        memory_space=pltpu.VMEM)


def _tblk(G, shape_tail):
    nd = len(shape_tail)
    return pl.BlockSpec((G,) + shape_tail,
                        (lambda l, b: (l,) + (0,) * nd),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def pallas_fwd_ntt(a, q, pw, psh, lw, lsh, *, n: int,
                   interpret: bool = False):
    """Forward negacyclic NTT of [..., L, n]; tables from get_tables()."""
    B, L, G, ngroups, sub, a5 = _prep(a, q, n)
    Lp = G * ngroups
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n, G, False),
        grid=(ngroups, B),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  _xblk(G, sub),
                  _tblk(G, (sub, LANE)), _tblk(G, (sub, LANE)),
                  _tblk(G, (8, LANE)), _tblk(G, (8, LANE))],
        out_specs=_xblk(G, sub),
        out_shape=jax.ShapeDtypeStruct((B, ngroups, G, sub, LANE),
                                       jnp.uint32),
        interpret=interpret,
    )(_pad_limbs(q.reshape(L, 1), Lp), a5,
      _pad_limbs(pw, Lp), _pad_limbs(psh, Lp),
      _pad_limbs(lw, Lp), _pad_limbs(lsh, Lp))
    return out.reshape(B, Lp, n)[:, :L].reshape(a.shape)


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def pallas_fwd_ntt_fp(a, q, pw, psh, flw, fls, *, n: int,
                      interpret: bool = False):
    """Batched-only forward NTT with FULL lane-stage twiddle planes
    (flw/fls: [L, 7, n/128, 128]) — a single lazy-Shoup multiply on lane
    stages instead of the rank-1 pair. The plane stream (~0.9 MB/limb)
    amortizes across the batch grid axis (batch iterates innermost, table
    blocks stay VMEM-resident per limb group), so this wins only at B ≥ 8;
    at B=1 the extra table traffic loses (docs/NTT_ABLATION.md)."""
    B, L, G, ngroups, sub, a5 = _prep(a, q, n, _BYTES_FULL)
    Lp = G * ngroups
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n, G, True),
        grid=(ngroups, B),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  _xblk(G, sub),
                  _tblk(G, (sub, LANE)), _tblk(G, (sub, LANE)),
                  _tblk(G, (LANE_STAGES, sub, LANE)),
                  _tblk(G, (LANE_STAGES, sub, LANE))],
        out_specs=_xblk(G, sub),
        out_shape=jax.ShapeDtypeStruct((B, ngroups, G, sub, LANE),
                                       jnp.uint32),
        interpret=interpret,
    )(_pad_limbs(q.reshape(L, 1), Lp), a5,
      _pad_limbs(pw, Lp), _pad_limbs(psh, Lp),
      _pad_limbs(flw, Lp), _pad_limbs(fls, Lp))
    return out.reshape(B, Lp, n)[:, :L].reshape(a.shape)


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def pallas_inv_ntt(a, q, pw, psh, lw, lsh, ninv, ninv_sh, *, n: int,
                   interpret: bool = False):
    """Inverse negacyclic NTT of [..., L, n]."""
    B, L, G, ngroups, sub, a5 = _prep(a, q, n)
    Lp = G * ngroups
    out = pl.pallas_call(
        functools.partial(_inv_kernel, n, G, False),
        grid=(ngroups, B),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  _xblk(G, sub),
                  _tblk(G, (sub, LANE)), _tblk(G, (sub, LANE)),
                  _tblk(G, (8, LANE)), _tblk(G, (8, LANE)),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=_xblk(G, sub),
        out_shape=jax.ShapeDtypeStruct((B, ngroups, G, sub, LANE),
                                       jnp.uint32),
        interpret=interpret,
    )(_pad_limbs(q.reshape(L, 1), Lp), a5,
      _pad_limbs(pw, Lp), _pad_limbs(psh, Lp),
      _pad_limbs(lw, Lp), _pad_limbs(lsh, Lp),
      _pad_limbs(jnp.asarray(ninv).reshape(L, 1), Lp),
      _pad_limbs(jnp.asarray(ninv_sh).reshape(L, 1), Lp))
    return out.reshape(B, Lp, n)[:, :L].reshape(a.shape)


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def pallas_inv_ntt_fp(a, q, pw, psh, flw, fls, ninv, ninv_sh, *, n: int,
                      interpret: bool = False):
    """Batched-only inverse NTT with full lane-stage twiddle planes (see
    pallas_fwd_ntt_fp)."""
    B, L, G, ngroups, sub, a5 = _prep(a, q, n, _BYTES_FULL)
    Lp = G * ngroups
    out = pl.pallas_call(
        functools.partial(_inv_kernel, n, G, True),
        grid=(ngroups, B),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  _xblk(G, sub),
                  _tblk(G, (sub, LANE)), _tblk(G, (sub, LANE)),
                  _tblk(G, (LANE_STAGES, sub, LANE)),
                  _tblk(G, (LANE_STAGES, sub, LANE)),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=_xblk(G, sub),
        out_shape=jax.ShapeDtypeStruct((B, ngroups, G, sub, LANE),
                                       jnp.uint32),
        interpret=interpret,
    )(_pad_limbs(q.reshape(L, 1), Lp), a5,
      _pad_limbs(pw, Lp), _pad_limbs(psh, Lp),
      _pad_limbs(flw, Lp), _pad_limbs(fls, Lp),
      _pad_limbs(jnp.asarray(ninv).reshape(L, 1), Lp),
      _pad_limbs(jnp.asarray(ninv_sh).reshape(L, 1), Lp))
    return out.reshape(B, Lp, n)[:, :L].reshape(a.shape)


# batch size at which the full-plane lane-table variant takes over (its
# extra plane stream amortizes over the batch grid axis; at B=1 it loses —
# measured ablation in docs/NTT_ABLATION.md)
FULL_PLANE_MIN_BATCH = 8

# Trace-time override of the variant selection. Under jax.vmap the batch
# dimension is invisible to NttKernels (the traced per-example shape is
# [2..3, L, n]), so vmapped batch workloads would never reach the
# full-plane kernels on shape evidence alone; vmap's pallas batching rule
# prepends the batch to the SAME kernel's grid, so forcing full-plane
# inside the vmapped region gives the amortized-table variant. None =
# decide by visible batch (default).
_FULL_PLANE_OVERRIDE = [None]


class force_full_plane:
    """Context manager: route NttKernels transforms to the full-plane
    (True) or rank-1 (False) kernels regardless of visible batch size.
    Applies at TRACE time — wrap the jit/vmap construction, e.g.

        with force_full_plane(True):
            step = jax.jit(jax.vmap(chain))   # batched workload

    Outputs are bit-identical either way; only throughput differs."""

    def __init__(self, on: bool):
        self.on = on

    def __enter__(self):
        self.prev = _FULL_PLANE_OVERRIDE[0]
        _FULL_PLANE_OVERRIDE[0] = self.on
        return self

    def __exit__(self, *exc):
        _FULL_PLANE_OVERRIDE[0] = self.prev
        return False


@functools.partial(jax.jit, static_argnames=("n",))
def _gather_lane_planes(tab_w, tab_sh, *, n: int):
    """[L, n] twiddle tables → full per-stage lane planes
    ([L, 7, n/128, 128] values + companions) via ONE device gather — no
    host→device transfer of the ~12.8 MB planes (the tunnel moves
    ~20 MB/s; host-building these would dominate context setup)."""
    idx = jnp.asarray(lane_plane_indices(n))            # [7, n]
    L = tab_w.shape[0]
    shape = (L, LANE_STAGES, n // LANE, LANE)
    return (tab_w[:, idx].reshape(shape), tab_sh[:, idx].reshape(shape))


class NttKernels:
    """Bound Pallas transforms for one NttContext (tables cached on device).

    Drop-in replacements for NttContext.fwd/.inv with identical outputs.
    Attached by NttContext._attach_pallas on the TPU backend. Batched
    inputs (≥ FULL_PLANE_MIN_BATCH transforms per call) route to the
    full-plane lane-table kernels; outputs are bit-identical either way.
    """

    def __init__(self, ctx):
        (fpw, fps, flw, fls, ipw, ips, ilw, ils,
         ninv, ninv_sh) = get_tables(ctx)
        self.n = ctx.n
        host = getattr(ctx, "host_tables", None)
        q_np = host["q"] if host else np.asarray(ctx.q)
        self.q = jnp.asarray(q_np.astype(np.uint32).reshape(-1))
        self.fpw, self.fps = jnp.asarray(fpw), jnp.asarray(fps)
        self.flw, self.fls = jnp.asarray(flw), jnp.asarray(fls)
        self.ipw, self.ips = jnp.asarray(ipw), jnp.asarray(ips)
        self.ilw, self.ils = jnp.asarray(ilw), jnp.asarray(ils)
        self.ninv = jnp.asarray(ninv)
        self.ninv_sh = jnp.asarray(ninv_sh)
        # full lane planes for the batched variant, built EAGERLY (outside
        # any trace — in-trace the gather would re-run on every call) from
        # the context's device-resident ψ^brv tables
        self.f_flw, self.f_fls = _gather_lane_planes(
            jnp.asarray(ctx.fwd_tw), jnp.asarray(ctx.fwd_tw_sh), n=ctx.n)
        self.i_flw, self.i_fls = _gather_lane_planes(
            jnp.asarray(ctx.inv_tw), jnp.asarray(ctx.inv_tw_sh), n=ctx.n)

    def sliced(self, rows) -> "NttKernels":
        """Kernels restricted to the given limb rows, sharing (slicing) this
        object's device tables — no host recomputation. Used by
        NttContext.subset for CKKS leveled transforms."""
        idx = np.asarray(list(rows), dtype=np.int64)
        view = object.__new__(NttKernels)
        view.n = self.n
        for name in ("q", "fpw", "fps", "flw", "fls", "ipw", "ips",
                     "ilw", "ils", "ninv", "ninv_sh",
                     "f_flw", "f_fls", "i_flw", "i_fls"):
            setattr(view, name, getattr(self, name)[idx])
        return view

    @staticmethod
    def _use_fp(a) -> bool:
        if _FULL_PLANE_OVERRIDE[0] is not None:
            return _FULL_PLANE_OVERRIDE[0]
        shape = a.shape[:-2]
        batch = int(np.prod(shape)) if shape else 1
        return batch >= FULL_PLANE_MIN_BATCH

    def fwd(self, a):
        if self._use_fp(a):
            return pallas_fwd_ntt_fp(a, self.q, self.fpw, self.fps,
                                     self.f_flw, self.f_fls, n=self.n)
        return pallas_fwd_ntt(a, self.q, self.fpw, self.fps, self.flw,
                              self.fls, n=self.n)

    def inv(self, a):
        if self._use_fp(a):
            return pallas_inv_ntt_fp(a, self.q, self.ipw, self.ips,
                                     self.i_flw, self.i_fls, self.ninv,
                                     self.ninv_sh, n=self.n)
        return pallas_inv_ntt(a, self.q, self.ipw, self.ips, self.ilw,
                              self.ils, self.ninv, self.ninv_sh, n=self.n)
