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

Twiddle bandwidth engineering (the actual bottleneck once fused):
  * stage multiplies use MONTGOMERY form (w·2^32 mod q) — one table instead
    of Shoup's value+companion pair → half the table traffic;
  * the log2(R) sublane-phase stages (t ≥ 128) have lane-constant twiddles,
    so they pack into ONE [R, 128] plane (stage per column, broadcast across
    lanes in-kernel) instead of a full plane per stage;
  * only the 7 lane-phase stages (t < 128) need full [R, 128] planes.

Montgomery REDC yields exactly a·w mod q, so outputs stay bit-identical to
the jnp/np64 paths (asserted in interpret mode on CPU and compiled on TPU).
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

def _to_mont(table: np.ndarray, moduli) -> np.ndarray:
    """w → w·2^32 mod q per limb row (exact, host bigints)."""
    out = np.empty_like(table)
    for l, q in enumerate(moduli):
        out[l] = ((table[l].astype(object) << 32) % q).astype(np.uint32)
    return out


def build_tables(n: int, table: np.ndarray, moduli) -> Tuple[np.ndarray, np.ndarray]:
    """(packed sublane-phase plane [L, R, 128], lane-phase planes
    [L, 7, R, 128]) of MONTGOMERY-form twiddles.

    table: [L, n] twiddles in psi^bitrev layout (NttContext convention:
    the stage with m blocks uses entries table[m + block_index])."""
    mont = _to_mont(table, moduli)
    L = mont.shape[0]
    logn = n.bit_length() - 1
    R = n // LANE
    s1 = logn - LANE_STAGES                       # sublane-phase stage count
    packed = np.zeros((L, R, LANE), dtype=np.uint32)
    for s in range(s1):
        m = 1 << s
        t = n // (2 * m)
        r = np.arange(R)
        packed[:, :, s] = mont[:, m + r // (2 * t // LANE)]
    planes = np.empty((L, LANE_STAGES, R, LANE), dtype=np.uint32)
    j = np.arange(n)
    for k in range(LANE_STAGES):
        s = s1 + k
        m = 1 << s
        t = n // (2 * m)
        planes[:, k] = mont[:, m + j // (2 * t)].reshape(L, R, LANE)
    return packed, planes


_TABLE_CACHE: Dict[int, Tuple] = {}


def get_tables(ctx) -> Tuple:
    """Cached Montgomery twiddle tables + scalars for an NttContext.

    Returns (fwd_packed, fwd_planes, inv_packed, inv_planes,
             qinv_neg [L,1], ninv_mont [L,1])."""
    key = id(ctx)
    if key not in _TABLE_CACHE:
        n = ctx.n
        moduli = ctx.moduli
        # host_tables avoids a device→host read of jnp tables (the axon
        # tunnel makes that pathologically slow)
        host = getattr(ctx, "host_tables", None)
        fwd_tw = host["fwd_tw"] if host else np.asarray(ctx.fwd_tw)
        inv_tw = host["inv_tw"] if host else np.asarray(ctx.inv_tw)
        fp, fl = build_tables(n, fwd_tw, moduli)
        ip, il = build_tables(n, inv_tw, moduli)
        qinv_neg = np.asarray([(-pow(q, -1, 1 << 32)) % (1 << 32)
                               for q in moduli], dtype=np.uint64
                              ).astype(np.uint32).reshape(-1, 1)
        ninv = (host["n_inv"] if host else np.asarray(ctx.n_inv)).reshape(-1)
        ninv_mont = np.asarray(
            [(int(v) << 32) % q for v, q in zip(ninv, moduli)],
            dtype=np.uint64).astype(np.uint32).reshape(-1, 1)
        _TABLE_CACHE[key] = (fp, fl, ip, il, qinv_neg, ninv_mont)
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


def _mul_mont(a, wm, q, qinv_neg):
    """Montgomery product a·(w·2^32)·2^−32 = a·w mod q, result < q."""
    r = _mul_mont_lazy(a, wm, q, qinv_neg)
    return jnp.where(r >= q, r - q, r)


def _mul_mont_lazy(a, wm, q, qinv_neg):
    """Lazy Montgomery REDC: for a < 4q (q < 2^30) the result is < 2q and
    ≡ a·w (mod q) — the final conditional subtract is deferred to the
    caller (Harvey-style lazy butterflies)."""
    t_lo = a * wm
    t_hi = _umulhi(a, wm)
    m = t_lo * qinv_neg
    return t_hi + _umulhi(m, q) + jnp.where(t_lo != 0, jnp.uint32(1),
                                            jnp.uint32(0))


def _add_mod(a, b, q):
    r = a + b
    return jnp.where(r >= q, r - q, r)


def _sub_mod(a, b, q):
    return jnp.where(a >= b, a - b, a + q - b)


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


def _stage_tw(n, s, packed, planes):
    """Montgomery twiddle plane for stage s (broadcast from the packed
    column for sublane-phase stages)."""
    logn = n.bit_length() - 1
    s1 = logn - LANE_STAGES
    if s < s1:
        col = packed[:, s:s + 1]                   # [R, 1]
        return jnp.broadcast_to(col, (n // LANE, LANE))
    return planes[s - s1]


def _fwd_kernel(n: int, q_ref, qinv_ref, x_ref, packed_ref, planes_ref,
                out_ref):
    i = pl.program_id(0)
    q = q_ref[i, 0]
    qinv_neg = qinv_ref[i, 0]
    two_q = q + q
    x = x_ref[0, 0]
    packed = packed_ref[0]
    logn = n.bit_length() - 1
    # Harvey-style lazy butterflies: the stage invariant is x < 4q
    # (4q < 2^32 for 30-bit primes); one entry reduction to < 2q, lazy
    # Montgomery products in [0, 2q), outputs back under 4q. Exact values
    # restored by the final two-step normalization — outputs bit-identical.
    for s in range(logn):
        t = n // (2 << s)
        wm = _stage_tw(n, s, packed, planes_ref[0])
        is_u = _is_u_mask(n, t)
        xr = jnp.where(x >= two_q, x - two_q, x)          # < 2q
        hi = _roll(xr, -1, t)
        lo = _roll(xr, 1, t)
        wv = _mul_mont_lazy(jnp.where(is_u, hi, xr), wm, q, qinv_neg)
        x = jnp.where(is_u, xr + wv, lo + (two_q - wv))   # < 4q
    x = jnp.where(x >= two_q, x - two_q, x)
    out_ref[0, 0] = jnp.where(x >= q, x - q, x)


def _inv_kernel(n: int, q_ref, qinv_ref, x_ref, packed_ref, planes_ref,
                ninv_ref, out_ref):
    i = pl.program_id(0)
    q = q_ref[i, 0]
    qinv_neg = qinv_ref[i, 0]
    two_q = q + q
    x = x_ref[0, 0]
    packed = packed_ref[0]
    logn = n.bit_length() - 1
    # Gentleman-Sande with the x < 2q lazy invariant: sums reduced once,
    # differences fed to the lazy Montgomery product as (u − v + 2q) < 4q.
    for s in range(logn - 1, -1, -1):
        t = n // (2 << s)
        wm = _stage_tw(n, s, packed, planes_ref[0])
        is_u = _is_u_mask(n, t)
        hi = _roll(x, -1, t)
        lo = _roll(x, 1, t)
        u_new = x + hi                                     # < 4q
        u_new = jnp.where(u_new >= two_q, u_new - two_q, u_new)
        v_new = _mul_mont_lazy(lo + (two_q - x), wm, q, qinv_neg)
        x = jnp.where(is_u, u_new, v_new)                  # < 2q
    ninv_m = jnp.broadcast_to(ninv_ref[i, 0], x.shape)
    out_ref[0, 0] = _mul_mont(x, ninv_m, q, qinv_neg)


# --------------------------------------------------------------------------
# callable wrappers
# --------------------------------------------------------------------------
#
# Grid layout: (L, B) with the LIMB axis OUTER, so each limb's twiddle
# tables load into VMEM once and stay resident while the inner batch axis
# sweeps over it (Pallas skips re-fetch when the index map is unchanged).
# No table tiling → table HBM traffic is O(L·n), independent of batch.

def _prep(a, q, n):
    batch_shape = a.shape[:-2]
    L = a.shape[-2]
    assert q.shape[0] == L, "limb axis must match the moduli table"
    B = int(np.prod(batch_shape)) if batch_shape else 1
    sub = n // LANE
    a4 = a.reshape(B, L, sub, LANE)
    return B, L, sub, a4, q.reshape(L, 1)


def _xblk(sub):
    return pl.BlockSpec((1, 1, sub, LANE), (lambda l, b: (b, l, 0, 0)),
                        memory_space=pltpu.VMEM)


def _tblk(shape_tail):
    nd = len(shape_tail)
    return pl.BlockSpec((1,) + shape_tail,
                        (lambda l, b: (l,) + (0,) * nd),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def pallas_fwd_ntt(a, q, qinv_neg, packed, planes, *, n: int,
                   interpret: bool = False):
    """Forward negacyclic NTT of [..., L, n]; tables from get_tables()."""
    B, L, sub, a4, q2 = _prep(a, q, n)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n),
        grid=(L, B),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  _xblk(sub), _tblk((sub, LANE)),
                  _tblk((LANE_STAGES, sub, LANE))],
        out_specs=_xblk(sub),
        out_shape=jax.ShapeDtypeStruct((B, L, sub, LANE), jnp.uint32),
        interpret=interpret,
    )(q2, jnp.asarray(qinv_neg).reshape(L, 1), a4, packed, planes)
    return out.reshape(a.shape)


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def pallas_inv_ntt(a, q, qinv_neg, packed, planes, ninv_mont, *, n: int,
                   interpret: bool = False):
    """Inverse negacyclic NTT of [..., L, n]."""
    B, L, sub, a4, q2 = _prep(a, q, n)
    out = pl.pallas_call(
        functools.partial(_inv_kernel, n),
        grid=(L, B),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  _xblk(sub), _tblk((sub, LANE)),
                  _tblk((LANE_STAGES, sub, LANE)),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=_xblk(sub),
        out_shape=jax.ShapeDtypeStruct((B, L, sub, LANE), jnp.uint32),
        interpret=interpret,
    )(q2, jnp.asarray(qinv_neg).reshape(L, 1), a4, packed, planes,
      jnp.asarray(ninv_mont).reshape(L, 1))
    return out.reshape(a.shape)


class NttKernels:
    """Bound Pallas transforms for one NttContext (tables cached on device).

    Drop-in replacements for NttContext.fwd/.inv with identical outputs
    (Montgomery REDC is exact). Attached by NttContext._attach_pallas on
    the TPU backend.
    """

    def __init__(self, ctx):
        fp, fl, ip, il, qinv, ninv_m = get_tables(ctx)
        self.n = ctx.n
        host = getattr(ctx, "host_tables", None)
        q_np = host["q"] if host else np.asarray(ctx.q)
        self.q = jnp.asarray(q_np.astype(np.uint32).reshape(-1))
        self.qinv = jnp.asarray(qinv)
        self.fp, self.fl = jnp.asarray(fp), jnp.asarray(fl)
        self.ip, self.il = jnp.asarray(ip), jnp.asarray(il)
        self.ninv_m = jnp.asarray(ninv_m)

    def sliced(self, rows) -> "NttKernels":
        """Kernels restricted to the given limb rows, sharing (slicing) this
        object's device tables — no host recomputation. Used by
        NttContext.subset for CKKS leveled transforms."""
        idx = np.asarray(list(rows), dtype=np.int64)
        view = object.__new__(NttKernels)
        view.n = self.n
        for name in ("q", "qinv", "fp", "fl", "ip", "il", "ninv_m"):
            setattr(view, name, getattr(self, name)[idx])
        return view

    def fwd(self, a):
        return pallas_fwd_ntt(a, self.q, self.qinv, self.fp, self.fl,
                              n=self.n)

    def inv(self, a):
        return pallas_inv_ntt(a, self.q, self.qinv, self.ip, self.il,
                              self.ninv_m, n=self.n)
