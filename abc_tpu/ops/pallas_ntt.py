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

Table packing:
  * the log2(R) sublane-phase stages (t ≥ 128) have lane-constant twiddles,
    so they pack into ONE [R, 128] plane (stage per column, broadcast across
    lanes in-kernel) instead of a full plane per stage;
  * only the 7 lane-phase stages (t < 128) need full [R, 128] planes.
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

def build_tables(n: int, table: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(packed sublane-phase plane [L, R, 128], lane-phase planes
    [L, 7, R, 128]) for one twiddle table (values OR Shoup companions).

    table: [L, n] in psi^bitrev layout (NttContext convention: the stage
    with m blocks uses entries table[m + block_index])."""
    L = table.shape[0]
    logn = n.bit_length() - 1
    R = n // LANE
    s1 = logn - LANE_STAGES                       # sublane-phase stage count
    packed = np.zeros((L, R, LANE), dtype=np.uint32)
    for s in range(s1):
        m = 1 << s
        t = n // (2 * m)
        r = np.arange(R)
        packed[:, :, s] = table[:, m + r // (2 * t // LANE)]
    planes = np.empty((L, LANE_STAGES, R, LANE), dtype=np.uint32)
    j = np.arange(n)
    for k in range(LANE_STAGES):
        s = s1 + k
        m = 1 << s
        t = n // (2 * m)
        planes[:, k] = table[:, m + j // (2 * t)].reshape(L, R, LANE)
    return packed, planes


_TABLE_CACHE: Dict[int, Tuple] = {}


def get_tables(ctx) -> Tuple:
    """Cached packed twiddle tables + scalars for an NttContext.

    Returns (fwd_packed_w, fwd_packed_sh, fwd_planes_w, fwd_planes_sh,
             inv_packed_w, inv_packed_sh, inv_planes_w, inv_planes_sh,
             ninv [L,1], ninv_sh [L,1])."""
    key = id(ctx)
    if key not in _TABLE_CACHE:
        n = ctx.n
        # host_tables avoids a device→host read of jnp tables (the axon
        # tunnel makes that pathologically slow)
        host = getattr(ctx, "host_tables", None)

        def tab(name):
            return host[name] if host and name in host \
                else np.asarray(getattr(ctx, name))

        fpw, flw = build_tables(n, tab("fwd_tw"))
        fps, fls = build_tables(n, tab("fwd_tw_sh"))
        ipw, ilw = build_tables(n, tab("inv_tw"))
        ips, ils = build_tables(n, tab("inv_tw_sh"))
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


def _stage_tw(n, s, packed, planes):
    """Twiddle plane for stage s (broadcast from the packed column for
    sublane-phase stages)."""
    logn = n.bit_length() - 1
    s1 = logn - LANE_STAGES
    if s < s1:
        col = packed[:, s:s + 1]                   # [R, 1]
        return jnp.broadcast_to(col, (n // LANE, LANE))
    return planes[s - s1]


def _fwd_kernel(n: int, q_ref, x_ref, pw_ref, psh_ref, lw_ref, lsh_ref,
                out_ref):
    i = pl.program_id(0)
    q = q_ref[i, 0]
    two_q = q + q
    x = x_ref[0, 0]
    pw, psh = pw_ref[0], psh_ref[0]
    logn = n.bit_length() - 1
    # Harvey-style lazy butterflies: the stage invariant is x < 4q
    # (4q < 2^32 for 30-bit primes); one entry reduction to < 2q, lazy
    # Shoup products in [0, 2q), outputs back under 4q. Exact values
    # restored by the final two-step normalization — outputs bit-identical.
    for s in range(logn):
        t = n // (2 << s)
        w = _stage_tw(n, s, pw, lw_ref[0])
        wsh = _stage_tw(n, s, psh, lsh_ref[0])
        is_u = _is_u_mask(n, t)
        xr = jnp.where(x >= two_q, x - two_q, x)          # < 2q
        hi = _roll(xr, -1, t)
        lo = _roll(xr, 1, t)
        wv = _mul_shoup_lazy(jnp.where(is_u, hi, xr), w, wsh, q)
        x = jnp.where(is_u, xr + wv, lo + (two_q - wv))   # < 4q
    x = jnp.where(x >= two_q, x - two_q, x)
    out_ref[0, 0] = jnp.where(x >= q, x - q, x)


def _inv_kernel(n: int, q_ref, x_ref, pw_ref, psh_ref, lw_ref, lsh_ref,
                ninv_ref, ninvsh_ref, out_ref):
    i = pl.program_id(0)
    q = q_ref[i, 0]
    two_q = q + q
    x = x_ref[0, 0]
    pw, psh = pw_ref[0], psh_ref[0]
    logn = n.bit_length() - 1
    # Gentleman-Sande with the x < 2q lazy invariant: sums reduced once,
    # differences fed to the lazy Shoup product as (u − v + 2q) < 4q.
    for s in range(logn - 1, -1, -1):
        t = n // (2 << s)
        w = _stage_tw(n, s, pw, lw_ref[0])
        wsh = _stage_tw(n, s, psh, lsh_ref[0])
        is_u = _is_u_mask(n, t)
        hi = _roll(x, -1, t)
        lo = _roll(x, 1, t)
        u_new = x + hi                                     # < 4q
        u_new = jnp.where(u_new >= two_q, u_new - two_q, u_new)
        v_new = _mul_shoup_lazy(lo + (two_q - x), w, wsh, q)
        x = jnp.where(is_u, u_new, v_new)                  # < 2q
    ninv = jnp.broadcast_to(ninv_ref[i, 0], x.shape)
    ninvsh = jnp.broadcast_to(ninvsh_ref[i, 0], x.shape)
    out_ref[0, 0] = _mul_shoup(x, ninv, ninvsh, q)


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
def pallas_fwd_ntt(a, q, pw, psh, lw, lsh, *, n: int,
                   interpret: bool = False):
    """Forward negacyclic NTT of [..., L, n]; tables from get_tables()."""
    B, L, sub, a4, q2 = _prep(a, q, n)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n),
        grid=(L, B),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  _xblk(sub), _tblk((sub, LANE)), _tblk((sub, LANE)),
                  _tblk((LANE_STAGES, sub, LANE)),
                  _tblk((LANE_STAGES, sub, LANE))],
        out_specs=_xblk(sub),
        out_shape=jax.ShapeDtypeStruct((B, L, sub, LANE), jnp.uint32),
        interpret=interpret,
    )(q2, a4, pw, psh, lw, lsh)
    return out.reshape(a.shape)


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def pallas_inv_ntt(a, q, pw, psh, lw, lsh, ninv, ninv_sh, *, n: int,
                   interpret: bool = False):
    """Inverse negacyclic NTT of [..., L, n]."""
    B, L, sub, a4, q2 = _prep(a, q, n)
    out = pl.pallas_call(
        functools.partial(_inv_kernel, n),
        grid=(L, B),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  _xblk(sub), _tblk((sub, LANE)), _tblk((sub, LANE)),
                  _tblk((LANE_STAGES, sub, LANE)),
                  _tblk((LANE_STAGES, sub, LANE)),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=_xblk(sub),
        out_shape=jax.ShapeDtypeStruct((B, L, sub, LANE), jnp.uint32),
        interpret=interpret,
    )(q2, a4, pw, psh, lw, lsh,
      jnp.asarray(ninv).reshape(L, 1), jnp.asarray(ninv_sh).reshape(L, 1))
    return out.reshape(a.shape)


class NttKernels:
    """Bound Pallas transforms for one NttContext (tables cached on device).

    Drop-in replacements for NttContext.fwd/.inv with identical outputs.
    Attached by NttContext._attach_pallas on the TPU backend.
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

    def sliced(self, rows) -> "NttKernels":
        """Kernels restricted to the given limb rows, sharing (slicing) this
        object's device tables — no host recomputation. Used by
        NttContext.subset for CKKS leveled transforms."""
        idx = np.asarray(list(rows), dtype=np.int64)
        view = object.__new__(NttKernels)
        view.n = self.n
        for name in ("q", "fpw", "fps", "flw", "fls", "ipw", "ips",
                     "ilw", "ils", "ninv", "ninv_sh"):
            setattr(view, name, getattr(self, name)[idx])
        return view

    def fwd(self, a):
        return pallas_fwd_ntt(a, self.q, self.fpw, self.fps, self.flw,
                              self.fls, n=self.n)

    def inv(self, a):
        return pallas_inv_ntt(a, self.q, self.ipw, self.ips, self.ilw,
                              self.ils, self.ninv, self.ninv_sh, n=self.n)
