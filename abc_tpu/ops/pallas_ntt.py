"""Fused Pallas TPU kernels for the negacyclic NTT.

Why: the jnp stage-loop NTT materializes every butterfly stage to HBM —
measured ~2-6 GB/s effective on v5e (28 round trips of the [L, n] array per
transform). These kernels load each limb's row into VMEM once, run all
log2(n) butterfly stages on-chip, and write back once: HBM traffic drops
from 2·log2(n)·L·n·4 bytes to 2·L·n·4 bytes per transform.

Grid: one program per (batch·limb) row. Per-limb tables (twiddles + Shoup
companions, [n] each ≈ 64 KB at n=16384) and the row itself (~64 KB) fit
comfortably in the ~16 MB VMEM.

The butterfly math matches ops/modarith.jx32 exactly (same Shoup multiply,
same lazy bounds), so outputs are bit-identical to the jnp path — asserted
by tests/test_pallas_ntt.py in interpret mode on CPU and compiled on TPU.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _umulhi(a, b):
    mask = jnp.uint32(0xFFFF)
    a0, a1 = a & mask, a >> 16
    b0, b1 = b & mask, b >> 16
    t = a1 * b0 + ((a0 * b0) >> 16)
    t2 = a0 * b1 + (t & mask)
    return a1 * b1 + (t >> 16) + (t2 >> 16)


def _mul_shoup(a, w, w_shoup, q):
    hi = _umulhi(a, w_shoup)
    r = a * w - hi * q
    return jnp.where(r >= q, r - q, r)


def _add_mod(a, b, q):
    r = a + b
    return jnp.where(r >= q, r - q, r)


def _sub_mod(a, b, q):
    return jnp.where(a >= b, a - b, a + q - b)


def _fwd_kernel(n: int, q_ref, x_ref, tw_ref, twsh_ref, out_ref):
    q = q_ref[pl.program_id(0), 0]
    x = x_ref[0].reshape(n)            # [n/128, 128] block → flat row in VMEM
    tw = tw_ref[0].reshape(n)
    twsh = twsh_ref[0].reshape(n)
    m = 1
    while m < n:
        t = n // (2 * m)
        xv = x.reshape(m, 2 * t)
        u = xv[:, :t]
        v = xv[:, t:]
        w = tw[m:2 * m].reshape(m, 1)
        wsh = twsh[m:2 * m].reshape(m, 1)
        vw = _mul_shoup(v, w, wsh, q)
        x = jnp.concatenate([_add_mod(u, vw, q), _sub_mod(u, vw, q)],
                            axis=1).reshape(n)
        m *= 2
    out_ref[0] = x.reshape(n // 128, 128)


def _inv_kernel(n: int, q_ref, x_ref, itw_ref, itwsh_ref, ninv_ref,
                ninvsh_ref, out_ref):
    i = pl.program_id(0)
    q = q_ref[i, 0]
    x = x_ref[0].reshape(n)
    itw = itw_ref[0].reshape(n)
    itwsh = itwsh_ref[0].reshape(n)
    m = n // 2
    while m >= 1:
        t = n // (2 * m)
        xv = x.reshape(m, 2 * t)
        u = xv[:, :t]
        v = xv[:, t:]
        w = itw[m:2 * m].reshape(m, 1)
        wsh = itwsh[m:2 * m].reshape(m, 1)
        s = _add_mod(u, v, q)
        d = _mul_shoup(_sub_mod(u, v, q), w, wsh, q)
        x = jnp.concatenate([s, d], axis=1).reshape(n)
        m //= 2
    out_ref[0] = _mul_shoup(x, ninv_ref[i, 0], ninvsh_ref[i, 0],
                            q).reshape(n // 128, 128)


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def pallas_fwd_ntt(a, q, tw, twsh, *, n: int, interpret: bool = False):
    """Forward negacyclic NTT of [..., L, n] (rows transform independently)."""
    batch_shape = a.shape[:-1]
    rows = int(np.prod(batch_shape)) if batch_shape else 1
    L = q.shape[0]
    reps = rows // L
    sub = n // 128
    a2 = a.reshape(rows, sub, 128)
    tw_rows = (jnp.tile(tw, (reps, 1)) if reps > 1 else tw).reshape(rows, sub, 128)
    twsh_rows = (jnp.tile(twsh, (reps, 1)) if reps > 1 else twsh).reshape(rows, sub, 128)
    q_rows = (jnp.tile(q.reshape(L, 1), (reps, 1)) if reps > 1
              else q.reshape(L, 1))
    blk = lambda: pl.BlockSpec((1, sub, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n),
        grid=(rows,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), blk(), blk(), blk()],
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct((rows, sub, 128), jnp.uint32),
        interpret=interpret,
    )(q_rows, a2, tw_rows, twsh_rows)
    return out.reshape(a.shape)


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def pallas_inv_ntt(a, q, itw, itwsh, ninv, ninvsh, *, n: int,
                   interpret: bool = False):
    """Inverse negacyclic NTT of [..., L, n]."""
    batch_shape = a.shape[:-1]
    rows = int(np.prod(batch_shape)) if batch_shape else 1
    L = q.shape[0]
    reps = rows // L
    sub = n // 128
    a2 = a.reshape(rows, sub, 128)
    tile = (lambda arr: jnp.tile(arr, (reps, 1))) if reps > 1 else (lambda arr: arr)
    blk = lambda: pl.BlockSpec((1, sub, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_inv_kernel, n),
        grid=(rows,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), blk(), blk(), blk(),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct((rows, sub, 128), jnp.uint32),
        interpret=interpret,
    )(jnp.tile(q.reshape(L, 1), (reps, 1)) if reps > 1 else q.reshape(L, 1),
      a2, tile(itw).reshape(rows, sub, 128), tile(itwsh).reshape(rows, sub, 128),
      jnp.tile(ninv, (reps, 1)) if reps > 1 else ninv,
      jnp.tile(ninvsh, (reps, 1)) if reps > 1 else ninvsh)
    return out.reshape(a.shape)
