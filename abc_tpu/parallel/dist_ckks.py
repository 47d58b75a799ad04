"""Fully sharded CKKS ct-ct multiply + relinearization (BASELINE config 5:
"CKKS multi-host: limbs+coeffs sharded, NTT all-to-all").

Composition over a mesh axis carrying polynomial COEFFICIENTS:
  * every NTT (tensor product in the data base, key-switch decomposition in
    the extended base q∪P) runs through DistNttContext — butterfly exchange
    stages ride the interconnect as ppermute, local stages stay on-chip;
  * everything else (tensor product, switching-key inner product, the
    decomposition-limb accumulation, P-division) is coefficient-ELEMENTWISE
    and therefore communication-free under the same sharding — XLA/GSPMD
    propagates the coeff sharding through these ops with zero collectives.

A second mesh axis ("dp") can batch independent ciphertexts; the existing
parallel/sharding.py limb axis composes for the key-switch contraction.

Outputs are BIT-IDENTICAL to CkksContext.multiply on one device (tested on
the 8-virtual-device CPU mesh, tests/test_dist_ckks.py).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from abc_tpu.crypto.ckks import CkksContext
from abc_tpu.ops.modarith import jx32
from abc_tpu.parallel.dist_ntt import DistNttContext


class DistCkksMultiplier:
    """Sharded multiply+relin at the TOP level of a CkksContext.

    ctx must use the jx32 engine; keys are generated host-side as usual and
    device-placed with the coeff sharding once at construction.
    """

    def __init__(self, ctx: CkksContext, mesh: Mesh, axis: str = "coeff"):
        self.ctx = ctx
        self.mesh = mesh
        self.axis = axis
        if ctx.params.ks_digits != 1:
            raise ValueError(
                "DistCkks implements the single-special-prime (k=1) "
                "key-switch layout; build the context with ks_digits=1")
        L = ctx.params.L
        self.level = L
        n = ctx.params.n
        D = mesh.shape[axis]
        cols = list(range(L)) + [L]
        self.cols_idx = np.asarray(cols, dtype=np.int64)

        ntt_q = ctx.ntt_qp.subset(list(range(L)))
        ntt_qp = ctx.ntt_qp.subset(cols)
        dq = DistNttContext(ntt_q, D)
        dqp = DistNttContext(ntt_qp, D)
        # ciphertexts are [k, L, n]: one leading unsharded axis
        self.fwd_q = dq.make_fwd(mesh, axis, extra_specs=(None,))
        self.inv_q = dq.make_inv(mesh, axis, extra_specs=(None,))
        self.fwd_qp = dqp.make_fwd(mesh, axis, extra_specs=(None,))
        self.inv_qp2 = dqp.make_inv(mesh, axis, extra_specs=(None,))

        # tables (broadcast over coeff — tiny [·, 1] columns)
        self.q_l = ctx._tab["q_full"][:L]
        self.mu_l = ctx._tab["mu_full"][:L]
        self.q_cols = ctx._tab["q_full"][self.cols_idx].reshape(1, L + 1, 1)
        self.mu_cols = ctx._tab["mu_full"][self.cols_idx].reshape(1, L + 1, 1)

        # switching key, device-placed with the coefficient sharding.
        # make_array_from_callback (not device_put) so construction also
        # works when the mesh spans multiple PROCESSES (multihost.py):
        # each process materializes only its addressable coeff slices.
        ksk_b_full, ksk_a_full = ctx.get_relin_key()
        sh = NamedSharding(mesh, P(None, None, axis))
        kb = np.asarray(ksk_b_full)[:L][:, self.cols_idx]
        ka = np.asarray(ksk_a_full)[:L][:, self.cols_idx]
        self.ksk_b = jax.make_array_from_callback(
            kb.shape, sh, lambda idx: kb[idx])
        self.ksk_a = jax.make_array_from_callback(
            ka.shape, sh, lambda idx: ka[idx])

    def __call__(self, a_data, b_data, ksk_b=None, ksk_a=None) -> Tuple:
        """[2, L, n] × [2, L, n] → [2, L, n], relinearized, coeff-sharded.

        ksk_b/ksk_a default to the construction-time keys; multi-process
        callers must pass them as ARGUMENTS (jit cannot close over arrays
        spanning non-addressable devices)."""
        if ksk_b is None:
            ksk_b, ksk_a = self.ksk_b, self.ksk_a
        ctx, L = self.ctx, self.level
        e = jx32
        fa = self.fwd_q(a_data)
        fb = self.fwd_q(b_data)
        d0 = e.mul(fa[0], fb[0], self.q_l, self.mu_l)
        d1 = e.add(e.mul(fa[0], fb[1], self.q_l, self.mu_l),
                   e.mul(fa[1], fb[0], self.q_l, self.mu_l), self.q_l)
        d2 = e.mul(fa[1], fb[1], self.q_l, self.mu_l)
        data = self.inv_q(jnp.stack([d0, d1, d2]))

        # key switch of the s² component (coeff-elementwise except the NTTs)
        n = ctx.params.n
        lifted = jnp.broadcast_to(data[2][:, None, :], (L, L + 1, n))
        lifted = jnp.where(lifted >= self.q_cols, lifted - self.q_cols, lifted)
        Dm = self.fwd_qp(lifted)
        tb = e.mul(Dm, ksk_b, self.q_cols, self.mu_cols)
        ta = e.mul(Dm, ksk_a, self.q_cols, self.mu_cols)
        q_flat = self.q_cols[0]
        acc_b, acc_a = tb[0], ta[0]
        for k in range(1, L):
            acc_b = e.add(acc_b, tb[k], q_flat)
            acc_a = e.add(acc_a, ta[k], q_flat)
        acc = self.inv_qp2(jnp.stack([acc_b, acc_a]))
        k0 = ctx._mod_switch_down(acc[0], L)
        k1 = ctx._mod_switch_down(acc[1], L)
        c0 = e.add(data[0], k0, self.q_l)
        c1 = e.add(data[1], k1, self.q_l)
        return jnp.stack([c0, c1])
