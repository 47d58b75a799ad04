"""Measured ablation of the fused Pallas NTT kernel (VERDICT round-2 item 1).

Round 2 reported the n=16384 kernel at ~22% of a PAPER speed-of-light model
(40 u32 ops/butterfly over a 3.85e12 ops/s VPU). That model was wrong in
both factors; this script measures where the time actually goes and
calibrates what the VPU actually sustains, so the model can be reconciled
against reality instead of hand-waved:

  variants (identical grid/DMA structure, same [B, 1, G, R, 128] blocks):
    zero        — kernel body copies x -> out           (grid + DMA floor)
    rolls_only  — per stage: entry-reduce + 2 rolls + selects, no multiply
    muls_only   — per stage: entry-reduce + stage multiply, no rolls
    masks_only  — per stage: just the is_u mask compute + one select
    full        — the shipping kernel (bit-exact path)

  calibration (pure-ALU kernels, no rolls, VMEM-resident):
    alu_mac     — x = x*c + d chains       -> sustained u32 mul+add ops/s
    alu_shoup   — chained lazy-Shoup mults -> sustained ops/s on the EXACT
                  19-op mix the butterfly uses (umulhi-dominated)

Derived outputs: an op census of the shipping kernel (counted from the
code, printed alongside), achieved ALU ops/s = census x measured
butterflies/s, and pct of the CALIBRATED ceiling. Run on the real chip:

    timeout 1800 python scripts/ntt_ablation.py [--quick]

Results are recorded in docs/NTT_ABLATION.md.
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from abc_tpu.crypto.ntt import NttContext
from abc_tpu.crypto.params import BfvParams
from abc_tpu.ops.pallas_ntt import (
    LANE, LANE_STAGES, NttKernels, _is_u_mask, _mul_shoup_lazy, _roll,
    _stage_mul, _prep, _pad_limbs, _xblk, _tblk)

N = 16384
REPEATS = 3


def timed(f, *args):
    jax.block_until_ready(f(*args))
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


# The axon-tunneled TPU adds a LARGE fixed per-dispatch latency (~tens of
# ms) that poisons single-chain-length timings (the round-2 21.1 Gbf/s
# headline was measured at chain=512 with that latency folded in). Every
# per-iteration cost here is therefore derived from TWO chain lengths:
#   per_iter = (t(chain) - t(chain/2)) / (chain/2)
# which cancels the fixed dispatch+transfer cost exactly.

def timed_per_iter(make_chain, x0, chain):
    t_full = timed(make_chain(chain), x0)
    t_half = timed(make_chain(chain // 2), x0)
    fixed = 2 * t_half - t_full        # implied fixed overhead per call
    return (t_full - t_half) / (chain // 2), fixed


# --------------------------------------------------------------------------
# ablation kernel: same structure as _fwd_kernel, pieces switchable
# --------------------------------------------------------------------------

def _ablate_kernel(n, G, mode, q_ref, x_ref, pw_ref, psh_ref, lw_ref,
                   lsh_ref, out_ref):
    i = pl.program_id(0)
    logn = n.bit_length() - 1
    for g in range(G):
        q = q_ref[i * G + g, 0]
        two_q = q + q
        x = x_ref[0, 0, g]
        pw, psh = pw_ref[g], psh_ref[g]
        lw, lsh = lw_ref[g], lsh_ref[g]
        if mode == "zero":
            out_ref[0, 0, g] = x
            continue
        for s in range(logn):
            t = n // (2 << s)
            if mode == "masks_only":
                is_u = _is_u_mask(n, t)
                x = jnp.where(is_u, x, x + jnp.uint32(1))
                continue
            xr = jnp.where(x >= two_q, x - two_q, x)
            if mode == "rolls_sub" and t >= LANE or \
                    mode == "rolls_lane" and t < LANE:
                is_u = _is_u_mask(n, t)
                hi = _roll(xr, -1, t)
                lo = _roll(xr, 1, t)
                sel = jnp.where(is_u, hi, xr)
                x = jnp.where(is_u, xr + sel, lo + (two_q - sel))
            elif mode in ("rolls_sub", "rolls_lane"):
                x = xr + jnp.uint32(1)
            elif mode == "rolls_only":
                is_u = _is_u_mask(n, t)
                hi = _roll(xr, -1, t)
                lo = _roll(xr, 1, t)
                sel = jnp.where(is_u, hi, xr)
                x = jnp.where(is_u, xr + sel, lo + (two_q - sel))
            elif mode == "muls_only":
                wv = _stage_mul(n, s, xr, pw, psh, lw, lsh, q)
                x = xr + wv
            elif mode == "split0" and s == 0:
                # first stage (one block, t = n/2): both output halves are
                # formed from the SAME static slices — u' = xr_top + m_bot,
                # v' = xr_top + (2q − m_bot) — zero rolls, zero selects,
                # and the multiply only runs on the bottom half
                R = n // LANE
                xr_top = xr[:R // 2]
                w = jnp.broadcast_to(pw[:R // 2, 0:1], (R // 2, LANE))
                wsh = jnp.broadcast_to(psh[:R // 2, 0:1], (R // 2, LANE))
                m_bot = _mul_shoup_lazy(xr[R // 2:], w, wsh, q)
                x = jnp.concatenate([xr_top + m_bot,
                                     xr_top + (two_q - m_bot)], axis=0)
            elif mode == "splitk" and t >= LANE and (n // LANE) // \
                    (2 * (t // LANE)) <= 4:
                # generalized zero-roll form for the first sublane stages:
                # per 2t'-sublane block, u' = top + w_b*bot and
                # v' = top + (2q − w_b*bot) from static slices; concat of
                # 2·nblocks pieces (tried for nblocks ≤ 4)
                R = n // LANE
                tp = t // LANE
                nblocks = R // (2 * tp)
                pieces = []
                for bidx in range(nblocks):
                    base = bidx * 2 * tp
                    top = xr[base:base + tp]
                    w = jnp.broadcast_to(pw[base:base + tp, s:s + 1],
                                         (tp, LANE))
                    wsh = jnp.broadcast_to(psh[base:base + tp, s:s + 1],
                                           (tp, LANE))
                    m_bot = _mul_shoup_lazy(xr[base + tp:base + 2 * tp],
                                            w, wsh, q)
                    pieces.append(top + m_bot)
                    pieces.append(top + (two_q - m_bot))
                x = jnp.concatenate(pieces, axis=0)
            elif mode in ("reformed", "split0", "splitk"):
                # multiply EVERYWHERE by the own-position stage twiddle
                # (block-constant within 2t, so m[p+t] is the u-side's
                # needed product): one select fewer per stage than `full`
                is_u = _is_u_mask(n, t)
                m_all = _stage_mul(n, s, xr, pw, psh, lw, lsh, q)
                pm = _roll(m_all, -1, t)
                px = _roll(xr, 1, t)
                x = jnp.where(is_u, xr + pm, px + (two_q - m_all))
            else:  # full
                is_u = _is_u_mask(n, t)
                hi = _roll(xr, -1, t)
                lo = _roll(xr, 1, t)
                wv = _stage_mul(n, s, jnp.where(is_u, hi, xr),
                                pw, psh, lw, lsh, q)
                x = jnp.where(is_u, xr + wv, lo + (two_q - wv))
        x = jnp.where(x >= two_q, x - two_q, x)
        out_ref[0, 0, g] = jnp.where(x >= q, x - q, x)


@functools.partial(jax.jit, static_argnames=("n", "mode"))
def ablate_ntt(a, q, pw, psh, lw, lsh, *, n, mode):
    B, L, G, ngroups, sub, a5 = _prep(a, q, n)
    Lp = G * ngroups
    out = pl.pallas_call(
        functools.partial(_ablate_kernel, n, G, mode),
        grid=(ngroups, B),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  _xblk(G, sub),
                  _tblk(G, (sub, LANE)), _tblk(G, (sub, LANE)),
                  _tblk(G, (8, LANE)), _tblk(G, (8, LANE))],
        out_specs=_xblk(G, sub),
        out_shape=jax.ShapeDtypeStruct((B, ngroups, G, sub, LANE),
                                       jnp.uint32),
    )(_pad_limbs(q.reshape(L, 1), Lp), a5,
      _pad_limbs(pw, Lp), _pad_limbs(psh, Lp),
      _pad_limbs(lw, Lp), _pad_limbs(lsh, Lp))
    return out.reshape(B, Lp, n)[:, :L].reshape(a.shape)


# --------------------------------------------------------------------------
# ALU calibration kernels
# --------------------------------------------------------------------------

def _alu_mac_kernel(iters, x_ref, out_ref):
    x = x_ref[0]
    c = jnp.uint32(2654435761)
    d = jnp.uint32(40503)
    for _ in range(iters):
        x = x * c + d          # 2 u32 ops/element/iter
    out_ref[0] = x


def _alu_shoup_kernel(iters, x_ref, out_ref):
    x = x_ref[0]
    w = jnp.uint32(536813569)
    wsh = jnp.uint32(1073780736)
    q = jnp.uint32(536903681)
    for _ in range(iters):
        x = _mul_shoup_lazy(x, w, wsh, q)   # 19 u32 ops/element/iter
    out_ref[0] = x


@functools.partial(jax.jit, static_argnames=("kind", "iters"))
def alu_chain(x, *, kind, iters):
    kern = _alu_mac_kernel if kind == "mac" else _alu_shoup_kernel
    return pl.pallas_call(
        functools.partial(kern, iters),
        grid=(x.shape[0],),
        in_specs=[pl.BlockSpec((1,) + x.shape[1:], lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1,) + x.shape[1:], lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
    )(x)


# --------------------------------------------------------------------------
# op census of the shipping kernel (counted from the code, per ELEMENT)
# --------------------------------------------------------------------------

def census(n):
    logn = n.bit_length() - 1
    s1 = logn - LANE_STAGES
    shoup = 19          # _mul_shoup_lazy: umulhi(16) + mul,mul,sub
    entry = 3           # cmp, sub, select
    mask = 4            # broadcasted_iota + mod + cmp (may be CSEd/hoisted)
    update = 5          # select-partner + add, sub, add, select
    sub_stage = entry + mask + update + shoup            # + 2 rolls
    lane_stage = entry + mask + update + 2 * shoup       # + 2 rolls
    final = 6
    alu = s1 * sub_stage + LANE_STAGES * lane_stage + final
    rolls = 2 * logn
    return {"alu_per_element": alu, "rolls_per_element": rolls,
            "alu_per_butterfly": 2 * alu / logn,
            "rolls_per_butterfly": 2 * rolls / logn,
            "sublane_stage_alu": sub_stage, "lane_stage_alu": lane_stage}


def batched_ab(quick: bool = False):
    """Reproduce the round-4 batched A/B (docs/NTT_ABLATION.md §round 4):
    rank-1 vs full-plane kernels at B ∈ {1, 8, 16, 64}, median of 5
    alternating two-point estimates per variant."""
    from abc_tpu.ops.pallas_ntt import pallas_fwd_ntt, pallas_fwd_ntt_fp

    params = BfvParams.create(N, engine="jx32", seed=5)
    moduli = list(params.coeff_modulus)
    L = len(moduli)
    ntt = NttContext(N, moduli, engine="jx32")
    k = NttKernels(ntt)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.integers(0, min(moduli), size=(L, N),
                                  dtype=np.uint64).astype(np.uint32))
    bf = L * (N // 2) * (N.bit_length() - 1)

    def fwd_rank1(v):
        return pallas_fwd_ntt(v, k.q, k.fpw, k.fps, k.flw, k.fls, n=N)

    def fwd_fp(v):
        return pallas_fwd_ntt_fp(v, k.q, k.fpw, k.fps, k.f_flw, k.f_fls,
                                 n=N)

    cache = {}

    def per_fwd(name, fn, B, chain):
        xB = x0 if B == 1 else jnp.broadcast_to(x0[None], (B,) + x0.shape)

        def make(c):
            if (name, B, c) not in cache:
                @jax.jit
                def ch(v):
                    return jax.lax.fori_loop(0, c, lambda i, u: fn(u), v)
                cache[(name, B, c)] = ch
            return cache[(name, B, c)]
        t_f = timed(make(chain), xB)
        t_h = timed(make(chain // 2), xB)
        return (t_f - t_h) / (chain // 2) / B

    k_est = 3 if quick else 5
    for B, chain in ((1, 2048), (8, 256), (16, 128), (64, 32)):
        if quick:
            chain //= 4
        row = {}
        for name, fn in (("rank1", fwd_rank1), ("fp", fwd_fp)):
            ests = sorted(per_fwd(name, fn, B, chain) for _ in range(k_est))
            med = ests[len(ests) // 2]
            row[name] = {"us_per_fwd": round(med * 1e6, 2),
                         "Gbf_s": round(bf / med / 1e9, 1),
                         "spread_us": [round(ests[0] * 1e6, 2),
                                       round(ests[-1] * 1e6, 2)]}
        print(json.dumps({"B": B, **row}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--chain", type=int, default=0)
    ap.add_argument("--batched", action="store_true",
                    help="run the rank-1 vs full-plane batched A/B instead")
    args = ap.parse_args()
    if args.batched:
        batched_ab(args.quick)
        return

    backend = jax.default_backend()
    chain = args.chain or (64 if args.quick else 256)
    params = BfvParams.create(N, engine="jx32", seed=5)
    moduli = list(params.coeff_modulus)
    L = len(moduli)
    ntt = NttContext(N, moduli, engine="jx32")
    k = NttKernels(ntt)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.integers(0, min(moduli), size=(L, N),
                                  dtype=np.uint64).astype(np.uint32))
    logn = N.bit_length() - 1
    bf_per_fwd = L * (N // 2) * logn
    out = {"backend": backend, "n": N, "L": L, "chain": chain,
           "census": census(N)}

    def chain_f(mode):
        def make(c):
            @jax.jit
            def f(v):
                return jax.lax.fori_loop(
                    0, c,
                    lambda i, u: ablate_ntt(u, k.q, k.fpw, k.fps, k.flw,
                                            k.fls, n=N, mode=mode), v)
            return f
        return make

    for mode in ["zero", "masks_only", "rolls_only", "muls_only", "full",
                 "reformed"]:
        t, fixed = timed_per_iter(chain_f(mode), x0, chain)
        out[mode] = {"us_per_fwd": round(t * 1e6, 2),
                     "fixed_dispatch_ms": round(fixed * 1e3, 2),
                     "Gbutterflies_per_s": round(bf_per_fwd / t / 1e9, 2)}
        print(mode, out[mode], flush=True)

    # shipping kernel (independent build path, sanity cross-check)
    def ship(c):
        @jax.jit
        def f(v):
            return jax.lax.fori_loop(0, c, lambda i, u: k.fwd(u), v)
        return f
    t, fixed = timed_per_iter(ship, x0, chain)
    out["shipping"] = {"us_per_fwd": round(t * 1e6, 2),
                       "fixed_dispatch_ms": round(fixed * 1e3, 2),
                       "Gbutterflies_per_s": round(bf_per_fwd / t / 1e9, 2)}
    print("shipping", out["shipping"], flush=True)

    # ALU calibration: [1, R, 128] block resident, iters chained in-kernel,
    # pallas_call chained again by fori_loop; two-point as above
    iters = 512
    xa = x0.reshape(L, N // LANE, LANE)

    def alu_f(kind):
        def make(c):
            @jax.jit
            def f(v):
                return jax.lax.fori_loop(
                    0, c, lambda i, u: alu_chain(u, kind=kind, iters=iters),
                    v)
            return f
        return make

    for kind, ops in [("mac", 2), ("shoup", 19)]:
        t, fixed = timed_per_iter(alu_f(kind), xa, max(8, chain // 16))
        total_ops = L * N * iters * ops
        out[f"alu_{kind}"] = {
            "iters": iters,
            "fixed_dispatch_ms": round(fixed * 1e3, 2),
            "sustained_Gops_s": round(total_ops / t / 1e9, 1)}
        print(f"alu_{kind}", out[f"alu_{kind}"], flush=True)

    # reconciliation
    c = out["census"]
    full_bfs = out["full"]["Gbutterflies_per_s"] * 1e9
    achieved_alu = full_bfs * c["alu_per_butterfly"]
    ceiling = out["alu_shoup"]["sustained_Gops_s"] * 1e9
    out["reconciled"] = {
        "achieved_alu_Gops_s": round(achieved_alu / 1e9, 1),
        "calibrated_ceiling_Gops_s": round(ceiling / 1e9, 1),
        "pct_of_calibrated_alu_ceiling":
            round(100 * achieved_alu / ceiling, 1),
        "reconciled_sol_Gbutterflies_s":
            round(ceiling / c["alu_per_butterfly"] / 1e9, 2),
        "pct_of_reconciled_sol":
            round(100 * full_bfs * c["alu_per_butterfly"] / ceiling, 1),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
