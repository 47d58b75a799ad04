"""Benchmark harness — prints ONE JSON line carrying the BASELINE.json
headline metrics (the driver records the last line in BENCH_r{N}.json):

  value / vs_baseline  : RNS-NTT butterflies/s/chip @ n=16384 L=14 at B=1
                         — the first metric BASELINE.json names — as the
                         MEDIAN of K_EST independent two-point estimates,
                         with min/max spread (round-4 protocol: single
                         estimates drift ±10%% on this rig). Baseline =
                         SEAL CPU NTT stand-in (BASELINE.md).
  batch curves         : NTT Gbf/s and ct mult+relin ops/s at
                         B ∈ {1, 8, 16, 64} (B ≥ 8 rides the full-plane
                         lane-table kernels; mult+relin B>1 are vmapped
                         dependent chains — BASELINE's "batched" metric).
  "suite"              : the five BASELINE staged configs (cardio-on-dummy,
                         mult+relin, batched hamming w/ rotations, cone
                         rewriting, CKKS n=32768) plus config 6 — encrypted
                         LaplaceSharpening e2e at the reference's n=16384
                         via the whole-program JIT — measured fresh each run.

Speed-of-light model (docs/NTT_ABLATION.md — measured, not paper): the
measured component ablation puts the shipping kernel at 31.06 us/fwd
(n=16384, L=14) = 8.3 us HBM/grid floor + 10.3 us rolls + 13.8 us
multiplies. The VPU_SOL constant below is the ROUND-2 PAPER model (20 u32
ops/el/stage over a 3.85e12 ops/s VPU = 9.63e10 bf/s), kept so pct_sol is
comparable across rounds; the honest op census (~82 ALU + 4 rolls per
butterfly) prices the same VPU at ~4.7e10 bf/s, which the kernel exceeds —
see the ablation doc for the reconciliation. The NTT baseline stand-in is
SEAL's CPU NTT at n=16384 ≈ 0.57 ms/row ≈ 2.0e8 butterflies/s (m5n.xlarge,
single thread, documented stand-in — BASELINE.md). All timings use
two-point chain differencing (the tunnel adds ~22 ms fixed per dispatch).

Robustness: the TPU tunnel in this environment can wedge; every device
measurement runs in a SUBPROCESS with a hard timeout, falling back to a
measured CPU number (clearly labeled) rather than hanging the driver.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SEAL_CPU_BASELINE_OPS_PER_S = 40.0
SEAL_CPU_NTT_BUTTERFLIES_PER_S = 2.0e8
VPU_SOL_BUTTERFLIES_PER_S = 9.63e10
N = 8192
N_NTT = 16384
CHAIN = 512        # dependent mult+relin ops chained per jitted call (TPU)
BATCH = 8          # independent chains vmapped together ("batched" metric)
CHAIN_CPU = 4      # the jx32-on-CPU fallback is ~100x slower per op
CHAIN_NTT = 2048   # dependent forward transforms chained per call — long
                   # enough that the two-point difference (~32 ms at 31 us/
                   # fwd) dwarfs the tunnel's per-dispatch jitter (two-point
                   # estimates at chain 512 varied 42-53 Gbf/s run to run)
CHAIN_NTT_CPU = 8
REPEATS = 3        # timed calls per chain length within one estimate
K_EST = 5          # independent two-point estimates; report median+min/max
TPU_TIMEOUT_S = 1500   # first-time jit compile on TPU can take minutes
SUITE_TIMEOUT_S = 4800  # config 6 (whole-program laplace e2e) adds TWO
                        # multi-minute XLA compiles on the tunneled TPU
                        # (warmup pass + measured steady-state pass)

_WORKER = r"""
import json, sys, time
import numpy as np
import jax, jax.numpy as jnp
if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")
from abc_tpu.utils.compcache import enable_persistent_cache
enable_persistent_cache()
from abc_tpu.crypto.behz import BehzContext
from abc_tpu.crypto.bfv import BfvCiphertext, BfvContext
from abc_tpu.crypto.ntt import NttContext
from abc_tpu.crypto.params import BfvParams

N, N_NTT, REPEATS, K_EST = %d, %d, %d, %d
backend = jax.default_backend()
CHAIN = %d if backend == "tpu" else %d
CHAIN_NTT = %d if backend == "tpu" else %d
BATCHES = (1, 8, 16, 64) if backend == "tpu" else (1, 8)

def timed(f, *args):
    jax.block_until_ready(f(*args))
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)

# Two-point chain timing: the axon-tunneled TPU adds a LARGE fixed
# per-dispatch latency (measured ~22 ms, scripts/ntt_ablation.py) that a
# single chain-length measurement folds into the per-op number (the round-2
# NTT headline under-reported the kernel 2.4x because of it). Timing the
# same chain at full and half length and differencing cancels the fixed
# cost exactly: per_iter = (t(c) - t(c/2)) / (c/2).
#
# Round 4: the headline is the MEDIAN of K_EST independent two-point
# estimates, with min/max reported — round-3 runs showed +-10%% drift
# between single estimates, and the round-3 README quoted a best run 13%%
# above the artifact of record (verdict weak item 2).

def estimates(make_chain, chain, *args):
    fulls = {}
    def t(c):
        if c not in fulls:
            fulls[c] = make_chain(c)
        return timed(fulls[c], *args)
    out = []
    fixed = []
    # Host contention (another process hogging CPU between the paired
    # timings) can INVERT a pair (t_full < t_half), producing negative or
    # absurd per-op numbers; one contaminated run published a -1.9e8
    # ops/s batch point. Discard non-positive pairs and retry, up to 3x
    # the budget; a run where nothing validates reports nan rather than
    # garbage.
    attempts = 0
    while len(out) < K_EST and attempts < 3 * K_EST:
        attempts += 1
        t_full = t(chain)
        t_half = t(chain // 2)
        per = (t_full - t_half) / (chain // 2)
        if per <= 0:
            continue
        out.append(per)
        fixed.append(2 * t_half - t_full)
    if not out:
        return float("nan"), float("nan"), float("nan"), 0.0
    out.sort()
    return out[len(out) // 2], out[0], out[-1], sorted(fixed)[len(fixed)//2]

# --- batched ct-ct mult+relin at n=8192 (BASELINE config 2) ----------------
ctx = BfvContext(BfvParams.create(N, engine="jx32", seed=123))
ctx.ensure_eval_ready()     # attach Pallas + BEHZ eagerly (outside traces)
ctx.get_relin_key()
a = ctx.encrypt(ctx.encode([1, 2, 3, 4]))
b = ctx.encrypt(ctx.encode([5, 6, 7, 8]))

def mult(x, y):
    return ctx.multiply(BfvCiphertext(x), BfvCiphertext(y)).data

def make_chain(c):
    def chain(x, y):
        return jax.lax.fori_loop(0, c, lambda i, v: mult(v, y), x)
    return chain

# B independent dependent-chains vmapped into one executable: the
# BASELINE.json metric is *batched* ct mult+relin/s; the chains stay
# DEPENDENT inside so the number still reflects depth. The B=1 single-ct
# chain is reported alongside every round (round-over-round comparability).
mult_curve = {}
for B in BATCHES:
    if B == 1:
        mk = lambda c: jax.jit(make_chain(c))
        aB, bB = jnp.asarray(np.asarray(a.data)), jnp.asarray(np.asarray(b.data))
    else:
        mk = lambda c: jax.jit(jax.vmap(make_chain(c)))
        aB = jnp.broadcast_to(jnp.asarray(np.asarray(a.data))[None],
                              (B,) + a.data.shape)
        bB = jnp.broadcast_to(jnp.asarray(np.asarray(b.data))[None],
                              (B,) + b.data.shape)
    chain = max(8, CHAIN // B) if backend == "tpu" else CHAIN
    med, lo, hi, fixed = estimates(mk, chain, aB, bB)
    mult_curve[B] = {"ops_per_s": B / med,
                     "ops_per_s_min": B / hi, "ops_per_s_max": B / lo,
                     "fixed_dispatch_ms": fixed * 1e3}

# --- mult+relin speed-of-light census (round 5) ------------------------------
# One abstract trace (jax.eval_shape — compiles nothing) of the SAME step the
# curve above measures, with the NTT contexts and the jx32 engine wrapped by
# row/op counters. The census prices a per-op floor:
#   floor = ntt_rows x t_row  +  elem_ops / VPU
# where t_row comes from THIS run's measured n=16384 NTT (scaled by
# n log n to n=8192) and elem ops use the ablation's per-op ALU counts
# (Barrett mul 19, add/sub/neg 2, Shoup mul 6 u32 ops/element) against the
# nominal 3.85e12 ops/s VPU. pct_sol = floor_time / measured_time.
census = {"ntt_rows": 0, "elem_ops": 0, "_in_ntt": 0}

def _nrows(x):
    import numpy as _np
    return int(_np.prod(x.shape[:-1])) if x.ndim > 1 else 1

# jx32 NttContexts install fwd/inv as INSTANCE lambdas (hot-path attach),
# so the counters wrap the instances the mult step actually uses
_ntt_insts = [ctx.ntt_q, ctx.ntt_qp, ctx._behz.ntt_q, ctx._behz.ntt_bsk]
_ntt_saved = []
def _counted(orig):
    # engine ops INSIDE the transform (stage butterflies) are already
    # priced by the measured t_row — suppress them so elem_ops counts
    # only the BEHZ/key-switch elementwise work
    def g(x):
        census["ntt_rows"] += _nrows(x)
        census["_in_ntt"] += 1
        try:
            return orig(x)
        finally:
            census["_in_ntt"] -= 1
    return g

def _wrap_ntt(inst):
    of, oi = inst.fwd, inst.inv
    _ntt_saved.append((inst, of, oi))
    inst.fwd = _counted(of)
    inst.inv = _counted(oi)
_seen = set()
for _inst in _ntt_insts:
    if id(_inst) not in _seen:
        _seen.add(id(_inst))
        _wrap_ntt(_inst)

from abc_tpu.ops.modarith import jx32 as _jx
_OPS_PER_EL = {"mul": 19, "add": 2, "sub": 2, "neg": 2, "mul_shoup": 6}
_orig_ops = {k: getattr(_jx, k) for k in _OPS_PER_EL}
def _wrap_op(name, orig, cost):
    def f(*args):
        import numpy as _np
        if not census["_in_ntt"]:
            shapes = [getattr(a, "shape", ()) for a in args[:2]]
            census["elem_ops"] += cost * int(
                _np.prod(_np.broadcast_shapes(*shapes)))
        return orig(*args)
    return staticmethod(f)

for _k, _orig in _orig_ops.items():
    setattr(_jx, _k, _wrap_op(_k, _orig, _OPS_PER_EL[_k]))
try:
    jax.eval_shape(mult, jnp.asarray(np.asarray(a.data)),
                   jnp.asarray(np.asarray(b.data)))
finally:
    for _inst, _of, _oi in _ntt_saved:
        _inst.fwd, _inst.inv = _of, _oi
    for _k, _orig in _orig_ops.items():
        setattr(_jx, _k, _orig)

# --- headline: RNS-NTT butterflies/s/chip @ n=16384 -------------------------
# Full production limb chain (BFVDefault-style 13 data + 1 special prime);
# dependent forward transforms chained so depth, not dispatch, dominates.
# B >= 8 routes to the full-plane lane-table kernel (NttKernels auto-select).
p16 = BfvParams.create(N_NTT, engine="jx32", seed=5)
moduli = list(p16.coeff_modulus)    # 13 data + 1 special prime = 14 rows
ntt = NttContext(N_NTT, moduli, engine="jx32")
ntt.warm()                  # attach the Pallas kernels outside the trace
rows = len(moduli)
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.integers(0, min(moduli), size=(rows, N_NTT),
                              dtype=np.uint64).astype(np.uint32))

def make_ntt_chain(c):
    @jax.jit
    def ntt_chain(v):
        return jax.lax.fori_loop(0, c, lambda i, u: ntt.fwd(u), v)
    return ntt_chain

butterflies_per_fwd = rows * (N_NTT // 2) * (N_NTT.bit_length() - 1)
ntt_curve = {}
for B in BATCHES:
    xB = x0 if B == 1 else jnp.broadcast_to(x0[None], (B,) + x0.shape)
    chain = max(16, CHAIN_NTT // B) if backend == "tpu" else CHAIN_NTT
    med, lo, hi, fixed = estimates(make_ntt_chain, chain, xB)
    ntt_curve[B] = {
        "Gbf_s": B * butterflies_per_fwd / med / 1e9,
        "Gbf_s_min": B * butterflies_per_fwd / hi / 1e9,
        "Gbf_s_max": B * butterflies_per_fwd / lo / 1e9,
        "us_per_fwd": med * 1e6 / B,
        "fixed_dispatch_ms": fixed * 1e3,
    }

print(json.dumps({
    "backend": backend,
    "timing_protocol": "median of %%d two-point chain estimates" %% K_EST,
    "mult_relin_curve": mult_curve,
    "ntt_curve": ntt_curve,
    "ntt_rows": rows,
    "mult_relin_census": {k: v for k, v in census.items()
                          if not k.startswith("_")},
}))
""" % (N, N_NTT, REPEATS, K_EST, CHAIN, CHAIN_CPU, CHAIN_NTT, CHAIN_NTT_CPU)

_SUITE_WORKER = r"""
import json, sys
from abc_tpu.utils.compcache import enable_persistent_cache
enable_persistent_cache()
from abc_tpu.benchsuite import run_suite_dict
print(json.dumps(run_suite_dict(fast=True)))
"""


def _run_worker(code: str, mode: str, timeout: float):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__)) + \
        os.pathsep + env.get("PYTHONPATH", "")
    try:
        r = subprocess.run([sys.executable, "-c", code, mode],
                           capture_output=True, text=True, timeout=timeout,
                           env=env)
    except subprocess.TimeoutExpired:
        return None
    if r.returncode != 0:
        return None
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
    return None


def main() -> None:
    # staged suite (BASELINE configs 1-5): python bench.py --suite [N ...]
    if len(sys.argv) > 1 and sys.argv[1] == "--suite":
        from abc_tpu.benchsuite import run_suite
        picks = [int(x) for x in sys.argv[2:]] or None
        run_suite(picks)
        return
    result = _run_worker(_WORKER, "tpu", TPU_TIMEOUT_S)
    suffix = ""
    if result is None or result.get("backend") == "cpu":
        # device unreachable (wedged tunnel) → measured CPU fallback
        result = _run_worker(_WORKER, "cpu", TPU_TIMEOUT_S)
        suffix = " (cpu-fallback; tpu tunnel unavailable)"
        if result is None:
            print(json.dumps({"metric": f"bfv_n{N}_ct_mult_relin (failed)",
                              "value": 0.0, "unit": "ops/s",
                              "vs_baseline": 0.0}))
            return
    suite = _run_worker(_SUITE_WORKER, "suite", SUITE_TIMEOUT_S)
    ntt_curve = result.get("ntt_curve", {})
    mult_curve = result.get("mult_relin_curve", {})

    def rnd(d, k=2):
        return {kk: round(v, k) if isinstance(v, float) else v
                for kk, v in d.items()}

    n1 = ntt_curve.get("1", ntt_curve.get(1, {}))
    best_b, best = max(
        ((b, v) for b, v in ntt_curve.items()),
        key=lambda kv: kv[1]["Gbf_s"], default=("1", {"Gbf_s": 0.0}))
    bfs = n1.get("Gbf_s", 0.0) * 1e9
    m1 = mult_curve.get("1", mult_curve.get(1, {}))
    m8 = mult_curve.get("8", mult_curve.get(8, {}))
    mbest_b, mbest = max(
        ((b, v) for b, v in mult_curve.items()),
        key=lambda kv: kv[1]["ops_per_s"], default=("1", {"ops_per_s": 0.0}))
    full = {
        "headline_ntt": {
            "metric": f"rns_ntt_butterflies_per_s_chip_n{N_NTT}"
                      f"_L{result.get('ntt_rows', 0)}",
            "value": round(bfs / 1e9, 3),
            "unit": "Gbutterflies/s",
            "timing": result.get("timing_protocol", ""),
            "spread_Gbf_s": [round(n1.get("Gbf_s_min", 0.0), 2),
                             round(n1.get("Gbf_s_max", 0.0), 2)],
            "batch_curve": {b: rnd(v) for b, v in ntt_curve.items()},
            "best_batched": {"B": best_b,
                             "Gbf_s": round(best["Gbf_s"], 2)},
            "pct_vpu_speed_of_light":
                round(100 * bfs / VPU_SOL_BUTTERFLIES_PER_S, 1),
            "ablation": "docs/NTT_ABLATION.md (measured two-point timing; "
                        "the SoL model is the round-2 paper model kept for "
                        "round-over-round comparability)",
            "vs_baseline": round(bfs / SEAL_CPU_NTT_BUTTERFLIES_PER_S, 2),
        },
        "mult_relin": {
            "metric": f"bfv_n{N}_ct_mult_relin ({result['backend']}{suffix})",
            "batch_curve": {b: rnd(v) for b, v in mult_curve.items()},
            "batched8_ops_per_s": round(m8.get("ops_per_s", 0.0), 2),
            "single_ct_ops_per_s": round(m1.get("ops_per_s", 0.0), 2),
            "best_batched": {"B": mbest_b,
                             "ops_per_s": round(mbest["ops_per_s"], 2)},
            "vs_baseline": round(m8.get("ops_per_s", 0.0)
                                 / SEAL_CPU_BASELINE_OPS_PER_S, 2),
            "speed_of_light": _mult_relin_sol(result, m1),
        },
        "suite": suite if suite is not None
        else {"error": "suite worker failed/timed out"},
    }
    # full record to a file; ONE compact line (<1500 chars) to stdout so the
    # driver's tail capture keeps the headline intact (round-2 lesson:
    # BENCH_r02.json had "parsed": null because the line overflowed)
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "bench_suite.json"), "w") as f:
        json.dump(full, f, indent=1)
    # keep README/BASELINE generated blocks in lockstep with the fresh
    # artifact (they are CI-checked for zero drift) — every bench run,
    # including the driver's, leaves the pair consistent
    try:
        sys.path.insert(0, os.path.join(here, "scripts"))
        import sync_bench_docs
        sync_bench_docs.main([])
    except Exception as exc:                    # pragma: no cover
        print(f"warning: doc sync failed: {exc}", file=sys.stderr)
    line = {
        "metric": full["headline_ntt"]["metric"]
        + f" ({result['backend']}{suffix})",
        "value": full["headline_ntt"]["value"],
        "unit": "Gbutterflies/s",
        "vs_baseline": full["headline_ntt"]["vs_baseline"],
        "spread": full["headline_ntt"]["spread_Gbf_s"],
        "pct_sol": full["headline_ntt"]["pct_vpu_speed_of_light"],
        "ntt_Gbf_s_by_batch": {b: round(v["Gbf_s"], 1)
                               for b, v in ntt_curve.items()},
        "mult_relin_ops_s_by_batch": {b: round(v["ops_per_s"], 0)
                                      for b, v in mult_curve.items()},
        "suite": _compact_suite(suite),
        "full": "bench_suite.json",
    }
    out = json.dumps(line)
    if len(out) > 1500:  # belt-and-braces: drop the suite digest
        line["suite"] = "see bench_suite.json"
        out = json.dumps(line)
    print(out)


def _mult_relin_sol(result, m1):
    """Per-op floor for the n=8192 mult+relin from THIS run's measured NTT
    row cost + the census's elementwise op count (round-5; previously the
    op had no speed-of-light accounting of its own):

      floor = ntt_rows · t_row(n=8192) + elem_ops / VPU_nominal

    t_row scales the measured n=16384 per-row time by n·log2(n) (per-row
    butterfly work is (n/2)·log2(n)). pct_sol is the measured single-ct
    chain against that floor; the census fields let the model be audited.
    """
    census = result.get("mult_relin_census")
    n1 = result.get("ntt_curve", {}).get("1") or \
        result.get("ntt_curve", {}).get(1)
    if not census or not n1 or not m1.get("ops_per_s"):
        return {"error": "census or measurements missing"}
    rows16 = result.get("ntt_rows", 14)
    t_row_16384_s = n1["us_per_fwd"] * 1e-6 / rows16
    scale = (N * (N.bit_length() - 1)) / (N_NTT * (N_NTT.bit_length() - 1))
    t_row_s = t_row_16384_s * scale
    ntt_floor_s = census["ntt_rows"] * t_row_s
    elem_floor_s = census["elem_ops"] / 3.85e12
    floor_s = ntt_floor_s + elem_floor_s
    measured_s = 1.0 / m1["ops_per_s"]
    return {
        "ntt_rows": census["ntt_rows"],
        "elem_u32_ops": census["elem_ops"],
        "ntt_floor_us": round(ntt_floor_s * 1e6, 1),
        "elem_floor_us": round(elem_floor_s * 1e6, 1),
        "floor_ops_per_s": round(1.0 / floor_s, 1),
        "measured_single_ct_ops_per_s": round(m1["ops_per_s"], 1),
        "pct_sol": round(100.0 * floor_s / measured_s, 1),
        "model": "ntt_rows x measured t_row(n=8192, scaled n log n from "
                 "the same run's n=16384 NTT) + elem ops over the nominal "
                 "3.85e12 ops/s VPU (ALU counts: Barrett 19, add/sub 2, "
                 "Shoup 6 per element)",
    }


def _compact_suite(suite):
    """Digest the staged-suite dict down to config → headline value."""
    if not isinstance(suite, dict):
        return "suite worker failed/timed out"
    digest = {}
    for k, v in sorted(suite.items()):
        if not isinstance(v, dict):
            continue
        entry = {"value": v.get("value"), "unit": v.get("unit", "")[:48]}
        if "error" in v:
            entry["error"] = str(v["error"])[:60]
        if "csv_schema" in v:
            entry["csv"] = v["csv_schema"]
        digest[k] = entry
    return digest


if __name__ == "__main__":
    sys.exit(main())
