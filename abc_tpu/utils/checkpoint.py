"""Checkpoint / resume: serialize compiled circuits, keys and ciphertexts.

Reference status: NONE (SURVEY.md §5) — the closest thing is AST
JSON serialization with no deserializer. Here the full working set persists:
  * the compiled circuit (JSON AST, the declared interchange IR,
    README.md:129-131)
  * BFV parameters + secret/public/evaluation keys (npz)
  * ciphertexts (RNS arrays are plain uint32 tensors)
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

from abc_tpu.ast_ir import dumps, loads
from abc_tpu.crypto.bfv import BfvCiphertext, BfvContext
from abc_tpu.crypto.params import BfvParams


def save_circuit(compiled, path: str) -> None:
    """Persist a CompiledProgram's circuit + input types as JSON."""
    payload = {
        "ast": compiled.ast.to_json(),
        "input_types": {k: str(v) for k, v in compiled.input_types.items()},
    }
    with open(path, "w") as f:
        json.dump(payload, f)


def load_circuit(path: str):
    """Returns (ast, input_types) re-typechecked into a CompiledProgram."""
    from abc_tpu.ast_ir.json_serde import from_json
    from abc_tpu.passes.pipeline import CompiledProgram
    from abc_tpu.passes.type_checking import run_type_checking
    from abc_tpu.utils.datatype import Datatype

    with open(path) as f:
        payload = json.load(f)
    ast = from_json(payload["ast"])
    input_types = {}
    for k, v in payload["input_types"].items():
        secret = v.startswith("secret ")
        input_types[k] = Datatype.from_string(
            v[len("secret "):] if secret else v, secret)
    tcv = run_type_checking(ast, input_types)
    return CompiledProgram(ast=ast, tcv=tcv, input_types=input_types)


def save_context(ctx: BfvContext, path: str, include_secret_key: bool = True,
                 seeded: bool = False) -> None:
    """Persist a BFV context: params + keys (npz).

    seeded=True: SEAL Serializable<PublicKey>-style compression — the
    uniform `a` halves of the public and switching keys are OMITTED and
    regenerated on load from the context's PUBLIC-domain seed (they are
    exactly the counter-PRNG draws at (public_seed, stream), crypto/prng).
    Halves the key payload. Safe to publish: the secret/error draws live
    in a separate seed domain (round-4 advisor fix), so the stored public
    seed reveals nothing about them."""
    arrays: Dict[str, np.ndarray] = {
        "pk_b_ntt": np.asarray(ctx.pk_b_ntt),
    }
    if not seeded:
        arrays["pk_a_ntt"] = np.asarray(ctx.pk_a_ntt)
    if include_secret_key:
        arrays["s_coeffs"] = ctx.s_coeffs
    if ctx.relin_key is not None:
        arrays["relin_b"] = np.asarray(ctx.relin_key[0])
        if not seeded:
            arrays["relin_a"] = np.asarray(ctx.relin_key[1])
    for g, (kb, ka) in ctx.galois_keys.items():
        arrays[f"galois_{g}_b"] = np.asarray(kb)
        if not seeded:
            arrays[f"galois_{g}_a"] = np.asarray(ka)
    meta = dict(n=ctx.params.n, coeff_modulus=ctx.params.coeff_modulus,
                plain_modulus=ctx.params.plain_modulus,
                engine=ctx.params.engine, seed=ctx.params.seed,
                error_std=ctx.params.error_std,
                ks_digits=ctx.params.ks_digits)
    if seeded:
        meta["public_seed"] = ctx.public_seed
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)


def _regen_ksk_a(pub_seed: int, stream: str, moduli, n: int,
                 alpha: int) -> np.ndarray:
    """Regenerate a switching key's uniform `a` digits [α, full, n] from
    the public seed (BfvContext._make_ksk_host's draws, verbatim)."""
    from abc_tpu.crypto.prng import uniform_rns_np
    return np.stack([uniform_rns_np(pub_seed, f"{stream}/d{i}", moduli, n)
                     for i in range(alpha)])


def load_context(path: str) -> BfvContext:
    """Restore a BFV context with its exact keys (no re-keygen); seeded
    checkpoints regenerate the uniform key halves from the stored public
    seed."""
    from abc_tpu.crypto.bfv import _ksk_stream
    from abc_tpu.crypto.prng import uniform_rns_np

    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    params = BfvParams(n=meta["n"],
                       coeff_modulus=list(meta["coeff_modulus"]),
                       plain_modulus=meta["plain_modulus"],
                       engine=meta["engine"], seed=meta["seed"],
                       error_std=meta["error_std"],
                       ks_digits=meta.get("ks_digits", 1))
    ctx = BfvContext(params)
    pub = meta.get("public_seed")
    if "s_coeffs" in data:
        ctx.s_coeffs = data["s_coeffs"]
        full = ctx.full
        ctx.s_ntt_full = ctx.hqp.fwd(ctx._lift_signed(ctx.s_coeffs, full))
    ctx.pk_b_ntt = data["pk_b_ntt"]
    n = params.n
    L = params.L
    alpha = params.num_ks_digits
    full_mods = params.coeff_modulus
    if "pk_a_ntt" in data:
        ctx.pk_a_ntt = data["pk_a_ntt"]
    else:
        ctx.pk_a_ntt = uniform_rns_np(pub, "pk", full_mods[:L], n)
    if "relin_b" in data:
        a = data["relin_a"] if "relin_a" in data else \
            _regen_ksk_a(pub, _ksk_stream("relin"), full_mods, n, alpha)
        ctx.relin_key = (data["relin_b"], a)
    for key in data.files:
        if key.startswith("galois_") and key.endswith("_b"):
            g = int(key.split("_")[1])
            a = data[f"galois_{g}_a"] if f"galois_{g}_a" in data else \
                _regen_ksk_a(pub, _ksk_stream(f"galois_{g}"), full_mods, n,
                             alpha)
            ctx.galois_keys[g] = (data[f"galois_{g}_b"], a)
    # jx32 contexts keep DEVICE copies of the keys (installed by the
    # constructor's fresh keygen) — refresh them so encrypt/decrypt/device
    # key builds use the RESTORED keys, not the constructor's (advisor r4)
    ctx.sync_device_keys()
    return ctx


def save_ciphertext(ct: BfvCiphertext, path: str) -> None:
    np.save(path, np.asarray(ct.data))


def load_ciphertext(path: str) -> BfvCiphertext:
    return BfvCiphertext(np.load(path))


# --------------------------------------------------------------------- CKKS

def save_ckks_context(ctx, path: str, include_secret_key: bool = True,
                      seeded: bool = False) -> None:
    """Persist a CKKS context: params + keys (npz). seeded=True omits the
    uniform `a` halves (regenerated from the public-domain seed on load —
    CKKS keys come from the counter PRNG since round 4, same contract as
    the BFV seeded checkpoints)."""
    arrays: Dict[str, np.ndarray] = {
        "pk_b_ntt": np.asarray(ctx.pk_b_ntt),
    }
    if not seeded:
        arrays["pk_a_ntt"] = np.asarray(ctx.pk_a_ntt)
    if include_secret_key:
        arrays["s_coeffs"] = ctx.s_coeffs
    if ctx.relin_key is not None:
        arrays["relin_b"] = np.asarray(ctx.relin_key[0])
        if not seeded:
            arrays["relin_a"] = np.asarray(ctx.relin_key[1])
    for g, (kb, ka) in ctx.galois_keys.items():
        arrays[f"galois_{g}_b"] = np.asarray(kb)
        if not seeded:
            arrays[f"galois_{g}_a"] = np.asarray(ka)
    meta = dict(n=ctx.params.n, coeff_modulus=ctx.params.coeff_modulus,
                scale=ctx.params.scale, engine=ctx.params.engine,
                seed=ctx.params.seed, error_std=ctx.params.error_std,
                ks_digits=ctx.params.ks_digits)
    if seeded:
        meta["public_seed"] = ctx.public_seed
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)


# CKKS uniform key digits share BfvContext's draw scheme (one [full, n]
# stream per digit, round 4) — the BFV regeneration helper applies as-is.
_regen_ckks_a = _regen_ksk_a


def load_ckks_context(path: str):
    """Restore a CKKS context with its exact keys (no re-keygen); seeded
    checkpoints regenerate the uniform halves from the public seed."""
    from abc_tpu.crypto.ckks import CkksContext, CkksParams
    from abc_tpu.crypto.prng import uniform_rns_np
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    params = CkksParams(n=meta["n"],
                        coeff_modulus=list(meta["coeff_modulus"]),
                        scale=meta["scale"], engine=meta["engine"],
                        seed=meta["seed"], error_std=meta["error_std"],
                        ks_digits=meta.get("ks_digits", 1))
    ctx = CkksContext(params)
    pub = meta.get("public_seed")
    mods = params.coeff_modulus
    n = params.n
    alpha = params.num_ks_digits
    if "s_coeffs" in data:
        ctx.s_coeffs = data["s_coeffs"]
        full = list(range(params.L + params.ks_digits))
        ctx.s_ntt_full = ctx.hqp.fwd(ctx._lift_signed(ctx.s_coeffs, full))
    ctx.pk_b_ntt = data["pk_b_ntt"]
    if "pk_a_ntt" in data:
        ctx.pk_a_ntt = data["pk_a_ntt"]
    else:
        ctx.pk_a_ntt = np.ascontiguousarray(
            uniform_rns_np(pub, "pk", mods, n)[:params.L])
    if "relin_b" in data:
        a = data["relin_a"] if "relin_a" in data else \
            _regen_ckks_a(pub, "relin", mods, n, alpha)
        ctx.relin_key = (data["relin_b"], a)
    for key in data.files:
        if key.startswith("galois_") and key.endswith("_b"):
            g = int(key.split("_")[1])
            a = data[f"galois_{g}_a"] if f"galois_{g}_a" in data else \
                _regen_ckks_a(pub, f"galois_{g}", mods, n, alpha)
            ctx.galois_keys[g] = (data[f"galois_{g}_b"], a)
    ctx.sync_device_keys()  # refresh jx32 device secret copy (advisor r4)
    return ctx


def save_ckks_ciphertext(ct, path: str) -> None:
    """CKKS ciphertext = RNS array + (level, scale) sidecar."""
    np.savez_compressed(path, data=np.asarray(ct.data),
                        level=np.int64(ct.level), scale=np.float64(ct.scale))


def load_ckks_ciphertext(path: str):
    from abc_tpu.crypto.ckks import CkksCiphertext
    z = np.load(path)
    return CkksCiphertext(z["data"], int(z["level"]), float(z["scale"]))
