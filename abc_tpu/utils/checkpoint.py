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


def save_context(ctx: BfvContext, path: str, include_secret_key: bool = True
                 ) -> None:
    """Persist a BFV context: params + keys (npz)."""
    arrays: Dict[str, np.ndarray] = {
        "pk_b_ntt": np.asarray(ctx.pk_b_ntt),
        "pk_a_ntt": np.asarray(ctx.pk_a_ntt),
    }
    if include_secret_key:
        arrays["s_coeffs"] = ctx.s_coeffs
    if ctx.relin_key is not None:
        arrays["relin_b"], arrays["relin_a"] = (np.asarray(k)
                                                for k in ctx.relin_key)
    for g, (kb, ka) in ctx.galois_keys.items():
        arrays[f"galois_{g}_b"] = np.asarray(kb)
        arrays[f"galois_{g}_a"] = np.asarray(ka)
    meta = dict(n=ctx.params.n, coeff_modulus=ctx.params.coeff_modulus,
                plain_modulus=ctx.params.plain_modulus,
                engine=ctx.params.engine, seed=ctx.params.seed,
                error_std=ctx.params.error_std,
                ks_digits=ctx.params.ks_digits)
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)


def load_context(path: str) -> BfvContext:
    """Restore a BFV context with its exact keys (no re-keygen)."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    params = BfvParams(n=meta["n"],
                       coeff_modulus=list(meta["coeff_modulus"]),
                       plain_modulus=meta["plain_modulus"],
                       engine=meta["engine"], seed=meta["seed"],
                       error_std=meta["error_std"],
                       ks_digits=meta.get("ks_digits", 1))
    ctx = BfvContext(params)
    if "s_coeffs" in data:
        ctx.s_coeffs = data["s_coeffs"]
        full = ctx.full
        ctx.s_ntt_full = ctx.hqp.fwd(ctx._lift_signed(ctx.s_coeffs, full))
    ctx.pk_b_ntt = data["pk_b_ntt"]
    ctx.pk_a_ntt = data["pk_a_ntt"]
    if "relin_b" in data:
        ctx.relin_key = (data["relin_b"], data["relin_a"])
    for key in data.files:
        if key.startswith("galois_") and key.endswith("_b"):
            g = int(key.split("_")[1])
            ctx.galois_keys[g] = (data[f"galois_{g}_b"], data[f"galois_{g}_a"])
    return ctx


def save_ciphertext(ct: BfvCiphertext, path: str) -> None:
    np.save(path, np.asarray(ct.data))


def load_ciphertext(path: str) -> BfvCiphertext:
    return BfvCiphertext(np.load(path))


# --------------------------------------------------------------------- CKKS

def save_ckks_context(ctx, path: str, include_secret_key: bool = True
                      ) -> None:
    """Persist a CKKS context: params + keys (npz)."""
    arrays: Dict[str, np.ndarray] = {
        "pk_b_ntt": np.asarray(ctx.pk_b_ntt),
        "pk_a_ntt": np.asarray(ctx.pk_a_ntt),
    }
    if include_secret_key:
        arrays["s_coeffs"] = ctx.s_coeffs
    if ctx.relin_key is not None:
        arrays["relin_b"], arrays["relin_a"] = (np.asarray(k)
                                                for k in ctx.relin_key)
    for g, (kb, ka) in ctx.galois_keys.items():
        arrays[f"galois_{g}_b"] = np.asarray(kb)
        arrays[f"galois_{g}_a"] = np.asarray(ka)
    meta = dict(n=ctx.params.n, coeff_modulus=ctx.params.coeff_modulus,
                scale=ctx.params.scale, engine=ctx.params.engine,
                seed=ctx.params.seed, error_std=ctx.params.error_std,
                ks_digits=ctx.params.ks_digits)
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)


def load_ckks_context(path: str):
    """Restore a CKKS context with its exact keys (no re-keygen)."""
    from abc_tpu.crypto.ckks import CkksContext, CkksParams
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    params = CkksParams(n=meta["n"],
                        coeff_modulus=list(meta["coeff_modulus"]),
                        scale=meta["scale"], engine=meta["engine"],
                        seed=meta["seed"], error_std=meta["error_std"],
                        ks_digits=meta.get("ks_digits", 1))
    ctx = CkksContext(params)
    if "s_coeffs" in data:
        ctx.s_coeffs = data["s_coeffs"]
        full = list(range(params.L + params.ks_digits))
        ctx.s_ntt_full = ctx.hqp.fwd(ctx._lift_signed(ctx.s_coeffs, full))
    ctx.pk_b_ntt = data["pk_b_ntt"]
    ctx.pk_a_ntt = data["pk_a_ntt"]
    if "relin_b" in data:
        ctx.relin_key = (data["relin_b"], data["relin_a"])
    for key in data.files:
        if key.startswith("galois_") and key.endswith("_b"):
            g = int(key.split("_")[1])
            ctx.galois_keys[g] = (data[f"galois_{g}_b"], data[f"galois_{g}_a"])
    return ctx


def save_ckks_ciphertext(ct, path: str) -> None:
    """CKKS ciphertext = RNS array + (level, scale) sidecar."""
    np.savez_compressed(path, data=np.asarray(ct.data),
                        level=np.int64(ct.level), scale=np.float64(ct.scale))


def load_ckks_ciphertext(path: str):
    from abc_tpu.crypto.ckks import CkksCiphertext
    z = np.load(path)
    return CkksCiphertext(z["data"], int(z["level"]), float(z["scale"]))
