"""CLI (ast_demo equivalent) + checkpoint/resume tests."""

import os
import subprocess
import sys

import numpy as np
import pytest

from abc_tpu.cli import run_benchmark
from abc_tpu.utils.checkpoint import (
    load_circuit, load_ciphertext, load_context, save_circuit,
    save_ciphertext, save_context,
)


def test_cli_cardio_csv(tmp_path):
    out = tmp_path / "cardio.csv"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "abc_tpu", "cardio", str(out)],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), env=env)
    assert r.returncode == 0, r.stderr
    lines = out.read_text().strip().splitlines()
    # the reference CSV schema, examples/main.cpp:41-42 — but MEASURED
    assert lines[0] == "t_keygen,t_input_encryption,t_computation,t_decryption"
    values = [float(v) for v in lines[1].split(",")]
    assert len(values) == 4 and all(v >= 0 for v in values)
    assert "riskScore: [5]" in r.stderr


def test_run_benchmark_hamming_bfv():
    result = run_benchmark("hamming", backend="bfv", slots=1024)
    outputs = result.pop("_outputs")
    assert outputs["sum"][0] == 2
    assert result["t_computation"] > 0


def test_run_benchmark_boxblur_dummy():
    result = run_benchmark("boxblur", backend="dummy")
    assert "_outputs" in result


# --- checkpoint -----------------------------------------------------------------

def test_circuit_roundtrip(tmp_path):
    from abc_tpu.parser import Parser
    from abc_tpu.passes.pipeline import compile_program, input_types_from_ast

    inputs = Parser.parse("secret int x = {1,2,3};")
    compiled = compile_program("x = x *** x; return x;",
                               input_types_from_ast(inputs))
    p = tmp_path / "circuit.json"
    save_circuit(compiled, str(p))
    restored = load_circuit(str(p))
    assert str(restored.ast) == str(compiled.ast)
    assert restored.input_types["x"].secret


def test_context_and_ciphertext_roundtrip(tmp_path):
    from abc_tpu.crypto.bfv import BfvContext
    from abc_tpu.crypto.params import BfvParams

    ctx = BfvContext(BfvParams.create(1024, seed=11))
    ctx.get_relin_key()
    ctx.get_galois_key(3)
    ct = ctx.encrypt(ctx.encode([4, 5, 6]))

    ctx_path = tmp_path / "ctx.npz"
    ct_path = tmp_path / "ct.npy"
    save_context(ctx, str(ctx_path))
    save_ciphertext(ct, str(ct_path))

    ctx2 = load_context(str(ctx_path))
    ct2 = load_ciphertext(str(ct_path))
    # restored context decrypts the restored ciphertext
    assert ctx2.decode(ctx2.decrypt(ct2))[:3] == [4, 5, 6]
    # restored keys still work: multiply + rotate, decrypted by the original
    prod = ctx2.multiply(ct2, ct2)
    rot = ctx2.rotate_rows(prod, 1)
    assert ctx.decode(ctx.decrypt(rot))[:2] == [25, 36]


def test_ckks_context_roundtrip(tmp_path):
    import numpy as np
    from abc_tpu.crypto.ckks import CkksContext, CkksParams
    from abc_tpu.utils.checkpoint import (
        load_ckks_ciphertext, load_ckks_context, save_ckks_ciphertext,
        save_ckks_context,
    )
    params = CkksParams.create(512, levels=3, seed=21)
    ctx = CkksContext(params)
    ctx.get_relin_key()
    vals = np.linspace(-1, 1, 256)
    ct = ctx.multiply(ctx.encrypt(ctx.encode(vals)),
                      ctx.encrypt(ctx.encode(vals)))
    cpath = str(tmp_path / "ckks_ctx.npz")
    save_ckks_context(ctx, cpath)
    ctx2 = load_ckks_context(cpath)
    tpath = str(tmp_path / "ct.npz")
    save_ckks_ciphertext(ct, tpath)
    ct2 = load_ckks_ciphertext(tpath)
    got = ctx2.decode(ctx2.decrypt(ct2)).real
    np.testing.assert_allclose(got, vals * vals, atol=2e-2)


def test_debug_invariant_mode(monkeypatch):
    from abc_tpu.crypto.bfv import BfvCiphertext, BfvContext
    from abc_tpu.crypto.params import BfvParams
    from abc_tpu.utils.errors import RuntimeExecutionError
    import numpy as np
    import pytest
    monkeypatch.setenv("ABC_TPU_DEBUG_CHECKS", "1")
    ctx = BfvContext(BfvParams.create(1024, seed=2))
    a = ctx.encrypt(ctx.encode([1, 2]))
    b = ctx.encrypt(ctx.encode([3, 4]))
    out = ctx.multiply(a, b)           # passes the invariant check
    assert ctx.decode(ctx.decrypt(out))[:2] == [3, 8]
    bad = BfvCiphertext(np.full_like(np.asarray(a.data), 0xFFFFFFFF,
                                     dtype=np.uint32))
    with pytest.raises(RuntimeExecutionError):
        ctx.add(bad, bad)


def test_seeded_context_checkpoint_roundtrip(tmp_path):
    """Round 4: SEAL Serializable-style seeded key compression — the
    uniform `a` halves are omitted from the checkpoint and regenerated
    from the PUBLIC-domain seed on load, bit-identically; the payload
    shrinks by ~half."""
    import os

    import numpy as np

    from abc_tpu.crypto.bfv import BfvContext
    from abc_tpu.crypto.params import BfvParams
    from abc_tpu.utils.checkpoint import load_context, save_context

    ctx = BfvContext(BfvParams.create(1024, engine="np64", seed=321))
    ctx.get_relin_key()
    g = pow(3, 1, 2 * 1024)
    ctx.get_galois_key(g)
    ct = ctx.encrypt(ctx.encode([7, 8, 9]))

    full = str(tmp_path / "full.npz")
    comp = str(tmp_path / "seeded.npz")
    save_context(ctx, full)
    save_context(ctx, comp, seeded=True)
    assert os.path.getsize(comp) < 0.65 * os.path.getsize(full)

    back = load_context(comp)
    assert np.array_equal(np.asarray(back.pk_a_ntt),
                          np.asarray(ctx.pk_a_ntt))
    assert np.array_equal(np.asarray(back.relin_key[1]),
                          np.asarray(ctx.relin_key[1]))
    assert np.array_equal(np.asarray(back.galois_keys[g][1]),
                          np.asarray(ctx.galois_keys[g][1]))
    # functional: the restored context decrypts the original's ciphertext
    assert back.decode(back.decrypt(ct))[:3] == [7, 8, 9]


def test_seeded_checkpoint_without_params_seed(tmp_path):
    """Auto-generated master seeds (params.seed=None) still round trip:
    the stored public_seed carries the regeneration capability."""
    import numpy as np

    from abc_tpu.crypto.bfv import BfvContext
    from abc_tpu.crypto.params import BfvParams
    from abc_tpu.utils.checkpoint import load_context, save_context

    ctx = BfvContext(BfvParams.create(1024, engine="np64"))
    ctx.get_relin_key()
    p = str(tmp_path / "ctx.npz")
    save_context(ctx, p, seeded=True)
    back = load_context(p)
    assert np.array_equal(np.asarray(back.pk_a_ntt),
                          np.asarray(ctx.pk_a_ntt))
    assert np.array_equal(np.asarray(back.relin_key[1]),
                          np.asarray(ctx.relin_key[1]))


def test_seeded_ckks_checkpoint_roundtrip(tmp_path):
    import numpy as np

    from abc_tpu.crypto.ckks import CkksContext, CkksParams
    from abc_tpu.utils.checkpoint import (
        load_ckks_context, save_ckks_context,
    )

    ctx = CkksContext(CkksParams.create(512, levels=2, engine="np64",
                                        seed=55))
    ctx.get_relin_key()
    g = 3
    ctx.get_galois_key(g)
    p = str(tmp_path / "ckks.npz")
    save_ckks_context(ctx, p, seeded=True)
    back = load_ckks_context(p)
    assert np.array_equal(np.asarray(back.pk_a_ntt),
                          np.asarray(ctx.pk_a_ntt))
    assert np.array_equal(np.asarray(back.relin_key[1]),
                          np.asarray(ctx.relin_key[1]))
    assert np.array_equal(np.asarray(back.galois_keys[g][1]),
                          np.asarray(ctx.galois_keys[g][1]))
