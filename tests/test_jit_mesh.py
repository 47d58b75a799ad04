"""Compiled-program multi-chip execution (SURVEY.md §7 build-order step 9):
a DSL program compiled through the FULL pipeline (parse → passes →
vectorize → whole-program JIT) executes as one shard_map program over a
(dp × limb) mesh, and its decrypted outputs EQUAL the single-device run.

Runs on the 8-virtual-CPU-device mesh (conftest).
"""

import numpy as np
import pytest

import jax

from abc_tpu.parallel.dryrun import build_context
from abc_tpu.parallel.sharding import make_mesh
from abc_tpu.runtime.bfv_backend import BfvCiphertextFactory
from abc_tpu.runtime.jit_executor import jit_compile_program

HAMMING = """
    int sum = 0;
    for (int i = 0; i < n; i = i + 1) {
      sum = sum + (x[i]-y[i])*(x[i]-y[i]);
    }
    return sum;
"""

XS = [[1, 1, 0, 1], [0, 1, 1, 1], [1, 0, 1, 0], [1, 1, 1, 1]]
YS = [[1, 0, 1, 1], [0, 1, 0, 1], [1, 1, 1, 0], [0, 0, 0, 0]]


def _hamming(x, y):
    return sum(int(a != b) for a, b in zip(x, y))


def _inputs_src(x, y):
    return (f"secret int x = {{{','.join(map(str, x))}}}; "
            f"secret int y = {{{','.join(map(str, y))}}}; int n = 4;")


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(dp=2, limb=4)


def test_compiled_hamming_on_mesh_matches_single_device(mesh):
    """The reference workload (HammingDistanceTest.cpp:38-45) compiled once
    and executed dp=2 × limb=4: batch of 4 independent input pairs, every
    rotation/relinearization key switch limb-sharded. Gate (SURVEY §7
    step 9): decrypted-output equality 1-device vs N."""
    ctx_mesh = build_context(n=256, data_limbs=4, seed=21)
    factory = BfvCiphertextFactory(context=ctx_mesh)
    jp = jit_compile_program(
        HAMMING, _inputs_src(XS[0], YS[0]), "out = sum;", factory,
        mesh=mesh, batch_values={"x": XS, "y": YS})
    out = jp.run()
    got = [row[0] for row in out["out"]]

    # single-device reference runs, same context/keys (same seed)
    ctx_single = build_context(n=256, data_limbs=4, seed=21)
    f_single = BfvCiphertextFactory(context=ctx_single)
    singles = []
    for x, y in zip(XS, YS):
        jp1 = jit_compile_program(HAMMING, _inputs_src(x, y), "out = sum;",
                                  f_single)
        singles.append(jp1.run()["out"][0])

    oracle = [_hamming(x, y) for x, y in zip(XS, YS)]
    assert got == oracle
    assert got == singles


def test_mesh_program_emits_limb_psum(mesh):
    """The compiled mesh executable must actually CONTRACT over "limb":
    its HLO carries all-reduce collectives (the modular psums of the
    key-switch inner product) — dp alone moves no bytes."""
    from abc_tpu.parallel.report import collective_report

    ctx_mesh = build_context(n=256, data_limbs=4, seed=22)
    factory = BfvCiphertextFactory(context=ctx_mesh)
    jp = jit_compile_program(
        HAMMING, _inputs_src(XS[0], YS[0]), "out = sum;", factory,
        mesh=mesh, batch_values={"x": XS, "y": YS})
    rep = collective_report(jp._jitted, jp.secret_inputs, jp._key_args)
    assert "all-reduce" in rep and rep["all-reduce"]["ops"] >= 1, rep


def test_mesh_rejects_bad_batch(mesh):
    from abc_tpu.utils.errors import RuntimeExecutionError

    ctx = build_context(n=256, data_limbs=4, seed=23)
    factory = BfvCiphertextFactory(context=ctx)
    with pytest.raises(RuntimeExecutionError, match="divisible"):
        jit_compile_program(
            HAMMING, _inputs_src(XS[0], YS[0]), "out = sum;", factory,
            mesh=mesh, batch_values={"x": XS[:3], "y": YS[:3]})


def test_mesh_plain_and_secret_mix(mesh):
    """dp-batched program with ct·ct multiply + plaintext ops + rotation:
    covers relin + galois key switches through the mesh path."""
    ctx_mesh = build_context(n=256, data_limbs=4, seed=24)
    factory = BfvCiphertextFactory(context=ctx_mesh)
    prog = ("secret int acc = a * b; acc = acc + rotate(a, 1); "
            "acc = acc + 3; return acc;")
    a_rows = [[1, 2, 3, 4], [5, 6, 7, 8]]
    b_rows = [[2, 2, 2, 2], [1, 0, 1, 0]]
    jp = jit_compile_program(
        prog, "secret int a = {1,2,3,4}; secret int b = {2,2,2,2};",
        "out = acc;", factory, mesh=mesh,
        batch_values={"a": a_rows, "b": b_rows})
    out = jp.run()
    for row, av, bv in zip(out["out"], a_rows, b_rows):
        ap = av + [av[-1]] * 4          # last-element padding into view
        exp = [av[i] * bv[i] + ap[i + 1] + 3 for i in range(4)]
        assert row[:4] == exp, (row[:4], exp)


def test_compiled_ckks_program_on_mesh_dp(mesh):
    """CKKS programs run the mesh path on the dp axis (keys replicated —
    the leveled digit count varies per switch, so fixed limb shards can't
    serve CKKS; documented in jit_executor). Gate: decrypted values match
    per-element single-device runs within CKKS tolerance."""
    from abc_tpu.runtime.ckks_backend import CkksCiphertextFactory

    factory = CkksCiphertextFactory(n=512, levels=4, engine="jx32",
                                    seed=9, scale_bits=30)
    prog = ("secret double acc = w0 * w1; acc = acc + rotate(w0, 1); "
            "return acc;")
    inputs = "secret double w0 = {1.0,2.0,3.0}; secret double w1 = {0.5,0.25,2.0};"
    w0s = [[1.0, 2.0, 3.0], [0.5, -1.0, 2.5], [4.0, 0.0, 1.0],
           [-2.0, 3.0, 0.5]]
    w1s = [[0.5, 0.25, 2.0], [1.0, 1.0, 1.0], [0.25, 2.0, -1.0],
           [2.0, 0.5, 0.5]]
    jp = jit_compile_program(prog, inputs, "out = acc;", factory,
                             mesh=mesh,
                             batch_values={"w0": w0s, "w1": w1s})
    rows = jp.run()["out"]

    f_single = CkksCiphertextFactory(n=512, levels=4, engine="jx32",
                                     seed=9, scale_bits=30)
    for row, w0, w1 in zip(rows, w0s, w1s):
        pad = w0 + [w0[-1]]
        want = [w0[i] * w1[i] + pad[i + 1] for i in range(3)]
        ins = (f"secret double w0 = {{{','.join(map(str, w0))}}}; "
               f"secret double w1 = {{{','.join(map(str, w1))}}};")
        jp1 = jit_compile_program(prog, ins, "out = acc;", f_single)
        single = jp1.run()["out"]
        assert np.allclose(row[:3], want, atol=1e-2), (row[:3], want)
        assert np.allclose(row[:3], single[:3], atol=1e-2)


def test_mesh_falls_back_when_limb_axis_indivisible(mesh):
    """A preset whose switching-key digit count the limb axis does not
    divide (the 30-bit chains have α ∈ {5, 6, 13, 27}) must run dp-only
    with replicated keys and a warning naming the constraint — not a raw
    device_put shape error (found composing mesh= with auto_params=True,
    whose small circuits land on the n=1024 α=5 preset)."""
    import warnings

    from abc_tpu.passes.pipeline import CompileOptions

    bv = {"x": [[1, 1, 0, 1], [1, 0, 1, 1], [0, 0, 1, 1], [1, 1, 1, 1]],
          "y": [[1, 0, 1, 1], [1, 0, 1, 1], [1, 1, 0, 0], [0, 1, 1, 0]]}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        jp = jit_compile_program(
            "secret int acc = (x-y)*(x-y); acc = acc + rotate(acc, 2); "
            "acc = acc + rotate(acc, 1); return acc;",
            "secret int x = {1,1,0,1}; secret int y = {1,0,1,1};",
            "out = acc;", options=CompileOptions(vectorize=True),
            auto_params=True, engine="jx32", seed=7,
            mesh=mesh, batch_values=bv)
        out = np.asarray(jp.run()["out"])
    assert any("limb mesh axis" in str(x.message) for x in w)
    assert not jp._limb_ok
    for i, (xr, yr) in enumerate(zip(bv["x"], bv["y"])):
        assert out[i, 0] == sum((a - b) ** 2 for a, b in zip(xr, yr))
