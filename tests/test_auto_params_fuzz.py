"""Fuzz the noise model's parameter selection end-to-end (round 5).

test_auto_params.py checks `choose_parameters` on the 12 fixed reference
workloads; this family checks it on RANDOM circuits of varying
multiplicative depth: for every seed the auto-chosen (n, chain) must
actually decrypt the program to the dummy-backend oracle, and the
predicted margin must be positive. A wrong depth analysis (e.g. a missed
ct·ct multiply on the deepest path) surfaces as a decrypt mismatch on the
smallest chain that the model *thought* was sufficient — exactly the
failure mode fixed presets can never exhibit.

Reference contrast: SEAL's CoeffModulus::BFVDefault
(/root/reference/src/runtime/SealCiphertextFactory.cpp:72-100) is a fixed
table; the reference has no circuit-driven selection to fuzz.
"""

import random
import warnings

import numpy as np
import pytest

from abc_tpu.passes.pipeline import CompileOptions
from abc_tpu.runtime.jit_executor import jit_compile_program

from tests.test_fuzz_extended import gen_ckks_program
from tests.test_pipeline_fuzz import ALL_ON, run_with, run_with_factory


def gen_depth_program(rng: random.Random, max_mults: int):
    """Random vector program whose ct·ct multiplicative depth varies by
    seed (0..max_mults) — the axis `choose_parameters` sizes against.
    Only well-defined-lane constructs (elementwise arith, rotate, plain
    scalar multiplies, plain ifs): first 8 slots comparable across
    backends with different slot counts."""
    nvec = rng.randint(1, 3)
    veclen = 8
    inputs = []
    for v in range(nvec):
        vals = [rng.randint(0, 9) for _ in range(veclen)]
        inputs.append(f"secret int v{v} = {{{','.join(map(str, vals))}}};")
    plain_k = rng.randint(2, 5)
    inputs.append(f"int k = {plain_k};")

    stmts = ["secret int acc = v0;"]
    mults = 0
    for _ in range(rng.randint(3, 7)):
        kind = rng.randrange(5)
        src = f"v{rng.randrange(nvec)}"
        if kind == 0 and mults < max_mults:    # ct·ct multiply (depth +1)
            stmts.append(f"acc = acc * {src};")
            mults += 1
        elif kind == 1:                        # ct·plain multiply
            stmts.append(f"acc = acc * {rng.randint(1, 3)};")
        elif kind == 2:                        # rotate mix
            steps = rng.randint(-3, 3)
            stmts.append(f"acc = acc + rotate({src}, {steps});")
        elif kind == 3:                        # add/sub
            op = rng.choice(["+", "-"])
            stmts.append(f"acc = acc {op} {src};")
        else:                                  # plain-condition if
            stmts.append(
                f"if (k > {rng.randint(0, 6)}) "
                f"{{ acc = acc + {rng.randint(1, 4)}; }}")
    stmts.append("return acc;")
    return " ".join(inputs), " ".join(stmts), "out = acc;"


def _run_auto(inputs_src, program_src, output_src, options):
    """Compile, auto-choose BFV params, execute on np64, return
    (report, decrypted-first-8)."""
    from abc_tpu.crypto.bfv import BfvContext
    from abc_tpu.crypto.noise import auto_params_report
    from abc_tpu.parser import Parser
    from abc_tpu.passes.pipeline import Compiler, input_types_from_ast
    from abc_tpu.runtime.bfv_backend import BfvCiphertextFactory

    input_ast = Parser.parse(inputs_src)
    compiled = Compiler(options).compile_source(
        program_src, input_types_from_ast(input_ast))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")       # dev sizes warn on security
        params, report = auto_params_report(compiled, engine="np64", seed=7)
    factory = BfvCiphertextFactory(
        context=BfvContext(params))
    out = run_with_factory(inputs_src, program_src, output_src, options,
                           factory)
    return report, [(name, vals[:8]) for name, vals in out]


@pytest.mark.parametrize("seed", range(24))
def test_auto_params_bfv_fuzz(seed):
    rng = random.Random(20_000 + seed)
    inputs_src, program_src, output_src = gen_depth_program(
        rng, max_mults=2 + seed % 2)
    dummy = [(n, v[:8]) for n, v in
             run_with(inputs_src, program_src, output_src, ALL_ON)]
    report, got = _run_auto(inputs_src, program_src, output_src, ALL_ON)
    assert report["predicted_margin_bits"] > 0
    assert got == dummy, (
        f"seed {seed}: auto-chosen n={report['n']} "
        f"(depth {report['mult_depth']}+{report['plain_mult_depth']}) "
        f"failed to decrypt\ninputs: {inputs_src}\nprogram: {program_src}\n"
        f"got={got}\nwant={dummy}")


def test_auto_params_scales_chain_with_fuzzed_depth():
    """Across the family, deeper circuits must never get a SMALLER ring
    than shallower ones predict for the same shape (monotone selection)."""
    rng = random.Random(99)
    inputs = "secret int v0 = {1,2,3,4,5,6,7,8};"
    prev_n = 0
    for depth in range(0, 5):
        prog = "secret int acc = v0;" + "acc = acc * v0;" * depth \
            + "return acc;"
        report, got = _run_auto(inputs, prog, "out = acc;", ALL_ON)
        assert report["n"] >= prev_n
        prev_n = report["n"]
        oracle = (np.arange(1, 9, dtype=object) ** (depth + 1)).tolist()
        assert got[0][1] == oracle, f"depth {depth} on n={report['n']}"
    assert prev_n > 1024        # depth 4 must have escalated the ring


@pytest.mark.parametrize("seed", range(12))
def test_noise_model_stays_conservative(seed):
    """The measured invariant-noise budget of the OUTPUT ciphertext must
    not fall materially below the model's predicted margin — a missed
    ct·ct multiply on the deepest path would show as a ~32-bit gap
    (per_mult = t_bits + log2 n + 2). The 8-bit slack absorbs the
    definitional offset between `q_bits − noise − t` and the invariant
    budget `log2 q − 1 − log2 max_resid` (measured ≤4 bits on this
    family)."""
    from abc_tpu.crypto.bfv import BfvContext
    from abc_tpu.crypto.noise import auto_params_report
    from abc_tpu.parser import Parser
    from abc_tpu.passes.pipeline import Compiler, input_types_from_ast
    from abc_tpu.runtime.bfv_backend import BfvCiphertextFactory
    from abc_tpu.runtime.executor import RuntimeVisitor
    from abc_tpu.runtime.values import AbstractCiphertext

    rng = random.Random(20_000 + seed)
    inputs_src, program_src, output_src = gen_depth_program(
        rng, max_mults=2 + seed % 2)
    ia, oa = Parser.parse(inputs_src), Parser.parse(output_src)
    compiled = Compiler(ALL_ON).compile_source(
        program_src, input_types_from_ast(ia))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        params, report = auto_params_report(compiled, engine="np64", seed=7)
    factory = BfvCiphertextFactory(context=BfvContext(params))
    rv = RuntimeVisitor(factory, ia, compiled.secret_tainted)
    rv.execute_ast(compiled.ast)
    ((_, v),) = rv.get_output(oa)
    assert isinstance(v, AbstractCiphertext)
    measured = v.noise_bits()
    assert measured > 0
    assert measured >= report["predicted_margin_bits"] - 8, (
        f"seed {seed}: model optimistic — predicted margin "
        f"{report['predicted_margin_bits']} bits but measured budget "
        f"{measured} on n={report['n']}\nprogram: {program_src}")


@pytest.mark.parametrize("seed", range(6))
def test_auto_params_jit_fuzz(seed):
    """The same property through the flagship whole-program JIT surface
    (jit_compile_program(auto_params=True))."""
    import jax
    jax.config.update("jax_platforms", "cpu")

    rng = random.Random(21_000 + seed)
    inputs_src, program_src, output_src = gen_depth_program(rng, max_mults=2)
    dummy = [(n, v[:8]) for n, v in
             run_with(inputs_src, program_src, output_src, ALL_ON)]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        jp = jit_compile_program(program_src, inputs_src, output_src,
                                 options=ALL_ON, auto_params=True,
                                 engine="jx32", seed=7)
    assert jp.auto_params["predicted_margin_bits"] > 0
    got = {k: list(v)[:8] for k, v in jp.run().items()}
    assert got == dict(dummy), (
        f"seed {seed}: JIT auto-params n={jp.auto_params['n']} diverged\n"
        f"program: {program_src}\ngot={got}\nwant={dict(dummy)}")


@pytest.mark.parametrize("seed", range(6))
def test_auto_params_ckks_fuzz(seed):
    """Float circuits route to CKKS with per-circuit levels/scale_bits;
    the auto-chosen set must track the numpy oracle within CKKS
    tolerance."""
    import jax
    jax.config.update("jax_platforms", "cpu")

    seed_val = 22_000 + seed
    inputs_src, program_src, _ = gen_ckks_program(
        random.Random(seed_val), slots=8)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        jp = jit_compile_program(program_src, inputs_src, "out = acc;",
                                 options=ALL_ON, auto_params=True,
                                 engine="jx32", seed=7)
    assert jp.auto_params["scheme"] == "ckks"
    # regenerate the oracle over the ACTUAL slot row (same rng stream →
    # same program, oracle padded/rotated at the chosen ring's slot count)
    slots = jp.factory.slot_count
    inputs2, program2, oracle = gen_ckks_program(
        random.Random(seed_val), slots=slots)
    assert (inputs2, program2) == (inputs_src, program_src)
    got = np.asarray(jp.run()["out"])
    assert np.allclose(got[:8], oracle[:8], atol=5e-2), (
        f"seed {seed}: CKKS auto-params n={jp.auto_params['n']} "
        f"levels={jp.auto_params['levels']} diverged\n"
        f"program: {program_src}\ngot={got[:8]}\nwant={oracle[:8]}")
