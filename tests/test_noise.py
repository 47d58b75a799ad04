"""Noise estimation + automatic parameter selection tests (SURVEY.md §7 hard
part #6 — the reference delegates this entirely to SEAL defaults)."""

import pytest

from abc_tpu.crypto.noise import analyze_circuit, choose_parameters
from abc_tpu.parser import Parser
from abc_tpu.passes.pipeline import (
    CompileOptions, compile_program, input_types_from_ast, run_compiled,
)


def compiled_for(inputs_src, program_src, opts=None):
    inputs = Parser.parse(inputs_src)
    return (compile_program(program_src, input_types_from_ast(inputs), opts),
            inputs)


def test_analyze_depths():
    compiled, _ = compiled_for(
        "secret int a = {1}; secret int b = {2}; int p = 3;",
        "secret int x = a *** b; x = x *** a; x = x *** p; return x;")
    stats = analyze_circuit(compiled)
    assert stats.mult_depth == 2          # a*b then *a
    assert stats.plain_mult_depth == 1    # *p


def test_analyze_rotations():
    compiled, _ = compiled_for(
        "secret int a = {1,2,3,4};",
        "a = a +++ rotate(a, 2); a = a +++ rotate(a, 1);")
    assert analyze_circuit(compiled).rotations == 2


def test_residual_multiplicative_loop_priced_by_fixpoint():
    """A For left in the circuit (unrolling OFF) with a multiplicative
    accumulation must be priced at its real per-iteration depth via the
    fixpoint walk, not the single-pass depth 1 (a 4-iteration loop at
    depth 1 silently under-sized the chain before the round-5 fix)."""
    opts = CompileOptions(loop_unrolling=False)
    compiled, _ = compiled_for(
        "secret int v = {1,2};",
        "secret int acc = v;"
        "for (int i = 0; i < 4; i = i + 1) { acc = acc * v; }"
        "return acc;", opts)
    stats = analyze_circuit(compiled)
    assert stats.mult_depth == 4


def test_residual_additive_loop_converges():
    """An accumulative residual loop (sum = sum + x) reaches the depth
    fixpoint in ≤2 passes — same stats as the unrolled circuit."""
    opts = CompileOptions(loop_unrolling=False)
    compiled, _ = compiled_for(
        "secret int v = {1,2}; secret int w = {3,4};",
        "secret int acc = v * w;"
        "for (int i = 0; i < 100; i = i + 1) { acc = acc + v; }"
        "return acc;", opts)
    stats = analyze_circuit(compiled)
    assert stats.mult_depth == 1


def test_residual_unbounded_loop_escalates_to_error():
    """A residual multiplicative loop that never stabilizes (the cap)
    prices the circuit past every preset → clear CompilerError, never a
    silently under-sized chain."""
    from abc_tpu.utils.errors import CompilerError

    opts = CompileOptions(loop_unrolling=False,
                          max_unroll_iterations=0)
    compiled, _ = compiled_for(
        "secret int v = {1,2}; int n = 1000;",
        "secret int acc = v;"
        "for (int i = 0; i < n; i = i + 1) { acc = acc * v; }"
        "return acc;", opts)
    assert analyze_circuit(compiled).mult_depth >= 64
    with pytest.raises(CompilerError):
        choose_parameters(compiled)


def test_shallow_circuit_gets_small_params():
    compiled, _ = compiled_for("secret int a = {1};",
                               "a = a *** a; return a;")
    params = choose_parameters(compiled)
    assert params.n <= 2048


def test_deep_circuit_gets_bigger_params():
    prog = "secret int x = a *** a;" + \
           "".join("x = x *** a;" for _ in range(6)) + "return x;"
    compiled, _ = compiled_for("secret int a = {2};", prog)
    deep = choose_parameters(compiled)
    shallow_c, _ = compiled_for("secret int a = {2};", "a = a *** a;")
    assert deep.L > choose_parameters(shallow_c).L


def test_security_strict_skips_dev_presets():
    compiled, _ = compiled_for("secret int a = {1};", "a = a *** a;")
    params = choose_parameters(compiled, security_strict=True)
    assert params.n >= 8192


def test_chosen_parameters_actually_decrypt():
    """The whole point: auto-chosen params must leave positive budget."""
    from abc_tpu.runtime.bfv_backend import BfvCiphertextFactory

    inputs_src = "secret int x = {1,1,0,1}; secret int y = {1,0,1,1};"
    program = """
      int sum = 0;
      for (int i = 0; i < 4; i = i + 1) {
        sum = sum + (x[i]-y[i])*(x[i]-y[i]);
      }
      return sum;
    """
    compiled, inputs = compiled_for(inputs_src, program,
                                    CompileOptions(vectorize=True))
    params = choose_parameters(compiled, seed=3)
    factory = BfvCiphertextFactory(slots=params.n, seed=3,
                                   plain_bits=params.plain_modulus.bit_length())
    rv, pairs = run_compiled(compiled, inputs, Parser.parse("hd = sum;"),
                             factory)
    assert factory.decrypt(pairs[0][1])[0] == 2
    assert pairs[0][1].noise_bits() > 0
