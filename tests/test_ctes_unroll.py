"""CTES + loop-unrolling + pipeline tests.

These passes exist only as documentation in the reference (README.md:79-91,
CardioTest.cpp STAGE_02/STAGE_04 stubs); tests are authored to that spec.
"""

from abc_tpu.parser import Parser, parse
from abc_tpu.passes.ctes import run_ctes
from abc_tpu.passes.pipeline import (
    CompileOptions, compile_program, input_types_from_ast, run_compiled,
)
from abc_tpu.passes.unroll import run_loop_unrolling
from abc_tpu.runtime.dummy import DummyCiphertextFactory
from abc_tpu.utils.datatype import Datatype, Type

from helpers import assert_result


# --- CTES ---------------------------------------------------------------------

def ctes_str(src):
    return str(run_ctes(parse(src)))


def test_constant_folding():
    out = ctes_str("int x = 1 + 2 * 3;")
    assert "int x = 7;" in out


def test_identity_simplification():
    out = ctes_str("y = x * 1 + 0; z = x * 0; w = q +++ 0;")
    assert "y = x;" in out and "z = 0;" in out and "w = q;" in out


def test_relational_and_logical_folding():
    out = ctes_str("b = 3 < 5 && 2 == 2;")
    assert "b = true;" in out


def test_not_simplification():
    assert "b = false;" in ctes_str("b = !true;")
    assert "b = x;" in ctes_str("b = !!x;")


def test_plaintext_if_removed_true_branch():
    out = ctes_str("if (1 < 2) { x = 1; } else { x = 2; }")
    assert "if" not in out and "x = 1;" in out and "x = 2;" not in out


def test_plaintext_if_removed_false_no_else():
    out = ctes_str("if (2 < 1) { x = 1; }")
    assert "if" not in out and "x = 1;" not in out


def test_literally_false_for_loop_removed_by_ctes():
    out = ctes_str("for (int i = 0; 1 < 0; i = i + 1) { x = 1; }")
    assert "for" not in out and "x = 1;" not in out
    assert "int i = 0;" in out  # initializer side effects kept


def test_zero_iteration_loop_removed_by_unroller():
    out = unroll_str("for (int i = 0; i < 0; i = i + 1) { x = 1; }")
    assert "for" not in out and "x = 1;" not in out


def test_ternary_folding():
    out = ctes_str("x = 1 == 1 ? a : b;")
    assert "x = a;" in out


def test_nested_fold_inside_secret_expression():
    out = ctes_str("x = s *** (2 + 3);")
    assert "x = (s *** 5);" in out


# --- loop unrolling ------------------------------------------------------------

def unroll_str(src):
    return str(run_loop_unrolling(parse(src)))


def test_simple_unroll():
    out = unroll_str("for (int i = 0; i < 3; i = i + 1) { sum = sum + x[i]; }")
    assert "for" not in out
    assert "sum = (sum + x[0]);" in out
    assert "sum = (sum + x[1]);" in out
    assert "sum = (sum + x[2]);" in out


def test_unroll_preserves_write_targets():
    out = unroll_str("for (int i = 0; i < 2; i = i + 1) { v[i] = i * 10; }")
    assert "v[0] = (0 * 10);" in out and "v[1] = (1 * 10);" in out


def test_nested_unroll():
    out = unroll_str("""
      for (int i = 0; i < 2; i = i + 1) {
        for (int j = 0; j < 2; j = j + 1) {
          m[i*2+j] = i + j;
        }
      }""")
    assert "for" not in out
    assert "m[((0 * 2) + 0)]" in out and "m[((1 * 2) + 1)]" in out


def test_negative_range_and_step():
    out = unroll_str("for (int i = 2; i > -1; i = i - 1) { s = s + i; }")
    assert out.count("s = ") == 3 and "s = (s + -1)" not in out


def test_dynamic_bound_left_untouched():
    out = unroll_str("for (int i = 0; i < n; i = i + 1) { s = s + i; }")
    assert "for" in out


def test_multi_variable_header():
    out = unroll_str(
        "for (int i = 0, int j = 4; i < j; i = i + 1, j = j - 1) { s = s + i * j; }")
    assert "for" not in out
    assert "s = (s + (0 * 4));" in out and "s = (s + (1 * 3));" in out


# --- full pipeline -------------------------------------------------------------

def test_pipeline_hamming_unrolled_and_folded():
    inputs = Parser.parse("int x = {1,1,0,1}; int y = {1,0,1,1}; int n = 4;")
    program = """
      int sum = 0;
      for (int i = 0; i < n; i = i + 1) {
        sum = sum + (x[i]-y[i])*(x[i]-y[i]);
      }
      return sum;
    """
    # n is an input, so the loop bound is not a literal — but with CTES after
    # registering n's VALUE the loop still can't fold (value unknown at
    # compile time). Use a literal bound instead for full unrolling:
    program_static = program.replace("i < n", "i < 4")
    compiled = compile_program(program_static, input_types_from_ast(inputs))
    out = str(compiled.ast)
    assert "for" not in out
    factory = DummyCiphertextFactory(64)
    rv, pairs = run_compiled(compiled, inputs, Parser.parse("sum = sum;"), factory)
    assert_result(factory, pairs, {"sum": [2]})


def test_pipeline_cardio_with_secret_lowering():
    # secret risk-factor mux: the pipeline lowers the secret If to FHE ops and
    # executes on the dummy backend
    inputs = Parser.parse("secret int smoker = 1; secret int r = 0;")
    program = """
      if (smoker) { r = r +++ 1; }
      return r;
    """
    compiled = compile_program(program, input_types_from_ast(inputs))
    assert "if" not in str(compiled.ast)
    factory = DummyCiphertextFactory(64)
    rv, pairs = run_compiled(compiled, inputs, Parser.parse("y = r;"), factory)
    assert factory.decrypt(pairs[0][1])[0] == 1
