"""Secret-branching (If-lowering) tests.

Reference test tier: test/visitor/SecretBranchingVisitorTest.cpp (430 LoC
matrix: rewriting expected/not-expected over then-only / then+else /
uninitialized / unsupported-body cases).
"""

from abc_tpu.ast_ir import compare_ast
from abc_tpu.parser import Parser, parse
from abc_tpu.passes.secret_branching import run_secret_branching
from abc_tpu.passes.type_checking import run_type_checking
from abc_tpu.utils.datatype import Datatype, Type

from helpers import assert_result, run_program


def lower(src, inputs=None):
    ast = Parser.parse(src)
    tcv = run_type_checking(ast, inputs)
    run_secret_branching(ast, tcv.get_secret_tainted_nodes())
    return ast


def lowered_str(src, inputs=None):
    return str(lower(src, inputs))


def test_then_and_else_rewritten_to_mux():
    src = """
      secret int c = 1;
      secret int x = 0;
      if (c) { x = 11; } else { x = 22; }
    """
    out = lowered_str(src)
    assert "if" not in out
    assert "x = ((c *** 11) +++ ((1 --- c) *** 22))" in out


def test_then_only_uses_old_value_expression():
    # oldValue is the variable's previous VALUE EXPRESSION (ref :115-123)
    src = """
      secret int c = 1;
      secret int x = 42;
      if (c) { x = 11; }
    """
    out = lowered_str(src)
    assert "x = ((c *** 11) +++ ((1 --- c) *** 42))" in out


def test_then_only_uninitialized_variable_self_reference():
    src = """
      secret int c = 1;
      secret int x;
      if (c) { x = 11; }
    """
    out = lowered_str(src)
    assert "x = ((c *** 11) +++ ((1 --- c) *** x))" in out


def test_variable_declared_inside_then_branch_only():
    src = """
      secret int c = 1;
      if (c) { secret int y = 5; }
    """
    out = lowered_str(src)
    assert "y = (c *** 5)" in out


def test_else_only_modified_variable():
    src = """
      secret int c = 1;
      secret int x = 7;
      secret int z = 8;
      if (c) { x = 1; } else { x = 2; z = 9; }
    """
    out = lowered_str(src)
    assert "x = ((c *** 1) +++ ((1 --- c) *** 2))" in out
    assert "z = ((1 --- c) *** 9)" in out


def test_plain_condition_not_rewritten():
    src = """
      int c = 1;
      int x = 0;
      if (c) { x = 11; } else { x = 22; }
    """
    out = lowered_str(src)
    assert "if" in out and "***" not in out


def test_unsupported_body_statement_bails_out():
    src = """
      secret int c = 1;
      secret int x = 0;
      if (c) { for (int i = 0; i < 3; i = i + 1) { x = x + 1; } }
    """
    out = lowered_str(src)
    assert "if" in out  # left untouched


def test_return_in_branch_bails_out():
    src = """
      secret int c = 1;
      secret int x = 0;
      if (c) { return x; }
    """
    out = lowered_str(src)
    assert "if" in out


def test_nested_secret_if_inner_lowered():
    src = """
      secret int c = 1;
      secret int d = 0;
      secret int x = 5;
      if (c) { if (d) { x = 9; } }
    """
    out = lowered_str(src)
    # both levels collapse into mux assignments
    assert "if" not in out


def test_statement_order_preserved():
    src = """
      secret int c = 1;
      secret int x = 0;
      x = 100;
      if (c) { x = 11; }
      x = x +++ 1;
    """
    ast = lower(src)
    kinds = [s.node_type for s in ast.children()]
    assert kinds == ["VariableDeclaration", "VariableDeclaration", "Assignment",
                     "Assignment", "Assignment"]
    # the mux replaced the If in place (position 3)
    out = str(ast)
    assert "x = ((c *** 11) +++ ((1 --- c) *** 100))" in out


# --- end-to-end: lower then execute ------------------------------------------------

def run_lowered(inputs_src, program_src, output_src, factory=None):
    from abc_tpu.ast_ir.nodes import VariableDeclaration
    from abc_tpu.runtime.dummy import DummyCiphertextFactory
    from abc_tpu.runtime.executor import RuntimeVisitor

    ast_in = Parser.parse(inputs_src)
    ast_prog = Parser.parse(program_src)
    ast_out = Parser.parse(output_src)
    types = {d.target.identifier: d.datatype for d in ast_in.children()
             if isinstance(d, VariableDeclaration)}
    tcv = run_type_checking(ast_prog, types)
    run_secret_branching(ast_prog, tcv.get_secret_tainted_nodes(), types.keys())
    # re-typecheck: the rewrite introduced new nodes that need taint entries
    tcv2 = run_type_checking(ast_prog, types)
    factory = factory or DummyCiphertextFactory(64)
    rv = RuntimeVisitor(factory, ast_in, tcv2.get_secret_tainted_nodes())
    rv.execute_ast(ast_prog)
    return factory, rv.get_output(ast_out)


def test_lowered_program_executes_on_dummy():
    inputs = "secret int c = 1; secret int x = 0;"
    program = "if (c) { x = 11; } else { x = 22; }"
    factory, pairs = run_lowered(inputs, program, "y = x;")
    assert factory.decrypt(pairs[0][1])[0] == 11

    inputs0 = "secret int c = 0; secret int x = 0;"
    factory, pairs = run_lowered(inputs0, program, "y = x;")
    assert factory.decrypt(pairs[0][1])[0] == 22


def test_lowered_program_executes_on_bfv():
    from abc_tpu.runtime.bfv_backend import BfvCiphertextFactory
    factory = BfvCiphertextFactory(slots=1024, seed=1)
    inputs = "secret int c = 1; secret int x = 3;"
    program = "if (c) { x = x *** x; }"
    factory, pairs = run_lowered(inputs, program, "y = x;", factory)
    assert factory.decrypt(pairs[0][1])[0] == 9
