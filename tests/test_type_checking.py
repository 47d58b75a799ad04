"""Type-checking + secret-taint tests.

Reference test tier: test/visitor/TypeCheckingVisitorTest.cpp (taint cases
incl. secretTainting_ifCondition :199-218, overwriteSecret :220-240).
"""

import pytest

from abc_tpu.ast_ir.nodes import BinaryExpression, Return
from abc_tpu.parser import Parser
from abc_tpu.passes.type_checking import TypeCheckingVisitor, run_type_checking
from abc_tpu.utils.datatype import Datatype, Type
from abc_tpu.utils.errors import CompilerError


def check(src, inputs=None):
    ast = Parser.parse(src)
    return ast, run_type_checking(ast, inputs)


def find_nodes(ast, node_type):
    return [n for n in ast.iter_preorder() if n.node_type == node_type]


def test_secret_tainting_if_condition():
    # ref: TypeCheckingVisitorTest.cpp:199-218
    src = """
    public secret int main(int threshold) {
      secret int val = 2411;
      if (val < threshold) {
        return 1;
      }
      return 0;
    }
    """
    ast, tcv = check(src)
    cond = find_nodes(ast, "BinaryExpression")[0]
    assert tcv.is_secret_tainted(cond.unique_node_id)
    if_node = find_nodes(ast, "If")[0]
    assert tcv.is_secret_tainted(if_node.unique_node_id)


def test_overwrite_secret_keeps_declared_type():
    # ref: TypeCheckingVisitorTest.cpp:220-240 — assigning a plain value to a
    # secret variable does not change its declared (secret) type
    src = """
    public secret int main(int N) {
      secret int sum = 2442;
      sum = 5555;
      return sum + 1;
    }
    """
    ast, tcv = check(src)
    ret = [n for n in ast.iter_preorder() if isinstance(n, Return)][0]
    assert tcv.is_secret_tainted(ret.value.unique_node_id)


def test_plain_expression_not_tainted():
    ast, tcv = check("int x = 5; int y = x + 3;")
    exprs = find_nodes(ast, "BinaryExpression")
    assert not tcv.is_secret_tainted(exprs[0].unique_node_id)


def test_taint_propagates_through_nesting():
    ast, tcv = check("secret int s = 1; int p = 2; int r[];"
                     " r = (p + p) * (s + p);")
    exprs = find_nodes(ast, "BinaryExpression")
    # (p+p) plain, (s+p) tainted, whole product tainted
    taints = [tcv.is_secret_tainted(e.unique_node_id) for e in exprs]
    outer = [e for e in exprs if str(e.operator) == "*"][0]
    assert tcv.is_secret_tainted(outer.unique_node_id)
    assert False in taints and True in taints


def test_preregistered_inputs():
    # e2e-harness style: inputs registered without declarations
    # (ref: HammingDistanceTest.cpp:57-70)
    ast, tcv = check("sum = x + y;", inputs={
        "x": Datatype(Type.INT, True), "y": Datatype(Type.INT, False),
        "sum": Datatype(Type.INT, True)})
    expr = find_nodes(ast, "BinaryExpression")[0]
    assert tcv.is_secret_tainted(expr.unique_node_id)


def test_rotate_type_follows_ciphertext():
    ast, tcv = check("y = rotate(x, -4);",
                     inputs={"x": Datatype(Type.INT, True),
                             "y": Datatype(Type.INT, True)})
    call = find_nodes(ast, "Call")[0]
    assert tcv.is_secret_tainted(call.unique_node_id)


def test_rotate_rejects_secret_steps():
    with pytest.raises(CompilerError):
        check("y = rotate(x, s);", inputs={
            "x": Datatype(Type.INT, True), "s": Datatype(Type.INT, True),
            "y": Datatype(Type.INT, True)})


def test_incompatible_operand_types_rejected():
    with pytest.raises(CompilerError):
        check('int x = 5; string s = "ab"; int y[]; y = x + s;')


def test_undeclared_variable_rejected():
    from abc_tpu.utils.errors import SemanticError
    with pytest.raises((CompilerError, SemanticError)):
        check("int y = undeclared + 1;")


def test_index_access_requires_int_index():
    with pytest.raises(CompilerError):
        check('int v[]; string s = "a"; int y = v[s];')


def test_return_type_mismatch_rejected():
    with pytest.raises(CompilerError):
        check("public int main(int a) { return 1.5; }")


def test_void_function_with_return_value_rejected():
    with pytest.raises(CompilerError):
        check("public void main(int a) { return a; }")


def test_missing_return_rejected():
    with pytest.raises(CompilerError):
        check("public int main(int a) { a = 1; }")


def test_secretness_mismatch_rejected_for_nonliteral():
    with pytest.raises(CompilerError):
        check("public secret int main(int a) { return a; }")


def test_literal_return_exempt_from_secretness_check():
    # ref: TypeCheckingVisitor.cpp:214 — literal return values skip the check
    check("public secret int main(int a) { return 1; }")


def test_for_initializer_visible_in_condition_and_update():
    ast, tcv = check("int n = 3; int sum = 0;"
                     " for (int i = 0; i < n; i = i + 1) { sum = sum + i; }")
    # no CompilerError means i resolved correctly across init/cond/update/body


def test_expression_list_mixed_types_rejected():
    with pytest.raises(CompilerError):
        check('int x = {1, 2.5};')


def test_expression_datatype_recorded():
    ast, tcv = check("secret int s = 1; int r[]; r = s * 2;")
    expr = find_nodes(ast, "BinaryExpression")[0]
    dt = tcv.get_expression_datatype(expr)
    assert dt.type == Type.INT and dt.secret
