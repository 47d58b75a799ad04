"""TypeCheckingVisitor matrix — port of the reference's
TypeCheckingVisitorTest.cpp (12 cases): datatype recognition per variable,
expression datatype queries, incompatible-type / bad-index errors, the four
return-type signature checks, If-condition secret tainting, and the
overwrite-secret tainting semantics. Each test cites its source case
(test/visitor/TypeCheckingVisitorTest.cpp:line).
"""

import pytest

from abc_tpu.ast_ir.nodes import (
    Assignment, BinaryExpression, Return, UnaryExpression,
)
from abc_tpu.parser import Parser
from abc_tpu.passes.type_checking import run_type_checking
from abc_tpu.utils.datatype import Type
from abc_tpu.utils.errors import AbcError


def _var_types(tcv):
    return {sid.identifier: dt
            for sid, dt in tcv.variables_datatype._map.items()}


def _binexprs(ast):
    return [n for n in ast.iter_preorder() if isinstance(n, BinaryExpression)]


def test_simple_secret_type_recognition():
    """simpleSecretTypeRecognition (TypeCheckingVisitorTest.cpp:7-41)."""
    ast = Parser.parse("""
      public secret int main(int N) {
        secret int sum = 2442;
        double k = 1.23332;
        return sum;
      }""")
    tcv = run_type_checking(ast)
    types = _var_types(tcv)
    assert types["N"].type == Type.INT and not types["N"].secret
    assert types["sum"].type == Type.INT and types["sum"].secret
    assert types["k"].type == Type.DOUBLE and not types["k"].secret


def test_incompatible_types():
    """incompatibleTypes (TypeCheckingVisitorTest.cpp:43-56): int * double
    must raise."""
    ast = Parser.parse("""
      public secret int main(int N) {
        secret int sum = 2442;
        double k = 1.23332;
        return sum*k;
      }""")
    with pytest.raises(AbcError):
        run_type_checking(ast)


def test_invalid_index_access_type():
    """invalidIndexAccessType (TypeCheckingVisitorTest.cpp:58-71): a float
    index (or an unresolvable base, as written in the reference) raises."""
    ast = Parser.parse("""
      public secret int main(int N) {
        int options = {2442, 2, 4, 14, 2};
        return options[2.0];
      }""")
    with pytest.raises(AbcError):
        run_type_checking(ast)


def test_binary_expression_datatype():
    """binaryExpressionDatatype (TypeCheckingVisitorTest.cpp:73-91):
    4*sum with secret sum — the expression's base type is INT; secretness
    propagates (the reference's exact assertion EXPECT_FALSE(secret) is a
    quirk of its node-id indexing, see its own secretTainting tests)."""
    ast = Parser.parse("""
      public secret int main(int N) {
        secret int sum = 2442;
        return 4*sum;
      }""")
    tcv = run_type_checking(ast)
    expr = _binexprs(ast)[0]
    dt = tcv.get_expression_datatype(expr)
    assert dt.type == Type.INT
    assert tcv.is_secret_tainted(expr.unique_node_id)


def test_deep_nested_binary_expression_datatype():
    """deepNestedBinaryExpressionDatatype (TypeCheckingVisitorTest.cpp:
    93-119): every sub-expression of (4096 - (2442*N)) + (M*4) is a plain
    INT."""
    ast = Parser.parse("""
      public secret int main(int N, int M) {
        secret int sum = (4096 - (2442 * N)) + (M * 4);
        return sum;
      }""")
    tcv = run_type_checking(ast)
    exprs = _binexprs(ast)
    assert len(exprs) == 4
    for e in exprs:
        dt = tcv.get_expression_datatype(e)
        assert dt.type == Type.INT
        assert not dt.secret


def test_unary_expression_datatype():
    """unaryExpressionDatatype (TypeCheckingVisitorTest.cpp:121-139):
    !isRecommended is BOOL."""
    ast = Parser.parse("""
      public secret bool main(bool isRecommended) {
        secret bool b = !isRecommended;
        return b;
      }""")
    tcv = run_type_checking(ast)
    un = [n for n in ast.iter_preorder() if isinstance(n, UnaryExpression)]
    assert un
    assert tcv.get_expression_datatype(un[0]).type == Type.BOOL


def test_return_type_not_matching_specified_type():
    """returnTypeNotMatchingSpecifiedType (TypeCheckingVisitorTest.cpp:
    141-154): returning bool from a secret-int function raises."""
    ast = Parser.parse("""
      public secret int main(bool isRecommended) {
        secret bool b = !isRecommended;
        return b;
      }""")
    with pytest.raises(AbcError):
        run_type_checking(ast)


def test_return_type_non_void_but_no_return():
    """returnTypeNonVoidButNoReturnStatementGiven (TypeCheckingVisitorTest.
    cpp:156-168)."""
    ast = Parser.parse("""
      public int main(bool isRecommended) {
        secret bool b = !isRecommended;
      }""")
    with pytest.raises(AbcError):
        run_type_checking(ast)


def test_return_type_not_matching_secretness():
    """returnTypeNotMatchingSpecifiedSecretness (TypeCheckingVisitorTest.
    cpp:170-183): returning a secret from a public-bool function raises."""
    ast = Parser.parse("""
      public bool main(bool isRecommended) {
        secret bool b = !isRecommended;
        return b;
      }""")
    with pytest.raises(AbcError):
        run_type_checking(ast)


def test_return_type_void_but_returning_value():
    """returnTypeVoidButReturningValue (TypeCheckingVisitorTest.cpp:
    185-197)."""
    ast = Parser.parse("""
      public void main(bool isRecommended) {
        return isRecommended;
      }""")
    with pytest.raises(AbcError):
        run_type_checking(ast)


def test_secret_tainting_if_condition():
    """secretTainting_ifCondition (TypeCheckingVisitorTest.cpp:199-218):
    (val < threshold) with secret val is tainted."""
    ast = Parser.parse("""
      public secret int main(int threshold) {
        secret int val = 2411;
        if (val < threshold) {
          return 1;
        }
        return 0;
      }""")
    tcv = run_type_checking(ast)
    cond = _binexprs(ast)[0]
    assert tcv.is_secret_tainted(cond.unique_node_id)


def test_overwrite_secret():
    """overwriteSecret (TypeCheckingVisitorTest.cpp:220-241): sum stays
    secret after being overwritten with a public literal, so (sum + 1) is
    tainted — the reference keeps this semantics (its issue #5 discusses
    relaxing it; not done there, not done here)."""
    ast = Parser.parse("""
      public secret int main(int N) {
        secret int sum = 2442;
        sum = 5555;
        return sum + 1;
      }""")
    tcv = run_type_checking(ast)
    ret = [n for n in ast.iter_preorder() if isinstance(n, Return)][0]
    assert isinstance(ret.value, BinaryExpression)
    assert tcv.is_secret_tainted(ret.value.unique_node_id)
