"""Parser grammar matrix — port of the reference's remaining ParserTest.cpp
cases (646 LoC) not already covered by tests/test_parser.py: exact
expected-AST constructions compared with compare_ast, matching the
reference's style. Each test cites its source case
(test/parser/ParserTest.cpp:line).
"""

import pytest

from abc_tpu.ast_ir import compare_ast
from abc_tpu.ast_ir.nodes import (
    Assignment, BinaryExpression, Block, Call, ExpressionList, For, Function,
    FunctionParameter, If, IndexAccess, LiteralInt, Return, TernaryOperator,
    Variable, VariableDeclaration,
)
from abc_tpu.parser import Parser
from abc_tpu.utils.datatype import Datatype, Type
from abc_tpu.utils.errors import ParsingError
from abc_tpu.utils.operators import Op, Operator

INT = Datatype(Type.INT, secret=False)
SINT = Datatype(Type.INT, secret=True)
VOID = Datatype(Type.VOID)


def _first(ast):
    return next(iter(ast.children()))


def test_empty_string():
    """emptyString (ParserTest.cpp:33-37): an empty program parses to an
    empty Block."""
    ast = Parser.parse("")
    assert len(list(ast.children())) == 0


def test_binary_exp_expected_ast():
    """BinaryExp (ParserTest.cpp:39-47)."""
    ast = Parser.parse("a = 5 + 6;")
    expected = Assignment(Variable("a"),
                          BinaryExpression(LiteralInt(5), Operator(Op.ADD),
                                           LiteralInt(6)))
    assert compare_ast(_first(ast), expected)


def test_ternary_exp_expected_ast():
    """TernaryExp (ParserTest.cpp:49-64, GTEST_SKIP in the reference
    "until TernaryExp is completely implemented") — parsed for real here."""
    ast = Parser.parse("a = b > 5 ? 111 : 6;")
    expected = Assignment(
        Variable("a"),
        TernaryOperator(BinaryExpression(Variable("b"), Operator(Op.GREATER),
                                         LiteralInt(5)),
                        LiteralInt(111), LiteralInt(6)))
    assert compare_ast(_first(ast), expected)


def test_if_else_if_statements():
    """IfElseIfStatements (ParserTest.cpp:197-271): an else-if chain nests
    each If inside the previous else Block."""
    ast = Parser.parse("""
      public int main(int a) {
        if (a < 0) { return -1; }
        else if (a == 0) { return 1000; }
        else if (a > 4256) { return 3434; }
        return 0;
      }""")
    if_4256 = If(BinaryExpression(Variable("a"), Operator(Op.GREATER),
                                  LiteralInt(4256)),
                 Block([Return(LiteralInt(3434))]))
    if_eq0 = If(BinaryExpression(Variable("a"), Operator(Op.EQUAL),
                                 LiteralInt(0)),
                Block([Return(LiteralInt(1000))]), Block([if_4256]))
    if_lt0 = If(BinaryExpression(Variable("a"), Operator(Op.LESS),
                                 LiteralInt(0)),
                Block([Return(LiteralInt(-1))]), Block([if_eq0]))
    expected = Function(INT, "main", [FunctionParameter(INT, "a")],
                        Block([if_lt0, Return(LiteralInt(0))]))
    assert compare_ast(_first(ast), expected)


def test_for_statement_expected_ast():
    """ForStatement (ParserTest.cpp:273-338): full expected-AST comparison
    incl. initializer/update Blocks; created-nodes list has no duplicates."""
    src = """
      public secret int computeSum(int bound) {
        int sum = 0;
        for (int i = 0; i < bound; i = i + 1) { sum = sum + i; }
        return sum;
      }"""
    ast, created = Parser.parse_with_nodes(src) \
        if hasattr(Parser, "parse_with_nodes") else (Parser.parse(src), None)
    if created is not None:
        ids = [n.unique_node_id for n in created]
        assert len(ids) == len(set(ids))     # no node registered twice
    for_stmt = For(
        Block([VariableDeclaration(INT, Variable("i"), LiteralInt(0))]),
        BinaryExpression(Variable("i"), Operator(Op.LESS), Variable("bound")),
        Block([Assignment(Variable("i"),
                          BinaryExpression(Variable("i"), Operator(Op.ADD),
                                           LiteralInt(1)))]),
        Block([Assignment(Variable("sum"),
                          BinaryExpression(Variable("sum"), Operator(Op.ADD),
                                           Variable("i")))]))
    expected = Function(SINT, "computeSum", [FunctionParameter(INT, "bound")],
                        Block([VariableDeclaration(INT, Variable("sum"),
                                                   LiteralInt(0)),
                               for_stmt, Return(Variable("sum"))]))
    assert compare_ast(_first(ast), expected)


def test_ignore_comments():
    """IgnoreComments (ParserTest.cpp:339-353): // and /* */ comments are
    skipped at parse level."""
    ast = Parser.parse("""
      // declare and initialize a variable
      int i = 0;  /* variable's value: 0 */
    """)
    expected = VariableDeclaration(INT, Variable("i"), LiteralInt(0))
    assert compare_ast(_first(ast), expected)


def test_matrix_declaration_simple():
    """MatrixDeclaration_simple (ParserTest.cpp:355-393)."""
    ast = Parser.parse("""
      public void main() {
        int scalar = 2;
        int vec = {3, 4, 9, 2, 1};
      }""")
    expected = Function(VOID, "main", [], Block([
        VariableDeclaration(INT, Variable("scalar"), LiteralInt(2)),
        VariableDeclaration(INT, Variable("vec"), ExpressionList(
            [LiteralInt(v) for v in (3, 4, 9, 2, 1)]))]))
    assert compare_ast(_first(ast), expected)


def test_matrix_declaration_multi_dimensional():
    """MatrixDeclaration_multiDimensional (ParserTest.cpp:395-439): nested
    expression lists, ragged rows allowed."""
    ast = Parser.parse(
        "public void main() { int vec = { {3, 4}, {9, 2}, {1} }; }")
    expected = Function(VOID, "main", [], Block([
        VariableDeclaration(INT, Variable("vec"), ExpressionList([
            ExpressionList([LiteralInt(3), LiteralInt(4)]),
            ExpressionList([LiteralInt(9), LiteralInt(2)]),
            ExpressionList([LiteralInt(1)])]))]))
    assert compare_ast(_first(ast), expected)


def test_matrix_assignment():
    """MatrixAssignment (ParserTest.cpp:441-478)."""
    ast = Parser.parse(
        "public void main() { int vec = {3, 4, 9, 2, 1}; vec[3] = 0; }")
    expected = Function(VOID, "main", [], Block([
        VariableDeclaration(INT, Variable("vec"), ExpressionList(
            [LiteralInt(v) for v in (3, 4, 9, 2, 1)])),
        Assignment(IndexAccess(Variable("vec"), LiteralInt(3)),
                   LiteralInt(0))]))
    assert compare_ast(_first(ast), expected)


def test_matrix_assignment_invalid():
    """MatrixAssignment_invalid (ParserTest.cpp:480-487): sized array
    declarations are a parse error."""
    with pytest.raises(ParsingError):
        Parser.parse("int sum[5] = {3, 4, 9, 2, 1}; return sum;")


def test_matrix_declaration_brackets():
    """MatrixDeclaration_brackets (ParserTest.cpp:489-514): `int x[] = v`
    parses like a plain declaration (unsized brackets are cosmetic)."""
    ast = Parser.parse("public void main() { int scalar[] = 2; }")
    expected = Function(VOID, "main", [], Block([
        VariableDeclaration(INT, Variable("scalar"), LiteralInt(2))]))
    assert compare_ast(_first(ast), expected)


def test_matrix_declaration_fixed_size_not_supported():
    """MatrixDeclaration_fixArraySizeNotSupported (ParserTest.cpp:516-525)."""
    with pytest.raises(ParsingError):
        Parser.parse("public void main() { int scalar[0] = 2; }")


def test_parenthesis_expression_expected_ast():
    """parenthesisExpression (ParserTest.cpp:543-581)."""
    ast = Parser.parse("""
      public int main(int b) {
        int a = (5+7)*(b<10);
        return a;
      }""")
    expr = BinaryExpression(
        BinaryExpression(LiteralInt(5), Operator(Op.ADD), LiteralInt(7)),
        Operator(Op.MUL),
        BinaryExpression(Variable("b"), Operator(Op.LESS), LiteralInt(10)))
    expected = Function(INT, "main", [FunctionParameter(INT, "b")], Block([
        VariableDeclaration(INT, Variable("a"), expr),
        Return(Variable("a"))]))
    assert compare_ast(_first(ast), expected)


def test_secret_keyword_expected_ast():
    """secretKeyword (ParserTest.cpp:583-610): secret return type, secret
    parameter, secret declaration, FHE_ADD operator."""
    ast = Parser.parse("""
      public secret int main(secret int a) {
        secret int b = 11;
        return a+++b;
      }""")
    expected = Function(SINT, "main", [FunctionParameter(SINT, "a")], Block([
        VariableDeclaration(SINT, Variable("b"), LiteralInt(11)),
        Return(BinaryExpression(Variable("a"), Operator(Op.FHE_ADD),
                                Variable("b")))]))
    assert compare_ast(_first(ast), expected)


def test_call_rotate_expected_ast():
    """callRotate (ParserTest.cpp:612-646)."""
    ast = Parser.parse("""
      public secret int main() {
        secret int b = {1, 23, 42, 1, 0};
        return rotate(b, 2);
      }""")
    expected = Function(SINT, "main", [], Block([
        VariableDeclaration(SINT, Variable("b"), ExpressionList(
            [LiteralInt(v) for v in (1, 23, 42, 1, 0)])),
        Return(Call("rotate", [Variable("b"), LiteralInt(2)]))]))
    assert compare_ast(_first(ast), expected)
