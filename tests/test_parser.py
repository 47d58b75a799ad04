"""Parser tests: grammar cases with expected-AST comparison.

Reference test tier: test/parser/ParserTest.cpp (646 LoC; cases incl.
secretKeyword, fhe_expression, callRotate, matrix declarations) and
TokenizerTest.cpp (SURVEY.md §4 tier 2).
"""

import pytest

from abc_tpu.ast_ir import (
    Assignment, BinaryExpression, Block, Call, ExpressionList, For, Function,
    FunctionParameter, If, IndexAccess, LiteralBool, LiteralInt, Literal,
    Return, UnaryExpression, Variable, VariableDeclaration, compare_ast,
)
from abc_tpu.parser import Parser, parse, tokenize
from abc_tpu.parser.tokens import TokKind
from abc_tpu.utils.datatype import Datatype, Type
from abc_tpu.utils.errors import ParsingError
from abc_tpu.utils.operators import Op, Operator


def first_stmt(src):
    return parse(src).children()[0]


# --- tokenizer ---------------------------------------------------------------

def test_tokenizer_fhe_operators():
    toks = tokenize("a +++ b --- c *** d")
    spellings = [t.value for t in toks if t.kind == TokKind.RESERVED]
    assert spellings == ["+++", "---", "***"]


def test_tokenizer_comments_and_positions():
    toks = tokenize("int x = 1; // comment\n/* block\ncomment */ x = 2;")
    words = [t.value for t in toks if not t.is_eof()]
    assert words == ["int", "x", "=", 1, ";", "x", "=", 2, ";"]


def test_tokenizer_keywords_vs_identifiers():
    toks = tokenize("secret int rotates rotate")
    kinds = [(t.kind, t.value) for t in toks[:4]]
    assert kinds == [(TokKind.RESERVED, "secret"), (TokKind.RESERVED, "int"),
                     (TokKind.IDENTIFIER, "rotates"), (TokKind.RESERVED, "rotate")]


# --- declarations ------------------------------------------------------------

def test_secret_keyword():
    stmt = first_stmt("secret int x = 5;")
    expected = VariableDeclaration(Datatype(Type.INT, True), Variable("x"), LiteralInt(5))
    assert compare_ast(stmt, expected)


def test_plain_declaration_no_value():
    stmt = first_stmt("float f;")
    assert compare_ast(stmt, VariableDeclaration(Datatype(Type.FLOAT), Variable("f")))


def test_unsized_array_declaration():
    stmt = first_stmt("int i[];")
    assert compare_ast(stmt, VariableDeclaration(Datatype(Type.INT), Variable("i")))


def test_sized_array_declaration_rejected():
    with pytest.raises(ParsingError):
        parse("int i[3];")


def test_vector_literal_declaration():
    stmt = first_stmt("secret int x = {1, 2, 3};")
    expected = VariableDeclaration(
        Datatype(Type.INT, True), Variable("x"),
        ExpressionList([LiteralInt(1), LiteralInt(2), LiteralInt(3)]))
    assert compare_ast(stmt, expected)


def test_bool_declaration_coerces_01():
    stmt = first_stmt("bool b = {1, 0, 1};")
    expected = VariableDeclaration(
        Datatype(Type.BOOL), Variable("b"),
        ExpressionList([LiteralBool(True), LiteralBool(False), LiteralBool(True)]))
    assert compare_ast(stmt, expected)


def test_bool_declaration_rejects_other_ints():
    with pytest.raises(ParsingError):
        parse("bool b = 2;")


def test_bool_true_false_keywords():
    stmt = first_stmt("bool b = true;")
    assert compare_ast(stmt, VariableDeclaration(Datatype(Type.BOOL), Variable("b"),
                                                 LiteralBool(True)))


# --- expressions -------------------------------------------------------------

def test_precedence_mul_over_add():
    stmt = first_stmt("int x = 1 + 2 * 3;")
    expected_value = BinaryExpression(
        LiteralInt(1), Operator(Op.ADD),
        BinaryExpression(LiteralInt(2), Operator(Op.MUL), LiteralInt(3)))
    assert compare_ast(stmt.value, expected_value)


def test_left_associativity():
    stmt = first_stmt("int x = 1 - 2 - 3;")
    expected_value = BinaryExpression(
        BinaryExpression(LiteralInt(1), Operator(Op.SUB), LiteralInt(2)),
        Operator(Op.SUB), LiteralInt(3))
    assert compare_ast(stmt.value, expected_value)


def test_parentheses_override():
    stmt = first_stmt("int x = (1 + 2) * 3;")
    expected_value = BinaryExpression(
        BinaryExpression(LiteralInt(1), Operator(Op.ADD), LiteralInt(2)),
        Operator(Op.MUL), LiteralInt(3))
    assert compare_ast(stmt.value, expected_value)


def test_fhe_expression():
    stmt = first_stmt("x = a *** b +++ c;")
    expected = Assignment(
        Variable("x"),
        BinaryExpression(
            BinaryExpression(Variable("a"), Operator(Op.FHE_MUL), Variable("b")),
            Operator(Op.FHE_ADD), Variable("c")))
    assert compare_ast(stmt, expected)


def test_negative_literal():
    stmt = first_stmt("int x = -4;")
    assert compare_ast(stmt.value, LiteralInt(-4))


def test_negative_literal_in_subtraction_stays_binary():
    stmt = first_stmt("int x = y - 4;")
    expected_value = BinaryExpression(Variable("y"), Operator(Op.SUB), LiteralInt(4))
    assert compare_ast(stmt.value, expected_value)


def test_relational_and_logical():
    stmt = first_stmt("bool c = a < b && b == d;")
    expected_value = BinaryExpression(
        BinaryExpression(Variable("a"), Operator(Op.LESS), Variable("b")),
        Operator(Op.LOGICAL_AND),
        BinaryExpression(Variable("b"), Operator(Op.EQUAL), Variable("d")))
    assert compare_ast(stmt.value, expected_value)


def test_unary_not():
    stmt = first_stmt("bool c = !a;")
    assert compare_ast(stmt.value, UnaryExpression(Variable("a"), Operator(Op.LOGICAL_NOT)))


def test_postfix_increment_becomes_plus_one():
    stmt = first_stmt("x = i++;")
    expected_value = BinaryExpression(Variable("i"), Operator(Op.ADD), LiteralInt(1))
    assert compare_ast(stmt.value, expected_value)


def test_call_rotate():
    stmt = first_stmt("y = rotate(x, -4);")
    expected = Assignment(Variable("y"),
                          Call("rotate", [Variable("x"), LiteralInt(-4)]))
    assert compare_ast(stmt, expected)


def test_rotate_of_expression():
    stmt = first_stmt("y = rotate(x *** w, 2);")
    expected = Assignment(
        Variable("y"),
        Call("rotate", [BinaryExpression(Variable("x"), Operator(Op.FHE_MUL),
                                         Variable("w")), LiteralInt(2)]))
    assert compare_ast(stmt, expected)


# --- targets -----------------------------------------------------------------

def test_chained_index_access():
    stmt = first_stmt("m[1][2] = 5;")
    expected = Assignment(
        IndexAccess(IndexAccess(Variable("m"), LiteralInt(1)), LiteralInt(2)),
        LiteralInt(5))
    assert compare_ast(stmt, expected)


def test_index_access_with_expression_index():
    stmt = first_stmt("x = v[i + 1];")
    expected = Assignment(
        Variable("x"),
        IndexAccess(Variable("v"),
                    BinaryExpression(Variable("i"), Operator(Op.ADD), LiteralInt(1))))
    assert compare_ast(stmt, expected)


# --- statements --------------------------------------------------------------

def test_if_else():
    stmt = first_stmt("if (a < 5) { x = 1; } else { x = 2; }")
    expected = If(
        BinaryExpression(Variable("a"), Operator(Op.LESS), LiteralInt(5)),
        Block([Assignment(Variable("x"), LiteralInt(1))]),
        Block([Assignment(Variable("x"), LiteralInt(2))]))
    assert compare_ast(stmt, expected)


def test_if_single_statement_wrapped_in_block():
    stmt = first_stmt("if (a) x = 1;")
    expected = If(Variable("a"), Block([Assignment(Variable("x"), LiteralInt(1))]))
    assert compare_ast(stmt, expected)


def test_for_loop():
    stmt = first_stmt("for (int i = 0; i < n; i = i + 1) { sum = sum + i; }")
    expected = For(
        Block([VariableDeclaration(Datatype(Type.INT), Variable("i"), LiteralInt(0))]),
        BinaryExpression(Variable("i"), Operator(Op.LESS), Variable("n")),
        Block([Assignment(Variable("i"),
                          BinaryExpression(Variable("i"), Operator(Op.ADD), LiteralInt(1)))]),
        Block([Assignment(Variable("sum"),
                          BinaryExpression(Variable("sum"), Operator(Op.ADD), Variable("i")))]))
    assert compare_ast(stmt, expected)


def test_return_with_and_without_value():
    assert compare_ast(first_stmt("return sum;"), Return(Variable("sum")))
    assert compare_ast(first_stmt("return;"), Return())


def test_function_declaration():
    src = "public int main(secret int a, int b) { return a + b; }"
    expected = Function(
        Datatype(Type.INT), "main",
        [FunctionParameter(Datatype(Type.INT, True), "a"),
         FunctionParameter(Datatype(Type.INT), "b")],
        Block([Return(BinaryExpression(Variable("a"), Operator(Op.ADD), Variable("b")))]))
    assert compare_ast(first_stmt(src), expected)


def test_multi_statement_program():
    prog = parse("""
      int sum = 0;
      for (int i = 0; i < n; i = i + 1) {
        sum = sum + (x[i]-y[i])*(x[i]-y[i]);
      }
      return sum;
    """)
    assert [s.node_type for s in prog.children()] == ["VariableDeclaration", "For", "Return"]


def test_parse_with_nodes_returns_nodes_in_parse_order():
    _, nodes = Parser.parse_with_nodes("int x = 1;")
    # Variable, Literal, VariableDeclaration, root Block
    assert [n.node_type for n in nodes] == ["Variable", "Literal",
                                            "VariableDeclaration", "Block"]


def test_parse_error_has_position():
    with pytest.raises(ParsingError) as ei:
        parse("int x = ;")
    assert "line" in str(ei.value)


def test_roundtrip_through_printer():
    src = "secret int x = {1, 2, 3};"
    printed = str(parse(src))
    reparsed = parse(_strip_outer_braces(printed))
    assert compare_ast(parse(src), reparsed)


def _strip_outer_braces(printed: str) -> str:
    # root Block prints as "{ ... }" — strip the outer braces for re-parsing
    s = printed.strip()
    assert s.startswith("{") and s.endswith("}")
    return s[1:-1]
