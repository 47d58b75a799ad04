"""IR-core unit tests: construction, getters, clone deep-copy, children
iteration, JSON round-trip.

Reference test tier: test/ast/*Test.cpp (17 files, one per node class,
SURVEY.md §4 tier 1).
"""

from abc_tpu.ast_ir import (
    Assignment, BinaryExpression, Block, Call, ExpressionList, For, Function,
    FunctionParameter, If, IndexAccess, Literal, LiteralBool, LiteralInt,
    OperatorExpression, Return, TernaryOperator, UnaryExpression, Variable,
    VariableDeclaration, compare_ast, from_json, loads, dumps,
)
from abc_tpu.utils.datatype import Datatype, Type
from abc_tpu.utils.operators import Op, Operator


def make_binexpr():
    return BinaryExpression(Variable("x"), Operator(Op.ADD), LiteralInt(5))


def test_literal_types():
    assert LiteralInt(5).literal_type == Type.INT
    assert LiteralBool(True).literal_type == Type.BOOL
    assert Literal(1.5).literal_type == Type.DOUBLE
    assert Literal("ab").literal_type == Type.STRING
    assert Literal("a").literal_type == Type.CHAR


def test_unique_node_ids():
    a, b = LiteralInt(1), LiteralInt(1)
    assert a.unique_node_id != b.unique_node_id
    assert a.unique_node_id.startswith("Literal_")


def test_binary_expression_children_and_parent():
    e = make_binexpr()
    kids = e.children()
    assert len(kids) == 2
    assert kids[0].parent is e and kids[1].parent is e
    assert isinstance(kids[0], Variable) and kids[0].identifier == "x"


def test_clone_is_deep_and_fresh():
    e = make_binexpr()
    c = e.clone()
    assert compare_ast(e, c)
    assert c is not e and c.left is not e.left
    assert c.unique_node_id != e.unique_node_id
    assert c.parent is None


def test_replace_child():
    e = make_binexpr()
    new_rhs = LiteralInt(7)
    e.replace_child(e.right, new_rhs)
    assert e.right is new_rhs and new_rhs.parent is e


def test_block_null_statements():
    a = Assignment(Variable("x"), LiteralInt(1))
    blk = Block([a])
    blk.statements[0] = None
    assert blk.has_null_statements()
    blk.remove_null_statements()
    assert blk.is_empty()


def test_setter_reparents():
    e = make_binexpr()
    v = Variable("q")
    e.left = v
    assert v.parent is e


def test_operator_expression():
    oe = OperatorExpression(Operator(Op.ADD), [LiteralInt(1), LiteralInt(2), LiteralInt(3)])
    assert oe.count_children() == 3
    oe.operands[1] = None
    oe.remove_null_operands()
    assert oe.count_children() == 2


def test_json_roundtrip_whole_program():
    prog = Block([
        VariableDeclaration(Datatype(Type.INT, True), Variable("x"),
                            ExpressionList([LiteralInt(1), LiteralInt(2)])),
        If(BinaryExpression(Variable("x"), Operator(Op.LESS), LiteralInt(3)),
           Block([Assignment(Variable("x"), LiteralInt(9))]),
           Block([Assignment(Variable("x"), Call("rotate", [Variable("x"), LiteralInt(1)]))])),
        For(Block([VariableDeclaration(Datatype(Type.INT), Variable("i"), LiteralInt(0))]),
            BinaryExpression(Variable("i"), Operator(Op.LESS), LiteralInt(10)),
            Block([Assignment(Variable("i"),
                              BinaryExpression(Variable("i"), Operator(Op.ADD), LiteralInt(1)))]),
            Block([Assignment(Variable("x"),
                              UnaryExpression(Variable("x"), Operator(Op.LOGICAL_NOT)))])),
        Return(TernaryOperator(Variable("x"), LiteralInt(1), LiteralInt(0))),
        Function(Datatype(Type.INT), "f",
                 [FunctionParameter(Datatype(Type.INT, True), "a")],
                 Block([Return(Variable("a"))])),
    ])
    rt = loads(dumps(prog))
    assert compare_ast(prog, rt)


def test_json_roundtrip_index_access():
    e = IndexAccess(IndexAccess(Variable("m"), LiteralInt(1)), LiteralInt(2))
    assert compare_ast(e, from_json(e.to_json()))


def test_compare_ast_detects_differences():
    assert not compare_ast(LiteralInt(1), LiteralInt(2))
    assert not compare_ast(LiteralInt(1), LiteralBool(True))
    assert not compare_ast(make_binexpr(),
                           BinaryExpression(Variable("x"), Operator(Op.SUB), LiteralInt(5)))


def test_iter_preorder():
    e = make_binexpr()
    types = [n.node_type for n in e.iter_preorder()]
    assert types == ["BinaryExpression", "Variable", "Literal"]
