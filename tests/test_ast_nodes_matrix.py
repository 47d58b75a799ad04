"""Per-node-class AST corner cases — the reference's 17 per-class test
files (/root/reference/test/ast/*Test.cpp), each covering construction
values, set/get, copy semantics (here: clone deep-copy), children count and
iteration ORDER, and JSON output; plus per-class specials (Block null-slot
removal/append/prepend — BlockTest.cpp:89-184; ExpressionList /
OperatorExpression null-operand removal). The copy/move-constructor cases
map to clone() independence (Python has no move semantics).

Each parametrized case names the reference file it ports."""

import pytest

from abc_tpu.ast_ir import compare_ast, dumps, loads
from abc_tpu.ast_ir.nodes import (
    Assignment, BinaryExpression, Block, Call, ExpressionList, For, Function,
    FunctionParameter, If, IndexAccess, LiteralBool, LiteralInt,
    LiteralString, OperatorExpression, Return, TernaryOperator,
    UnaryExpression, Variable, VariableDeclaration,
)
from abc_tpu.utils.datatype import Datatype, Type
from abc_tpu.utils.operators import Op, Operator


def _mk_assignment():
    # AssignmentTest.cpp: target + value retrievable
    return Assignment(Variable("x"), LiteralInt(3)), 2


def _mk_binary():
    # BinaryExpressionTest.cpp
    return BinaryExpression(LiteralInt(1), Operator(Op.ADD),
                            LiteralInt(2)), 2


def _mk_block():
    # BlockTest.cpp:15 (ctor values)
    return Block([Assignment(Variable("a"), LiteralInt(1)),
                  Assignment(Variable("b"), LiteralInt(2))]), 2


def _mk_call():
    # CallTest.cpp: identifier + arguments
    return Call("rotate", [Variable("x"), LiteralInt(2)]), 2


def _mk_expression_list():
    # ExpressionListTest.cpp
    return ExpressionList([LiteralInt(1), LiteralInt(2), LiteralInt(3)]), 3


def _mk_for():
    # ForTest.cpp:10: initializer/condition/update/body
    init = Block([VariableDeclaration(Datatype(Type.INT), Variable("i"),
                                      LiteralInt(0))])
    cond = BinaryExpression(Variable("i"), Operator(Op.LESS), LiteralInt(4))
    upd = Block([Assignment(Variable("i"),
                            BinaryExpression(Variable("i"), Operator(Op.ADD),
                                             LiteralInt(1)))])
    body = Block([Assignment(Variable("s"), Variable("i"))])
    return For(init, cond, upd, body), 4


def _mk_function():
    # FunctionTest.cpp:55 (multiple parameters)
    params = [FunctionParameter(Datatype(Type.INT, True), "a"),
              FunctionParameter(Datatype(Type.INT), "b")]
    body = Block([Return(Variable("a"))])
    return Function(Datatype(Type.INT), "f", params, body), 3


def _mk_function_parameter():
    # FunctionParameterTest.cpp
    return FunctionParameter(Datatype(Type.INT, True), "p"), 0


def _mk_if():
    # IfTest.cpp: condition + then + else
    return If(BinaryExpression(Variable("c"), Operator(Op.GREATER),
                               LiteralInt(0)),
              Block([Assignment(Variable("x"), LiteralInt(1))]),
              Block([Assignment(Variable("x"), LiteralInt(2))])), 3


def _mk_index_access():
    # IndexAccessTest.cpp incl. nesting x[y[0]]
    return IndexAccess(Variable("x"),
                       IndexAccess(Variable("y"), LiteralInt(0))), 2


def _mk_literal():
    # LiteralTest.cpp
    return LiteralInt(42), 0


def _mk_operator_expression():
    # OperatorExpressionTest.cpp: n-ary operand list
    return OperatorExpression(Operator(Op.ADD),
                              [LiteralInt(1), LiteralInt(2),
                               LiteralInt(3)]), 3


def _mk_return():
    # ReturnTest.cpp
    return Return(LiteralInt(7)), 1


def _mk_ternary():
    # TernaryOperatorTest.cpp
    return TernaryOperator(LiteralBool(True), LiteralInt(1),
                           LiteralInt(0)), 3


def _mk_unary():
    # UnaryExpressionTest.cpp
    return UnaryExpression(LiteralBool(False), Operator(Op.LOGICAL_NOT)), 1


def _mk_variable():
    # VariableTest.cpp
    return Variable("ident"), 0


def _mk_variable_declaration():
    # VariableDeclarationTest.cpp
    return VariableDeclaration(Datatype(Type.INT, True), Variable("v"),
                               LiteralInt(9)), 2


CASES = [
    ("AssignmentTest.cpp", _mk_assignment),
    ("BinaryExpressionTest.cpp", _mk_binary),
    ("BlockTest.cpp", _mk_block),
    ("CallTest.cpp", _mk_call),
    ("ExpressionListTest.cpp", _mk_expression_list),
    ("ForTest.cpp", _mk_for),
    ("FunctionTest.cpp", _mk_function),
    ("FunctionParameterTest.cpp", _mk_function_parameter),
    ("IfTest.cpp", _mk_if),
    ("IndexAccessTest.cpp", _mk_index_access),
    ("LiteralTest.cpp", _mk_literal),
    ("OperatorExpressionTest.cpp", _mk_operator_expression),
    ("ReturnTest.cpp", _mk_return),
    ("TernaryOperatorTest.cpp", _mk_ternary),
    ("UnaryExpressionTest.cpp", _mk_unary),
    ("VariableTest.cpp", _mk_variable),
    ("VariableDeclarationTest.cpp", _mk_variable_declaration),
]


@pytest.mark.parametrize("ref,mk", CASES, ids=[c[0] for c in CASES])
def test_children_count_and_iteration_order(ref, mk):
    """countChildrenReportsCorrectNumber + node_iterate_children: children()
    reports the documented arity, every child's parent is the node, and
    iteration order is construction order."""
    node, n_children = mk()
    kids = [c for c in node.children() if c is not None]
    assert len(kids) == n_children, ref
    for k in kids:
        assert k.parent is node, ref
    # iteration is deterministic and ordered
    assert [id(c) for c in node.children()] == \
        [id(c) for c in node.children()], ref


@pytest.mark.parametrize("ref,mk", CASES, ids=[c[0] for c in CASES])
def test_clone_deep_copy_independence(ref, mk):
    """CopyCtorCopiesValue / MoveCtorPreservesValue analogue: clone() is a
    structurally equal DEEP copy — fresh node ids, fresh child objects, no
    parent link to the original."""
    node, _ = mk()
    cp = node.clone()
    assert compare_ast(node, cp), ref
    assert cp is not node and cp.unique_node_id != node.unique_node_id, ref
    assert cp.parent is None, ref
    orig_kids = [c for c in node.children() if c is not None]
    cp_kids = [c for c in cp.children() if c is not None]
    for a, b in zip(orig_kids, cp_kids):
        assert a is not b, ref


@pytest.mark.parametrize("ref,mk", CASES, ids=[c[0] for c in CASES])
def test_json_roundtrip(ref, mk):
    """JsonOutputTest analogue, STRONGER than the reference (which only
    checks the emitted string — it has no deserializer): full round trip
    through the JSON IR compares structurally equal."""
    node, _ = mk()
    assert compare_ast(node, loads(dumps(node))), ref


def test_block_null_slot_specials():
    """BlockTest.cpp:89-184: null-statement slots are legal (rewriting
    passes blank statements), removable, and append/prepend keep order."""
    a = Assignment(Variable("a"), LiteralInt(1))
    b = Assignment(Variable("b"), LiteralInt(2))
    blk = Block([a, None, b])
    assert len([s for s in blk.statements if s is not None]) == 2
    blk.remove_null_statements()
    assert blk.statements == [a, b]
    c = Assignment(Variable("c"), LiteralInt(3))
    blk.append_statement(c)
    assert blk.statements[-1] is c and c.parent is blk
    z = Assignment(Variable("z"), LiteralInt(0))
    blk.prepend_statement(z)
    assert blk.statements[0] is z and z.parent is blk
    assert [s.target.identifier for s in blk.statements] == \
        ["z", "a", "b", "c"]


def test_operator_expression_null_operand_removal():
    """OperatorExpression::removeNullOperands (OperatorExpression.h:57-94)."""
    oe = OperatorExpression(Operator(Op.ADD),
                            [LiteralInt(1), None, LiteralInt(2)])
    oe.remove_null_operands()
    assert [l.value for l in oe.operands] == [1, 2]


def test_expression_list_null_removal():
    """ExpressionList null-slot removal mirrors Block's."""
    el = ExpressionList([LiteralInt(1), None, LiteralInt(3)])
    el.remove_null_expressions()
    assert [l.value for l in el.expressions] == [1, 3]


def test_for_shares_scope_blocks():
    """ForTest.cpp:39-84 children iteration: initializer, condition, update,
    body in that order; setters re-parent."""
    node, _ = _mk_for()
    init, cond, upd, body = node.children()
    assert isinstance(init, Block) and isinstance(body, Block)
    new_body = Block([Assignment(Variable("t"), LiteralInt(5))])
    node.body = new_body
    assert new_body.parent is node
    assert node.children()[3] is new_body


def test_literal_value_types_preserved_through_json():
    """LiteralTest.cpp value-type matrix: bool stays bool (not int), string
    stays string through the JSON IR."""
    for lit, want in [(LiteralBool(True), True), (LiteralInt(0), 0),
                      (LiteralString("hi"), "hi")]:
        back = loads(dumps(lit))
        assert back.value == want
        assert type(back.value) is type(want)
