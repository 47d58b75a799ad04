"""Visitor dispatch tests — the reference tests its Visitor<Special,Default>
SFINAE template directly (test/visitor/VisitorTest.cpp: dispatchBaseClass /
dispatchDerivedClass / dispatchDefault). Our equivalent capability is MRO
dispatch: a `visit_<Class>` method matches the node class or any superclass,
falling back to default traversal."""

from abc_tpu.ast_ir.nodes import (
    AbstractExpression, AbstractStatement, BinaryExpression, Block,
    LiteralInt, Return, Variable)
from abc_tpu.parser import Parser
from abc_tpu.passes.visitor import PlainVisitor


def test_dispatch_derived_class():
    """A visit_BinaryExpression handler fires for BinaryExpression nodes."""
    hits = []

    class V(PlainVisitor):
        def visit_BinaryExpression(self, node):
            hits.append(str(node.operator))
            self.visit_children(node)

    Parser.parse("x = a + b * c;").accept(V())
    assert sorted(hits) == ["*", "+"]


def test_dispatch_base_class():
    """A superclass-level handler (visit_AbstractStatement) receives every
    statement — the capability Visitor.h:51-84 builds SFINAE machinery for."""
    seen = []

    class V(PlainVisitor):
        def visit_AbstractStatement(self, node):
            seen.append(type(node).__name__)
            self.visit_children(node)

    Parser.parse("int x = 1; { x = 2; } return x;").accept(V())
    assert "VariableDeclaration" in seen
    assert "Block" in seen
    assert "Assignment" in seen
    assert "Return" in seen


def test_dispatch_most_specific_wins():
    """When both a concrete and a superclass handler exist, the concrete one
    wins (MRO order), like SFINAE overload preference."""
    calls = []

    class V(PlainVisitor):
        def visit_Return(self, node):
            calls.append("concrete")
            self.visit_children(node)

        def visit_AbstractStatement(self, node):
            calls.append("base")
            self.visit_children(node)

    # the root Block is itself an AbstractStatement, so it hits "base";
    # the Return inside must hit the CONCRETE handler, not the base one
    Parser.parse("return 1;").accept(V())
    assert calls == ["base", "concrete"]


def test_dispatch_default_traversal():
    """With no handler at all, traversal still reaches every node."""
    count = [0]

    class V(PlainVisitor):
        def visit_AbstractNode(self, node):
            count[0] += 1
            self.visit_children(node)

    ast = Parser.parse("int x = 1 + 2;")
    ast.accept(V())
    assert count[0] >= 5  # Block, decl, binexp, two literals (+ target)
