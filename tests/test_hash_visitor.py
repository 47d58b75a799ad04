"""Structural-hash tests (the reference's HashVisitor is a stub;
this is the real implementation it documents as TODO)."""

from abc_tpu.parser import parse
from abc_tpu.passes.hash_visitor import HashVisitor, structural_hash


def expr(src):
    return parse(src).children()[0].value


def test_identical_structures_hash_equal():
    assert structural_hash(expr("v = a + b * c;")) == \
        structural_hash(expr("v = a + b * c;"))


def test_different_operators_differ():
    assert structural_hash(expr("v = a + b;")) != \
        structural_hash(expr("v = a - b;"))


def test_names_matter_in_exact_mode():
    assert structural_hash(expr("v = a + b;")) != \
        structural_hash(expr("v = a + c;"))


def test_shape_mode_ignores_names_and_values():
    assert structural_hash(expr("v = a + b * 2;"), shape_only=True) == \
        structural_hash(expr("v = x + y * 7;"), shape_only=True)
    assert structural_hash(expr("v = a + b * 2;"), shape_only=True) != \
        structural_hash(expr("v = a * b + 2;"), shape_only=True)


def test_per_node_hash_map():
    ast = parse("x = a + b; y = a + b;")
    hv = HashVisitor()
    hv.visit(ast)
    s1, s2 = ast.children()
    assert hv.hashes[s1.value.unique_node_id] == hv.hashes[s2.value.unique_node_id]
