"""CFG/DFG tests.

Reference test tier: test/visitor/ControlFlowGraphVisitorTest.cpp (654 LoC,
cfg_* edge assertions and dfg_* write→read edges).
"""

import pytest

from abc_tpu.parser import parse
from abc_tpu.passes.cfg import VariableAccessType, build_cfg
from abc_tpu.utils.errors import CompilerError


def nodes_by_type(v, node_type):
    return [g for g in v.nodes if g.ast_node.node_type == node_type]


def cfg_chain(v):
    """Walk the CFG from the root following single children; returns node types."""
    out = []
    g = v.get_root_node()
    seen = set()
    while g is not None and id(g) not in seen:
        seen.add(id(g))
        out.append(g.ast_node.node_type)
        g = g.cfg_children[0] if g.cfg_children else None
    return out


def test_cfg_simple_program():
    # ref: cfg_simpleProgram — straight-line statements chain linearly
    v = build_cfg(parse("int a = 1; int b = 2; a = a + b;"))
    types = cfg_chain(v)
    assert types == ["Block", "VariableDeclaration", "VariableDeclaration",
                     "Assignment"]


def test_cfg_if_else_join():
    # ref: cfg_ifElseProgram — both branch tails join at the successor
    v = build_cfg(parse("""
      int a = 1;
      if (a < 5) { a = 2; } else { a = 3; }
      a = 4;
    """))
    successor = nodes_by_type(v, "Assignment")[-1]   # a = 4
    parent_types = sorted(p.ast_node.node_type for p in successor.cfg_parents)
    # joined from the then-branch assignment and the else-branch assignment
    assert parent_types == ["Assignment", "Assignment"]


def test_cfg_if_without_else_joins_condition_and_then():
    v = build_cfg(parse("""
      int a = 1;
      if (a < 5) { a = 2; }
      a = 4;
    """))
    successor = nodes_by_type(v, "Assignment")[-1]
    parent_types = sorted(p.ast_node.node_type for p in successor.cfg_parents)
    assert parent_types == ["Assignment", "If"]


def test_cfg_for_loop_back_edge():
    # ref: cfg_ForProgram — update → condition back edge; condition → next
    v = build_cfg(parse("""
      int s = 0;
      for (int i = 0; i < 3; i = i + 1) { s = s + i; }
      s = s * 2;
    """))
    cond = nodes_by_type(v, "BinaryExpression")[0]  # the condition node
    parent_types = sorted(p.ast_node.node_type for p in cond.cfg_parents)
    # from the initializer decl and from the update assignment (back edge)
    assert parent_types == ["Assignment", "VariableDeclaration"]
    child_types = sorted(c.ast_node.node_type for c in cond.cfg_children)
    # into the loop body (Block) and to the next statement
    assert child_types == ["Assignment", "Block"]


def test_accesses_read_write():
    v = build_cfg(parse("int a = 1; int b = a + 2; a = a + b;"))
    decl_b = nodes_by_type(v, "VariableDeclaration")[1]
    assert {s.identifier for s in decl_b.reads()} == {"a"}
    assert {s.identifier for s in decl_b.writes()} == {"b"}
    assign = nodes_by_type(v, "Assignment")[0]
    assert {s.identifier for s in assign.reads()} == {"a", "b"}
    assert {s.identifier for s in assign.writes()} == {"a"}


def test_read_and_write_merged():
    v = build_cfg(parse("int a = 1; a = a + 1;"))
    assign = nodes_by_type(v, "Assignment")[0]
    sid = next(iter(assign.accesses))
    assert assign.accesses[sid] == VariableAccessType.READ_AND_WRITE


def test_dfg_simple_assignment():
    # ref: dfg_simpleAssignment — write in decl flows to the read
    v = build_cfg(parse("int a = 1; int b = a + 2;"))
    decl_a, decl_b = nodes_by_type(v, "VariableDeclaration")
    assert decl_b in decl_a.dfg_children


def test_dfg_if_else_two_possible_writers():
    # ref: buildDataflowGraph doc example (ControlFlowGraphVisitor.h:105-118)
    v = build_cfg(parse("""
      int c = 200;
      int a = 0;
      if (c > 100) { a = 1; } else { a = 0; }
      c = a * 22;
    """))
    final = nodes_by_type(v, "Assignment")[-1]     # c = a*22
    writers = [p.ast_node.node_type for p in final.dfg_parents]
    assert len(final.dfg_parents) == 2 and set(writers) == {"Assignment"}


def test_dfg_for_loop_accumulation_self_edge():
    # ref: dfg_forLoop_accumulation — s reads its own previous write through
    # the loop back edge
    v = build_cfg(parse("""
      int s = 0;
      for (int i = 0; i < 3; i = i + 1) { s = s + i; }
    """))
    acc = nodes_by_type(v, "Assignment")[0]        # s = s + i
    assert acc in acc.dfg_parents                  # loop-carried dependency
    decl_s = nodes_by_type(v, "VariableDeclaration")[0]
    assert acc in decl_s.dfg_children


def test_dfg_update_reads_loop_variable():
    v = build_cfg(parse("for (int i = 0; i < 3; i = i + 1) { int z = i; }"))
    upd = [g for g in v.nodes if g.ast_node.node_type == "Assignment"][0]
    # i = i + 1 depends on the declaration of i and on itself (loop carried)
    parent_kinds = {p.ast_node.node_type for p in upd.dfg_parents}
    assert "VariableDeclaration" in parent_kinds and upd in upd.dfg_parents


def test_entrypoint_check():
    with pytest.raises(CompilerError):
        build_cfg(parse("x = 1;").children()[0])  # Assignment as root


def test_out_of_scope_inputs_registered():
    # ref: dfg_simpleReadWriteAssignment_takeOutOfScopeDeclaredVarsAsInput
    v = build_cfg(parse("sum = sum + x;"), input_identifiers=["sum", "x"])
    assign = nodes_by_type(v, "Assignment")[0]
    assert {s.identifier for s in assign.reads()} == {"sum", "x"}


def test_unresolvable_variable_raises_or_ignored():
    # ref: dfg_simpleReadWriteAssignment_throwErrorOnNonResolvableVariable / ignoreNonResolvedVars
    with pytest.raises(CompilerError):
        build_cfg(parse("y = undeclared;"))
    v = build_cfg(parse("y = undeclared;"), input_identifiers=["y"],
                  ignore_non_declared=True)
    assign = nodes_by_type(v, "Assignment")[0]
    assert {s.identifier for s in assign.reads()} == set()
