"""CFG/DFG matrix — port of the reference's ControlFlowGraphVisitorTest.cpp
(654 LoC), case for case: cfg_* structure tests (node counts + edge shape),
dfg_* accessed-variables tests, and dfgGraph_* data-flow-edge tests. Each
test cites its source case (test/visitor/ControlFlowGraphVisitorTest.cpp:line).
"""

import pytest

from abc_tpu.ast_ir.nodes import (
    Assignment, Block, For, Function, If, Return, VariableDeclaration,
)
from abc_tpu.parser import Parser
from abc_tpu.passes.cfg import (
    ControlFlowGraphVisitor, VariableAccessType, build_cfg,
)
from abc_tpu.utils.errors import CompilerError
from abc_tpu.utils.scope import Scope


def _reachable(root):
    seen, stack = [], [root]
    while stack:
        n = stack.pop()
        if n in seen:
            continue
        seen.append(n)
        stack.extend(n.cfg_children)
    return seen


def _find(v, pred):
    matches = [gn for gn in v.nodes if pred(gn.ast_node)]
    assert matches, "no graph node matches predicate"
    return matches


def _one(v, pred):
    matches = _find(v, pred)
    assert len(matches) == 1
    return matches[0]


def _accesses(gn):
    return {sid.identifier: t for sid, t in gn.accesses.items()}


# ------------------------------------------------- (cfg) structure tests

def test_cfg_simple_program():
    """cfg_simpleProgram (ControlFlowGraphVisitorTest.cpp:20-47): function →
    block → varDecl → return; 5 reachable nodes incl. the parser's wrapping
    Block."""
    ast = Parser.parse(
        "public int main(int a, int z, int v) { int a = 10; return a; }")
    v = build_cfg(ast)
    assert len(_reachable(v.get_root_node())) == 5
    fn = _one(v, lambda n: isinstance(n, Function))
    body = fn.cfg_children[0]
    assert isinstance(body.ast_node, Block)
    decl = body.cfg_children[0]
    assert isinstance(decl.ast_node, VariableDeclaration)
    ret = decl.cfg_children[0]
    assert isinstance(ret.ast_node, Return)
    assert ret.cfg_children == []


def test_cfg_if_else_program():
    """cfg_ifElseProgram (ControlFlowGraphVisitorTest.cpp:49-86): both
    branches hang off the If node; 10 reachable nodes."""
    ast = Parser.parse("""
      public int main(int a) {
        int q;
        q = 21;
        if (q > a) { return 1; } else { return 0; }
      }""")
    v = build_cfg(ast)
    assert len(_reachable(v.get_root_node())) == 10
    if_node = _one(v, lambda n: isinstance(n, If))
    assert len(if_node.cfg_children) == 2     # then-block and else-block
    for branch in if_node.cfg_children:
        assert isinstance(branch.ast_node, Block)
        assert isinstance(branch.cfg_children[0].ast_node, Return)


def test_cfg_if_program():
    """cfg_ifProgram (ControlFlowGraphVisitorTest.cpp:88-123): without an
    else, the If node AND the then-branch both flow to the next statement;
    9 reachable nodes."""
    ast = Parser.parse("""
      public int main(int a) {
        int q;
        q = 21;
        if (q > a) { return 1; }
        return 0;
      }""")
    v = build_cfg(ast)
    assert len(_reachable(v.get_root_node())) == 9
    if_node = _one(v, lambda n: isinstance(n, If))
    final_ret = [gn for gn in v.nodes if isinstance(gn.ast_node, Return)][-1]
    assert final_ret in if_node.cfg_children           # skip edge
    then_ret = [gn for gn in v.nodes if isinstance(gn.ast_node, Return)][0]
    # the then-branch ends in a Return, so the trailing return's ONLY
    # parent is the If node (reference: returnStmt2's parents)
    assert final_ret.cfg_parents == [if_node]
    assert then_ret.cfg_children == []
    assert then_ret is not final_ret


def test_cfg_for_program():
    """cfg_ForProgram (ControlFlowGraphVisitorTest.cpp:125-167): init →
    condition → body → update → condition (back edge); condition → next;
    12 reachable nodes (initializer/update wrapping Blocks are not CFG
    nodes)."""
    ast = Parser.parse("""
      public int main(int a) {
        int q;
        q = 21;
        for (int i = 0; i < 22; i = i+1) { q = q + i * 12; }
        return q;
      }""")
    v = build_cfg(ast)
    assert len(_reachable(v.get_root_node())) == 12
    cond = _one(v, lambda n: not isinstance(
        n, (Function, Block, If, For, Return, Assignment,
            VariableDeclaration)))   # the condition expression node
    # condition's parents: the initializer decl and the update assignment
    ptypes = sorted(p.ast_node.node_type for p in cond.cfg_parents)
    assert ptypes == ["Assignment", "VariableDeclaration"]
    # condition's children: loop body block and the trailing return
    ctypes = sorted(c.ast_node.node_type for c in cond.cfg_children)
    assert ctypes == ["Block", "Return"]


# --------------------------------------- (dfg-1) accessed-variables tests

def test_dfg_no_scope_given_expect_fail():
    """dfg_noScopeGiven_expectFail (ControlFlowGraphVisitorTest.cpp:210-220):
    a bare statement is not a valid CFG entry point."""
    ast = Parser.parse("int z = 0;")
    stmt = next(iter(ast.children()))
    v = ControlFlowGraphVisitor()
    with pytest.raises(CompilerError):
        stmt.accept(v)


def test_dfg_simple_assignment():
    """dfg_simpleAssignment (ControlFlowGraphVisitorTest.cpp:222-239)."""
    ast = Parser.parse("{ int z = 0; }")
    v = build_cfg(ast)
    decl = _one(v, lambda n: isinstance(n, VariableDeclaration))
    assert _accesses(decl) == {"z": VariableAccessType.WRITE}


def test_dfg_function_parameter():
    """dfg_functionParameter (ControlFlowGraphVisitorTest.cpp:241-262):
    parameters are WRITEs on the Function node; the body decl READs z and
    WRITEs v."""
    ast = Parser.parse("public int main(int z) { int v = z+1; }")
    v = build_cfg(ast)
    fn = _one(v, lambda n: isinstance(n, Function))
    assert _accesses(fn) == {"z": VariableAccessType.WRITE}
    decl = _one(v, lambda n: isinstance(n, VariableDeclaration))
    assert _accesses(decl) == {"z": VariableAccessType.READ,
                               "v": VariableAccessType.WRITE}


def test_dfg_nonresolvable_variable_raises():
    """dfg_simpleReadWriteAssignment_throwErrorOnNonResolvableVariable
    (ControlFlowGraphVisitorTest.cpp:264-275)."""
    ast = Parser.parse("{ int q = a + 7; }")
    with pytest.raises(CompilerError):
        build_cfg(ast)


def test_dfg_ignore_non_resolved_vars():
    """dfg_simpleReadWriteAssignment_ignoreNonResolvedVars
    (ControlFlowGraphVisitorTest.cpp:277-295): with the flag, out-of-scope
    accesses are simply not tracked."""
    ast = Parser.parse("{ int q = a + 7; }")
    v = build_cfg(ast, ignore_non_declared=True)
    decl = _one(v, lambda n: isinstance(n, VariableDeclaration))
    assert _accesses(decl) == {"q": VariableAccessType.WRITE}


def test_dfg_out_of_scope_declared_vars_as_input():
    """dfg_simpleReadWriteAssignment_takeOutOfScopeDeclaredVarsAsInput
    (ControlFlowGraphVisitorTest.cpp:297-319): pre-registered inputs
    resolve as READs."""
    ast = Parser.parse("{ int q = a + 7; }")
    v = build_cfg(ast, input_identifiers=("a",))
    decl = _one(v, lambda n: isinstance(n, VariableDeclaration))
    assert _accesses(decl) == {"q": VariableAccessType.WRITE,
                               "a": VariableAccessType.READ}


def test_dfg_if_statement():
    """dfg_ifStatement (ControlFlowGraphVisitorTest.cpp:321-346): the If
    node carries the condition's READ; the then-assignment carries the
    WRITE."""
    ast = Parser.parse("{ int c = 99; int a; if (c > 100) { a = 22; } }")
    v = build_cfg(ast)
    if_node = _one(v, lambda n: isinstance(n, If))
    assert _accesses(if_node) == {"c": VariableAccessType.READ}
    assign = _one(v, lambda n: isinstance(n, Assignment))
    assert _accesses(assign) == {"a": VariableAccessType.WRITE}


def test_dfg_if_else_statement():
    """dfg_ifElseStatement (ControlFlowGraphVisitorTest.cpp:348-379)."""
    ast = Parser.parse("{ if (c > 100) { a = 22; } else { a = 43; } }")
    v = build_cfg(ast, input_identifiers=("c", "a"))
    if_node = _one(v, lambda n: isinstance(n, If))
    assert _accesses(if_node) == {"c": VariableAccessType.READ}
    for assign in _find(v, lambda n: isinstance(n, Assignment)):
        assert _accesses(assign) == {"a": VariableAccessType.WRITE}


def test_dfg_for_loop_accumulation():
    """dfg_forLoop_accumulation (ControlFlowGraphVisitorTest.cpp:381-410):
    initializer WRITEs i; body READ_AND_WRITEs sum; update READ_AND_WRITEs
    i."""
    ast = Parser.parse(
        "{ int sum = 0; for (int i = 0; i < 100; i=i+1) { sum = sum + 1; } }")
    v = build_cfg(ast)
    init = [gn for gn in v.nodes
            if isinstance(gn.ast_node, VariableDeclaration)
            and gn.ast_node.target.identifier == "i"][0]
    assert _accesses(init) == {"i": VariableAccessType.WRITE}
    body_assign = _one(v, lambda n: isinstance(n, Assignment)
                       and n.target.identifier == "sum")
    assert _accesses(body_assign) == {"sum": VariableAccessType.READ_AND_WRITE}
    update = _one(v, lambda n: isinstance(n, Assignment)
                  and n.target.identifier == "i")
    assert _accesses(update) == {"i": VariableAccessType.READ_AND_WRITE}


def test_dfg_for_loop_local_variable_empty_update():
    """dfg_forLoop_localVariable_emptyUpdate (ControlFlowGraphVisitorTest.
    cpp:412-442): empty update; the back edge comes from the body; the body
    decl READs i and WRITEs the loop-local c."""
    ast = Parser.parse("for (int i = 0; i < 100; ) { int c = i+1; }")
    v = build_cfg(ast)
    init = [gn for gn in v.nodes
            if isinstance(gn.ast_node, VariableDeclaration)
            and gn.ast_node.target.identifier == "i"][0]
    assert _accesses(init) == {"i": VariableAccessType.WRITE}
    cond = [gn for gn in v.nodes if gn.ast_node.node_type
            not in ("Block", "For", "VariableDeclaration")][0]
    assert _accesses(cond) == {"i": VariableAccessType.READ}
    body_decl = [gn for gn in v.nodes
                 if isinstance(gn.ast_node, VariableDeclaration)
                 and gn.ast_node.target.identifier == "c"][0]
    assert _accesses(body_decl) == {"i": VariableAccessType.READ,
                                    "c": VariableAccessType.WRITE}


# --------------------------------------------- (dfg-2) graph-structure tests

def test_dfg_graph_simple_assignment():
    """dfgGraph_simpleAssignment (ControlFlowGraphVisitorTest.cpp:444-474):
    param write (Function) → assignment (reads a) → return (reads a)."""
    ast = Parser.parse("public int main(int a) { a = a + 34; return a; }")
    v = build_cfg(ast)
    fn = _one(v, lambda n: isinstance(n, Function))
    assign = _one(v, lambda n: isinstance(n, Assignment))
    ret = _one(v, lambda n: isinstance(n, Return))
    assert assign.dfg_parents == [fn]
    assert assign.dfg_children == [ret]
    assert ret.dfg_parents == [assign]
    assert ret.dfg_children == []


def test_dfg_graph_if_assignment():
    """dfgGraph_ifAssignment (ControlFlowGraphVisitorTest.cpp:487-530):
    without an else, the return's possible writers are the then-assignment
    AND the original parameter write."""
    ast = Parser.parse(
        "public int main(int a, int b) { if (a > 1) { a = b+99; } return a; }")
    v = build_cfg(ast)
    fn = _one(v, lambda n: isinstance(n, Function))
    if_node = _one(v, lambda n: isinstance(n, If))
    assign = _one(v, lambda n: isinstance(n, Assignment))
    ret = _one(v, lambda n: isinstance(n, Return))
    assert set(fn.dfg_children) == {if_node, assign, ret}
    assert if_node.dfg_parents == [fn] and if_node.dfg_children == []
    assert assign.dfg_parents == [fn]
    assert assign.dfg_children == [ret]
    assert set(ret.dfg_parents) == {fn, assign}
    assert ret.dfg_children == []


def test_dfg_graph_if_else_assignment():
    """dfgGraph_ifElseAssignment (ControlFlowGraphVisitorTest.cpp:532-578):
    with both branches writing a, the return's writers are exactly the two
    branch assignments — the parameter write is killed on every path."""
    ast = Parser.parse("""
      public int main(int a, int b) {
        if (a > 1) { a = b+99; } else { a = 42; }
        return a;
      }""")
    v = build_cfg(ast)
    fn = _one(v, lambda n: isinstance(n, Function))
    assigns = _find(v, lambda n: isinstance(n, Assignment))
    ret = _one(v, lambda n: isinstance(n, Return))
    assert set(ret.dfg_parents) == set(assigns)
    assert fn not in ret.dfg_parents
    then_assign = [g for g in assigns
                   if g.ast_node.value.node_type == "BinaryExpression"][0]
    assert then_assign.dfg_parents == [fn]     # reads b (the parameter)


def test_dfg_graph_for_loop():
    """dfgGraph_forLoop (ControlFlowGraphVisitorTest.cpp:580-654): the
    accumulation's writers include ITSELF (loop fixpoint); the condition
    reads N (function) and i (initializer + update); the return reads sum
    from the decl and the body assignment."""
    ast = Parser.parse("""
      public int main(int N) {
        int sum = 0;
        for (int i = 0; i < N; i = i + 1) { sum = sum + i; }
        return sum;
      }""")
    v = build_cfg(ast)
    fn = _one(v, lambda n: isinstance(n, Function))
    sum_decl = [g for g in v.nodes
                if isinstance(g.ast_node, VariableDeclaration)
                and g.ast_node.target.identifier == "sum"][0]
    i_decl = [g for g in v.nodes
              if isinstance(g.ast_node, VariableDeclaration)
              and g.ast_node.target.identifier == "i"][0]
    body = _one(v, lambda n: isinstance(n, Assignment)
                and n.target.identifier == "sum")
    update = _one(v, lambda n: isinstance(n, Assignment)
                  and n.target.identifier == "i")
    cond = [g for g in v.nodes if g.ast_node.node_type == "BinaryExpression"][0]
    ret = _one(v, lambda n: isinstance(n, Return))

    assert fn.dfg_parents == []
    assert fn.dfg_children == [cond]                       # N read once
    assert set(sum_decl.dfg_children) == {body, ret}
    assert set(cond.dfg_parents) == {fn, i_decl, update}
    assert cond.dfg_children == []
    assert set(body.dfg_parents) == {sum_decl, i_decl, update, body}
    assert set(body.dfg_children) == {body, ret}
    assert set(update.dfg_parents) == {i_decl, update}
    assert set(update.dfg_children) == {cond, body, update}
    assert set(ret.dfg_parents) == {sum_decl, body}
    assert ret.dfg_children == []
