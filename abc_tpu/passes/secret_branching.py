"""Secret-branch circuit lowering: rewrite If statements over secret
conditions into mux arithmetic using the FHE operators.

Reference: src/visitor/SecretBranchingVisitor.cpp (full file). The rewrite
(createDependentAssignment, :34-67):
    if (c) { x = t; } else { x = e; }   ⇒   x = c *** t +++ (1 --- c) *** e
with the one-sided variants c***t (new variable, then-only) and (1---c)***e
(changed only in else). Bails out (leaves the If untouched) when a branch
body contains an unsupported statement — For or Return (:179-182, 213-216).
Statement replacement happens in the Block visit via null-slot + insert
(:184-211).

The lowered program is circuit-compatible: the condition must itself evaluate
to a 0/1 ciphertext (comparisons over encrypted data are not FHE-evaluable
without binary circuits).
"""

from __future__ import annotations

from typing import Dict, List, Optional

from abc_tpu.ast_ir.nodes import (
    AbstractExpression, Assignment, BinaryExpression, Block, For, Function,
    FunctionParameter, If, LiteralInt, Return, TernaryOperator, Variable,
    VariableDeclaration,
)
from abc_tpu.passes.visitor import ScopedVisitor
from abc_tpu.utils.operators import Op, Operator
from abc_tpu.utils.scope import ScopedIdentifier
from abc_tpu.utils.errors import CompilerError

# ScopedIdentifier → value expression (None = declared but value unknown)
VariableValueMap = Dict[ScopedIdentifier, Optional[AbstractExpression]]


def create_dependent_assignment(target_id: str,
                                condition: AbstractExpression,
                                true_value: Optional[AbstractExpression],
                                false_value: Optional[AbstractExpression]
                                ) -> Assignment:
    """x = c***true +++ (1---c)***false (ref: SecretBranchingVisitor.cpp:34-67)."""
    cond_then = condition.clone()
    cond_else = BinaryExpression(LiteralInt(1), Operator(Op.FHE_SUB),
                                 condition.clone())
    if true_value is not None:
        clause_true = BinaryExpression(cond_then, Operator(Op.FHE_MUL), true_value)
        if false_value is not None:
            clause_false = BinaryExpression(cond_else, Operator(Op.FHE_MUL),
                                            false_value)
            return Assignment(Variable(target_id),
                              BinaryExpression(clause_true, Operator(Op.FHE_ADD),
                                               clause_false))
        return Assignment(Variable(target_id), clause_true)
    if false_value is not None:
        return Assignment(Variable(target_id),
                          BinaryExpression(cond_else, Operator(Op.FHE_MUL),
                                           false_value))
    raise CompilerError("dependent assignment needs a true or false value")


class SecretBranchingVisitor(ScopedVisitor):
    """Removes If statements over secret conditions (ref:
    SpecialSecretBranchingVisitor)."""

    def __init__(self, secret_tainted_map: Dict[str, bool]):
        super().__init__()
        self.tainted = secret_tainted_map
        self.expression_values: VariableValueMap = {}
        self._unsupported_seen = False
        self._delete_current = False
        self._replacements: List[Assignment] = []

    # --- secret ternary lowering -----------------------------------------------
    def _lower_ternaries(self, expr: Optional[AbstractExpression]
                         ) -> Optional[AbstractExpression]:
        """c ? a : b with a SECRET condition ⇒ c***a +++ (1---c)***b — the
        expression-level analogue of the If rewrite. The reference's two
        ternary cases are GTEST_SKIP'd pending this
        (SecretBranchingVisitorTest.cpp:359-430); lowered here for real,
        post-order so nested ternaries compose. Plain-condition ternaries
        stay for the runtime to branch on."""
        if expr is None:
            return None
        for child in list(expr.children()):
            if isinstance(child, AbstractExpression):
                lowered = self._lower_ternaries(child)
                if lowered is not child:
                    expr.replace_child(child, lowered)
        if isinstance(expr, TernaryOperator) and \
                self.tainted.get(expr.condition.unique_node_id):
            cond = expr.condition
            clause_true = BinaryExpression(cond.clone(), Operator(Op.FHE_MUL),
                                           expr.then_expr.clone())
            clause_false = BinaryExpression(
                BinaryExpression(LiteralInt(1), Operator(Op.FHE_SUB),
                                 cond.clone()),
                Operator(Op.FHE_MUL), expr.else_expr.clone())
            return BinaryExpression(clause_true, Operator(Op.FHE_ADD),
                                    clause_false)
        return expr

    # --- value tracking -------------------------------------------------------
    def visit_Assignment(self, node: Assignment) -> None:
        node.value = self._lower_ternaries(node.value)
        # only plain-variable targets are tracked (ref: :228-236)
        if isinstance(node.target, Variable):
            sid = self.current_scope.resolve_identifier(node.target.identifier)
            self.expression_values[sid] = node.value

    def visit_VariableDeclaration(self, node: VariableDeclaration) -> None:
        if node.value is not None:
            node.value = self._lower_ternaries(node.value)
        sid = self.declare(node.target.identifier)
        self.expression_values[sid] = node.value  # None if uninitialized

    def visit_FunctionParameter(self, node: FunctionParameter) -> None:
        sid = self.declare(node.identifier)
        self.expression_values[sid] = None

    # --- unsupported branch bodies -------------------------------------------
    def visit_For(self, node: For) -> None:
        self._unsupported_seen = True
        super().visit_For(node)

    def visit_Return(self, node: Return) -> None:
        if node.value is not None:
            node.value = self._lower_ternaries(node.value)
        self._unsupported_seen = True

    # --- the rewrite ------------------------------------------------------------
    @staticmethod
    def _changed_variables(base: VariableValueMap, changed: VariableValueMap
                           ) -> VariableValueMap:
        # "changed" = new identifier or different value expression (object
        # identity, ref: :18-31)
        return {sid: expr for sid, expr in changed.items()
                if sid not in base or expr is not base[sid]}

    def visit_If(self, node: If) -> None:
        self._unsupported_seen = False

        values_before = dict(self.expression_values)
        node.condition.accept(self)
        node.then_branch.accept(self)
        values_after_then = dict(self.expression_values)
        values_after_else: VariableValueMap = {}
        if node.else_branch is not None:
            self.expression_values = dict(values_before)
            node.else_branch.accept(self)
            values_after_else = dict(self.expression_values)

        cond_id = node.condition.unique_node_id
        if cond_id not in self.tainted:
            raise CompilerError(
                f"no secret-tainting information for condition node {cond_id}")
        if not self.tainted[cond_id] or self._unsupported_seen:
            return  # plain condition or unsupported body: leave untouched

        self._delete_current = True
        cond = node.condition

        if node.else_branch is None:
            changed = self._changed_variables(values_before, values_after_then)
            for sid, expr in changed.items():
                if sid in values_before:
                    # oldValue: prior expression, or self-reference if the
                    # variable was declared without a value (ref: :115-123)
                    old = values_before[sid]
                    old_expr = old.clone() if old is not None else Variable(sid.identifier)
                    assignment = create_dependent_assignment(
                        sid.identifier, cond, expr.clone(), old_expr)
                else:
                    # declared inside the then branch only
                    assignment = create_dependent_assignment(
                        sid.identifier, cond, expr.clone(), None)
                self.expression_values[sid] = assignment.value
                self._replacements.append(assignment)
        else:
            then_modified = self._changed_variables(values_before, values_after_then)
            else_modified = self._changed_variables(values_before, values_after_else)
            for sid, expr in then_modified.items():
                if sid in else_modified:
                    assignment = create_dependent_assignment(
                        sid.identifier, cond, expr.clone(),
                        else_modified.pop(sid).clone())
                else:
                    assignment = create_dependent_assignment(
                        sid.identifier, cond, expr.clone(), None)
                self.expression_values[sid] = assignment.value
                self._replacements.append(assignment)
            for sid, expr in else_modified.items():
                assignment = create_dependent_assignment(
                    sid.identifier, cond, None, expr.clone())
                self.expression_values[sid] = assignment.value
                self._replacements.append(assignment)

    def visit_Block(self, node: Block) -> None:
        # no scope entry: mirrors the reference's flat resolution so branch
        # variables compare equal across then/else (ref Block visit :184-211)
        insertion_pos = None
        for i, stmt in enumerate(node.statements):
            if stmt is None:
                continue
            stmt.accept(self)
            if self._delete_current:
                self._delete_current = False
                node.statements[i] = None
                insertion_pos = i
        if insertion_pos is not None:
            for offset, repl in enumerate(self._replacements):
                node.statements.insert(insertion_pos + offset, repl)
                repl.parent = node
            self._replacements.clear()
        node.remove_null_statements()


def run_secret_branching(ast, tainted_map, input_identifiers=()):
    """Convenience driver mirroring the e2e test harness usage; program
    inputs (declared in the separate input AST) are pre-registered in the
    root scope with unknown values, like FunctionParameters."""
    from abc_tpu.utils.scope import Scope

    sbv = SecretBranchingVisitor(tainted_map)
    root = Scope(ast)
    for name in input_identifiers:
        sid = root.add_identifier(name)
        sbv.expression_values[sid] = None
    sbv.set_root_scope(root)
    ast.accept(sbv)
    return sbv
