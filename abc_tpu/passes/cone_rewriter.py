"""Cone rewriting: multiplicative-depth reduction (Aubry et al.).

Reference: README.md:92-104 — the reference DOCUMENTS this pass (Alg. 1 cone
construction, Alg. 2 C^AND circuit, Alg. 3 flow-based minimum cone selection,
Alg. 4 rewrite) but ships no implementation; the only trace is commented-out
legacy fixtures (test/AstTestingGenerator.cpp:921-986). This module is
authored to that spec.

Multiplicative depth l(v): AND/MUL gates add 1, XOR/ADD gates are free.
The local rewrite is pure ring distributivity + associativity, so it is valid
for boolean circuits (∧ = &, ⊕ = ^) AND arithmetic ones (*, +):

    v = t * (y_1 + … + y_r + u)   with critical  u = t' * U'
      ⇒
    v' = U' * (t' * t)  +  t * (y_1 + … + y_r)

which reduces l(v) = l(U') + 2 down to l(U') + 1 whenever the shallow
operands have ≥2 levels of slack:
    l(t), l(t') ≤ l(v) − 3   and   l(y_i) ≤ l(v) − 2.

Deviation from the paper (documented, like the reference's own deviation
note): cones are selected GREEDILY on the critical path and iterated to a
fixpoint instead of via the max-flow minimum-cone set (Alg. 3); the flow
optimization only reduces the number of added gates, not the final depth.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from abc_tpu.ast_ir.nodes import (
    AbstractExpression, AbstractNode, Assignment, BinaryExpression, Block,
    Return, VariableDeclaration,
)
from abc_tpu.utils.operators import Op, Operator

# gate families: ring-distributive (mul over add) pairs
MUL_OPS = {Op.MUL, Op.FHE_MUL, Op.BITWISE_AND, Op.LOGICAL_AND}
ADD_OPS = {Op.ADD, Op.FHE_ADD, Op.BITWISE_XOR}


def _is_mul(n: AbstractNode) -> bool:
    return isinstance(n, BinaryExpression) and n.operator.op in MUL_OPS


def _is_add(n: AbstractNode) -> bool:
    return isinstance(n, BinaryExpression) and n.operator.op in ADD_OPS


def multiplicative_depth(expr: AbstractExpression,
                         memo: Optional[Dict[int, int]] = None) -> int:
    """l(v): number of mul gates on the deepest path to any leaf."""
    if memo is None:
        memo = {}
    key = id(expr)
    if key in memo:
        return memo[key]
    if isinstance(expr, BinaryExpression):
        child = max(multiplicative_depth(expr.left, memo),
                    multiplicative_depth(expr.right, memo))
        depth = child + (1 if expr.operator.op in MUL_OPS else 0)
    else:
        depth = max((multiplicative_depth(c, memo) for c in expr.children()
                     if isinstance(c, AbstractExpression)), default=0)
    memo[key] = depth
    return depth


def _flatten_add_chain(expr: AbstractExpression) -> Optional[List[AbstractExpression]]:
    """Flatten nested same-family additions into an operand list."""
    if not _is_add(expr):
        return None
    out: List[AbstractExpression] = []

    def walk(e: AbstractExpression) -> None:
        if _is_add(e):
            walk(e.left)
            walk(e.right)
        else:
            out.append(e)

    walk(expr)
    return out


def _rebuild_add(operands: List[AbstractExpression], op: Operator
                 ) -> AbstractExpression:
    expr = operands[0]
    for o in operands[1:]:
        expr = BinaryExpression(expr, op, o)
    return expr


def rebalance_depth(expr: AbstractExpression) -> AbstractExpression:
    """Associative rebalancing of multiplication chains — the complementary
    depth reduction to cone rewriting: a left-leaning product chain
    x1·x2·…·xk (depth k−1, what a recursive-descent parser emits) becomes a
    depth-optimal tree via Huffman combination on operand depth (always pair
    the two shallowest operands: max(d1,d2)+1 is the minimal achievable
    combine). Pure associativity — exact for ring AND boolean semantics.

    Recurses through BinaryExpression trees only; chains hidden under other
    node types (calls, ternaries) are left as-is. Returns a NEW expression
    (operands cloned), like ConeRewriter's local rewrites."""
    import heapq
    if not isinstance(expr, BinaryExpression):
        return expr
    if expr.operator.op not in MUL_OPS:
        return BinaryExpression(rebalance_depth(expr.left).clone(),
                                expr.operator,
                                rebalance_depth(expr.right).clone())
    op_enum = expr.operator.op
    mul_op = expr.operator
    operands: List[AbstractExpression] = []

    def collect(x: AbstractExpression) -> None:
        if isinstance(x, BinaryExpression) and x.operator.op == op_enum:
            collect(x.left)
            collect(x.right)
        else:
            operands.append(rebalance_depth(x).clone())

    collect(expr)
    heap = [(multiplicative_depth(o), i, o) for i, o in enumerate(operands)]
    heapq.heapify(heap)
    seq = len(operands)
    while len(heap) > 1:
        d1, _, a = heapq.heappop(heap)
        d2, _, b = heapq.heappop(heap)
        heapq.heappush(heap, (max(d1, d2) + 1, seq,
                              BinaryExpression(a, mul_op, b)))
        seq += 1
    return heap[0][2]


class ConeRewriter:
    """Greedy critical-path cone rewriting to a fixpoint."""

    def __init__(self, max_rounds: int = 64):
        self.max_rounds = max_rounds
        self.rewrites_applied = 0

    # --- single local rewrite ---------------------------------------------------
    def _try_rewrite_node(self, v: BinaryExpression, memo: Dict[int, int]
                          ) -> Optional[AbstractExpression]:
        """Attempt the cone rewrite at mul gate v; returns the replacement
        expression or None."""
        if not _is_mul(v):
            return None
        l_v = multiplicative_depth(v, memo)

        for t, chain_side in ((v.left, v.right), (v.right, v.left)):
            operands = _flatten_add_chain(chain_side)
            if operands is None or len(operands) < 2:
                continue
            add_op = chain_side.operator
            mul_op = v.operator
            # find the unique critical operand u (an AND/MUL gate at l_v - 1)
            crit = [o for o in operands
                    if multiplicative_depth(o, memo) == l_v - 1]
            if len(crit) != 1 or not _is_mul(crit[0]):
                continue
            u = crit[0]
            ys = [o for o in operands if o is not u]
            if any(multiplicative_depth(y, memo) > l_v - 2 for y in ys):
                continue
            if multiplicative_depth(t, memo) > l_v - 3:
                continue
            # split u = t' * U' with U' the critical side
            l_u = l_v - 1
            for t_p, u_core in ((u.left, u.right), (u.right, u.left)):
                if multiplicative_depth(u_core, memo) != l_u - 1:
                    continue
                if multiplicative_depth(t_p, memo) > l_v - 3:
                    continue
                # v' = U'*(t'*t) + t*(y_1+...+y_r)
                tt = BinaryExpression(t_p.clone(), mul_op, t.clone())
                left = BinaryExpression(u_core.clone(), mul_op, tt)
                y_chain = _rebuild_add([y.clone() for y in ys], add_op)
                right = BinaryExpression(t.clone(), mul_op, y_chain)
                return BinaryExpression(left, add_op, right)
        return None

    # --- circuit-level driver -----------------------------------------------------
    def rewrite_expression(self, expr: AbstractExpression) -> AbstractExpression:
        """Reduce the multiplicative depth of one expression to a fixpoint."""
        root = expr
        for _ in range(self.max_rounds):
            memo: Dict[int, int] = {}
            l_max = multiplicative_depth(root, memo)
            if l_max < 3:
                break  # depth < 3 cannot be reduced by this rewrite
            # find critical mul gates (on a deepest path), deepest-first
            candidates = [n for n in root.iter_preorder()
                          if _is_mul(n) and multiplicative_depth(n, memo) >= 3]
            candidates.sort(key=lambda n: -multiplicative_depth(n, memo))
            replaced = False
            for v in candidates:
                replacement = self._try_rewrite_node(v, memo)
                if replacement is None:
                    continue
                if v is root:
                    root = replacement
                else:
                    v.parent.replace_child(v, replacement)
                self.rewrites_applied += 1
                replaced = True
                break
            if not replaced:
                break
        return root

    def rewrite_ast(self, ast: Block, rebalance: bool = True) -> None:
        """Rewrite every statement expression in a program. With rebalance
        (default), associative mul chains are depth-balanced first — the
        cone rewrite then only fires where slack genuinely exists."""
        def process(expr: AbstractExpression) -> AbstractExpression:
            if rebalance:
                expr = rebalance_depth(expr)
            return self.rewrite_expression(expr)

        for stmt in ast.iter_preorder():
            if isinstance(stmt, Assignment):
                stmt.value = process(stmt.value)
            elif isinstance(stmt, VariableDeclaration) and stmt.value is not None:
                stmt.value = process(stmt.value)
            elif isinstance(stmt, Return) and stmt.value is not None:
                stmt.value = process(stmt.value)


def run_cone_rewriting(ast: Block, max_rounds: int = 64,
                       rebalance: bool = True) -> ConeRewriter:
    cr = ConeRewriter(max_rounds)
    cr.rewrite_ast(ast, rebalance=rebalance)
    return cr
