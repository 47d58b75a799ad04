"""Cone-rewriting tests: multiplicative-depth reduction with semantic
equivalence checked by brute-force evaluation.

The reference documents this pass (README.md:92-104) but has no
implementation or active tests; these are authored to that spec.
"""

import itertools

from abc_tpu.parser import parse
from abc_tpu.passes.cone_rewriter import (
    ConeRewriter, multiplicative_depth, run_cone_rewriting,
)
from abc_tpu.ast_ir.nodes import Assignment


def expr_of(src: str):
    stmt = parse(src).children()[0]
    assert isinstance(stmt, Assignment)
    return stmt.value


def eval_bool(expr, env):
    """Evaluate a boolean circuit over {0,1}."""
    from abc_tpu.ast_ir.nodes import BinaryExpression, Literal, Variable
    if isinstance(expr, Literal):
        return int(expr.value) & 1
    if isinstance(expr, Variable):
        return env[expr.identifier] & 1
    if isinstance(expr, BinaryExpression):
        a, b = eval_bool(expr.left, env), eval_bool(expr.right, env)
        op = str(expr.operator)
        if op in ("&", "&&", "*", "***"):
            return a & b
        if op in ("^",):
            return a ^ b
        if op in ("+", "+++"):
            return (a + b) & 1  # mod-2 arithmetic == XOR for this check
        raise ValueError(op)
    raise TypeError(expr)


def variables_of(expr):
    from abc_tpu.ast_ir.nodes import Variable
    return sorted({n.identifier for n in expr.iter_preorder()
                   if isinstance(n, Variable)})


def assert_equivalent(e1, e2):
    names = variables_of(e1)
    assert variables_of(e2) == names
    for bits in itertools.product([0, 1], repeat=len(names)):
        env = dict(zip(names, bits))
        assert eval_bool(e1, env) == eval_bool(e2, env), env


def test_multiplicative_depth():
    assert multiplicative_depth(expr_of("v = a & b;")) == 1
    assert multiplicative_depth(expr_of("v = (a & b) & c;")) == 2
    assert multiplicative_depth(expr_of("v = (a ^ b) ^ c;")) == 0
    assert multiplicative_depth(expr_of("v = ((a & b) ^ c) & d;")) == 2


def test_basic_cone_rewrite_reduces_depth():
    # v = t & (y ^ (t' & (U1 & U2)))   — depth 3 via the critical chain
    src = "v = t & (y ^ (tp & (u1 & u2)));"
    original = expr_of(src)
    depth_before = multiplicative_depth(original)
    assert depth_before == 3

    rewritten = ConeRewriter().rewrite_expression(expr_of(src))
    depth_after = multiplicative_depth(rewritten)
    assert depth_after == 2
    assert_equivalent(original, rewritten)


def test_rewrite_preserves_semantics_arithmetic():
    # same shape with arithmetic ops: distributivity over a ring
    src = "v = t * (y + (tp * (u1 * u2)));"
    original = expr_of(src)
    rewritten = ConeRewriter().rewrite_expression(expr_of(src))
    assert multiplicative_depth(rewritten) < multiplicative_depth(original)
    # integer-semantics equivalence on random values
    import random
    from abc_tpu.ast_ir.nodes import BinaryExpression, Literal, Variable

    def eval_int(e, env):
        if isinstance(e, Literal):
            return e.value
        if isinstance(e, Variable):
            return env[e.identifier]
        a, b = eval_int(e.left, env), eval_int(e.right, env)
        return a * b if str(e.operator) in ("*", "***") else a + b

    rng = random.Random(0)
    for _ in range(20):
        env = {n: rng.randrange(-50, 50) for n in variables_of(original)}
        assert eval_int(original, env) == eval_int(rewritten, env)


def test_longer_xor_chain():
    src = "v = t & (y1 ^ y2 ^ y3 ^ (tp & (u1 & u2)));"
    original = expr_of(src)
    rewritten = ConeRewriter().rewrite_expression(expr_of(src))
    assert multiplicative_depth(rewritten) == 2 < multiplicative_depth(original)
    assert_equivalent(original, rewritten)


def test_iterates_to_fixpoint_on_nested_cones():
    # two stacked reducible cones: depth 5 → lower
    src = ("v = s & (z ^ (sp & (t & (y ^ (tp & (u1 & u2))))));")
    original = expr_of(src)
    assert multiplicative_depth(original) == 5
    cr = ConeRewriter()
    rewritten = cr.rewrite_expression(expr_of(src))
    assert multiplicative_depth(rewritten) < 5
    assert cr.rewrites_applied >= 1
    assert_equivalent(original, rewritten)


def test_irreducible_left_untouched():
    # balanced AND tree has no slack: nothing to rewrite
    src = "v = (a & b) & (c & d);"
    rewritten = ConeRewriter().rewrite_expression(expr_of(src))
    assert multiplicative_depth(rewritten) == 2


def test_no_slack_not_rewritten():
    # t is itself deep: the reducibility condition fails
    src = "v = (q1 & q2) & (y ^ (tp & (u1 & u2)));"
    original = expr_of(src)
    rewritten = ConeRewriter().rewrite_expression(expr_of(src))
    assert multiplicative_depth(rewritten) == multiplicative_depth(original)


def test_run_on_whole_program():
    ast = parse("""
      secret int v = 0;
      v = t & (y ^ (tp & (u1 & u2)));
      return v;
    """)
    cr = run_cone_rewriting(ast)
    assert cr.rewrites_applied == 1
    stmt_value = ast.children()[1].value
    assert multiplicative_depth(stmt_value) == 2


def test_depth_reduction_lowers_noise_on_bfv():
    """The point of the pass: shallower circuits decrypt with more noise
    budget left."""
    from abc_tpu.crypto.bfv import BfvContext
    from abc_tpu.crypto.numthy import gen_ntt_primes
    from abc_tpu.crypto.params import BfvParams

    # 4 data limbs (q = 120 bits): the depth-3 circuit must still decrypt
    n = 1024
    t = gen_ntt_primes(14, 1, n)[0]
    primes = gen_ntt_primes(30, 5, n, exclude=[t])
    ctx = BfvContext(BfvParams(n=n, coeff_modulus=primes, plain_modulus=t,
                               seed=3))
    vals = {"t": 1, "y": 0, "tp": 1, "u1": 1, "u2": 1}
    cts = {k: ctx.encrypt(ctx.encode([v])) for k, v in vals.items()}

    def he_eval(e):
        from abc_tpu.ast_ir.nodes import BinaryExpression, Variable
        if isinstance(e, Variable):
            return cts[e.identifier]
        a, b = he_eval(e.left), he_eval(e.right)
        if str(e.operator) in ("&", "*", "***"):
            return ctx.multiply(a, b)
        return ctx.add(a, b)

    src = "v = t & (y + (tp & (u1 & u2)));"
    deep = he_eval(expr_of(src))
    shallow = he_eval(ConeRewriter().rewrite_expression(expr_of(src)))
    assert ctx.decode(ctx.decrypt(deep))[0] == ctx.decode(ctx.decrypt(shallow))[0] == 1
    assert ctx.noise_budget(shallow) > ctx.noise_budget(deep)


# --------------------------------------------------------------- rebalancing

def test_rebalance_mul_chain_depth():
    from abc_tpu.passes.cone_rewriter import rebalance_depth
    src = ("v = ((((((((x1 *** x2) *** x3) *** x4) *** x5) *** x6) *** x7)"
           " *** x8) *** x9);")
    original = expr_of(src)
    balanced = rebalance_depth(expr_of(src))
    assert multiplicative_depth(original) == 8
    assert multiplicative_depth(balanced) == 4  # ceil(log2(9))
    assert_equivalent(original, balanced)


def test_rebalance_respects_unbalanced_operand_depths():
    """Huffman pairing: deep operands should combine LAST."""
    from abc_tpu.passes.cone_rewriter import rebalance_depth
    # (a*b*c*d) already depth 2 when balanced; chain with 4 leaves x1..x4:
    # optimal is pairing leaves together first -> total depth 3
    src = "v = (((x1 *** ((a *** b) *** (c *** d))) *** x2) *** x3);"
    original = expr_of(src)
    balanced = rebalance_depth(expr_of(src))
    assert multiplicative_depth(balanced) == 3
    assert multiplicative_depth(balanced) < multiplicative_depth(original)
    assert_equivalent(original, balanced)


def test_rebalance_preserves_add_structure():
    from abc_tpu.passes.cone_rewriter import rebalance_depth
    src = "v = (x1 *** x2) +++ ((x3 *** x4) *** (x5 *** x6));"
    original = expr_of(src)
    balanced = rebalance_depth(expr_of(src))
    assert_equivalent(original, balanced)
    assert multiplicative_depth(balanced) == multiplicative_depth(original)


def test_run_cone_rewriting_with_rebalance_on_program():
    src = ("r = t *** (y +++ (t2 *** (y2 +++ (((((x1 *** x2) *** x3)"
           " *** x4) *** x5) *** x6))));")
    ast1 = parse(src)
    ast2 = parse(src)
    run_cone_rewriting(ast2)
    e1, e2 = expr_of(src), ast2.children()[0].value
    before = multiplicative_depth(ast1.children()[0].value)
    after = multiplicative_depth(e2)
    assert after < before
    assert_equivalent(ast1.children()[0].value, e2)
