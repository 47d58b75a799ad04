"""Regressions for the round-4 advisor findings (ADVICE.md): secret-branch
lowering soundness under MIXED plain/secret nesting, branch-declared
initializer substitution, datatype propagation on re-emitted declarations,
and jx32 checkpoint device-key refresh.

The lowering cases run end-to-end (compile → dummy-backend execute →
decrypt) against a Python oracle, the same harness as the pipeline fuzz.
"""

import numpy as np

from abc_tpu.ast_ir import compare_ast, dumps, loads
from abc_tpu.ast_ir.nodes import VariableDeclaration
from abc_tpu.parser import Parser
from abc_tpu.passes.pipeline import (
    CompileOptions, Compiler, input_types_from_ast,
)
from abc_tpu.passes.secret_branching import run_secret_branching
from abc_tpu.passes.type_checking import run_type_checking
from abc_tpu.runtime.dummy import DummyCiphertextFactory
from abc_tpu.runtime.executor import RuntimeVisitor
from abc_tpu.runtime.values import AbstractCiphertext
from abc_tpu.utils.datatype import Type

OPTS = CompileOptions(ctes=False, loop_unrolling=False, vectorize=False,
                      cone_rewriting=False, dead_store_elimination=False)


def _run(inputs_src, program_src, out_var="r"):
    input_ast = Parser.parse(inputs_src)
    output_ast = Parser.parse(f"out = {out_var};")
    compiled = Compiler(OPTS).compile_source(
        program_src, input_types_from_ast(input_ast))
    factory = DummyCiphertextFactory(slots=8)
    rv = RuntimeVisitor(factory, input_ast, compiled.secret_tainted)
    rv.execute_ast(compiled.ast)
    ((_, value),) = rv.get_output(output_ast)
    if isinstance(value, AbstractCiphertext):
        return factory.decrypt(value)[0]
    return list(value.values)[0]


# ---- ADVICE high #1: secret-if nested inside a KEPT plain if must not
# treat pre-recorded values as symbolic (their statements still execute)

def test_secret_if_inside_kept_plain_if_taken():
    got = _run("secret int s0 = 1; secret int s1 = 5; int k = 7;",
               "secret int r = 1;"
               "if (k > 3) { r = r + 1; if (s0 > s1) { r = 50; } }"
               "return r;")
    assert got == 2  # r+1 executes; inner mux keeps r (s0>s1 false)


def test_secret_if_inside_kept_plain_if_secret_taken():
    got = _run("secret int s0 = 9; secret int s1 = 5; int k = 7;",
               "secret int r = 1;"
               "if (k > 3) { r = r + 1; if (s0 > s1) { r = 50; } }"
               "return r;")
    assert got == 50


def test_secret_if_inside_untaken_plain_if():
    got = _run("secret int s0 = 9; secret int s1 = 5; int k = 1;",
               "secret int r = 1;"
               "if (k > 3) { r = r + 1; if (s0 > s1) { r = 50; } }"
               "return r;")
    assert got == 1  # plain if untaken entirely


# ---- ADVICE high #2: branch-declared initializers must substitute values
# already mutated in the same branch

def test_branch_declared_initializer_reads_mutated_variable():
    got = _run("secret int s0 = 1; secret int s1 = 5;",
               "secret int r = 1; secret int w = 0;"
               "if (s1 > s0) { r = r + 1; secret int t = r; w = t; }"
               "return w;", out_var="w")
    assert got == 2  # t captures the POST-increment r


def test_branch_declared_initializer_untaken():
    got = _run("secret int s0 = 7; secret int s1 = 5;",
               "secret int r = 1; secret int w = 0;"
               "if (s1 > s0) { r = r + 1; secret int t = r; w = t; }"
               "return w;", out_var="w")
    assert got == 0


# ---- ADVICE medium #3: a kept (plain-condition) If nested inside a
# secret-candidate branch makes the outer branch unsupported — the outer
# If must stay in the program untouched (no crash, no silent drop)

def _assert_unchanged(src: str):
    ast = Parser.parse(src)
    original = loads(dumps(ast))
    tcv = run_type_checking(ast)
    run_secret_branching(ast, tcv.get_secret_tainted_nodes())
    assert compare_ast(ast, original), f"unexpected rewrite:\n{ast}"


def test_plain_if_inside_secret_branch_bails():
    _assert_unchanged("""
      public int main(secret int s0, secret int s1, int k) {
        int r = 0;
        if (s1 > s0) { if (k > 3) { r = 9; } }
        return r;
      }""")


def test_for_then_plain_if_inside_secret_branch_bails():
    # the old flag-reset path lost the For's unsupported marker when a
    # nested If followed it
    _assert_unchanged("""
      public int main(secret int s0, secret int s1, int k) {
        int r = 0;
        if (s1 > s0) {
          for (int i = 0; i < 2; i = i + 1) { r = r + 1; }
          if (k > 3) { r = r + 1; }
        }
        return r;
      }""")


def test_nested_secret_if_still_rewrites():
    # pure secret-in-secret nesting keeps folding (the supported case)
    got = _run("secret int s0 = 1; secret int s1 = 5;",
               "secret int r = 1;"
               "if (s1 > s0) { r = r + 1; if (s0 > 0) { r = r * 3; } }"
               "return r;")
    assert got == 6


# ---- ADVICE low #5: re-emitted declarations keep the source base type

def test_branch_declared_double_keeps_base_type():
    src = """
      public double main(secret double a, secret double b) {
        double r = 0.0;
        if (a > b) { secret double t = a; r = t; }
        return r;
      }"""
    ast = Parser.parse(src)
    tcv = run_type_checking(ast)
    run_secret_branching(ast, tcv.get_secret_tainted_nodes())
    decls = {n.target.identifier: n for n in ast.iter_preorder()
             if isinstance(n, VariableDeclaration)}
    assert "t" in decls
    assert decls["t"].datatype.type == Type.DOUBLE
    assert decls["t"].datatype.secret


# ---- ADVICE medium #4: jx32 checkpoint restore must refresh device keys

def test_jx32_seed_none_checkpoint_round_trip(tmp_path):
    from abc_tpu.crypto.bfv import BfvContext
    from abc_tpu.crypto.params import BfvParams
    from abc_tpu.utils.checkpoint import load_context, save_context

    # seed=None: the loader's fresh constructor keygen draws DIFFERENT
    # random keys, so stale device copies are guaranteed to mismatch
    ctx = BfvContext(BfvParams.create(1024, engine="jx32", seed=None))
    ct = ctx.encrypt(ctx.encode([4, 5, 6]))
    p = str(tmp_path / "ctx.npz")
    save_context(ctx, p, seeded=True)
    back = load_context(p)
    # decrypt reads the device secret copy on jx32 — must be the restored one
    assert back.decode(back.decrypt(ct))[:3] == [4, 5, 6]
    # encrypt reads the device public-key copies — fresh ct must round-trip
    ct2 = back.encrypt(back.encode([7, 8]))
    assert ctx.decode(ctx.decrypt(ct2))[:2] == [7, 8]
    # device-built switching keys must target the restored secret
    prod = back.multiply(ct, ct2)
    assert back.decode(back.decrypt(prod))[:2] == [28, 40]


def test_jx32_seed_none_ckks_checkpoint_round_trip(tmp_path):
    from abc_tpu.crypto.ckks import CkksContext, CkksParams
    from abc_tpu.utils.checkpoint import (
        load_ckks_context, save_ckks_context,
    )

    ctx = CkksContext(CkksParams.create(512, levels=2, engine="jx32",
                                        seed=None))
    vals = [1.5, -2.25, 3.0]
    ct = ctx.encrypt(ctx.encode(vals))
    p = str(tmp_path / "ckks.npz")
    save_ckks_context(ctx, p, seeded=True)
    back = load_ckks_context(p)
    got = back.decode(back.decrypt(ct)).real
    assert np.allclose(got[:3], vals, atol=1e-3)
