"""RuntimeVisitor op/error matrix — port of the reference's full
RuntimeVisitorTest.cpp (677 LoC), case for case with the reference's exact
input/expected vectors. The reference runs on SealCiphertextFactory(4096);
here the BFV backend at n=1024 (np64 engine) — slot semantics, last-element
expansion, and the op matrix are parameter-independent.

Each test cites its source case (test/runtime/RuntimeVisitorTest.cpp:line).
"""

import pytest

from helpers import assert_result, run_program
from abc_tpu.runtime.bfv_backend import BfvCiphertextFactory
from abc_tpu.runtime.values import Cleartext
from abc_tpu.utils.datatype import Type
from abc_tpu.utils.errors import RuntimeExecutionError


@pytest.fixture(scope="module")
def factory():
    return BfvCiphertextFactory(slots=1024, engine="np64", seed=1)


IN0 = "{43, 1, 1, 1, 22, 11, 425, 0, 1, 7}"


def test_rotate_negative(factory):
    """testRotateNegative (RuntimeVisitorTest.cpp:67-107): rotate(ct, -4)
    shifts right; the tail beyond the logical input shows the last-element
    expansion (7s wrap in)."""
    rv, out = run_program(f"secret int __input0__ = {IN0};",
                          "__input0__ = rotate(__input0__, -4);",
                          "y = __input0__;", factory)
    assert_result(factory, out, {
        "y": [7, 7, 7, 7, 43, 1, 1, 1, 22, 11, 425, 0, 1, 7]})


def test_rotate_positive(factory):
    """testRotatePositive (RuntimeVisitorTest.cpp:509-547): rotate(ct, 6)
    shifts left; expansion fills with the repeated last element."""
    rv, out = run_program(f"secret int __input0__ = {IN0};",
                          "__input0__ = rotate(__input0__, 6);",
                          "y = __input0__;", factory)
    assert_result(factory, out, {"y": [425, 0, 1, 7, 7, 7, 7, 7, 7]})


def test_simple_binary_expression(factory):
    """testSimpleBinaryExpression (RuntimeVisitorTest.cpp:109-145):
    plain-only arithmetic stays cleartext."""
    rv, out = run_program(
        f"secret int __input0__ = {IN0};"
        " int __input1__ = {43, 1, 1, 1, 22, 11, 425, 0, 1, 0};",
        "int sum = 10+25; return sum;", "y = sum;", factory)
    assert_result(factory, out, {"y": [35]})


def test_cleartext_all_equal():
    """testCleartext (RuntimeVisitorTest.cpp:147-159): allEqual."""
    a = Cleartext([2, 3, 4, 1, 1], Type.INT)
    assert not a.all_equal(1) and not a.all_equal(2)
    assert not a.all_equal(3) and not a.all_equal(4)
    assert Cleartext([1], Type.INT).all_equal(1)
    assert Cleartext([2, 2, 2, 2], Type.INT).all_equal(2)


def test_indexed_plaintext_assignment(factory):
    """testIndexedPlaintextAssignment (RuntimeVisitorTest.cpp:161-193)."""
    rv, out = run_program(
        "", "int sum = {1, 2, 3, 4, 5, 6, 7, 8, 9, 10}; sum[3] = 333;"
        " return sum;", "y = sum;", factory)
    assert_result(factory, out, {"y": [1, 2, 3, 333, 5, 6, 7, 8, 9, 10]})


def test_indexed_ciphertext_assignment(factory):
    """testIndexedCiphertextAssignment (RuntimeVisitorTest.cpp:195-222):
    the REFERENCE throws here (secret IndexAccess unimplemented, its
    LaplaceSharpening TODO). This framework implements it (masked slot
    write, tests/test_secret_index.py) — documented deviation: the spec's
    intended semantics instead of its error."""
    rv, out = run_program(
        "", "secret int sum = {1, 2, 3, 4, 5, 6, 7, 8, 9, 10};"
        " sum[3] = 333; return sum;", "y = sum;", factory)
    assert_result(factory, out, {"y": [1, 2, 3, 333, 5, 6, 7, 8, 9, 10]})


def test_binary_expression_ctxt_ctxt(factory):
    """testBinaryExpressionCtxtCtxt (RuntimeVisitorTest.cpp:224-262)."""
    rv, out = run_program(
        f"secret int __input0__ = {IN0};"
        " secret int __input1__ = {24, 34, 222, 4, 1, 4, 9, 22, 1, 3};",
        "secret int result = __input0__ *** __input1__; return result;",
        "y = result;", factory)
    assert_result(factory, out, {
        "y": [1032, 34, 222, 4, 22, 44, 3825, 0, 1, 21]})


def test_binary_expression_ctxt_plaintext(factory):
    """testBinaryExpressionCtxtPlaintext (RuntimeVisitorTest.cpp:264-302):
    ct *** plain scalar broadcasts; output AST index access decodes
    result[3] as a rotation."""
    rv, out = run_program(
        "secret int __input0__ = {43, 1, 1, 22, 11, 7};",
        "int i = 19; secret int result = __input0__ *** i; return result;",
        "y = result; x = result[3];", factory)
    assert len(out) == 2
    assert factory.decrypt(out[0][1])[:6] == [817, 19, 19, 418, 209, 133]
    assert factory.decrypt(out[1][1])[0] == 418


def test_binary_expression_plaintext_ctxt(factory):
    """testBinaryExpressionPlaintextCtxt (RuntimeVisitorTest.cpp:304-342):
    the commuted order gives the identical result."""
    rv, out = run_program(
        "secret int __input0__ = {43, 1, 1, 22, 11, 7};",
        "int i = 19; secret int result = i *** __input0__; return result;",
        "y = result; x = result[3];", factory)
    assert factory.decrypt(out[0][1])[:6] == [817, 19, 19, 418, 209, 133]
    assert factory.decrypt(out[1][1])[0] == 418


def test_binary_expression_plaintext_plaintext(factory):
    """testBinaryExpressionPlaintextPlaintext (RuntimeVisitorTest.cpp:
    344-381): elementwise relational on plain vectors gives a 0/1 vector."""
    rv, out = run_program(
        "int __input0__ = {4, 4, 4, 4, 4, 4, 4, 4, 4, 4};"
        " int __input1__ = {1, 2, 3, 4, 5, 4, 2, 1, 111, 0};",
        "int result = __input1__ > __input0__; return result;",
        "y = result;", factory)
    assert_result(factory, out, {"y": [0, 0, 0, 0, 1, 0, 0, 0, 1, 0]})


def test_binary_expression_unsupported_fhe(factory):
    """testBinaryExpressionUnsupportedFhe (RuntimeVisitorTest.cpp:383-410):
    division on ciphertexts must raise."""
    with pytest.raises(RuntimeExecutionError):
        run_program("", "secret int sum = {1, 2, 3, 4, 5, 6, 7, 8, 9, 10};"
                    " secret int result = sum / sum; return sum;",
                    "y = sum;", factory)


def test_unary_expression_plaintext(factory):
    """testUnaryExpressionPlaintext (RuntimeVisitorTest.cpp:412-447):
    logical NOT on a plain bool vector."""
    rv, out = run_program(
        "bool __input0__ = {0, 0, 1, 1, 0, 0, 0, 0, 1, 1};",
        "int result = !__input0__; return result;", "y = result;", factory)
    assert_result(factory, out, {"y": [1, 1, 0, 0, 1, 1, 1, 1, 0, 0]})


def test_unary_expression_unsupported_fhe(factory):
    """testUnaryExpressionUnsupportedFhe (RuntimeVisitorTest.cpp:449-479):
    logical NOT on a ciphertext must raise."""
    with pytest.raises(RuntimeExecutionError):
        run_program("secret bool __input0__ = {0, 0, 1, 1, 0, 0, 0, 0, 1, 1};",
                    "secret int result = !__input0__; return result;",
                    "y = result;", factory)


def test_unsupported_function(factory):
    """testUnsupportedFunction (RuntimeVisitorTest.cpp:481-507): Function
    nodes are not executable by the runtime visitor."""
    with pytest.raises(RuntimeExecutionError):
        run_program("", "public int foo() { return 0; }", "", factory)


def test_for_loop(factory):
    """testForLoop (RuntimeVisitorTest.cpp:549-594): cleartext loop bound,
    ciphertext accumulation over 10 iterations."""
    rv, out = run_program(
        f"secret int __input0__ = {IN0};",
        "int LIMIT = 10; secret int result = 0;"
        " for (int i = 0; i < LIMIT; i = i + 1) {"
        " result = result + __input0__; } return;",
        "y = result;", factory)
    assert_result(factory, out, {
        "y": [430, 10, 10, 10, 220, 110, 4250, 0, 10, 70]})


def test_full_assignment_to_ciphertext(factory):
    """testFullAssignmentToCiphertext (RuntimeVisitorTest.cpp:596-626)."""
    rv, out = run_program(
        "", "secret int fixedKey = {3, 2, 1, 3, 4, 9, 11, 333, 22, 434,"
        " 3430, 2211}; return;", "result = fixedKey;", factory)
    assert_result(factory, out, {
        "result": [3, 2, 1, 3, 4, 9, 11, 333, 22, 434, 3430, 2211]})


def test_full_assignment_to_plaintext(factory):
    """testFullAssignmentToPlaintext (RuntimeVisitorTest.cpp:628-675):
    double vector passthrough stays a cleartext with exact values."""
    rv, out = run_program(
        "double __input0__ = {1.25, 2.22, 4.0, 3.22, 11.0, 41.1, 4.0};",
        "double result = __input0__; return;", "r = result;", factory)
    assert len(out) == 1
    name, val = out[0]
    assert name == "r"
    assert isinstance(val, Cleartext)
    assert [float(v) for v in val.values] == [1.25, 2.22, 4.0, 3.22, 11.0,
                                              41.1, 4.0]
