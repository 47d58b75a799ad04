"""Program-level runtime tests on the dummy backend.

Reference test tier: test/runtime/RuntimeVisitorTest.cpp (677 LoC: rotate±,
ctxt×ctxt, ctxt×plain both orders, plain×plain, For loops, indexed
assignments, unsupported-op erroring) and DummyCiphertextFactoryTest.cpp.
"""

import pytest

from abc_tpu.runtime.dummy import DummyCiphertextFactory
from abc_tpu.runtime.values import Cleartext
from abc_tpu.utils.datatype import Type
from abc_tpu.utils.errors import RuntimeExecutionError

from helpers import assert_result, run_program

FACTORY = DummyCiphertextFactory(4096)  # n=4096 like RuntimeVisitorTest.cpp:16

INPUT_XY = """
  secret int __input0__ = {43, 1, 1, 1, 22, 11, 425, 0, 1, 7};
  int __input1__ = {43, 1, 1, 1, 22, 11, 425, 0, 1, 0};
"""


def run(program, outputs, inputs=INPUT_XY, factory=None):
    factory = factory or DummyCiphertextFactory(4096)
    rv, pairs = run_program(inputs, program, outputs, factory)
    return factory, pairs


def test_rotate_negative():
    # ref: RuntimeVisitorTest.cpp testRotateNegative (expected vector :100-103)
    factory, pairs = run("__input0__ = rotate(__input0__, -4);", "y = __input0__;")
    assert_result(factory, pairs,
                  {"y": [7, 7, 7, 7, 43, 1, 1, 1, 22, 11, 425, 0, 1, 7]})


def test_rotate_positive():
    factory, pairs = run("__input0__ = rotate(__input0__, 4);", "y = __input0__;")
    # positive steps rotate left: slot 0 takes old slot 4
    assert_result(factory, pairs, {"y": [22, 11, 425, 0, 1, 7]})


def test_output_index_access_decodes_as_rotation():
    # ref: getOutput `y = var[i]` → rotateRows(i) (RuntimeVisitor.cpp:510-520)
    factory, pairs = run("__input0__ = __input0__;", "y = __input0__[4];")
    assert_result(factory, pairs, {"y": [22, 11, 425, 0, 1, 7]})


def test_simple_binary_expression_cleartext():
    factory, pairs = run("int sum = 10+25; return sum;", "y = sum;")
    assert_result(factory, pairs, {"y": [35]})


def test_ctxt_ctxt_multiplication():
    factory, pairs = run(
        "secret int prod = __input0__ *** __input0__;", "y = prod;")
    assert_result(factory, pairs,
                  {"y": [43 * 43, 1, 1, 1, 22 * 22, 11 * 11, 425 * 425, 0, 1, 49]})


def test_ctxt_plain_multiplication_both_orders():
    factory, pairs = run(
        "secret int a = __input0__ *** __input1__;"
        "secret int b = __input1__ *** __input0__;", "ya = a; yb = b;")
    expected = [43 * 43, 1, 1, 1, 22 * 22, 11 * 11, 425 * 425, 0, 1, 0]
    assert_result(factory, pairs, {"ya": expected, "yb": expected})


def test_plain_minus_ciphertext_order_preserved():
    factory, pairs = run(
        "secret int d = __input1__ --- __input0__;", "y = d;")
    assert_result(factory, pairs, {"y": [0, 0, 0, 0, 0, 0, 0, 0, 0, -7]})


def test_ciphertext_addition_and_subtraction():
    factory, pairs = run(
        "secret int s = __input0__ +++ __input0__;"
        "secret int d = s --- __input0__;", "y = d;")
    assert_result(factory, pairs, {"y": [43, 1, 1, 1, 22, 11, 425, 0, 1, 7]})


def test_for_loop_cleartext():
    factory, pairs = run(
        "int sum = 0; for (int i = 0; i < 5; i = i + 1) { sum = sum + i; }"
        " return sum;", "y = sum;", inputs="int unused = 0;")
    assert_result(factory, pairs, {"y": [10]})


def test_indexed_assignment_cleartext():
    factory, pairs = run(
        "int v = {1, 2, 3}; v[1] = 9; return v;", "y = v;",
        inputs="int unused = 0;")
    assert_result(factory, pairs, {"y": [1, 9, 3]})


def test_indexed_assignment_growing_vector():
    factory, pairs = run(
        "int v = {0}; for (int i = 0; i < 4; i = i + 1) { v[i] = i * i; }"
        " return v;", "y = v;", inputs="int unused = 0;")
    assert_result(factory, pairs, {"y": [0, 1, 4, 9]})


def test_plain_if_executes_single_branch():
    factory, pairs = run(
        "int x = 5; if (x < 10) { x = 1; } else { x = 2; } return x;",
        "y = x;", inputs="int unused = 0;")
    assert_result(factory, pairs, {"y": [1]})


def test_secret_if_rejected():
    with pytest.raises(RuntimeExecutionError):
        run("if (__input0__ < 5) { __input1__ = 1; }", "y = __input1__;")


def test_unsupported_op_on_ciphertext_errors():
    with pytest.raises(RuntimeExecutionError):
        run("secret int q = __input0__ / __input0__;", "y = q;")


def test_declaration_without_initializer_rejected():
    with pytest.raises(RuntimeExecutionError):
        run("secret int q; q = __input0__;", "y = q;")


def test_scalar_plain_broadcasts_over_ciphertext():
    factory, pairs = run("secret int s = __input0__ +++ 1;", "y = s;")
    assert_result(factory, pairs, {"y": [44, 2, 2, 2, 23, 12, 426, 1, 2, 8]})


def test_secret_assignment_from_plain_encrypts():
    # deviation from the reference (which throws): plain → secret assignment
    factory, pairs = run("__input0__ = 5;", "y = __input0__;")
    assert_result(factory, pairs, {"y": [5]})


def test_return_unwinds_nested_loops():
    factory, pairs = run(
        "int sum = 0;"
        "for (int i = 0; i < 100; i = i + 1) {"
        "  sum = sum + 1;"
        "  if (sum == 3) { return sum; }"
        "}", "y = sum;", inputs="int unused = 0;")
    assert_result(factory, pairs, {"y": [3]})


def test_cleartext_relational_gives_bool():
    c = Cleartext([1, 5, 9], Type.INT).binary_op(
        __import__("abc_tpu.utils.operators", fromlist=["Op"]).Op.LESS,
        Cleartext([5], Type.INT))
    assert c.dtype == Type.BOOL and c.values == [True, False, False]


def test_expand_vector_pads_with_last_element():
    # ref: SealCiphertextFactory.cpp:102-115
    f = DummyCiphertextFactory(8)
    ct = f.create_ciphertext([1, 2, 3])
    assert f.decrypt(ct) == [1, 2, 3, 3, 3, 3, 3, 3]
