"""Program-level runtime tests on the real BFV backend — the SEAL-gated tier
of the reference (RuntimeVisitorTest.cpp under #ifdef HAVE_SEAL_BFV), now
always-on because the crypto engine is our own.
"""

import pytest

from abc_tpu.runtime.bfv_backend import BfvCiphertextFactory

from helpers import assert_result, run_program


@pytest.fixture(scope="module")
def factory():
    # n=1024 dev params for speed (reference uses n=4096 in this tier)
    return BfvCiphertextFactory(slots=1024, seed=42)


INPUT_XY = """
  secret int __input0__ = {43, 1, 1, 1, 22, 11, 425, 0, 1, 7};
  int __input1__ = {43, 1, 1, 1, 22, 11, 425, 0, 1, 0};
"""


def test_rotate_negative_matches_reference_vector(factory):
    # the exact expected vector from RuntimeVisitorTest.cpp:100-103
    rv, pairs = run_program(INPUT_XY, "__input0__ = rotate(__input0__, -4);",
                            "y = __input0__;", factory)
    assert_result(factory, pairs,
                  {"y": [7, 7, 7, 7, 43, 1, 1, 1, 22, 11, 425, 0, 1, 7]})


def test_ctxt_ctxt_multiplication(factory):
    rv, pairs = run_program(INPUT_XY, "secret int prod = __input0__ *** __input0__;",
                            "y = prod;", factory)
    assert_result(factory, pairs,
                  {"y": [43 * 43, 1, 1, 1, 484, 121, 180625, 0, 1, 49]})


def test_ctxt_plain_both_orders(factory):
    rv, pairs = run_program(
        INPUT_XY,
        "secret int a = __input0__ *** __input1__;"
        "secret int b = __input1__ *** __input0__;"
        "secret int d = __input1__ --- __input0__;",
        "ya = a; yb = b; yd = d;", factory)
    prod = [1849, 1, 1, 1, 484, 121, 180625, 0, 1, 0]
    assert_result(factory, pairs, {"ya": prod, "yb": prod,
                                   "yd": [0, 0, 0, 0, 0, 0, 0, 0, 0, -7]})


def test_encrypted_hamming_distance_batched(factory):
    """The batched rotate-and-add hamming distance — the computation the
    batching pass is meant to emit (ExpressionBatcher.cpp:306-323 log-depth
    rotate-reduce pattern), here written directly in the DSL."""
    inputs = """
      secret int x = {1, 1, 0, 1};
      secret int y = {1, 0, 1, 1};
    """
    program = """
      secret int diff = (x --- y) *** (x --- y);
      diff = diff +++ rotate(diff, 2);
      diff = diff +++ rotate(diff, 1);
      return diff;
    """
    rv, pairs = run_program(inputs, program, "hd = diff;", factory)
    plain = factory.decrypt(pairs[0][1])
    assert plain[0] == 2  # hamming distance of the two vectors


def test_for_loop_with_ciphertext_accumulator(factory):
    inputs = "secret int acc = {1, 2, 3};"
    program = """
      for (int i = 0; i < 3; i = i + 1) {
        acc = acc +++ acc;
      }
      return acc;
    """
    rv, pairs = run_program(inputs, program, "y = acc;", factory)
    assert_result(factory, pairs, {"y": [8, 16, 24]})


def test_noise_bits_observable(factory):
    rv, pairs = run_program("secret int x = {5};",
                            "x = x *** x;", "y = x;", factory)
    assert pairs[0][1].noise_bits() > 0
