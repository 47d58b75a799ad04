"""Shared e2e test harness.

Mirrors the reference's canonical three-AST protocol: input declarations /
program / output assignments + registerInputVariable + assertResult
decrypt-and-compare (ref: RuntimeVisitorTest.cpp:15-108,
HammingDistanceTest.cpp:27-123).
"""

from __future__ import annotations

from typing import Dict, List, Optional

from abc_tpu.ast_ir.nodes import VariableDeclaration
from abc_tpu.parser import Parser
from abc_tpu.passes.type_checking import run_type_checking
from abc_tpu.runtime.dummy import DummyCiphertextFactory
from abc_tpu.runtime.executor import RuntimeVisitor
from abc_tpu.runtime.values import AbstractCiphertext, Cleartext


def run_program(inputs_src: str, program_src: str, output_src: str,
                factory=None, extra_input_types: Optional[Dict] = None):
    """Parse the three ASTs, type-check the program with the input types
    pre-registered, execute, and return (RuntimeVisitor, output pairs)."""
    ast_input = Parser.parse(inputs_src)
    ast_program = Parser.parse(program_src)
    ast_output = Parser.parse(output_src)

    input_types = {decl.target.identifier: decl.datatype
                   for decl in ast_input.children()
                   if isinstance(decl, VariableDeclaration)}
    input_types.update(extra_input_types or {})
    tcv = run_type_checking(ast_program, input_types)

    factory = factory or DummyCiphertextFactory()
    rv = RuntimeVisitor(factory, ast_input, tcv.get_secret_tainted_nodes())
    rv.execute_ast(ast_program)
    return rv, rv.get_output(ast_output)


def assert_result(factory, output_pairs, expected: Dict[str, List[int]]):
    """Decrypt-and-compare, checking only the first len(expected) slots for
    ciphertexts (last-element padding fills the rest)."""
    assert len(output_pairs) == len(expected)
    for identifier, value in output_pairs:
        assert identifier in expected, f"unexpected output {identifier!r}"
        exp = expected[identifier]
        if isinstance(value, AbstractCiphertext):
            plain = factory.decrypt(value)
            assert plain[:len(exp)] == list(exp), \
                f"{identifier}: {plain[:len(exp)]} != {exp}"
        elif isinstance(value, Cleartext):
            got = [int(v) for v in value.values]
            assert got == list(exp), f"{identifier}: {got} != {exp}"
        else:
            raise AssertionError(f"unknown output value type for {identifier!r}")
