"""Whole-program JIT execution: compile a DSL circuit into ONE XLA program.

This is the TPU-native replacement for the reference's per-op interpreter
(SpecialRuntimeVisitor dispatches every AST node to a SEAL call,
RuntimeVisitor.cpp:40-111). Here the tree-walking executor runs ONCE as the
JAX tracer: every ciphertext op records into the jaxpr, cleartext control
flow (loop bounds, literal indices) is evaluated at trace time, and the whole
encrypted program compiles to a single fused XLA executable. On the axon TPU,
where eager dispatch costs seconds per op, this is the only viable path.

Protocol mirrors the reference's three-AST harness: input declarations /
program / output assignments.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from abc_tpu.ast_ir.nodes import (
    Block, ExpressionList, Literal, VariableDeclaration,
)
from abc_tpu.crypto.bfv import BfvCiphertext
from abc_tpu.passes.pipeline import CompiledProgram
from abc_tpu.runtime.bfv_backend import BfvCiphertextFactory, TpuBfvCiphertext
from abc_tpu.runtime.executor import RuntimeVisitor
from abc_tpu.runtime.values import Cleartext
from abc_tpu.utils.errors import RuntimeExecutionError


class JittedProgram:
    """A compiled DSL program jitted into one XLA executable.

    run() executes the compiled program on the encrypted inputs and returns
    decrypted outputs; run_raw(arrays) re-executes on fresh ciphertext arrays
    without re-tracing (same shapes).
    """

    def __init__(self, compiled: CompiledProgram, factory: BfvCiphertextFactory,
                 input_ast: Block, output_ast: Block):
        import jax

        if factory.params.engine != "jx32":
            raise RuntimeExecutionError(
                "whole-program jit requires the jx32 (JAX) engine")
        self.factory = factory
        self.compiled = compiled
        self.output_ast = output_ast

        # host-side input preparation: evaluate declarations, encrypt secrets
        self.secret_inputs: Dict[str, object] = {}
        self._plain_entries = []
        self._secret_types = {}
        for decl in input_ast.children():
            if not isinstance(decl, VariableDeclaration) or decl.value is None:
                raise RuntimeExecutionError(
                    "input AST must be initialized VariableDeclarations")
            cleartext = _static_cleartext(decl)
            name = decl.target.identifier
            if decl.datatype.secret:
                ct = factory.create_ciphertext(cleartext)
                self.secret_inputs[name] = ct.ct.data
                self._secret_types[name] = decl.datatype
            else:
                self._plain_entries.append((name, decl.datatype, cleartext))

        tainted = compiled.secret_tainted

        def fn(secret_arrays: Dict[str, object]):
            rv = RuntimeVisitor(factory, Block([]), tainted)
            for name, dt, ctext in self._plain_entries:
                rv.globals.declare(name, dt, ctext)
            for name, arr in secret_arrays.items():
                handle = TpuBfvCiphertext(BfvCiphertext(arr), factory)
                rv.globals.declare(name, self._secret_types[name], handle)
            rv.execute_ast(compiled.ast)
            outputs = rv.get_output(output_ast)
            out_arrays = {}
            self._out_is_ct = {}
            for name, value in outputs:
                if isinstance(value, TpuBfvCiphertext):
                    out_arrays[name] = value.ct.data
                    self._out_is_ct[name] = True
                elif isinstance(value, Cleartext):
                    out_arrays[name] = np.asarray(value.values)
                    self._out_is_ct[name] = False
                else:
                    raise RuntimeExecutionError(
                        f"unsupported output value for {name!r}")
            return out_arrays

        # trace once eagerly-ish via jit; galois/relin keys generate at trace
        # time (host) and bake in as constants
        self._jitted = jax.jit(fn)

    def run_raw(self, secret_arrays: Dict[str, object]) -> Dict[str, object]:
        return self._jitted(secret_arrays)

    def run(self) -> Dict[str, List[int]]:
        """Execute and decrypt all outputs (host-side decrypt boundary)."""
        raw = self.run_raw(self.secret_inputs)
        out: Dict[str, List[int]] = {}
        for name, arr in raw.items():
            if self._out_is_ct[name]:
                out[name] = self.factory.context.decode(
                    self.factory.context.decrypt(BfvCiphertext(np.asarray(arr))))
            else:
                out[name] = [int(v) for v in np.asarray(arr)]
        return out


def _static_cleartext(decl: VariableDeclaration) -> Cleartext:
    value = decl.value
    if isinstance(value, Literal):
        return Cleartext.from_scalar(value.value, value.literal_type)
    if isinstance(value, ExpressionList):
        vals = []
        dtype = None
        for e in value.expressions:
            if not isinstance(e, Literal):
                raise RuntimeExecutionError(
                    "input declarations must use literal values")
            vals.append(e.value)
            dtype = e.literal_type
        return Cleartext(vals, dtype)
    raise RuntimeExecutionError("input declarations must use literal values")


def jit_compile_program(program_src: str, inputs_src: str, output_src: str,
                        factory: BfvCiphertextFactory,
                        options=None) -> JittedProgram:
    """Parse + compile + jit in one call (the full TPU-native pipeline)."""
    from abc_tpu.parser import Parser
    from abc_tpu.passes.pipeline import Compiler, input_types_from_ast

    input_ast = Parser.parse(inputs_src)
    output_ast = Parser.parse(output_src)
    compiled = Compiler(options).compile_source(
        program_src, input_types_from_ast(input_ast))
    return JittedProgram(compiled, factory, input_ast, output_ast)
