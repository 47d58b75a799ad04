"""Runtime value model: AbstractValue / Cleartext / AbstractCiphertext.

Reference: include/ast_opt/runtime/AbstractValue.h:4-48 (18 in-place ops),
Cleartext.h:30-382 (plaintext vector value, elementwise std::transform ops,
allEqual, setValueAtIndex), AbstractCiphertext.h:12-99 (ciphertext interface).

Design difference: values here are IMMUTABLE — every operation returns a new
value. That matches JAX semantics (jnp arrays are immutable) and removes the
reference's defensive clone-on-every-variable-read (RuntimeVisitor.cpp:429-443,
a full ciphertext copy per read). Broadcasting between a scalar (length-1) and
a vector is supported explicitly; the reference's std::transform silently
assumed equal lengths.
"""

from __future__ import annotations

from typing import Any, List, Sequence

from abc_tpu.utils.datatype import Type
from abc_tpu.utils.errors import RuntimeExecutionError
from abc_tpu.utils.operators import Op


class AbstractValue:
    """Marker base for runtime values."""


class Cleartext(AbstractValue):
    """Plaintext vector value with an element type tag."""

    __slots__ = ("values", "dtype")

    def __init__(self, values: Sequence[Any], dtype: Type):
        self.values: List[Any] = list(values)
        self.dtype = dtype

    # --- constructors ---------------------------------------------------
    @staticmethod
    def from_scalar(value: Any, dtype: Type) -> "Cleartext":
        return Cleartext([value], dtype)

    # --- predicates -------------------------------------------------------
    def all_equal(self) -> bool:
        # ref: Cleartext::allEqual, Cleartext.h:81-90
        return all(v == self.values[0] for v in self.values)

    def is_scalar(self) -> bool:
        return len(self.values) == 1

    def scalar(self) -> Any:
        if not self.all_equal():
            raise RuntimeExecutionError("expected a scalar cleartext value")
        return self.values[0]

    # --- mutation helpers (used by indexed assignment) ---------------------
    def with_value_at_index(self, index: int, value: Any) -> "Cleartext":
        # ref: Cleartext::setValueAtIndex; grows the vector when needed
        vals = list(self.values)
        if index >= len(vals):
            fill = 0 if self.dtype in (Type.INT, Type.BOOL) else (
                0.0 if self.dtype in (Type.FLOAT, Type.DOUBLE) else "")
            vals.extend([fill] * (index + 1 - len(vals)))
        vals[index] = value
        return Cleartext(vals, self.dtype)

    # --- operations ---------------------------------------------------------
    def binary_op(self, op: Op, other: "Cleartext") -> "Cleartext":
        a, b = self.values, other.values
        if len(a) != len(b):
            if len(a) == 1:
                a = a * len(b)
            elif len(b) == 1:
                b = b * len(a)
            else:
                raise RuntimeExecutionError(
                    f"cleartext length mismatch: {len(a)} vs {len(b)}")
        fn = _CLEARTEXT_OPS.get(op)
        if fn is None:
            raise RuntimeExecutionError(f"unsupported cleartext operator: {op}")
        result = [fn(x, y) for x, y in zip(a, b)]
        if op in _RELATIONAL_OPS or op in (Op.LOGICAL_AND, Op.LOGICAL_OR):
            return Cleartext(result, Type.BOOL)
        return Cleartext(result, self.dtype)

    def unary_op(self, op: Op) -> "Cleartext":
        if op == Op.LOGICAL_NOT:
            return Cleartext([not bool(v) for v in self.values], Type.BOOL)
        if op == Op.BITWISE_NOT:
            return Cleartext([~int(v) for v in self.values], self.dtype)
        raise RuntimeExecutionError(f"unsupported unary operator: {op}")

    def __repr__(self) -> str:
        return f"Cleartext<{self.dtype.value}>({self.values})"


_RELATIONAL_OPS = {Op.LESS, Op.LESS_EQUAL, Op.GREATER, Op.GREATER_EQUAL,
                   Op.EQUAL, Op.NOTEQUAL}

_CLEARTEXT_OPS = {
    Op.ADD: lambda x, y: x + y,
    Op.SUB: lambda x, y: x - y,
    Op.MUL: lambda x, y: x * y,
    Op.DIV: lambda x, y: x // y if isinstance(x, int) and isinstance(y, int) else x / y,
    Op.MOD: lambda x, y: x % y,
    Op.FHE_ADD: lambda x, y: x + y,
    Op.FHE_SUB: lambda x, y: x - y,
    Op.FHE_MUL: lambda x, y: x * y,
    Op.LOGICAL_AND: lambda x, y: bool(x) and bool(y),
    Op.LOGICAL_OR: lambda x, y: bool(x) or bool(y),
    Op.LESS: lambda x, y: x < y,
    Op.LESS_EQUAL: lambda x, y: x <= y,
    Op.GREATER: lambda x, y: x > y,
    Op.GREATER_EQUAL: lambda x, y: x >= y,
    Op.EQUAL: lambda x, y: x == y,
    Op.NOTEQUAL: lambda x, y: x != y,
    Op.BITWISE_AND: lambda x, y: x & y,
    Op.BITWISE_XOR: lambda x, y: x ^ y,
    Op.BITWISE_OR: lambda x, y: x | y,
}


class AbstractCiphertext(AbstractValue):
    """Backend-agnostic ciphertext interface (ref: AbstractCiphertext.h:12-99).

    All operations are pure: they return new ciphertexts.
    """

    def add(self, other: "AbstractCiphertext") -> "AbstractCiphertext":
        raise NotImplementedError

    def subtract(self, other: "AbstractCiphertext") -> "AbstractCiphertext":
        raise NotImplementedError

    def multiply(self, other: "AbstractCiphertext") -> "AbstractCiphertext":
        raise NotImplementedError

    def add_plain(self, other: Cleartext) -> "AbstractCiphertext":
        raise NotImplementedError

    def subtract_plain(self, other: Cleartext) -> "AbstractCiphertext":
        raise NotImplementedError

    def subtract_from_plain(self, other: Cleartext) -> "AbstractCiphertext":
        """plain - ctxt (needed because subtraction is not commutative)."""
        raise NotImplementedError

    def multiply_plain(self, other: Cleartext) -> "AbstractCiphertext":
        raise NotImplementedError

    def rotate_rows(self, steps: int) -> "AbstractCiphertext":
        """SEAL-compatible row rotation: slots form a 2×(n/2) matrix and each
        row rotates cyclically; positive steps rotate left
        (ref: SealCiphertext.cpp:52-61; expected vectors
        RuntimeVisitorTest.cpp:100-103)."""
        raise NotImplementedError

    def apply_binary_op(self, op: Op, other: AbstractValue,
                        self_is_lhs: bool = True) -> "AbstractCiphertext":
        """Dispatch helper mirroring SealCiphertext's RTTI dispatch
        (SealCiphertext.cpp:208-239)."""
        plain_op = {Op.FHE_ADD: Op.ADD, Op.FHE_SUB: Op.SUB, Op.FHE_MUL: Op.MUL}.get(op, op)
        if isinstance(other, AbstractCiphertext):
            if plain_op == Op.ADD:
                return self.add(other)
            if plain_op == Op.SUB:
                return self.subtract(other) if self_is_lhs else other.subtract(self)
            if plain_op == Op.MUL:
                return self.multiply(other)
        elif isinstance(other, Cleartext):
            if plain_op == Op.ADD:
                return self.add_plain(other)
            if plain_op == Op.SUB:
                return self.subtract_plain(other) if self_is_lhs \
                    else self.subtract_from_plain(other)
            if plain_op == Op.MUL:
                return self.multiply_plain(other)
        raise RuntimeExecutionError(
            f"operation ({op}) not supported on ciphertexts "
            "(division/modulo/logical/bitwise require binary circuits)")
