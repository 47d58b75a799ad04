from abc_tpu.runtime.backend import AbstractCiphertextFactory  # noqa: F401
from abc_tpu.runtime.dummy import DummyCiphertext, DummyCiphertextFactory  # noqa: F401
from abc_tpu.runtime.executor import (  # noqa: F401
    OutputIdentifierValuePairs, ReturnStatementReached, RuntimeVisitor,
)
from abc_tpu.runtime.values import AbstractCiphertext, AbstractValue, Cleartext  # noqa: F401
