from abc_tpu.utils.datatype import Datatype, Type  # noqa: F401
from abc_tpu.utils.operators import Op, Operator  # noqa: F401
from abc_tpu.utils.errors import (  # noqa: F401
    AbcError, CompilerError, ParsingError, RuntimeExecutionError, SemanticError,
)
