from abc_tpu.crypto.bfv import BfvCiphertext, BfvContext, Plaintext  # noqa: F401
from abc_tpu.crypto.ntt import NttContext  # noqa: F401
from abc_tpu.crypto.params import BfvParams  # noqa: F401
