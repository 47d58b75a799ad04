"""CKKS runtime backend: approximate (float) arithmetic behind the same
AbstractCiphertextFactory interface.

The reference planned CKKS support (HAVE_SEAL_CKKS define) but has no
runtime backend for it; here float/double DSL programs execute encrypted:
Cleartext<float/double> values encode through the canonical embedding, and
the executor's op dispatch maps onto leveled CKKS multiply/rescale.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import numpy as np

from abc_tpu.crypto.ckks import CkksCiphertext, CkksContext, CkksParams
from abc_tpu.runtime.backend import AbstractCiphertextFactory
from abc_tpu.runtime.values import AbstractCiphertext, Cleartext
from abc_tpu.utils.errors import RuntimeExecutionError


class TpuCkksCiphertext(AbstractCiphertext):
    __slots__ = ("ct", "factory")

    def __init__(self, ct: CkksCiphertext, factory: "CkksCiphertextFactory"):
        self.ct = ct
        self.factory = factory

    def _ctx(self) -> CkksContext:
        return self.factory.context

    def _wrap(self, ct):
        return TpuCkksCiphertext(ct, self.factory)

    # ctxt ⊕ ctxt
    def add(self, other):
        return self._wrap(self._ctx().add(self.ct, other.ct))

    def subtract(self, other):
        return self._wrap(self._ctx().sub(self.ct, other.ct))

    def multiply(self, other):
        return self._wrap(self._ctx().multiply(self.ct, other.ct))

    # ctxt ⊕ plain — encrypt-and-operate keeps the implementation small;
    # plaintext-operand fast paths are a later optimization
    def _enc(self, cleartext: Cleartext, level: int) -> CkksCiphertext:
        ct = self.factory._encrypt_values(cleartext.values, level)
        return ct

    def add_plain(self, other):
        return self._wrap(self._ctx().add(self.ct,
                                          self._enc(other, self.ct.level)))

    def subtract_plain(self, other):
        return self._wrap(self._ctx().sub(self.ct,
                                          self._enc(other, self.ct.level)))

    def subtract_from_plain(self, other):
        return self._wrap(self._ctx().sub(self._enc(other, self.ct.level),
                                          self.ct))

    def multiply_plain(self, other):
        return self._wrap(self._ctx().multiply(
            self.ct, self._enc(other, self.ct.level)))

    def rotate_rows(self, steps: int):
        return self._wrap(self._ctx().rotate(self.ct, steps))

    def clone(self):
        return TpuCkksCiphertext(self.ct, self.factory)

    @property
    def level(self) -> int:
        return self.ct.level


class CkksCiphertextFactory(AbstractCiphertextFactory):
    """Factory for approximate arithmetic; slot count = n/2."""

    def __init__(self, n: int = 2048, levels: int = 3,
                 engine: Optional[str] = None, seed: Optional[int] = None,
                 scale_bits: int = 25):
        if engine is None:
            engine = "np64"
        self.params = CkksParams.create(n, levels=levels, engine=engine,
                                        seed=seed, scale_bits=scale_bits)
        self.context = CkksContext(self.params)

    @property
    def slot_count(self) -> int:
        return self.params.slot_count

    def _encrypt_values(self, values: Sequence[float], level: Optional[int]
                        ) -> CkksCiphertext:
        vals = self.expand_vector([float(v) for v in values])
        full = self.context.encrypt(self.context.encode(vals))
        if level is not None and level < full.level:
            return self.context.mod_drop_to(full, level)
        return full

    def create_ciphertext(self, value: Union[Cleartext, Sequence, float]
                          ) -> TpuCkksCiphertext:
        if isinstance(value, Cleartext):
            vals = value.values
        elif isinstance(value, (int, float)):
            vals = [value]
        else:
            vals = list(value)
        return TpuCkksCiphertext(self._encrypt_values(vals, None), self)

    def decrypt(self, ciphertext: AbstractCiphertext) -> List[float]:
        if not isinstance(ciphertext, TpuCkksCiphertext):
            raise RuntimeExecutionError(
                "CkksCiphertextFactory can only decrypt its own ciphertexts")
        z = self.context.decode(self.context.decrypt(ciphertext.ct))
        return [float(v) for v in np.real(z)]

    # --- whole-program jit protocol (runtime/jit_executor.py) ---------------
    def jit_pack(self, handle):
        """(traced array, static metadata): CKKS carries (level, scale) as
        trace-time constants alongside the RNS array."""
        return handle.ct.data, (handle.ct.level, handle.ct.scale)

    def jit_unpack(self, array, meta) -> TpuCkksCiphertext:
        level, scale = meta
        return TpuCkksCiphertext(CkksCiphertext(array, level, scale), self)
