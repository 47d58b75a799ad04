"""Trace-state detection for trace-safe caching.

JAX 0.9 lifts EVERY jnp op executed during a jit trace to a
DynamicJaxprTracer — including jnp.asarray of a host numpy constant. Any
context-level cache (device twiddle tables, device key-switching keys)
must therefore only be populated OUTSIDE a trace, or the cached value is
a leaked tracer (jax.errors.UnexpectedTracerError on reuse).

The reference has no analogous problem: SEAL precomputes everything in
factory constructors (SealCiphertextFactory.cpp:72-100). We keep lazy
caches for ergonomics but gate insertion on trace_state_clean().
"""

from __future__ import annotations


def trace_state_clean() -> bool:
    """True when no jit/vmap/grad trace is being staged right now."""
    try:
        from jax._src.core import trace_state_clean as _tsc
        return bool(_tsc())
    except Exception:
        pass
    try:  # fallback probe: does a fresh constant come back concrete?
        import jax
        import jax.numpy as jnp
        import numpy as np
        from jax._src import core as _core
        return not isinstance(jnp.asarray(np.zeros(1)), _core.Tracer)
    except Exception:
        return False  # unknown → never cache (safe)


def trace_token():
    """An opaque token identifying the CURRENT trace context (concrete
    execution included). Identity-keyed caches whose values may be tracers
    must compare this token at hit time: an entry created inside trace A
    served to trace B (or to eager code) is a leaked tracer — e.g. the
    operand-NTT cache keyed on a closure-constant ciphertext that two
    separately-jitted chains both multiply by (found by the two-point
    bench timing, which traces every chain twice)."""
    try:
        from jax._src import core as _core
        return _core.get_opaque_trace_state()
    except Exception:
        # API unavailable: distinguish only eager-vs-traced (entries cached
        # while tracing will never be served again once the probe differs)
        return "eager" if trace_state_clean() else object()
