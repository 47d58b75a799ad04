"""Benchmark harness: BFV n=8192 ciphertext-ciphertext multiply +
relinearization throughput on the current JAX backend (BASELINE.json
config 2: "BFV n=8192 single-ciphertext ct-ct mult + relinearization").

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

vs_baseline reference point: the reference (MarbleHE/ABC) dispatches this op
to Microsoft SEAL on CPU (SealCiphertext.cpp:121-124); SEAL 3.6 BFV
multiply+relinearize at n=8192 on the reference's benchmark hardware
(m5n.xlarge) measures ≈ 25 ms/op ≈ 40 ops/s. The reference repo itself
publishes no numbers (BASELINE.md), so 40 ops/s is the documented stand-in.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

SEAL_CPU_BASELINE_OPS_PER_S = 40.0
N = 8192
CHAIN = 4          # mult+relin ops chained per jitted call
REPEATS = 5        # timed calls


def main() -> None:
    import jax
    import jax.numpy as jnp

    from abc_tpu.crypto.behz import BehzContext
    from abc_tpu.crypto.bfv import BfvCiphertext, BfvContext
    from abc_tpu.crypto.params import BfvParams

    backend = jax.default_backend()
    ctx = BfvContext(BfvParams.create(N, engine="jx32", seed=123))
    ctx.get_relin_key()
    ctx._behz = BehzContext(ctx.params, ntt_q=ctx.ntt_q)

    a = ctx.encrypt(ctx.encode([1, 2, 3, 4]))
    b = ctx.encrypt(ctx.encode([5, 6, 7, 8]))

    def step(ct_a, ct_b):
        # chain CHAIN mult+relin ops with a data dependency so none is DCE'd
        out = ct_a
        for _ in range(CHAIN):
            out = ctx.multiply(BfvCiphertext(out), BfvCiphertext(ct_b)).data
        return out

    jitted = jax.jit(step)
    arg_a = jnp.asarray(np.asarray(a.data))
    arg_b = jnp.asarray(np.asarray(b.data))

    # compile + warmup
    jax.block_until_ready(jitted(arg_a, arg_b))

    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        jax.block_until_ready(jitted(arg_a, arg_b))
        times.append(time.perf_counter() - t0)
    best = min(times)
    ops_per_s = CHAIN / best

    print(json.dumps({
        "metric": f"bfv_n{N}_ct_mult_relin ({backend})",
        "value": round(ops_per_s, 2),
        "unit": "ops/s",
        "vs_baseline": round(ops_per_s / SEAL_CPU_BASELINE_OPS_PER_S, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
