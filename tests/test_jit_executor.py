"""Whole-program JIT execution tests: the full pipeline (parse → passes →
trace → one XLA program) must match the eager executor bit-for-bit."""

import numpy as np
import pytest

from abc_tpu.runtime.bfv_backend import BfvCiphertextFactory
from abc_tpu.runtime.jit_executor import jit_compile_program


@pytest.fixture(scope="module")
def factory():
    return BfvCiphertextFactory(slots=1024, engine="jx32", seed=9)


def test_jitted_hamming_distance(factory):
    prog = jit_compile_program(
        program_src="""
          secret int diff = (x --- y) *** (x --- y);
          diff = diff +++ rotate(diff, 2);
          diff = diff +++ rotate(diff, 1);
          return diff;
        """,
        inputs_src="secret int x = {1,1,0,1}; secret int y = {1,0,1,1};",
        output_src="hd = diff;",
        factory=factory)
    out = prog.run()
    assert out["hd"][0] == 2


def test_jitted_loop_unrolls_into_circuit(factory):
    prog = jit_compile_program(
        program_src="""
          for (int i = 0; i < 3; i = i + 1) {
            acc = acc +++ acc;
          }
          return acc;
        """,
        inputs_src="secret int acc = {2};",
        output_src="y = acc;",
        factory=factory)
    assert prog.run()["y"][0] == 16  # 2 doubled three times


def test_jitted_mixed_plain_secret(factory):
    prog = jit_compile_program(
        program_src="""
          int w = 10;
          secret int z = x *** w +++ 5;
          return z;
        """,
        inputs_src="secret int x = {1, 2, 3};",
        output_src="y = z;",
        factory=factory)
    assert prog.run()["y"][:3] == [15, 25, 35]


def test_jitted_matches_eager(factory):
    src = dict(
        program_src="secret int p = a *** b; p = rotate(p, 1);",
        inputs_src="secret int a = {3, 1, 4, 1}; secret int b = {2, 7, 1, 8};",
        output_src="y = p;")
    prog = jit_compile_program(factory=factory, **src)
    jit_out = prog.run()["y"][:3]

    from helpers import run_program
    rv, pairs = run_program(src["inputs_src"], src["program_src"],
                            src["output_src"], factory)
    eager_out = factory.decrypt(pairs[0][1])[:3]
    assert jit_out == eager_out == [7, 4, 8]


def test_rerun_without_retrace(factory):
    prog = jit_compile_program(
        program_src="secret int s = x +++ x;",
        inputs_src="secret int x = {5};",
        output_src="y = s;",
        factory=factory)
    assert prog.run()["y"][0] == 10
    # fresh ciphertext, same shapes → reuses the compiled executable
    ct2 = factory.create_ciphertext([21])
    raw = prog.run_raw({"x": ct2.ct.data})
    from abc_tpu.crypto.bfv import BfvCiphertext
    dec = factory.context.decode(factory.context.decrypt(
        BfvCiphertext(np.asarray(raw["y"]))))
    assert dec[0] == 42


def test_jitted_ckks_program():
    """The whole-program jit path is backend-generic: CKKS float program
    traced into one XLA executable (jit_pack/jit_unpack protocol)."""
    from abc_tpu.runtime.ckks_backend import CkksCiphertextFactory
    from abc_tpu.runtime.jit_executor import jit_compile_program

    fac = CkksCiphertextFactory(n=512, levels=3, engine="jx32", seed=4)
    jp = jit_compile_program(
        "secret double p = a *** b; p = rotate(p, 1);",
        "secret double a = {1.5, 2.0, -0.5}; secret double b = {0.5, 0.25, 4.0};",
        "yp = p;", fac)
    out = jp.run()["yp"]
    expected = [2.0 * 0.25, -0.5 * 4.0]   # rotated left by 1
    for g, e in zip(out, expected):
        assert abs(g - e) <= 1e-2, (out[:2], expected)


def test_census_missing_key_falls_back_to_in_trace_build(monkeypatch):
    """If the dummy-run key census under-approximates (it should not, but
    robustness matters), the real trace builds the missing key in-trace —
    correct, just uncached. Simulated by forcing the census to drop all
    galois keys."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from abc_tpu.runtime.bfv_backend import BfvCiphertextFactory
    from abc_tpu.runtime.jit_executor import JittedProgram, \
        jit_compile_program

    monkeypatch.setattr(
        JittedProgram, "_census_key_ids",
        lambda self, compiled, i, o: {"relin"})   # drops the rotate key
    factory = BfvCiphertextFactory(slots=1024, engine="jx32", seed=21)
    jp = jit_compile_program(
        "secret int y = rotate(x, 1); return y;",
        "secret int x = {10, 20, 30};", "out = y;", factory)
    assert jp.run()["out"][:2] == [20, 30]


def test_ckks_census_discovers_keys():
    """The dummy-run key census serves CKKS too (both schemes map
    rotate(steps) to galois element 3^(steps mod n/2) mod 2n over the ring
    degree): a CKKS program with one multiply + one rotation discovers
    exactly {relin, galois_3} without the expensive eval_shape pass."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from abc_tpu.runtime.ckks_backend import CkksCiphertextFactory
    from abc_tpu.runtime.jit_executor import JittedProgram, \
        jit_compile_program

    seen = {}
    orig = JittedProgram._census_key_ids

    def spy(self, *a):
        r = orig(self, *a)
        seen["census"] = r
        return r

    JittedProgram._census_key_ids = spy
    try:
        fac = CkksCiphertextFactory(n=512, levels=3, engine="jx32", seed=3)
        jp = jit_compile_program(
            "secret double p = a *** b; p = rotate(p, 1);",
            "secret double a = {3.0, 1.0, 4.0};"
            " secret double b = {2.0, 7.0, 1.0};",
            "y = p;", fac)
        out = jp.run()["y"][:2]
    finally:
        JittedProgram._census_key_ids = orig
    assert seen["census"] == {"relin", f"galois_{pow(3, 1, 2 * 512)}"}
    assert abs(out[0] - 7.0) < 0.1 and abs(out[1] - 4.0) < 0.1


def test_encrypt_inputs_streams_fresh_values():
    """Serving pattern: compile once, stream NEW encrypted inputs through
    the same executable (no retrace), decrypt correct results."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from abc_tpu.runtime.bfv_backend import BfvCiphertextFactory
    from abc_tpu.runtime.jit_executor import jit_compile_program

    factory = BfvCiphertextFactory(slots=1024, engine="jx32", seed=5)
    prog = ("int sum = 0;"
            "for (int i = 0; i < 4; i = i + 1) {"
            "  sum = sum + (x[i]-y[i])*(x[i]-y[i]);"
            "} return sum;")
    jp = jit_compile_program(
        prog, "secret int x = {1,1,0,1}; secret int y = {1,0,1,1};",
        "out = sum;", factory)
    assert jp.run()["out"][0] == 2
    for x, y in (([0, 0, 0, 0], [1, 1, 1, 1]),
                 ([1, 0, 1, 0], [1, 0, 1, 0]),
                 ([1, 1, 1, 0], [0, 1, 0, 0])):
        fresh = jp.encrypt_inputs({"x": x, "y": y})
        got = jp.decrypt_outputs(jp.run_raw(fresh))["out"][0]
        want = sum(int(a != b) for a, b in zip(x, y))
        assert got == want, (x, y, got, want)
    # partial update reuses the original other input (y = {1,0,1,1})
    fresh = jp.encrypt_inputs({"x": [0, 0, 1, 1]})
    assert jp.decrypt_outputs(jp.run_raw(fresh))["out"][0] == 1
    # unknown names rejected
    import pytest as _pytest
    from abc_tpu.utils.errors import RuntimeExecutionError
    with _pytest.raises(RuntimeExecutionError, match="unknown"):
        jp.encrypt_inputs({"zzz": [1]})
