"""Noise-driven parameter selection as a USER feature (round-5, VERDICT
weak 4): every reference end-to-end workload family compiles, gets its BFV
parameter set chosen automatically from the circuit's noise profile
(crypto/noise.py auto_params_report), runs encrypted on the chosen set, and
decrypts to the same outputs as the plaintext dummy backend.

Also covers the two user surfaces: `--auto-params` on the CLI and
`jit_compile_program(auto_params=True)`.
"""

import warnings

import pytest

from abc_tpu.parser import Parser
from abc_tpu.passes.pipeline import (
    CompileOptions, Compiler, input_types_from_ast,
)
from abc_tpu.runtime.dummy import DummyCiphertextFactory
from abc_tpu.runtime.executor import RuntimeVisitor
from abc_tpu.runtime.values import AbstractCiphertext


def _stencil(size, terms):
    """Interior-pixel stencil program over a secret image (the image-kernel
    family shape: BoxBlur/Gx/Gy/Laplace, ref test/end-to-end/*.cpp)."""
    return f"""
      secret int img2 = img;
      for (int x = 1; x < {size} - 1; x = x + 1) {{
        for (int y = 1; y < {size} - 1; y = y + 1) {{
          secret int value = {terms};
          img2[{size} * x + y] = value;
        }}
      }}
      return img2;
    """


def _img_inputs(size, seed):
    import random
    rng = random.Random(seed)
    img = [rng.randrange(0, 16) for _ in range(size * size)]
    return f"secret int img = {{{','.join(map(str, img))}}};"


_RED = """
      int sum = 0;
      for (int i = 0; i < 4; i = i + 1) {{ sum = sum + {term}; }}
      {post}
      return sum;
"""

# the 12 reference end-to-end families (test/end-to-end/*.cpp), compact
# sizes; (inputs, program, output, options)
WORKLOADS = {
    "boxblur": (
        _img_inputs(4, 1),
        _stencil(4, " + ".join(
            f"img[(x + {i}) * 4 + (y + {j})]"
            for i in (-1, 0, 1) for j in (-1, 0, 1))),
        "out = img2;"),
    "gx": (
        _img_inputs(4, 2),
        _stencil(4, "img[(x-1)*4 + y-1] + 2*img[x*4 + y-1] + "
                    "img[(x+1)*4 + y-1] - img[(x-1)*4 + y+1] - "
                    "2*img[x*4 + y+1] - img[(x+1)*4 + y+1]"),
        "out = img2;"),
    "gy": (
        _img_inputs(4, 3),
        _stencil(4, "img[(x-1)*4 + y-1] + 2*img[(x-1)*4 + y] + "
                    "img[(x-1)*4 + y+1] - img[(x+1)*4 + y-1] - "
                    "2*img[(x+1)*4 + y] - img[(x+1)*4 + y+1]"),
        "out = img2;"),
    "robertscross": (
        _img_inputs(4, 4),
        _stencil(4, "(img[(x-1)*4 + y-1] - img[x*4 + y]) * "
                    "(img[(x-1)*4 + y-1] - img[x*4 + y]) + "
                    "(img[(x-1)*4 + y] - img[x*4 + y-1]) * "
                    "(img[(x-1)*4 + y] - img[x*4 + y-1])"),
        "out = img2;"),
    "laplace": (
        _img_inputs(4, 5),
        _stencil(4, "8*img[x*4 + y] - img[(x-1)*4 + y-1] - "
                    "img[(x-1)*4 + y] - img[(x-1)*4 + y+1] - "
                    "img[x*4 + y-1] - img[x*4 + y+1] - "
                    "img[(x+1)*4 + y-1] - img[(x+1)*4 + y] - "
                    "img[(x+1)*4 + y+1]"),
        "out = img2;"),
    "hamming": (
        "secret int x = {1,1,0,1}; secret int y = {1,0,1,1};",
        _RED.format(term="(x[i]-y[i])*(x[i]-y[i])", post=""),
        "out = sum;"),
    "l2distance": (
        "secret int x = {10,12,-4,7}; secret int y = {3,-2,9,1};",
        _RED.format(term="(x[i]-y[i])*(x[i]-y[i])", post=""),
        "out = sum;"),
    "dotproduct": (
        "secret int x = {7,2,0,5}; secret int y = {1,3,4,2};",
        _RED.format(term="x[i]*y[i]", post=""),
        "out = sum;"),
    "matvec": (
        "int M = {1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,16}; "
        "secret int v = {1,-2,3,-4};",
        """
        int y = 0;
        for (int s = 0; s < 4; s = s + 1) {
          y[s] = M[4*s]*v[0] + M[4*s+1]*v[1] + M[4*s+2]*v[2] + M[4*s+3]*v[3];
        }
        return y;
        """,
        "out = y;"),
    "cardio": (
        # flag-form risk score (CardioTest.cpp family): precomputed secret
        # 0/1 condition flags summed with plain weights
        "secret int f0 = 1; secret int f1 = 0; secret int f2 = 1; "
        "secret int f3 = 1; secret int f4 = 0;",
        "secret int r = f0 + f1; r = r + f2; r = r + f3; r = r + f4; "
        "return r;",
        "out = r;"),
    "linearkernel": (
        "secret int x = {2,-1,3,0}; secret int y = {5,4,-2,1}; int c = 7;",
        _RED.format(term="x[i]*y[i]", post="sum = sum + c;"),
        "out = sum;"),
    "polynomialkernel": (
        "secret int x = {2,-1,3,0}; secret int y = {5,4,-2,1}; int c = 7;",
        _RED.format(term="x[i]*y[i]",
                    post="sum = sum + c; sum = sum * sum;"),
        "out = sum;"),
}


def _run_factory(factory, inputs_src, program_src, output_src, options):
    ia, oa = Parser.parse(inputs_src), Parser.parse(output_src)
    compiled = Compiler(options).compile_source(
        program_src, input_types_from_ast(ia))
    rv = RuntimeVisitor(factory, ia, compiled.secret_tainted)
    rv.execute_ast(compiled.ast)
    out = []
    for name, value in rv.get_output(oa):
        if isinstance(value, AbstractCiphertext):
            out.append((name, factory.decrypt(value)[:16]))
        else:
            out.append((name, list(value.values)[:16]))
    return compiled, out


@pytest.mark.parametrize("name", sorted(WORKLOADS))
def test_workload_runs_on_auto_chosen_params(name):
    from abc_tpu.crypto.bfv import BfvContext
    from abc_tpu.crypto.noise import auto_params_report
    from abc_tpu.runtime.bfv_backend import BfvCiphertextFactory

    inputs_src, program_src, output_src = WORKLOADS[name]
    options = CompileOptions(vectorize=True)
    compiled, dummy_out = _run_factory(
        DummyCiphertextFactory(slots=64), inputs_src, program_src,
        output_src, options)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")   # dev-size sets warn on security
        params, report = auto_params_report(compiled, engine="np64", seed=4)
    assert report["predicted_margin_bits"] > 0
    factory = BfvCiphertextFactory(context=BfvContext(params))
    _, bfv_out = _run_factory(factory, inputs_src, program_src, output_src,
                              options)
    assert [(n, v) for n, v in bfv_out] == dummy_out, (
        f"{name}: auto-chosen n={report['n']} diverged from dummy")


def test_cli_auto_params_flag(tmp_path, capsys):
    from abc_tpu.cli import main

    out_csv = tmp_path / "r.csv"
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        rc = main(["hamming", str(out_csv), "--backend", "bfv",
                   "--auto-params"])
    assert rc == 0
    captured = capsys.readouterr()
    assert "auto-params: n=" in captured.err
    assert "sum: [2" in captured.err
    assert out_csv.read_text().startswith("t_keygen,")


def test_jit_auto_params():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from abc_tpu.runtime.jit_executor import jit_compile_program

    inputs_src, program_src, output_src = WORKLOADS["hamming"]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        jp = jit_compile_program(
            program_src, inputs_src, output_src,
            options=CompileOptions(vectorize=True),
            auto_params=True, seed=4)
    assert jp.auto_params is not None
    assert jp.auto_params["predicted_margin_bits"] > 0
    assert jp.run()["out"][0] == 2


def test_auto_params_scales_with_depth():
    """A deeper circuit must get a bigger (or equal) parameter set, and the
    chain must fit the predicted noise with margin."""
    from abc_tpu.crypto.noise import auto_params_report

    def compile_chain(depth):
        prog = "secret int r = a;" + \
            "".join("r = r * a;" for _ in range(depth)) + "return r;"
        ia = Parser.parse("secret int a = 2;")
        return Compiler(CompileOptions()).compile_source(
            prog, input_types_from_ast(ia))

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        p1, r1 = auto_params_report(compile_chain(1))
        p5, r5 = auto_params_report(compile_chain(5))
    assert p5.n >= p1.n
    assert r5["predicted_noise_bits"] > r1["predicted_noise_bits"]


# ---- round-5: CKKS auto-params (per-circuit levels + scale_bits) ----------

def test_ckks_auto_params_selection():
    from abc_tpu.crypto.noise import choose_ckks_parameters

    def compile_src(prog, inputs):
        ia = Parser.parse(inputs)
        return Compiler(CompileOptions()).compile_source(
            prog, input_types_from_ast(ia))

    # rotating depth-2 circuit → prime-sized scale (29), 3 levels
    comp = compile_src(
        "secret double acc = w0 * w1; acc = acc + rotate(w0, 1); "
        "acc = acc * w1; return acc;",
        "secret double w0 = {1.0,2.0}; secret double w1 = {0.5,0.25};")
    params, rep = choose_ckks_parameters(comp)
    assert rep["scale_bits"] == 29 and rep["levels"] == 3
    assert rep["he_standard_128bit"]
    # rotation-free depth-1 circuit: scale_bits sized so the FINAL
    # (post-rescale) scale clears the ~2^17 noise floor with headroom
    # (2·27 − 30 = 24 bits) while leaving the last limb ≥5 bits of
    # coefficient capacity
    comp2 = compile_src("secret double acc = w0 * w0; return acc;",
                        "secret double w0 = {1.0,2.0};")
    _, rep2 = choose_ckks_parameters(comp2)
    assert rep2["scale_bits"] == 27
    # depth-0 keeps the headroom default
    comp3 = compile_src("secret double acc = w0 + w0; return acc;",
                        "secret double w0 = {1.0,2.0};")
    _, rep3 = choose_ckks_parameters(comp3)
    assert rep3["scale_bits"] == 25


def test_ckks_auto_params_executes_accurately():
    import numpy as np

    from abc_tpu.crypto.ckks import CkksContext
    from abc_tpu.crypto.noise import choose_ckks_parameters
    from abc_tpu.runtime.ckks_backend import CkksCiphertextFactory

    inputs = ("secret double w0 = {1.0,2.0}; "
              "secret double w1 = {0.5,0.25};")
    prog = ("secret double acc = w0 * w1; acc = acc + rotate(w0, 1); "
            "acc = acc * w1; return acc;")
    ia = Parser.parse(inputs)
    comp = Compiler(CompileOptions()).compile_source(
        prog, input_types_from_ast(ia))
    params, rep = choose_ckks_parameters(comp, seed=5)
    factory = CkksCiphertextFactory(context=CkksContext(params))
    rv = RuntimeVisitor(factory, ia, comp.secret_tainted)
    rv.execute_ast(comp.ast)
    ((_, v),) = rv.get_output(Parser.parse("out = acc;"))
    got = np.asarray(factory.decrypt(v))[:2]
    want = [(1.0 * 0.5 + 2.0) * 0.5, (2.0 * 0.25 + 2.0) * 0.25]
    assert np.allclose(got, want, atol=1e-2), got


def test_jit_auto_params_routes_float_circuits_to_ckks():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from abc_tpu.runtime.ckks_backend import CkksCiphertextFactory
    from abc_tpu.runtime.jit_executor import jit_compile_program

    jp = jit_compile_program(
        "secret double acc = w0 * w0; return acc;",
        "secret double w0 = {1.5,2.0};", "out = acc;",
        auto_params=True, seed=5)
    assert isinstance(jp.factory, CkksCiphertextFactory)
    assert jp.auto_params["scheme"] == "ckks"
