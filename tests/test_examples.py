"""Every example program in examples/*.fhe must parse, survive the full
pipeline, and round-trip through the JSON IR (the reference's corpus at
test/parser/example_programs/ is aspirational — it uses syntax the reference
parser rejects; ours parse for real)."""

import glob
import os

import pytest

from abc_tpu.ast_ir import compare_ast, dumps, loads
from abc_tpu.parser import Parser
from abc_tpu.passes.pipeline import compile_program
from abc_tpu.utils.datatype import Datatype, Type

EXAMPLES = sorted(glob.glob(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples", "*.fhe")))

# free variables per example (program inputs)
INPUTS = {
    "hamming_distance": {"x": Datatype(Type.INT, True),
                         "y": Datatype(Type.INT, True)},
    "cardio": {k: Datatype(Type.INT) for k in
               ["sex", "age", "antecedents", "smoker", "diabetes",
                "high_blood_pressure", "hdl_cholesterol", "weight", "height",
                "phy_activity", "drinking_habits"]},
    "box_blur": {"img": Datatype(Type.INT), "imgSize": Datatype(Type.INT)},
    "secret_branching": {"c": Datatype(Type.INT, True)},
    "sum_vector_elements": {"v": Datatype(Type.INT, True)},
    "rotation": {"ctxt": Datatype(Type.INT, True)},
    "polynomial_kernel": {"x": Datatype(Type.INT, True),
                          "y": Datatype(Type.INT, True),
                          "c": Datatype(Type.INT)},
    "sum_n_times_2": {"n": Datatype(Type.INT)},
    "cross_product": {},
    "discount_on_server": {"qualifies": Datatype(Type.DOUBLE, True)},
    "permute_matrix_elements": {},
    "laplacian_sharpening": {"img": Datatype(Type.INT),
                             "imgSize": Datatype(Type.INT)},
}


@pytest.mark.parametrize("path", EXAMPLES,
                         ids=[os.path.basename(p) for p in EXAMPLES])
def test_example_parses_and_compiles(path):
    src = open(path).read()
    name = os.path.splitext(os.path.basename(path))[0]
    ast = Parser.parse(src)
    assert compare_ast(ast, loads(dumps(ast)))       # JSON round trip
    inputs = INPUTS[name]
    compiled = compile_program(src, inputs)
    assert compiled.ast.children()                   # nonempty circuit


def test_corpus_is_nonempty():
    # the reference ships 12 corpus programs (test/parser/example_programs)
    assert len(EXAMPLES) >= 12


def _src(name):
    for p in EXAMPLES:
        if os.path.basename(p) == name + ".fhe":
            return open(p).read()
    raise KeyError(name)


def test_cross_product_executes():
    from abc_tpu.passes.pipeline import run_compiled
    from abc_tpu.runtime.dummy import DummyCiphertextFactory
    compiled = compile_program(_src("cross_product"), {})
    rv, pairs = run_compiled(compiled, Parser.parse(""),
                             Parser.parse("out = result;"),
                             DummyCiphertextFactory(8))
    m, b = [14, 27, 32], [19, 21, 38]
    expected = [m[1]*b[2] - m[2]*b[1], m[2]*b[0] - m[0]*b[2],
                m[0]*b[1] - m[1]*b[0]]
    assert [int(v) for v in pairs[0][1].values[:3]] == expected


def test_permute_matrix_elements_executes():
    from abc_tpu.passes.pipeline import run_compiled
    from abc_tpu.runtime.dummy import DummyCiphertextFactory
    compiled = compile_program(_src("permute_matrix_elements"), {})
    rv, pairs = run_compiled(compiled, Parser.parse(""),
                             Parser.parse("out = m;"),
                             DummyCiphertextFactory(8))
    assert [int(v) for v in pairs[0][1].values[:4]] == [11, 27, 32, 59]


def test_sum_n_times_2_executes():
    from abc_tpu.passes.pipeline import (input_types_from_ast, run_compiled)
    from abc_tpu.runtime.dummy import DummyCiphertextFactory
    inputs = Parser.parse("int n = 5;")
    compiled = compile_program(_src("sum_n_times_2"),
                               input_types_from_ast(inputs))
    rv, pairs = run_compiled(compiled, inputs, Parser.parse("out = sum;"),
                             DummyCiphertextFactory(8))
    assert int(pairs[0][1].values[0]) == sum(2 * i for i in range(6))


def test_discount_on_server_executes_ckks():
    """Float mux over a secret flag, encrypted on the CKKS backend."""
    from abc_tpu.passes.pipeline import run_compiled
    from abc_tpu.runtime.ckks_backend import CkksCiphertextFactory
    compiled = compile_program(
        _src("discount_on_server"),
        {"qualifies": Datatype(Type.DOUBLE, True)})
    factory = CkksCiphertextFactory(seed=7)
    inputs = Parser.parse("secret double qualifies = 1.0;")
    rv, pairs = run_compiled(compiled, inputs,
                             Parser.parse("out = discountRate;"), factory)
    got = factory.decrypt(pairs[0][1])[0]
    assert abs(got - 0.90) < 1e-2
