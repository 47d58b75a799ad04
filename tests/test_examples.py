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
    assert len(EXAMPLES) >= 7
