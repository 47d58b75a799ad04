"""Dead-store elimination — the DFG's pipeline consumer (passes/dse.py).
The reference builds its DFG as the batching prerequisite (SURVEY.md §2
step 6) but never queries it; here the pipeline runs DSE over it before
vectorization.
"""

from abc_tpu.parser import Parser
from abc_tpu.passes.dse import run_dead_store_elimination
from abc_tpu.passes.pipeline import (CompileOptions, compile_program,
                                     input_types_from_ast, run_compiled)
from abc_tpu.passes.printer import program_to_string
from abc_tpu.runtime.dummy import DummyCiphertextFactory


def _dse(src, inputs=(), live_out=None):
    ast = Parser.parse(src)
    removed = run_dead_store_elimination(ast, inputs, live_out)
    return removed, program_to_string(ast)


def test_overwritten_store_removed():
    removed, text = _dse("int x = 1; x = 2; return x;")
    assert removed == 1
    assert "x = 1" not in text.replace("int ", "")
    assert "2" in text


def test_read_store_kept():
    removed, text = _dse("int x = 1; int y = x + 1; x = 2; return x + y;")
    assert removed == 0


def test_unused_variable_removed_with_live_out():
    removed, text = _dse("int x = 1; int y = 2; return x;", live_out=set())
    assert removed == 1
    assert "y" not in text


def test_final_writes_kept_by_default():
    # live_out=None: every variable's final write survives (the client may
    # read any of them through the output AST)
    removed, text = _dse("int x = 1; int y = 2; return x;")
    assert removed == 0


def test_live_out_keeps_named_outputs_only():
    removed, text = _dse("int a = 1; int b = 2; int c = 3; return a;",
                         live_out={"b"})
    assert "b = 2" in text.replace("int ", "")
    assert "c" not in text


def test_loop_carried_accumulation_kept():
    removed, text = _dse("""
      int sum = 0;
      for (int i = 0; i < 4; i = i + 1) { sum = sum + i; }
      return sum;
    """)
    assert removed == 0
    assert "sum = (sum + i)" in text or "sum = sum + i" in text


def test_dead_store_inside_loop_removed():
    removed, text = _dse("""
      int sum = 0;
      int junk = 0;
      for (int i = 0; i < 4; i = i + 1) {
        junk = sum + 99;
        sum = sum + i;
      }
      return sum;
    """, live_out={"sum"})
    assert removed >= 1
    assert "junk" not in text


def test_pipeline_runs_dse_and_result_is_unchanged():
    """End-to-end: the compiled program drops the dead temp but computes
    the same result on the dummy backend."""
    inputs = Parser.parse("secret int x = {5, 5, 5, 5};")
    program = """
      secret int dead = x *** x;
      dead = x;
      secret int out = dead +++ x;
      return out;
    """
    compiled = compile_program(program, input_types_from_ast(inputs),
                               CompileOptions(live_out={"out"}))
    text = program_to_string(compiled.ast)
    assert "*** x" not in text.split("out")[0].split("dead = x")[0] \
        or "dead = (x *** x)" not in text
    factory = DummyCiphertextFactory(8)
    rv, pairs = run_compiled(compiled, inputs, Parser.parse("y = out;"),
                             factory)
    assert factory.decrypt(pairs[0][1])[0] == 10


def test_inputs_registered():
    # reads of program inputs (declared in the separate input AST) resolve
    removed, text = _dse("int y = q + 1; return y;", inputs=("q",))
    assert removed == 0
