"""Printer matrix — ports of PrintVisitorTest.cpp (node-dump tree) and
ProgramPrintVisitorTest.cpp (full-program pretty print incl. the nested
else-if rendering). Cosmetic deltas from the reference's exact strings are
documented inline; the round-trip property (print → reparse → identical
AST) is asserted as the stronger check.
"""

from abc_tpu.ast_ir import compare_ast
from abc_tpu.ast_ir.nodes import Assignment, LiteralBool, Variable
from abc_tpu.parser import Parser
from abc_tpu.passes.printer import PrintVisitor, program_to_string


def test_print_visitor_tree():
    """PrintVisitorTest printTree (PrintVisitorTest.cpp:7-19): the dump
    shows the node tree with indentation (the reference prints
    'NODE VISITED: <type>' lines; here the node types with the same
    two-space indent structure)."""
    a = Assignment(Variable("foo"), LiteralBool(True))
    out = PrintVisitor().visit(a)
    lines = out.splitlines()
    assert lines[0] == "Assignment"
    assert lines[1].startswith("  ") and "Variable" in lines[1]
    assert lines[2].startswith("  ") and "Literal" in lines[2]


PROGRAM = """
  public void main(secret int p, float q, bool x) {
    int scalar = 2;
    int vec = {3, 4, 9, 2, 1};
    scalar = 6 + 7;
    vec[7] = (10*5)+3;
    return 77;
    if (a > 5) {
      z = 5 + 7;
    } else {
      if (x > 6) {
        z = 6;
      }
      else if (y < 7) {
        y = 6;
      }
    }
  }
"""

# the reference's expected string (ProgramPrintVisitorTest.cpp:31-63),
# modulo two cosmetic deltas: `if (...)` keeps a space (ref: `if(...)`) and
# the `public` qualifier is printed (ref drops it)
EXPECTED = """{
  public void main(secret int p, float q, bool x)
  {
    int scalar = 2;
    int vec = {3, 4, 9, 2, 1};
    scalar = (6 + 7);
    vec[7] = ((10 * 5) + 3);
    return 77;
    if ((a > 5))
    {
      z = (5 + 7);
    }
    else
    {
      if ((x > 6))
      {
        z = 6;
      }
      else
      {
        if ((y < 7))
        {
          y = 6;
        }
      }
    }
  }
}
"""


def test_program_print_visitor_tree():
    """ProgramPrintVisitorTest printTree (ProgramPrintVisitorTest.cpp:5-77):
    full-program pretty print — nested else-if renders as else { if },
    every binary expression parenthesized, expression-list and indexed
    assignments in surface syntax."""
    ast = Parser.parse(PROGRAM)
    assert program_to_string(ast) == EXPECTED


def test_program_print_round_trips():
    """The property the string equality protects: printing and reparsing
    yields a structurally identical AST. The printer wraps the program in
    the root-Block braces, which reparse as one extra Block level — compare
    the Function subtrees."""
    from abc_tpu.ast_ir.nodes import Block, Function

    def fn_of(block):
        node = next(iter(block.children()))
        while isinstance(node, Block):
            node = next(iter(node.children()))
        assert isinstance(node, Function)
        return node

    ast = Parser.parse(PROGRAM)
    reparsed = Parser.parse(program_to_string(ast))
    assert compare_ast(fn_of(ast), fn_of(reparsed))
