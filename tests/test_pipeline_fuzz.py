"""Deterministic pipeline fuzz: random DSL programs must produce IDENTICAL
decrypted outputs whether compiled with every optimization on (CTES +
unrolling + DSE + vectorizer + cone rewriting) or with everything off.

This is the semantics-preservation property each pass asserts piecewise in
its own matrix tests, checked end-to-end over a program space none of the
hand-written cases cover. Seeded generator — failures reproduce exactly.
"""

import random

import pytest

from abc_tpu.parser import Parser
from abc_tpu.passes.pipeline import (
    CompileOptions, Compiler, input_types_from_ast,
)
from abc_tpu.runtime.dummy import DummyCiphertextFactory
from abc_tpu.runtime.executor import RuntimeVisitor
from abc_tpu.runtime.values import AbstractCiphertext


def gen_program(rng: random.Random):
    """(inputs_src, program_src, output_src, scalar_mixed): a random
    straight-line-ish program over secret vectors and plain scalars using
    the constructs every pass supports (arithmetic, literal index reads,
    rotate, plain for loops, plain if conditions, accumulator updates).

    scalar_mixed: True when an index-read SCALAR flowed back into the
    vector accumulator — per the secret-index contract (executor
    _eval_index_access: ct[i] ≡ rotate(ct, i), "slots other than 0 carry
    rotated garbage"), only slot 0 is defined for such programs, and the
    two pipelines may legitimately lay the garbage out differently."""
    nvec = rng.randint(1, 3)
    veclen = rng.choice([4, 8])
    inputs = []
    for v in range(nvec):
        vals = [rng.randint(0, 20) for _ in range(veclen)]
        inputs.append(f"secret int v{v} = {{{','.join(map(str, vals))}}};")
    plain_k = rng.randint(2, 5)
    inputs.append(f"int k = {plain_k};")

    stmts = [f"secret int acc = v0;"]
    scalars = ["acc"]
    scalar_mixed = False
    tmp = 0
    for _ in range(rng.randint(2, 6)):
        kind = rng.randrange(5)
        src = f"v{rng.randrange(nvec)}"
        if kind == 0:     # elementwise arithmetic update
            op = rng.choice(["+", "-", "*"])
            stmts.append(f"acc = acc {op} {src};")
        elif kind == 1:   # rotate mix
            steps = rng.randint(-3, 3)
            stmts.append(f"acc = acc + rotate({src}, {steps});")
        elif kind == 2:   # literal index read into a fresh scalar
            idx = rng.randrange(veclen)
            name = f"t{tmp}"
            tmp += 1
            stmts.append(f"secret int {name} = {src}[{idx}] * {rng.randint(1, 3)};")
            scalars.append(name)
            stmts.append(f"acc = acc + {name};")
            scalar_mixed = True
        elif kind == 3:   # plain for loop accumulating index reads
            name = f"t{tmp}"
            tmp += 1
            hi = rng.randint(2, veclen)
            stmts.append(f"secret int {name} = 0;")
            stmts.append(
                f"for (int i = 0; i < {hi}; i = i + 1) "
                f"{{ {name} = {name} + {src}[i]; }}")
            scalars.append(name)
            stmts.append(f"acc = acc - {name};")
            scalar_mixed = True
        else:             # plain-condition if
            thr = rng.randint(0, 6)
            stmts.append(
                f"if (k > {thr}) {{ acc = acc + {rng.randint(1, 4)}; }}")
    stmts.append("return acc;")
    return " ".join(inputs), " ".join(stmts), "out = acc;", scalar_mixed


def run_with(inputs_src, program_src, output_src, options):
    input_ast = Parser.parse(inputs_src)
    output_ast = Parser.parse(output_src)
    compiled = Compiler(options).compile_source(
        program_src, input_types_from_ast(input_ast))
    factory = DummyCiphertextFactory(slots=32)
    rv = RuntimeVisitor(factory, input_ast, compiled.secret_tainted)
    rv.execute_ast(compiled.ast)
    out = []
    for name, value in rv.get_output(output_ast):
        if isinstance(value, AbstractCiphertext):
            out.append((name, factory.decrypt(value)))
        else:
            out.append((name, list(value.values)))
    return out


ALL_ON = CompileOptions(ctes=True, loop_unrolling=True, vectorize=True,
                        cone_rewriting=True, dead_store_elimination=True)
ALL_OFF = CompileOptions(ctes=False, loop_unrolling=False, vectorize=False,
                         cone_rewriting=False, dead_store_elimination=False)


@pytest.mark.parametrize("seed", range(100))
def test_optimized_pipeline_preserves_semantics(seed):
    rng = random.Random(1000 + seed)
    inputs_src, program_src, output_src, scalar_mixed = gen_program(rng)
    base = run_with(inputs_src, program_src, output_src, ALL_OFF)
    opt = run_with(inputs_src, program_src, output_src, ALL_ON)
    if scalar_mixed:
        # only slot 0 is defined once index-read scalars mix in
        base = [(n, v[:1]) for n, v in base]
        opt = [(n, v[:1]) for n, v in opt]
    assert base == opt, (
        f"seed {seed}: optimized pipeline diverged\n"
        f"inputs: {inputs_src}\nprogram: {program_src}\n"
        f"base={base}\nopt={opt}")


def gen_scalar_program(rng: random.Random):
    """Random SCALAR program with secret-condition ifs (the mux-lowering
    path), plain ifs, loops and arithmetic — plus a pure-Python oracle.
    Returns (inputs_src, program_src, expected int)."""
    names = []
    env = {}
    inputs = []
    for i in range(rng.randint(2, 4)):
        v = rng.randint(0, 9)
        names.append(f"s{i}")
        env[f"s{i}"] = v
        inputs.append(f"secret int s{i} = {v};")
    kv = rng.randint(0, 9)
    inputs.append(f"int k = {kv};")
    env["k"] = kv

    stmts = ["secret int r = s0;", "secret int w = s1;"]
    env["r"] = env["s0"]
    env["w"] = env["s1"]
    tmp_i = [0]
    for _ in range(rng.randint(2, 5)):
        kind = rng.randrange(9)
        a = rng.choice(names)
        if kind == 0:
            op = rng.choice(["+", "-", "*"])
            stmts.append(f"r = r {op} {a};")
            env["r"] = eval(f"env['r'] {op} env[a]")
        elif kind == 1:   # SECRET condition → mux lowering
            b = rng.choice(names)
            c = rng.randint(1, 5)
            stmts.append(f"if ({a} > {b}) {{ r = r + {c}; }}")
            if env[a] > env[b]:
                env["r"] += c
        elif kind == 2:   # secret if/else
            b = rng.choice(names)
            c1, c2 = rng.randint(1, 5), rng.randint(1, 5)
            stmts.append(f"if ({a} < {b}) {{ r = r + {c1}; }} "
                         f"else {{ r = r - {c2}; }}")
            env["r"] = env["r"] + c1 if env[a] < env[b] else env["r"] - c2
        elif kind == 3:   # CHAINED assignments in a secret branch (the
                          # round-4 stale-expression bug class)
            b = rng.choice(names)
            c = rng.randint(1, 3)
            stmts.append(f"if ({a} > {b}) {{ r = r + {c}; r = r * 2; }}")
            if env[a] > env[b]:
                env["r"] = (env["r"] + c) * 2
        elif kind == 4:   # MULTI-VARIABLE secret branch (mux ordering /
                          # snapshot emission)
            b = rng.choice(names)
            stmts.append(f"if ({a} < {b}) {{ r = r + w; w = w + r; }}")
            if env[a] < env[b]:
                env["r"] = env["r"] + env["w"]
                env["w"] = env["w"] + env["r"]
        elif kind == 5:   # swap via BRANCH-DECLARED temp (declaration
                          # re-emission + snapshot interplay)
            b = rng.choice(names)
            t = f"bt{tmp_i[0]}"
            tmp_i[0] += 1
            stmts.append(f"if ({a} > {b}) {{ secret int {t} = r; "
                         f"r = w; w = {t}; }}")
            if env[a] > env[b]:
                env["r"], env["w"] = env["w"], env["r"]
        elif kind == 6:   # plain loop scaling
            hi = rng.randint(1, 3)
            stmts.append(f"for (int i = 0; i < {hi}; i = i + 1) "
                         f"{{ r = r + {a}; }}")
            env["r"] += hi * env[a]
        elif kind == 7:   # SECRET if nested inside a KEPT plain if — the
                          # round-4 advisor's double-apply bug class: the
                          # plain if stays, so its statements execute and
                          # must not be re-applied symbolically by the
                          # inner mux
            b = rng.choice(names)
            thr = rng.randint(0, 9)
            c1, c2 = rng.randint(1, 4), rng.randint(2, 9)
            stmts.append(f"if (k > {thr}) {{ r = r + {c1}; "
                         f"if ({a} > {b}) {{ r = r * {c2}; }} }}")
            if env["k"] > thr:
                env["r"] += c1
                if env[a] > env[b]:
                    env["r"] *= c2
        else:             # branch-declared temp whose INITIALIZER reads a
                          # variable mutated earlier in the same branch
                          # (round-4 advisor: raw initializer capture)
            b = rng.choice(names)
            c = rng.randint(1, 4)
            t = f"bt{tmp_i[0]}"
            tmp_i[0] += 1
            stmts.append(f"if ({a} < {b}) {{ r = r + {c}; "
                         f"secret int {t} = r; w = w + {t}; }}")
            if env[a] < env[b]:
                env["r"] += c
                env["w"] += env["r"]
    stmts.append("return r;")
    return " ".join(inputs), " ".join(stmts), env["r"]


@pytest.mark.parametrize("seed", range(100))
def test_secret_branching_fuzz_vs_python_oracle(seed):
    """Secret-condition ifs lower to mux arithmetic (x = c·a + (1−c)·b);
    the full pipeline's slot-0 result must equal a plain Python evaluation
    of the source semantics. Secret comparisons are evaluated by the
    runtime's encrypted-comparison support on the dummy backend."""
    rng = random.Random(2000 + seed)
    inputs_src, program_src, expected = gen_scalar_program(rng)
    out = run_with(inputs_src, program_src, "out = r;", ALL_ON)
    got = out[0][1][0]
    assert got == expected, (
        f"seed {seed}\ninputs: {inputs_src}\nprogram: {program_src}\n"
        f"got {got}, want {expected}")


def run_with_factory(inputs_src, program_src, output_src, options, factory):
    input_ast = Parser.parse(inputs_src)
    output_ast = Parser.parse(output_src)
    compiled = Compiler(options).compile_source(
        program_src, input_types_from_ast(input_ast))
    rv = RuntimeVisitor(factory, input_ast, compiled.secret_tainted)
    rv.execute_ast(compiled.ast)
    out = []
    for name, value in rv.get_output(output_ast):
        if isinstance(value, AbstractCiphertext):
            out.append((name, factory.decrypt(value)))
        else:
            out.append((name, list(value.values)))
    return out


@pytest.mark.parametrize("seed", range(10))
def test_bfv_engine_fuzz_matches_dummy(seed):
    """The same random program on the REAL BFV engine (np64, n=1024) and
    the plaintext dummy backend must decrypt identically — the crypto
    engine under the whole pipeline, not just per-op matrices.
    Multiplicative depth is capped at 2 (noise budget at n=1024)."""
    from abc_tpu.runtime.bfv_backend import BfvCiphertextFactory

    rng = random.Random(3000 + seed)
    while True:
        inputs_src, program_src, output_src, scalar_mixed = gen_program(rng)
        if program_src.count("acc * ") + program_src.count("* v") <= 2:
            break
    dummy = run_with(inputs_src, program_src, output_src, ALL_ON)
    factory = BfvCiphertextFactory(slots=1024, engine="np64", seed=5)
    bfv = run_with_factory(inputs_src, program_src, output_src, ALL_ON,
                           factory)
    n_cmp = 1 if scalar_mixed else 8
    # dummy slots=32 vs BFV slots=1024: compare the defined prefix (vector
    # ops are slot-aligned; rotations only pull in padding beyond it)
    for (dn, dv), (bn, bv) in zip(dummy, bfv):
        assert dn == bn
        assert dv[:n_cmp] == bv[:n_cmp], (
            f"seed {seed}\nprogram: {program_src}\n"
            f"dummy={dv[:n_cmp]} bfv={bv[:n_cmp]}")
