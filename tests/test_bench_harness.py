"""bench.py harness plumbing — the driver-facing artifact format.

The device measurements themselves run on real TPU (bench.py); these tests
pin the parts that broke in earlier rounds: worker-template syntax, the
compact-line digest (round-2's BENCH artifact was unparseable from line
overflow; round-3's truncated config4's unit), and the suite registry.
"""

import ast
import json

import bench


def test_worker_templates_are_valid_python():
    ast.parse(bench._WORKER)
    ast.parse(bench._SUITE_WORKER)


def test_compact_suite_digest_keeps_units_and_errors():
    suite = {
        "config4": {"value": 6,
                    "unit": "mult-depth (sorting_gt16)",
                    "vs_baseline": 2.67},
        "config6": {"value": 55.3, "unit": "ms t_computation",
                    "csv_schema": {"t_keygen": 345.1}},
        "config2": {"value": 0.0, "unit": "-", "error": "x" * 200},
    }
    d = bench._compact_suite(suite)
    # round-3 verdict nit: the unit must not be truncated mid-word
    assert d["config4"]["unit"] == "mult-depth (sorting_gt16)"
    assert d["config6"]["csv"] == {"t_keygen": 345.1}
    assert len(d["config2"]["error"]) <= 60
    assert bench._compact_suite(None) == "suite worker failed/timed out"


def test_compact_line_fits_driver_capture():
    """A representative compact line must stay under the 1500-char guard
    bench.py enforces (the driver tails stdout)."""
    line = {
        "metric": "rns_ntt_butterflies_per_s_chip_n16384_L14 (tpu)",
        "value": 55.151, "unit": "Gbutterflies/s", "vs_baseline": 275.76,
        "spread": [54.24, 56.83], "pct_sol": 57.3,
        "ntt_Gbf_s_by_batch": {str(b): 60.0 for b in (1, 8, 16, 64)},
        "mult_relin_ops_s_by_batch": {str(b): 4000.0
                                      for b in (1, 8, 16, 64)},
        "suite": bench._compact_suite(
            {f"config{i}": {"value": 1.0, "unit": "ops/s"}
             for i in range(1, 7)}),
        "full": "bench_suite.json",
    }
    assert len(json.dumps(line)) < 1500


def test_suite_registry_covers_six_configs():
    from abc_tpu.benchsuite import CONFIGS
    assert sorted(CONFIGS) == [1, 2, 3, 4, 5, 6]


def test_mult_relin_sol_model():
    """The speed-of-light model must price the census against the same
    run's measured NTT row cost and report an auditable floor."""
    result = {
        "mult_relin_census": {"ntt_rows": 154, "elem_ops": 142_843_904},
        "ntt_curve": {"1": {"us_per_fwd": 29.17}},
        "ntt_rows": 14,
    }
    sol = bench._mult_relin_sol(result, {"ops_per_s": 3631.0})
    assert sol["ntt_rows"] == 154
    # floor must be faster than measured but the same order of magnitude
    assert sol["floor_ops_per_s"] > 3631.0
    assert sol["floor_ops_per_s"] < 36310.0
    assert 0 < sol["pct_sol"] < 100
    # missing census → explicit error, not a crash
    assert "error" in bench._mult_relin_sol({}, {"ops_per_s": 1.0})
