"""Smoke coverage for the benchmark drivers in scripts/.

The round-5 scaled_bench fp32-param delete crash (nested param dicts;
aliased dense entries) lived only in script code and evaded the whole
library suite — these tests run the actual script mains in-process on
tiny shapes so script-only regressions fail loudly.  In-process (not
subprocess): the axon sitecustomize forces the TPU platform on fresh
interpreters regardless of JAX_PLATFORMS; conftest has already pinned
this process to CPU.
"""

import importlib.util
import os
import sys

import pytest

_SCRIPTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
)


def _load(name):
    spec = importlib.util.spec_from_file_location(
        f"scripts_smoke_{name}", os.path.join(_SCRIPTS, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run_scaled_bench(argv, capsys):
    mod = _load("scaled_bench")
    old = sys.argv
    sys.argv = ["scaled_bench.py"] + argv
    try:
        mod.main()
    finally:
        sys.argv = old
    out = capsys.readouterr().out
    assert '"scaled_train_triples_per_sec"' in out, out


def test_scaled_bench_bprmf_capacity_flags(capsys):
    """The capacity configuration end-to-end: packed generic + bf16
    moments + row_align + host_pack + derived_pairs."""
    _run_scaled_bench(
        ["--users", "64", "--items", "48", "--steps", "2", "--batch", "32",
         "--embed_k", "8", "--packed", "--packed_engine", "generic",
         "--lazy_catchup", "--moment_dtype", "bfloat16",
         "--row_align", "128", "--host_pack", "--derived_pairs",
         "--skip_eval"],
        capsys,
    )


def test_scaled_bench_acf_nested_params(capsys):
    """ACF carries NESTED param dicts and dense entries aliased by the
    packed state — the exact shape of the round-5 delete crash."""
    _run_scaled_bench(
        ["--users", "64", "--items", "48", "--steps", "2", "--batch", "32",
         "--embed_k", "8", "--model", "acf", "--packed",
         "--packed_engine", "generic", "--lazy_catchup",
         "--moment_dtype", "bfloat16", "--compute_dtype", "bfloat16",
         "--spatial_s", "4", "--spatial_c", "8", "--skip_eval"],
        capsys,
    )


def _run_script(name, argv, capsys, expect):
    mod = _load(name)
    old = sys.argv
    sys.argv = [f"{name}.py"] + argv
    try:
        mod.main()
    finally:
        sys.argv = old
    out = capsys.readouterr().out
    assert expect in out, out


def test_eval_bench_counts_kernel(capsys):
    _run_script(
        "eval_bench",
        ["--users", "32", "--items", "256", "--dim", "8", "--banned", "4",
         "--item_block", "128", "--chain", "1"],
        capsys, '"scores_per_sec"',
    )


def test_eval_bench_full_evaluator_sharded(capsys):
    """FactoredEvaluator end-to-end over a 1x8 model mesh (all 8 virtual
    CPU devices from conftest; make_mesh requires using every device) —
    the sharded-eval script path."""
    _run_script(
        "eval_bench",
        ["--users", "32", "--items", "64", "--dim", "8",
         "--item_block", "32", "--full", "--mesh_model", "8"],
        capsys, '"scores_per_sec"',
    )


def test_serving_bench_tiny(capsys):
    _run_script(
        "serving_bench",
        ["--users", "64", "--items", "256", "--embed_k", "8",
         "--top_k", "5", "--item_block", "128", "--batches", "2",
         "--iters", "2"],
        capsys, '"paths"',
    )


def test_explain_bench_tiny(capsys):
    _run_script(
        "explain_bench",
        ["--users", "32", "--items", "64", "--pos_per_user", "4",
         "--dim_f", "8", "--user_block", "8"],
        capsys, '"distinct_bucket_widths"',
    )


def test_streamed_bench_both_modes(capsys):
    for mode in ("resident", "streamed"):
        _run_script(
            "streamed_bench",
            ["--mode", mode, "--users", "64", "--items", "64",
             "--img_hw", "8", "--embed_k", "8", "--batch", "32",
             "--steps", "2", "--epochs", "1"],
            capsys, "triples_per_sec",
        )
