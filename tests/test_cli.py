"""End-to-end CLI runs over a synthetic dataset in the reference's on-disk
layout — every model in the registry, plus artifact checks."""

import glob
import os

import numpy as np
import pytest

from fashionvisualexpl_tpu.cli.train_rec import train
from fashionvisualexpl_tpu.data.synthetic_dataset import (
    make_synthetic_dataset_on_disk,
)


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data"))
    make_synthetic_dataset_on_disk(
        root, num_users=20, num_items=24, interactions_per_user=6,
        edge_hw=(16, 16), spatial=(3, 5), cnn_dim=16,
    )
    return root


def _run(root, rec, extra=()):
    argv = [
        "--rec", rec, "--dataset", "synthetic",
        "--data_root", root,
        "--results_root", os.path.join(root, "results"),
        "--epochs", "2", "--batch_size", "16", "--top_k", "5",
        "--embed_k", "8", "--embed_d", "4",
        "--embed_color", "4", "--embed_edges", "4",
        "--attention_layers", "4", "1", "--edge_hw", "16", "16",
        "--layers_component", "4", "1", "--layers_item", "4", "1",
        "--eval_user_block", "8",
        *extra,
    ]
    train(argv)
    rdir = os.path.join(root, "results", "rec_results", "synthetic", rec)
    return rdir


@pytest.mark.parametrize(
    "rec", ["bprmf", "vbpr", "grad_fashion", "acf", "attentive_fashion"]
)
def test_cli_all_models(dataset_dir, rec):
    rdir = _run(dataset_dir, rec)
    recs = glob.glob(os.path.join(rdir, "recs-2-*.tsv"))
    assert recs, os.listdir(rdir)
    lines = open(recs[0]).read().strip().split("\n")
    assert len(lines) == 20 * 5  # users x top_k
    u, i, s = lines[0].split("\t")
    float(s); int(u); int(i)
    assert glob.glob(os.path.join(rdir, "best-recs-*.tsv"))
    assert glob.glob(os.path.join(rdir, "results-metrics-*.pkl"))
    assert glob.glob(os.path.join(rdir, "log-*.jsonl"))
    if rec == "grad_fashion":
        grads = glob.glob(os.path.join(rdir, "best-grads-*.tsv"))
        assert grads
        parts = open(grads[0]).readline().strip().split("\t")
        assert len(parts) == 4  # user, item, color_attr, edges_attr


def test_cli_streaming_eval(dataset_dir):
    rdir = _run(dataset_dir, "bprmf", extra=("--streaming_eval",))
    assert glob.glob(os.path.join(rdir, "recs-2-*.tsv"))


def test_cli_streamed_attentive(dataset_dir):
    """--streamed: host-memmap features, empty frozen, streamed trainer —
    the >HBM configuration reachable from the CLI."""
    rdir = _run(dataset_dir, "attentive_fashion", extra=("--streamed",))
    recs = glob.glob(os.path.join(rdir, "recs-2-*.tsv"))
    assert recs, os.listdir(rdir)
    assert len(open(recs[0]).read().strip().split("\n")) == 20 * 5
    # the one-time single-file edge stack was materialized for the memmap
    stack = os.path.join(
        dataset_dir, "synthetic", "original", "features", "edges_stack.npy"
    )
    assert os.path.exists(stack)
    assert np.load(stack, mmap_mode="r").shape == (24, 16, 16, 1)
    # attention dump still works off the host-streamed eval encoder; the
    # reference dumps attention recs for BOTH the final epoch
    # (AttentiveFashion.py:308) and the best model (:320)
    assert glob.glob(os.path.join(rdir, "best-att-recs-*.tsv"))
    assert glob.glob(os.path.join(rdir, "att-recs-2-*.tsv"))


def test_cli_fused_frozen_off(dataset_dir):
    rdir = _run(dataset_dir, "vbpr",
                extra=("--train_path", "packed", "--fused_frozen", "0"))
    assert glob.glob(os.path.join(rdir, "recs-2-*.tsv"))


def test_cli_reg_sweep(dataset_dir):
    rdir = _run(dataset_dir, "bprmf",
                extra=("--list_of_regs", "0.0", "0.01"))
    # one results pickle per reg value
    assert len(glob.glob(os.path.join(rdir, "results-metrics-*reg_0.0*"))) >= 1
    assert len(glob.glob(os.path.join(rdir, "results-metrics-*reg_0.01*"))) >= 1


@pytest.mark.slow
def test_cli_comp_vbpr(dataset_dir):
    rdir = _run(
        dataset_dir, "comp_vbpr",
        extra=("--activated_components", "1", "1", "1", "1",
               "--weight_components", "0.4", "0.2", "0.2", "0.2"),
    )
    recs = glob.glob(os.path.join(rdir, "recs-2-*.tsv"))
    assert recs, os.listdir(rdir)
    assert len(open(recs[0]).read().strip().split("\n")) == 20 * 5


def test_cli_comp_vbpr_ablated(dataset_dir):
    """Edges (the CNN tower) off — exercises partial activation end-to-end."""
    rdir = _run(
        dataset_dir, "comp_vbpr",
        extra=("--activated_components", "1", "0", "0", "1"),
    )
    assert glob.glob(os.path.join(rdir, "recs-2-*.tsv"))


@pytest.mark.slow
def test_cli_packed_resume_matches_uninterrupted(dataset_dir):
    """--train_path packed --resume end-to-end: the CLI fast defaults
    (packed rows + lazy_catchup) interrupted at epoch 2 and resumed to 4
    must dump byte-identical final recommendations to an uninterrupted
    4-epoch run.  verbose=2 puts a checkpoint at the interruption point."""
    import shutil

    root = dataset_dir
    common = [
        "--train_path", "packed", "--verbose", "2",
        "--results_root", os.path.join(root, "results_resume"),
    ]
    # uninterrupted 4 epochs
    _run(root, "vbpr", extra=common + ["--epochs", "4"])
    rdir = os.path.join(root, "results_resume", "rec_results", "synthetic",
                        "vbpr")
    full = open(glob.glob(os.path.join(rdir, "recs-4-*.tsv"))[0]).read()
    shutil.rmtree(os.path.join(root, "results_resume"))

    # interrupted at 2, resumed to 4
    _run(root, "vbpr", extra=common + ["--epochs", "2"])
    _run(root, "vbpr", extra=common + ["--epochs", "4", "--resume"])
    resumed = open(glob.glob(os.path.join(rdir, "recs-4-*.tsv"))[0]).read()
    assert resumed == full
    shutil.rmtree(os.path.join(root, "results_resume"))


def test_cli_serve_from_checkpoint(dataset_dir):
    """train (with checkpointing) -> serve_rec restores best params and
    answers queries in the store_recommendation TSV format."""
    from fashionvisualexpl_tpu.cli.serve_rec import serve

    _run(dataset_dir, "vbpr", extra=("--verbose", "1"))
    wdir = os.path.join(
        dataset_dir, "results", "rec_model_weights", "synthetic", "vbpr"
    )
    ckpts = glob.glob(os.path.join(wdir, "ckpt-*"))
    assert ckpts, os.listdir(wdir)

    out = os.path.join(dataset_dir, "served.tsv")
    common = [
        "--rec", "vbpr", "--dataset", "synthetic",
        "--data_root", dataset_dir,
        "--results_root", os.path.join(dataset_dir, "results"),
        "--embed_k", "8", "--embed_d", "4", "--top_k", "5",
        "--ckpt", ckpts[0],
    ]
    serve(common + ["--users", "0,3,5", "--output", out])
    lines = open(out).read().strip().split("\n")
    assert len(lines) == 3 * 5
    served_users = sorted({int(l.split("\t")[0]) for l in lines})
    assert served_users == [0, 3, 5]

    # quantized path serves the same ids; scores agree to fp32 reduction
    # order (block matmul vs candidate einsum differ in the last ulp)
    out_q = os.path.join(dataset_dir, "served_q.tsv")
    serve(common + ["--users", "0,3,5", "--output", out_q, "--quantized"])
    q_lines = open(out_q).read().strip().split("\n")
    assert [l.split("\t")[:2] for l in q_lines] == [
        l.split("\t")[:2] for l in lines
    ]
    np.testing.assert_allclose(
        [float(l.split("\t")[2]) for l in q_lines],
        [float(l.split("\t")[2]) for l in lines],
        rtol=1e-5,
    )

    # 'all' mode covers every user
    out_all = os.path.join(dataset_dir, "served_all.tsv")
    serve(common + ["--users", "all", "--output", out_all])
    assert len(open(out_all).read().strip().split("\n")) == 20 * 5


def test_cli_get_explanations(tmp_path):
    """End-to-end explanation join (reference get_explanations.py:17-41):
    grads dump + review text -> top-N color/edge-driven tables."""
    from fashionvisualexpl_tpu.cli.get_explanations import main as gx_main

    root = str(tmp_path)
    ddir = os.path.join(root, "mini")
    rdir = os.path.join(root, "results", "rec_results", "mini", "grad_fashion")
    os.makedirs(ddir)
    os.makedirs(rdir)
    with open(os.path.join(ddir, "all_final.tsv"), "w") as f:
        f.write("USER_ID\tITEM_ID\tREVIEW\n")
        for u in range(3):
            for i in range(4):
                f.write(f"{u}\t{i}\treview u{u} i{i}\n")
    with open(os.path.join(rdir, "grads.tsv"), "w") as f:
        for u in range(3):
            for i in range(4):
                f.write(f"{u}\t{i}\t{0.1 * (i - u)}\t{0.05 * u}\n")
    gx_main([
        "--dataset", "mini", "--rec", "grad_fashion", "--file", "grads.tsv",
        "--top_n", "5", "--data_root", root,
        "--results_root", os.path.join(root, "results"),
    ])
    import pandas as pd

    color = pd.read_csv(os.path.join(rdir, "color_reviews.tsv"), sep="\t")
    edges = pd.read_csv(os.path.join(rdir, "edges_reviews.tsv"), sep="\t")
    assert len(color) == 5 and len(edges) == 5
    assert "REVIEW" in color.columns


def test_cli_streaming_eval_grad_fashion(dataset_dir):
    """Round-2 latent crash: grad_fashion has factored_eval, so
    --streaming_eval selects FactoredEvaluator as the dump evaluator —
    which must also provide the grads dump."""
    rdir = _run(dataset_dir, "grad_fashion", extra=("--streaming_eval",))
    assert glob.glob(os.path.join(rdir, "recs-2-*.tsv"))
    assert glob.glob(os.path.join(rdir, "best-grads-*.tsv"))
    assert glob.glob(os.path.join(rdir, "grads-2-*.tsv"))


def test_cli_batch_eval_honored(dataset_dir):
    """--batch_eval (eval-time item-encoding batch, reference
    AttentiveFashion.py:338-343) must block the encoder without changing
    results."""
    rdir = _run(dataset_dir, "attentive_fashion", extra=("--batch_eval", "7"))
    recs = glob.glob(os.path.join(rdir, "recs-2-*.tsv"))
    assert recs
    assert len(open(recs[0]).read().strip().split("\n")) == 20 * 5


def test_cli_acf_exact_train(dataset_dir):
    """--acf_exact_train: reference-exact attend-over-all-positives
    training (cap 3 forces the chunked path to actually differ)."""
    rdir = _run(dataset_dir, "acf",
                extra=("--acf_exact_train", "--acf_exact_eval",
                       "--max_user_pos", "3"))
    recs = glob.glob(os.path.join(rdir, "recs-2-*.tsv"))
    assert recs
    assert len(open(recs[0]).read().strip().split("\n")) == 20 * 5


class TestFlagValidation:
    """Invalid flag combos must die at validate_args — BEFORE any data
    loads (round-3 verdict: `--acf_exact_train --train_path packed`
    survived parsing and died inside ACF.packed_spec())."""

    def _expect(self, argv, needle):
        from fashionvisualexpl_tpu.cli.train_rec import parse_args, validate_args

        with pytest.raises(SystemExit, match=needle):
            validate_args(parse_args(argv))

    def test_acf_exact_train_rejects_packed(self):
        self._expect(
            ["--rec", "acf", "--acf_exact_train", "--train_path", "packed"],
            "generic",
        )

    def test_streamed_rejects_non_attentive(self):
        self._expect(["--rec", "bprmf", "--streamed"], "attentive_fashion")

    def test_streamed_rejects_packed_and_mesh(self):
        self._expect(
            ["--rec", "attentive_fashion", "--streamed",
             "--train_path", "packed"],
            "streamed",
        )
        self._expect(
            ["--rec", "attentive_fashion", "--streamed", "--mesh_data", "2"],
            "single-device",
        )

    def test_comp_vbpr_component_arity(self):
        self._expect(
            ["--rec", "comp_vbpr", "--activated_components", "1", "1"],
            "4 toggles",
        )
        self._expect(
            ["--rec", "comp_vbpr", "--weight_components", "0.5", "0.5"],
            "4 weights",
        )

    def test_acf_layer_widths(self):
        self._expect(
            ["--rec", "acf", "--layers_component", "4", "2"], "width must be 1"
        )

    def test_valid_combos_pass(self):
        from fashionvisualexpl_tpu.cli.train_rec import parse_args, validate_args

        validate_args(parse_args(["--rec", "acf", "--acf_exact_train"]))
        validate_args(parse_args(["--rec", "attentive_fashion", "--streamed"]))
        validate_args(parse_args(["--rec", "bprmf", "--train_path", "packed"]))
