"""Dataset builder tools: splitter semantics, k-core, remap, log aggregation."""

import gzip
import json
import os

import numpy as np
import pandas as pd

from fashionvisualexpl_tpu.cli.build_amazon import (
    build_urls,
    k_core_filter,
    remap_ids,
)
from fashionvisualexpl_tpu.cli.logs_to_table import aggregate, parse_run_tag
from fashionvisualexpl_tpu.cli.split_dataset import split_interactions


def test_split_temporal_leave_one_out():
    """Last interaction -> test, second-to-last -> val, rest -> train
    (reference split_dataset.py:16-33)."""
    rows = []
    for u in range(4):
        for t in range(5):
            rows.append((u, 10 * u + t, 100 + t))
    df = pd.DataFrame(rows)
    train, val, test = split_interactions(df, validation=True)

    for u in range(4):
        test_items = test[test[0] == u][1].tolist()
        val_items = val[val[0] == u][1].tolist()
        train_items = train[train[0] == u][1].tolist()
        assert test_items == [10 * u + 4]  # latest
        assert val_items == [10 * u + 3]  # second latest
        assert sorted(train_items) == [10 * u + t for t in range(3)]
    assert (test[3] == 1.0).all() and (train[3] == 1.0).all()

    train2, val2, test2 = split_interactions(df, validation=False)
    assert val2 is None
    assert len(train2) == 16


def test_k_core_filter_fixed_point():
    # item 99 has one interaction; dropping it leaves user 3 with one -> drop
    df = pd.DataFrame({
        "u": [0, 0, 1, 1, 2, 2, 3, 3],
        "i": [10, 11, 10, 11, 10, 11, 11, 99],
    })
    out = k_core_filter(df, "u", "i", k=2)
    assert 99 not in out.i.values
    assert 3 not in out.u.values
    assert set(out.u) == {0, 1, 2}


class _Args:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def test_build_urls_and_remap(tmp_path):
    root = str(tmp_path)
    reviews = [
        {"reviewerID": f"U{u}", "asin": f"A{i}", "reviewText": "nice",
         "unixReviewTime": 100 + u + i}
        for u in range(4) for i in range(3)
    ]
    meta = [{"asin": f"A{i}", "imUrl": f"http://x/{i}.jpg"} for i in range(3)]
    rgz = os.path.join(root, "reviews.gz")
    mgz = os.path.join(root, "meta.gz")
    with gzip.open(rgz, "wt") as f:
        for r in reviews:
            f.write(repr(r) + "\n")
    with gzip.open(mgz, "wt") as f:
        for m in meta:
            f.write(repr(m) + "\n")

    build_urls(_Args(dataset="amz", reviews_gz=rgz, meta_gz=mgz,
                     max_items=100, k_core=2, data_root=root))
    all_tsv = pd.read_csv(os.path.join(root, "amz", "all.tsv"), sep="\t")
    assert len(all_tsv) == 12
    assert set(all_tsv.columns) >= {"USER", "ASIN", "REVIEW", "TIME"}

    remap_ids(_Args(dataset="amz", data_root=root, rename_images=False))
    final = pd.read_csv(os.path.join(root, "amz", "all_final.tsv"), sep="\t")
    assert final.USER_ID.max() == 3 and final.ITEM_ID.max() == 2
    inter = pd.read_csv(
        os.path.join(root, "amz", "all_interactions.tsv"), sep="\t",
        header=None,
    )
    assert inter.shape == (12, 3)
    info = open(os.path.join(root, "amz", "stats_after_downloading")).readlines()
    assert int(info[2].split(": ")[1]) == 4  # users on line index 2
    assert int(info[3].split(": ")[1]) == 3  # items on line index 3


def test_logs_aggregation(tmp_path):
    rdir = str(tmp_path)
    for reg, best in (("0.0", 0.3), ("0.01", 0.5)):
        path = os.path.join(rdir, f"log-batch_64-K_8-lr_0.01-reg_{reg}.jsonl")
        with open(path, "w") as f:
            for epoch, v in ((1, 0.1), (2, best), (3, best - 0.05)):
                f.write(json.dumps({"epoch": epoch, "ndcg_v": v}) + "\n")
    tag = parse_run_tag(os.path.join(rdir, "log-batch_64-K_8-lr_0.01-reg_0.0.jsonl"))
    assert tag == {"batch": "64", "K": "8", "lr": "0.01", "reg": "0.0"}
    df = aggregate(rdir, "ndcg_v")
    assert len(df) == 2
    assert df.iloc[0]["reg"] == "0.01"  # best first
    assert df.iloc[0]["best_epoch"] == 2


def test_copy_first_of_group(tmp_path):
    """fdupes-group parsing parity (copy_first_of_each_duplicates_group.py:
    group = consecutive ./lines, blank line separates; first of each copied)."""
    import os

    from fashionvisualexpl_tpu.cli.build_amazon import main as ba_main

    base = tmp_path / "data" / "dupes"
    img = base / "original" / "images"
    img.mkdir(parents=True)
    for name in ("a.jpg", "b.jpg", "c.jpg", "d.jpg", "e.jpg"):
        (img / name).write_bytes(b"x")
    (base / "duplicates").write_text(
        "./a.jpg\n./b.jpg\n\n./c.jpg\n./d.jpg\n./e.jpg\n"
    )
    ba_main([
        "copy_first_of_group", "--dataset", "dupes",
        "--data_root", str(tmp_path / "data"),
    ])
    firsts = (base / "first_of_each").read_text().strip().split("\n")
    assert firsts == ["a.jpg", "c.jpg"]
    assert sorted(os.listdir(base / "duplicates_dir")) == ["a.jpg", "c.jpg"]
