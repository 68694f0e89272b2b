"""Explanation-join CLI (reference src/get_explanations.py:17-41): join a
gradient-attribution dump with review text, emit top-N color-driven and
edge-driven recommendation tables.

  python -m fashionvisualexpl_tpu.cli.get_explanations --dataset amazon_baby \
      --rec grad_fashion --file best-grads-10-....tsv
"""

from __future__ import annotations

import argparse
import os

import pandas as pd

from fashionvisualexpl_tpu.core.config import Paths
from fashionvisualexpl_tpu.explain.grads import join_reviews


def main(argv=None):
    p = argparse.ArgumentParser(description="Run logs to excel.")
    p.add_argument("--dataset", nargs="?", default="amazon_baby")
    p.add_argument("--rec", nargs="?", default="grad_fashion")
    p.add_argument("--file", nargs="?", required=True)
    p.add_argument("--top_n", type=int, default=50)
    p.add_argument("--data_root", default="data")
    p.add_argument("--results_root", default="results")
    args = p.parse_args(argv)

    paths = Paths(root=args.data_root, results_root=args.results_root)
    rdir = paths.results_dir(args.dataset, args.rec)
    grads = pd.read_csv(
        os.path.join(rdir, args.file), sep="\t",
        names=["USER_ID", "ITEM_ID", "COLOR", "EDGES"],
    )
    reviews = pd.read_csv(paths.all_final(args.dataset), sep="\t")
    color_driven, edge_driven = join_reviews(grads, reviews, top_n=args.top_n)
    color_driven.to_csv(
        os.path.join(rdir, "color_reviews.tsv"), sep="\t", index=False
    )
    edge_driven.to_csv(
        os.path.join(rdir, "edges_reviews.tsv"), sep="\t", index=False
    )
    print(f"wrote color_reviews.tsv and edges_reviews.tsv to {rdir}")


if __name__ == "__main__":
    main()
