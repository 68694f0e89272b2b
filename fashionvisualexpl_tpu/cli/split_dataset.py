"""Temporal leave-one-out splitter (reference src/split_dataset.py:14-33).

Per user (sorted by timestamp ascending): last interaction -> test,
second-to-last -> validation (optional), rest -> train; implicit rating 1.0.

  python -m fashionvisualexpl_tpu.cli.split_dataset --dataset amazon_baby
"""

from __future__ import annotations

import argparse

import pandas as pd

from fashionvisualexpl_tpu.core.config import Paths


def split_interactions(df: pd.DataFrame, validation: bool = True):
    """df columns: [0]=user, [1]=item, [2]=time.  Returns (train, val, test)
    DataFrames with a rating column [3]=1.0; val is None without validation."""
    # stable (user, time) sort == the reference's groupby-apply-sort
    # (split_dataset.py:16) without pandas' include_groups pitfalls
    df = df.sort_values(by=[0, 2], ascending=True, kind="stable").reset_index(
        drop=True
    )
    grouped = df.groupby([0])
    test = grouped.tail(1).drop_duplicates()
    train = df.drop(index=test.index)
    train = train.copy()
    test = test.copy()
    train[3] = 1.0
    test[3] = 1.0

    val = None
    if validation:
        grouped = train.groupby([0])
        val = grouped.tail(1).drop_duplicates().copy()
        val[3] = 1.0
        train = train.drop(index=val.index)
    return train, val, test


def main(argv=None):
    p = argparse.ArgumentParser(description="Run dataset splitting.")
    p.add_argument("--dataset", nargs="?", default="amazon_baby")
    p.add_argument("--validation", type=lambda s: s not in ("0", "False"),
                   default=True)
    p.add_argument("--data_root", type=str, default="data")
    args = p.parse_args(argv)

    paths = Paths(root=args.data_root)
    df = pd.read_csv(
        paths.all_interactions(args.dataset), delimiter="\t", header=None
    )
    train, val, test = split_interactions(df, args.validation)
    train.to_csv(paths.training_set(args.dataset), index=False, sep="\t",
                 header=None)
    test.to_csv(paths.test_set(args.dataset), index=False, sep="\t",
                header=None)
    if val is not None:
        val.to_csv(paths.validation_set(args.dataset), index=False, sep="\t",
                   header=None)


if __name__ == "__main__":
    main()
