"""Amazon-like dataset construction tools.

Ports of the reference's offline builder scripts (host-side pandas — these
are IO-bound one-shot jobs, not TPU work):

- build_urls: parse gzipped Amazon-2014 review/meta dumps, join reviews with
  image URLs, cap to the most-reviewed items, k-core filter, write all.tsv +
  image-URL CSV + stats (reference src/create_urls_amazon_like.py:40-119)
- remap_ids: USER/ASIN -> contiguous ids, write all_final/all_interactions/
  users/items TSVs, rename image files to item ids (reference
  src/create_user_item_amazon_like.py:15-56)
- check_k_core: per-user interaction-count distribution (reference
  src/check_k_core.py)
- copy_duplicates / copy_first_of_each_group: re-materialize duplicate
  images across ASINs sharing a URL (reference
  src/copy_duplicates_amazon_like.py, src/copy_first_of_each_duplicates_group.py)

  python -m fashionvisualexpl_tpu.cli.build_amazon build_urls --dataset ...
"""

from __future__ import annotations

import argparse
import gzip
import json
import os
import shutil
from typing import List, Optional

import pandas as pd

from fashionvisualexpl_tpu.core.config import Paths
from fashionvisualexpl_tpu.utils.io import ensure_dir


def parse_amazon_gz(path: str, fields: List[str]) -> pd.DataFrame:
    """Parse a gzipped Amazon-2014 dump (one Python-dict literal per line)."""
    import ast

    rows = []
    with gzip.open(path, "rt") as f:
        for line in f:
            try:
                d = ast.literal_eval(line)
            except (ValueError, SyntaxError):
                continue
            rows.append({k: d.get(k) for k in fields})
    return pd.DataFrame(rows)


def k_core_filter(
    df: pd.DataFrame, user_col: str, item_col: str, k: int
) -> pd.DataFrame:
    """Iteratively drop items then users with < k interactions until stable
    (reference create_urls_amazon_like.py:80-92 applies one item pass then
    one user pass; iterating to a fixed point is strictly stronger and is
    what 'k-core' means)."""
    while True:
        before = len(df)
        item_counts = df.groupby(item_col)[user_col].transform("size")
        df = df[item_counts >= k]
        user_counts = df.groupby(user_col)[item_col].transform("size")
        df = df[user_counts >= k]
        if len(df) == before:
            return df


def build_urls(args):
    paths = Paths(root=args.data_root)
    ds = args.dataset
    reviews = parse_amazon_gz(
        args.reviews_gz, ["reviewerID", "asin", "reviewText", "unixReviewTime"]
    )
    meta = parse_amazon_gz(args.meta_gz, ["asin", "imUrl"])
    meta = meta.dropna(subset=["imUrl"])
    df = pd.merge(reviews, meta, on="asin", how="inner")

    # top-N most-reviewed items (create_urls_amazon_like.py:74-78)
    top_items = (
        df.groupby("asin").size().sort_values(ascending=False)
        .head(args.max_items).index
    )
    df = df[df.asin.isin(top_items)]
    df = k_core_filter(df, "reviewerID", "asin", args.k_core)

    ddir = ensure_dir(paths.data_dir(ds))
    df = df.rename(
        columns={
            "reviewerID": "USER", "asin": "ASIN",
            "reviewText": "REVIEW", "unixReviewTime": "TIME",
        }
    )
    df.to_csv(os.path.join(ddir, "all.tsv"), sep="\t", index=False)
    urls = df[["ASIN", "imUrl"]].drop_duplicates("ASIN")
    urls.to_csv(os.path.join(ddir, "all_items.csv"), index=False)
    with open(paths.dataset_info(ds), "w") as f:
        f.write(
            f"interactions: {len(df)}\n"
            f"----\n"
            f"users: {df.USER.nunique()}\n"
            f"items: {df.ASIN.nunique()}\n"
        )
    print(
        f"{len(df)} interactions, {df.USER.nunique()} users, "
        f"{df.ASIN.nunique()} items"
    )


def remap_ids(args):
    paths = Paths(root=args.data_root)
    ds = args.dataset
    ddir = paths.data_dir(ds)
    df = pd.read_csv(os.path.join(ddir, "all.tsv"), sep="\t")

    users = {u: i for i, u in enumerate(sorted(df.USER.unique()))}
    items = {a: i for i, a in enumerate(sorted(df.ASIN.unique()))}
    df["USER_ID"] = df.USER.map(users)
    df["ITEM_ID"] = df.ASIN.map(items)

    sparsity = 1 - len(df) / (len(users) * len(items))
    print(
        f"{len(users)} users, {len(items)} items, {len(df)} interactions, "
        f"sparsity {sparsity:.6f}"
    )

    df.to_csv(paths.all_final(ds), sep="\t", index=False)
    df[["USER_ID", "ITEM_ID", "TIME"]].to_csv(
        paths.all_interactions(ds), sep="\t", index=False, header=False
    )
    pd.DataFrame(users.items(), columns=["USER", "USER_ID"]).to_csv(
        paths.users(ds), sep="\t", index=False
    )
    pd.DataFrame(items.items(), columns=["ASIN", "ITEM_ID"]).to_csv(
        paths.items(ds), sep="\t", index=False
    )
    with open(paths.dataset_info(ds), "w") as f:
        f.write(
            f"interactions: {len(df)}\n----\n"
            f"users: {len(users)}\nitems: {len(items)}\n"
        )

    # rename image files ASIN.jpg -> ITEM_ID.jpg (create_user_item:51-56)
    img_dir = paths.images(ds)
    if os.path.isdir(img_dir) and args.rename_images:
        for fname in os.listdir(img_dir):
            stem, ext = os.path.splitext(fname)
            if stem in items:
                os.rename(
                    os.path.join(img_dir, fname),
                    os.path.join(img_dir, f"{items[stem]}{ext}"),
                )


def check_k_core(args):
    paths = Paths(root=args.data_root)
    df = pd.read_csv(
        paths.all_interactions(args.dataset), sep="\t", header=None
    )
    counts = df.groupby(0).size()
    print(counts.value_counts().sort_index())
    print(f"min interactions per user: {counts.min()}")


def copy_duplicates(args):
    """Items sharing an image URL get a copy of the canonical image
    (copy_duplicates_amazon_like.py:23-32)."""
    paths = Paths(root=args.data_root)
    urls = pd.read_csv(
        os.path.join(paths.data_dir(args.dataset), "all_items.csv")
    )
    img_dir = paths.images(args.dataset)
    for _, group in urls.groupby("imUrl"):
        asins = group.ASIN.tolist()
        present = [
            a for a in asins
            if os.path.exists(os.path.join(img_dir, f"{a}.jpg"))
        ]
        if not present:
            continue
        src = os.path.join(img_dir, f"{present[0]}.jpg")
        for a in asins:
            dst = os.path.join(img_dir, f"{a}.jpg")
            if not os.path.exists(dst):
                shutil.copyfile(src, dst)


def copy_first_of_group(args):
    """Copy the canonical (first-listed) member of each fdupes-style
    duplicates group into a `duplicates_dir` and record the list
    (copy_first_of_each_duplicates_group.py:12-32).  The input file is
    fdupes output: groups of `./name` lines separated by blank lines."""
    paths = Paths(root=args.data_root)
    base = paths.data_dir(args.dataset)
    suffix = "_final" if args.final else ""
    with open(os.path.join(base, "duplicates" + suffix)) as f:
        lines = f.read().split("\n")
    firsts, at_group_start = [], True
    for line in lines:
        if not line:
            at_group_start = True
            continue
        if at_group_start:
            firsts.append(line[2:] if line.startswith("./") else line)
            at_group_start = False
    with open(os.path.join(base, "first_of_each" + suffix), "w") as f:
        f.writelines(name + "\n" for name in firsts)
    out_dir = os.path.join(base, f"duplicates_dir{suffix}")
    os.makedirs(out_dir, exist_ok=True)
    img_dir = paths.images(args.dataset)
    for name in firsts:
        shutil.copy(os.path.join(img_dir, name), out_dir)
    print(f"copied {len(firsts)} canonical duplicates to {out_dir}")


def main(argv=None):
    p = argparse.ArgumentParser(description="Amazon-like dataset tools")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build_urls")
    b.add_argument("--dataset", required=True)
    b.add_argument("--reviews_gz", required=True)
    b.add_argument("--meta_gz", required=True)
    b.add_argument("--max_items", type=int, default=50_000)
    b.add_argument("--k_core", type=int, default=5)
    b.add_argument("--data_root", default="data")
    b.set_defaults(fn=build_urls)

    r = sub.add_parser("remap_ids")
    r.add_argument("--dataset", required=True)
    r.add_argument("--data_root", default="data")
    r.add_argument("--rename_images", action="store_true")
    r.set_defaults(fn=remap_ids)

    k = sub.add_parser("check_k_core")
    k.add_argument("--dataset", required=True)
    k.add_argument("--data_root", default="data")
    k.set_defaults(fn=check_k_core)

    c = sub.add_parser("copy_duplicates")
    c.add_argument("--dataset", required=True)
    c.add_argument("--data_root", default="data")
    c.set_defaults(fn=copy_duplicates)

    g = sub.add_parser("copy_first_of_group")
    g.add_argument("--dataset", required=True)
    g.add_argument("--data_root", default="data")
    g.add_argument("--final", action="store_true",
                   help="operate on the *_final duplicates file")
    g.set_defaults(fn=copy_first_of_group)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
