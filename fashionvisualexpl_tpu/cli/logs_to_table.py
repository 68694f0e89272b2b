"""Sweep-results aggregation (the role of reference src/logs_to_excel.py).

The reference scrapes stdout text with hardcoded line offsets
(logs_to_excel.py:26-53); this framework logs structured JSONL per run
(utils/io.py JsonlLogger), so aggregation is a join over records: one row
per run with its hyperparameters (parsed from the log filename tag) and the
best-epoch metrics, sorted by the chosen metric.

  python -m fashionvisualexpl_tpu.cli.logs_to_table --dataset amazon_baby \
      --rec bprmf --metric ndcg_v
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re

import pandas as pd

from fashionvisualexpl_tpu.core.config import Paths


def parse_run_tag(filename: str):
    """log-batch_256-K_128-lr_0.001-reg_0.0.jsonl -> hyperparameter dict.

    Parts without '_' re-join the previous value with '-', so scientific
    notation survives (reg_1e-05 -> reg='1e-05', not '1e')."""
    tag = os.path.basename(filename)[len("log-"):-len(".jsonl")]
    out = {}
    last_key = None
    for part in tag.split("-"):
        if "_" in part:
            k, v = part.split("_", 1)
            out[k] = v
            last_key = k
        elif last_key is not None:
            out[last_key] += "-" + part
    return out


def aggregate(results_dir: str, metric: str = "ndcg_v") -> pd.DataFrame:
    rows = []
    for path in glob.glob(os.path.join(results_dir, "log-*.jsonl")):
        records = [json.loads(l) for l in open(path) if l.strip()]
        with_metric = [r for r in records if metric in r]
        if not with_metric:
            continue
        best = max(with_metric, key=lambda r: r[metric])
        row = parse_run_tag(path)
        row.update(
            best_epoch=best["epoch"],
            **{k: v for k, v in best.items() if k != "epoch"},
        )
        rows.append(row)
    df = pd.DataFrame(rows)
    if metric in df.columns:
        df = df.sort_values(metric, ascending=False)
    return df


def main(argv=None):
    p = argparse.ArgumentParser(description="Aggregate sweep logs to a table.")
    p.add_argument("--dataset", nargs="?", default="amazon_baby")
    p.add_argument("--rec", nargs="?", default="bprmf")
    p.add_argument("--metric", default="ndcg_v")
    p.add_argument("--results_root", default="results")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    paths = Paths(results_root=args.results_root)
    rdir = paths.results_dir(args.dataset, args.rec)
    df = aggregate(rdir, args.metric)
    out = args.out or os.path.join(rdir, "sweep_table.tsv")
    df.to_csv(out, sep="\t", index=False)
    print(df.to_string(index=False))
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
