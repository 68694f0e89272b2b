"""Serving CLI — load a trained checkpoint and answer top-k queries.

The reference has no serving surface at all: its closest artifact is the
end-of-training recommendation dump (train_rec.py:167-184 via
Evaluator.store_recommendation).  This CLI is the deployment half the
framework adds: build the device-resident index once from a checkpoint, then
answer user queries — from a file of user ids, for the whole user base, or
interactively from stdin.

Usage:
  python -m fashionvisualexpl_tpu.cli.serve_rec --rec vbpr --dataset amazon_baby \
      --ckpt results/weights/amazon_baby/vbpr/ckpt-batch_256-K_128-lr_0.001-reg_0.0 \
      --users all --output recs.tsv [--quantized]
"""

from __future__ import annotations

import os
import sys
import time


def parse_args(argv=None):
    from fashionvisualexpl_tpu.cli.train_rec import build_parser

    p = build_parser(description="Serve top-k recommendations from a checkpoint.")
    p.add_argument("--ckpt", type=str, required=True,
                   help="checkpoint directory written by train_rec "
                        "(restores its best-validation params)")
    p.add_argument("--users", type=str, default="all",
                   help="'all', a comma-separated id list, a file with one "
                        "user id per line, or '-' for interactive stdin")
    p.add_argument("--output", type=str, default="-",
                   help="output TSV path ('-' = stdout); rows are "
                        "user\\titem\\tscore, the store_recommendation format")
    p.add_argument("--quantized", action="store_true",
                   help="int8 MXU candidate generation + exact fp32 rescoring")
    p.add_argument("--oversample", type=int, default=4)
    p.add_argument("--item_block", type=int, default=8192)
    p.add_argument("--query_batch", type=int, default=1024)
    return p.parse_args(argv)


def serve(argv=None):
    args = parse_args(argv)

    import jax
    import numpy as np

    from fashionvisualexpl_tpu.cli.train_rec import build_model
    from fashionvisualexpl_tpu.core.checkpoint import CheckpointManager
    from fashionvisualexpl_tpu.core.config import MeshConfig, Paths, TrainConfig
    from fashionvisualexpl_tpu.data.interactions import Interactions
    from fashionvisualexpl_tpu.serve import RecServer

    paths = Paths(root=args.data_root, results_root=args.results_root)
    cfg = TrainConfig(
        dataset=args.dataset, rec=args.rec, batch_size=args.batch_size,
        top_k=args.top_k, lr=args.lr, reg=args.reg, seed=args.seed,
        paths=paths, mesh=MeshConfig(data=1, model=1),
    )
    data = Interactions.load(cfg)
    model = build_model(args, data, cfg)
    template_params, frozen = model.init(jax.random.PRNGKey(args.seed))
    params = CheckpointManager(args.ckpt).restore_best(template_params)

    srv = RecServer(
        model, data, k=args.top_k, item_block=args.item_block,
        quantized=args.quantized, oversample=args.oversample,
        max_batch=args.query_batch,
    )
    t0 = time.time()
    srv.refresh(params, frozen)
    print(f"index built in {time.time() - t0:.2f}s "
          f"({data.num_users} users x {data.num_items} items, "
          f"{'int8+rescore' if args.quantized else 'exact'} path)",
          file=sys.stderr)

    out = sys.stdout if args.output == "-" else open(args.output, "w")
    try:
        if args.users == "-":
            print("enter a user id per line (EOF to quit):", file=sys.stderr)
            for line in sys.stdin:
                line = line.strip()
                if not line:
                    continue
                u = int(line)
                t0 = time.time()
                recs = srv.query_user(u)
                dt = (time.time() - t0) * 1e3
                for item, score in recs:
                    out.write(f"{u}\t{item}\t{score}\n")
                out.flush()
                print(f"[{dt:.1f} ms]", file=sys.stderr)
            return

        if args.users == "all":
            user_ids = np.arange(data.num_users, dtype=np.int32)
        elif os.path.exists(args.users):
            # a file path wins over inline-id parsing, so an id-file named
            # e.g. "123" stays readable
            with open(args.users) as f:
                user_ids = np.asarray(
                    [int(line) for line in f if line.strip()], np.int32
                )
        elif "," in args.users or args.users.isdigit():
            user_ids = np.asarray(
                [int(x) for x in args.users.split(",") if x], np.int32
            )
        else:
            raise FileNotFoundError(
                f"--users {args.users!r}: not a file, not 'all', '-', "
                "a user id, or a comma-separated id list"
            )
        t0 = time.time()
        ids, vals = srv.query(user_ids)
        dt = time.time() - t0
        for row, u in enumerate(user_ids):
            for item, score in zip(ids[row], vals[row]):
                out.write(f"{u}\t{item}\t{score}\n")
        print(
            f"served {user_ids.size} queries in {dt:.3f}s "
            f"({user_ids.size / max(dt, 1e-9):.0f} QPS)",
            file=sys.stderr,
        )
    finally:
        if out is not sys.stdout:
            out.close()


if __name__ == "__main__":
    serve()
