"""Accuracy-parity harness (BASELINE.md acceptance criterion 1).

The reference's TF 2.3.1 stack cannot be installed in this image, so parity
is checked against a faithful torch-CPU re-implementation of the reference
BPRMF training semantics (same loss with its quirks, same Adam config, same
epoch/negative-sampling scheme, same evaluator protocol via our oracle-
tested metrics): both stacks train on the SAME dataset and must converge to
the same recall@20 / AUC / NDCG@20 within run-to-run variance.

Run:  python scripts/parity_check.py [--epochs 40]
Emits one JSON line with both metric sets and the deltas.
"""

import argparse
import json
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# torch (CPU) plays the reference stack; it ships in this image but is NOT a
# framework dependency — fail with a clear message rather than a stacktrace.
try:
    import torch  # noqa: F401
except ImportError:  # pragma: no cover
    sys.exit(
        "parity_check.py needs torch (CPU) to emulate the reference "
        "training semantics; it is not a fashionvisualexpl_tpu dependency. "
        "Install torch or run on an image that bundles it."
    )

if os.environ.get("PARITY_CPU", "1") == "1":
    # parity runs fine on CPU; the axon sitecustomize overrides JAX_PLATFORMS
    import jax

    jax.config.update("jax_platforms", "cpu")


def train_reference_torch(data, epochs, embed_k, lr, reg, batch, seed=0):
    """The reference's BPRMF in torch-CPU eager (BPRMF.py:87-125 semantics:
    summed BPR softplus loss with clip, neg-bias reg/10, dense Adam
    eps=1e-7, per-epoch host rejection-sampled triples)."""
    import torch

    torch.manual_seed(seed)
    rng = np.random.default_rng(seed)
    U, I = data.num_users, data.num_items

    Bi = torch.zeros(I, requires_grad=True)
    # glorot-uniform like tf.initializers.GlorotUniform (BPRMF.py:36)
    limit = np.sqrt(6.0 / (U + embed_k))
    Gu = (torch.rand(U, embed_k) * 2 * limit - limit).requires_grad_()
    limit = np.sqrt(6.0 / (I + embed_k))
    Gi = (torch.rand(I, embed_k) * 2 * limit - limit).requires_grad_()
    opt = torch.optim.Adam([Bi, Gu, Gi], lr=lr, eps=1e-7)

    train_sets = [set(r) for r in data.training_list]

    for _ in range(epochs):
        users_order = list(range(U))
        random.shuffle(users_order)
        triples = []
        for u in users_order:
            for i in data.training_list[u]:
                j = rng.integers(I)
                while j in train_sets[u]:
                    j = rng.integers(I)
                triples.append((u, i, j))
        steps = len(triples) // batch
        for s in range(steps):
            chunk = triples[s * batch : (s + 1) * batch]
            u = torch.tensor([t[0] for t in chunk])
            p = torch.tensor([t[1] for t in chunk])
            n = torch.tensor([t[2] for t in chunk])
            opt.zero_grad()
            gu, gp, gn = Gu[u], Gi[p], Gi[n]
            bp, bn = Bi[p], Bi[n]
            x_pos = bp + (gu * gp).sum(1)
            x_neg = bn + (gu * gn).sum(1)
            diff = torch.clamp(x_pos - x_neg, -80.0, 1e8)
            loss = torch.nn.functional.softplus(-diff).sum()
            loss = loss + reg * (
                gu.pow(2).sum() + gp.pow(2).sum() + gn.pow(2).sum()
            ) + reg * bp.pow(2).sum() + reg * bn.pow(2).sum() / 10
            loss.backward()
            opt.step()

    scores = (
        Bi.detach().numpy()[None, :]
        + Gu.detach().numpy() @ Gi.detach().numpy().T
    )
    return scores


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=300)
    ap.add_argument("--items", type=int, default=400)
    ap.add_argument("--per_user", type=int, default=15)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--embed_k", type=int, default=32)
    ap.add_argument("--lr", type=float, default=0.005)
    ap.add_argument("--reg", type=float, default=0.001)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--top_k", type=int, default=20)
    ap.add_argument("--train_path", choices=["generic", "packed"],
                    default="generic",
                    help="also validates the packed/LazyAdam path's accuracy")
    args = ap.parse_args()

    import contextlib
    import io

    import jax
    import jax.numpy as jnp

    from fashionvisualexpl_tpu.core.config import TrainConfig
    from fashionvisualexpl_tpu.data.interactions import (
        multi_hot, pad_lists, synthetic_interactions,
    )
    from fashionvisualexpl_tpu.eval.evaluator import Evaluator
    from fashionvisualexpl_tpu.models.bprmf import BPRMF
    from fashionvisualexpl_tpu.ops.metrics import eval_users, mean_metrics
    from fashionvisualexpl_tpu.train.trainer import fit

    data = synthetic_interactions(
        args.users, args.items, interactions_per_user=args.per_user, seed=0
    )

    def metrics_of(scores):
        train_mask = jnp.asarray(multi_hot(data.training_list, data.num_items))
        items, counts = pad_lists(data.test_list, pad_value=0)
        m = mean_metrics(eval_users(
            jnp.asarray(scores), train_mask, jnp.asarray(items),
            jnp.asarray(counts), args.top_k,
        ))
        return {"hr": float(m.hr), "rec": float(m.rec), "auc": float(m.auc),
                "ndcg": float(m.ndcg)}

    # ours (TPU framework)
    cfg = TrainConfig(batch_size=args.batch, epochs=args.epochs, lr=args.lr,
                      reg=args.reg, top_k=args.top_k, eval_every=args.epochs,
                      train_path=args.train_path)
    model = BPRMF(data.num_users, data.num_items, embed_k=args.embed_k)
    ev = Evaluator(model, data, k=args.top_k, user_block=256)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        state, frozen, results, extra = fit(model, data, cfg, evaluator=ev)
    ours = metrics_of(np.asarray(model.predict_all(state.params, frozen)))

    # reference execution model (torch eager, reference semantics)
    ref_scores = train_reference_torch(
        data, args.epochs, args.embed_k, args.lr, args.reg, args.batch
    )
    ref = metrics_of(ref_scores)

    deltas = {k: abs(ours[k] - ref[k]) for k in ours}
    print(json.dumps({
        "ours": ours, "reference_impl": ref, "abs_delta": deltas,
        "config": vars(args),
    }))


if __name__ == "__main__":
    main()
