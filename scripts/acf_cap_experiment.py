"""Quantify ACF's training-time positive-set cap (VERDICT round-1 item 3).

The reference attends over ALL of a user's positives (ACF.py:169-179); this
framework subsamples to `max_user_pos` during training (fixed XLA shapes)
and, since round 2, can evaluate exactly (`exact_eval=True`, chunked
online-softmax).  This experiment trains ACF on a HEAVY-USER synthetic
dataset (zipf-ish positive counts, heaviest users far above the cap) under
three configurations sharing seeds/data:

  A. cap=CAP train, cap=CAP eval      (round-1 behavior)
  B. cap=CAP train, exact eval        (round-2 default-able behavior)
  C. uncapped train, exact eval       (reference semantics via a padded
                                       table at the true max width)
  D. exact_train (chunked scan), exact eval  (round-3: same reference
                                       semantics at bounded memory —
                                       accuracy must match C, and its
                                       wall-clock cost is reported)

and reports converged metric deltas A-C, B-C, D-C plus per-config epoch
wall time.  Run on CPU by default (PARITY_CPU=0 to use the device
platform).

Run:  python scripts/acf_cap_experiment.py [--cap 16] [--epochs 30]
Emits one JSON line.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("PARITY_CPU", "1") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")


def heavy_user_interactions(num_users, num_items, seed=0, min_pos=4,
                            max_pos=96):
    """Synthetic planted-low-rank data with zipf-skewed per-user positive
    counts — the regime where a positive-set cap actually bites."""
    from fashionvisualexpl_tpu.data.interactions import Interactions

    rng = np.random.default_rng(seed)
    latent = 8
    Umat = rng.normal(size=(num_users, latent))
    Vmat = rng.normal(size=(num_items, latent))
    scores = Umat @ Vmat.T + rng.gumbel(size=(num_users, num_items))
    order = np.argsort(-scores, axis=1)
    counts = np.clip(
        rng.zipf(1.6, size=num_users) + min_pos - 1, min_pos, max_pos
    )
    training, validation, test = [], [], []
    for u in range(num_users):
        items = order[u, : counts[u] + 2].tolist()
        rng.shuffle(items)
        test.append([items[-1]])
        validation.append([items[-2]])
        training.append(items[:-2])
    return Interactions.from_lists(training, test, num_items, validation)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=400)
    ap.add_argument("--items", type=int, default=600)
    ap.add_argument("--cap", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--embed_k", type=int, default=32)
    ap.add_argument("--lr", type=float, default=0.005)
    ap.add_argument("--reg", type=float, default=0.001)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--top_k", type=int, default=20)
    args = ap.parse_args()

    import contextlib
    import io

    import jax.numpy as jnp

    from fashionvisualexpl_tpu.core.config import TrainConfig
    from fashionvisualexpl_tpu.data.interactions import multi_hot, pad_lists
    from fashionvisualexpl_tpu.models.acf import ACF
    from fashionvisualexpl_tpu.ops.metrics import eval_users, mean_metrics
    from fashionvisualexpl_tpu.train.trainer import fit

    data = heavy_user_interactions(args.users, args.items, seed=0)
    pos_counts = np.asarray([len(r) for r in data.training_list])
    rng = np.random.default_rng(7)
    spat = rng.normal(size=(args.items, 4, 8)).astype(np.float32) * 0.1

    def metrics_of(scores):
        train_mask = jnp.asarray(multi_hot(data.training_list, data.num_items))
        items, counts = pad_lists(data.test_list, pad_value=0)
        m = mean_metrics(eval_users(
            jnp.asarray(scores), train_mask, jnp.asarray(items),
            jnp.asarray(counts), args.top_k,
        ))
        return {"hr": float(m.hr), "rec": float(m.rec),
                "auc": float(m.auc), "ndcg": float(m.ndcg)}

    def run(max_user_pos, exact_eval, exact_train=False):
        import time

        model = ACF(
            data.num_users, data.num_items, spat, data,
            embed_k=args.embed_k, layers_component=(16, 1),
            layers_item=(16, 1), max_user_pos=max_user_pos,
            exact_eval=exact_eval, exact_train=exact_train,
            pos_chunk=32, seed=0,
        )
        cfg = TrainConfig(batch_size=args.batch, epochs=args.epochs,
                          lr=args.lr, reg=args.reg, top_k=args.top_k,
                          eval_every=10 ** 9)
        buf = io.StringIO()
        t0 = time.time()
        with contextlib.redirect_stdout(buf):
            state, frozen, _, _ = fit(model, data, cfg)
        elapsed = time.time() - t0
        m = metrics_of(np.asarray(model.predict_all(state.params, frozen)))
        m["train_s_per_epoch"] = elapsed / args.epochs
        return m

    full_cap = int(pos_counts.max())
    a = run(args.cap, exact_eval=False)
    b = run(args.cap, exact_eval=True)
    c = run(full_cap, exact_eval=True)
    d = run(args.cap, exact_eval=True, exact_train=True)

    def deltas(x):
        return {k: x[k] - c[k] for k in x if k != "train_s_per_epoch"}

    print(json.dumps({
        "pos_count_stats": {
            "min": int(pos_counts.min()), "median": float(np.median(pos_counts)),
            "max": int(pos_counts.max()),
            "frac_over_cap": float((pos_counts > args.cap).mean()),
        },
        "A_cap_train_cap_eval": a,
        "B_cap_train_exact_eval": b,
        "C_uncapped_exact_eval": c,
        "D_exact_train_exact_eval": d,
        "delta_A_vs_C": deltas(a),
        "delta_B_vs_C": deltas(b),
        "delta_D_vs_C": deltas(d),
        "config": vars(args),
    }))


if __name__ == "__main__":
    main()
