"""Op-level profile of one training epoch: capture a jax.profiler trace and
print the top HLO ops by device time (the methodology behind SPEED.md's
phase attributions — standalone microbenchmarks are unreliable on this
platform, CLAUDE.md; profile in-context instead).

Run:  python scripts/profile_step.py [--model bprmf --users 10000 ...]
"""

import argparse
import glob
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def summarize_xplane(trace_dir: str, top: int = 25) -> None:
    """Print per-op totals from the newest xplane proto under trace_dir."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    )
    if not paths:
        print("no xplane.pb found under", trace_dir)
        return
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        tot = defaultdict(float)
        cnt = defaultdict(int)
        for line in plane.lines:
            for ev in line.events:
                n = ev_names.get(ev.metadata_id, "?")
                tot[n] += ev.duration_ps / 1e6  # us
                cnt[n] += 1
        if not tot:
            continue
        print(f"== {plane.name}: total {sum(tot.values()) / 1e3:.2f} ms")
        for n, us in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {us / 1e3:9.3f} ms x{cnt[n]:6d}  {n[:90]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=10_000)
    ap.add_argument("--items", type=int, default=10_000)
    ap.add_argument("--embed_k", type=int, default=64)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--pos_per_user", type=int, default=20)
    ap.add_argument("--train_path", choices=["generic", "packed"],
                    default="generic")
    ap.add_argument("--bootstrap", action="store_true")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--trace_dir", default=None,
                    help="keep the raw trace here (default: temp dir)")
    args = ap.parse_args()

    import jax

    from fashionvisualexpl_tpu.core.config import TrainConfig
    from fashionvisualexpl_tpu.data.interactions import synthetic_interactions
    from fashionvisualexpl_tpu.models.bprmf import BPRMF
    from fashionvisualexpl_tpu.train.trainer import Trainer

    data = synthetic_interactions(
        args.users, args.items, interactions_per_user=args.pos_per_user,
        seed=0,
    )
    cfg = TrainConfig(batch_size=args.batch, epochs=1, lr=0.001, reg=0.001,
                      train_path=args.train_path, bootstrap=args.bootstrap)
    model = BPRMF(data.num_users, data.num_items, embed_k=args.embed_k)
    trainer = Trainer(model, data, cfg)
    state, frozen = trainer.init_state()
    key = jax.random.PRNGKey(0)
    # warm: compile + two layout-settle epochs (CLAUDE.md)
    for e in range(3):
        state, loss = trainer.run_epoch(state, frozen, jax.random.fold_in(key, e))
        float(loss)

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="fvx_profile_")
    jax.profiler.start_trace(trace_dir)
    state, loss = trainer.run_epoch(state, frozen, jax.random.fold_in(key, 99))
    float(loss)
    jax.profiler.stop_trace()
    print(f"trace captured in {trace_dir} "
          f"({trainer.steps_per_epoch} steps x batch {args.batch})")
    summarize_xplane(trace_dir, top=args.top)


if __name__ == "__main__":
    main()
