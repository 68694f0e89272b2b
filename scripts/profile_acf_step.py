"""Op-level profile of the ACF generic-packed epoch at the scaled config
(the SPEED.md round-3 ACF bound analysis).  Run on the real chip:
    python scripts/profile_acf_step.py
"""
import os
import sys
import tempfile

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)
import numpy as np
import jax
import jax.numpy as jnp

from scaled_bench import make_scaled_arrays
from profile_step import summarize_xplane
from fashionvisualexpl_tpu.models.acf import ACF
from fashionvisualexpl_tpu.train.packed_generic import (
    make_generic_packed_epoch_fn, pack_generic_state,
)

USERS, ITEMS, P = 1_000_000, 200_000, 20
STEPS, BATCH = 50, 8192
pairs, padded_pos, counts = make_scaled_arrays(USERS, ITEMS, P)
spat = np.random.default_rng(1).standard_normal(
    (ITEMS, 8, 64)
).astype(np.float32)
model = ACF(USERS, ITEMS, spat, embed_k=128,
            padded_positives=padded_pos, positive_counts=counts)
params, frozen = model.init(jax.random.PRNGKey(0))
state = pack_generic_state(model, params)
epoch_fn = make_generic_packed_epoch_fn(
    model, 0.001, 0.001, ITEMS, STEPS, BATCH
)
pairs_d, pos_d, cnt_d = map(jnp.asarray, (pairs, padded_pos, counts))
key = jax.random.PRNGKey(0)
print("built", flush=True)
for e in range(3):
    state, loss = epoch_fn(state, frozen, jax.random.fold_in(key, e),
                           pairs_d, pos_d, cnt_d)
    print("warm", e, float(loss), flush=True)
trace_dir = tempfile.mkdtemp(prefix="acf_prof_")
jax.profiler.start_trace(trace_dir)
state, loss = epoch_fn(state, frozen, jax.random.fold_in(key, 99),
                       pairs_d, pos_d, cnt_d)
float(loss)
jax.profiler.stop_trace()
print("trace in", trace_dir, f"({STEPS} steps x {BATCH})", flush=True)
summarize_xplane(trace_dir, top=28)
