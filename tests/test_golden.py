"""Golden regression pin (SURVEY.md §4 parity-test strategy): a fully seeded
2-epoch BPRMF run must reproduce these exact metrics.  Any change to the
sampler, loss, optimizer, or evaluator that shifts numerics shows up here.

Values generated on the CPU backend (the test platform); float tolerances
absorb compiler-version noise, not semantic drift.
"""

import contextlib
import io

import jax
import numpy as np

from fashionvisualexpl_tpu.core.config import TrainConfig
from fashionvisualexpl_tpu.data.interactions import synthetic_interactions
from fashionvisualexpl_tpu.eval.evaluator import Evaluator
from fashionvisualexpl_tpu.models.bprmf import BPRMF
from fashionvisualexpl_tpu.train.trainer import fit

# regenerated when the default sampling scheme became the reference-exact
# user-permutation epoch ordering (data/sampler.py `user_perm`)
GOLDEN = {
    1: {"hr_t": 0.14, "p_t": 0.014, "r_t": 0.14, "auc_t": 0.544706,
        "ndcg_t": 0.060982, "hr_v": 0.24, "p_v": 0.024, "r_v": 0.24,
        "auc_v": 0.549804, "ndcg_v": 0.099075},
    2: {"hr_t": 0.22, "p_t": 0.022, "r_t": 0.22, "auc_t": 0.55098,
        "ndcg_t": 0.093085, "hr_v": 0.24, "p_v": 0.024, "r_v": 0.24,
        "auc_v": 0.583137, "ndcg_v": 0.107478},
}


def test_golden_seeded_run():
    data = synthetic_interactions(50, 60, interactions_per_user=10, seed=42)
    cfg = TrainConfig(batch_size=32, epochs=2, lr=0.01, reg=0.001, top_k=10,
                      eval_every=1, seed=42)
    model = BPRMF(data.num_users, data.num_items, embed_k=8)
    ev = Evaluator(model, data, k=10, user_block=32)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        _, _, results, _ = fit(model, data, cfg, evaluator=ev)
    for epoch, want in GOLDEN.items():
        got = results[epoch]
        for key, value in want.items():
            np.testing.assert_allclose(
                got[key], value, rtol=2e-3, atol=2e-4,
                err_msg=f"epoch {epoch} metric {key}",
            )
