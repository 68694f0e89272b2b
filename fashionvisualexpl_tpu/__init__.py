"""fashionvisualexpl_tpu — a TPU-native visual recommender framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
`peternara/FashionVisualExpl-recommend` (reference mounted at /root/reference):
BPR triplet training of user/item embedding models (BPRMF, VBPR, GradFashion,
AttentiveFashion, ACF), fusion of pretrained CNN and low-level visual features,
full-catalog top-k evaluation (HR/Precision/Recall/AUC/NDCG), recommendation
dumps, and gradient-x-input explanations — rebuilt TPU-first:

- pure-functional train state + one shared jitted trainer (the reference puts
  the train loop inside every model class, src/recommender/models/BPRMF.py:127)
- on-device negative sampling (replacing the host rejection loop at
  src/dataset/dataset.py:100-103)
- vectorized on-device evaluation (replacing the per-user Python loop at
  src/recommender/Evaluator.py:181-187)
- row-sharded embedding tables over a jax.sharding.Mesh with collective
  lookup/update (the reference is single-device)
- Pallas kernels for the hot paths (fused BPR triplet scoring, embedding
  gather, blocked top-k)
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps `import fashionvisualexpl_tpu` light)."""
    surface = {
        "TrainConfig": "fashionvisualexpl_tpu.core.config",
        "Paths": "fashionvisualexpl_tpu.core.config",
        "MeshConfig": "fashionvisualexpl_tpu.core.config",
        "Interactions": "fashionvisualexpl_tpu.data.interactions",
        "synthetic_interactions": "fashionvisualexpl_tpu.data.interactions",
        "BPRMF": "fashionvisualexpl_tpu.models.bprmf",
        "VBPR": "fashionvisualexpl_tpu.models.vbpr",
        "GradFashion": "fashionvisualexpl_tpu.models.grad_fashion",
        "AttentiveFashion": "fashionvisualexpl_tpu.models.attentive_fashion",
        "ACF": "fashionvisualexpl_tpu.models.acf",
        "CompVBPR": "fashionvisualexpl_tpu.models.comp_vbpr",
        "Trainer": "fashionvisualexpl_tpu.train.trainer",
        "fit": "fashionvisualexpl_tpu.train.trainer",
        "Evaluator": "fashionvisualexpl_tpu.eval.evaluator",
        "FactoredEvaluator": "fashionvisualexpl_tpu.eval.factored",
        "CheckpointManager": "fashionvisualexpl_tpu.core.checkpoint",
    }
    if name in surface:
        import importlib

        return getattr(importlib.import_module(surface[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
