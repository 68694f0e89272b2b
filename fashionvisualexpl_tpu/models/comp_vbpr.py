"""CompVBPR: component-ablatable VBPR over four visual feature families.

Capability parity with reference src/recommender/models/CompVBPR.py (459
LoC) — the component-study variant of VBPR whose four feature families
(semantic / color / edges / texture) are individually toggled by
`activated_components` and mixed by `weight_components`
(CompVBPR.py:33-34, scoring CompVBPR.py:190-200):

- semantic / color / texture: frozen feature matrix ``F*`` with a learned
  projection ``E* [dim, d]``, per-user visual profile ``Tu* [U, d]`` and
  visual bias ``Bp* [dim, 1]`` (CompVBPR.py:57-94); the family's score
  contribution is ``w * (<Tu*_u, F*_i @ E*> + F*_i . Bp*)``.
- edges: a TRAINABLE AlexNet-style CNN tower (models/cnn.py) encodes the
  item's edge image in-step to ``theta_e [d]`` (CompVBPR.py:96-103, :173);
  contribution ``w * (<Tue_u, theta_e_i> + theta_e_i . Bpe)`` — note the
  bias rides the ENCODED d-dim vector, not raw features (CompVBPR.py:199).

The reference is unregistered/WIP as-shipped (its texture loader only
exists in the OLD mixin, SURVEY.md C12); here it is a first-class model:
texture features load from the OLD mixin's artifact path
(OLD_visual_loader_mixin.py:35-42), eval encodes every item's edge image
ONCE per evaluation in fixed-size device blocks (the reference re-runs the
CNN per item in a host Python loop at predict_all, CompVBPR.py:395-408),
and the whole step is one jitted program.

Loss parity (CompVBPR.py:264-293): BPR pairwise with the clip(-80, 1e8)
quirk; reg on the batch-gathered user/item collaborative factors and the
gathered per-family user profiles; the negative item bias reg divided by
10; whole-matrix reg on every family's E*/Bp* and on the CNN's non-bias
weights (CompVBPR.py:286-290) — whole-matrix terms multiply
`global_reg_scale` so they are counted once across data-parallel replicas.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fashionvisualexpl_tpu.models.base import (
    Frozen,
    Params,
    RecommenderModel,
    bpr_pairwise_loss,
    glorot_uniform,
    l2_loss,
)
from fashionvisualexpl_tpu.models.cnn import CNN

# family order is the reference's activated_components order
# (CompVBPR.py:38-52): [semantic, color, edges, texture]
FAMILIES = ("semantic", "color", "edges", "texture")


class CompVBPR(RecommenderModel):
    name = "comp_vbpr"

    def __init__(
        self,
        num_users: int,
        num_items: int,
        semantic_features: Optional[np.ndarray] = None,  # [I, dim_s]
        color_features: Optional[np.ndarray] = None,  # [I, dim_c]
        edge_images: Optional[np.ndarray] = None,  # [I, H, W, C]
        texture_features: Optional[np.ndarray] = None,  # [I, dim_t]
        embed_k: int = 128,
        embed_d: int = 20,
        activated_components: Optional[Tuple[bool, ...]] = None,
        weight_components: Tuple[float, ...] = (0.25, 0.25, 0.25, 0.25),
        eval_encode_block: int = 64,
        compute_dtype: str = "float32",
    ):
        super().__init__(num_users, num_items)
        feats = (semantic_features, color_features, edge_images, texture_features)
        if activated_components is None:
            activated_components = tuple(f is not None for f in feats)
        activated_components = tuple(bool(a) for a in activated_components)
        if len(activated_components) != 4 or len(weight_components) != 4:
            raise ValueError("activated/weight_components must have 4 entries")
        for fam, act, f in zip(FAMILIES, activated_components, feats):
            if act and f is None:
                raise ValueError(f"{fam} component activated but no features")
            if act and f.shape[0] != num_items:
                raise ValueError(f"{fam} features rows != num_items")
        self.activated = activated_components
        self.weights = tuple(float(w) for w in weight_components)
        self.embed_k = embed_k
        self.embed_d = embed_d
        self.eval_encode_block = eval_encode_block

        self._semantic = None if semantic_features is None else np.asarray(
            semantic_features, np.float32
        )
        self._color = None if color_features is None else np.asarray(
            color_features, np.float32
        )
        self._edges = None if edge_images is None else np.asarray(
            edge_images, np.float32
        )
        self._texture = None if texture_features is None else np.asarray(
            texture_features, np.float32
        )
        if self.activated[2]:
            h, w, c = self._edges.shape[1:]
            # bf16 MXU path for the trainable edge tower (core/precision.py);
            # the linear family projections stay fp32 (tiny matmuls, and the
            # score accumulation must be fp32 anyway)
            self.cnn = CNN(embed_d, in_channels=c, input_hw=(h, w),
                           compute_dtype=compute_dtype)
        else:
            self.cnn = None

    # --- structure ---

    def row_sharded_params(self):
        names = ["Bi", "Gu", "Gi"]
        for fam, act in zip(("Tus", "Tuc", "Tue", "Tut"), self.activated):
            if act:
                names.append(fam)
        for frz, act in zip(
            ("Fs", "Fc", "Fe_img", "Ft"),
            (self.activated[0], self.activated[1], self.activated[2],
             self.activated[3]),
        ):
            if act:
                names.append(frz)
        return tuple(names)

    def init(self, rng: jax.Array) -> Tuple[Params, Frozen]:
        ks = iter(jax.random.split(rng, 16))
        params: Dict[str, jax.Array] = {
            "Bi": jnp.zeros((self.num_items,), jnp.float32),
            "Gu": glorot_uniform(next(ks), (self.num_users, self.embed_k)),
            "Gi": glorot_uniform(next(ks), (self.num_items, self.embed_k)),
        }
        frozen: Dict[str, jax.Array] = {}
        d = self.embed_d
        if self.activated[0]:
            dim = self._semantic.shape[1]
            params["Bps"] = glorot_uniform(next(ks), (dim, 1))
            params["Tus"] = glorot_uniform(next(ks), (self.num_users, d))
            params["Es"] = glorot_uniform(next(ks), (dim, d))
            frozen["Fs"] = jnp.asarray(self._semantic)
        if self.activated[1]:
            dim = self._color.shape[1]
            params["Bpc"] = glorot_uniform(next(ks), (dim, 1))
            params["Tuc"] = glorot_uniform(next(ks), (self.num_users, d))
            params["Ec"] = glorot_uniform(next(ks), (dim, d))
            frozen["Fc"] = jnp.asarray(self._color)
        if self.activated[2]:
            params["cnn"] = self.cnn.init(next(ks))
            params["Bpe"] = glorot_uniform(next(ks), (d, 1))
            params["Tue"] = glorot_uniform(next(ks), (self.num_users, d))
            frozen["Fe_img"] = jnp.asarray(self._edges)
        if self.activated[3]:
            dim = self._texture.shape[1]
            params["Bpt"] = glorot_uniform(next(ks), (dim, 1))
            params["Tut"] = glorot_uniform(next(ks), (self.num_users, d))
            params["Et"] = glorot_uniform(next(ks), (dim, d))
            frozen["Ft"] = jnp.asarray(self._texture)
        return params, frozen

    # --- scoring pieces ---

    def _frozen_family_terms(self, params, theta_u, feat_i, E, Bp, weight):
        """w * (<theta_u, feat @ E> + feat . Bp)  (CompVBPR.py:192-198)."""
        theta_i = feat_i @ E
        return weight * (
            jnp.sum(theta_u * theta_i, axis=-1) + (feat_i @ Bp)[..., 0]
        )

    def _score_parts(self, params, frozen, users, items, edges_theta=None):
        """Pointwise scores for gathered ids; edges_theta lets callers pass
        pre-encoded CNN outputs (eval path encodes items once)."""
        gu = jnp.take(params["Gu"], users, axis=0)
        gi = jnp.take(params["Gi"], items, axis=0)
        x = jnp.take(params["Bi"], items) + jnp.sum(gu * gi, axis=-1)
        if self.activated[0]:
            x = x + self._frozen_family_terms(
                params, jnp.take(params["Tus"], users, axis=0),
                jnp.take(frozen["Fs"], items, axis=0),
                params["Es"], params["Bps"], self.weights[0],
            )
        if self.activated[1]:
            x = x + self._frozen_family_terms(
                params, jnp.take(params["Tuc"], users, axis=0),
                jnp.take(frozen["Fc"], items, axis=0),
                params["Ec"], params["Bpc"], self.weights[1],
            )
        if self.activated[2]:
            theta_e = (
                edges_theta
                if edges_theta is not None
                else self.cnn.apply(
                    params["cnn"], jnp.take(frozen["Fe_img"], items, axis=0)
                )
            )
            x = x + self.weights[2] * (
                jnp.sum(jnp.take(params["Tue"], users, axis=0) * theta_e,
                        axis=-1)
                + (theta_e @ params["Bpe"])[..., 0]
            )
        if self.activated[3]:
            x = x + self._frozen_family_terms(
                params, jnp.take(params["Tut"], users, axis=0),
                jnp.take(frozen["Ft"], items, axis=0),
                params["Et"], params["Bpt"], self.weights[3],
            )
        return x

    def score(self, params, frozen, users, items):
        return self._score_parts(params, frozen, users, items)

    # --- training loss (CompVBPR.py:215-311) ---

    def loss(self, params, frozen, users, pos, neg, reg, rng=None):
        gamma_u = self.take("Gu", params["Gu"], users)
        theta_us = {}
        for key, tab in (("s", "Tus"), ("c", "Tuc"), ("e", "Tue"),
                         ("t", "Tut")):
            if tab in params:
                theta_us[key] = self.take(tab, params[tab], users)

        rng_pos, rng_neg = (
            jax.random.split(rng) if rng is not None else (None, None)
        )
        x, kept = {}, {}
        for tag, ids, r in (("pos", pos, rng_pos), ("neg", neg, rng_neg)):
            gamma_i = self.take("Gi", params["Gi"], ids)
            beta_i = self.take("Bi", params["Bi"], ids)
            xi = beta_i + jnp.sum(gamma_u * gamma_i, axis=-1)
            if self.activated[0]:
                xi = xi + self._frozen_family_terms(
                    params, theta_us["s"],
                    self.take("Fs", frozen["Fs"], ids),
                    params["Es"], params["Bps"], self.weights[0],
                )
            if self.activated[1]:
                xi = xi + self._frozen_family_terms(
                    params, theta_us["c"],
                    self.take("Fc", frozen["Fc"], ids),
                    params["Ec"], params["Bpc"], self.weights[1],
                )
            if self.activated[2]:
                theta_e = self.cnn.apply(
                    params["cnn"],
                    self.take("Fe_img", frozen["Fe_img"], ids),
                    rng=r,
                )
                xi = xi + self.weights[2] * (
                    jnp.sum(theta_us["e"] * theta_e, axis=-1)
                    + (theta_e @ params["Bpe"])[..., 0]
                )
            if self.activated[3]:
                xi = xi + self._frozen_family_terms(
                    params, theta_us["t"],
                    self.take("Ft", frozen["Ft"], ids),
                    params["Et"], params["Bpt"], self.weights[3],
                )
            x[tag] = xi
            kept[tag] = (gamma_i, beta_i)

        loss = bpr_pairwise_loss(x["pos"], x["neg"])

        gamma_pos, beta_pos = kept["pos"]
        gamma_neg, beta_neg = kept["neg"]
        # CompVBPR.py:268-277 — gathered factors + per-family user profiles,
        # neg bias at reg/10
        reg_loss = (
            reg
            * (
                l2_loss(gamma_u)
                + l2_loss(gamma_pos)
                + l2_loss(gamma_neg)
                + sum(l2_loss(t) for t in theta_us.values())
            )
            * 2.0
            + reg * l2_loss(beta_pos) * 2.0
            + reg * l2_loss(beta_neg) * 2.0 / 10.0
        )
        # CompVBPR.py:278-290 — whole-matrix E*/Bp* and CNN non-bias weights
        whole = jnp.float32(0.0)
        for nm in ("Es", "Ec", "Et", "Bps", "Bpc", "Bpt", "Bpe"):
            if nm in params:
                whole = whole + l2_loss(params[nm])
        if self.activated[2]:
            whole = whole + sum(
                l2_loss(v) for k, v in params["cnn"].items()
                if not k.endswith("_b")
            )
        reg_loss = reg_loss + self.global_reg_scale * reg * whole * 2.0
        return loss + reg_loss

    # --- packed fast path (train/packed_generic.py) ---

    def packed_spec(self):
        from fashionvisualexpl_tpu.models.base import PackedSpec

        user = [("Gu", self.embed_k)]
        dense = []
        for act, tu, mats in (
            (self.activated[0], "Tus", ("Es", "Bps")),
            (self.activated[1], "Tuc", ("Ec", "Bpc")),
            (self.activated[2], "Tue", ("cnn", "Bpe")),
            (self.activated[3], "Tut", ("Et", "Bpt")),
        ):
            if act:
                user.append((tu, self.embed_d))
                dense.extend(mats)
        return PackedSpec(
            user_tables=tuple(user),
            item_tables=(("Gi", self.embed_k),),
            item_scalars=("Bi",),
            dense=tuple(dense),
        )

    def packed_loss(self, user_vw, pos_vw, neg_vw, dense, frozen, ids,
                    reg, rng=None):
        _, p_ids, n_ids = ids
        gamma_u = user_vw["Gu"]
        theta_us = {
            key: user_vw[tab]
            for key, tab in (("s", "Tus"), ("c", "Tuc"), ("e", "Tue"),
                             ("t", "Tut"))
            if tab in user_vw
        }
        rng_pos, rng_neg = (
            jax.random.split(rng) if rng is not None else (None, None)
        )
        x = {}
        for tag, vw, item_ids, r in (
            ("pos", pos_vw, p_ids, rng_pos), ("neg", neg_vw, n_ids, rng_neg)
        ):
            xi = vw["Bi"] + jnp.sum(gamma_u * vw["Gi"], axis=-1)
            if self.activated[0]:
                xi = xi + self._frozen_family_terms(
                    dense, theta_us["s"],
                    self.take("Fs", frozen["Fs"], item_ids),
                    dense["Es"], dense["Bps"], self.weights[0],
                )
            if self.activated[1]:
                xi = xi + self._frozen_family_terms(
                    dense, theta_us["c"],
                    self.take("Fc", frozen["Fc"], item_ids),
                    dense["Ec"], dense["Bpc"], self.weights[1],
                )
            if self.activated[2]:
                theta_e = self.cnn.apply(
                    dense["cnn"],
                    self.take("Fe_img", frozen["Fe_img"], item_ids),
                    rng=r,
                )
                xi = xi + self.weights[2] * (
                    jnp.sum(theta_us["e"] * theta_e, axis=-1)
                    + (theta_e @ dense["Bpe"])[..., 0]
                )
            if self.activated[3]:
                xi = xi + self._frozen_family_terms(
                    dense, theta_us["t"],
                    self.take("Ft", frozen["Ft"], item_ids),
                    dense["Et"], dense["Bpt"], self.weights[3],
                )
            x[tag] = xi

        loss = bpr_pairwise_loss(x["pos"], x["neg"])
        # CompVBPR.py:268-277 — gathered factors + per-family user profiles,
        # neg bias at reg/10
        reg_loss = (
            reg
            * (
                l2_loss(gamma_u)
                + l2_loss(pos_vw["Gi"])
                + l2_loss(neg_vw["Gi"])
                + sum(l2_loss(t) for t in theta_us.values())
            )
            * 2.0
            + reg * l2_loss(pos_vw["Bi"]) * 2.0
            + reg * l2_loss(neg_vw["Bi"]) * 2.0 / 10.0
        )
        # CompVBPR.py:278-290 — whole-matrix E*/Bp* and CNN non-bias weights
        whole = jnp.float32(0.0)
        for nm in ("Es", "Ec", "Et", "Bps", "Bpc", "Bpt", "Bpe"):
            if nm in dense:
                whole = whole + l2_loss(dense[nm])
        if self.activated[2]:
            whole = whole + sum(
                l2_loss(v) for k, v in dense["cnn"].items()
                if not k.endswith("_b")
            )
        reg_loss = reg_loss + self.global_reg_scale * reg * whole * 2.0
        return loss + reg_loss

    # --- evaluation (CompVBPR.py:388-459, items encoded once) ---

    def encode_all_edges(self, params, frozen):
        """[I, d] CNN codes of every item's edge image, in fixed-size blocks
        (the reference loops items on the host per predict_all,
        CompVBPR.py:395-408)."""
        imgs = frozen["Fe_img"]
        n = imgs.shape[0]
        blk = min(self.eval_encode_block, n)
        pad = (-n) % blk
        padded = jnp.concatenate([imgs, jnp.zeros((pad,) + imgs.shape[1:],
                                                  imgs.dtype)]) if pad else imgs
        blocks = padded.reshape(-1, blk, *imgs.shape[1:])
        codes = jax.lax.map(
            lambda b: self.cnn.apply(params["cnn"], b), blocks
        )
        return codes.reshape(-1, self.embed_d)[:n]

    def item_factors(self, params, frozen):
        """Per-family projected item factors [I, d] and the summed weighted
        visual bias vector [I] (theta_i_* of CompVBPR.py:410-428)."""
        thetas = []
        bias = jnp.zeros((self.num_items,), jnp.float32)
        if self.activated[0]:
            thetas.append(frozen["Fs"] @ params["Es"])
            bias = bias + self.weights[0] * (frozen["Fs"] @ params["Bps"])[:, 0]
        if self.activated[1]:
            thetas.append(frozen["Fc"] @ params["Ec"])
            bias = bias + self.weights[1] * (frozen["Fc"] @ params["Bpc"])[:, 0]
        if self.activated[2]:
            fe = self.encode_all_edges(params, frozen)
            thetas.append(fe)
            bias = bias + self.weights[2] * (fe @ params["Bpe"])[:, 0]
        if self.activated[3]:
            thetas.append(frozen["Ft"] @ params["Et"])
            bias = bias + self.weights[3] * (frozen["Ft"] @ params["Bpt"])[:, 0]
        return thetas, bias

    def _user_factor_tables(self, params):
        """Activated per-family user profiles, pre-scaled by their mix
        weight (weight rides the user side so item factors stay raw)."""
        out = []
        for tab, w, act in (
            ("Tus", self.weights[0], self.activated[0]),
            ("Tuc", self.weights[1], self.activated[1]),
            ("Tue", self.weights[2], self.activated[2]),
            ("Tut", self.weights[3], self.activated[3]),
        ):
            if act:
                out.append(w * params[tab])
        return out

    def factored_eval(self, params, frozen):
        """(user factors, item factors, item bias) for the streaming
        evaluator — scores == predict_all up to reduction order."""
        thetas, vis_bias = self.item_factors(params, frozen)
        uf = jnp.concatenate([params["Gu"]] + self._user_factor_tables(params),
                             axis=1)
        vf = jnp.concatenate([params["Gi"]] + thetas, axis=1)
        return uf, vf, params["Bi"] + vis_bias

    def precompute_eval(self, params, frozen):
        return self.item_factors(params, frozen)

    def predict_user_block(self, params, frozen, user_ids, ctx=None):
        thetas, vis_bias = (
            ctx if ctx is not None else self.item_factors(params, frozen)
        )
        x = (
            params["Bi"][None, :]
            + jnp.take(params["Gu"], user_ids, axis=0) @ params["Gi"].T
            + vis_bias[None, :]
        )
        for tu, theta in zip(self._user_factor_tables(params), thetas):
            x = x + jnp.take(tu, user_ids, axis=0) @ theta.T
        return x

    def predict_all(self, params, frozen):
        thetas, vis_bias = self.item_factors(params, frozen)
        x = params["Bi"][None, :] + params["Gu"] @ params["Gi"].T + vis_bias[None, :]
        for tu, theta in zip(self._user_factor_tables(params), thetas):
            x = x + tu @ theta.T
        return x
