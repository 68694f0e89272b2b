"""ACF: Attentive Collaborative Filtering (Chen et al., SIGIR'17).

Capability parity with reference src/recommender/models/ACF.py — component-
level attention over per-item spatial CNN feature maps (ACF.py:135-162),
item-level attention over the user's positive items (ACF.py:164-179), user
profile gamma_u + sum(alpha * p_i), scoring <gamma_u_p, gamma_i> (ACF.py:208).

TPU-first redesign of the reference's pathologies: the reference loads each
positive item's spatial .npy from DISK inside call() (ACF.py:140-150) and
fans per-user work over a ThreadPoolExecutor (ACF.py:205-206) — here spatial
features are a device-resident [I, S, C] tensor in `frozen`, user positives
are a padded fixed-shape [U, P] table, and the whole batch's two-level
attention runs as one XLA program with masked softmax over the padding.

The positive-set cap P (`max_user_pos`) subsamples users with more positives
than P during TRAINING (the reference uses all, with ragged shapes XLA
cannot compile).  Both sides can be exact: `exact_eval=True` attends over
every positive at evaluation and `exact_train=True` does the same during
training WITH gradients, via a chunked lax.scan with online-softmax
renormalization (`_attentive_profile_chunked`, scan body rematerialized
for the backward pass) — no user is ever subsampled, matching reference
ACF.py:169-179,201-224 exactly at bounded memory.  The training cap's
measured accuracy impact (when exact_train is off) is recorded in
BASELINE.md (scripts/acf_cap_experiment.py).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fashionvisualexpl_tpu.core.precision import (
    cast_compute,
    cast_f32,
    resolve_compute_dtype,
)
from fashionvisualexpl_tpu.data.interactions import Interactions
from fashionvisualexpl_tpu.models.base import (
    Frozen,
    Params,
    RecommenderModel,
    bpr_pairwise_loss,
    glorot_uniform,
    l2_loss,
    normal_init,
)

NEG_BIG = -1e9


def _pad_user_pos(
    user_lists: Sequence[Sequence[int]], width: int, rng: np.random.Generator
) -> Tuple[np.ndarray, np.ndarray]:
    """[U, width] padded (subsampled if longer) positive ids + counts."""
    U = len(user_lists)
    out = np.zeros((U, width), dtype=np.int32)
    counts = np.zeros((U,), dtype=np.int32)
    for u, row in enumerate(user_lists):
        row = list(row)
        if len(row) > width:
            row = rng.choice(row, size=width, replace=False).tolist()
        counts[u] = len(row)
        out[u, : len(row)] = row
    return out, counts


class ACF(RecommenderModel):
    name = "acf"

    def __init__(
        self,
        num_users: int,
        num_items: int,
        spatial_features: np.ndarray,  # [I, S, C] per-item spatial CNN maps
        data: Optional[Interactions] = None,
        embed_k: int = 128,
        layers_component: Tuple[int, ...] = (64, 1),
        layers_item: Tuple[int, ...] = (64, 1),
        max_user_pos: Optional[int] = None,
        seed: int = 0,
        padded_positives: Optional[np.ndarray] = None,  # [U, P] int32
        positive_counts: Optional[np.ndarray] = None,  # [U] int32
        exact_eval: bool = False,
        exact_train: bool = False,
        pos_chunk: int = 64,
        compute_dtype: str = "float32",
    ):
        """Either `data` (per-user lists, padded/subsampled to
        `max_user_pos`, default 64) or precomputed
        `padded_positives`+`positive_counts` (then used for both the train
        and eval profiles — the array path for benchmarks and catalogs too
        large to hold as Python lists; `max_user_pos`, if given, must match
        the array width).

        `exact_eval=True` makes EVALUATION profiles attend over every
        positive like the reference (ACF.py:169-179) — the eval table pads
        to the true maximum positive count (no subsampling) and the profile
        runs as a lax.scan over `pos_chunk`-wide windows with online
        (running-max) softmax renormalization, so memory stays bounded at
        [B, pos_chunk, S, C] regardless of the heaviest user.

        `exact_train=True` additionally makes TRAINING profiles attend over
        every positive (the reference semantics, ACF.py:169-179,201-207 —
        no `max_user_pos` subsampling): the train table pads to the true
        maximum and gradients flow through the same chunked scan, with the
        scan body rematerialized (jax.checkpoint) so the backward pass
        recomputes each [B, W, S, C] window instead of saving them all.
        Requires the generic train path (the packed engine's
        fixed-extra-rows layout is exactly the cap being removed).  The
        cap's measured accuracy impact when exact_train is off: see
        scripts/acf_cap_experiment.py and BASELINE.md."""
        super().__init__(num_users, num_items)
        if spatial_features.shape[0] != num_items:
            raise ValueError("spatial features rows != num_items")
        if layers_component[-1] != 1 or layers_item[-1] != 1:
            raise ValueError("last attention layer width must be 1")
        self.embed_k = embed_k
        self.layers_component = tuple(layers_component)
        self.layers_item = tuple(layers_item)
        self.S = int(spatial_features.shape[1])
        self.C = int(spatial_features.shape[2])
        self._spatial = np.asarray(spatial_features, np.float32)
        self.exact_eval = bool(exact_eval)
        self.exact_train = bool(exact_train)
        self.pos_chunk = int(pos_chunk)
        # bf16 runs the two-level attention MLP einsums on the MXU at full
        # rate; softmax, masking, and the profile accumulation stay fp32
        # (the step's non-row cost is mostly these einsums, SPEED.md r3)
        self.compute_dtype = resolve_compute_dtype(compute_dtype)

        if padded_positives is not None:
            if positive_counts is None:
                raise ValueError("positive_counts required with padded_positives")
            width = int(padded_positives.shape[1])
            if max_user_pos is not None and int(max_user_pos) != width:
                raise ValueError(
                    f"max_user_pos={max_user_pos} != padded_positives "
                    f"width {width}"
                )
            self.max_user_pos = width
            self._pos_train = np.asarray(padded_positives, np.int32)
            self._cnt_train = np.asarray(positive_counts, np.int32)
            self._pos_eval, self._cnt_eval = self._pos_train, self._cnt_train
            return
        if data is None:
            raise ValueError("either data or padded_positives is required")
        self.max_user_pos = int(max_user_pos if max_user_pos is not None else 64)
        rng = np.random.default_rng(seed)
        # train-time profile uses train positives (ACF.py:201-203);
        # eval profile uses train+validation positives (ACF.py:216-218).
        # exact_train: pad to the TRUE maximum — no subsampling, matching
        # the reference's attend-over-all-positives training semantics
        train_width = (
            max(1, max(len(r) for r in data.training_list))
            if self.exact_train
            else self.max_user_pos
        )
        self._pos_train, self._cnt_train = _pad_user_pos(
            data.training_list, train_width, rng
        )
        eval_lists = [
            list(t) + list(v)
            for t, v in zip(data.training_list, data.validation_list)
        ]
        # exact_eval: pad to the TRUE maximum positive count — no user is
        # subsampled at evaluation (reference semantics, ACF.py:169-179)
        eval_width = (
            max(1, max(len(r) for r in eval_lists))
            if self.exact_eval
            else self.max_user_pos
        )
        self._pos_eval, self._cnt_eval = _pad_user_pos(
            eval_lists, eval_width, rng
        )

    def row_sharded_params(self):
        return ("Gu", "Gi", "Pi")

    def init(self, rng: jax.Array) -> Tuple[Params, Frozen]:
        ks = iter(jax.random.split(rng, 32))
        K, C = self.embed_k, self.C
        params = {
            "Gu": normal_init(next(ks), (self.num_users, K)),
            "Gi": normal_init(next(ks), (self.num_items, K)),
            "Pi": normal_init(next(ks), (self.num_items, K)),
        }
        comp = {}
        for c, width in enumerate(self.layers_component):
            if c == 0:
                comp["W0_u"] = glorot_uniform(next(ks), (K, width))
                comp["W0_i"] = glorot_uniform(next(ks), (C, width))
                comp["b0"] = glorot_uniform(next(ks), (1, width))[0]
            else:
                comp[f"W{c}"] = glorot_uniform(
                    next(ks), (width, self.layers_component[c - 1])
                )
                comp[f"b{c}"] = glorot_uniform(next(ks), (1, width))[0]
        item = {}
        for i, width in enumerate(self.layers_item):
            if i == 0:
                item["W0_u"] = glorot_uniform(next(ks), (K, width))
                item["W0_iv"] = glorot_uniform(next(ks), (K, width))
                item["W0_ip"] = glorot_uniform(next(ks), (K, width))
                item["W0_ix"] = glorot_uniform(next(ks), (C, width))
                item["b0"] = glorot_uniform(next(ks), (1, width))[0]
            else:
                item[f"W{i}"] = glorot_uniform(
                    next(ks), (width, self.layers_item[i - 1])
                )
                item[f"b{i}"] = glorot_uniform(next(ks), (1, width))[0]
        params["comp"] = comp
        params["item"] = item

        frozen = {
            "Fspat": jnp.asarray(self._spatial),
            "pos_train": jnp.asarray(self._pos_train),
            "cnt_train": jnp.asarray(self._cnt_train),
            "pos_eval": jnp.asarray(self._pos_eval),
            "cnt_eval": jnp.asarray(self._cnt_eval),
        }
        return params, frozen

    # --- the two-level attentive user profile (ACF.py:135-181) ---

    def _item_logits(self, comp, item, g_u, f, g_i, p_i):
        """Item-level attention logits [B, P] for pre-gathered positives:
        g_u [B, K], f [B, P, S, C], g_i/p_i [B, P, K].  The component-level
        softmax over the spatial axis S happens inside (ACF.py:152-162).

        With compute_dtype=bfloat16 the MLP einsums run bf16 on the MXU;
        both softmaxes and the returned logits are fp32."""
        cd = self.compute_dtype
        g_u, f, g_i, p_i = (cast_compute(x, cd) for x in (g_u, f, g_i, p_i))
        comp = {k: cast_compute(v, cd) for k, v in comp.items()}
        item = {k: cast_compute(v, cd) for k, v in item.items()}
        b = (
            (g_u @ comp["W0_u"])[:, None, None, :]
            + jnp.einsum("bpsc,ct->bpst", f, comp["W0_i"])
            + comp["b0"]
        )
        b = jax.nn.relu(b)
        for c in range(1, len(self.layers_component)):
            b = jnp.einsum("bpst,ut->bpsu", b, comp[f"W{c}"]) + comp[f"b{c}"]
        beta = jax.nn.softmax(cast_f32(b[..., 0]), axis=2)  # [B, P, S] f32
        x_l = jnp.einsum("bps,bpsc->bpc", cast_compute(beta, cd), f)

        a = (
            (g_u @ item["W0_u"])[:, None, :]
            + g_i @ item["W0_iv"]
            + p_i @ item["W0_ip"]
            + x_l @ item["W0_ix"]
            + item["b0"]
        )
        a = jax.nn.relu(a)
        for i in range(1, len(self.layers_item)):
            a = jnp.einsum("bpt,ut->bpu", a, item[f"W{i}"]) + item[f"b{i}"]
        return cast_f32(a[..., 0])  # [B, P] f32

    def _attentive_profile(self, comp, item, g_u, f, g_i, p_i, cnt):
        """The two-level attention math over pre-gathered inputs.  Shared by
        the generic path (user_profile) and the packed fast path
        (packed_loss), so the semantics cannot drift."""
        logits = self._item_logits(comp, item, g_u, f, g_i, p_i)
        # mask padded positives out of the item-level softmax (ACF.py:177)
        valid = jnp.arange(logits.shape[1])[None, :] < cnt[:, None]
        alpha = jax.nn.softmax(jnp.where(valid, logits, NEG_BIG), axis=1)
        alpha = jnp.where(valid, alpha, 0.0)
        profile = jnp.einsum("bp,bpk->bk", alpha, p_i)
        # users with zero positives keep their plain embedding
        profile = jnp.where(cnt[:, None] > 0, profile, 0.0)
        return g_u + profile

    def _attentive_profile_chunked(self, params, frozen, g_u, pos, cnt):
        """Exact full-positive-set profile (reference attends over ALL
        positives, ACF.py:169-179): lax.scan over `pos_chunk`-wide windows
        of the padded positive list with flash-attention-style online
        softmax (running max m, denominator s, weighted-sum accumulator) —
        peak memory [B, W, S, C] independent of the heaviest user."""
        comp, item = params["comp"], params["item"]
        B, Pmax = pos.shape
        W = min(self.pos_chunk, Pmax)
        n_chunks = -(-Pmax // W)
        pos_p = jnp.pad(pos, ((0, 0), (0, n_chunks * W - Pmax)))
        chunks = jnp.moveaxis(pos_p.reshape(B, n_chunks, W), 1, 0)  # [n,B,W]
        offs = jnp.arange(n_chunks, dtype=jnp.int32) * W
        K = g_u.shape[-1]

        def body(carry, xs):
            m, s, acc = carry
            ids, off = xs  # [B, W], scalar
            f = jnp.take(frozen["Fspat"], ids, axis=0)  # [B, W, S, C]
            flat = ids.reshape(-1)
            g_i = self.take("Gi", params["Gi"], flat).reshape(B, W, -1)
            p_i = self.take("Pi", params["Pi"], flat).reshape(B, W, -1)
            logits = self._item_logits(comp, item, g_u, f, g_i, p_i)
            valid = (off + jnp.arange(W, dtype=jnp.int32))[None, :] < cnt[:, None]
            logits = jnp.where(valid, logits, NEG_BIG)
            m_new = jnp.maximum(m, logits.max(axis=1))
            scale = jnp.exp(m - m_new)
            e = jnp.exp(logits - m_new[:, None]) * valid
            s = s * scale + e.sum(axis=1)
            acc = acc * scale[:, None] + jnp.einsum("bw,bwk->bk", e, p_i)
            return (m_new, s, acc), None

        init = (
            jnp.full((B,), NEG_BIG, jnp.float32),
            jnp.zeros((B,), jnp.float32),
            jnp.zeros((B, K), jnp.float32),
        )
        # remat the body: under jax.grad (exact_train) the backward pass
        # recomputes each [B, W, S, C] window instead of saving all of them
        (m, s, acc), _ = jax.lax.scan(jax.checkpoint(body), init, (chunks, offs))
        profile = acc / jnp.maximum(s, 1e-30)[:, None]
        profile = jnp.where(cnt[:, None] > 0, profile, 0.0)
        return g_u + profile

    def user_profile(self, params, frozen, users, train_only=True):
        """gamma_u + sum_p alpha_p p_i over the user's positives.  [B, K]."""
        pos_key = "pos_train" if train_only else "pos_eval"
        cnt_key = "cnt_train" if train_only else "cnt_eval"
        # self.take routes through the collective lookup for the row-sharded
        # tables under SPMD (frozen positives/spatial maps stay replicated)
        pos = jnp.take(frozen[pos_key], users, axis=0)  # [B, P]
        cnt = jnp.take(frozen[cnt_key], users)  # [B]
        g_u = self.take("Gu", params["Gu"], users)  # [B, K]
        if (self.exact_train if train_only else self.exact_eval):
            return self._attentive_profile_chunked(params, frozen, g_u, pos, cnt)
        f = jnp.take(frozen["Fspat"], pos, axis=0)  # [B, P, S, C]
        B_, P_ = pos.shape
        g_i = self.take("Gi", params["Gi"], pos.reshape(-1)).reshape(
            B_, P_, -1
        )  # [B, P, K]
        p_i = self.take("Pi", params["Pi"], pos.reshape(-1)).reshape(
            B_, P_, -1
        )  # [B, P, K]
        return self._attentive_profile(
            params["comp"], params["item"], g_u, f, g_i, p_i, cnt
        )

    # --- scoring / training ---

    def score(self, params, frozen, users, items, train_only=True):
        g_u_p = self.user_profile(params, frozen, users, train_only)
        gamma_i = jnp.take(params["Gi"], items, axis=0)
        return jnp.sum(g_u_p * gamma_i, axis=-1)

    def loss(self, params, frozen, users, pos, neg, reg, rng=None):
        g_u_p = self.user_profile(params, frozen, users, train_only=True)
        gamma_u = self.take("Gu", params["Gu"], users)
        gamma_pos = self.take("Gi", params["Gi"], pos)
        gamma_neg = self.take("Gi", params["Gi"], neg)
        p_pos = self.take("Pi", params["Pi"], pos)
        p_neg = self.take("Pi", params["Pi"], neg)

        x_pos = jnp.sum(g_u_p * gamma_pos, axis=1)
        x_neg = jnp.sum(g_u_p * gamma_neg, axis=1)
        loss = bpr_pairwise_loss(x_pos, x_neg)

        att_l2 = sum(l2_loss(v) for v in params["comp"].values()) + sum(
            l2_loss(v) for v in params["item"].values()
        )
        # ACF.py:247-256 — batch embeddings + ALL attention matrices
        reg_loss = (
            reg
            * (
                l2_loss(gamma_u)
                + l2_loss(gamma_pos)
                + l2_loss(gamma_neg)
                + l2_loss(p_pos)
                + l2_loss(p_neg)
            )
            * 2.0
            + self.global_reg_scale * reg * att_l2 * 2.0
        )
        return loss + reg_loss

    # --- packed fast path (train/packed_generic.py) ---

    def packed_spec(self):
        from fashionvisualexpl_tpu.models.base import PackedSpec

        if self.exact_train:
            raise ValueError(
                "acf exact_train requires the generic train path: the "
                "packed engine's fixed extra_items row layout is exactly "
                "the per-user positive cap exact_train removes"
            )
        # the attentive profile reads Gi/Pi rows of each user's padded
        # positive set (ACF.py:164-179) beyond the batch pos/neg rows —
        # declared via extra_items so the engine gathers them and routes
        # their grads through the shared item-row dedupe
        return PackedSpec(
            user_tables=(("Gu", self.embed_k),),
            item_tables=(("Gi", self.embed_k), ("Pi", self.embed_k)),
            item_scalars=(),
            dense=("comp", "item"),
            extra_items=self.max_user_pos,
            # the [S, C] spatial map rides the packed item row so the B*P
            # extra-row gathers (the step's bottleneck — row-DMA-latency
            # bound) also deliver the features: one gather instead of two
            frozen_item_tables=(("Fspat", self.S * self.C),),
        )

    def packed_extra_item_ids(self, frozen, ids):
        # _attentive_profile masks padded slots out of the item-level
        # softmax, so their gradient contribution is zero.  Padded slots are
        # remapped to the batch element's OWN positive item (already in the
        # step's dedupe as a pos row) rather than left at row 0 — otherwise
        # item 0 would be "touched" every step and collect per-step LazyAdam
        # momentum-tail updates no other idle row gets.
        users, p_ids, _ = ids
        pos = jnp.take(frozen["pos_train"], users, axis=0)  # [B, P]
        cnt = jnp.take(frozen["cnt_train"], users)  # [B]
        valid = jnp.arange(pos.shape[1])[None, :] < cnt[:, None]
        return jnp.where(valid, pos, p_ids[:, None])

    def packed_loss(self, user_vw, pos_vw, neg_vw, dense, frozen, ids,
                    reg, rng=None, extra_vw=None, frozen_vw=None):
        users = ids[0]
        cnt = jnp.take(frozen["cnt_train"], users)  # [B]
        if frozen_vw is not None:
            # Fspat columns ride the extra item rows (padded slots carry the
            # remapped pos item's map — masked out of the softmax either way)
            x = frozen_vw["extra"]["Fspat"]  # [B, P, S*C]
            f = x.reshape(*x.shape[:2], self.S, self.C)
        else:
            pos = jnp.take(frozen["pos_train"], users, axis=0)  # [B, P]
            f = jnp.take(frozen["Fspat"], pos, axis=0)  # [B, P, S, C]
        gamma_u = user_vw["Gu"]
        g_u_p = self._attentive_profile(
            dense["comp"], dense["item"], gamma_u, f,
            extra_vw["Gi"], extra_vw["Pi"], cnt,
        )
        gamma_pos, gamma_neg = pos_vw["Gi"], neg_vw["Gi"]
        p_pos, p_neg = pos_vw["Pi"], neg_vw["Pi"]
        x_pos = jnp.sum(g_u_p * gamma_pos, axis=1)
        x_neg = jnp.sum(g_u_p * gamma_neg, axis=1)
        loss = bpr_pairwise_loss(x_pos, x_neg)

        att_l2 = sum(l2_loss(v) for v in dense["comp"].values()) + sum(
            l2_loss(v) for v in dense["item"].values()
        )
        # ACF.py:247-256 — batch embeddings + ALL attention matrices
        reg_loss = (
            reg
            * (
                l2_loss(gamma_u)
                + l2_loss(gamma_pos)
                + l2_loss(gamma_neg)
                + l2_loss(p_pos)
                + l2_loss(p_neg)
            )
            * 2.0
            + self.global_reg_scale * reg * att_l2 * 2.0
        )
        return loss + reg_loss

    # --- eval ---

    def precompute_eval(self, params, frozen):
        """Attentive profiles for all users, computed once per evaluation in
        user blocks (the reference recomputes them in a thread pool per
        predict_all call, ACF.py:213-224)."""
        U = self.num_users
        blk = 256
        n_blocks = -(-U // blk)
        ids = jnp.arange(n_blocks * blk) % U

        def one(block_ids):
            return self.user_profile(params, frozen, block_ids, train_only=False)

        profiles = jax.lax.map(one, ids.reshape(n_blocks, blk))
        return profiles.reshape(-1, self.embed_k)[:U]

    def predict_user_block(self, params, frozen, user_ids, ctx=None):
        profiles = ctx if ctx is not None else self.precompute_eval(params, frozen)
        gu_p = jnp.take(profiles, user_ids, axis=0)
        return gu_p @ params["Gi"].T

    def predict_all(self, params, frozen):
        ctx = self.precompute_eval(params, frozen)
        return ctx @ params["Gi"].T

    def factored_eval(self, params, frozen):
        """Factored scores for the streaming evaluator (eval/factored.py):
        user side is the attentive profile, item side Gi, no bias."""
        return self.precompute_eval(params, frozen), params["Gi"], None
