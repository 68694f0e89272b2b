"""AttentiveFashion: trainable per-modality encoders + attention fusion.

Capability parity with reference src/recommender/models/AttentiveFashion.py
(the reference's default model, train_rec.py:22):

- color encoder: Dense(256, relu) -> Dropout(0.5) -> Dense(K, no bias)
  (AttentiveFashion.py:50-55)
- edges encoder: Conv2D(64, 5x5, same, relu) -> MaxPool(2x2, same) ->
  GlobalAvgPool -> Dropout(0.5) -> Dense(K, no bias) (:57-64)
- class encoder: same MLP shape as color (:66-71)
- attention over the 3 user-gated modality embeddings: relu((gamma_u (x) e_m)
  W1 + b1) -> ... -> softmax over modalities (:121-166)
- score x_ui = sum(gamma_u * (sum_m alpha_m e_m) * gamma_i) (:193-199)
- reg on batch embeddings, ENCODER OUTPUT activations, and the attention
  matrices (:228-243)

TPU-first redesign of the two pathologies SURVEY.md flags:
- the reference re-encodes every item for EVERY user during eval
  (predict_all_batch, :333-371, O(U x I) encoder calls).  Here items are
  encoded ONCE per evaluation (precompute_eval) and scoring runs blocked
  user x item attention on the cached [I, 3, K] tensor;
- the reference streams images through tf.py_function per triplet
  (dataset.py:124-139).  Here modality inputs live in the `frozen` pytree
  as dense device arrays (edge maps [I, H, W, 1]); a host-streaming variant
  for catalogs too large for HBM plugs in at the same interface.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fashionvisualexpl_tpu.core.precision import (
    cast_compute,
    cast_f32,
    resolve_compute_dtype,
)
from fashionvisualexpl_tpu.models.base import (
    Frozen,
    Params,
    RecommenderModel,
    bpr_pairwise_loss,
    glorot_uniform,
    l2_loss,
)


def _dropout(x, rate, rng):
    if rng is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


class AttentiveFashion(RecommenderModel):
    name = "attentive_fashion"

    def __init__(
        self,
        num_users: int,
        num_items: int,
        color_features: np.ndarray,  # [I, dim_c] maxabs-normalized histograms
        edge_images: np.ndarray,  # [I, H, W, 1] float in [0,1]
        class_features: np.ndarray,  # [I, num_classes] one-hot
        embed_k: int = 128,
        attention_layers: Tuple[int, ...] = (64, 1),
        encoder_hidden: int = 256,
        dropout_rate: float = 0.5,
        conv_filters: int = 64,
        item_block: int = 1024,
        compute_dtype: str = "float32",
        host_features: bool = False,
        batch_eval: Optional[int] = None,
        edge_tower: str = "auto",
        tower_batch_tile: Optional[int] = None,
    ):
        super().__init__(num_users, num_items)
        for f, nm in (
            (color_features, "color"), (edge_images, "edges"),
            (class_features, "class"),
        ):
            if f.shape[0] != num_items:
                raise ValueError(f"{nm} features rows != num_items")
        self.embed_k = embed_k
        self.attention_layers = tuple(attention_layers)
        if self.attention_layers[-1] != 1:
            raise ValueError("last attention layer must have width 1")
        self.encoder_hidden = encoder_hidden
        self.dropout_rate = dropout_rate
        self.conv_filters = conv_filters
        self.item_block = item_block
        self.dim_c = int(color_features.shape[1])
        self.dim_cls = int(class_features.shape[1])
        # host_features=True keeps the modality tensors on HOST (np.memmap
        # welcome — pass float32 memmaps so asarray stays a no-copy view):
        # init() then returns an EMPTY frozen pytree, training goes through
        # loss_streamed (train/streamed.py) and eval encodes items in
        # host-streamed blocks — the >HBM catalog path, playing the role of
        # the reference's tf.py_function image pipeline (dataset.py:124-139)
        self.host_features = host_features
        self._color = np.asarray(color_features, np.float32)
        self._edges = np.asarray(edge_images, np.float32)
        self._class = np.asarray(class_features, np.float32)
        # bf16 MXU path for the trainable towers (core/precision.py); fp32
        # default keeps bit-exact parity.  Master params stay fp32 either way.
        self.compute_dtype = resolve_compute_dtype(compute_dtype)
        # batch_eval = eval-time item-ENCODING batch (the reference's
        # --batch_eval, consumed at AttentiveFashion.py:338-343): items are
        # encoded once per eval in fixed-size blocks of this many images,
        # bounding the [B, H, W, filters] conv activation.  None = all at
        # once (host_features mode falls back to item_block).
        self.batch_eval = None if batch_eval is None else int(batch_eval)
        # edge_tower selects the conv->pool->GAP implementation:
        #   "xla"   — the inline XLA tower (materializes the [B, H, W, C]
        #             activation through HBM each op);
        #   "fused" — the Pallas fused kernel (ops/edge_tower.py): the
        #             activation never leaves VMEM (interpret-mode off TPU);
        #   "s2d"   — the 2x2 space-to-depth re-expression (ops/s2d_conv.py):
        #             one 3x3x4->4F conv computes conv AND pool without the
        #             full-res activation; fills the MXU lane axis (4F=256)
        #             that the direct conv leaves half-empty;
        #   "auto"  — fused on TPU when H and W are even, else xla.
        # All paths are pinned equivalent (tests/test_edge_tower.py,
        # tests/test_s2d_conv.py); they differ in the last ulp only.
        # Measured ranking on v5e (SPEED.md round 4): fp32 fused > xla >
        # s2d; bf16 xla ~ fused > s2d — s2d is a documented negative.
        if edge_tower not in ("auto", "fused", "xla", "s2d"):
            raise ValueError(
                f"edge_tower {edge_tower!r} not in auto/fused/xla/s2d"
            )
        h_img, w_img = self._edges.shape[1:3]
        if edge_tower == "s2d" and (h_img % 2 or w_img % 2):
            raise ValueError("edge_tower='s2d' requires even image H, W")
        from fashionvisualexpl_tpu.ops.edge_tower import auto_batch_tile

        cd_bytes = 2 if self.compute_dtype == jnp.bfloat16 else 4
        # VMEM-aware tile: 0 means the geometry's score planes exceed
        # scoped VMEM even at tile 1 (e.g. 224x224 at 64 filters) — auto
        # then falls back to xla, explicit "fused" raises
        fit_tile = (
            auto_batch_tile(h_img, w_img, conv_filters, cd_bytes)
            if h_img % 2 == 0 and w_img % 2 == 0
            else 0
        )
        self.tower_batch_tile = (
            int(tower_batch_tile) if tower_batch_tile is not None
            else max(fit_tile, 1)
        )
        fused_ok = fit_tile > 0 if tower_batch_tile is None else (
            h_img % 2 == 0 and w_img % 2 == 0
        )
        if edge_tower == "fused" and not fused_ok:
            raise ValueError(
                f"edge_tower='fused' cannot run at {h_img}x{w_img} with "
                f"{conv_filters} filters: even H/W required and the kernel "
                "must fit scoped VMEM (ops/edge_tower.py auto_batch_tile)"
            )
        self.edge_tower = edge_tower
        self._fused_tower = edge_tower == "fused" or (
            edge_tower == "auto"
            and fused_ok
            and jax.default_backend() == "tpu"
        )

    def row_sharded_params(self):
        return ("Gu", "Gi")

    def init(self, rng: jax.Array) -> Tuple[Params, Frozen]:
        ks = iter(jax.random.split(rng, 16))
        K, H = self.embed_k, self.encoder_hidden
        params = {
            "Gu": glorot_uniform(next(ks), (self.num_users, K)),
            "Gi": glorot_uniform(next(ks), (self.num_items, K)),
            "color_enc": {
                "W1": glorot_uniform(next(ks), (self.dim_c, H)),
                "b1": jnp.zeros((H,), jnp.float32),
                "W2": glorot_uniform(next(ks), (H, K)),
            },
            "class_enc": {
                "W1": glorot_uniform(next(ks), (self.dim_cls, H)),
                "b1": jnp.zeros((H,), jnp.float32),
                "W2": glorot_uniform(next(ks), (H, K)),
            },
            "edges_enc": {
                "conv_W": glorot_uniform(
                    next(ks), (5, 5, 1, self.conv_filters)
                ),
                "conv_b": jnp.zeros((self.conv_filters,), jnp.float32),
                "W2": glorot_uniform(next(ks), (self.conv_filters, K)),
            },
            "attention": self._init_attention(next(ks)),
        }
        if self.host_features:
            # modality tensors never ship to HBM wholesale; training gathers
            # per-batch rows on host (train/streamed.py), eval encodes in
            # host-streamed blocks (precompute_eval)
            return params, {}
        frozen = {
            "Fc": jnp.asarray(self._color),
            "Fe_img": jnp.asarray(self._edges),
            "Fcls": jnp.asarray(self._class),
        }
        return params, frozen

    def _init_attention(self, rng):
        ws = {}
        keys = jax.random.split(rng, 2 * len(self.attention_layers))
        prev = self.embed_k
        for l, width in enumerate(self.attention_layers):
            ws[f"W{l + 1}"] = glorot_uniform(keys[2 * l], (prev, width))
            ws[f"b{l + 1}"] = glorot_uniform(
                keys[2 * l + 1], (1, width)
            )[0]  # GlorotUniform on a vector, like the reference (:131-143)
            prev = width
        return ws

    # --- encoders ---

    def _mlp_encode(self, enc, x, rng):
        cd = self.compute_dtype
        h = jax.nn.relu(
            cast_compute(x, cd) @ cast_compute(enc["W1"], cd)
            + cast_compute(enc["b1"], cd)
        )
        h = _dropout(h, self.dropout_rate, rng)
        return cast_f32(h @ cast_compute(enc["W2"], cd))

    def _edges_encode(self, enc, images, rng):
        """Conv(5x5, same, relu) -> MaxPool(2x2, same) -> GAP -> Dropout ->
        Dense (AttentiveFashion.py:57-64).  NHWC, MXU-friendly conv.

        With the fused tower (see ``edge_tower``) the conv/pool/GAP stage
        runs as the Pallas kernel ops/edge_tower.py — the [B, H, W, C]
        activation never round-trips HBM; gradients flow to conv_W/conv_b
        (images are frozen features, their grad is zero by contract)."""
        cd = self.compute_dtype
        if self._fused_tower:
            from fashionvisualexpl_tpu.ops.edge_tower import edge_tower_gap

            y = edge_tower_gap(
                cast_compute(images, cd), enc["conv_W"], enc["conv_b"],
                self.tower_batch_tile, jax.default_backend() != "tpu",
            )  # [B, filters] f32
        elif self.edge_tower == "s2d":
            from fashionvisualexpl_tpu.ops.s2d_conv import edge_tower_s2d_gap

            y = edge_tower_s2d_gap(
                cast_compute(images, cd), enc["conv_W"], enc["conv_b"]
            )  # [B, filters] f32
        else:
            y = jax.lax.conv_general_dilated(
                cast_compute(images, cd), cast_compute(enc["conv_W"], cd),
                window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + cast_compute(enc["conv_b"], cd)
            y = jax.nn.relu(y)
            # NOTE (round-4 negative): re-expressing this pool as
            # reshape(B,H/2,2,W/2,2,F).max((2,4)) to avoid the
            # select-and-scatter VJP measured 145.8k vs 210.5k triples/s
            # at the bf16 scaled config — splitting the tiled spatial dims
            # forces relayouts that cost far more than the pool backward
            # saves.  reduce_window stays.
            y = jax.lax.reduce_window(
                y, -jnp.inf, jax.lax.max,
                window_dimensions=(1, 2, 2, 1), window_strides=(1, 2, 2, 1),
                padding="SAME",
            )
            # GAP accumulates over H*W elements — keep the reduction fp32
            y = jnp.mean(cast_f32(y), axis=(1, 2))  # [B, filters]
        y = _dropout(y, self.dropout_rate, rng)
        return cast_f32(cast_compute(y, cd) @ cast_compute(enc["W2"], cd))

    def encode_items(self, params, frozen, item_ids=None, rng=None):
        """[N, 3, K] stacked (color, edges, class) embeddings.

        The modality order matches the reference's concat order
        (colors, edges, classes — AttentiveFashion.py:195-198)."""
        if item_ids is None:
            col, img, cls = frozen["Fc"], frozen["Fe_img"], frozen["Fcls"]
        else:
            col = jnp.take(frozen["Fc"], item_ids, axis=0)
            img = jnp.take(frozen["Fe_img"], item_ids, axis=0)
            cls = jnp.take(frozen["Fcls"], item_ids, axis=0)
        rngs = (None, None, None) if rng is None else jax.random.split(rng, 3)
        color_e = self._mlp_encode(params["color_enc"], col, rngs[0])
        edges_e = self._edges_encode(params["edges_enc"], img, rngs[1])
        class_e = self._mlp_encode(params["class_enc"], cls, rngs[2])
        return jnp.stack([color_e, edges_e, class_e], axis=-2)  # [N, 3, K]

    # --- attention (AttentiveFashion.py:146-166) ---

    def _attention(self, params, gamma_u, e_items):
        """alpha over modalities.  gamma_u [..., K], e_items [..., 3, K] ->
        alpha [..., 3, 1]."""
        att = params["attention"]
        cd = self.compute_dtype
        # user-gated modalities; the layer matmuls ride the MXU in cd
        h = cast_compute(gamma_u[..., None, :], cd) * cast_compute(e_items, cd)
        for l in range(len(self.attention_layers)):
            h = h @ cast_compute(att[f"W{l + 1}"], cd) + cast_compute(
                att[f"b{l + 1}"], cd
            )
            if l == 0:
                h = jax.nn.relu(h)
        # softmax over the modality axis, fp32 for stable normalization
        return jax.nn.softmax(cast_f32(h), axis=-2)

    def _score_from_encoded(self, params, gamma_u, gamma_i, e_items):
        alpha = self._attention(params, gamma_u, e_items)
        weighted = jnp.sum(alpha * e_items, axis=-2)  # [..., K]
        return jnp.sum(gamma_u * weighted * gamma_i, axis=-1)

    # --- training ---

    def loss(self, params, frozen, users, pos, neg, reg, rng=None):
        gamma_u = self.take("Gu", params["Gu"], users)
        rng_pos, rng_neg = (
            jax.random.split(rng) if rng is not None else (None, None)
        )
        gamma_pos = self.take("Gi", params["Gi"], pos)
        gamma_neg = self.take("Gi", params["Gi"], neg)
        e_pos = self.encode_items(params, frozen, pos, rng_pos)  # [B, 3, K]
        e_neg = self.encode_items(params, frozen, neg, rng_neg)

        x_pos = self._score_from_encoded(params, gamma_u, gamma_pos, e_pos)
        x_neg = self._score_from_encoded(params, gamma_u, gamma_neg, e_neg)
        loss = bpr_pairwise_loss(x_pos, x_neg)

        att = params["attention"]
        # AttentiveFashion.py:228-243 — batch embeddings + ENCODER OUTPUT
        # activations + attention matrices
        reg_loss = (
            reg
            * (
                l2_loss(gamma_u)
                + l2_loss(gamma_pos)
                + l2_loss(gamma_neg)
                + l2_loss(e_pos)
                + l2_loss(e_neg)
            )
            * 2.0
            + self.global_reg_scale
            * reg
            * sum(l2_loss(v) for v in att.values())
            * 2.0
        )
        return loss + reg_loss

    # --- packed fast path (train/packed_generic.py) ---

    def packed_spec(self):
        from fashionvisualexpl_tpu.models.base import PackedSpec

        return PackedSpec(
            user_tables=(("Gu", self.embed_k),),
            item_tables=(("Gi", self.embed_k),),
            item_scalars=(),
            dense=("color_enc", "class_enc", "edges_enc", "attention"),
        )

    def packed_loss(self, user_vw, pos_vw, neg_vw, dense, frozen, ids,
                    reg, rng=None):
        _, p_ids, n_ids = ids
        gamma_u = user_vw["Gu"]
        gamma_pos, gamma_neg = pos_vw["Gi"], neg_vw["Gi"]
        rng_pos, rng_neg = (
            jax.random.split(rng) if rng is not None else (None, None)
        )
        # `dense` carries exactly the encoder/attention param subtrees, so
        # it drops into the shared encode/score helpers as `params`
        e_pos = self.encode_items(dense, frozen, p_ids, rng_pos)
        e_neg = self.encode_items(dense, frozen, n_ids, rng_neg)
        x_pos = self._score_from_encoded(dense, gamma_u, gamma_pos, e_pos)
        x_neg = self._score_from_encoded(dense, gamma_u, gamma_neg, e_neg)
        loss = bpr_pairwise_loss(x_pos, x_neg)
        att = dense["attention"]
        return loss + (
            reg
            * (
                l2_loss(gamma_u)
                + l2_loss(gamma_pos)
                + l2_loss(gamma_neg)
                + l2_loss(e_pos)
                + l2_loss(e_neg)
            )
            * 2.0
            + self.global_reg_scale * reg
            * sum(l2_loss(v) for v in att.values()) * 2.0
        )

    # --- inference ---

    def score(self, params, frozen, users, items):
        gamma_u = jnp.take(params["Gu"], users, axis=0)
        gamma_i = jnp.take(params["Gi"], items, axis=0)
        e_items = self.encode_items(params, frozen, items)
        return self._score_from_encoded(params, gamma_u, gamma_i, e_items)

    def precompute_eval(self, params, frozen):
        """Encode every item once per evaluation (no dropout).

        host_features mode streams fixed-shape item blocks from the host
        arrays through one jitted encoder program instead of reading the
        (absent) device-resident frozen stacks — only the [I, 3, K] encoded
        cache ever lives in HBM, not the [I, H, W, 1] images."""
        if not self.host_features:
            if self.batch_eval is None or self.batch_eval >= self.num_items:
                return self.encode_items(params, frozen)  # [I, 3, K]
            # --batch_eval: encode in fixed-size image blocks (reference
            # AttentiveFashion.py:338-343) — per-item results are
            # independent, so blocking only bounds the conv activation
            blk = self.batch_eval
            I = self.num_items
            n_blocks = -(-I // blk)
            pad = n_blocks * blk - I
            col = jnp.pad(frozen["Fc"], ((0, pad), (0, 0)))
            img = jnp.pad(frozen["Fe_img"], ((0, pad),) + ((0, 0),) * 3)
            cls = jnp.pad(frozen["Fcls"], ((0, pad), (0, 0)))
            e = jax.lax.map(
                lambda t: self.encode_batch(params, *t),
                (
                    col.reshape(n_blocks, blk, -1),
                    img.reshape((n_blocks, blk) + img.shape[1:]),
                    cls.reshape(n_blocks, blk, -1),
                ),
            )  # [n, blk, 3, K]
            return e.reshape(n_blocks * blk, 3, self.embed_k)[:I]
        blk = min(
            self.batch_eval if self.batch_eval is not None else self.item_block,
            self.num_items,
        )
        enc = self._host_block_encoder()
        outs = []
        col_buf = np.zeros((blk, self.dim_c), np.float32)
        img_buf = np.zeros((blk,) + self._edges.shape[1:], np.float32)
        cls_buf = np.zeros((blk, self.dim_cls), np.float32)
        for s in range(0, self.num_items, blk):
            e = min(s + blk, self.num_items)
            n = e - s
            # final block pads to blk — ONE compiled program for all blocks
            col_buf[:n] = self._color[s:e]
            img_buf[:n] = self._edges[s:e]
            cls_buf[:n] = self._class[s:e]
            outs.append(np.asarray(enc(params, col_buf, img_buf, cls_buf))[:n])
        return jnp.asarray(np.concatenate(outs, axis=0))  # [I, 3, K]

    def _host_block_encoder(self):
        if not hasattr(self, "_enc_jit"):
            self._enc_jit = jax.jit(
                lambda p, col, img, cls: self.encode_batch(p, col, img, cls)
            )
        return self._enc_jit

    def _scores_against_all(self, params, gamma_u, e_items, Gi):
        """[B_u, I] scores for a user block against cached item encodings,
        computed in item blocks to bound the [B_u, I_blk, 3, t] attention
        intermediate."""
        I = e_items.shape[0]
        blk = min(self.item_block, I)
        n_blocks = -(-I // blk)
        pad = n_blocks * blk - I
        e_pad = jnp.pad(e_items, ((0, pad), (0, 0), (0, 0)))
        gi_pad = jnp.pad(Gi, ((0, pad), (0, 0)))
        e_blocks = e_pad.reshape(n_blocks, blk, *e_items.shape[1:])
        gi_blocks = gi_pad.reshape(n_blocks, blk, Gi.shape[1])

        def one_block(args):
            e_b, gi_b = args  # [blk, 3, K], [blk, K]
            # broadcast users x items
            gu = gamma_u[:, None, :]  # [B_u, 1, K]
            e = e_b[None, :, :, :]  # [1, blk, 3, K]
            # _attention broadcasts gamma_u[..., None, :] * e -> [B_u, blk, 3, K]
            alpha = self._attention(params, gu, e)
            weighted = jnp.sum(alpha * e, axis=-2)  # [B_u, blk, K]
            return jnp.sum(gu * weighted * gi_b[None, :, :], axis=-1)

        scores = jax.lax.map(one_block, (e_blocks, gi_blocks))  # [n, B_u, blk]
        scores = jnp.moveaxis(scores, 0, 1).reshape(gamma_u.shape[0], -1)
        return scores[:, :I]

    def predict_user_block(self, params, frozen, user_ids, ctx=None):
        e_items = ctx if ctx is not None else self.precompute_eval(params, frozen)
        gamma_u = jnp.take(params["Gu"], user_ids, axis=0)
        return self._scores_against_all(
            params, gamma_u, e_items, params["Gi"]
        )

    def predict_all(self, params, frozen):
        ctx = self.precompute_eval(params, frozen)
        return self.predict_user_block(
            params, frozen, jnp.arange(self.num_users), ctx
        )

    def attention_weights(self, params, frozen, user_ids, ctx=None):
        """[B_u, I, 3] modality attention per user x item — the payload of
        store_recommendation_attention (Evaluator.py:241-259).  Blocked over
        items like the scoring path so the [B_u, I_blk, 3, t] intermediate
        stays bounded."""
        e_items = ctx if ctx is not None else self.precompute_eval(params, frozen)
        gamma_u = jnp.take(params["Gu"], user_ids, axis=0)
        I = e_items.shape[0]
        blk = min(self.item_block, I)
        n_blocks = -(-I // blk)
        pad = n_blocks * blk - I
        e_pad = jnp.pad(e_items, ((0, pad), (0, 0), (0, 0)))
        e_blocks = e_pad.reshape(n_blocks, blk, *e_items.shape[1:])

        def one_block(e_b):
            alpha = self._attention(
                params, gamma_u[:, None, :], e_b[None, :, :, :]
            )  # [B_u, blk, 3, 1]
            return alpha[..., 0]

        alpha = jax.lax.map(one_block, e_blocks)  # [n, B_u, blk, 3]
        alpha = jnp.moveaxis(alpha, 0, 1).reshape(gamma_u.shape[0], -1, 3)
        return alpha[:, :I]

    # --- streamed-feature variants (catalogs whose modality tensors exceed
    # HBM; features arrive per batch from the host pipeline) ---

    def encode_batch(self, params, col, img, cls, rng=None):
        """[B, 3, K] from explicit per-batch modality inputs."""
        rngs = (None, None, None) if rng is None else jax.random.split(rng, 3)
        color_e = self._mlp_encode(params["color_enc"], col, rngs[0])
        edges_e = self._edges_encode(params["edges_enc"], img, rngs[1])
        class_e = self._mlp_encode(params["class_enc"], cls, rngs[2])
        return jnp.stack([color_e, edges_e, class_e], axis=-2)

    def loss_streamed(self, params, users, pos, neg, feats, reg, rng=None):
        """Same loss as `loss`, with modality inputs supplied per batch:
        feats = dict(col_pos, img_pos, cls_pos, col_neg, img_neg, cls_neg)."""
        gamma_u = jnp.take(params["Gu"], users, axis=0)
        gamma_pos = jnp.take(params["Gi"], pos, axis=0)
        gamma_neg = jnp.take(params["Gi"], neg, axis=0)
        rng_pos, rng_neg = (
            jax.random.split(rng) if rng is not None else (None, None)
        )
        e_pos = self.encode_batch(
            params, feats["col_pos"], feats["img_pos"], feats["cls_pos"],
            rng_pos,
        )
        e_neg = self.encode_batch(
            params, feats["col_neg"], feats["img_neg"], feats["cls_neg"],
            rng_neg,
        )
        x_pos = self._score_from_encoded(params, gamma_u, gamma_pos, e_pos)
        x_neg = self._score_from_encoded(params, gamma_u, gamma_neg, e_neg)
        loss = bpr_pairwise_loss(x_pos, x_neg)
        att = params["attention"]
        reg_loss = (
            reg
            * (
                l2_loss(gamma_u) + l2_loss(gamma_pos) + l2_loss(gamma_neg)
                + l2_loss(e_pos) + l2_loss(e_neg)
            )
            * 2.0
            + self.global_reg_scale * reg
            * sum(l2_loss(v) for v in att.values()) * 2.0
        )
        return loss + reg_loss
