"""Streaming factored evaluator must match the dense evaluator exactly."""

import jax
import numpy as np
import pytest

from fashionvisualexpl_tpu.data.features import synthetic_features
from fashionvisualexpl_tpu.data.interactions import synthetic_interactions
from fashionvisualexpl_tpu.eval.evaluator import Evaluator
from fashionvisualexpl_tpu.eval.factored import FactoredEvaluator
from fashionvisualexpl_tpu.models.acf import ACF
from fashionvisualexpl_tpu.models.bprmf import BPRMF
from fashionvisualexpl_tpu.models.grad_fashion import GradFashion
from fashionvisualexpl_tpu.models.vbpr import VBPR


def _assert_same(dense, streaming):
    for key in dense:
        np.testing.assert_allclose(
            streaming[key], dense[key], rtol=1e-5, atol=1e-6,
            err_msg=f"metric {key}",
        )


@pytest.mark.parametrize("item_block", [7, 64, 4096])
def test_bprmf_streaming_matches_dense(item_block):
    data = synthetic_interactions(40, 50, interactions_per_user=9, seed=0)
    model = BPRMF(data.num_users, data.num_items, embed_k=8)
    params, frozen = model.init(jax.random.PRNGKey(0))
    dense = Evaluator(model, data, k=10, user_block=16).evaluate(params, frozen)
    streaming = FactoredEvaluator(
        model, data, k=10, user_block=16, item_block=item_block
    ).evaluate(params, frozen)
    _assert_same(dense, streaming)


def test_vbpr_and_gradfashion_streaming_match_dense():
    data = synthetic_interactions(25, 35, interactions_per_user=7, seed=1)
    feats = synthetic_features(data.num_items, 12, seed=2)
    color = synthetic_features(data.num_items, 8, seed=3)
    edges = synthetic_features(data.num_items, 6, seed=4)
    for model in (
        VBPR(data.num_users, data.num_items, feats, embed_k=8, embed_d=4),
        GradFashion(data.num_users, data.num_items, color, edges,
                    embed_k=8, embed_d=4, embed_color=5, embed_edges=4),
    ):
        params, frozen = model.init(jax.random.PRNGKey(1))
        dense = Evaluator(model, data, k=8, user_block=16).evaluate(
            params, frozen
        )
        streaming = FactoredEvaluator(
            model, data, k=8, user_block=16, item_block=16
        ).evaluate(params, frozen)
        _assert_same(dense, streaming)


def test_acf_streaming_matches_dense():
    data = synthetic_interactions(15, 20, interactions_per_user=6, seed=2)
    rng = np.random.default_rng(0)
    spat = rng.normal(size=(20, 3, 5)).astype(np.float32)
    model = ACF(data.num_users, data.num_items, spat, data, embed_k=8,
                layers_component=(4, 1), layers_item=(4, 1), max_user_pos=6)
    params, frozen = model.init(jax.random.PRNGKey(2))
    dense = Evaluator(model, data, k=5, user_block=8).evaluate(params, frozen)
    streaming = FactoredEvaluator(
        model, data, k=5, user_block=8, item_block=9
    ).evaluate(params, frozen)
    _assert_same(dense, streaming)


@pytest.mark.parametrize("impl", ["mask", "bucketed", "pallas"])
def test_counts_impls_match_dense(impl):
    """All three counts engines (id-mask scan, bucketed scan, fused Pallas
    kernel) must reproduce the dense evaluator exactly — same banned-by-id
    exclusion semantics, different machinery."""
    data = synthetic_interactions(40, 50, interactions_per_user=9, seed=7)
    model = BPRMF(data.num_users, data.num_items, embed_k=8)
    params, frozen = model.init(jax.random.PRNGKey(4))
    dense = Evaluator(model, data, k=10, user_block=16).evaluate(params, frozen)
    streaming = FactoredEvaluator(
        model, data, k=10, user_block=16, item_block=16, counts_impl=impl
    ).evaluate(params, frozen)
    _assert_same(dense, streaming)


def test_counts_kernels_bit_equal_on_ties():
    """streaming_counts == bucketed == pallas on quantized (heavy-tie)
    scores, incl. -1 pads, duplicate banned ids, and T > 1 ref columns."""
    from fashionvisualexpl_tpu.ops.counts import streaming_counts_pallas
    from fashionvisualexpl_tpu.ops.topk import (
        banned_bucket_width,
        bucket_banned_ids,
        streaming_counts,
        streaming_counts_bucketed,
    )
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    Bu, I, D, T, Pb = 48, 1000, 16, 3, 9
    q = lambda a: jnp.asarray(np.round(a * 4) / 4, jnp.float32)
    uf = q(rng.normal(size=(Bu, D)))
    iv = q(rng.normal(size=(I, D)))
    ib = q(rng.normal(size=(I,)))
    banned = np.stack(
        [rng.choice(I, size=Pb, replace=False) for _ in range(Bu)]
    ).astype(np.int32)
    banned[0, :3] = -1  # pad convention
    banned[1, 4] = banned[1, 3]  # duplicates must not double-exclude
    ref = q(rng.normal(size=(Bu, T)))

    base = streaming_counts(
        uf, iv, ib, ref_scores=ref, banned_ids=jnp.asarray(banned),
        item_block=256,
    )
    W = banned_bucket_width(banned, I, 256, chunk=17)
    loc, msk = bucket_banned_ids(banned, I, 256, width=W)
    buck = streaming_counts_bucketed(
        uf, iv, ib, ref_scores=ref, banned_local=jnp.asarray(loc),
        banned_valid=jnp.asarray(msk), item_block=256,
    )
    pall = streaming_counts_pallas(
        uf, iv, ib, ref_scores=ref, banned_local=jnp.asarray(loc),
        banned_valid=jnp.asarray(msk), item_block=256, user_tile=16,
        interpret=jax.default_backend() != "tpu",
    )
    np.testing.assert_array_equal(np.asarray(base), np.asarray(buck))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(pall))

    # the in-jit device bucketing must agree with the host reference
    from fashionvisualexpl_tpu.ops.topk import bucket_banned_ids_device

    loc_d, msk_d = jax.jit(
        lambda b: bucket_banned_ids_device(b, I, 256, W)
    )(jnp.asarray(banned))
    np.testing.assert_array_equal(np.asarray(loc_d), loc)
    np.testing.assert_array_equal(np.asarray(msk_d), msk)

    # pinned width must reject overflowing buckets
    assert W > 1  # Pb=9 over 4 blocks guarantees a >1 bucket somewhere
    with pytest.raises(ValueError):
        bucket_banned_ids(banned, I, 256, width=W - 1)


@pytest.mark.parametrize("impl", ["mask", "bucketed", "pallas"])
def test_distributed_streaming_matches_dense(impl):
    """Items sharded over an 8-way model axis: distributed top-k merge +
    psum'd counts must reproduce the dense metrics exactly — on every
    counts engine (the fast bucketed/pallas engines re-bucket banned ids
    per shard in shard-local coordinates)."""
    from fashionvisualexpl_tpu.core.mesh import make_mesh

    mesh = make_mesh(data=1, model=8)
    data = synthetic_interactions(30, 48, interactions_per_user=8, seed=5)
    model = BPRMF(data.num_users, data.num_items, embed_k=8)
    params, frozen = model.init(jax.random.PRNGKey(3))
    dense = Evaluator(model, data, k=10, user_block=16).evaluate(params, frozen)
    distributed = FactoredEvaluator(
        model, data, k=10, user_block=16, item_block=5, mesh=mesh,
        counts_impl=impl,
    ).evaluate(params, frozen)
    _assert_same(dense, distributed)


@pytest.mark.parametrize("impl", ["mask", "pallas"])
def test_distributed_streaming_non_divisible_items(impl):
    """Catalogs that don't divide the model axis: the evaluator pads item
    rows internally with -inf bias, so pad rows never count as negatives
    nor reach a dump — previously the CALLER had to pad and zero-scoring
    pad rows silently corrupted AUC (and could surface fabricated ids in
    top-k dumps)."""
    from fashionvisualexpl_tpu.core.mesh import make_mesh

    mesh = make_mesh(data=1, model=8)
    # 47 items over 8 shards -> pad to 48 (1 pad row)
    data = synthetic_interactions(24, 47, interactions_per_user=7, seed=13)
    model = BPRMF(data.num_users, data.num_items, embed_k=8)
    params, frozen = model.init(jax.random.PRNGKey(6))
    dense = Evaluator(model, data, k=8, user_block=8).evaluate(params, frozen)
    distributed = FactoredEvaluator(
        model, data, k=8, user_block=8, item_block=6, mesh=mesh,
        counts_impl=impl,
    ).evaluate(params, frozen)
    _assert_same(dense, distributed)


def test_distributed_dump_non_divisible_items(tmp_path):
    from fashionvisualexpl_tpu.core.mesh import make_mesh

    mesh = make_mesh(data=1, model=8)
    data = synthetic_interactions(16, 43, interactions_per_user=6, seed=14)
    model = BPRMF(data.num_users, data.num_items, embed_k=8)
    params, frozen = model.init(jax.random.PRNGKey(7))
    dense_path = str(tmp_path / "dense.tsv")
    dist_path = str(tmp_path / "dist.tsv")
    Evaluator(model, data, k=5, user_block=8).store_recommendation(
        params, frozen, dense_path
    )
    FactoredEvaluator(
        model, data, k=5, user_block=8, item_block=6, mesh=mesh
    ).store_recommendation(params, frozen, dist_path)
    dense = [l.split("\t") for l in open(dense_path)]
    dist = [l.split("\t") for l in open(dist_path)]
    assert [d[:2] for d in dense] == [d[:2] for d in dist]
    # no fabricated pad-item ids
    assert all(int(d[1]) < data.num_items for d in dist)


@pytest.mark.parametrize("impl", ["bucketed", "pallas"])
def test_sharded_counts_bit_equal_single_device(impl):
    """The sharded fast counts engines must be BIT-equal to the
    single-device pallas/bucketed counts on heavy-tie data (quantized
    scores): shard-local re-bucketing changes the machinery, never the
    counts."""
    import jax.numpy as jnp

    from fashionvisualexpl_tpu.core.mesh import make_mesh
    from fashionvisualexpl_tpu.eval.factored import sharded_streaming_counts
    from fashionvisualexpl_tpu.ops.topk import (
        banned_bucket_width,
        streaming_counts,
    )

    rng = np.random.default_rng(21)
    Bu, I, D, T, Pb = 32, 96, 8, 2, 7
    q = lambda a: jnp.asarray(np.round(a * 4) / 4, jnp.float32)
    uf = q(rng.normal(size=(Bu, D)))
    iv = q(rng.normal(size=(I, D)))
    ib = q(rng.normal(size=(I,)))
    banned = np.stack(
        [rng.choice(I, size=Pb, replace=False) for _ in range(Bu)]
    ).astype(np.int32)
    banned[0, :2] = -1
    ref = q(rng.normal(size=(Bu, T)))

    base = streaming_counts(
        uf, iv, ib, ref_scores=ref, banned_ids=jnp.asarray(banned),
        item_block=16,
    )
    mesh = make_mesh(data=1, model=8)
    rows = I // 8
    tile = min(16, rows)
    W = max(
        banned_bucket_width(banned - s * rows, rows, tile) for s in range(8)
    )
    sharded = sharded_streaming_counts(
        mesh, uf, iv, ib, ref, jnp.asarray(banned), tile,
        impl=impl, bucket_width=W,
        interpret=jax.default_backend() != "tpu",
    )
    np.testing.assert_array_equal(np.asarray(base), np.asarray(sharded))


@pytest.mark.slow
def test_distributed_store_recommendation_matches_dense(tmp_path):
    """The mesh dump branch (sharded streaming top-k merge) against the
    dense evaluator's dump."""
    from fashionvisualexpl_tpu.core.mesh import make_mesh

    mesh = make_mesh(data=1, model=8)
    data = synthetic_interactions(20, 48, interactions_per_user=7, seed=6)
    model = BPRMF(data.num_users, data.num_items, embed_k=8)
    params, frozen = model.init(jax.random.PRNGKey(5))
    dense_path = str(tmp_path / "dense.tsv")
    dist_path = str(tmp_path / "dist.tsv")
    Evaluator(model, data, k=5, user_block=8).store_recommendation(
        params, frozen, dense_path
    )
    FactoredEvaluator(
        model, data, k=5, user_block=8, item_block=6, mesh=mesh
    ).store_recommendation(params, frozen, dist_path)
    dense = [l.split("\t") for l in open(dense_path)]
    dist = [l.split("\t") for l in open(dist_path)]
    assert [d[:2] for d in dense] == [d[:2] for d in dist]
    np.testing.assert_allclose(
        [float(d[2]) for d in dense], [float(d[2]) for d in dist], rtol=1e-5
    )


def test_streaming_store_recommendation_matches_dense(tmp_path):
    data = synthetic_interactions(20, 30, interactions_per_user=7, seed=8)
    model = BPRMF(data.num_users, data.num_items, embed_k=8)
    params, frozen = model.init(jax.random.PRNGKey(4))

    dense_path = str(tmp_path / "dense.tsv")
    stream_path = str(tmp_path / "stream.tsv")
    Evaluator(model, data, k=5, user_block=8).store_recommendation(
        params, frozen, dense_path
    )
    FactoredEvaluator(
        model, data, k=5, user_block=8, item_block=7
    ).store_recommendation(params, frozen, stream_path)

    def parse(path):
        out = {}
        for line in open(path):
            u, i, s = line.split("\t")
            out.setdefault(int(u), []).append((int(i), float(s)))
        return out

    dense, stream = parse(dense_path), parse(stream_path)
    assert dense.keys() == stream.keys()
    for u in dense:
        d_ids = [i for i, _ in dense[u]]
        s_ids = [i for i, _ in stream[u]]
        assert d_ids == s_ids, (u, d_ids, s_ids)
        np.testing.assert_allclose(
            [s for _, s in dense[u]], [s for _, s in stream[u]], rtol=1e-5
        )


def test_approx_max_k_exactness_pin():
    """The streaming kernel and metric top-k rely on approx_max_k with
    recall_target=1.0 being EXACT (values and indices) — pin it against
    lax.top_k on this backend."""
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(37, 911)).astype(np.float32))
    tv, ti = jax.lax.top_k(x, 21)
    av, ai = jax.lax.approx_max_k(x, 21, recall_target=1.0)
    np.testing.assert_array_equal(np.asarray(tv), np.asarray(av))
    np.testing.assert_array_equal(np.asarray(ti), np.asarray(ai))


def test_counts_impl_validation():
    data = synthetic_interactions(10, 12, interactions_per_user=4, seed=9)
    model = BPRMF(data.num_users, data.num_items, embed_k=4)
    with pytest.raises(ValueError, match="counts_impl"):
        FactoredEvaluator(model, data, counts_impl="palas")
    from fashionvisualexpl_tpu.core.mesh import make_mesh

    # fast engines are legal under a mesh since round 5 (shard-local
    # re-bucketing); a mismatched table height must still fail loudly
    ev = FactoredEvaluator(
        model, data, mesh=make_mesh(data=1, model=8),
        counts_impl="pallas",
    )
    assert ev.counts_impl == "pallas"
    assert ev._mesh_rows == 2  # ceil(12 / 8)


def test_bucket_device_overflow_signal():
    """An underestimated pinned width must be detectable: return_overflow
    reports the number of dropped ids (the in-jit analogue of
    bucket_banned_ids' ValueError)."""
    import jax.numpy as jnp

    from fashionvisualexpl_tpu.ops.topk import (
        banned_bucket_width,
        bucket_banned_ids_device,
    )

    rng = np.random.default_rng(11)
    I = 64
    banned = np.stack(
        [rng.choice(I, size=9, replace=False) for _ in range(6)]
    ).astype(np.int32)
    W = banned_bucket_width(banned, I, 16)
    assert W > 1
    _, _, ok = bucket_banned_ids_device(
        jnp.asarray(banned), I, 16, W, return_overflow=True
    )
    assert int(ok) == 0
    _, _, dropped = bucket_banned_ids_device(
        jnp.asarray(banned), I, 16, W - 1, return_overflow=True
    )
    assert int(dropped) > 0


def test_streaming_grads_dump_matches_dense(tmp_path):
    """The streaming evaluator's grads dump (the round-2 CLI crash:
    grad_fashion --streaming_eval) — batched engine vs the dense
    evaluator's per-user loop: same rows, values to the last ulp."""
    data = synthetic_interactions(18, 26, interactions_per_user=6, seed=12)
    color = synthetic_features(data.num_items, 8, seed=13)
    edges = synthetic_features(data.num_items, 6, seed=14)
    model = GradFashion(
        data.num_users, data.num_items, color, edges,
        embed_k=6, embed_d=3, embed_color=4, embed_edges=4,
    )
    params, frozen = model.init(jax.random.PRNGKey(7))
    dense_path = str(tmp_path / "dense.tsv")
    stream_path = str(tmp_path / "stream.tsv")
    Evaluator(model, data, k=5, user_block=8).store_recommendation_grads(
        params, frozen, dense_path, grads_fn=model.feature_attributions
    )
    FactoredEvaluator(
        model, data, k=5, user_block=8
    ).store_recommendation_grads(
        params, frozen, stream_path,
        batch_grads_fn=model.feature_attributions_block,
    )
    dense = [l.split("\t") for l in open(dense_path)]
    stream = [l.split("\t") for l in open(stream_path)]
    assert [d[:2] for d in dense] == [s[:2] for s in stream]
    np.testing.assert_allclose(
        [[float(d[2]), float(d[3])] for d in dense],
        [[float(s[2]), float(s[3])] for s in stream],
        rtol=1e-5, atol=1e-6,
    )
