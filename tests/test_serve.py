"""Serving engine: exact/quantized/direct query paths vs numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fashionvisualexpl_tpu.data.features import synthetic_features
from fashionvisualexpl_tpu.data.interactions import synthetic_interactions
from fashionvisualexpl_tpu.models.bprmf import BPRMF
from fashionvisualexpl_tpu.serve import RecServer, quantize_rows


def _fixture(U=60, I=90, K=8, seed=0):
    data = synthetic_interactions(U, I, interactions_per_user=6, seed=seed)
    model = BPRMF(U, I, embed_k=K)
    params, frozen = model.init(jax.random.PRNGKey(seed))
    return model, data, params, frozen


def _oracle_topk(model, data, params, frozen, k):
    uf, iv, ib = model.factored_eval(params, frozen)
    uf = np.asarray(uf)[: data.num_users]
    iv = np.asarray(iv)[: data.num_items]
    scores = uf @ iv.T
    if ib is not None:
        scores = scores + np.asarray(ib)[None, : data.num_items]
    for u, row in enumerate(data.training_list):
        scores[u, list(row)] = -np.inf
    ids = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    vals = np.take_along_axis(scores, ids, axis=1)
    return ids, vals


def test_exact_query_matches_oracle():
    model, data, params, frozen = _fixture()
    srv = RecServer(model, data, k=5, item_block=32)
    srv.refresh(params, frozen)
    oracle_ids, oracle_vals = _oracle_topk(model, data, params, frozen, k=5)

    users = np.arange(data.num_users, dtype=np.int32)
    ids, vals = srv.query(users)
    np.testing.assert_array_equal(ids, oracle_ids)
    np.testing.assert_allclose(vals, oracle_vals, rtol=1e-5, atol=1e-5)


def test_fp32_stage1_exact_mode_matches_oracle():
    """stage1_dtype="fp32" makes candidate generation exact — the served
    ranking is provably the true fp32 top-k even at oversample=1."""
    model, data, params, frozen = _fixture(U=40, I=300, K=16, seed=7)
    srv = RecServer(model, data, k=5, item_block=64, oversample=1,
                    stage1_dtype="fp32")
    srv.refresh(params, frozen)
    oracle_ids, oracle_vals = _oracle_topk(model, data, params, frozen, k=5)
    ids, vals = srv.query(np.arange(data.num_users, dtype=np.int32))
    np.testing.assert_array_equal(ids, oracle_ids)
    np.testing.assert_allclose(vals, oracle_vals, rtol=1e-6, atol=1e-6)


def test_query_rejects_wide_dtype_out_of_range_ids():
    """int64 ids that would wrap to in-range values under an int32 cast
    must raise, not silently serve the wrong user."""
    import pytest

    model, data, params, frozen = _fixture()
    srv = RecServer(model, data, k=3)
    srv.refresh(params, frozen)
    with pytest.raises(ValueError, match="out of range"):
        srv.query(np.asarray([2**32], np.int64))  # wraps to 0 under int32
    with pytest.raises(ValueError, match="out of range"):
        srv.query([-1])


def test_train_items_never_served():
    model, data, params, frozen = _fixture(seed=3)
    srv = RecServer(model, data, k=7)
    srv.refresh(params, frozen)
    ids, _ = srv.query(np.arange(data.num_users))
    for u, row in enumerate(data.training_list):
        assert not set(ids[u]) & set(row)


def test_quantized_query_matches_exact():
    model, data, params, frozen = _fixture(U=50, I=200, K=16, seed=1)
    exact = RecServer(model, data, k=5, item_block=64)
    quant = RecServer(model, data, k=5, item_block=64, quantized=True,
                      oversample=4)
    exact.refresh(params, frozen)
    quant.refresh(params, frozen)
    users = np.arange(data.num_users, dtype=np.int32)
    e_ids, e_vals = exact.query(users)
    q_ids, q_vals = quant.query(users)
    # rescoring is exact fp32, so ids AND scores must agree wherever the
    # oversampled candidate horizon covers the true top-k (it does here)
    np.testing.assert_array_equal(q_ids, e_ids)
    np.testing.assert_allclose(q_vals, e_vals, rtol=1e-5, atol=1e-5)


def test_quantize_rows_roundtrip_error_bounded():
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 16))
    q, s = quantize_rows(x)
    assert q.dtype == jnp.int8
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s)[:, None] - np.asarray(x))
    # max error is half a quantization step per row (+ fp32 slack)
    assert (err <= np.asarray(s)[:, None] * 0.51).all()


def test_batch_bucketing_and_chunking():
    model, data, params, frozen = _fixture(seed=2)
    srv = RecServer(model, data, k=4, max_batch=16)
    srv.refresh(params, frozen)
    all_ids, all_vals = srv.query(np.arange(data.num_users))
    # odd-size batch (pads to a bucket) and oversize batch (chunks) agree
    some = np.asarray([3, 17, 41], np.int32)
    ids, vals = srv.query(some)
    np.testing.assert_array_equal(ids, all_ids[some])
    np.testing.assert_allclose(vals, all_vals[some], rtol=1e-6)
    one = srv.query_user(9)
    assert [i for i, _ in one] == list(all_ids[9])
    empty_ids, empty_vals = srv.query(np.zeros((0,), np.int32))
    assert empty_ids.shape == (0, 4) and empty_vals.shape == (0, 4)


def test_direct_path_attentive_fashion():
    from fashionvisualexpl_tpu.models.attentive_fashion import AttentiveFashion

    U, I, K = 12, 16, 8
    rng = np.random.default_rng(0)
    color = synthetic_features(I, 10, seed=0)
    edges = rng.random((I, 12, 12, 1)).astype(np.float32)
    cls = np.eye(5, dtype=np.float32)[rng.integers(0, 5, I)]
    model = AttentiveFashion(
        U, I, color, edges, cls, embed_k=K,
        attention_layers=(6, 1), encoder_hidden=16, item_block=7,
    )
    assert not hasattr(model, "factored_eval")
    data = synthetic_interactions(U, I, interactions_per_user=4, seed=0)
    params, frozen = model.init(jax.random.PRNGKey(0))

    srv = RecServer(model, data, k=3)
    srv.refresh(params, frozen)
    users = np.arange(U, dtype=np.int32)
    ids, vals = srv.query(users)

    ctx = model.precompute_eval(params, frozen)
    scores = np.array(
        model.predict_user_block(params, frozen, jnp.asarray(users), ctx)
    )[:, :I]
    for u, row in enumerate(data.training_list):
        scores[u, list(row)] = -np.inf
    oracle_ids = np.argsort(-scores, axis=1, kind="stable")[:, :3]
    np.testing.assert_array_equal(ids, oracle_ids)
    np.testing.assert_allclose(
        vals, np.take_along_axis(scores, oracle_ids, axis=1), rtol=1e-5
    )


def test_sharded_query_matches_single_device():
    """RecServer over an 8-way model mesh (catalog row-sharded, all_gather
    candidate merge) must serve the same ids as the single-device engine."""
    from fashionvisualexpl_tpu.core.mesh import make_mesh

    mesh = make_mesh(data=1, model=8)
    model, data, params, frozen = _fixture(U=40, I=100, K=8, seed=4)
    single = RecServer(model, data, k=6, item_block=16)
    single.refresh(params, frozen)
    sharded = RecServer(model, data, k=6, item_block=16, mesh=mesh)
    sharded.refresh(params, frozen)
    users = np.arange(data.num_users, dtype=np.int32)
    s_ids, s_vals = single.query(users)
    m_ids, m_vals = sharded.query(users)
    np.testing.assert_array_equal(m_ids, s_ids)
    np.testing.assert_allclose(m_vals, s_vals, rtol=1e-5, atol=1e-6)


def test_sharded_quantized_query_matches_single_device():
    from fashionvisualexpl_tpu.core.mesh import make_mesh

    mesh = make_mesh(data=1, model=8)
    model, data, params, frozen = _fixture(U=30, I=120, K=16, seed=5)
    single = RecServer(model, data, k=5, item_block=32)
    single.refresh(params, frozen)
    sharded = RecServer(model, data, k=5, item_block=32, mesh=mesh,
                        quantized=True)
    sharded.refresh(params, frozen)
    users = np.arange(data.num_users, dtype=np.int32)
    s_ids, _ = single.query(users)
    m_ids, _ = sharded.query(users)
    np.testing.assert_array_equal(m_ids, s_ids)


def test_segment_pruning_regime_matches_oracle():
    """k_seg << total segments: the candidate horizon actually prunes
    (every other fixture degenerates to all-segments-candidates), so this
    pins the segment-id arithmetic and the oversample margin for real."""
    model, data, params, frozen = _fixture(U=16, I=4096, K=8, seed=9)
    srv = RecServer(model, data, k=3, seg=8, item_block=512, oversample=2)
    # prune must engage: far fewer candidate segments than segments
    assert srv._k_seg < 4096 // 8
    srv.refresh(params, frozen)
    oracle_ids, oracle_vals = _oracle_topk(model, data, params, frozen, k=3)
    ids, vals = srv.query(np.arange(data.num_users, dtype=np.int32))
    np.testing.assert_array_equal(ids, oracle_ids)
    np.testing.assert_allclose(vals, oracle_vals, rtol=1e-5, atol=1e-5)

    quant = RecServer(model, data, k=3, seg=8, item_block=512, oversample=2,
                      quantized=True)
    quant.refresh(params, frozen)
    q_ids, _ = quant.query(np.arange(data.num_users, dtype=np.int32))
    np.testing.assert_array_equal(q_ids, oracle_ids)


def test_query_rejects_out_of_range_user():
    import pytest

    model, data, params, frozen = _fixture(seed=6)
    srv = RecServer(model, data, k=3)
    srv.refresh(params, frozen)
    with pytest.raises(ValueError, match="out of range"):
        srv.query([0, data.num_users])
    with pytest.raises(ValueError, match="out of range"):
        srv.query([-1])


def test_sharded_k_exceeding_shard_slice():
    """k larger than one shard's item slice: per-shard results pad with
    -inf/sentinels and the merge still assembles the exact global top-k."""
    from fashionvisualexpl_tpu.core.mesh import make_mesh

    mesh = make_mesh(data=1, model=8)
    model, data, params, frozen = _fixture(U=10, I=48, K=8, seed=7)
    k = 10  # > ceil(48/8) = 6 items per shard
    single = RecServer(model, data, k=k, item_block=8)
    single.refresh(params, frozen)
    sharded = RecServer(model, data, k=k, item_block=8, mesh=mesh)
    sharded.refresh(params, frozen)
    users = np.arange(data.num_users, dtype=np.int32)
    s_ids, s_vals = single.query(users)
    m_ids, m_vals = sharded.query(users)
    np.testing.assert_array_equal(m_ids, s_ids)
    np.testing.assert_allclose(m_vals, s_vals, rtol=1e-5, atol=1e-6)


def test_duplicate_train_pair_deduped_with_warning():
    """Reference-format datasets may hold duplicate (user, item) training
    rows (reference dataset.py load_list just appends); loading dedupes
    first-seen-order with a warning instead of refusing (the user_perm
    sampler requires dedup'd runs)."""
    import pytest

    from fashionvisualexpl_tpu.data.interactions import Interactions

    with pytest.warns(UserWarning, match="duplicate"):
        data = Interactions(
            num_users=2, num_items=5,
            training_list=[[1, 1, 2], [3]],
            validation_list=[[], []], test_list=[[4], [0]],
        )
    assert data.training_list == [[1, 2], [3]]
    assert data.num_train == 3
    assert int(data.pos_counts.sum()) == 3


@pytest.mark.slow
def test_serve_fuzz_ties_and_geometries():
    """Randomized geometries with heavily tied scores: ranked SCORES must
    match the oracle exactly (ids are tie-ambiguous), every served id must
    be a real non-train item carrying its true score, no duplicates."""
    rng = np.random.default_rng(0)
    for trial in range(6):
        U = int(rng.integers(5, 40))
        I = int(rng.integers(30, 300))
        K = int(rng.choice([4, 8, 16]))
        k = int(rng.integers(1, 8))
        seg = int(rng.choice([4, 8, 32]))
        item_block = int(rng.choice([16, 64, 4096]))
        oversample = int(rng.choice([2, 4]))
        quantized = bool(rng.integers(0, 2))
        data = synthetic_interactions(
            U, I, interactions_per_user=int(rng.integers(2, 6)), seed=trial
        )
        model = BPRMF(U, I, embed_k=K)
        params, frozen = model.init(jax.random.PRNGKey(trial))
        # quantize factors so many items share EXACT scores (tie storm)
        params = {
            name: jnp.round(arr * 2) / 2 if name != "Bi" else jnp.zeros_like(arr)
            for name, arr in params.items()
        }
        srv = RecServer(model, data, k=k, seg=seg, item_block=item_block,
                        oversample=oversample, quantized=quantized)
        srv.refresh(params, frozen)
        ids, vals = srv.query(np.arange(U, dtype=np.int32))

        uf, iv, ib = (np.asarray(x) for x in model.factored_eval(params, frozen))
        scores = uf[:U].astype(np.float64) @ iv[:I].T.astype(np.float64)
        scores += ib[None, :I].astype(np.float64)
        for u in range(U):
            row = scores[u].copy()
            banned = set(data.training_list[u])
            row[list(banned)] = -np.inf
            want = np.sort(row)[::-1][:k]
            np.testing.assert_allclose(
                vals[u], want, rtol=1e-5, atol=1e-6,
                err_msg=f"trial {trial} user {u} ranked scores",
            )
            assert len(set(ids[u].tolist())) == k, (trial, u)
            for j in range(k):
                assert ids[u][j] not in banned
                np.testing.assert_allclose(
                    vals[u][j], row[ids[u][j]], rtol=1e-5, atol=1e-6,
                    err_msg=f"trial {trial} user {u} served id/score pair",
                )


def test_hierarchical_segment_selection_matches_oracle():
    """S >= 4096 engages the two-level (super-segment) selection path."""
    model, data, params, frozen = _fixture(U=8, I=40960, K=8, seed=11)
    srv = RecServer(model, data, k=5, seg=8, superseg=8, item_block=8192,
                    oversample=2)
    assert srv._padded_items // srv.seg >= 4096  # hierarchy engages
    srv.refresh(params, frozen)
    oracle_ids, oracle_vals = _oracle_topk(model, data, params, frozen, k=5)
    ids, vals = srv.query(np.arange(data.num_users, dtype=np.int32))
    np.testing.assert_array_equal(ids, oracle_ids)
    np.testing.assert_allclose(vals, oracle_vals, rtol=1e-5, atol=1e-5)


def test_segmax_transposed_out_bit_equal():
    """The [B, S]-major output mode (in-VMEM tile transpose) must be
    BIT-equal to the [S, B]-major mode's logical transpose."""
    import jax
    import jax.numpy as jnp

    from fashionvisualexpl_tpu.ops.segmax import segmax_scores

    rng = np.random.default_rng(0)
    B, Ip, D, seg = 16, 256, 8, 8
    uf = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    iv = jnp.asarray(rng.normal(size=(Ip, D)).astype(np.float32))
    ib = jnp.asarray(rng.normal(size=(Ip,)).astype(np.float32))
    interp = jax.default_backend() != "tpu"
    a = segmax_scores(uf, iv, ib, seg, item_tile=64, interpret=interp)
    b = segmax_scores(uf, iv, ib, seg, item_tile=64, interpret=interp,
                      transposed_out=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_segmax_kernel_interpret_matches_scan():
    """The fused Pallas stage-1 kernel (interpret mode on CPU) must serve
    identical results to the XLA scan path."""
    model, data, params, frozen = _fixture(U=24, I=256, K=16, seed=12)
    scan_srv = RecServer(model, data, k=5, seg=8, item_block=64,
                         segmax_kernel="off")
    kern_srv = RecServer(model, data, k=5, seg=8, item_block=64,
                         segmax_kernel="interpret")
    scan_srv.refresh(params, frozen)
    kern_srv.refresh(params, frozen)
    users = np.arange(data.num_users, dtype=np.int32)
    s_ids, s_vals = scan_srv.query(users)
    k_ids, k_vals = kern_srv.query(users)
    np.testing.assert_array_equal(k_ids, s_ids)
    np.testing.assert_allclose(k_vals, s_vals, rtol=1e-5, atol=1e-6)
