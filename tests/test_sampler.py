"""On-device negative sampler: exactness and distribution tests."""

import jax
import jax.numpy as jnp
import numpy as np

from fashionvisualexpl_tpu.data.interactions import (
    pad_sorted_positives,
    synthetic_interactions,
)
from fashionvisualexpl_tpu.data.sampler import (
    derived_pairs_ok,
    sample_negatives,
    sample_triplets,
)


def test_never_samples_positive():
    rng = np.random.default_rng(0)
    num_items = 50
    user_lists = [
        sorted(rng.choice(num_items, size=rng.integers(1, 30), replace=False))
        for _ in range(20)
    ]
    padded, counts = pad_sorted_positives(user_lists, num_items)
    users = jnp.asarray(rng.integers(0, 20, size=4096), dtype=jnp.int32)
    neg = sample_negatives(
        jax.random.PRNGKey(1), users, jnp.asarray(padded), jnp.asarray(counts),
        num_items,
    )
    neg = np.asarray(neg)
    users_np = np.asarray(users)
    assert neg.min() >= 0 and neg.max() < num_items
    for u, j in zip(users_np, neg):
        assert j not in user_lists[u], f"sampled positive {j} for user {u}"


def test_uniform_over_complement():
    """Sampler must be exactly uniform over non-positives (the distribution
    the reference rejection loop at dataset.py:100-103 produces)."""
    num_items = 20
    user_lists = [[2, 5, 6, 7, 13]]
    padded, counts = pad_sorted_positives(user_lists, num_items)
    n = 60000
    users = jnp.zeros(n, jnp.int32)
    neg = np.asarray(
        sample_negatives(
            jax.random.PRNGKey(0), users, jnp.asarray(padded),
            jnp.asarray(counts), num_items,
        )
    )
    complement = sorted(set(range(num_items)) - set(user_lists[0]))
    hist = np.bincount(neg, minlength=num_items)
    assert hist[user_lists[0]].sum() == 0
    expected = n / len(complement)
    # each complement bucket within 5 sigma of uniform
    sigma = np.sqrt(n * (1 / len(complement)) * (1 - 1 / len(complement)))
    assert np.all(np.abs(hist[complement] - expected) < 5 * sigma)


def test_dense_user_edge_case():
    """A user positive on all but one item must always get that item."""
    num_items = 10
    user_lists = [[0, 1, 2, 3, 4, 5, 6, 8, 9]]  # only 7 is negative
    padded, counts = pad_sorted_positives(user_lists, num_items)
    users = jnp.zeros(256, jnp.int32)
    neg = np.asarray(
        sample_negatives(
            jax.random.PRNGKey(3), users, jnp.asarray(padded),
            jnp.asarray(counts), num_items,
        )
    )
    assert np.all(neg == 7)


def test_sample_triplets_shapes_and_validity():
    data = synthetic_interactions(30, 40, interactions_per_user=8, seed=1)
    steps = data.steps_per_epoch(16)
    users, pos, neg = sample_triplets(
        jax.random.PRNGKey(0),
        jnp.asarray(data.train_pairs),
        jnp.asarray(data.padded_pos),
        jnp.asarray(data.pos_counts),
        data.num_items,
        steps,
        16,
    )
    assert users.shape == pos.shape == neg.shape == (steps, 16)
    users, pos, neg = map(np.asarray, (users, pos, neg))
    for u, p, n in zip(users.ravel(), pos.ravel(), neg.ravel()):
        assert p in data.training_list[u]
        assert n not in data.training_list[u]


def test_with_replacement_sampling():
    """Bootstrap mode: valid triplets, negatives never positive."""
    data = synthetic_interactions(30, 40, interactions_per_user=8, seed=2)
    users, pos, neg = sample_triplets(
        jax.random.PRNGKey(5),
        jnp.asarray(data.train_pairs),
        jnp.asarray(data.padded_pos),
        jnp.asarray(data.pos_counts),
        data.num_items,
        6,
        32,
        with_replacement=True,
    )
    users, pos, neg = map(np.asarray, (users, pos, neg))
    assert users.shape == (6, 32)
    for u, p, n in zip(users.ravel(), pos.ravel(), neg.ravel()):
        assert p in data.training_list[u]
        assert n not in data.training_list[u]


def test_user_perm_matches_reference_epoch_semantics():
    """Default scheme = the reference's epoch ordering (dataset.py:94-99):
    user-contiguous runs, each user's positives in stored order, every
    interaction consumed exactly once (up to the dropped tail)."""
    data = synthetic_interactions(30, 40, interactions_per_user=8, seed=3)
    batch = 16
    steps = data.steps_per_epoch(batch)
    users, pos, neg = sample_triplets(
        jax.random.PRNGKey(7),
        jnp.asarray(data.train_pairs),
        jnp.asarray(data.padded_pos),
        jnp.asarray(data.pos_counts),
        data.num_items, steps, batch,
    )
    users, pos = np.asarray(users).ravel(), np.asarray(pos).ravel()
    take = steps * batch
    # (a) user runs are contiguous: each user appears in exactly one run
    #     (except possibly the one cut by the tail truncation)
    change = np.nonzero(np.diff(users))[0]
    run_users = users[np.concatenate([[0], change + 1])]
    full_runs = run_users if take == len(data.train_pairs) else run_users[:-1]
    assert len(set(full_runs.tolist())) == len(full_runs)
    # (b) within a run, positives appear in the user's stored order
    starts = np.concatenate([[0], change + 1, [take]])
    for s, e in zip(starts[:-1], starts[1:]):
        u = users[s]
        stored = data.training_list[u]
        assert pos[s:e].tolist() == stored[: e - s]
    # (c) every consumed (u, p) pair is unique (without replacement)
    seen = set(zip(users.tolist(), pos.tolist()))
    assert len(seen) == take


def test_bootstrap_reaches_generic_trainer_path():
    """Regression: --bootstrap was silently ignored by the generic epoch
    builder (it never forwarded the scheme to sample_triplets)."""
    from fashionvisualexpl_tpu.core.config import TrainConfig
    from fashionvisualexpl_tpu.models.bprmf import BPRMF
    from fashionvisualexpl_tpu.train.trainer import Trainer

    data = synthetic_interactions(20, 30, interactions_per_user=6, seed=0)
    losses = {}
    for bootstrap in (False, True):
        cfg = TrainConfig(batch_size=16, epochs=1, lr=0.01, reg=0.0,
                          bootstrap=bootstrap, seed=0)
        model = BPRMF(data.num_users, data.num_items, embed_k=8)
        tr = Trainer(model, data, cfg)
        state, frozen = tr.init_state()
        _, loss = tr.run_epoch(state, frozen, jax.random.PRNGKey(0))
        losses[bootstrap] = float(loss)
    # different triple streams -> different epoch losses
    assert losses[False] != losses[True], losses


def test_user_perm_uniform_fast_path_matches_generic():
    """When every user has the same positive count (statically provable:
    n == U * padded_width), user_perm shuffles whole user RUNS via a [U]
    superrow gather (sampler.py fast path).  It must produce bit-identical
    triples to the generic per-pair-index path — forced here by widening
    padded_pos with one extra sentinel column (breaks the static
    uniformity test, changes nothing semantically: sentinels never win
    the complement-count comparison)."""
    data = synthetic_interactions(25, 50, interactions_per_user=9, seed=11)
    counts = np.asarray(data.pos_counts)
    assert (counts == counts[0]).all(), "fixture must be uniform"
    batch = 16
    steps = data.steps_per_epoch(batch)
    key = jax.random.PRNGKey(13)

    fast = sample_triplets(
        key, jnp.asarray(data.train_pairs), jnp.asarray(data.padded_pos),
        jnp.asarray(data.pos_counts), data.num_items, steps, batch,
    )
    sentinel = data.num_items + 1  # out of range, strictly increasing rows
    wide = np.concatenate(
        [np.asarray(data.padded_pos),
         np.full((data.num_users, 1), sentinel, np.int32)], axis=1,
    )
    generic = sample_triplets(
        key, jnp.asarray(data.train_pairs), jnp.asarray(wide),
        jnp.asarray(data.pos_counts), data.num_items, steps, batch,
    )
    for name, f, g in zip(("users", "pos", "neg"), fast, generic):
        np.testing.assert_array_equal(
            np.asarray(f), np.asarray(g), err_msg=name
        )


def _sorted_uniform_interactions(num_users=24, num_items=60, per_user=7,
                                 seed=21):
    """Fixture in the derived-pairs regime: uniform counts, each user's
    training row stored SORTED (so padded_pos rows == stored pair order)."""
    from fashionvisualexpl_tpu.data.interactions import Interactions

    rng = np.random.default_rng(seed)
    training = [
        sorted(rng.choice(num_items, size=per_user, replace=False).tolist())
        for _ in range(num_users)
    ]
    test = [[int(rng.integers(num_items))] for _ in range(num_users)]
    return Interactions.from_lists(training, test, num_items)


def test_derived_pairs_bit_identical_all_schemes():
    """train_pairs=None (capacity mode) must reproduce the materialized
    pair-table path bit-for-bit in all three epoch schemes when eligible
    (uniform counts + sorted stored order)."""
    data = _sorted_uniform_interactions()
    assert derived_pairs_ok(data.train_pairs, data.padded_pos)
    batch = 16
    steps = data.steps_per_epoch(batch)
    pos_d = jnp.asarray(data.padded_pos)
    cnt_d = jnp.asarray(data.pos_counts)
    for scheme in (False, True, "pair_perm"):
        key = jax.random.PRNGKey(3)
        ref = sample_triplets(
            key, jnp.asarray(data.train_pairs), pos_d, cnt_d,
            data.num_items, steps, batch, with_replacement=scheme,
        )
        der = sample_triplets(
            key, None, pos_d, cnt_d,
            data.num_items, steps, batch, with_replacement=scheme,
        )
        for name, r, d in zip(("users", "pos", "neg"), ref, der):
            np.testing.assert_array_equal(
                np.asarray(r), np.asarray(d),
                err_msg=f"scheme={scheme} {name}",
            )


def test_derived_pairs_ok_rejects_ineligible():
    data = _sorted_uniform_interactions()
    # unsorted stored order: padded rows no longer equal the pair list
    shuffled = [list(reversed(r)) for r in data.training_list]
    from fashionvisualexpl_tpu.data.interactions import Interactions

    bad_order = Interactions.from_lists(
        shuffled, data.test_list, data.num_items
    )
    assert not derived_pairs_ok(bad_order.train_pairs, bad_order.padded_pos)
    # non-uniform counts
    trimmed = [r[:-1] if u == 0 else r
               for u, r in enumerate(data.training_list)]
    bad_counts = Interactions.from_lists(
        trimmed, data.test_list, data.num_items
    )
    assert not derived_pairs_ok(bad_counts.train_pairs, bad_counts.padded_pos)


def test_derived_pairs_through_packed_epoch_fn():
    """The generic packed epoch fn accepts train_pairs=None under jit and
    trains identically to the materialized-pairs epoch."""
    from fashionvisualexpl_tpu.models.bprmf import BPRMF
    from fashionvisualexpl_tpu.train.packed_generic import (
        make_generic_packed_epoch_fn, pack_generic_state,
        unpack_generic_params,
    )

    data = _sorted_uniform_interactions()
    model = BPRMF(data.num_users, data.num_items, embed_k=8)
    params, frozen = model.init(jax.random.PRNGKey(0))
    batch = 16
    steps = data.steps_per_epoch(batch)
    epoch_fn = make_generic_packed_epoch_fn(
        model, 0.01, 0.001, data.num_items, steps, batch,
        with_replacement=False, lazy_catchup=True,
    )
    pos_d = jnp.asarray(data.padded_pos)
    cnt_d = jnp.asarray(data.pos_counts)
    outs = {}
    for label, pairs_arg in (
        ("pairs", jnp.asarray(data.train_pairs)), ("derived", None)
    ):
        state = pack_generic_state(model, params)
        state, loss = epoch_fn(
            state, frozen, jax.random.PRNGKey(5), pairs_arg, pos_d, cnt_d
        )
        outs[label] = (
            float(loss),
            unpack_generic_params(state, model.packed_spec()),
        )
    assert outs["pairs"][0] == outs["derived"][0]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        outs["pairs"][1], outs["derived"][1],
    )


def test_derived_pairs_with_fused_frozen_epoch():
    """Derived pairs composes with fused_frozen packed rows (the VBPR
    capacity configuration): epoch losses and packed state bit-equal to
    the materialized-pairs epoch."""
    from fashionvisualexpl_tpu.data.features import synthetic_features
    from fashionvisualexpl_tpu.models.vbpr import VBPR
    from fashionvisualexpl_tpu.train.packed_generic import (
        make_generic_packed_epoch_fn, pack_generic_state,
    )

    data = _sorted_uniform_interactions(num_users=20, num_items=40,
                                        per_user=6, seed=33)
    model = VBPR(20, 40, synthetic_features(40, 9, seed=1),
                 embed_k=6, embed_d=4)
    params, frozen = model.init(jax.random.PRNGKey(0))
    batch = 16
    steps = data.steps_per_epoch(batch)
    epoch_fn = make_generic_packed_epoch_fn(
        model, 0.01, 0.001, data.num_items, steps, batch,
        with_replacement=False, fused_frozen=True,
        moment_dtype="bfloat16", lazy_catchup=True,
    )
    pos_d = jnp.asarray(data.padded_pos)
    cnt_d = jnp.asarray(data.pos_counts)
    outs = {}
    for label, pairs_arg in (
        ("pairs", jnp.asarray(data.train_pairs)), ("derived", None)
    ):
        # pack consumes the param buffers — copy so both labels pack
        # identical bits
        st = pack_generic_state(
            model, jax.tree_util.tree_map(jnp.copy, params),
            frozen=frozen, moment_dtype="bfloat16",
        )
        for e in range(2):
            st, loss = epoch_fn(
                st, frozen, jax.random.PRNGKey(40 + e), pairs_arg,
                pos_d, cnt_d,
            )
        outs[label] = (float(loss), np.asarray(st.user_pmv),
                       np.asarray(st.item_pmv))
    assert outs["pairs"][0] == outs["derived"][0]
    np.testing.assert_array_equal(outs["pairs"][1], outs["derived"][1])
    np.testing.assert_array_equal(outs["pairs"][2], outs["derived"][2])


def test_partial_epoch_user_slice_matches_generic():
    """Partial epochs (take < n) slice the permutation to the users
    actually consumed before the row gather (sampler fast paths) — the
    triples must still equal the UNSLICED generic per-pair-index path
    bit-for-bit, and the derived mode must match both."""
    data = synthetic_interactions(25, 50, interactions_per_user=9, seed=11)
    batch = 16
    steps = 3  # partial: 48 of 175 pairs -> nu = ceil(48/7) = 7 of 25 users
    assert steps * batch < len(data.train_pairs)
    key = jax.random.PRNGKey(17)

    fast = sample_triplets(
        key, jnp.asarray(data.train_pairs), jnp.asarray(data.padded_pos),
        jnp.asarray(data.pos_counts), data.num_items, steps, batch,
    )
    sentinel = data.num_items + 1
    wide = np.concatenate(
        [np.asarray(data.padded_pos),
         np.full((data.num_users, 1), sentinel, np.int32)], axis=1,
    )
    generic = sample_triplets(
        key, jnp.asarray(data.train_pairs), jnp.asarray(wide),
        jnp.asarray(data.pos_counts), data.num_items, steps, batch,
    )
    for name, f, g in zip(("users", "pos", "neg"), fast, generic):
        np.testing.assert_array_equal(
            np.asarray(f), np.asarray(g), err_msg=name
        )

    sorted_data = _sorted_uniform_interactions(num_users=25, num_items=50,
                                               per_user=9, seed=11)
    ref = sample_triplets(
        key, jnp.asarray(sorted_data.train_pairs),
        jnp.asarray(sorted_data.padded_pos),
        jnp.asarray(sorted_data.pos_counts), sorted_data.num_items,
        steps, batch,
    )
    der = sample_triplets(
        key, None, jnp.asarray(sorted_data.padded_pos),
        jnp.asarray(sorted_data.pos_counts), sorted_data.num_items,
        steps, batch,
    )
    for name, r, d in zip(("users", "pos", "neg"), ref, der):
        np.testing.assert_array_equal(
            np.asarray(r), np.asarray(d), err_msg=name
        )
