"""Native C++ data plane must match the Python loaders exactly."""

import os

import numpy as np
import pytest

from fashionvisualexpl_tpu.data.interactions import (
    pad_sorted_positives,
    read_split_tsv,
    synthetic_interactions,
)
from fashionvisualexpl_tpu.data.native import (
    load_library,
    pad_sorted_positives_native,
    parse_interactions_tsv,
)

pytestmark = pytest.mark.skipif(
    load_library() is None, reason="native library unavailable"
)


def _write_tsv(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write("\t".join(str(x) for x in r) + "\n")


def test_parse_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    rows = [
        (int(rng.integers(0, 50)), int(rng.integers(0, 80)),
         int(rng.integers(0, 10**9)), 1.0)
        for _ in range(500)
    ]
    path = str(tmp_path / "train.tsv")
    _write_tsv(path, rows)

    users, items, times = parse_interactions_tsv(path)
    py_pairs = read_split_tsv(path)
    assert len(users) == len(py_pairs) == 500
    np.testing.assert_array_equal(users, [u for u, _ in py_pairs])
    np.testing.assert_array_equal(items, [i for _, i in py_pairs])
    np.testing.assert_array_equal(times, [r[2] for r in rows])


def test_parse_two_column_and_trailing_newline(tmp_path):
    path = str(tmp_path / "t.tsv")
    with open(path, "w") as f:
        f.write("0\t5\n1\t7\n\n2\t9")  # empty line + no trailing newline
    users, items, times = parse_interactions_tsv(path)
    np.testing.assert_array_equal(users, [0, 1, 2])
    np.testing.assert_array_equal(items, [5, 7, 9])
    np.testing.assert_array_equal(times, [0, 0, 0])


def test_pad_positives_matches_python():
    data = synthetic_interactions(40, 60, interactions_per_user=9, seed=1)
    users = data.train_pairs[:, 0]
    items = data.train_pairs[:, 1]
    padded_py, counts_py = pad_sorted_positives(
        data.training_list, data.num_items
    )
    out = pad_sorted_positives_native(
        users, items, data.num_users, data.num_items,
        width=padded_py.shape[1],
    )
    assert out is not None
    padded_c, counts_c = out
    np.testing.assert_array_equal(counts_c, counts_py)
    np.testing.assert_array_equal(padded_c, padded_py)


def test_large_file_parse(tmp_path):
    """Multithreaded chunked parse preserves order on a larger file."""
    n = 200_000
    rng = np.random.default_rng(2)
    u = rng.integers(0, 1000, n)
    i = rng.integers(0, 2000, n)
    t = rng.integers(0, 10**9, n)
    path = str(tmp_path / "big.tsv")
    with open(path, "w") as f:
        f.writelines(f"{a}\t{b}\t{c}\n" for a, b, c in zip(u, i, t))
    users, items, times = parse_interactions_tsv(path)
    np.testing.assert_array_equal(users, u)
    np.testing.assert_array_equal(items, i)
    np.testing.assert_array_equal(times, t)


def test_native_write_recs_tsv(tmp_path):
    """Native dump writer vs the Python f-string writer: same rows, scores
    round-trip float32 exactly (%.9g)."""
    from fashionvisualexpl_tpu.data.native import load_library, write_recs_tsv

    if load_library() is None:
        import pytest

        pytest.skip("no native toolchain")
    rng = np.random.default_rng(0)
    n, k = 37, 5
    users = np.arange(n, dtype=np.int32)
    ids = rng.integers(0, 1000, (n, k)).astype(np.int32)
    vals = (rng.standard_normal((n, k)) * 100).astype(np.float32)
    path = str(tmp_path / "recs.tsv")
    assert write_recs_tsv(path, users, ids, vals)
    lines = open(path).read().strip().split("\n")
    assert len(lines) == n * k
    for r in range(n):
        for j in range(k):
            u, i, s = lines[r * k + j].split("\t")
            assert int(u) == users[r] and int(i) == ids[r, j]
            assert np.float32(s) == vals[r, j]  # %.9g round-trips float32


def test_native_gather_rows_matches_numpy():
    """Threaded native row gather == src[ids] (float32, 2D/4D rows)."""
    from fashionvisualexpl_tpu.data.native import gather_rows_native, load_library

    if load_library() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(0)
    for shape in [(50, 16), (40, 4, 4, 1)]:
        src = rng.random(shape).astype(np.float32)
        ids = rng.integers(0, shape[0], 33).astype(np.int32)
        got = gather_rows_native(src, ids)
        np.testing.assert_array_equal(got, src[ids])


def test_streamed_store_uses_native_gather():
    """ArrayFeatureStore.gather output identical with and without the
    native path (the streamed trainer's host hot path)."""
    from fashionvisualexpl_tpu.train.streamed import ArrayFeatureStore

    rng = np.random.default_rng(1)
    color = rng.random((30, 8)).astype(np.float32)
    edges = rng.random((30, 4, 4, 1)).astype(np.float32)
    cls = rng.random((30, 5)).astype(np.float32)
    store = ArrayFeatureStore(color, edges, cls)
    pos = rng.integers(0, 30, 10).astype(np.int32)
    neg = rng.integers(0, 30, 10).astype(np.int32)
    feats = store.gather(pos, neg)
    store._native = False
    ref = store.gather(pos, neg)
    for k in ref:
        np.testing.assert_array_equal(feats[k], ref[k])
