"""Interaction dataset loading.

Drop-in compatible with the reference's file formats (reference
src/dataset/dataset.py:13-81): per-split TSVs `trainingset.tsv` /
`validationset.tsv` / `testset.tsv` with rows ``user\titem\t[time\trating]``,
and user/item counts taken from the `stats_after_downloading` info file
(dataset.py:41-50).

Unlike the reference — which keeps ragged Python lists and walks them in host
loops — this module materializes fixed-shape, device-friendly structures:

- ``train_pairs``: all (user, item) training interactions as one [N, 2] array
  (the unit the trainer shuffles and batches each epoch);
- ``padded_pos`` / ``pos_counts``: per-user sorted positive items padded to a
  common width with strictly-increasing out-of-range sentinels, which is what
  the exact on-device negative sampler (data/sampler.py) binary-searches.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from fashionvisualexpl_tpu.core.config import Paths, TrainConfig


def read_split_tsv(path: str, use_native: bool = True) -> List[Tuple[int, int]]:
    """Read (user, item) pairs from a reference-format split TSV.

    Uses the native C++ parser (data/native.py, mmap + multithreaded) when
    available — the reference's per-line Python loop (dataset.py:52-81)
    takes minutes at 10^7+ rows; falls back to pure Python otherwise."""
    if use_native:
        try:
            from fashionvisualexpl_tpu.data.native import parse_interactions_tsv

            parsed = parse_interactions_tsv(path)
        except Exception:
            parsed = None
        if parsed is not None:
            users, items, _ = parsed
            return list(zip(users.tolist(), items.tolist()))
    pairs: List[Tuple[int, int]] = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            parts = line.split("\t")
            pairs.append((int(parts[0]), int(parts[1])))
    return pairs


def read_counts_from_info(path: str) -> Tuple[int, int]:
    """Parse user/item counts from the stats file (reference dataset.py:41-50:
    line index 2 holds `...: num_users`, line index 3 `...: num_items`)."""
    with open(path) as f:
        lines = f.readlines()
    num_users = int(lines[2].split(": ")[1])
    num_items = int(lines[3].split(": ")[1])
    return num_users, num_items


def pairs_to_user_lists(
    pairs: Sequence[Tuple[int, int]], num_users: int
) -> List[List[int]]:
    """Group item ids by user (insertion order preserved, like the reference's
    load_list at dataset.py:52-81)."""
    lists: List[List[int]] = [[] for _ in range(num_users)]
    for u, i in pairs:
        lists[u].append(i)
    return lists


def pad_sorted_positives(
    user_lists: Sequence[Sequence[int]], num_items: int, width: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Build the padded sorted positives matrix for the on-device sampler.

    Returns (padded [U, P] int32, counts [U] int32).  Row u holds u's unique
    positives sorted ascending, then padding values ``num_items + slot`` so the
    whole row is strictly increasing — a property the sampler's binary search
    over ``row - arange`` relies on.
    """
    uniq = [sorted(set(row)) for row in user_lists]
    counts = np.array([len(r) for r in uniq], dtype=np.int32)
    if width is None:
        width = max(1, int(counts.max()) if len(counts) else 1)
    if counts.max(initial=0) > width:
        raise ValueError(f"width {width} < max positives {counts.max()}")
    padded = np.zeros((len(uniq), width), dtype=np.int32)
    pad_base = np.arange(width, dtype=np.int32) + num_items
    for u, row in enumerate(uniq):
        c = len(row)
        padded[u, :c] = row
        padded[u, c:] = pad_base[: width - c] + c  # keeps row strictly increasing
    return padded, counts


def multi_hot(user_lists: Sequence[Sequence[int]], num_items: int) -> np.ndarray:
    """Dense [U, I] bool membership matrix (train-mask / test-mask for eval)."""
    m = np.zeros((len(user_lists), num_items), dtype=bool)
    for u, row in enumerate(user_lists):
        if row:
            m[u, list(row)] = True
    return m


def pad_lists(
    user_lists: Sequence[Sequence[int]], pad_value: int, width: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Pad ragged per-user lists to [U, W] with `pad_value`; also return counts."""
    counts = np.array([len(r) for r in user_lists], dtype=np.int32)
    if width is None:
        width = max(1, int(counts.max()) if len(counts) else 1)
    out = np.full((len(user_lists), width), pad_value, dtype=np.int32)
    for u, row in enumerate(user_lists):
        out[u, : len(row)] = row[:width] if len(row) > width else row
    return out, counts


@dataclass
class Interactions:
    """Loaded interaction dataset with device-friendly derived structures."""

    num_users: int
    num_items: int
    training_list: List[List[int]]
    validation_list: List[List[int]]  # empty lists when no validation split
    test_list: List[List[int]]

    # derived, computed in __post_init__
    train_pairs: np.ndarray = field(init=False)  # [N, 2] int32
    padded_pos: np.ndarray = field(init=False)  # [U, P] int32, strictly increasing
    pos_counts: np.ndarray = field(init=False)  # [U] int32

    def __post_init__(self):
        # the user-permutation epoch sampler (data/sampler.py) derives each
        # user's run offsets from pos_counts (deduplicated) and requires
        # them to align with the user-major train_pairs layout — a duplicate
        # (user, item) training interaction would silently misattribute
        # every later user's run.  The reference trains straight through
        # duplicate rows (dataset.py load_list just appends), so a
        # reference-format dataset may legitimately contain them: dedupe
        # each user's row here (first-seen order preserved) with a warning
        # rather than refusing to load.
        n_raw = sum(len(row) for row in self.training_list)
        deduped = [list(dict.fromkeys(row)) for row in self.training_list]
        n_dedup = sum(len(row) for row in deduped)
        if n_dedup != n_raw:
            import warnings

            warnings.warn(
                f"dropped {n_raw - n_dedup} duplicate (user, item) training "
                "interactions (first occurrence kept); the reference would "
                "train through them, weighting those pairs more heavily",
                stacklevel=2,
            )
            self.training_list = deduped
        pairs = [
            (u, i) for u, row in enumerate(self.training_list) for i in row
        ]
        self.train_pairs = (
            np.array(pairs, dtype=np.int32)
            if pairs
            else np.zeros((0, 2), dtype=np.int32)
        )
        self.padded_pos, self.pos_counts = pad_sorted_positives(
            self.training_list, self.num_items
        )

    @property
    def num_train(self) -> int:
        return int(self.train_pairs.shape[0])

    @property
    def has_validation(self) -> bool:
        return any(len(r) > 0 for r in self.validation_list)

    def steps_per_epoch(self, batch_size: int) -> int:
        """Reference semantics: floor(num_train / batch) batches per epoch,
        remainder dropped (BPRMF.py:140, dataset.py:90-93)."""
        return self.num_train // batch_size

    @classmethod
    def load(cls, cfg: TrainConfig) -> "Interactions":
        """Load from the reference's on-disk layout."""
        paths = cfg.paths
        num_users, num_items = read_counts_from_info(
            paths.dataset_info(cfg.dataset)
        )
        train = pairs_to_user_lists(
            read_split_tsv(paths.training_set(cfg.dataset)), num_users
        )
        val_path = paths.validation_set(cfg.dataset)
        if cfg.validation and os.path.exists(val_path):
            val = pairs_to_user_lists(read_split_tsv(val_path), num_users)
        else:
            val = [[] for _ in range(num_users)]
        test = pairs_to_user_lists(
            read_split_tsv(paths.test_set(cfg.dataset)), num_users
        )
        return cls(num_users, num_items, train, val, test)

    @classmethod
    def from_lists(
        cls,
        training_list: Sequence[Sequence[int]],
        test_list: Sequence[Sequence[int]],
        num_items: int,
        validation_list: Optional[Sequence[Sequence[int]]] = None,
    ) -> "Interactions":
        num_users = len(training_list)
        if validation_list is None:
            validation_list = [[] for _ in range(num_users)]
        return cls(
            num_users,
            num_items,
            [list(r) for r in training_list],
            [list(r) for r in validation_list],
            [list(r) for r in test_list],
        )


def synthetic_interactions(
    num_users: int,
    num_items: int,
    interactions_per_user: int = 10,
    seed: int = 0,
    latent_dim: int = 8,
    validation: bool = True,
) -> Interactions:
    """Generate a synthetic dataset with planted low-rank structure.

    Users/items get latent vectors; each user's interactions are their top
    items by latent affinity plus noise, split leave-one-out like the
    reference's temporal splitter (src/split_dataset.py:16-33): last → test,
    second-to-last → validation, rest → train.
    """
    rng = np.random.default_rng(seed)
    U = rng.normal(size=(num_users, latent_dim))
    V = rng.normal(size=(num_items, latent_dim))
    scores = U @ V.T + rng.gumbel(size=(num_users, num_items))
    order = np.argsort(-scores, axis=1)

    training, validation_l, test = [], [], []
    for u in range(num_users):
        items = order[u, :interactions_per_user].tolist()
        rng.shuffle(items)
        test.append([items[-1]])
        if validation and len(items) >= 3:
            validation_l.append([items[-2]])
            training.append(items[:-2])
        else:
            validation_l.append([])
            training.append(items[:-1])
    return Interactions.from_lists(training, test, num_items, validation_l)
