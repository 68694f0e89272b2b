"""Host-side artifact stacking and prefetch.

The reference streams per-item artifacts through tf.py_function inside
tf.data (src/dataset/dataset.py:124-157, :160-208).  TPU-first, modality
inputs become dense device arrays loaded once: edge tiffs -> one
[I, 224, 224, 1] stack, per-item spatial CNN .npy -> one [I, S, C] stack.
For catalogs too large for HBM, `HostPrefetcher` streams per-batch gathers
from host memory (double-buffered) at the same interface.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Callable, Iterator, Optional, Sequence, Tuple

import numpy as np


def load_edge_image_stack(
    edges_dir: str, num_items: int, hw: Tuple[int, int] = (224, 224)
) -> np.ndarray:
    """Stack per-item edge tiffs ({edges_dir}/{item}.tiff, L-mode, /255 —
    reference dataset.py:176-204) into [I, H, W, 1] float32."""
    from PIL import Image

    out = np.zeros((num_items, hw[0], hw[1], 1), dtype=np.float32)
    for i in range(num_items):
        path = os.path.join(edges_dir, f"{i}.tiff")
        im = Image.open(path).convert("L").resize((hw[1], hw[0]))
        out[i, :, :, 0] = np.asarray(im, dtype=np.float32) / 255.0
    return out


def build_edge_stack_npy(
    edges_dir: str,
    out_path: str,
    num_items: int,
    hw: Tuple[int, int] = (224, 224),
) -> None:
    """One-time materialization of the per-item edge tiffs into a single
    float32 .npy stack written INCREMENTALLY through an np.lib.format
    memmap — peak host RAM stays one image, so catalogs whose edge stack
    exceeds RAM/HBM can still be built, then consumed via
    ``np.load(out_path, mmap_mode='r')`` by the streamed trainer."""
    from numpy.lib.format import open_memmap
    from PIL import Image

    out = open_memmap(
        out_path, mode="w+", dtype=np.float32,
        shape=(num_items, hw[0], hw[1], 1),
    )
    for i in range(num_items):
        path = os.path.join(edges_dir, f"{i}.tiff")
        im = Image.open(path).convert("L").resize((hw[1], hw[0]))
        out[i, :, :, 0] = np.asarray(im, dtype=np.float32) / 255.0
    out.flush()
    del out


def load_spatial_feature_stack(split_dir: str, num_items: int) -> np.ndarray:
    """Stack per-item spatial CNN features ({split_dir}/{item}.npy, reference
    ACF.py:140-150) into [I, S, C] float32, flattening H x W -> S."""
    first = np.load(os.path.join(split_dir, "0.npy"))
    sq = np.squeeze(first)
    if sq.ndim == 3:  # [H, W, C] -> [H*W, C]
        S, C = sq.shape[0] * sq.shape[1], sq.shape[2]
    elif sq.ndim == 2:
        S, C = sq.shape
    else:
        raise ValueError(f"unexpected spatial feature shape {first.shape}")
    out = np.zeros((num_items, S, C), dtype=np.float32)
    for i in range(num_items):
        arr = np.squeeze(np.load(os.path.join(split_dir, f"{i}.npy")))
        out[i] = arr.reshape(S, C)
    return out


class HostPrefetcher:
    """Background-thread prefetch of per-batch host gathers.

    gather_fn(ids) -> pytree of numpy arrays for one batch; batches of ids
    come from `id_iter`.  Keeps `depth` batches in flight so host gather
    overlaps device compute — the role tf.data's AUTOTUNE prefetch plays in
    the reference (dataset.py:118-122)."""

    def __init__(
        self,
        id_iter: Iterator[np.ndarray],
        gather_fn: Callable[[np.ndarray], object],
        depth: int = 2,
    ):
        self._iter = id_iter
        self._gather = gather_fn
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._done = object()
        self._error = None
        self._thread = threading.Thread(target=self._work, daemon=True)
        self._thread.start()

    def _work(self):
        try:
            for ids in self._iter:
                self._q.put((ids, self._gather(ids)))
        except BaseException as exc:  # re-raised on the consumer side
            self._error = exc
        finally:
            self._q.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            # keep the iterator permanently exhausted: a later __next__ must
            # re-raise instead of blocking on the empty queue forever
            self._q.put(self._done)
            if self._error is not None:
                # surface worker failures instead of silently truncating
                # the epoch
                raise RuntimeError(
                    "HostPrefetcher worker failed"
                ) from self._error
            raise StopIteration
        return item
