"""Offline feature-extraction driver.

Produces the complete artifact set the training stack consumes — the union
of reference src/classify_extract.py, src/extract_features.py, and the
fuller artifact list of its OLD driver (SURVEY.md §2.2: classes CSV, CNN
feature matrix + per-item split, per-item color .npy, edge .tiffs,
histograms.npy, one_hot_enc.npy):

  python -m fashionvisualexpl_tpu.cli.extract_features --dataset amazon_baby \
      --cnn_model ResNet50 --output_layer avg_pool --batch 64

CNN extraction is TPU-batched (one jitted backbone program per batch);
edge/color extraction is host OpenCV (offline by design).
"""

from __future__ import annotations

import argparse
import os
import time
from typing import List

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Run offline feature extraction.")
    p.add_argument("--dataset", nargs="?", default="amazon_baby")
    p.add_argument("--cnn_model", nargs="?", default="ResNet50")
    p.add_argument("--output_layer", nargs="?", default="avg_pool")
    p.add_argument("--num_colors", type=int, default=3)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--resize", type=int, default=224)
    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--skip_cnn", action="store_true")
    p.add_argument("--skip_low", action="store_true")
    p.add_argument("--torch_weights", type=str, default=None,
                   help="pretrained torchvision state dict (.npz or "
                        ".pt/.pth) for --cnn_model; omitting it runs "
                        "random-init (shape/speed only, not semantic "
                        "features)")
    return p.parse_args(argv)


def extract(argv=None):
    args = parse_args(argv)

    from PIL import Image
    import pandas as pd

    from fashionvisualexpl_tpu.core.config import Paths
    from fashionvisualexpl_tpu.utils.io import ensure_dir
    from fashionvisualexpl_tpu.vision.dataset import ImageFolderDataset
    from fashionvisualexpl_tpu.vision.extractors import (
        CnnFeatureExtractor,
        LowFeatureExtractor,
        color_histogram,
        preprocess,
    )

    paths = Paths(root=args.data_root)
    ds = args.dataset
    data = ImageFolderDataset(
        paths.images(ds), resize=(args.resize, args.resize)
    )
    n = len(data)
    print(f"Extracting features for {n} images")
    start = time.time()

    if not args.skip_cnn:
        cnn = CnnFeatureExtractor(
            output_layer=args.output_layer, model_name=args.cnn_model,
            torch_weights=args.torch_weights,
        )
        feats: List[np.ndarray] = []
        records = []
        split_dir = ensure_dir(
            paths.cnn_features_split_dir(ds, args.cnn_model, args.output_layer)
        )
        for imgs, names in data.batches(args.batch):
            x = preprocess(imgs)
            f = cnn.extract_feature(x)
            feats.append(f.reshape(f.shape[0], -1))
            for row, name in zip(f, names):
                np.save(
                    os.path.join(split_dir, f"{os.path.splitext(name)[0]}.npy"),
                    row,
                )
            records.extend(cnn.classify(x, names))
        ensure_dir(paths.original(ds))
        np.save(
            paths.cnn_features(ds, args.cnn_model, args.output_layer),
            np.concatenate(feats, axis=0),
        )
        pd.DataFrame(records).to_csv(
            paths.classes_csv(ds, args.cnn_model), index=False
        )
        print(f"CNN features done in {time.time() - start:.1f}s")

    if not args.skip_low:
        import cv2

        low = LowFeatureExtractor(args.num_colors)
        colors_dir = ensure_dir(paths.colors_dir(ds))
        edges_dir = ensure_dir(paths.edges_dir(ds))
        hist_dir = ensure_dir(paths.hist_color_features_dir(ds))
        ensure_dir(paths.features_dir(ds))
        hists = np.zeros((n, 512), dtype=np.int32)
        for i in range(n):
            rgb, name = data[i]
            bgr = cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR)
            item = os.path.splitext(name)[0]
            edge_map, colors = low.extract_color_edges((bgr, name))
            Image.fromarray(edge_map.astype(np.uint8), mode="L").save(
                os.path.join(edges_dir, f"{item}.tiff")
            )
            np.save(os.path.join(colors_dir, f"{item}.npy"), colors)
            h = color_histogram(bgr)
            hists[i] = h
            np.save(os.path.join(hist_dir, f"{item}.npy"), h)
        np.save(paths.hist_color_features(ds), hists)
        print(f"Low-level features done in {time.time() - start:.1f}s")

    # class one-hots from the classification CSV (extract_features.py:42-49)
    classes_csv = paths.classes_csv(ds, args.cnn_model)
    if os.path.exists(classes_csv):
        from sklearn.preprocessing import LabelBinarizer

        df = pd.read_csv(classes_csv)
        onehot = LabelBinarizer().fit_transform(df.ClassStr)
        if onehot.shape[1] == 1:  # LabelBinarizer degenerates with <3 classes
            onehot = np.eye(2, dtype=np.int64)[onehot[:, 0]]
        np.save(paths.class_features(ds), onehot)
        oh_dir = ensure_dir(paths.class_features_dir(ds))
        for i, name in enumerate(data.filenames):
            np.save(
                os.path.join(oh_dir, f"{os.path.splitext(name)[0]}.npy"),
                onehot[i],
            )
        print(f"There are {onehot.shape[1]} different classes")

    print(f"Total extraction time: {time.time() - start:.1f}s")


if __name__ == "__main__":
    extract()
