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


@pytest.mark.slow
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


@pytest.mark.slow
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


# --- torch numerical-parity fixtures ---------------------------------------
# torchvision itself is not in this image, so the reference stack is torch
# functional ops driven by a torchvision-LAYOUT state dict: this pins BOTH
# the importers' weight-layout conversion AND the JAX backbones' semantics
# (padding, pooling, bn eps, flatten order) against an independent
# implementation.  Real pretrained .pt/.npz files drop into the exact same
# loader path (CnnFeatureExtractor(torch_weights=...)).

torch = pytest.importorskip("torch")


def _bn_sd(sd, prefix, c, g):
    sd[f"{prefix}.weight"] = (torch.rand(c, generator=g) * 0.5 + 0.75)
    sd[f"{prefix}.bias"] = torch.randn(c, generator=g) * 0.1
    sd[f"{prefix}.running_mean"] = torch.randn(c, generator=g) * 0.1
    sd[f"{prefix}.running_var"] = torch.rand(c, generator=g) * 0.5 + 0.75


def _w(g, *shape):
    fan_in = int(np.prod(shape[1:])) or 1
    return torch.randn(*shape, generator=g) / np.sqrt(fan_in)


def _torch_resnet_sd(blocks, seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {"conv1.weight": _w(g, 64, 3, 7, 7)}
    _bn_sd(sd, "bn1", 64, g)
    in_c = 64
    for s, (n, out_c) in enumerate(zip(blocks, (256, 512, 1024, 2048))):
        mid = out_c // 4
        for b in range(n):
            t = f"layer{s + 1}.{b}"
            sd[f"{t}.conv1.weight"] = _w(g, mid, in_c, 1, 1)
            _bn_sd(sd, f"{t}.bn1", mid, g)
            sd[f"{t}.conv2.weight"] = _w(g, mid, mid, 3, 3)
            _bn_sd(sd, f"{t}.bn2", mid, g)
            sd[f"{t}.conv3.weight"] = _w(g, out_c, mid, 1, 1)
            _bn_sd(sd, f"{t}.bn3", out_c, g)
            if b == 0:
                sd[f"{t}.downsample.0.weight"] = _w(g, out_c, in_c, 1, 1)
                _bn_sd(sd, f"{t}.downsample.1", out_c, g)
            in_c = out_c
    sd["fc.weight"] = _w(g, 1000, 2048)
    sd["fc.bias"] = torch.randn(1000, generator=g) * 0.1
    return sd


def _torch_resnet_forward(sd, x, blocks):
    """torchvision resnet eval-mode forward (Bottleneck v1.5: stride on
    conv2) implemented with torch functional ops."""
    import torch.nn.functional as Fn

    def bn(y, p):
        return Fn.batch_norm(
            y, sd[f"{p}.running_mean"], sd[f"{p}.running_var"],
            sd[f"{p}.weight"], sd[f"{p}.bias"], training=False, eps=1e-5,
        )

    y = Fn.relu(bn(Fn.conv2d(x, sd["conv1.weight"], stride=2, padding=3), "bn1"))
    y = Fn.max_pool2d(y, 3, stride=2, padding=1)
    for s, n in enumerate(blocks):
        for b in range(n):
            t = f"layer{s + 1}.{b}"
            stride = 2 if (b == 0 and s > 0) else 1
            h = Fn.relu(bn(Fn.conv2d(y, sd[f"{t}.conv1.weight"]), f"{t}.bn1"))
            h = Fn.relu(bn(
                Fn.conv2d(h, sd[f"{t}.conv2.weight"], stride=stride, padding=1),
                f"{t}.bn2",
            ))
            h = bn(Fn.conv2d(h, sd[f"{t}.conv3.weight"]), f"{t}.bn3")
            if f"{t}.downsample.0.weight" in sd:
                y = bn(
                    Fn.conv2d(y, sd[f"{t}.downsample.0.weight"], stride=stride),
                    f"{t}.downsample.1",
                )
            y = Fn.relu(y + h)
    spatial = y
    pooled = y.mean(dim=(2, 3))
    logits = pooled @ sd["fc.weight"].T + sd["fc.bias"]
    return spatial, pooled, logits


def _np_sd(sd):
    return {k: v.detach().numpy() for k, v in sd.items()}


@pytest.mark.parametrize("blocks,name", [
    ((3, 4, 6, 3), "resnet50"),
    ((3, 8, 36, 3), "resnet152"),
])
def test_resnet_torch_numerical_parity(blocks, name):
    from fashionvisualexpl_tpu.vision.backbones import (
        load_torch_resnet152_state_dict,
        load_torch_resnet50_state_dict,
    )

    sd = _torch_resnet_sd(blocks, seed=3)
    x = torch.randn(2, 3, 64, 64, generator=torch.Generator().manual_seed(9))
    with torch.no_grad():
        spatial_t, pooled_t, logits_t = _torch_resnet_forward(sd, x, blocks)

    net = ResNet(blocks)
    loader = (load_torch_resnet50_state_dict if name == "resnet50"
              else load_torch_resnet152_state_dict)
    params = loader(net, _np_sd(sd))
    x_j = np.transpose(x.numpy(), (0, 2, 3, 1))  # NCHW -> NHWC
    pooled = np.asarray(net.apply(params, x_j))
    logits = np.asarray(net.apply(params, x_j, with_head=True))
    spatial = np.asarray(net.spatial_features(params, x_j))

    tol = dict(rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(pooled, pooled_t.numpy(), **tol)
    np.testing.assert_allclose(logits, logits_t.numpy(), **tol)
    np.testing.assert_allclose(
        spatial, np.transpose(spatial_t.numpy(), (0, 2, 3, 1)), **tol
    )


def test_resnet_importer_depth_check():
    from fashionvisualexpl_tpu.vision.backbones import (
        load_torch_resnet152_state_dict,
    )

    sd = _torch_resnet_sd((3, 4, 6, 3), seed=0)
    with pytest.raises(ValueError, match="blocks"):
        load_torch_resnet152_state_dict(ResNet((3, 4, 6, 3)), _np_sd(sd))
    with pytest.raises(KeyError, match="resnet152"):
        load_torch_resnet152_state_dict(
            ResNet((3, 8, 36, 3)), _np_sd(sd)
        )


def _torch_vgg19_sd(flat_dim, seed=0):
    g = torch.Generator().manual_seed(seed)
    idx = (0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34)
    cfg = (64, 64, 128, 128, 256, 256, 256, 256,
           512, 512, 512, 512, 512, 512, 512, 512)
    sd = {}
    in_c = 3
    for i, c in zip(idx, cfg):
        sd[f"features.{i}.weight"] = _w(g, c, in_c, 3, 3)
        sd[f"features.{i}.bias"] = torch.randn(c, generator=g) * 0.1
        in_c = c
    sd["classifier.0.weight"] = _w(g, 4096, flat_dim)
    sd["classifier.0.bias"] = torch.randn(4096, generator=g) * 0.1
    sd["classifier.3.weight"] = _w(g, 4096, 4096)
    sd["classifier.3.bias"] = torch.randn(4096, generator=g) * 0.1
    sd["classifier.6.weight"] = _w(g, 1000, 4096)
    sd["classifier.6.bias"] = torch.randn(1000, generator=g) * 0.1
    return sd


def _torch_vgg19_forward(sd, x):
    import torch.nn.functional as Fn

    idx = (0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34)
    k = 0
    for stage_len in (2, 2, 4, 4, 4):
        for _ in range(stage_len):
            x = Fn.relu(Fn.conv2d(
                x, sd[f"features.{idx[k]}.weight"],
                sd[f"features.{idx[k]}.bias"], padding=1,
            ))
            k += 1
        x = Fn.max_pool2d(x, 2, 2)
    x = torch.flatten(x, 1)  # CHW flatten order
    fc1 = Fn.relu(Fn.linear(x, sd["classifier.0.weight"], sd["classifier.0.bias"]))
    fc2 = Fn.relu(Fn.linear(fc1, sd["classifier.3.weight"], sd["classifier.3.bias"]))
    preds = Fn.linear(fc2, sd["classifier.6.weight"], sd["classifier.6.bias"])
    return fc1, fc2, preds


def test_vgg19_torch_numerical_parity():
    from fashionvisualexpl_tpu.vision.backbones import (
        load_torch_vgg19_state_dict,
    )

    net = VGG19(input_hw=(64, 64))
    sd = _torch_vgg19_sd(net.flat_dim, seed=5)
    x = torch.randn(2, 3, 64, 64, generator=torch.Generator().manual_seed(11))
    with torch.no_grad():
        fc1_t, fc2_t, preds_t = _torch_vgg19_forward(sd, x)

    params = load_torch_vgg19_state_dict(net, _np_sd(sd))
    x_j = np.transpose(x.numpy(), (0, 2, 3, 1))
    tol = dict(rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(net.apply(params, x_j, output_layer="fc1")),
        fc1_t.numpy(), **tol,
    )
    np.testing.assert_allclose(
        np.asarray(net.apply(params, x_j, output_layer="fc2")),
        fc2_t.numpy(), **tol,
    )
    np.testing.assert_allclose(
        np.asarray(net.apply(params, x_j, output_layer="predictions")),
        preds_t.numpy(), **tol,
    )


def test_vgg19_importer_flat_dim_mismatch():
    from fashionvisualexpl_tpu.vision.backbones import (
        load_torch_vgg19_state_dict,
    )

    net = VGG19(input_hw=(64, 64))
    sd = _torch_vgg19_sd(25088, seed=0)  # 224x224-layout classifier
    with pytest.raises(ValueError, match="flat dim"):
        load_torch_vgg19_state_dict(net, _np_sd(sd))


def test_extractor_torch_weights_file_roundtrip(tmp_path):
    """CnnFeatureExtractor(torch_weights=...) end-to-end through an .npz
    state-dict file: classify + extract_feature match the torch reference."""
    from fashionvisualexpl_tpu.vision.extractors import CnnFeatureExtractor

    net_blocks = (3, 4, 6, 3)
    sd = _torch_resnet_sd(net_blocks, seed=1)
    npz = tmp_path / "resnet50.npz"
    np.savez(str(npz), **_np_sd(sd))

    ex = CnnFeatureExtractor(
        output_layer="avg_pool", model_name="ResNet50",
        torch_weights=str(npz),
    )
    x = torch.randn(2, 3, 64, 64, generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        _, pooled_t, logits_t = _torch_resnet_forward(sd, x, net_blocks)
    x_j = np.transpose(x.numpy(), (0, 2, 3, 1)).astype(np.float32)
    feats = ex.extract_feature(x_j)
    np.testing.assert_allclose(feats, pooled_t.numpy(), rtol=1e-4, atol=1e-4)
    recs = ex.classify(x_j, ["0.jpg", "1.jpg"])
    assert [r["ClassNum"] for r in recs] == list(
        logits_t.argmax(dim=1).numpy()
    )
