"""CNN backbones in pure JAX (NHWC) for the TPU feature-extraction path.

The reference wraps Keras pretrained ResNet50/VGG19/ResNet152
(src/vision/CnnFeatureExtractor.py:12-19).  Here the backbones are
implemented functionally in jnp so extraction runs as one jitted TPU program
(BASELINE.json config 3: on-the-fly ResNet-50 path); pretrained weights can
be imported from torchvision state_dict files when available
(`load_torch_resnet50_state_dict` / `load_torch_resnet152_state_dict` /
`load_torch_vgg19_state_dict`, file loader `load_state_dict_file`) — this
image has no network egress, so random init is the default; the importers'
numerics are pinned against torch eval-mode inference on seeded random
weights in tests/test_vision.py (<=1e-4 relative error).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fashionvisualexpl_tpu.models.base import glorot_uniform

RESNET50_BLOCKS = (3, 4, 6, 3)
RESNET152_BLOCKS = (3, 8, 36, 3)


def _conv(x, W, stride=1, pad=None):
    """pad=None -> symmetric torch-style padding (kernel//2), which matches
    XLA 'SAME' at stride 1 but NOT at stride 2 (SAME pads asymmetrically) —
    imported torchvision weights need the symmetric layout."""
    if pad is None:
        pad = W.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x, W, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(x, p, train=False, eps=1e-5):
    if train:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
    else:
        mean, var = p["mean"], p["var"]
    inv = jax.lax.rsqrt(var + eps)
    return (x - mean) * inv * p["scale"] + p["bias"]


def _bn_init(c):
    return {
        "scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
        "mean": jnp.zeros((c,)), "var": jnp.ones((c,)),
    }


class ResNet:
    """Bottleneck ResNet (50/152).  apply() returns pooled [B, 2048] features
    (the reference's `avg_pool` output layer) or logits with the fc head."""

    def __init__(self, blocks: Tuple[int, ...] = RESNET50_BLOCKS,
                 num_classes: int = 1000):
        self.blocks = blocks
        self.num_classes = num_classes
        self.stage_channels = (256, 512, 1024, 2048)

    def init(self, rng: jax.Array) -> Dict[str, Any]:
        keys = iter(jax.random.split(rng, 512))
        p: Dict[str, Any] = {
            "stem_W": glorot_uniform(next(keys), (7, 7, 3, 64)),
            "stem_bn": _bn_init(64),
        }
        in_c = 64
        for s, (n_blocks, out_c) in enumerate(
            zip(self.blocks, self.stage_channels)
        ):
            mid = out_c // 4
            for b in range(n_blocks):
                blk = {
                    "W1": glorot_uniform(next(keys), (1, 1, in_c, mid)),
                    "bn1": _bn_init(mid),
                    "W2": glorot_uniform(next(keys), (3, 3, mid, mid)),
                    "bn2": _bn_init(mid),
                    "W3": glorot_uniform(next(keys), (1, 1, mid, out_c)),
                    "bn3": _bn_init(out_c),
                }
                if b == 0:
                    blk["Wd"] = glorot_uniform(next(keys), (1, 1, in_c, out_c))
                    blk["bnd"] = _bn_init(out_c)
                p[f"s{s}b{b}"] = blk
                in_c = out_c
        p["fc_W"] = glorot_uniform(next(keys), (2048, self.num_classes))
        p["fc_b"] = jnp.zeros((self.num_classes,))
        return p

    def apply(self, params, x, train=False, with_head=False):
        y = self._trunk(params, x, train)
        pooled = jnp.mean(y, axis=(1, 2))  # [B, 2048] — 'avg_pool'
        if with_head:
            return pooled @ params["fc_W"] + params["fc_b"]
        return pooled

    def _trunk(self, params, x, train=False):
        """Shared conv trunk (torch-parity symmetric padding throughout)."""
        y = _conv(x, params["stem_W"], stride=2, pad=3)
        y = jax.nn.relu(_bn(y, params["stem_bn"], train))
        y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        y = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max,
            window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
            padding="VALID",
        )
        for s, n_blocks in enumerate(self.blocks):
            for b in range(n_blocks):
                blk = params[f"s{s}b{b}"]
                stride = 2 if (b == 0 and s > 0) else 1
                h = jax.nn.relu(_bn(_conv(y, blk["W1"]), blk["bn1"], train))
                h = jax.nn.relu(
                    _bn(_conv(h, blk["W2"], stride=stride), blk["bn2"], train)
                )
                h = _bn(_conv(h, blk["W3"]), blk["bn3"], train)
                if "Wd" in blk:
                    y = _bn(_conv(y, blk["Wd"], stride=stride), blk["bnd"], train)
                y = jax.nn.relu(y + h)
        return y

    def spatial_features(self, params, x, train=False):
        """Final-stage spatial map [B, H', W', 2048] (ACF's per-item maps)."""
        return self._trunk(params, x, train)


VGG19_CFG = (
    (64, 64), (128, 128), (256, 256, 256, 256),
    (512, 512, 512, 512), (512, 512, 512, 512),
)


class VGG19:
    """VGG19 with fc1/fc2 heads — the reference extracts 'fc2' (4096-d,
    train_rec.py:41-43)."""

    def __init__(self, num_classes: int = 1000, input_hw=(224, 224)):
        self.num_classes = num_classes
        h, w = input_hw
        for _ in range(5):
            h = -(-h // 2); w = -(-w // 2)
        self.feat_hw = (h, w)  # block5_pool spatial dims (7x7 at 224)
        self.flat_dim = h * w * 512

    def init(self, rng: jax.Array) -> Dict[str, Any]:
        keys = iter(jax.random.split(rng, 64))
        p: Dict[str, Any] = {}
        in_c = 3
        for s, stage in enumerate(VGG19_CFG):
            for b, c in enumerate(stage):
                p[f"c{s}_{b}_W"] = glorot_uniform(next(keys), (3, 3, in_c, c))
                p[f"c{s}_{b}_b"] = jnp.zeros((c,))
                in_c = c
        p["fc1_W"] = glorot_uniform(next(keys), (self.flat_dim, 4096))
        p["fc1_b"] = jnp.zeros((4096,))
        p["fc2_W"] = glorot_uniform(next(keys), (4096, 4096))
        p["fc2_b"] = jnp.zeros((4096,))
        p["fc3_W"] = glorot_uniform(next(keys), (4096, self.num_classes))
        p["fc3_b"] = jnp.zeros((self.num_classes,))
        return p

    def apply(self, params, x, output_layer="fc2"):
        y = x
        for s, stage in enumerate(VGG19_CFG):
            for b, _ in enumerate(stage):
                y = jax.nn.relu(
                    _conv(y, params[f"c{s}_{b}_W"]) + params[f"c{s}_{b}_b"]
                )
            y = jax.lax.reduce_window(
                y, -jnp.inf, jax.lax.max,
                window_dimensions=(1, 2, 2, 1),
                window_strides=(1, 2, 2, 1), padding="SAME",
            )
            if output_layer == f"block{s + 1}_pool":
                return y
        y = y.reshape(y.shape[0], -1)
        fc1 = jax.nn.relu(y @ params["fc1_W"] + params["fc1_b"])
        if output_layer == "fc1":
            return fc1
        fc2 = jax.nn.relu(fc1 @ params["fc2_W"] + params["fc2_b"])
        if output_layer == "fc2":
            return fc2
        return fc2 @ params["fc3_W"] + params["fc3_b"]  # 'predictions'


def load_torch_resnet_state_dict(
    model: ResNet, state_dict: Dict[str, np.ndarray]
) -> Dict[str, Any]:
    """Convert a torchvision resnet50/101/152 state_dict (OIHW) into this
    module's params (HWIO) — the block layout comes from `model.blocks`, so
    one converter covers every bottleneck depth.  Works on any dict with
    torchvision's key layout (reference CnnFeatureExtractor.py:12-19 wraps
    the Keras pretrained equivalents) — usable offline once weights are
    shipped to the machine.  Numerical parity vs torch eval-mode inference
    is pinned to <=1e-4 relative error in tests/test_vision.py."""

    def w(name):  # OIHW -> HWIO
        return jnp.asarray(np.transpose(state_dict[name], (2, 3, 1, 0)))

    def bn(prefix):
        return {
            "scale": jnp.asarray(state_dict[f"{prefix}.weight"]),
            "bias": jnp.asarray(state_dict[f"{prefix}.bias"]),
            "mean": jnp.asarray(state_dict[f"{prefix}.running_mean"]),
            "var": jnp.asarray(state_dict[f"{prefix}.running_var"]),
        }

    p: Dict[str, Any] = {
        "stem_W": w("conv1.weight"),
        "stem_bn": bn("bn1"),
        "fc_W": jnp.asarray(np.transpose(state_dict["fc.weight"])),
        "fc_b": jnp.asarray(state_dict["fc.bias"]),
    }
    for s, n_blocks in enumerate(model.blocks):
        for b in range(n_blocks):
            t = f"layer{s + 1}.{b}"
            blk = {
                "W1": w(f"{t}.conv1.weight"), "bn1": bn(f"{t}.bn1"),
                "W2": w(f"{t}.conv2.weight"), "bn2": bn(f"{t}.bn2"),
                "W3": w(f"{t}.conv3.weight"), "bn3": bn(f"{t}.bn3"),
            }
            if f"{t}.downsample.0.weight" in state_dict:
                blk["Wd"] = w(f"{t}.downsample.0.weight")
                blk["bnd"] = bn(f"{t}.downsample.1")
            p[f"s{s}b{b}"] = blk
    return p


def _check_resnet_depth(model: ResNet, state_dict, blocks, name: str):
    if model.blocks != blocks:
        raise ValueError(
            f"{name} importer called on a ResNet with blocks={model.blocks}; "
            f"expected {blocks}"
        )
    # layer3 is the depth-discriminating stage (6 vs 36 blocks)
    last = f"layer3.{blocks[2] - 1}.conv3.weight"
    if last not in state_dict or f"layer3.{blocks[2]}.conv3.weight" in state_dict:
        raise KeyError(
            f"state dict is not a torchvision {name} (block-count mismatch "
            f"at {last})"
        )


def load_torch_resnet50_state_dict(
    model: ResNet, state_dict: Dict[str, np.ndarray]
) -> Dict[str, Any]:
    """torchvision resnet50 -> JAX params (see load_torch_resnet_state_dict)."""
    _check_resnet_depth(model, state_dict, RESNET50_BLOCKS, "resnet50")
    return load_torch_resnet_state_dict(model, state_dict)


def load_torch_resnet152_state_dict(
    model: ResNet, state_dict: Dict[str, np.ndarray]
) -> Dict[str, Any]:
    """torchvision resnet152 -> JAX params (see load_torch_resnet_state_dict)."""
    _check_resnet_depth(model, state_dict, RESNET152_BLOCKS, "resnet152")
    return load_torch_resnet_state_dict(model, state_dict)


# torchvision vgg19 conv layer indices inside the `features` Sequential
# (ReLU/MaxPool occupy the gaps): 16 convs across the 5 stages of VGG19_CFG
_VGG19_TORCH_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34)


def load_torch_vgg19_state_dict(
    model: VGG19, state_dict: Dict[str, np.ndarray]
) -> Dict[str, Any]:
    """Convert a torchvision vgg19 state_dict into this module's params.

    Convs transpose OIHW -> HWIO; the first classifier Linear additionally
    permutes its input axis from torch's CHW flatten order to this module's
    HWC flatten (block5_pool is [B, h, w, 512] here, [B, 512, h, w] there).
    The reference extracts 'fc2' from Keras VGG19 (CnnFeatureExtractor.py:
    12-35, train_rec.py:41); torchvision's classifier.{0,3,6} play
    fc1/fc2/predictions.  Requires `model.flat_dim` to match the state
    dict's classifier input (25088 <=> 224x224 inputs)."""

    def w(name):  # OIHW -> HWIO
        return jnp.asarray(np.transpose(state_dict[name], (2, 3, 1, 0)))

    p: Dict[str, Any] = {}
    k = 0
    for s, stage in enumerate(VGG19_CFG):
        for b, _ in enumerate(stage):
            idx = _VGG19_TORCH_CONV_IDX[k]
            p[f"c{s}_{b}_W"] = w(f"features.{idx}.weight")
            p[f"c{s}_{b}_b"] = jnp.asarray(state_dict[f"features.{idx}.bias"])
            k += 1

    fc1 = np.asarray(state_dict["classifier.0.weight"])  # [4096, 512*h*w]
    if fc1.shape[1] != model.flat_dim:
        raise ValueError(
            f"classifier.0 expects flat dim {fc1.shape[1]}, model has "
            f"{model.flat_dim} (construct VGG19(input_hw=...) to match; "
            f"torchvision's 25088 corresponds to 224x224 inputs)"
        )
    h, wdim = model.feat_hw
    # CHW -> HWC flatten permutation, then [in, out] orientation
    fc1 = (
        fc1.reshape(4096, 512, h, wdim)
        .transpose(0, 2, 3, 1)
        .reshape(4096, model.flat_dim)
        .T
    )
    p["fc1_W"] = jnp.asarray(np.ascontiguousarray(fc1))
    p["fc1_b"] = jnp.asarray(state_dict["classifier.0.bias"])
    p["fc2_W"] = jnp.asarray(np.transpose(state_dict["classifier.3.weight"]))
    p["fc2_b"] = jnp.asarray(state_dict["classifier.3.bias"])
    p["fc3_W"] = jnp.asarray(np.transpose(state_dict["classifier.6.weight"]))
    p["fc3_b"] = jnp.asarray(state_dict["classifier.6.bias"])
    return p


def load_state_dict_file(path: str) -> Dict[str, np.ndarray]:
    """Load a state dict shipped as .npz (numpy, no torch needed) or
    .pt/.pth (torch.load, guarded import) into a name->ndarray dict."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            f"loading {path} needs torch; re-ship the weights as .npz "
            "(np.savez(path, **{k: v.numpy() for k, v in sd.items()}))"
        ) from e
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}
