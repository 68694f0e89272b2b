"""Feature extractors.

- CnnFeatureExtractor: TPU-batched CNN classification / feature extraction
  (reference src/vision/CnnFeatureExtractor.py:6-35, which runs image-by-
  image through Keras; here whole batches run through one jitted backbone).
- LowFeatureExtractor: edge maps + dominant colors (reference
  src/vision/LowFeatureExtractor.py:37-80) — host-side OpenCV/sklearn, an
  offline path by design (SURVEY.md §2, L2 runs offline).
- color_histogram: masked 8x8x8 RGB histogram (reference
  src/extract_features.py:10-39).
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fashionvisualexpl_tpu.vision.backbones import (
    RESNET152_BLOCKS,
    RESNET50_BLOCKS,
    ResNet,
    VGG19,
)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess(images_uint8: np.ndarray) -> np.ndarray:
    """[B, H, W, 3] uint8 -> normalized float32 (torchvision convention)."""
    x = images_uint8.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


class CnnFeatureExtractor:
    """Batched classify / extract over a jitted JAX backbone.

    model_name in {ResNet50, ResNet152, VGG19} (the reference's registry,
    CnnFeatureExtractor.py:12-19).  `params` defaults to random init; pass
    imported pretrained params for semantic features."""

    def __init__(
        self,
        output_layer: str = "avg_pool",
        model_name: str = "ResNet50",
        imagenet: Optional[Dict[int, str]] = None,
        params=None,
        rng: Optional[jax.Array] = None,
        torch_weights: Optional[str] = None,
    ):
        self.model_name = model_name
        self.output_layer = output_layer
        self.imagenet = imagenet or {}
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if model_name == "ResNet50":
            self.net = ResNet(RESNET50_BLOCKS)
        elif model_name == "ResNet152":
            self.net = ResNet(RESNET152_BLOCKS)
        elif model_name == "VGG19":
            self.net = VGG19()
        else:
            raise NotImplementedError(
                "This feature extractor has not been added yet!"
            )
        if torch_weights is not None:
            # pretrained torchvision state dict (.npz or .pt/.pth) — the
            # semantic-feature path (reference uses Keras imagenet weights,
            # CnnFeatureExtractor.py:12-19)
            from fashionvisualexpl_tpu.vision.backbones import (
                load_state_dict_file,
                load_torch_resnet152_state_dict,
                load_torch_resnet50_state_dict,
                load_torch_vgg19_state_dict,
            )

            sd = load_state_dict_file(torch_weights)
            loader = {
                "ResNet50": load_torch_resnet50_state_dict,
                "ResNet152": load_torch_resnet152_state_dict,
                "VGG19": load_torch_vgg19_state_dict,
            }[model_name]
            params = loader(self.net, sd)
        self.params = params if params is not None else self.net.init(rng)

        if isinstance(self.net, ResNet):
            self._logits = jax.jit(
                lambda p, x: self.net.apply(p, x, with_head=True)
            )
            if output_layer in ("avg_pool", "pool"):
                self._features = jax.jit(lambda p, x: self.net.apply(p, x))
            else:  # spatial map output
                self._features = jax.jit(
                    lambda p, x: self.net.spatial_features(p, x)
                )
        else:
            self._logits = jax.jit(
                lambda p, x: self.net.apply(p, x, output_layer="predictions")
            )
            self._features = jax.jit(
                lambda p, x: self.net.apply(p, x, output_layer=output_layer)
            )

    @staticmethod
    def _as_input(images: np.ndarray) -> np.ndarray:
        """uint8 images normalize on entry; float input is taken as already
        preprocessed (the offline driver preprocesses in batches)."""
        return preprocess(images) if images.dtype == np.uint8 else images

    def classify(self, images: np.ndarray, filenames: Iterable[str]):
        """Imagenet classification records (CnnFeatureExtractor.py:21-28)."""
        images = self._as_input(np.asarray(images))
        logits = np.asarray(self._logits(self.params, jnp.asarray(images)))
        out = []
        for row, fname in zip(logits, filenames):
            cls = int(np.argmax(row))
            out.append(
                {
                    "ImageID": os.path.splitext(fname)[0],
                    "ClassStr": self.imagenet.get(cls, str(cls)),
                    "ClassNum": cls,
                    "Prob": float(jax.nn.softmax(jnp.asarray(row))[cls]),
                }
            )
        return out

    def extract_feature(self, images: np.ndarray) -> np.ndarray:
        images = self._as_input(np.asarray(images))
        return np.asarray(self._features(self.params, jnp.asarray(images)))


class LowFeatureExtractor:
    """Edge map + dominant colors (LowFeatureExtractor.py:41-80 semantics)."""

    def __init__(self, num_colors: int):
        self.num_colors = num_colors

    def edge_map(self, image_bgr: np.ndarray):
        """Canny + 8-neighbor Laplacian, inverted (:44-50); also returns the
        raw (non-inverted) edge response used for the contour mask."""
        import cv2

        gray = cv2.cvtColor(image_bgr, cv2.COLOR_BGR2GRAY)
        ie1 = cv2.Canny(gray, 255 / 3, 255)
        f = np.array([[-1, -1, -1], [-1, 8, -1], [-1, -1, -1]])
        ie2 = cv2.filter2D(gray, -1, f)
        ie = ie1 + ie2
        return np.clip(255 - ie, 0, 255), ie

    def foreground_mask(self, image_bgr: np.ndarray, edges: np.ndarray):
        """Largest-contour fill mask — zeros mark foreground (:51-61)."""
        import cv2

        contours, _ = cv2.findContours(
            edges, cv2.RETR_TREE, cv2.CHAIN_APPROX_SIMPLE
        )
        if not contours:
            # blank/uniform image: treat the whole frame as foreground
            # (the reference crashes here — sorted([])[0])
            return np.zeros_like(image_bgr)
        info = [(c, cv2.isContourConvex(c), cv2.contourArea(c)) for c in contours]
        max_contour = sorted(info, key=lambda t: t[2], reverse=True)[0]
        mask = np.copy(image_bgr)
        cv2.fillPoly(mask, pts=[max_contour[0]], color=(0, 0, 0))
        return mask

    def extract_color_edges(self, sample):
        """(inverted edge map, flattened dominant colors) — matching
        LowFeatureExtractor.extract_color_edges (:41-80)."""
        import cv2
        from sklearn.cluster import KMeans

        image, _filename = sample
        ie_end, ie = self.edge_map(image)
        mask = self.foreground_mask(image, ie)

        rgb = cv2.cvtColor(image, cv2.COLOR_BGR2RGB) / np.float32(255)
        fg = rgb[(mask == 0).all(axis=2)]
        clt = KMeans(n_clusters=self.num_colors, random_state=1234, n_init=10)
        clt.fit(fg)
        dominant = (clt.cluster_centers_ * 255).astype("uint8")
        return ie_end, dominant.flatten()


def color_histogram(image_bgr: np.ndarray) -> np.ndarray:
    """Foreground-masked 8x8x8 RGB histogram, 512-d int32
    (extract_features.py:10-39)."""
    import cv2

    lf = LowFeatureExtractor(num_colors=1)
    _, ie = lf.edge_map(image_bgr)
    mask = lf.foreground_mask(image_bgr, ie)
    rgb = cv2.cvtColor(image_bgr, cv2.COLOR_BGR2RGB)
    temp = (mask == 0).all(axis=2).astype(np.uint8)
    hist = cv2.calcHist(
        [rgb], [0, 1, 2], temp, [8, 8, 8], [0, 255, 0, 255, 0, 255]
    )
    return np.asarray(hist, dtype=np.int32).flatten()


def extract_texture_grams(
    spatial_maps,  # list of [B, H_l, W_l, C_l] conv feature maps
    resize_gram=(32, 32),
):
    """Gram-matrix texture features (reference src/vision/
    OLD_CnnFeatureExtractor.py:40-61 — the only texture implementation in
    the reference, feeding its CompVBPR texture family): for each layer's
    map, G = F F^T / numel over channel vectors, resized to a fixed grid and
    flattened; layers concatenate to [B, n_layers * prod(resize_gram)].

    The gram products run on the MXU (one batched matmul per layer); the
    resize is a host-side cv2 bicubic like the reference's."""
    import cv2
    import numpy as np

    out = []
    for fmap in spatial_maps:
        fmap = np.asarray(fmap)
        B, H, W, C = fmap.shape
        f = jnp.asarray(fmap).reshape(B, H * W, C)
        gram = jnp.einsum("bsc,bsd->bcd", f, f) / float(H * W * C)
        gram = np.asarray(gram)
        resized = np.stack([
            cv2.resize(g, dsize=resize_gram, interpolation=cv2.INTER_CUBIC)
            for g in gram
        ])
        out.append(resized.reshape(B, -1))
    return np.concatenate(out, axis=1)
