"""VGG-16 forward in pure JAX — the image-feature extractor.

Replaces the reference's loadcaffe + Torch GPU forward (reference:
data/prepro_img.lua — VGG-16, 224x224 center crop, fc7 4096-d features into
data_img.h5).  Here the network is a pytree of arrays run under jit on TPU;
weights come from a user-converted ``.npz`` (no pretrained download in this
environment — ``convert`` documents the expected keys and can ingest a
torchvision state_dict saved with torch.save).

Feature taps (BASELINE.json asks for fc7 and conv5):
  * ``fc7``   — (N, 4096) ReLU'd fc7 activations (the reference's output)
  * ``pool5`` — (N, 7, 7, 512) conv5_3 after pooling, for spatial attention

Layout: NHWC (TPU-native; XLA maps convs onto the MXU best in NHWC).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# (name, out_channels) per conv layer; 'M' = 2x2/2 max-pool.
_CFG = [
    ("conv1_1", 64), ("conv1_2", 64), "M",
    ("conv2_1", 128), ("conv2_2", 128), "M",
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), "M",
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), "M",
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512), "M",
]
CONV_NAMES = [c[0] for c in _CFG if c != "M"]
FC_NAMES = ["fc6", "fc7"]

# Caffe-era BGR channel means used by the reference's prepro
# (reference: data/prepro_img.lua mean subtraction).
BGR_MEANS = (103.939, 116.779, 123.68)

# torchvision-era normalization: RGB scaled to [0,1], ImageNet mean/std.
# VGG-16 weights only produce in-distribution features when paired with the
# preprocessing they were trained under, so the weight artifact records its
# origin and `preprocess` is keyed by it.
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
WEIGHT_ORIGINS = ("caffe", "torchvision")


def init_params(rng, dtype=jnp.float32) -> dict:
    """Random VGG-16 weights (testing / shape-checking only)."""
    params = {}
    in_ch = 3
    for item in _CFG:
        if item == "M":
            continue
        name, out_ch = item
        rng, k = jax.random.split(rng)
        params[name] = {
            "w": jax.random.normal(k, (3, 3, in_ch, out_ch), dtype) * 0.01,
            "b": jnp.zeros((out_ch,), dtype),
        }
        in_ch = out_ch
    dims = [(7 * 7 * 512, 4096), (4096, 4096)]
    for name, (d_in, d_out) in zip(FC_NAMES, dims):
        rng, k = jax.random.split(rng)
        params[name] = {
            "w": jax.random.normal(k, (d_in, d_out), dtype) * 0.01,
            "b": jnp.zeros((d_out,), dtype),
        }
    return params


def load_params(path: str, dtype=jnp.float32) -> dict:
    """Load weights from an .npz with keys '<layer>/w' and '<layer>/b'.

    Conv w layout (3, 3, in, out) [HWIO]; fc6 w is (7*7*512, 4096) in
    NHWC-flattened order.  Use `convert_torch_state_dict` for torchvision
    checkpoints.
    """
    with np.load(path) as z:
        return {
            name: {"w": jnp.asarray(z[f"{name}/w"], dtype),
                   "b": jnp.asarray(z[f"{name}/b"], dtype)}
            for name in CONV_NAMES + FC_NAMES
        }


def convert_torch_state_dict(state_dict, out_path: str,
                             origin: str = "torchvision") -> None:
    """torch vgg16 state_dict -> our .npz key/layout convention.

    Handles OIHW->HWIO conv transposition and the NCHW->NHWC reordering of
    the fc6 input dimension.  The artifact records `origin` so `preprocess`
    applies the normalization the weights were trained under (torchvision:
    RGB/255 + ImageNet mean/std; caffe: BGR 0-255 mean subtraction) — pairing
    torchvision weights with Caffe preprocessing yields silently
    out-of-distribution features.
    """
    assert origin in WEIGHT_ORIGINS, origin
    conv_ids = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    out = {"origin": np.asarray(origin)}
    for name, idx in zip(CONV_NAMES, conv_ids):
        w = np.asarray(state_dict[f"features.{idx}.weight"])   # (O, I, H, W)
        out[f"{name}/w"] = w.transpose(2, 3, 1, 0)              # HWIO
        out[f"{name}/b"] = np.asarray(state_dict[f"features.{idx}.bias"])
    for name, idx in zip(FC_NAMES, (0, 3)):
        w = np.asarray(state_dict[f"classifier.{idx}.weight"])  # (out, in)
        if name == "fc6":  # torch flattens NCHW (512,7,7); we flatten NHWC
            w = w.reshape(-1, 512, 7, 7).transpose(0, 2, 3, 1).reshape(w.shape[0], -1)
        out[f"{name}/w"] = w.T
        out[f"{name}/b"] = np.asarray(state_dict[f"classifier.{idx}.bias"])
    np.savez(out_path, **out)


def weight_origin(path: str) -> str:
    """Read the preprocessing origin recorded in a weight .npz.

    Artifacts written before the origin tag existed (or converted from
    Caffe VGG-16, the reference's source) default to 'caffe'.
    """
    with np.load(path) as z:
        if "origin" in z.files:
            return str(z["origin"])
    return "caffe"


def preprocess(images_rgb_uint8: np.ndarray, origin: str = "caffe") -> np.ndarray:
    """(N, 224, 224, 3) RGB uint8 -> floats normalized for `origin` weights.

    caffe (the reference pipeline — prepro_img.lua): RGB -> BGR, 0-255
    scale, per-channel mean subtraction.  torchvision: stays RGB, /255,
    ImageNet mean/std.  Match `origin` to the weight artifact
    (see `weight_origin`).
    """
    if origin == "caffe":
        x = np.asarray(images_rgb_uint8, np.float32)[..., ::-1]  # RGB -> BGR
        return x - np.asarray(BGR_MEANS, np.float32)
    if origin == "torchvision":
        x = np.asarray(images_rgb_uint8, np.float32) / 255.0
        return ((x - np.asarray(IMAGENET_MEAN, np.float32))
                / np.asarray(IMAGENET_STD, np.float32))
    raise ValueError(f"unknown weight origin {origin!r}; "
                     f"choose from {WEIGHT_ORIGINS}")


def _conv(x, p):
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return jax.nn.relu(y + p["b"]).astype(x.dtype)


def _pool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def apply(params: dict, images: jnp.ndarray) -> dict:
    """images (N, 224, 224, 3) preprocessed floats -> {'fc7', 'pool5'}."""
    x = images
    for item in _CFG:
        x = _pool(x) if item == "M" else _conv(x, params[item[0]])
    pool5 = x                                            # (N, 7, 7, 512)
    flat = pool5.reshape(pool5.shape[0], -1)
    fc6 = jax.nn.relu(
        jnp.dot(flat, params["fc6"]["w"],
                preferred_element_type=jnp.float32) + params["fc6"]["b"])
    fc7 = jax.nn.relu(
        jnp.dot(fc6.astype(flat.dtype), params["fc7"]["w"],
                preferred_element_type=jnp.float32) + params["fc7"]["b"])
    return {"fc7": fc7, "pool5": pool5}
