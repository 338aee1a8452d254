"""Offline image-feature extraction — the `data/prepro_img.lua` equivalent.

Runs the pure-JAX VGG-16 (models/vgg16.py) on TPU over COCO images, batched,
and writes fc7 (and optionally pool5) features keyed by the dialog order of
a prepro'd split (reference: data/prepro_img.lua — loadcaffe VGG-16, 224x224
center crop, BGR mean subtract, fc7 -> data_img.h5).

Image sources, in precedence order:
  * --image_root DIR: JPEG/PNG files named by COCO convention; each dialog's
    image_id is matched by substring `<12-digit id>` (PIL decode, resize so
    the short side is 256, center-crop 224 — the reference pipeline).
  * --images_npz FILE: a prebaked (N, 224, 224, 3) RGB uint8 array named
    'images' in dialog order (for environments without the raw images).

Weights: --weights vgg16.npz per models/vgg16.py's layout ('<layer>/w|b');
convert a torchvision checkpoint with
`python -c "import torch; from visdial_tpu.models.vgg16 import
convert_torch_state_dict as c; c(torch.load('vgg16.pth'), 'vgg16.npz')"`.

Usage:
    python -m visdial_tpu.data.prepro_img --split_npz data/visdial_data_val.npz \
        --weights vgg16.npz --image_root coco/val2014 --out data/feats_val.npz
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..models import vgg16
from ..utils.platform import apply_platform_env


def load_and_crop(path: str) -> np.ndarray:
    """Decode, resize short side to 256, center-crop 224 (RGB uint8)."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    w, h = img.size
    scale = 256.0 / min(w, h)
    img = img.resize((round(w * scale), round(h * scale)), Image.BILINEAR)
    w, h = img.size
    left, top = (w - 224) // 2, (h - 224) // 2
    return np.asarray(img.crop((left, top, left + 224, top + 224)), np.uint8)


def find_image(root: str, image_id: int, index: dict) -> str:
    key = f"{int(image_id):012d}"
    if key not in index:
        raise FileNotFoundError(f"no image file matching *{key}* under {root}")
    return index[key]


def build_file_index(root: str) -> dict:
    index = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            stem = os.path.splitext(f)[0]
            digits = "".join(ch for ch in stem if ch.isdigit())[-12:]
            if digits:
                index[digits.zfill(12)] = os.path.join(dirpath, f)
    return index


def main(argv=None) -> None:
    apply_platform_env()
    import jax

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--split_npz", required=True,
                   help="prepro'd split whose img_ids define the order")
    p.add_argument("--weights", required=True, help="vgg16 .npz weights")
    p.add_argument("--image_root", type=str, default="")
    p.add_argument("--images_npz", type=str, default="")
    p.add_argument("--out", required=True)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--save_pool5", action="store_true")
    p.add_argument("--preprocess", choices=("auto",) + vgg16.WEIGHT_ORIGINS,
                   default="auto",
                   help="input normalization; 'auto' follows the origin tag "
                        "recorded in the weight artifact (torchvision "
                        "weights need RGB/255+ImageNet-stats, Caffe weights "
                        "the reference's BGR mean subtraction)")
    args = p.parse_args(argv)

    with np.load(args.split_npz) as z:
        img_ids = np.asarray(z["img_ids"])
    N = len(img_ids)

    origin = (vgg16.weight_origin(args.weights) if args.preprocess == "auto"
              else args.preprocess)
    print(f"preprocessing mode: {origin}", flush=True)
    params = vgg16.load_params(args.weights)
    fwd = jax.jit(lambda imgs: vgg16.apply(params, imgs))

    if args.images_npz:
        with np.load(args.images_npz) as z:
            all_images = np.asarray(z["images"], np.uint8)
        assert all_images.shape == (N, 224, 224, 3), all_images.shape
        get = lambda i: all_images[i]
    else:
        assert args.image_root, "need --image_root or --images_npz"
        index = build_file_index(args.image_root)
        get = lambda i: load_and_crop(find_image(args.image_root,
                                                 img_ids[i], index))

    bs = args.batch_size
    fc7_out = np.zeros((N, 4096), np.float32)
    pool5_out = np.zeros((N, 7, 7, 512), np.float32) if args.save_pool5 else None
    for s in range(0, N, bs):
        idx = range(s, min(s + bs, N))
        raw = np.stack([get(i) for i in idx])
        batch = vgg16.preprocess(raw, origin=origin)
        if len(idx) < bs:  # static shapes: pad the tail batch
            batch = np.pad(batch, ((0, bs - len(idx)), (0, 0), (0, 0), (0, 0)))
        feats = fwd(batch)
        fc7_out[idx] = np.asarray(feats["fc7"])[: len(idx)]
        if pool5_out is not None:
            pool5_out[idx] = np.asarray(feats["pool5"])[: len(idx)]
        if (s // bs) % 20 == 0:
            print(f"{s + len(idx)}/{N}", flush=True)

    split = os.path.basename(args.split_npz)
    split = "val" if "val" in split else "train"
    out = {f"images_{split}": fc7_out}
    if pool5_out is not None:
        out[f"pool5_{split}"] = pool5_out
    np.savez(args.out, **out)
    print(f"wrote {args.out}: fc7 {fc7_out.shape}"
          + (f", pool5 {pool5_out.shape}" if pool5_out is not None else ""))


if __name__ == "__main__":
    main()
