"""VGG-16 converter-layout and preprocessing golden tests (torchvision is
absent on this box, so the converter path was previously unexecutable /
unverified — VERDICT r1 weak #5, ADVICE r1 medium).

The independent reference is torch itself (CPU): a fake torchvision-style
state_dict (OIHW convs, NCHW-flattened fc6) is run through torch
conv2d/maxpool/linear semantics and through our convert -> NHWC JAX forward;
the two must agree, which pins the OIHW->HWIO transposition and the
(512,7,7)->NHWC fc6 reorder at models/vgg16.py (replacing
reference: data/prepro_img.lua's loadcaffe forward).
"""

import numpy as np
import pytest

from visdial_tpu.models import vgg16


def _fake_torch_state_dict(rng, fc_dim=8):
    """torchvision-naming state_dict with He-scaled random numpy weights
    (full conv stack, shrunken fc width — the converter reorder logic is
    dimension-generic in fc_out)."""
    sd = {}
    conv_ids = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    in_ch = 3
    cfg = [c for c in vgg16._CFG if c != "M"]
    for (name, out_ch), idx in zip(cfg, conv_ids):
        std = np.sqrt(2.0 / (9 * in_ch))
        sd[f"features.{idx}.weight"] = (
            rng.standard_normal((out_ch, in_ch, 3, 3)) * std
        ).astype(np.float32)
        sd[f"features.{idx}.bias"] = (
            rng.standard_normal(out_ch) * 0.01).astype(np.float32)
        in_ch = out_ch
    dims = [(25088, fc_dim), (fc_dim, fc_dim)]
    for idx, (d_in, d_out) in zip((0, 3), dims):
        sd[f"classifier.{idx}.weight"] = (
            rng.standard_normal((d_out, d_in)) * np.sqrt(2.0 / d_in)
        ).astype(np.float32)
        sd[f"classifier.{idx}.bias"] = (
            rng.standard_normal(d_out) * 0.01).astype(np.float32)
    return sd


def _torch_forward(sd, images_nchw):
    """The torch-semantics reference forward (NCHW, OIHW, torch flatten)."""
    import torch
    import torch.nn.functional as F

    x = torch.from_numpy(images_nchw)
    conv_ids = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    pools_after = {2, 7, 14, 21, 28}  # last conv idx of each block
    for idx in conv_ids:
        w = torch.from_numpy(sd[f"features.{idx}.weight"])
        b = torch.from_numpy(sd[f"features.{idx}.bias"])
        x = F.relu(F.conv2d(x, w, b, padding=1))
        if idx in pools_after:
            x = F.max_pool2d(x, 2, 2)
    pool5_nchw = x
    flat = x.flatten(1)  # NCHW flatten — the layout the converter must undo
    fc6 = F.relu(F.linear(flat, torch.from_numpy(sd["classifier.0.weight"]),
                          torch.from_numpy(sd["classifier.0.bias"])))
    fc7 = F.relu(F.linear(fc6, torch.from_numpy(sd["classifier.3.weight"]),
                          torch.from_numpy(sd["classifier.3.bias"])))
    return pool5_nchw.numpy(), fc7.numpy()


def test_converted_weights_match_torch_semantics(tmp_path):
    rng = np.random.default_rng(0)
    sd = _fake_torch_state_dict(rng)
    path = str(tmp_path / "vgg16.npz")
    vgg16.convert_torch_state_dict(sd, path)
    assert vgg16.weight_origin(path) == "torchvision"

    imgs = rng.integers(0, 256, size=(2, 224, 224, 3)).astype(np.uint8)
    x = vgg16.preprocess(imgs, origin="torchvision")

    params = vgg16.load_params(path)
    got = vgg16.apply(params, x)
    want_pool5_nchw, want_fc7 = _torch_forward(
        sd, np.ascontiguousarray(x.transpose(0, 3, 1, 2)))

    np.testing.assert_allclose(
        np.asarray(got["pool5"]).transpose(0, 3, 1, 2), want_pool5_nchw,
        rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["fc7"]), want_fc7,
                               rtol=1e-3, atol=1e-4)
    # features must be alive (not denormal noise) for the tolerance to mean
    # anything
    assert np.abs(want_fc7).max() > 1e-2


def test_preprocess_modes():
    imgs = np.zeros((1, 2, 2, 3), np.uint8)
    imgs[..., 0] = 255  # pure red

    caffe = vgg16.preprocess(imgs, origin="caffe")
    # BGR order: red lands in channel 2; means subtracted on 0-255 scale
    np.testing.assert_allclose(caffe[0, 0, 0],
                               [0 - 103.939, 0 - 116.779, 255 - 123.68],
                               rtol=1e-6)

    tv = vgg16.preprocess(imgs, origin="torchvision")
    # RGB order preserved; /255 then ImageNet mean/std
    np.testing.assert_allclose(
        tv[0, 0, 0],
        [(1.0 - 0.485) / 0.229, (0 - 0.456) / 0.224, (0 - 0.406) / 0.225],
        rtol=1e-5)

    with pytest.raises(ValueError):
        vgg16.preprocess(imgs, origin="vgg-face")


@pytest.mark.slow
def test_untagged_weight_npz_defaults_to_caffe(tmp_path):
    import jax

    params = vgg16.init_params(jax.random.PRNGKey(0))
    flat = {f"{k}/{kk}": np.asarray(v)
            for k, d in params.items() for kk, v in d.items()}
    path = str(tmp_path / "legacy.npz")
    np.savez(path, **flat)
    assert vgg16.weight_origin(path) == "caffe"
