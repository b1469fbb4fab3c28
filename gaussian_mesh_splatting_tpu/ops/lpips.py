"""LPIPS v0.1 (Learned Perceptual Image Patch Similarity) in pure JAX.

Re-implements the reference's vendored lpipsPyTorch semantics
(lpipsPyTorch/modules/lpips.py:8-36, networks.py:12-96, utils.py:6-8)
without torch/torchvision and without any network egress:

  score(x, y) = sum over target layers L of
                  mean_{h,w}( lin_L( (nx_L - ny_L)^2 ) )
  where n*_L are channel-unit-normalized feature maps
  (f / (||f||_c + 1e-10)) of a VGG16 feature stack applied to the
  z-scored input ((img - shift) / scale with the LPIPS v0.1 constants),
  and lin_L is a learned non-negative 1x1 conv with no bias.

Target layers are the ReLU outputs of VGG16 convs #2, #4, #7, #10, #13
(torchvision `vgg16().features` module indices 3, 8, 15, 22, 29 — the
reference's 1-based `target_layers = [4, 9, 16, 23, 30]`).

Weights
-------
This machine has zero egress, so pretrained weights cannot be downloaded
here. The scorer loads a single `.npz` from `$GMS_LPIPS_WEIGHTS` or
`~/.cache/gms_tpu/lpips_vgg.npz`, with arrays:

    conv{i}_w  (3, 3, C_in, C_out) float32   i = 0..12  (HWIO)
    conv{i}_b  (C_out,)            float32
    lin{j}_w   (C_j,)              float32   j = 0..4   (1x1 head, no bias)

`convert_torch_checkpoint` (below) produces this file on any machine with
torchvision + the richzhang linear-head checkpoint; correctness of the
math itself is pinned by tests against an independent numpy re-derivation
on synthetic weights (tests/test_lpips.py), so it does not depend on the
pretrained weights being present.
"""
from __future__ import annotations

import os
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# LPIPS v0.1 input scaling constants (networks.py:40-44); applied to images
# in the caller-supplied range exactly as the reference applies them.
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# VGG16 feature-stack plan: ('C', out_channels) or 'M' (2x2/2 maxpool).
# A trailing '*' on a conv marks a target layer (feature tap after ReLU).
VGG16_PLAN: tuple = (
    ("C", 64), ("C*", 64), "M",
    ("C", 128), ("C*", 128), "M",
    ("C", 256), ("C", 256), ("C*", 256), "M",
    ("C", 512), ("C", 512), ("C*", 512), "M",
    ("C", 512), ("C", 512), ("C*", 512),
)


class LPIPSParams(NamedTuple):
    conv_w: tuple  # HWIO kernels, one per conv in plan order
    conv_b: tuple
    lin_w: tuple  # (C,) per target layer
    plan: tuple = VGG16_PLAN


def _features(x: jax.Array, params: LPIPSParams) -> list[jax.Array]:
    """Feature taps of the conv stack. x: (N, H, W, 3) z-scored."""
    taps = []
    ci = 0
    for item in params.plan:
        if item == "M":
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            continue
        kind, _ = item
        x = jax.lax.conv_general_dilated(
            x, params.conv_w[ci],
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params.conv_b[ci]
        x = jax.nn.relu(x)
        ci += 1
        if kind == "C*":
            norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
            taps.append(x / (norm + 1e-10))  # utils.py:6-8
    return taps


def lpips(x: jax.Array, y: jax.Array, params: LPIPSParams) -> jax.Array:
    """LPIPS distance. x, y: (H, W, 3) or (N, H, W, 3) images in the same
    range the reference feeds (its metrics.py passes [0, 1] tensors)."""
    if x.ndim == 3:
        x, y = x[None], y[None]
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)
    fx = _features((x - shift) / scale, params)
    fy = _features((y - shift) / scale, params)
    score = jnp.zeros((x.shape[0],), x.dtype)
    for tx, ty, w in zip(fx, fy, params.lin_w):
        d = (tx - ty) ** 2
        score = score + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
    return score[0] if score.shape == (1,) else score


def make_lpips_fn(params: LPIPSParams):
    """Jitted scorer with the params (incl. the non-traceable `plan`
    strings) closed over as compile-time constants — `jax.jit(lpips)`
    directly would fail to abstract the plan tuple."""
    return jax.jit(lambda x, y: lpips(x, y, params))


def default_weights_path() -> str:
    return os.environ.get(
        "GMS_LPIPS_WEIGHTS",
        os.path.expanduser("~/.cache/gms_tpu/lpips_vgg.npz"),
    )


def load_params(path: str | None = None) -> LPIPSParams | None:
    """Load LPIPS weights from the documented .npz; None when absent."""
    path = path or default_weights_path()
    if not os.path.exists(path):
        return None
    z = np.load(path)
    n_conv = sum(1 for it in VGG16_PLAN if it != "M")
    conv_w = tuple(jnp.asarray(z[f"conv{i}_w"]) for i in range(n_conv))
    conv_b = tuple(jnp.asarray(z[f"conv{i}_b"]) for i in range(n_conv))
    lin_w = tuple(jnp.asarray(z[f"lin{j}_w"]) for j in range(5))
    return LPIPSParams(conv_w, conv_b, lin_w)


def synthetic_params(key, plan: tuple = VGG16_PLAN) -> LPIPSParams:
    """Random-weight params (for tests / calibration; LPIPS math does not
    depend on the weight values being pretrained)."""
    conv_w, conv_b, lin_w = [], [], []
    c_in = 3
    n_lin = 0
    for item in plan:
        if item == "M":
            continue
        kind, c_out = item
        key, k1, k2 = jax.random.split(key, 3)
        conv_w.append(
            jax.random.normal(k1, (3, 3, c_in, c_out)) / np.sqrt(9 * c_in)
        )
        conv_b.append(jax.random.normal(k2, (c_out,)) * 0.1)
        c_in = c_out
        if kind == "C*":
            key, k3 = jax.random.split(key)
            lin_w.append(jax.random.uniform(k3, (c_out,)))  # heads are >= 0
            n_lin += 1
    return LPIPSParams(tuple(conv_w), tuple(conv_b), tuple(lin_w), plan)


def convert_torch_checkpoint(out_path: str | None = None) -> str:
    """Offline converter: torchvision VGG16 IMAGENET1K_V1 features + the
    richzhang v0.1 vgg linear heads -> the documented .npz. Run on any
    machine WITH torchvision/egress; this box has neither, so it is not
    exercised here (the math is pinned by the synthetic-weight tests)."""
    import torch  # deliberate local import — apps/ never import torch
    from torchvision import models

    out_path = out_path or default_weights_path()
    vgg = models.vgg16(weights=models.VGG16_Weights.IMAGENET1K_V1).features
    url = (
        "https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/"
        "master/lpips/weights/v0.1/vgg.pth"
    )
    heads = torch.hub.load_state_dict_from_url(url, map_location="cpu")
    arrays = {}
    ci = 0
    for m in vgg:
        if isinstance(m, torch.nn.Conv2d):
            # torch OIHW -> HWIO
            arrays[f"conv{ci}_w"] = (
                m.weight.detach().numpy().transpose(2, 3, 1, 0).astype(np.float32)
            )
            arrays[f"conv{ci}_b"] = m.bias.detach().numpy().astype(np.float32)
            ci += 1
        if ci == 13:
            break
    for j in range(5):
        w = heads[f"lin{j}.model.1.weight"].detach().numpy()  # (1, C, 1, 1)
        arrays[f"lin{j}_w"] = w.reshape(-1).astype(np.float32)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez(out_path, **arrays)
    return out_path
