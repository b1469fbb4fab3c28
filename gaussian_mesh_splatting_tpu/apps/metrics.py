"""Offline metrics CLI — the reference's `metrics.py`.

Walks {model}/test/ours_N/renders_{gs_type} vs gt, computes SSIM/PSNR/LPIPS
and writes results_{gs_type}.json + per_view_{gs_type}.json
(/root/reference/metrics.py:36-93). LPIPS is the pure-JAX LPIPS v0.1
implementation in ops/lpips.py (reference vendors lpipsPyTorch,
modules/lpips.py:8-36); its pretrained weights cannot be downloaded on a
zero-egress box, so when the documented weights file is absent the score
is an honest null with a note pointing at the offline converter."""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _load_image(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0


def _lpips_fn():
    """Build an LPIPS(vgg) scorer from ops.lpips; None when the weights
    npz is absent (see ops/lpips.py:convert_torch_checkpoint)."""
    import jax.numpy as jnp

    from ..ops import lpips as lpips_mod

    params = lpips_mod.load_params()
    if params is None:
        print(
            "[metrics] LPIPS weights not found at "
            f"{lpips_mod.default_weights_path()}; reporting null. Generate "
            "the file offline with ops.lpips.convert_torch_checkpoint()."
        )
        return None

    scorer = lpips_mod.make_lpips_fn(params)

    def lpips(a: np.ndarray, b: np.ndarray) -> float:
        return float(scorer(jnp.asarray(a), jnp.asarray(b)))

    return lpips


def evaluate(model_paths: list[str]) -> None:
    import jax.numpy as jnp

    from ..ops.ssim import ssim
    from ..train.loss import psnr as psnr_fn

    lpips = _lpips_fn()
    for model_path in model_paths:
        print(f"evaluating {model_path}")
        test_dir = os.path.join(model_path, "test")
        full_results, per_view = {}, {}
        for method in sorted(os.listdir(test_dir)):
            method_dir = os.path.join(test_dir, method)
            renders_dirs = [d for d in os.listdir(method_dir) if d.startswith("renders")]
            for rd in renders_dirs:
                gs_type = rd.replace("renders_", "") or "gs"
                r_dir = os.path.join(method_dir, rd)
                g_dir = os.path.join(method_dir, "gt")
                names = sorted(os.listdir(r_dir))
                ssims, psnrs, lpipss = [], [], []
                for name in names:
                    render = _load_image(os.path.join(r_dir, name))
                    gt = _load_image(os.path.join(g_dir, name))
                    ssims.append(float(ssim(jnp.asarray(render), jnp.asarray(gt))))
                    psnrs.append(float(psnr_fn(jnp.asarray(render), jnp.asarray(gt))))
                    lpipss.append(lpips(render, gt) if lpips else None)
                full_results.setdefault(method, {})[gs_type] = {
                    "SSIM": float(np.mean(ssims)),
                    "PSNR": float(np.mean(psnrs)),
                    "LPIPS": float(np.mean([x for x in lpipss if x is not None]))
                    if lpips
                    else None,
                }
                per_view.setdefault(method, {})[gs_type] = {
                    "SSIM": dict(zip(names, ssims)),
                    "PSNR": dict(zip(names, psnrs)),
                    "LPIPS": dict(zip(names, lpipss)),
                }
                print(
                    f"  {method}/{gs_type}: SSIM {np.mean(ssims):.4f} "
                    f"PSNR {np.mean(psnrs):.2f}"
                )
                with open(os.path.join(model_path, f"results_{gs_type}.json"), "w") as f:
                    json.dump(full_results, f, indent=2)
                with open(os.path.join(model_path, f"per_view_{gs_type}.json"), "w") as f:
                    json.dump(per_view, f, indent=2)


def main(argv=None):
    p = argparse.ArgumentParser("metrics")
    p.add_argument("--model_paths", "-m", nargs="+", required=True)
    args = p.parse_args(argv)
    evaluate(args.model_paths)


if __name__ == "__main__":
    main()
