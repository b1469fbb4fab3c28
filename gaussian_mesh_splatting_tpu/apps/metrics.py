"""Offline metrics CLI — the reference's `metrics.py`.

Walks {model}/test/ours_N/renders_{gs_type} vs gt, computes SSIM/PSNR (and
LPIPS when torch+torchvision weights are available — this machine has zero
egress, so LPIPS falls back to null with a note), writes
results_{gs_type}.json + per_view_{gs_type}.json (metrics.py:36-93)."""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _load_image(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0


def _lpips_fn():
    """Try to build an LPIPS(vgg) scorer; None when weights unavailable."""
    try:
        import torch
        import torchvision

        weights_dir = os.environ.get("TORCH_HOME", os.path.expanduser("~/.cache/torch"))
        vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1")  # may hit network
        vgg.eval()

        def lpips(a: np.ndarray, b: np.ndarray) -> float:
            # feature-space L2 distance over VGG16 conv stages (unscaled
            # LPIPS variant — linear head weights are a network download)
            layers = [3, 8, 15, 22, 29]
            mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
            std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

            def feats(x):
                x = torch.from_numpy(x).permute(2, 0, 1)[None]
                x = (x - mean) / std
                out = []
                h = x
                for i, layer in enumerate(vgg.features):
                    h = layer(h)
                    if i in layers:
                        n = h / (h.norm(dim=1, keepdim=True) + 1e-10)
                        out.append(n)
                return out

            with torch.no_grad():
                fa, fb = feats(a), feats(b)
            return float(sum(((x - y) ** 2).mean() for x, y in zip(fa, fb)))

        return lpips
    except Exception as e:  # no weights / no network
        print(f"[metrics] LPIPS unavailable ({type(e).__name__}); reporting null")
        return None


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
