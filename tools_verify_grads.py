"""Produce VERIFY_r{N}.json: bench-scale gradient conformance + quality run.

Three artifacts in one file (VERDICT r2 ask #3 / ADVICE cumsum-error item):

1. `oracle_grads`: Pallas-vs-oracle parameter gradients on a LARGE scene
   (default 40k Gaussians at 512x512, several hundred thousand pairs —
   the regime where the sort+two-level-cumsum segment-sum VJP accumulates
   error; conformance tests only cover N=48). The oracle runs its scan
   chunk-rematerialized on the TPU (flat-scan carries would be petabytes).
2. `fd_checks`: two-sided finite-difference directional derivatives of the
   full Pallas loss at FULL bench scale (100k / 800x800) against the
   analytic gradient — an oracle-free check at the exact bench workload.
3. `quality`: the self-consistent verify-scene PSNR numbers from the
   latest /tmp/verify_out-style run are merged in when present (produced
   by the verify skill: tools_verify_scene.py + apps.train/render/metrics).

Usage: python tools_verify_grads.py [out.json]
"""
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gaussian_mesh_splatting_tpu.core import make_camera
from gaussian_mesh_splatting_tpu.models.gaussian_bag import GaussianBag
from gaussian_mesh_splatting_tpu.renderer import render
from gaussian_mesh_splatting_tpu.train.loss import photometric_loss


def make_scene(n, width, height, key=0, scale_mean=-3.5):
    k = jax.random.split(jax.random.key(key), 6)
    params = dict(
        xyz=jax.random.normal(k[0], (n, 3)) * 0.5,
        scales_log=jax.random.normal(k[1], (n, 3)) * 0.3 + scale_mean,
        q=jax.random.normal(k[2], (n, 4)),
        opacity_raw=jax.random.normal(k[3], (n, 1)),
        shs=jnp.concatenate(
            [jax.random.uniform(k[4], (n, 3, 1)) * 2 - 0.5,
             jax.random.normal(k[5], (n, 3, 15)) * 0.01], axis=-1),
    )
    cam = make_camera(np.eye(3), np.array([0.0, 0.0, 4.0]), 0.8, 0.8, width, height)
    target = jnp.zeros((height, width, 3))
    return params, cam, target


def bag_of(p, n):
    return GaussianBag(
        xyz=p["xyz"], scaling=jnp.exp(p["scales_log"]),
        rotation=p["q"] / jnp.linalg.norm(p["q"], axis=-1, keepdims=True),
        opacity=jax.nn.sigmoid(p["opacity_raw"]),
        shs=p["shs"], alive=jnp.ones((n,), bool))


def loss_fn_factory(cam, target, n, backend, **kw):
    def loss_fn(p):
        out = render(bag_of(p, n), cam, jnp.zeros(3), sh_degree=3,
                     backend=backend, **kw)
        total, _ = photometric_loss(out.image, target, 0.2)
        return total
    return loss_fn


def oracle_grad_check(n=40_000, width=512, height=512):
    """Max-abs / relative gradient error, Pallas vs chunk-remat oracle.

    Both paths share preprocess (ops/projection.py); the oracle composites
    per-Gaussian sequentially at the SAME 32x32 tile granularity the Pallas
    kernel bins at, so differences isolate the Pallas kernels + the
    segment-sum VJP (the piece whose error grows with pair count)."""
    from gaussian_mesh_splatting_tpu.ops.rasterize_pallas import TILE_H, TILE_W

    params, cam, target = make_scene(n, width, height)
    pallas_loss = jax.jit(loss_fn_factory(cam, target, n, "pallas"))
    oracle_loss = jax.jit(loss_fn_factory(
        cam, target, n, "reference", tile_size=(TILE_H, TILE_W),
        scan_chunk=500))

    lp, gp = jax.value_and_grad(pallas_loss)(params)
    lo, go = jax.value_and_grad(oracle_loss)(params)
    jax.block_until_ready((gp, go))

    # binned pair count for the record
    from gaussian_mesh_splatting_tpu.ops.binning import build_aligned_binning
    from gaussian_mesh_splatting_tpu.ops.projection import preprocess
    from gaussian_mesh_splatting_tpu.ops.rasterize_pallas import (
        default_pair_capacity,
    )
    bag = bag_of(params, n)
    proj = preprocess(bag.xyz, bag.scaling, bag.rotation, bag.opacity, cam,
                      shs=bag.shs, sh_degree=3, alive=bag.alive,
                      radius_mode="tight")
    nty, ntx = height // TILE_H, width // TILE_W
    al = build_aligned_binning(
        proj, tile_h=TILE_H, tile_w=TILE_W, n_tiles_y=nty, n_tiles_x=ntx,
        pair_capacity=default_pair_capacity(n, nty * ntx), chunk=128,
        num_gaussians=n)
    n_pairs = int(np.asarray(al.tile_count).sum())

    report = {"n_gaussians": n, "image": [height, width], "n_pairs": n_pairs,
              "loss_pallas": float(lp), "loss_oracle": float(lo),
              "per_param": {}}
    worst_rel = 0.0
    for key in gp:
        a = np.asarray(gp[key], np.float64).ravel()
        b = np.asarray(go[key], np.float64).ravel()
        scale = np.abs(b).max() + 1e-20
        max_abs = float(np.abs(a - b).max())
        rel = float(max_abs / scale)
        report["per_param"][key] = {
            "max_abs_err": max_abs, "grad_scale": float(scale),
            "max_rel_err_vs_scale": rel,
        }
        worst_rel = max(worst_rel, rel)
    report["worst_rel_err"] = worst_rel
    return report


def fd_checks(n=100_000, width=800, height=800, eps=2e-3):
    """Directional-derivative checks at FULL bench scale (no oracle).

    Directions are GRADIENT-ALIGNED (globally and per parameter block):
    a random unit direction over the 1.9M-dim param space has a
    directional derivative ~ ||g||/sqrt(dim) ~ 1e-5, whose central
    difference at any linearity-respecting eps sits BELOW the f32 ulp of
    the O(0.6) loss (6e-8) — the r4 first run produced fd values
    quantized to ulp multiples, verifying nothing. Along g/||g|| the
    derivative is ||g|| itself (~1e-2 here), putting the loss delta
    ~1000 ulps above resolution while keeping the step tiny."""
    params, cam, target = make_scene(n, width, height)
    loss = jax.jit(loss_fn_factory(cam, target, n, "pallas"))
    grad = jax.jit(jax.grad(loss))
    g = grad(params)

    def check(tag, v):
        vnorm = jnp.sqrt(sum(jnp.sum(x * x) for x in v.values()))
        v = {k: x / vnorm for k, x in v.items()}
        analytic = float(sum(jnp.sum(g[k] * v[k]) for k in params))
        p_plus = {k: params[k] + eps * v[k] for k in params}
        p_minus = {k: params[k] - eps * v[k] for k in params}
        fd = float((loss(p_plus) - loss(p_minus)) / (2 * eps))
        denom = max(abs(fd), abs(analytic), 1e-12)
        return {"dir": tag, "analytic": analytic, "fd": fd,
                "rel_err": abs(fd - analytic) / denom}

    results = [check("grad", g)]
    for k in params:
        if float(jnp.sum(g[k] * g[k])) == 0.0:
            continue
        v = {kk: (g[kk] if kk == k else jnp.zeros_like(g[kk]))
             for kk in params}
        results.append(check(f"grad/{k}", v))
    return {"n_gaussians": n, "image": [height, width], "eps": eps,
            "directions": results,
            "worst_rel_err": max(r["rel_err"] for r in results)}


def psnr_curve(model_dir: str):
    """Extract the test-PSNR curve from a training run's metrics.jsonl."""
    path = os.path.join(model_dir, "metrics.jsonl")
    if not os.path.exists(path):
        return None
    curve = []
    with open(path) as f:
        for line in f:
            d = json.loads(line)
            if "test/psnr" in d:
                curve.append({"step": d["step"], "psnr": d["test/psnr"]})
    return curve or None


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "VERIFY_r4.json"
    report = {"platform": jax.default_backend()}
    print("running oracle-vs-pallas gradient check...")
    report["oracle_grads"] = oracle_grad_check()
    print(json.dumps(report["oracle_grads"]["per_param"], indent=2))
    print("running finite-difference checks at bench scale...")
    report["fd_checks"] = fd_checks()
    print(json.dumps(report["fd_checks"]["directions"], indent=2))
    # merge the long-run convergence curve when present (verify-skill scene
    # trained >=5k iters on the pallas TPU path)
    for run in ("/tmp/verify5k", "/tmp/verify_out2", "/tmp/verify_out"):
        curve = psnr_curve(run)
        if curve:
            report["convergence"] = {
                "source": f"{run}: self-consistent gs_mesh scene, pallas "
                          "backend on TPU (verify-skill recipe)",
                "test_psnr_curve": curve,
                "final_psnr": curve[-1]["psnr"],
            }
            break
    # merge latest verify-scene metrics-CLI numbers when present
    for res in ("/tmp/verify5k/results_gs_mesh.json",
                "/tmp/verify_out2/results_gs_mesh.json",
                "/tmp/verify_out/results_gs_mesh.json"):
        if os.path.exists(res):
            with open(res) as f:
                report["quality"] = {
                    "source": res + " (apps.metrics over apps.render output)",
                    "results": json.load(f),
                }
            break
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
