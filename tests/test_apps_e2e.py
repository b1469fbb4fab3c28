"""End-to-end CLI tests: train a few iterations on a tiny synthetic
Blender dataset, snapshot, render, and compute metrics — the full
reference workflow (train.py -> scripts/render.py -> metrics.py)."""
import json
import os

import numpy as np
import pytest

from test_io_scene import _make_blender_dataset

pytestmark = pytest.mark.slow  # full CLI train/render/metrics runs (~1-2 min)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data") / "scene")
    _make_blender_dataset(root, n_cams=3, size=16)
    return root


def test_train_render_metrics_gs_mesh(dataset, tmp_path_factory):
    from gaussian_mesh_splatting_tpu.apps import metrics as metrics_app
    from gaussian_mesh_splatting_tpu.apps import render as render_app
    from gaussian_mesh_splatting_tpu.apps import train as train_app

    model_path = str(tmp_path_factory.mktemp("out") / "model")
    train_app.main([
        "--gs_type", "gs_mesh", "-s", dataset, "-m", model_path,
        "--eval", "--iterations", "6", "--num_splats", "2",
        "--test_iterations", "5", "--save_iterations", "6",
        "--quiet", "--backend", "reference",
    ])
    snap = os.path.join(model_path, "point_cloud", "iteration_6", "point_cloud.ply")
    assert os.path.exists(snap)
    assert os.path.exists(os.path.join(model_path, "cfg_args"))
    assert os.path.exists(os.path.join(model_path, "cameras.json"))

    render_app.main(["-m", model_path, "--skip_train"])
    renders = os.path.join(model_path, "test", "ours_6", "renders_gs_mesh")
    assert len(os.listdir(renders)) == 3

    metrics_app.main(["-m", model_path])
    with open(os.path.join(model_path, "results_gs_mesh.json")) as f:
        res = json.load(f)
    psnr = res["ours_6"]["gs_mesh"]["PSNR"]
    assert np.isfinite(psnr) and psnr > 0


def test_train_gs_flat_with_densify(dataset, tmp_path_factory):
    from gaussian_mesh_splatting_tpu.apps import train as train_app

    model_path = str(tmp_path_factory.mktemp("out2") / "model")
    # densification path: force events early with tiny intervals
    state = train_app.main([
        "--gs_type", "gs_flat", "-s", dataset, "-m", model_path,
        "--iterations", "8", "--quiet", "--backend", "reference",
        "--test_iterations", "-1", "--save_iterations", "8",
    ])
    assert int(state.step) == 8


def test_checkpoint_resume(dataset, tmp_path_factory):
    from gaussian_mesh_splatting_tpu.apps import train as train_app

    model_path = str(tmp_path_factory.mktemp("out3") / "model")
    train_app.main([
        "--gs_type", "gs_mesh", "-s", dataset, "-m", model_path,
        "--iterations", "4", "--num_splats", "2", "--quiet",
        "--backend", "reference", "--test_iterations", "-1",
        "--save_iterations", "-1", "--checkpoint_iterations", "3",
    ])
    ckpt = os.path.join(model_path, "chkpnt3")
    assert os.path.exists(ckpt)
    state = train_app.main([
        "--gs_type", "gs_mesh", "-s", dataset, "-m", model_path,
        "--iterations", "6", "--num_splats", "2", "--quiet",
        "--backend", "reference", "--test_iterations", "-1",
        "--save_iterations", "-1", "--start_checkpoint", ckpt,
    ])
    assert int(state.step) == 6


def test_train_densify_cycle_through_app(dataset, tmp_path_factory):
    """Drive actual clone/split/prune + opacity reset through the training
    CLI with compressed intervals (the gs ficus-with-densification driver
    config in miniature)."""
    from gaussian_mesh_splatting_tpu.apps import train as train_app
    from gaussian_mesh_splatting_tpu.io.ply import store_point_cloud

    # seed a small init cloud so the oracle-backend test stays fast (the
    # Blender reader only generates its 100k random cloud when absent)
    rng = __import__("numpy").random.default_rng(0)
    store_point_cloud(
        os.path.join(dataset, "points3d.ply"),
        rng.normal(size=(64, 3)) * 0.5,
        rng.integers(0, 255, (64, 3)),
    )
    model_path = str(tmp_path_factory.mktemp("out4") / "model")
    state = train_app.main([
        "--gs_type", "gs_flat", "-s", dataset, "-m", model_path,
        "--iterations", "12", "--quiet", "--backend", "reference",
        "--test_iterations", "-1", "--save_iterations", "12",
        "--densification_interval", "3", "--densify_from_iter", "2",
        "--densify_until_iter", "11", "--opacity_reset_interval", "10",
        "--densify_grad_threshold", "1e-9",  # force clone/split events
        "--capacity_mult", "3",
    ])
    import numpy as np

    assert int(state.step) == 12
    # the 1e-9 threshold forces clone/split at every densify event: the
    # alive count MUST grow past the 64-point seed cloud (a no-op
    # densification fails here)
    alive = int(np.asarray(state.alive).sum())
    assert alive > 64, f"densification was a no-op: alive={alive} (seed=64)"
    assert np.all(np.isfinite(np.asarray(state.params["xyz"])))
