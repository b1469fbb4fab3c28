"""The flat-GS editing pipeline end-to-end (README.md:641-677):
train gs_flat -> save pseudomesh -> dummy mesh -> retarget -> render."""
import os

import numpy as np
import pytest

from test_io_scene import _make_blender_dataset

pytestmark = pytest.mark.slow  # full save/dummy/retarget/render pipeline


def test_pseudomesh_save_dummy_retarget(tmp_path):
    from gaussian_mesh_splatting_tpu.apps import pseudomesh as pm
    from gaussian_mesh_splatting_tpu.apps import train as train_app

    root = str(tmp_path / "scene")
    _make_blender_dataset(root, n_cams=2, size=16)
    model_path = str(tmp_path / "model")
    train_app.main([
        "--gs_type", "gs_flat", "-s", root, "-m", model_path,
        "--iterations", "3", "--quiet", "--backend", "reference",
        "--test_iterations", "-1", "--save_iterations", "3",
        "--sh_degree", "3",
    ])

    pm.main(["save", "-m", model_path, "--iteration", "3"])
    tri_path = os.path.join(model_path, "pseudomesh", "triangles.npz")
    assert os.path.exists(tri_path)
    tris = np.load(tri_path)["triangles"]
    assert tris.ndim == 3 and tris.shape[1:] == (3, 3)

    dummy_path = str(tmp_path / "dummy.obj")
    pm.main(["dummy", "--triangles", tri_path, "--output", dummy_path,
             "--alpha", "10.0"])
    assert os.path.exists(dummy_path)
    from gaussian_mesh_splatting_tpu.io.obj import load_obj, save_obj

    v, f = load_obj(dummy_path)
    assert len(f) > 0

    # "edit" the dummy mesh: translate by +1 in x; retarget must translate
    # the soup by the same amount
    edited_path = str(tmp_path / "edited.obj")
    save_obj(edited_path, v + np.array([1.0, 0, 0], np.float32), f)
    out_path = str(tmp_path / "retargeted.npz")
    pm.main(["retarget", "--triangles", tri_path,
             "--estimated_mesh", dummy_path, "--edited_mesh", edited_path,
             "--output", out_path])
    tris2 = np.load(out_path)["triangles"]
    delta = tris2 - tris
    np.testing.assert_allclose(delta[..., 0], 1.0, atol=1e-3)
    np.testing.assert_allclose(delta[..., 1:], 0.0, atol=1e-3)

    # render the edited soup
    pm.main(["render", "-m", model_path, "--triangles", out_path,
             "--iteration", "3"])
    renders = os.path.join(model_path, "renders_soup")
    assert len(os.listdir(renders)) > 0
