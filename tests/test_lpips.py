"""LPIPS v0.1 conformance: the JAX implementation must match an
independent numpy re-derivation of the reference semantics
(lpipsPyTorch/modules/lpips.py:30-36, networks.py:55-63, utils.py:6-8)
on synthetic weights — correctness of the math must not depend on the
pretrained weights being downloadable (VERDICT round-2 ask #4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_mesh_splatting_tpu.ops.lpips import (
    _SCALE,
    _SHIFT,
    VGG16_PLAN,
    load_params,
    lpips,
    synthetic_params,
)

TINY_PLAN = (("C", 4), ("C*", 4), "M", ("C", 6), ("C*", 6))


# ---- independent numpy re-derivation -----------------------------------

def np_conv3x3_same(x, w, b):
    h, wd, _ = x.shape
    xp = np.pad(x, ((1, 1), (1, 1), (0, 0)))
    out = np.zeros((h, wd, w.shape[3]), np.float64)
    for dy in range(3):
        for dx in range(3):
            out += np.einsum("hwi,io->hwo", xp[dy : dy + h, dx : dx + wd], w[dy, dx])
    return out + b


def np_maxpool2(x):
    h, wd, c = x.shape
    return x[: h // 2 * 2, : wd // 2 * 2].reshape(h // 2, 2, wd // 2, 2, c).max((1, 3))


def np_features(img, params):
    x = (img - _SHIFT) / _SCALE
    taps, ci = [], 0
    for item in params.plan:
        if item == "M":
            x = np_maxpool2(x)
            continue
        kind, _ = item
        x = np.maximum(
            np_conv3x3_same(x, np.asarray(params.conv_w[ci]), np.asarray(params.conv_b[ci])),
            0.0,
        )
        ci += 1
        if kind == "C*":
            norm = np.sqrt((x ** 2).sum(-1, keepdims=True))
            taps.append(x / (norm + 1e-10))
    return taps


def np_lpips(a, b, params):
    fa, fb = np_features(a, params), np_features(b, params)
    total = 0.0
    for ta, tb, w in zip(fa, fb, params.lin_w):
        d = (ta - tb) ** 2
        total += (d * np.asarray(w)).sum(-1).mean()
    return total


# ---- tests ---------------------------------------------------------------

def test_matches_numpy_rederivation_tiny():
    params = synthetic_params(jax.random.key(0), TINY_PLAN)
    ka, kb = jax.random.split(jax.random.key(1))
    a = np.asarray(jax.random.uniform(ka, (12, 16, 3)))
    b = np.asarray(jax.random.uniform(kb, (12, 16, 3)))
    got = float(lpips(jnp.asarray(a), jnp.asarray(b), params))
    want = np_lpips(a.astype(np.float64), b.astype(np.float64), params)
    np.testing.assert_allclose(got, want, rtol=1e-4)


@pytest.mark.slow  # 13-conv VGG16 stack on CPU
def test_matches_numpy_rederivation_full_vgg16_plan():
    """Full 13-conv VGG16 architecture (synthetic weights, small image)."""
    params = synthetic_params(jax.random.key(2), VGG16_PLAN)
    ka, kb = jax.random.split(jax.random.key(3))
    a = np.asarray(jax.random.uniform(ka, (32, 32, 3)))
    b = np.asarray(jax.random.uniform(kb, (32, 32, 3)))
    got = float(lpips(jnp.asarray(a), jnp.asarray(b), params))
    want = np_lpips(a.astype(np.float64), b.astype(np.float64), params)
    np.testing.assert_allclose(got, want, rtol=2e-4)
    assert got > 0


def test_identical_images_score_zero():
    params = synthetic_params(jax.random.key(0), TINY_PLAN)
    a = jax.random.uniform(jax.random.key(4), (16, 16, 3))
    assert float(lpips(a, a, params)) == 0.0


def test_symmetry_and_batch():
    params = synthetic_params(jax.random.key(0), TINY_PLAN)
    ka, kb = jax.random.split(jax.random.key(5))
    a = jax.random.uniform(ka, (2, 16, 16, 3))
    b = jax.random.uniform(kb, (2, 16, 16, 3))
    s_ab = np.asarray(lpips(a, b, params))
    s_ba = np.asarray(lpips(b, a, params))
    assert s_ab.shape == (2,)
    np.testing.assert_allclose(s_ab, s_ba, rtol=1e-6)


def test_load_params_absent_returns_none(tmp_path):
    assert load_params(str(tmp_path / "nope.npz")) is None


def test_load_params_roundtrip(tmp_path):
    """The documented npz layout round-trips through load_params."""
    params = synthetic_params(jax.random.key(6), VGG16_PLAN)
    arrays = {}
    for i, (w, b) in enumerate(zip(params.conv_w, params.conv_b)):
        arrays[f"conv{i}_w"] = np.asarray(w)
        arrays[f"conv{i}_b"] = np.asarray(b)
    for j, w in enumerate(params.lin_w):
        arrays[f"lin{j}_w"] = np.asarray(w)
    path = tmp_path / "lpips_vgg.npz"
    np.savez(path, **arrays)
    loaded = load_params(str(path))
    assert loaded is not None
    a = jax.random.uniform(jax.random.key(7), (16, 16, 3))
    b = jax.random.uniform(jax.random.key(8), (16, 16, 3))
    np.testing.assert_allclose(
        float(lpips(a, b, loaded)), float(lpips(a, b, params)), rtol=1e-6
    )
