"""Model registry: gs_type string -> parameterization module.

The registry is the framework's extension mechanism, mirroring the
reference's `gaussianModel` / `gaussianModelRender` dicts
(games/__init__.py:35-51). Each entry is a module exposing at least
`to_bag(state, ...) -> GaussianBag` plus a variant-specific initializer.
"""
from . import flat, mesh, multi_mesh, points, vanilla
from .flame_gaussian import FlameGaussianModel
from .gaussian_bag import GaussianBag, concat_bags, features_to_shs, shs_to_features

MODEL_REGISTRY = {
    "gs": vanilla,
    "gs_flat": flat,
    "gs_mesh": mesh,
    "gs_multi_mesh": multi_mesh,
    "gs_points": points,  # render-only (README.md:122-125)
    # "gs_flame" needs a FLAME rig instance: register via
    # `register_model("gs_flame", FlameGaussianModel(rig))` after loading
    # the rig (models/flame/decoder.py:load_flame_pickle), mirroring the
    # reference's runtime FLAME instantiation
    # (games/flame_splatting/scene/dataset_readers.py:57-58).
}


def get_model(gs_type: str):
    try:
        return MODEL_REGISTRY[gs_type]
    except KeyError:
        raise KeyError(
            f"unknown gs_type {gs_type!r}; known: {sorted(MODEL_REGISTRY)}"
        ) from None


def register_model(gs_type: str, module) -> None:
    MODEL_REGISTRY[gs_type] = module
