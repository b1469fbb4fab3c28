"""Camera list construction: resolution policy + GT image preparation
(reference utils/camera_utils.py:19-60 + scene/cameras.py:17-57).

Produces (core.Camera, gt_image) pairs; GT images are float32 (H, W, 3)
numpy arrays (uploaded lazily by the training loop)."""
from __future__ import annotations

import numpy as np

from ..core.camera import Camera, make_camera
from .dataset_readers import CameraInfo

WARNED = [False]


def resolve_resolution(width: int, height: int, resolution: int) -> tuple[int, int]:
    """Reference resolution policy (utils/camera_utils.py:19-39):
    -1 = native, auto-downscale beyond 1.6K wide; 1/2/4/8 = divide."""
    if resolution in (1, 2, 4, 8):
        scale = float(resolution)
    elif resolution == -1:
        if width > 1600:
            if not WARNED[0]:
                print(
                    "[ INFO ] Encountered quite large input images (>1.6K pixels "
                    "width), rescaling to 1.6K.\n If this is not desired, please "
                    "explicitly specify '--resolution/-r' as 1"
                )
                WARNED[0] = True
            scale = width / 1600
        else:
            scale = 1.0
    else:
        scale = width / resolution
    return round(width / scale), round(height / scale)


def _resize(image: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    w, h = size
    if image.shape[1] == w and image.shape[0] == h:
        return image
    from PIL import Image

    im = Image.fromarray((np.clip(image, 0, 1) * 255).astype(np.uint8))
    return np.asarray(im.resize((w, h)), dtype=np.float32) / 255.0


def load_camera(
    info: CameraInfo,
    resolution: int = -1,
    znear: float = 0.01,
    zfar: float = 100.0,
    trans: np.ndarray | None = None,
    scale: float = 1.0,
) -> tuple[Camera, np.ndarray]:
    # the resolution policy keys off the ACTUAL image dims (which differ
    # from the intrinsics dims when training from a downscaled images_2/4
    # dir — reference utils/camera_utils.py:20 uses cam_info.image.size,
    # while FoV stays derived from the full-res intrinsics)
    orig_h, orig_w = info.image.shape[:2]
    w, h = resolve_resolution(orig_w, orig_h, resolution)
    gt = _resize(info.image, (w, h))
    if info.alpha_mask is not None:
        # gt_alpha_mask multiplied into the GT (scene/cameras.py:43-45)
        mask = _resize(np.repeat(info.alpha_mask, 3, axis=2), (w, h))
        gt = gt * mask
    cam = make_camera(
        info.R, info.T, info.fovx, info.fovy, w, h, znear=znear, zfar=zfar,
        trans=trans, scale=scale,
    )
    return cam, np.clip(gt, 0.0, 1.0)


def camera_list(infos: list[CameraInfo], resolution: int = -1) -> list[tuple[Camera, np.ndarray]]:
    return [load_camera(i, resolution) for i in infos]


def camera_to_json(uid: int, info: CameraInfo) -> dict:
    """cameras.json entry for viewer interop (utils/camera_utils.py:62-82)."""
    from ..core.camera import fov2focal, world_to_view

    W2C = world_to_view(info.R, info.T)
    C2W = np.linalg.inv(W2C)
    return {
        "id": uid,
        "img_name": info.image_name,
        "width": info.width,
        "height": info.height,
        "position": C2W[:3, 3].tolist(),
        "rotation": [x.tolist() for x in C2W[:3, :3]],
        "fy": fov2focal(info.fovy, info.height),
        "fx": fov2focal(info.fovx, info.width),
    }
