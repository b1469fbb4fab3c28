"""Row-sharded (tile-parallel) rendering: split one large render's tile
rows across the `data` mesh axis — the spatial-parallel axis of SURVEY.md
§2.3. Compositing is tile-local, so shards are independent; parameter
gradients are psum'd by shard_map's reverse pass."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.camera import Camera
from ..models.gaussian_bag import GaussianBag
from ..ops.rasterize_pallas import TILE_H, rasterize_pallas


def render_row_sharded(
    bag: GaussianBag,
    cam: Camera,
    bg: jax.Array,
    mesh: Mesh,
    *,
    sh_degree: int = 3,
    axis_name: str = "data",
    interpret: bool | None = None,
) -> jax.Array:
    """Render one camera with image rows sharded over the mesh.

    Returns the assembled (H, W, 3) image (replicated)."""
    n_dev = mesh.devices.size
    hp = -(-cam.height // TILE_H) * TILE_H
    total_tiles_y = hp // TILE_H
    rows_per = -(-total_tiles_y // n_dev)

    def shard_fn(bag, bg):
        idx = jax.lax.axis_index(axis_name)
        out = rasterize_pallas(
            bag.xyz,
            bag.scaling,
            bag.rotation,
            bag.opacity,
            cam,
            bg=bg,
            shs=bag.shs,
            sh_degree=sh_degree,
            alive=bag.alive,
            num_row_tiles=rows_per,
            row_tile_offset=idx * rows_per,
            interpret=interpret,
        )
        return out.image[None]  # (1, rows_per*8, W, 3)

    shards = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(axis_name),
        check_vma=False,
    )(bag, bg)
    full = shards.reshape(-1, cam.width, 3)[: cam.height]
    return full
