"""FLAME head-model decoder in JAX.

Functional equivalent of the reference's vendored FLAME layer
(games/flame_splatting/FLAME/FLAME.py:204-249): given shape (100),
expression (50), pose (6: global+jaw), neck pose (3) and translation,
produce the (V, 3) head mesh via LBS. Landmarks (static embedding) are
supported; the dynamic neck-contour landmark selection
(FLAME.py:159-202) is implemented branchlessly with a gather.

Rig data loads from the standard `flame2023.pkl` / `generic_model.pkl`
pickle (the reference gitignores the weights — games/flame_splatting/
FLAME/config.py:8-10 — so they must be user-supplied here too);
`make_random_flame_like_rig` builds a small structurally-identical rig for
tests and CI, where no MPI-licensed asset is available.
"""
from __future__ import annotations

import pickle
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .lbs import LbsModel, batch_rodrigues, lbs, vertices2landmarks

SHAPE_SPACE = 300
EXPR_SPACE = 100
NUM_JOINTS = 5  # global, neck, jaw, left eye, right eye
FLAME_PARENTS = (-1, 0, 1, 1, 1)


class FlameRig(NamedTuple):
    lbs_model: LbsModel
    parents: tuple  # static
    lmk_faces_idx: np.ndarray | None  # (L,) static landmarks
    lmk_bary_coords: np.ndarray | None  # (L, 3)
    dynamic_lmk_faces_idx: np.ndarray | None = None  # (79, Lc) contour
    dynamic_lmk_bary_coords: np.ndarray | None = None  # (79, Lc, 3)


def _dense(x) -> np.ndarray:
    if hasattr(x, "todense"):
        x = x.todense()
    if hasattr(x, "r"):  # chumpy array
        x = x.r
    return np.asarray(x, dtype=np.float64)


def load_flame_pickle(path: str) -> FlameRig:
    """Parse the FLAME model pickle (same file the reference consumes,
    FLAME.py:44-45)."""
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    parents = tuple(int(p) for p in np.asarray(data["kintree_table"])[0].astype(np.int64))
    parents = (-1,) + parents[1:] if parents[0] != -1 else parents
    posedirs = _dense(data["posedirs"])
    posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T  # (P, V*3)
    model = LbsModel(
        v_template=jnp.asarray(_dense(data["v_template"]), jnp.float32),
        shapedirs=jnp.asarray(_dense(data["shapedirs"]), jnp.float32),
        posedirs=jnp.asarray(posedirs, jnp.float32),
        j_regressor=jnp.asarray(_dense(data["J_regressor"]), jnp.float32),
        parents=jnp.asarray(parents, jnp.int32),
        lbs_weights=jnp.asarray(_dense(data["weights"]), jnp.float32),
        faces=jnp.asarray(np.asarray(data["f"]).astype(np.int32)),
    )
    return FlameRig(model, parents, None, None)


def load_static_landmarks(rig: FlameRig, path: str) -> FlameRig:
    """Attach the static landmark embedding (FLAME.py:124-132)."""
    with open(path, "rb") as f:
        emb = pickle.load(f, encoding="latin1")
    return rig._replace(
        lmk_faces_idx=np.asarray(emb["lmk_face_idx"]).astype(np.int64),
        lmk_bary_coords=np.asarray(emb["lmk_b_coords"], np.float32),
    )


def make_random_flame_like_rig(
    key: jax.Array,
    n_verts: int = 128,
    shape_dim: int = SHAPE_SPACE,
    expr_dim: int = EXPR_SPACE,
) -> FlameRig:
    """A tiny rig with FLAME's exact parameter structure, for tests."""
    keys = jax.random.split(key, 8)
    v = jax.random.normal(keys[0], (n_verts, 3)) * 0.1
    shapedirs = jax.random.normal(keys[1], (n_verts, 3, shape_dim + expr_dim)) * 0.01
    posedirs = jax.random.normal(keys[2], (9 * (NUM_JOINTS - 1), n_verts * 3)) * 0.001
    jr = jax.nn.softmax(jax.random.normal(keys[3], (NUM_JOINTS, n_verts)), axis=-1)
    w = jax.nn.softmax(jax.random.normal(keys[4], (n_verts, NUM_JOINTS)) * 2, axis=-1)
    # arbitrary triangulation over the vertex set
    f = jax.random.randint(keys[5], (2 * n_verts, 3), 0, n_verts)
    model = LbsModel(
        v_template=v.astype(jnp.float32),
        shapedirs=shapedirs.astype(jnp.float32),
        posedirs=posedirs.astype(jnp.float32),
        j_regressor=jr.astype(jnp.float32),
        parents=jnp.asarray(FLAME_PARENTS, jnp.int32),
        lbs_weights=w.astype(jnp.float32),
        faces=f.astype(jnp.int32),
    )
    return FlameRig(model, FLAME_PARENTS, None, None)


def load_dynamic_landmarks(rig: FlameRig, path: str) -> "FlameRig":
    """Attach the dynamic neck-contour embedding (FLAME.py:134-149).

    The .npy holds {lmk_face_idx (79, L), lmk_b_coords (79, L, 3)} indexed
    by the discretized neck yaw angle."""
    data = np.load(path, allow_pickle=True, encoding="latin1")[()]
    return rig._replace(
        dynamic_lmk_faces_idx=np.asarray(data["lmk_face_idx"]).astype(np.int64),
        dynamic_lmk_bary_coords=np.asarray(data["lmk_b_coords"], np.float32),
    )


def _rot_mat_to_yaw_euler(R: jax.Array) -> jax.Array:
    """smplx rot_mat_to_euler: the y-rotation extraction used for contour
    selection. (B, 3, 3) -> (B,)."""
    sy = jnp.sqrt(R[:, 0, 0] * R[:, 0, 0] + R[:, 1, 0] * R[:, 1, 0])
    return jnp.arctan2(-R[:, 2, 0], sy)


def find_dynamic_lmk_idx_and_bcoords(
    rig: FlameRig,
    full_pose: jax.Array,  # (B, J*3)
    dynamic_lmk_faces_idx: jax.Array,  # (A, L)
    dynamic_lmk_bary_coords: jax.Array,  # (A, L, 3)
) -> tuple[jax.Array, jax.Array]:
    """Neck-yaw-dependent contour landmark selection (FLAME.py:159-202),
    branchless: the angle-bucket index is computed with jnp.where instead
    of the reference's masked integer algebra."""
    B = full_pose.shape[0]
    # neck kinematic chain: neck joint (idx 1) up to the root
    chain = []
    cur = 1
    while cur != -1:
        chain.append(cur)
        cur = rig.parents[cur]
    aa = full_pose.reshape(B, -1, 3)[:, jnp.asarray(chain, jnp.int32)]
    rots = batch_rodrigues(aa.reshape(-1, 3)).reshape(B, len(chain), 3, 3)
    rel = jnp.broadcast_to(jnp.eye(3, dtype=full_pose.dtype), (B, 3, 3))
    for i in range(len(chain)):
        rel = rots[:, i] @ rel
    y_deg = jnp.clip(-_rot_mat_to_yaw_euler(rel) * 180.0 / jnp.pi, a_max=39.0)
    y = jnp.round(y_deg).astype(jnp.int32)
    neg = y < 0
    extreme = y < -39
    y_idx = jnp.where(neg, jnp.where(extreme, 78, 39 - y), y)
    return dynamic_lmk_faces_idx[y_idx], dynamic_lmk_bary_coords[y_idx]


def flame_forward(
    rig: FlameRig,
    shape_params: jax.Array,  # (B, n_shape<=300)
    expression_params: jax.Array,  # (B, n_expr<=100)
    pose_params: jax.Array,  # (B, 6) = [global(3), jaw(3)]
    neck_pose: jax.Array,  # (B, 3)
    eye_pose: jax.Array | None = None,  # (B, 6)
    transl: jax.Array | None = None,  # (B, 3)
) -> tuple[jax.Array, jax.Array | None]:
    """Decode vertices (B, V, 3) (+ landmarks if the rig has embeddings).

    Parameter packing mirrors FLAME.py:204-224: betas = [shape | pad |
    expr | pad], full_pose = [global, neck, jaw, eyes].
    """
    m = rig.lbs_model
    B = shape_params.shape[0]
    shape_space = m.shapedirs.shape[-1] - EXPR_SPACE if m.shapedirs.shape[-1] > EXPR_SPACE else m.shapedirs.shape[-1] // 2
    expr_space = m.shapedirs.shape[-1] - shape_space
    dtype = shape_params.dtype

    def pad_to(x, width):
        return jnp.concatenate(
            [x, jnp.zeros((B, width - x.shape[1]), dtype)], axis=1
        )

    betas = jnp.concatenate(
        [pad_to(shape_params, shape_space), pad_to(expression_params, expr_space)],
        axis=1,
    )
    if eye_pose is None:
        eye_pose = jnp.zeros((B, 6), dtype)
    full_pose = jnp.concatenate(
        [pose_params[:, :3], neck_pose, pose_params[:, 3:], eye_pose], axis=1
    )
    vertices, _ = lbs(
        betas,
        full_pose,
        m.v_template,
        m.shapedirs,
        m.posedirs,
        m.j_regressor,
        rig.parents,
        m.lbs_weights,
    )
    landmarks = None
    if rig.lmk_faces_idx is not None:
        lmk_idx = jnp.broadcast_to(
            jnp.asarray(rig.lmk_faces_idx, jnp.int32)[None], (B, len(rig.lmk_faces_idx))
        )
        lmk_b = jnp.broadcast_to(
            jnp.asarray(rig.lmk_bary_coords)[None],
            (B, *rig.lmk_bary_coords.shape),
        )
        if rig.dynamic_lmk_faces_idx is not None:
            dyn_idx, dyn_b = find_dynamic_lmk_idx_and_bcoords(
                rig, full_pose,
                jnp.asarray(rig.dynamic_lmk_faces_idx, jnp.int32),
                jnp.asarray(rig.dynamic_lmk_bary_coords),
            )
            lmk_idx = jnp.concatenate([dyn_idx, lmk_idx], axis=1)
            lmk_b = jnp.concatenate([dyn_b, lmk_b], axis=1)
        landmarks = vertices2landmarks(vertices, m.faces, lmk_idx, lmk_b)
    if transl is not None:
        vertices = vertices + transl[:, None, :]
        if landmarks is not None:
            landmarks = landmarks + transl[:, None, :]
    return vertices, landmarks


def transform_flame_vertices(vertices: jax.Array, enlargement: jax.Array) -> jax.Array:
    """Blender->scene axis transform + per-vertex enlargement, mirroring the
    reference reader/model (games/flame_splatting/scene/dataset_readers.py:
    40-45 and gaussian_flame_model.py:203-206): squeeze batch, [x, z, -y],
    then elementwise multiply by the (trainable) enlargement."""
    v = vertices.reshape(-1, 3)
    v = v[:, jnp.array([0, 2, 1])]
    v = v * jnp.array([1.0, -1.0, 1.0], v.dtype)
    return v * enlargement
