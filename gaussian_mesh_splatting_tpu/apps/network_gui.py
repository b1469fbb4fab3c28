"""SIBR remote-viewer bridge: the reference's TCP wire protocol
(renderer/gaussian_renderer/network_gui.py:24-85) served from the JAX
trainer — length-prefixed JSON request in (resolution, fov, znear/zfar,
view/proj matrices, flags, scaling_modifier), raw RGB bytes + source-path
string out (train.py:65-79 polling pattern)."""
from __future__ import annotations

import json
import socket
import struct
import traceback

import numpy as np

host = "127.0.0.1"
port = 6009
listener: socket.socket | None = None
conn: socket.socket | None = None


def init(wish_host: str = "127.0.0.1", wish_port: int = 6009) -> None:
    global host, port, listener
    host, port = wish_host, wish_port
    listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    listener.bind((host, port))
    listener.listen()
    listener.settimeout(0)


def try_connect() -> bool:
    global conn
    if conn is not None:
        return True
    try:
        conn, _ = listener.accept()
        print(f"\nConnected by viewer")
        conn.settimeout(None)
        return True
    except Exception:
        return False


def _read_bytes(n: int) -> bytes:
    out = b""
    while len(out) < n:
        chunk = conn.recv(n - len(out))
        if not chunk:
            raise ConnectionError("viewer disconnected")
        out += chunk
    return out


def receive() -> dict | None:
    """One length-prefixed JSON message (network_gui.py:43-49)."""
    (length,) = struct.unpack("<I", _read_bytes(4))
    return json.loads(_read_bytes(length).decode("utf-8"))


def parse_camera(message: dict):
    """Viewer message -> (width, height, world_view, full_proj, flags)
    (network_gui.py:57-85). Matrices arrive row-major in the glm
    (transposed) convention the reference stores; we convert to our math
    convention by transposing."""
    width = message["resolution_x"]
    height = message["resolution_y"]
    if width == 0 or height == 0:
        return None
    try:
        do_training = bool(message["train"])
        fovy = message["fov_y"]
        fovx = message["fov_x"]
        znear = message["z_near"]
        zfar = message["z_far"]
        keep_alive = bool(message["keep_alive"])
        scaling_modifier = message["scaling_modifier"]
        world_view = np.reshape(message["view_matrix"], (4, 4)).T
        full_proj = np.reshape(message["view_projection_matrix"], (4, 4)).T
        import jax.numpy as jnp
        import math

        from ..core.camera import Camera

        cam = Camera(
            world_view=jnp.asarray(world_view, jnp.float32),
            full_proj=jnp.asarray(full_proj, jnp.float32),
            cam_center=jnp.asarray(np.linalg.inv(world_view)[:3, 3], jnp.float32),
            tanfovx=jnp.asarray(math.tan(fovx / 2), jnp.float32),
            tanfovy=jnp.asarray(math.tan(fovy / 2), jnp.float32),
            znear=jnp.asarray(znear, jnp.float32),
            zfar=jnp.asarray(zfar, jnp.float32),
            width=int(width),
            height=int(height),
        )
        return cam, do_training, keep_alive, scaling_modifier
    except Exception:
        traceback.print_exc()
        raise


def send(image_bytes: bytes | None, source_path: str) -> None:
    """Raw RGB bytes + verification string (network_gui.py:50-55)."""
    if image_bytes is not None:
        conn.sendall(image_bytes)
    conn.sendall(len(source_path).to_bytes(4, "little"))
    conn.sendall(source_path.encode())


def disconnect() -> None:
    global conn
    if conn is not None:
        conn.close()
        conn = None


def image_to_bytes(img: np.ndarray) -> bytes:
    """(H, W, 3) float [0,1] -> raw RGB byte buffer the viewer expects."""
    return (np.clip(img, 0, 1) * 255).astype(np.uint8).tobytes()
