"""Loopback test of the SIBR network-GUI wire protocol
(reference renderer/gaussian_renderer/network_gui.py:24-85): a fake viewer
connects over TCP, sends a length-prefixed JSON camera request, and reads
back raw RGB bytes + the source-path string. Also covers the `train`
(do_training) flag semantics the training loop honors
(reference train.py:65-79)."""
import json
import socket
import struct
import threading

import numpy as np
import pytest

from gaussian_mesh_splatting_tpu.apps import network_gui


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _viewer_message(width=32, height=16, train=True, keep_alive=True):
    view = np.eye(4)
    view[3, 2] = 4.0  # glm row-vector convention: translation in row 3
    proj = np.eye(4)
    return {
        "resolution_x": width,
        "resolution_y": height,
        "train": train,
        "fov_y": 0.8,
        "fov_x": 0.8,
        "z_near": 0.01,
        "z_far": 100.0,
        "shs_python": False,
        "rot_scale_python": False,
        "keep_alive": keep_alive,
        "scaling_modifier": 1.0,
        "view_matrix": view.reshape(-1).tolist(),
        "view_projection_matrix": proj.reshape(-1).tolist(),
    }


def _send_msg(sock, msg: dict):
    payload = json.dumps(msg).encode("utf-8")
    sock.sendall(struct.pack("<I", len(payload)) + payload)


def _recv_exact(sock, n):
    out = b""
    while len(out) < n:
        chunk = sock.recv(n - len(out))
        assert chunk, "server closed early"
        out += chunk
    return out


@pytest.fixture
def server_port():
    port = _free_port()
    network_gui.init("127.0.0.1", port)
    yield port
    network_gui.disconnect()
    if network_gui.listener is not None:
        network_gui.listener.close()
        network_gui.listener = None


def test_full_request_response_roundtrip(server_port):
    """init -> connect -> receive -> parse -> render-reply -> client reads
    the exact RGB bytes and source path."""
    width, height = 32, 16
    results = {}

    def viewer():
        c = socket.create_connection(("127.0.0.1", server_port), timeout=10)
        _send_msg(c, _viewer_message(width, height, train=False))
        results["img"] = _recv_exact(c, width * height * 3)
        (slen,) = struct.unpack("<I", _recv_exact(c, 4))
        results["path"] = _recv_exact(c, slen).decode()
        c.close()

    t = threading.Thread(target=viewer)
    t.start()
    # server side: poll until connected (try_connect is non-blocking)
    for _ in range(1000):
        if network_gui.try_connect():
            break
    msg = network_gui.receive()
    parsed = network_gui.parse_camera(msg)
    assert parsed is not None
    cam, do_training, keep_alive, scaling_mod = parsed
    assert do_training is False
    assert keep_alive is True
    assert scaling_mod == 1.0
    assert (cam.width, cam.height) == (width, height)
    # the parsed camera transposes the glm row-vector matrices back
    np.testing.assert_allclose(np.asarray(cam.world_view)[2, 3], 4.0)

    img = np.zeros((height, width, 3), np.float32)
    img[..., 0] = 1.0  # pure red frame
    network_gui.send(network_gui.image_to_bytes(img), "/data/scene")
    t.join(timeout=10)
    assert not t.is_alive()

    got = np.frombuffer(results["img"], np.uint8).reshape(height, width, 3)
    assert (got[..., 0] == 255).all() and (got[..., 1:] == 0).all()
    assert results["path"] == "/data/scene"


def test_zero_resolution_message_parses_to_none(server_port):
    """A 0x0 request (viewer handshake) must not build a camera; the server
    still answers with just the source path (reference sends None image)."""
    results = {}

    def viewer():
        c = socket.create_connection(("127.0.0.1", server_port), timeout=10)
        _send_msg(c, _viewer_message(0, 0))
        (slen,) = struct.unpack("<I", _recv_exact(c, 4))
        results["path"] = _recv_exact(c, slen).decode()
        c.close()

    t = threading.Thread(target=viewer)
    t.start()
    for _ in range(1000):
        if network_gui.try_connect():
            break
    msg = network_gui.receive()
    assert network_gui.parse_camera(msg) is None
    network_gui.send(None, "/data/scene")
    t.join(timeout=10)
    assert results["path"] == "/data/scene"


def test_do_training_false_pauses_then_resumes(server_port):
    """The train-loop contract: with a viewer connected and train=False the
    loop keeps serving frames WITHOUT advancing iterations; once the viewer
    flips train=True the loop proceeds (reference train.py:70-77)."""
    height = width = 8
    served = []

    def gui_poll(it, iterations):
        """apps/train.py's GUI block, extracted verbatim semantics."""
        while network_gui.try_connect():
            try:
                msg = network_gui.receive()
                parsed = network_gui.parse_camera(msg) if msg else None
                do_training = True
                keep_alive = False
                img_bytes = None
                if parsed is not None:
                    _, do_training, keep_alive, _ = parsed
                    img_bytes = network_gui.image_to_bytes(
                        np.full((height, width, 3), 0.5, np.float32)
                    )
                    served.append(1)
                network_gui.send(img_bytes, "src")
                if do_training and (it <= iterations or not keep_alive):
                    break
            except Exception:
                network_gui.disconnect()
                break

    def viewer():
        c = socket.create_connection(("127.0.0.1", server_port), timeout=10)
        # three paused frames, then resume training
        for _ in range(3):
            _send_msg(c, _viewer_message(width, height, train=False))
            _recv_exact(c, width * height * 3)
            (slen,) = struct.unpack("<I", _recv_exact(c, 4))
            _recv_exact(c, slen)
        _send_msg(c, _viewer_message(width, height, train=True))
        _recv_exact(c, width * height * 3)
        (slen,) = struct.unpack("<I", _recv_exact(c, 4))
        _recv_exact(c, slen)
        c.close()

    t = threading.Thread(target=viewer)
    t.start()
    for _ in range(1000):
        if network_gui.try_connect():
            break
    gui_poll(it=1, iterations=100)
    t.join(timeout=10)
    # all four requests were answered by ONE gui_poll call: the three
    # train=False frames paused the loop inside the poll
    assert len(served) == 4
