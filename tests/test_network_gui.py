"""Live-viewer socket bridge: wire-protocol round trip over a real socket.

Plays the SIBR client role against `utils.network_gui.ViewerServer` on an
ephemeral localhost port (same protocol as the reference's
gs/gaussian_renderer/network_gui.py)."""

import json
import math
import socket

import numpy as np

from vidu4d_tpu.utils.network_gui import (
    ViewerServer,
    encode_image,
    make_request,
    parse_request,
)


def _recv_exact(conn, n):
    buf = b""
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        assert chunk, "server closed early"
        buf += chunk
    return buf


def test_viewer_round_trip():
    server = ViewerServer(port=0, source_path="/data/synth")
    try:
        client = socket.create_connection(("127.0.0.1", server.port))
        W, H = 32, 24
        viewmat = np.eye(4, dtype=np.float32)
        viewmat[2, 3] = 0.5
        client.sendall(make_request(W, H, viewmat, fovx=1.0, fovy=0.8))

        captured = {}

        def render_fn(cam):
            captured["cam"] = cam
            img = np.zeros((cam.height, cam.width, 3), np.float32)
            img[..., 0] = 1.0  # pure red
            return img

        served = server.poll(render_fn)
        assert served == 1

        img_bytes = _recv_exact(client, H * W * 3)
        img = np.frombuffer(img_bytes, np.uint8).reshape(H, W, 3)
        assert (img[..., 0] == 255).all() and (img[..., 1:] == 0).all()
        n = int.from_bytes(_recv_exact(client, 4), "little")
        assert _recv_exact(client, n).decode("ascii") == "/data/synth"

        cam = captured["cam"]
        assert (cam.width, cam.height) == (W, H)
        # the double axis-flip + transpose must round-trip our viewmat
        np.testing.assert_allclose(cam.viewmat, viewmat, atol=1e-6)
        np.testing.assert_allclose(
            cam.intrins[0], W / (2 * math.tan(0.5)), rtol=1e-6
        )
        client.close()
    finally:
        server.close()


def test_viewer_keepalive_and_disconnect():
    server = ViewerServer(port=0)
    try:
        client = socket.create_connection(("127.0.0.1", server.port))
        # 0-resolution keepalive: no image, just the verify string
        payload = json.dumps({"resolution_x": 0, "resolution_y": 0,
                              "train": True}).encode()
        client.sendall(len(payload).to_bytes(4, "little") + payload)
        served = server.poll(lambda cam: (_ for _ in ()).throw(AssertionError))
        assert served == 0
        n = int.from_bytes(_recv_exact(client, 4), "little")
        assert n == 0
        # disconnect: the next poll must recover (conn reset to None)
        client.close()
        assert server.poll(lambda cam: None) == 0
        assert server.conn is None
    finally:
        server.close()


def test_parse_request_rejects_zero_resolution():
    msg = json.loads(make_request(0, 0, np.eye(4), 1.0, 1.0)[4:])
    msg["resolution_x"] = msg["resolution_y"] = 0
    assert parse_request(msg) is None


def test_encode_image_clamps():
    img = np.array([[[-0.5, 0.5, 1.5]]], np.float32)
    assert encode_image(img) == bytes([0, 127, 255])
