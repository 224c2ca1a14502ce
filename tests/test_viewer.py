"""Live HTTP viewer tests (the headless analog of the reference's windowed
present, main.swift:124-140): page serving, MJPEG stream, input events."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from swift3drenderer_tpu.app import FrameLoop
from swift3drenderer_tpu.models import tetrahedron_scene
from swift3drenderer_tpu.viewer import ViewerServer, encode_jpeg


@pytest.fixture
def server():
    loop = FrameLoop(tetrahedron_scene(seed=0), width=160, height=120)
    srv = ViewerServer(loop, port=0, fps=0.0)
    t = threading.Thread(target=srv.httpd.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.stop()


def _get(srv, path, timeout=10):
    return urllib.request.urlopen(
        f"http://127.0.0.1:{srv.port}{path}", timeout=timeout)


def test_page_and_frame(server):
    assert b"pointerLock" in _get(server, "/").read()
    server.render_one()
    jpeg = _get(server, "/frame").read()
    assert jpeg[:2] == b"\xff\xd8"  # JPEG SOI


def test_stream_delivers_frames(server):
    server.render_one()
    resp = _get(server, "/stream")
    assert "multipart/x-mixed-replace" in resp.headers["Content-Type"]
    # One more frame must arrive over the stream.
    threading.Timer(0.2, server.render_one).start()
    head = resp.fp.read(40)
    assert b"--frame" in head


def test_input_events_drive_keyboard(server):
    def post(obj):
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/input",
            data=json.dumps(obj).encode(), method="POST")
        urllib.request.urlopen(req, timeout=10)

    post({"key": ["w", True], "capture": True})
    post({"mouse": [3.0, 1.0]})
    kb = server.loop.keyboard
    assert kb.mouse_captured
    inp = kb.update_input(server.loop.input)
    assert inp.up == 1.0
    assert inp.mouse != (0.0, 0.0)
    # Moving forward changes the frame.
    f0 = server.render_one().copy()
    f1 = server.render_one()
    assert (f0 != f1).any()


def test_encode_jpeg_roundtrip():
    pixels = np.full((8, 8), 0x00FF0000, np.uint32)  # red
    jpeg = encode_jpeg(pixels, quality=95)
    from PIL import Image
    import io
    arr = np.asarray(Image.open(io.BytesIO(jpeg)))
    assert arr.shape == (8, 8, 3)
    assert arr[..., 0].mean() > 200 and arr[..., 1].mean() < 60
