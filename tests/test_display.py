"""Display film: tonemapped progressive preview + HTTP live viewer.

Covers the reference's display film role (films/display.cpp:16-95):
tone-mapped presentation of the accumulating frame at a paced rate. The
swapchain window is realized as an HTTP endpoint (films/live_server.py).
"""

import json
import urllib.request

import numpy as np

import luisarender_tpu as lr
from luisarender_tpu import testing


def _scene(tmp_path, extra):
    d = testing.cornell_box(resolution=(16, 16), spp=4, depth=2)
    cam = d["render"]["cameras"][0]["prop"]
    cam["film"] = {
        "impl": "display",
        "prop": {
            "resolution": [16, 16],
            "tone_mapping": "aces",
            "preview_file": str(tmp_path / "preview.png"),
            "target_fps": 1000.0,  # every pass
            **extra,
        },
    }
    return d


def test_preview_png_written(tmp_path):
    d = _scene(tmp_path, {})
    out = lr.render(lr.Scene.from_dict(d))
    img = next(iter(out.values()))
    assert np.isfinite(img).all()
    p = tmp_path / "preview.png"
    assert p.exists()
    assert p.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"


def test_live_server_serves_frames(tmp_path):
    d = _scene(tmp_path, {"serve": True, "port": 0})  # ephemeral port
    scene = lr.Scene.from_dict(d)
    lr.render(scene)
    film = scene.cameras[0].film
    assert film._server is not None
    port = film._server.port

    page = urllib.request.urlopen(
        f"http://127.0.0.1:{port}/", timeout=10
    ).read()
    assert b"luisarender_tpu live" in page

    frame = urllib.request.urlopen(
        f"http://127.0.0.1:{port}/frame.png", timeout=10
    ).read()
    assert frame[:8] == b"\x89PNG\r\n\x1a\n"

    stats = json.loads(urllib.request.urlopen(
        f"http://127.0.0.1:{port}/stats.json", timeout=10
    ).read())
    assert stats["frame"] >= 1
    assert stats["spp"] >= 1
    film._server.close()
