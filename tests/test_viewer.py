"""Interactive viewer export (render/viewer.py — the reference's live
orbit-camera view, SphFluidSimulation.cs:106-107 + CameraOrbit.cs:31-74,
as a standalone WebGL file)."""

import base64
import json
import re

import numpy as np

from sphfluidsimulation_tpu.render.viewer import export_html_viewer


def test_viewer_embeds_quantized_rollout(tmp_path):
    rng = np.random.default_rng(0)
    snaps = rng.uniform(0, 1, (4, 100, 3)).astype(np.float32)
    speeds = rng.uniform(0, 1, (4, 100)).astype(np.float32)
    out = str(tmp_path / "v.html")
    export_html_viewer(out, snaps, speeds, sim_scale=5.0)
    html = open(out).read()
    meta = json.loads(re.search(r"const META = (\{.*?\});", html).group(1))
    assert meta["frames"] == 4 and meta["n"] == 100 and meta["hasSpeed"]
    pos_b64 = re.search(r'decode\("([A-Za-z0-9+/=]*)"\).buffer', html)
    raw = base64.b64decode(pos_b64.group(1))
    q = np.frombuffer(raw, "<u2").reshape(4, 100, 3)
    np.testing.assert_allclose(q / 65535.0, snaps, atol=1.0 / 65535)
    # self-contained: no external references
    assert "http://" not in html and "https://" not in html
    assert "webgl" in html


def test_viewer_via_cli(tmp_path):
    from sphfluidsimulation_tpu.cli import main

    out = str(tmp_path / "run.html")
    rc = main(["run", "--particles", "256", "--bucket-resolution", "7",
               "--gas-constant", "1.0", "--neighbor", "slotted",
               "--frames", "3", "--viewer", out])
    assert rc == 0
    html = open(out).read()
    meta = json.loads(re.search(r"const META = (\{.*?\});", html).group(1))
    assert meta["frames"] == 3 and meta["n"] == 256


def test_viewer_rejects_bad_shape(tmp_path):
    import pytest

    with pytest.raises(ValueError):
        export_html_viewer(str(tmp_path / "x.html"),
                           np.zeros((4, 3), np.float32))


def test_viewer_live_mode(tmp_path):
    """run --viewer-live K: the in-progress rewrites carry an auto-refresh
    tag and start playback at the newest frame (the reference's
    draw-while-simulating view, SphFluidSimulation.cs:106-107); the final
    write is the plain static file."""
    rng = np.random.default_rng(1)
    snaps = rng.uniform(0, 1, (3, 64, 3)).astype(np.float32)
    out = str(tmp_path / "live.html")
    export_html_viewer(out, snaps, refresh_s=2.0)
    html = open(out).read()
    assert 'http-equiv="refresh" content="2"' in html
    meta = json.loads(re.search(r"const META = (\{.*?\});", html).group(1))
    assert meta["live"] is True

    from sphfluidsimulation_tpu.cli import main
    rc = main(["run", "--particles", "256", "--bucket-resolution", "7",
               "--gas-constant", "1.0", "--neighbor", "slotted",
               "--frames", "3", "--viewer", out, "--viewer-live", "1"])
    assert rc == 0
    html = open(out).read()  # final write: static, no refresh
    assert "http-equiv" not in html
    meta = json.loads(re.search(r"const META = (\{.*?\});", html).group(1))
    assert meta["live"] is False and meta["frames"] == 3
