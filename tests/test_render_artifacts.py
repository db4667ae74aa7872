"""Animation assembly and mesh-instanced export (reference render parity:
the moving fluid of SphFluidSimulation.cs:106-107 and the octasphere
instancing of OctahedronSphereCreator.cs:14)."""

import os

import numpy as np

from sphfluidsimulation_tpu.render.export import (
    _read_png_rgb, _save_apng, assemble_animation, save_instanced_mesh_ply,
    save_png)


def _frames(tmp_path, n=3, size=16):
    paths = []
    for i in range(n):
        img = np.full((size, size, 3), i * 40, np.uint8)
        img[i, :, 0] = 255
        p = str(tmp_path / f"frame_{i:05d}.png")
        save_png(p, img)
        paths.append(p)
    return paths


def test_png_roundtrip(tmp_path):
    img = (np.arange(16 * 16 * 3, dtype=np.uint32) % 251).astype(
        np.uint8).reshape(16, 16, 3)
    p = str(tmp_path / "x.png")
    save_png(p, img)
    assert (_read_png_rgb(p) == img).all()


def test_assemble_animation_gif(tmp_path):
    paths = _frames(tmp_path)
    out = assemble_animation(paths, str(tmp_path / "anim.gif"), fps=10)
    with open(out, "rb") as f:
        assert f.read(6) in (b"GIF87a", b"GIF89a")


def test_assemble_animation_apng(tmp_path):
    paths = _frames(tmp_path)
    out = _save_apng(paths, str(tmp_path / "anim.png"), fps=10)
    data = open(out, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"acTL" in data and b"fcTL" in data and b"fdAT" in data


def test_instanced_mesh_ply(tmp_path):
    pos = np.array([[0.25, 0.5, 0.5], [0.75, 0.5, 0.5]], np.float32)
    col = np.array([[1.0, 0, 0], [0, 0, 1.0]], np.float32)
    p = str(tmp_path / "mesh.ply")
    save_instanced_mesh_ply(p, pos, col, sim_scale=5.0, particle_radius=0.01)
    text = open(p).read()
    lines = text.splitlines()
    n_verts = int([x for x in lines if x.startswith("element vertex")][0]
                  .split()[-1])
    n_faces = int([x for x in lines if x.startswith("element face")][0]
                  .split()[-1])
    assert n_verts % 2 == 0 and n_faces % 2 == 0
    per = n_verts // 2
    # instance centroids land at the reference world transform
    # (UpdateMeshProperties.compute:34-40): pos·simScale − simScale/2
    body = lines[lines.index("end_header") + 1:]
    verts = np.array([[float(v) for v in row.split()[:3]]
                      for row in body[:n_verts]], np.float32)
    c0 = verts[:per].mean(axis=0)
    np.testing.assert_allclose(c0, pos[0] * 5.0 - 2.5, atol=1e-3)
    # all instance-0 vertices within particle_radius·simScale of centroid
    assert np.linalg.norm(verts[:per] - c0, axis=1).max() <= 0.0501


def test_cli_export_mesh(tmp_path):
    import jax.numpy as jnp

    from sphfluidsimulation_tpu.cli import main
    from sphfluidsimulation_tpu.config import SimConfig
    from sphfluidsimulation_tpu.state import make_state
    from sphfluidsimulation_tpu.utils.checkpoint import save_checkpoint

    cfg = SimConfig(particle_number=1024, bucket_resolution=9)
    state = make_state(jnp.full((cfg.n_particles, 3), 0.5))
    ck = str(tmp_path / "ck.npz")
    save_checkpoint(ck, state, cfg, frame=1)
    mesh = str(tmp_path / "mesh.ply")
    assert main(["export", ck, "--ply-mesh", mesh]) == 0
    assert os.path.exists(mesh)


def test_alpha_blended_splat(tmp_path):
    """Translucent colors composite (SrcAlpha/OneMinusSrcAlpha,
    InstancedIndirectColor.shader:6): a half-alpha particle over the
    background must land strictly between both colors."""
    import numpy as np
    from sphfluidsimulation_tpu.render.export import render_frame_png

    pos = np.array([[0.5, 0.5, 0.5]], np.float32)
    col = np.array([[1.0, 0.0, 0.0, 0.5]], np.float32)
    img = render_frame_png(pos, col, width=64, height=64,
                           particle_radius=0.05, background=(0, 0, 0))
    reds = img[..., 0][img[..., 0] > 0]
    assert reds.size > 0
    assert 100 <= int(reds.max()) <= 140  # ~127 = 0.5 * 255 over black
    # opaque alpha must reproduce the plain painter path exactly
    img_opaque = render_frame_png(pos, col[:, :3], width=64, height=64,
                                  particle_radius=0.05, background=(0, 0, 0))
    assert int(img_opaque[..., 0].max()) == 255


def test_nan_marker_alpha():
    """NaN-trapped particles get the reference's 0.003 marker alpha
    (VelPos.compute:146) on the instance color; untouched particles keep
    alpha 1 (UpdateMeshProperties.compute:63)."""
    import jax.numpy as jnp
    import numpy as np
    from sphfluidsimulation_tpu.config import TINY_CONFIG
    from sphfluidsimulation_tpu.render.meshprops import (
        NAN_MARKER_ALPHA, RenderParams, mesh_properties, speed_colors)

    rp = RenderParams.from_config(TINY_CONFIG)
    vel = jnp.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]], jnp.float32)
    mask = jnp.array([True, False])
    col = np.asarray(speed_colors(vel, rp, nan_mask=mask))
    assert col[0, 3] == np.float32(NAN_MARKER_ALPHA)
    assert col[1, 3] == 1.0
    # flows through the MeshProperties buffer too
    pos = jnp.full((2, 3), 0.5, jnp.float32)
    _, col2 = mesh_properties(pos, vel, rp, nan_mask=mask)
    assert np.asarray(col2)[0, 3] == np.float32(NAN_MARKER_ALPHA)
    # and without a mask the channel stays constant 1 (reference behavior)
    col3 = np.asarray(speed_colors(vel, rp))
    assert (col3[:, 3] == 1.0).all()
