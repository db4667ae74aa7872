"""Spawn preset lattice math vs hand-evaluated reference formulas
(InitParticles.compute:10-107)."""

import numpy as np
import pytest

from sphfluidsimulation_tpu.config import SimConfig
from sphfluidsimulation_tpu.models import presets


def test_lattice_sizes_preset1():
    # n = 4096, fill = 0.8 (InitParticles.compute:20-24):
    # ppd = ceil((4096/0.8)^(1/3)) = ceil(17.23) = 18
    x, y, z, cube = presets._lattice_sizes(4096, 0.8, squared_fill=False)
    assert (x, y, z) == (np.ceil(18 * 0.8), 18, 18) == (15, 18, 18)
    assert cube == pytest.approx(1.0 / 18.0)


def test_lattice_sizes_preset2():
    # squared fill (InitParticles.compute:53-57):
    # ppd = ceil((4096/0.64)^(1/3)) = ceil(18.566) = 19
    x, y, z, cube = presets._lattice_sizes(4096, 0.8, squared_fill=True)
    assert (x, y, z) == (16, 19, 16)
    assert cube == pytest.approx(1.0 / 19.0)


def test_preset1_lattice_positions():
    # first particle sits at cube/2 on each axis plus scalar noise; verify
    # the un-jittered lattice by subtracting the (equal-components) jitter.
    pos = np.asarray(presets.preset1(4096, 0.8))
    assert pos.shape == (4096, 3)
    # jitter is a SCALAR added to all components (InitParticles.compute:37),
    # so pos - lattice must have equal x/y/z residuals.
    x_size, y_size, z_size, cube = presets._lattice_sizes(4096, 0.8, False)
    i = np.arange(4096)
    xi = (i // (z_size * y_size)).astype(np.float32)
    yi = ((i // z_size) % y_size).astype(np.float32)
    zi = (i % z_size).astype(np.float32)
    lattice = np.stack([
        cube / 2 + xi * 0.8 / x_size,
        cube / 2 + yi * 0.9 / y_size,
        cube / 2 + zi * 1.0 / z_size,
    ], -1).astype(np.float32)
    resid = pos - lattice
    np.testing.assert_allclose(resid[:, 0], resid[:, 1], atol=1e-5)
    np.testing.assert_allclose(resid[:, 0], resid[:, 2], atol=1e-5)
    assert np.max(np.abs(resid)) <= cube * 1.05  # |snoise| <~ 1.01


def test_preset2_centering_offset():
    # preset2 adds fill/2 to x and z but NOT y (InitParticles.compute:63-67)
    p2 = np.asarray(presets.preset2(4096, 0.8))
    p3 = np.asarray(presets.preset3(4096, 0.8))
    # same lattice/noise except the offset; but the noise input includes pos,
    # so compare lattice-only via the *minimum* positions
    assert p2[:, 0].min() > p3[:, 0].min() + 0.3   # shifted by 0.4
    assert p2[:, 2].min() > p3[:, 2].min() + 0.3


def test_preset_dispatch_mapping():
    # config preset field == kernel index (SphFluidSimulation.cs:182-184)
    cfg = SimConfig(particle_number=1024, preset=0)
    p = np.asarray(presets.init_positions(cfg))
    expected = np.asarray(presets.preset1(cfg.n_particles, cfg.dam_fill_rate, 0))
    np.testing.assert_array_equal(p, expected)


@pytest.mark.slow
def test_no_duplicate_spawns():
    pos = np.asarray(presets.preset2(4096, 0.8))
    d = pos[:, None, :] - pos[None, :, :]
    r = np.sqrt((d * d).sum(-1)) + np.eye(4096) * 1e9
    assert r.min() > 1e-4


def test_seed_changes_jitter():
    a = np.asarray(presets.preset2(1024, 0.8, seed=0))
    b = np.asarray(presets.preset2(1024, 0.8, seed=1))
    assert np.max(np.abs(a - b)) > 1e-4
