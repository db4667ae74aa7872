"""Config derivation rules (reference: SphFluidSimulation.cs:82-102,159,176)."""

import dataclasses

import pytest

from sphfluidsimulation_tpu.config import (
    GOLDEN_CONFIG,
    SimConfig,
    next_power_of_two,
)


def test_next_power_of_two():
    # Mathf.NextPowerOfTwo semantics (SphFluidSimulation.cs:84)
    assert next_power_of_two(1) == 1
    assert next_power_of_two(2) == 2
    assert next_power_of_two(3) == 4
    assert next_power_of_two(1000) == 1024
    assert next_power_of_two(262144) == 262144
    assert next_power_of_two(262145) == 524288


def test_golden_config_derivations():
    # Canonical scene (SampleScene.unity:362-376)
    c = GOLDEN_CONFIG
    assert c.particle_number_pow2 == 262144
    assert c.texture_resolution == 512          # (int)sqrt(2^18)  (cs:85)
    assert c.n_particles == 512 * 512
    assert c.effective_radius == pytest.approx(1.0 / 46.0)   # 1/(R-1) (cs:159)
    assert c.particle_mass == pytest.approx(0.8 / 262144)    # fill/N  (cs:176)
    assert c.substep_dt == pytest.approx((1.0 / 60.0) / 25.0)  # cs:102
    assert c.n_cells == 47 ** 3
    assert c.preset == 1  # scene 'preset: 1' selects kernel Preset2 (cs:182-184)


def test_nonsquare_pow2_truncates_to_res_squared():
    # 2048 -> res = int(sqrt(2048)) = 45 -> 2025 active particles: the
    # reference only dispatches res x res threads (cs:85,135).
    c = SimConfig(particle_number=2048)
    assert c.particle_number_pow2 == 2048
    assert c.texture_resolution == 45
    assert c.n_particles == 2025
    # mass divides the pow2 count, not the active count (cs:176)
    assert c.particle_mass == pytest.approx(0.8 / 2048)


def test_validate_rejects_bad_values():
    with pytest.raises(ValueError):
        SimConfig(preset=3).validate()
    with pytest.raises(ValueError):
        SimConfig(bucket_resolution=1).validate()
    with pytest.raises(ValueError):
        SimConfig(dam_fill_rate=0.001).validate()


def test_replace_and_roundtrip():
    c = SimConfig().replace(particle_number=4096)
    assert c.particle_number == 4096
    assert SimConfig.from_dict(c.as_dict()) == c
    with pytest.raises(dataclasses.FrozenInstanceError):
        c.viscosity = 0.5  # frozen
