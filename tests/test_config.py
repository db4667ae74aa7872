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


# Every reference inspector [Range] bound (SphFluidSimulation.cs:35-53),
# table-driven: for each field, a value just inside each end passes and a
# value just outside fails. bucket_resolution's low end and
# particle_number's low end deviate deliberately (documented in
# SimConfig.INSPECTOR_RANGES).
_EPS_CASES = [
    # (field, ok_lo, ok_hi, bad_lo, bad_hi)
    ("preset", 0, 2, -1, 3),                                    # cs:35
    ("particle_number", 1, 4194304, 0, 4194305),                # cs:36
    ("bucket_resolution", 2, 256, 1, 257),                      # cs:37
    ("dam_fill_rate", 0.01, 1.0, 0.009, 1.01),                  # cs:38
    ("viscosity", 0.0, 0.1, -1e-6, 0.11),                       # cs:41
    ("rest_density", 0.0, 5.0, -1e-6, 5.01),                    # cs:42
    ("gas_constant", 1.0, 5000.0, 0.99, 5001.0),                # cs:43
    ("stiffness_coefficient", 1000.0, 10000.0, 999.0, 10001.0),  # cs:44
    ("damping_coefficient", 1.0, 50.0, 0.99, 50.1),             # cs:45
    ("particle_radius", 0.001, 1.0, 0.0009, 1.01),              # cs:49
    ("low_speed", 0.0, 1000.0, -1e-6, 1000.1),                  # cs:52
    ("high_speed", 0.0, 1000.0, -1e-6, 1000.1),                 # cs:53
]


@pytest.mark.parametrize("field,ok_lo,ok_hi,bad_lo,bad_hi", _EPS_CASES)
def test_inspector_range_parity(field, ok_lo, ok_hi, bad_lo, bad_hi):
    assert SimConfig(**{field: ok_lo}).validate()
    assert SimConfig(**{field: ok_hi}).validate()
    with pytest.raises(ValueError):
        SimConfig(**{field: bad_lo}).validate()
    with pytest.raises(ValueError):
        SimConfig(**{field: bad_hi}).validate()


def test_inspector_ranges_cover_all_range_fields():
    # one row per [Range] attribute in the reference inspector block
    assert len(SimConfig.INSPECTOR_RANGES) == 12


def test_replace_and_roundtrip():
    c = SimConfig().replace(particle_number=4096)
    assert c.particle_number == 4096
    assert SimConfig.from_dict(c.as_dict()) == c
    with pytest.raises(dataclasses.FrozenInstanceError):
        c.viscosity = 0.5  # frozen
