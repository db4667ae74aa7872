"""Slab decomposition × Pallas tier: sharded step equals single-device.

Runs on the virtual 8-device CPU mesh (conftest). The calm config keeps
per-frame drift <= 1 cell, so the exactness certificate must stay 0 and
the decomposed trajectory must match the single-device fused-pallas path
to float tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from sphfluidsimulation_tpu.config import SimConfig
from sphfluidsimulation_tpu.params import PhysParams
from sphfluidsimulation_tpu.parallel import slab, slab_pallas
from sphfluidsimulation_tpu.sim.stepper import initial_state, make_param_step

CALM = SimConfig(particle_number=1024, bucket_resolution=11, preset=0,
                 gas_constant=20.0, rest_density=1.7, viscosity=0.05,
                 stiffness_coefficient=1000.0, frame_dt=1 / 240)


def _mesh(n_dev):
    return Mesh(np.array(jax.devices()[:n_dev]), ("sp",))


@pytest.mark.slow
@pytest.mark.parametrize("n_dev", [2, 8])
def test_slab_pallas_matches_single_device(n_dev):
    mesh = _mesh(n_dev)
    step, spec = slab_pallas.make_pallas_slab_step(CALM, mesh,
                                                   row_slack=4.0)
    step = jax.jit(step)
    phys = PhysParams.from_config(CALM)
    state0 = initial_state(CALM)
    sst = slab.distribute(state0, CALM, spec, mesh)

    ref_step = jax.jit(make_param_step(CALM, neighbor="pallas"))
    ref = state0
    for _ in range(3):
        sst, m = step(sst, phys)
        ref, mr = ref_step(ref, phys)
    assert int(m.exact_cert) == 0
    assert int(m.overflow) == int(mr.overflow)

    out, lost = slab.collect(sst, CALM.n_particles)
    assert lost == 0
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.vel), np.asarray(ref.vel),
                               atol=2e-4)
    np.testing.assert_array_equal(np.asarray(out.nan_count),
                                  np.asarray(ref.nan_count))


@pytest.mark.slow
def test_slab_pallas_memory_is_local_by_shape():
    """O(N/D + halo) per device: the spec's static shapes — no global-N
    or R³ arrays exist inside the sharded step (the banded frame tables
    are (slab_z + 2·halo)·R² + 1)."""
    n_dev = 8
    spec = slab_pallas.make_pallas_spec(CALM, n_dev, row_slack=2.0)
    r = CALM.bucket_resolution
    assert spec.z_span == spec.slab_z + 2 * spec.halo
    assert spec.z_span < r
    assert spec.cap_rows < CALM.n_particles
    # local cell-table size strictly below the global R³
    assert spec.z_span * r * r < r ** 3


@pytest.mark.slow
def test_slab_pallas_extensions_match_single_device():
    cfg = CALM.replace(xsph=0.1, artificial_viscosity=0.05)
    mesh = _mesh(4)
    step, spec = slab_pallas.make_pallas_slab_step(cfg, mesh,
                                                   row_slack=4.0)
    step = jax.jit(step)
    phys = PhysParams.from_config(cfg)
    state0 = initial_state(cfg)
    sst = slab.distribute(state0, cfg, spec, mesh)
    ref_step = jax.jit(make_param_step(cfg, neighbor="pallas"))
    ref = state0
    for _ in range(2):
        sst, m = step(sst, phys)
        ref, _ = ref_step(ref, phys)
    out, lost = slab.collect(sst, cfg.n_particles)
    assert lost == 0 and int(m.exact_cert) == 0
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                               atol=2e-5)


@pytest.mark.slow
@pytest.mark.parametrize("n_dev", [2, 8])
def test_slab_pallas_compact_matches_single_device(n_dev):
    """The v7 compact-lane kernel composed with the slab decomposition:
    banded stale/fresh spans, per-band start-slice DMA, owner halo
    overwrite — must reproduce the single-device compact path with
    cert 0 on the calm config."""
    from sphfluidsimulation_tpu.ops.pallas_sph import PallasTuning

    tune = PallasTuning(fused=True, compact=True)
    mesh = _mesh(n_dev)
    step, spec = slab_pallas.make_pallas_slab_step(CALM, mesh,
                                                   row_slack=4.0,
                                                   tune=tune)
    step = jax.jit(step)
    phys = PhysParams.from_config(CALM)
    state0 = initial_state(CALM)
    sst = slab.distribute(state0, CALM, spec, mesh)

    ref_step = jax.jit(make_param_step(CALM, neighbor="pallas",
                                       pallas_tune=tune))
    ref = state0
    for _ in range(3):
        sst, m = step(sst, phys)
        ref, mr = ref_step(ref, phys)
    assert int(m.exact_cert) == 0
    assert int(mr.exact_cert) == 0
    assert int(m.overflow) == int(mr.overflow)

    out, lost = slab.collect(sst, CALM.n_particles)
    assert lost == 0
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.vel), np.asarray(ref.vel),
                               atol=2e-4)
