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


# The reference's default physics at small N is violently unstable (the
# golden EOS with near-zero densities drives inf velocities — faithful
# behavior, SURVEY.md §3); these tests pin the slab tier's loud-not-wrong
# contract (slab_pallas.py module docstring) under that violence and under
# deliberately starved capacities: degradation must always land in the
# exactness certificate / loss counters, never in silent wrong values.
# Default preset (1) at this size explodes on frame 0 (max_speed ~9e15).
VIOLENT = SimConfig(particle_number=4096, bucket_resolution=17)


def _own_rows_bounded(sst):
    """Every valid row holds finite, clamped positions (VelPos.compute's
    NaN trap + wall clamp survive the decomposition)."""
    pos = np.asarray(sst.pos)
    valid = np.asarray(sst.valid)
    p = pos[valid]
    assert np.isfinite(p).all()
    assert p.min() >= 0.0 and p.max() <= 1.0


@pytest.mark.slow
def test_slab_pallas_violent_degrades_certified():
    """Exploding config on 4 slabs: inf velocities clamp particles across
    the whole box within a substep, so fresh drift exceeds the ±1-z-plane
    halo contract — the certificate MUST fire (loud), while positions stay
    finite and in [0,1]^3 (not wrong) and every particle stays accounted
    for (valid or counted lost)."""
    mesh = _mesh(4)
    step, spec = slab_pallas.make_pallas_slab_step(VIOLENT, mesh,
                                                   row_slack=4.0)
    step = jax.jit(step)
    phys = PhysParams.from_config(VIOLENT)
    sst = slab.distribute(initial_state(VIOLENT), VIOLENT, spec, mesh)

    ref_step = jax.jit(make_param_step(VIOLENT, neighbor="pallas"))
    ref = initial_state(VIOLENT)
    certs, ref_certs = [], []
    for f in range(4):
        sst, m = step(sst, phys)
        ref, mr = ref_step(ref, phys)
        certs.append(int(m.exact_cert))
        ref_certs.append(int(mr.exact_cert))
        _own_rows_bounded(sst)
        if f == 0:
            # first frame from identical state: the decomposed walk's
            # metrics agree with the single-device tier's (divergence
            # afterwards is allowed ONLY because both are certified)
            np.testing.assert_allclose(float(m.max_speed),
                                       float(mr.max_speed), rtol=1e-5)

    # loud: the decomposition's drift/trunc counters fire under violence
    # on the very first frame (the single-device tier's do too — both
    # walks are certified inexact, never silently wrong)
    assert certs[0] > 0 and min(certs) > 0
    assert ref_certs[0] > 0
    # accounted: every particle is either a valid row somewhere or counted
    # into collect's loss (certified drops) — never silently vanished
    out, lost = slab.collect(sst, VIOLENT.n_particles)
    n_valid = int(np.asarray(sst.valid).sum())
    assert n_valid + lost == VIOLENT.n_particles
    p = np.asarray(out.pos)
    assert np.isfinite(p).all() and p.min() >= 0.0 and p.max() <= 1.0


@pytest.mark.slow
def test_slab_pallas_halo_starvation_is_certified():
    """Starved halo-row capacity on the CALM config (where the well-sized
    run is pinned cert-0 above): the boundary-row drops MUST land in the
    certificate — capacity pressure is loud, not silent."""
    mesh = _mesh(4)
    step, spec = slab_pallas.make_pallas_slab_step(CALM, mesh,
                                                   row_slack=4.0,
                                                   halo_slack=0.001)
    assert spec.halo_cap == 128  # the floor: genuinely starved
    step = jax.jit(step)
    phys = PhysParams.from_config(CALM)
    sst = slab.distribute(initial_state(CALM), CALM, spec, mesh)
    sst, m = step(sst, phys)
    assert int(m.exact_cert) > 0  # dn_drop/up_drop reach the certificate
    _own_rows_bounded(sst)


@pytest.mark.slow
def test_slab_pallas_migration_overflow_is_certified():
    """Starved per-device row capacity under an adversarial placement:
    every row belongs to slab 0, so the frame-start migration ring must
    deliver 4×128 rows into a 128-row buffer — the overflow is _migrate's
    in-flight loss path (distribute() raises host-side instead; its
    docstring names the lost counter as the in-flight equivalent). The
    loss MUST reach the certificate and collect()'s accounting, and the
    surviving rows stay bounded."""
    from sphfluidsimulation_tpu.parallel.slab import SlabState

    mesh = _mesh(4)
    step, spec = slab_pallas.make_pallas_slab_step(CALM, mesh,
                                                   row_slack=0.5)
    c = spec.cap_rows
    assert c < CALM.n_particles // 2
    n = 4 * c
    rng = np.random.RandomState(7)
    pos = np.empty((n, 3), np.float32)
    pos[:, 0] = rng.uniform(0.1, 0.9, n)
    pos[:, 1] = rng.uniform(0.1, 0.9, n)
    # stale z-plane in 0..slab_z-1 → every row is owned by device 0
    pos[:, 2] = rng.uniform(0.05, (spec.slab_z - 1) /
                            (CALM.bucket_resolution - 1), n)
    sst = jax.tree.map(
        lambda x: jax.device_put(
            x, jax.NamedSharding(mesh, jax.sharding.PartitionSpec("sp"))),
        SlabState(pos=jnp.asarray(pos), vel=jnp.zeros((n, 3), jnp.float32),
                  nan_count=jnp.zeros(n, jnp.int32),
                  pid=jnp.arange(n, dtype=jnp.int32),
                  valid=jnp.ones(n, bool)))

    step = jax.jit(step)
    sst, m = step(sst, PhysParams.from_config(CALM))
    _own_rows_bounded(sst)
    out, lost = slab.collect(sst, n)
    n_valid = int(np.asarray(sst.valid).sum())
    assert n_valid + lost == n
    assert lost > 0                      # the 128-row buffer overflowed
    assert int(m.exact_cert) >= lost     # every lost row is certified
