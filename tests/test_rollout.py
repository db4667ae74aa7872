"""Rollout engine invariants + frame-semantics tests (SURVEY.md section 4
items 3-4; reference pipeline SphFluidSimulation.cs:96-108)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from sphfluidsimulation_tpu.config import SimConfig
from sphfluidsimulation_tpu.models.scene import Scene
from sphfluidsimulation_tpu.sim.stepper import (
    initial_state,
    make_frame_step,
    make_rollout,
)

CFG = SimConfig(particle_number=1024, bucket_resolution=11)


def test_positions_stay_in_unit_cube():
    # clamp at VelPos.compute:154; holds from the first frame on
    scene = Scene(CFG)
    scene.step(5)
    pos = np.asarray(scene.state.pos)
    assert pos.min() >= 0.0 and pos.max() <= 1.0


def test_no_nans_in_state():
    scene = Scene(CFG)
    scene.step(10)
    assert np.all(np.isfinite(np.asarray(scene.state.pos)))
    assert np.all(np.isfinite(np.asarray(scene.state.vel)))


def test_mass_conservation():
    # N never changes; make_state carries exactly n particles
    scene = Scene(CFG)
    n0 = scene.state.pos.shape[0]
    scene.step(3)
    assert scene.state.pos.shape[0] == n0 == CFG.n_particles


def test_scan_rollout_matches_python_loop():
    state0 = initial_state(CFG)
    step = jax.jit(make_frame_step(CFG))
    s = state0
    for _ in range(4):
        s, m = step(s)
    rollout = make_rollout(CFG, 4)
    final, metrics = rollout(state0)
    np.testing.assert_allclose(np.asarray(final.pos), np.asarray(s.pos),
                               atol=1e-6)
    assert metrics.max_speed.shape == (4,)


def test_faithful_vs_corrected_differ():
    # faithful mode reuses frame-start bucket+density over 5 substeps
    # (SphFluidSimulation.cs:98-102); corrected mode rebuilds per substep —
    # the trajectories must diverge.
    state0 = initial_state(CFG)
    f = jax.jit(make_frame_step(CFG, faithful=True))
    c = jax.jit(make_frame_step(CFG, faithful=False))
    sf, _ = f(state0)
    sc, _ = c(state0)
    sf, _ = f(sf)
    sc, _ = c(sc)
    assert float(jnp.max(jnp.abs(sf.pos - sc.pos))) > 1e-7


def test_brute_and_grid_rollouts_agree():
    # end-to-end: 3 frames through both neighbor backends stay close
    # (they see identical candidate sets; only summation order differs)
    state0 = initial_state(CFG)
    g = jax.jit(make_frame_step(CFG, neighbor="slotted"))
    b = jax.jit(make_frame_step(CFG, neighbor="brute"))
    sg, sb = state0, state0
    for _ in range(3):
        sg, _ = g(sg)
        sb, _ = b(sb)
    np.testing.assert_allclose(np.asarray(sg.pos), np.asarray(sb.pos),
                               atol=5e-4)


def test_metrics_populated():
    scene = Scene(CFG)
    scene.step()
    m = scene.last_metrics
    assert float(m.mean_density) > 0
    assert float(m.kinetic_energy) >= 0
    assert int(m.nan_events) >= 0
    assert int(m.overflow) >= 0


def test_snapshots():
    rollout = make_rollout(CFG, 3, snapshot_every=1)
    final, metrics, snaps = rollout(initial_state(CFG))
    assert snaps.shape == (3, CFG.n_particles, 3)
    np.testing.assert_allclose(np.asarray(snaps[-1]), np.asarray(final.pos))


def test_snapshots_every_n():
    # every-N keeps frames N-1, 2N-1, ... and matches the every-1 frames
    r1 = make_rollout(CFG, 4, snapshot_every=1)
    r2 = make_rollout(CFG, 4, snapshot_every=2)
    st = initial_state(CFG)
    _, m1, s1 = r1(st)
    final2, m2, s2 = r2(st)
    assert s2.shape == (2, CFG.n_particles, 3)
    np.testing.assert_array_equal(np.asarray(s2[0]), np.asarray(s1[1]))
    np.testing.assert_array_equal(np.asarray(s2[1]), np.asarray(s1[3]))
    np.testing.assert_array_equal(np.asarray(m2.max_speed),
                                  np.asarray(m1.max_speed))
    with pytest.raises(ValueError):
        make_rollout(CFG, 3, snapshot_every=2)


def test_deterministic_rollout():
    a = Scene(CFG); a.step(4)
    b = Scene(CFG); b.step(4)
    np.testing.assert_array_equal(np.asarray(a.state.pos),
                                  np.asarray(b.state.pos))


def test_dt_schedule_rollout_matches_per_frame_stepping():
    # Faithful variable-dt mode (SphFluidSimulation.cs:101-102: substep dt
    # is Time.deltaTime/25, frame-rate-dependent). Rolling a non-constant
    # recorded dt trace must reproduce stepping frame-by-frame with per-call
    # PhysParams carrying each frame's dt. Tolerance, not bit-equality,
    # across the two COMPILATIONS: XLA re-fuses the substep chain
    # differently inside a frame-scan body than in a standalone jit (the
    # same 1-ulp class documented for scan_unroll, stepper.py) — the
    # bitwise contract that does hold is split-trace resume, pinned below.
    from sphfluidsimulation_tpu.params import PhysParams
    from sphfluidsimulation_tpu.sim.stepper import (make_dt_rollout,
                                                    make_param_step)

    state0 = initial_state(CFG)
    # a jittery 120-480 FPS trace (calm enough that the golden EOS does
    # not explode, so velocity magnitudes stay comparable)
    dts = np.array([1 / 240, 1 / 120, 1 / 360, 1 / 180, 1 / 480, 1 / 240],
                   np.float32)

    roll = make_dt_rollout(CFG, len(dts))
    final, metrics = roll(state0, jnp.asarray(dts))

    step = jax.jit(make_param_step(CFG))
    base = PhysParams.from_config(CFG)
    s = state0
    for dt in dts:
        s, _ = step(s, base._replace(
            dt=jnp.float32(dt) / jnp.float32(CFG.substep_divisor)))

    np.testing.assert_allclose(np.asarray(final.pos), np.asarray(s.pos),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(final.vel), np.asarray(s.vel),
                               rtol=1e-4, atol=1e-4)
    assert metrics.max_speed.shape == (len(dts),)


def test_dt_schedule_split_trace_is_bit_equal():
    # Resume property: rolling a 6-frame dt trace in one call is BIT-EQUAL
    # to rolling 3 + 3 with the final state carried across — the scan body
    # is one compiled computation regardless of trip count, so recorded
    # traces can be replayed in checkpointed chunks without drift.
    from sphfluidsimulation_tpu.sim.stepper import make_dt_rollout

    state0 = initial_state(CFG)
    dts = np.array([1 / 60, 1 / 30, 1 / 90, 1 / 45, 1 / 120, 1 / 60],
                   np.float32)
    f6, _ = make_dt_rollout(CFG, 6)(state0, jnp.asarray(dts))
    r3 = make_dt_rollout(CFG, 3)
    mid, _ = r3(state0, jnp.asarray(dts[:3]))
    f33, _ = r3(mid, jnp.asarray(dts[3:]))
    np.testing.assert_array_equal(np.asarray(f6.pos), np.asarray(f33.pos))
    np.testing.assert_array_equal(np.asarray(f6.vel), np.asarray(f33.vel))


def test_dt_schedule_constant_matches_fixed_rollout():
    # a constant schedule at the config's frame_dt reproduces the fixed-dt
    # rollout (ulp-class tolerance: the fixed rollout bakes dt as an XLA
    # constant, the dt rollout traces it — folding differs)
    from sphfluidsimulation_tpu.sim.stepper import make_dt_rollout

    state0 = initial_state(CFG)
    n = 4
    roll_fixed = make_rollout(CFG, n)
    f1, _ = roll_fixed(state0)
    roll_dt = make_dt_rollout(CFG, n)
    f2, _ = roll_dt(state0, jnp.full((n,), CFG.frame_dt, jnp.float32))
    np.testing.assert_allclose(np.asarray(f1.pos), np.asarray(f2.pos),
                               atol=2e-6)
