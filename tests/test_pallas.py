"""Pallas fused-kernel backend vs the brute-force oracle.

Runs in interpret mode on CPU (ops/pallas_sph._interpret). The calm config
keeps per-frame cell drift <= 1 so the kernels' exactness certificate
(drift/clip counters, surfaced as StepMetrics.exact_cert) must stay 0
and trajectories must track the oracle to float-summation tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sphfluidsimulation_tpu.config import SimConfig
from sphfluidsimulation_tpu.params import PhysParams
from sphfluidsimulation_tpu.sim.stepper import initial_state, make_frame_step

CALM = SimConfig(particle_number=1024, bucket_resolution=11, preset=0,
                 gas_constant=20.0, rest_density=1.7, viscosity=0.05,
                 stiffness_coefficient=1000.0, frame_dt=1 / 240)
GOLDENISH = SimConfig(particle_number=1024, bucket_resolution=11)


def _cert(m):
    return int(m.exact_cert)


def _ovf(m):
    return int(m.overflow)


@pytest.mark.slow
def test_density_matches_brute_first_frame():
    st = initial_state(GOLDENISH)
    _, mp = jax.jit(make_frame_step(GOLDENISH, neighbor="pallas"))(st)
    _, mb = jax.jit(make_frame_step(GOLDENISH, neighbor="brute"))(st)
    assert float(mp.mean_density) == pytest.approx(float(mb.mean_density),
                                                   rel=1e-5)
    assert _ovf(mp) == int(mb.overflow)


@pytest.mark.slow
def test_calm_rollout_tracks_oracle_with_zero_cert():
    sp = sb = initial_state(CALM)
    pstep = jax.jit(make_frame_step(CALM, neighbor="pallas"))
    bstep = jax.jit(make_frame_step(CALM, neighbor="brute"))
    for _ in range(5):
        sp, mp = pstep(sp)
        sb, mb = bstep(sb)
    assert _cert(mp) == 0, "exactness certificate must hold on calm configs"
    np.testing.assert_allclose(np.asarray(sp.pos), np.asarray(sb.pos),
                               atol=5e-4)
    assert float(jnp.max(jnp.abs(sp.pos - sb.pos))) < 5e-4


@pytest.mark.slow
def test_forces_match_brute_at_frame_start():
    from sphfluidsimulation_tpu.models.presets import init_positions
    from sphfluidsimulation_tpu.ops import brute, pallas_sph
    from sphfluidsimulation_tpu.ops.grid import build_bucket

    cfg = GOLDENISH
    r, n = cfg.bucket_resolution, cfg.n_particles
    phys = PhysParams.from_config(cfg)
    pos = init_positions(cfg)
    rng = np.random.default_rng(0)
    vel = jnp.asarray(rng.normal(0, 0.2, (n, 3)), np.float32)

    bucket, _ = build_bucket(pos, r, 32)
    rho = brute.density_bruteforce(pos, bucket.cell_id, bucket.in_table,
                                   phys, r)
    f_b = brute.fluid_forces_bruteforce(pos, vel, rho, bucket.cell_id,
                                        bucket.in_table, phys, r)

    frame, (pos_s, vel_s, rho_s) = pallas_sph.build_frame(
        pos, r, 32, extras=(pos, vel, rho))
    f_s, _, drift = pallas_sph.forces_pallas(frame, pos_s, vel_s, rho_s,
                                             phys, r, n)
    f_p = jnp.zeros_like(f_s).at[frame.order].set(f_s)
    scale = np.abs(np.asarray(f_b)).max()
    np.testing.assert_allclose(np.asarray(f_p) / scale,
                               np.asarray(f_b) / scale, atol=1e-6)


@pytest.mark.slow
def test_pallas_deterministic():
    st = initial_state(CALM)
    step = jax.jit(make_frame_step(CALM, neighbor="pallas"))
    a, _ = step(st)
    b, _ = step(st)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))


def test_build_frame_semantics():
    from sphfluidsimulation_tpu.ops import pallas_sph
    from sphfluidsimulation_tpu.ops.grid import build_bucket

    rng = np.random.default_rng(3)
    pos = jnp.asarray(rng.uniform(0, 1, (512, 3)), np.float32)
    frame, _ = pallas_sph.build_frame(pos, 9, 4)
    bucket, _ = build_bucket(pos, 9, 4)
    # same particles dropped by capacity (in-cube: anchor == raw cells)
    occ_unsorted = np.zeros(512, bool)
    occ_unsorted[np.asarray(frame.order)] = np.asarray(frame.occ)
    np.testing.assert_array_equal(occ_unsorted, np.asarray(bucket.in_table))
    # sorted ids are nondecreasing
    assert bool(np.all(np.diff(np.asarray(frame.cid)) >= 0))


@pytest.mark.slow
def test_voxel_capacity_none_never_drops():
    # None disables the reference's capacity drop entirely: every in-cube
    # particle stays occupied (no silent substitute cap), and the dense
    # cluster's pallas densities match the uncapped brute oracle.
    from sphfluidsimulation_tpu.ops import pallas_sph
    from sphfluidsimulation_tpu.sim.stepper import make_frame_step

    rng = np.random.default_rng(7)
    # 256 particles crammed into one corner cell: far beyond any sane cap
    pos = jnp.asarray(rng.uniform(0, 0.05, (256, 3)), np.float32)
    frame, _ = pallas_sph.build_frame(pos, 9, None)
    assert bool(jnp.all(frame.occ))

    cfg = CALM.replace(voxel_capacity=None)
    st = initial_state(cfg)
    sp, mp = jax.jit(make_frame_step(cfg, neighbor="pallas"))(st)
    sb, mb = jax.jit(make_frame_step(cfg, neighbor="brute"))(st)
    assert int(mp.overflow) == 0 and int(mb.overflow) == 0
    assert int(mp.exact_cert) == 0
    np.testing.assert_allclose(np.asarray(sp.pos), np.asarray(sb.pos),
                               atol=1e-6)


def test_voxel_capacity_none_raises_on_slot_backends():
    cfg = CALM.replace(voxel_capacity=None)
    for nb in ("slotted", "gather"):
        with pytest.raises(ValueError):
            make_frame_step(cfg, neighbor=nb)


@pytest.mark.slow
def test_corrected_mode_matches_slotted():
    """faithful=False rebuilds frame+density per substep; on a calm config
    the pallas and slotted corrected trajectories must agree."""
    st = initial_state(CALM)
    pstep = jax.jit(make_frame_step(CALM, neighbor="pallas",
                                    faithful=False))
    sstep = jax.jit(make_frame_step(CALM, neighbor="slotted",
                                    faithful=False))
    sp, ss = st, st
    for _ in range(3):
        sp, mp = pstep(sp)
        ss, ms = sstep(ss)
    assert _cert(mp) == 0
    np.testing.assert_allclose(np.asarray(sp.pos), np.asarray(ss.pos),
                               atol=2e-6)
    assert float(mp.mean_density) == pytest.approx(
        float(ms.mean_density), rel=1e-5)


@pytest.mark.slow
def test_sorted_rollout_matches_per_frame_stepping():
    """The sorted-state rollout (no per-frame un-permute) must be BITWISE
    identical to stepping frame by frame through the generic path."""
    from sphfluidsimulation_tpu.sim.stepper import make_rollout

    st = initial_state(CALM)
    final, m = make_rollout(CALM, 3, neighbor="pallas")(st)
    step = jax.jit(make_frame_step(CALM, neighbor="pallas"))
    s = st
    for _ in range(3):
        s, _ = step(s)
    np.testing.assert_array_equal(np.asarray(final.pos), np.asarray(s.pos))
    np.testing.assert_array_equal(np.asarray(final.vel), np.asarray(s.vel))
    assert int(m.exact_cert.sum()) == 0


@pytest.mark.parametrize("ss", ["0", "1"])
@pytest.mark.slow
def test_big_grid_sort_based_interval_lookup(ss, monkeypatch):
    """r**3 > 2**14 qualifies for the sort-based searchsorted lookup in
    _line_intervals (opt-in, SPH_PALLAS_SS); both lookup paths must match
    brute."""
    monkeypatch.setenv("SPH_PALLAS_SS", ss)
    cfg = SimConfig(particle_number=2048, bucket_resolution=27, preset=0,
                    gas_constant=20.0, rest_density=1.7, viscosity=0.05,
                    stiffness_coefficient=1000.0, frame_dt=1 / 240)
    st = initial_state(cfg)
    sp, mp = jax.jit(make_frame_step(cfg, neighbor="pallas"))(st)
    sb, mb = jax.jit(make_frame_step(cfg, neighbor="brute"))(st)
    assert _cert(mp) == 0
    np.testing.assert_allclose(np.asarray(sp.pos), np.asarray(sb.pos),
                               atol=2e-6)
    assert float(mp.mean_density) == pytest.approx(float(mb.mean_density),
                                                   rel=1e-5)


def test_fused_substep_matches_unfused():
    """The fused kernel (forces + wall + gravity + NaN trap + Euler + clamp
    in one dispatch) must reproduce the v6 two-stage path: the in-kernel
    integrate tail repeats the same f32 op order as forces_pallas's XLA
    tail + integrate_substep. XLA fuses the two (mathematically identical)
    graphs differently, so single-rounding (half-ulp) divergence is
    allowed; a semantic bug (wrong wall term, dropped scaling) would blow
    far past the multi-frame tolerance here."""
    from sphfluidsimulation_tpu.ops.pallas_sph import PallasTuning
    from sphfluidsimulation_tpu.sim.stepper import make_param_step

    st_f = st_u = initial_state(CALM)
    phys = PhysParams.from_config(CALM)
    step_f = jax.jit(make_param_step(CALM, neighbor="pallas",
                                     pallas_tune=PallasTuning(fused=True)))
    step_u = jax.jit(make_param_step(CALM, neighbor="pallas",
                                     pallas_tune=PallasTuning(fused=False)))
    for _ in range(3):
        st_f, mf = step_f(st_f, phys)
        st_u, mu = step_u(st_u, phys)
    np.testing.assert_allclose(np.asarray(st_f.pos), np.asarray(st_u.pos),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_f.vel), np.asarray(st_u.vel),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(st_f.nan_count),
                                  np.asarray(st_u.nan_count))
    assert _cert(mf) == _cert(mu) == 0
    assert _ovf(mf) == _ovf(mu)


def test_fused_substep_matches_unfused_extensions():
    """Same equivalence with the XSPH + artificial-viscosity extension sums
    fused into the kernel (ops/extensions.py semantics)."""
    from sphfluidsimulation_tpu.ops.pallas_sph import PallasTuning
    from sphfluidsimulation_tpu.sim.stepper import make_param_step

    cfg = CALM.replace(xsph=0.1, artificial_viscosity=0.05)
    st = initial_state(cfg)
    phys = PhysParams.from_config(cfg)
    sf, mf = jax.jit(make_param_step(cfg, neighbor="pallas",
                                     pallas_tune=PallasTuning(fused=True))
                     )(st, phys)
    su, mu = jax.jit(make_param_step(cfg, neighbor="pallas",
                                     pallas_tune=PallasTuning(fused=False))
                     )(st, phys)
    np.testing.assert_allclose(np.asarray(sf.pos), np.asarray(su.pos),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sf.vel), np.asarray(su.vel),
                               atol=1e-6)
    assert _cert(mf) == _cert(mu)


@pytest.mark.slow
@pytest.mark.parametrize("fused", [True, False])
def test_fuse_acc_matches_separate_accumulators(fused):
    """``PallasTuning.fuse_acc``: pressure + viscosity share one
    accumulator triple via a PER-ROW viscosity fold (μ on the ρᵢ > ε
    scaled branch, exactly 1.0 on the raw branch — both branches
    reproduce the reference term-for-term). Same candidate set and
    per-pair term values as the separate-accumulator walk — only the
    summation/rounding order differs (~ULP), so a calm multi-frame
    rollout must track the separate-acc run to single-rounding tolerance
    with certificates unchanged. Spec: VelPos.compute:91-105."""
    from sphfluidsimulation_tpu.ops.pallas_sph import PallasTuning
    from sphfluidsimulation_tpu.sim.stepper import make_param_step

    st_a = st_b = initial_state(CALM)
    phys = PhysParams.from_config(CALM)
    step_a = jax.jit(make_param_step(
        CALM, neighbor="pallas",
        pallas_tune=PallasTuning(fused=fused, fuse_acc=True)))
    step_b = jax.jit(make_param_step(
        CALM, neighbor="pallas",
        pallas_tune=PallasTuning(fused=fused, fuse_acc=False)))
    for _ in range(3):
        st_a, ma = step_a(st_a, phys)
        st_b, mb = step_b(st_b, phys)
    np.testing.assert_allclose(np.asarray(st_a.pos), np.asarray(st_b.pos),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_a.vel), np.asarray(st_b.vel),
                               atol=1e-6)
    assert _cert(ma) == _cert(mb) == 0
    assert _ovf(ma) == _ovf(mb)


@pytest.mark.slow
def test_fuse_acc_matches_separate_accumulators_extensions():
    """fuse_acc with the XSPH + artificial-viscosity extension sums: the
    ext accumulators shift down to slots 3..8 but keep their own (raw)
    sums and outside-the-kernel constant folds."""
    from sphfluidsimulation_tpu.ops.pallas_sph import PallasTuning
    from sphfluidsimulation_tpu.sim.stepper import make_param_step

    cfg = CALM.replace(xsph=0.1, artificial_viscosity=0.05)
    st = initial_state(cfg)
    phys = PhysParams.from_config(cfg)
    sa, ma = jax.jit(make_param_step(
        cfg, neighbor="pallas",
        pallas_tune=PallasTuning(fused=True, fuse_acc=True)))(st, phys)
    sb, mb = jax.jit(make_param_step(
        cfg, neighbor="pallas",
        pallas_tune=PallasTuning(fused=True, fuse_acc=False)))(st, phys)
    np.testing.assert_allclose(np.asarray(sa.pos), np.asarray(sb.pos),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sa.vel), np.asarray(sb.vel),
                               atol=1e-6)
    assert _cert(ma) == _cert(mb)


@pytest.mark.slow
@pytest.mark.parametrize("cfg", [CALM, GOLDENISH],
                         ids=["calm", "goldenish"])
def test_intcell_membership_bit_identical(cfg):
    """``PallasTuning.intcell``: the digit-packed int membership test must
    gate EXACTLY like the f32 cell decode + 3-axis compare — positions,
    velocities, certificates and overflow all bit-identical, on both the
    calm config and the violent goldenish one (frame-0 jitter overshoot
    exercises aliased/out-of-range raw ids, Bucket.compute:27-29)."""
    from sphfluidsimulation_tpu.ops.pallas_sph import PallasTuning
    from sphfluidsimulation_tpu.sim.stepper import make_param_step

    st_a = st_b = initial_state(cfg)
    phys = PhysParams.from_config(cfg)
    step_a = jax.jit(make_param_step(
        cfg, neighbor="pallas", pallas_tune=PallasTuning(intcell=True)))
    step_b = jax.jit(make_param_step(
        cfg, neighbor="pallas", pallas_tune=PallasTuning(intcell=False)))
    for _ in range(2):
        st_a, ma = step_a(st_a, phys)
        st_b, mb = step_b(st_b, phys)
    np.testing.assert_array_equal(np.asarray(st_a.pos), np.asarray(st_b.pos))
    np.testing.assert_array_equal(np.asarray(st_a.vel), np.asarray(st_b.vel))
    np.testing.assert_array_equal(np.asarray(st_a.nan_count),
                                  np.asarray(st_b.nan_count))
    assert _cert(ma) == _cert(mb)
    assert _ovf(ma) == _ovf(mb)


@pytest.mark.slow
@pytest.mark.parametrize("cfg", [CALM, GOLDENISH],
                         ids=["calm", "goldenish"])
def test_pj_precomputed_window_tracks_in_kernel(cfg):
    """``PallasTuning.pj``: press_j and the guarded 1/ρⱼ ride the window
    precomputed in XLA. Same formulas and same candidate set, but the
    pre-rounded press_j removes an FMA-contraction opportunity the
    compiler takes in-kernel (press_i + k·(ρⱼ−ρ₀) fuses there), so
    results track at single-rounding (~ulp) tolerance rather than
    bit-exactly — the same deviation class as the banded-sites CPU
    pins (tests/test_sites.py). Certificates and coverage identical.
    Also composed with fuse_acc + intcell (the full measured stack)."""
    from sphfluidsimulation_tpu.ops.pallas_sph import PallasTuning
    from sphfluidsimulation_tpu.sim.stepper import make_param_step

    st_a = st_b = st_c = initial_state(cfg)
    phys = PhysParams.from_config(cfg)
    step_a = jax.jit(make_param_step(
        cfg, neighbor="pallas", pallas_tune=PallasTuning(pj=True)))
    step_b = jax.jit(make_param_step(
        cfg, neighbor="pallas", pallas_tune=PallasTuning(pj=False)))
    step_c = jax.jit(make_param_step(
        cfg, neighbor="pallas",
        pallas_tune=PallasTuning(pj=True, fuse_acc=True, intcell=True)))
    for _ in range(2):
        st_a, ma = step_a(st_a, phys)
        st_b, mb = step_b(st_b, phys)
        st_c, mc = step_c(st_c, phys)
    if cfg is CALM:
        np.testing.assert_allclose(np.asarray(st_a.pos),
                                   np.asarray(st_b.pos), atol=1e-6)
        np.testing.assert_allclose(np.asarray(st_a.vel),
                                   np.asarray(st_b.vel), atol=1e-6)
        # ulp-scale trajectory forks can flip frame-2 certificates on the
        # violent config, so the equality pins are calm-only
        assert _cert(ma) == _cert(mb)
        assert _ovf(ma) == _ovf(mb)
    # full stack: fuse_acc reorders sums (~ULP) — tolerance-comparable
    # only on the calm config (the violent one amplifies ulp reorders
    # through overflow coin-flips within a frame; running it above is the
    # crash/shape check)
    if cfg is CALM:
        np.testing.assert_allclose(np.asarray(st_c.pos),
                                   np.asarray(st_b.pos), atol=1e-6)
        assert _cert(mc) == _cert(mb)


@pytest.mark.slow
@pytest.mark.parametrize("compact", [False, True])
def test_bf16_candidate_fields_track_f32(compact):
    """Opt-in bf16 pair-packed candidate vel/rho (PallasTuning.bf16): the
    j-side velocity/density ride the window DMA rounded to 8 mantissa
    bits, the i-side rows state stays f32, and candidate COVERAGE is
    unchanged — so certificates stay 0 on the calm config and the
    trajectory tracks the f32 run to bf16 quantization tolerance (forces
    are smooth in vel/rho; nothing accumulates beyond the integrator)."""
    from sphfluidsimulation_tpu.ops.pallas_sph import PallasTuning
    from sphfluidsimulation_tpu.sim.stepper import make_param_step

    st_a = st_b = initial_state(CALM)
    phys = PhysParams.from_config(CALM)
    t = PallasTuning(fused=True, compact=compact)
    step_a = jax.jit(make_param_step(CALM, neighbor="pallas",
                                     pallas_tune=t))
    step_b = jax.jit(make_param_step(CALM, neighbor="pallas",
                                     pallas_tune=t._replace(bf16=True)))
    for _ in range(2):
        st_a, ma = step_a(st_a, phys)
        st_b, mb = step_b(st_b, phys)
    # density pass is bf16-agnostic (positions stay f32) -> rho identical
    np.testing.assert_array_equal(np.asarray(ma.mean_density),
                                  np.asarray(mb.mean_density))
    assert _cert(ma) == _cert(mb) == 0
    assert _ovf(ma) == _ovf(mb)
    np.testing.assert_allclose(np.asarray(st_a.pos), np.asarray(st_b.pos),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(st_a.vel), np.asarray(st_b.vel),
                               atol=5e-2)


@pytest.mark.slow
def test_compact_kernel_matches_v6():
    """v7 compact-lane kernel (in-kernel candidate compaction + SMEM
    interval derivation, ops/pallas_compact.py) vs the v6 fused kernel on
    the calm config: same candidate set by construction (cert 0 both), so
    trajectories may differ only by f32 accumulation order."""
    from sphfluidsimulation_tpu.ops.pallas_sph import PallasTuning
    from sphfluidsimulation_tpu.sim.stepper import make_param_step

    st_6 = st_7 = initial_state(CALM)
    phys = PhysParams.from_config(CALM)
    step_6 = jax.jit(make_param_step(
        CALM, neighbor="pallas", pallas_tune=PallasTuning(fused=True)))
    step_7 = jax.jit(make_param_step(
        CALM, neighbor="pallas",
        pallas_tune=PallasTuning(fused=True, compact=True)))
    for _ in range(3):
        st_6, m6 = step_6(st_6, phys)
        st_7, m7 = step_7(st_7, phys)
    np.testing.assert_allclose(np.asarray(st_6.pos), np.asarray(st_7.pos),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(st_6.vel), np.asarray(st_7.vel),
                               atol=2e-4)
    assert _cert(m6) == _cert(m7) == 0
    assert _ovf(m6) == _ovf(m7)
    np.testing.assert_array_equal(np.asarray(st_6.nan_count),
                                  np.asarray(st_7.nan_count))


@pytest.mark.slow
def test_flat_worklist_bit_identical_to_nested():
    """The v8 flat chunk worklist (tune.flat, default) walks exactly the
    nested line->chunk intervals in the same order, so trajectories,
    certificates and overflow counts are BIT-identical — including on a
    violent config where line caps and drift certificates fire."""
    from sphfluidsimulation_tpu.ops.pallas_sph import PallasTuning
    from sphfluidsimulation_tpu.sim.stepper import make_param_step

    violent = SimConfig(particle_number=4096, bucket_resolution=13)
    for cfg in (CALM, violent):
        st = initial_state(cfg)
        phys = PhysParams.from_config(cfg)
        outs = {}
        for flat in (False, True):
            tune = PallasTuning(fused=True, flat=flat)
            step = jax.jit(make_param_step(cfg, neighbor="pallas",
                                           pallas_tune=tune))
            s, m = step(st, phys)
            outs[flat] = (np.asarray(s.pos), np.asarray(s.vel),
                          _cert(m), _ovf(m))
        np.testing.assert_array_equal(outs[True][0], outs[False][0])
        np.testing.assert_array_equal(outs[True][1], outs[False][1])
        assert outs[True][2] == outs[False][2]
        assert outs[True][3] == outs[False][3]


@pytest.mark.slow
def test_iki_worklist_bit_identical_to_flat():
    """The v9 in-kernel worklist derivation (tune.iki: scalar start-slice
    lookups + monotone dedup in the kernel prologue) produces the exact
    integer worklists of the XLA interval pass, so trajectories,
    certificates and overflow counts are BIT-identical — including on a
    violent config where line caps and drift certificates fire."""
    from sphfluidsimulation_tpu.ops.pallas_sph import PallasTuning
    from sphfluidsimulation_tpu.sim.stepper import make_param_step

    violent = SimConfig(particle_number=4096, bucket_resolution=13)
    for cfg in (CALM, violent):
        st = initial_state(cfg)
        phys = PhysParams.from_config(cfg)
        outs = {}
        for iki in (False, True):
            tune = PallasTuning(fused=True, flat=True, iki=iki)
            step = jax.jit(make_param_step(cfg, neighbor="pallas",
                                           pallas_tune=tune))
            s, m = step(st, phys)
            outs[iki] = (np.asarray(s.pos), np.asarray(s.vel),
                         _cert(m), _ovf(m))
        np.testing.assert_array_equal(outs[True][0], outs[False][0])
        np.testing.assert_array_equal(outs[True][1], outs[False][1])
        assert outs[True][2] == outs[False][2]
        assert outs[True][3] == outs[False][3]


def test_intcell_resolution_guard():
    # ADVICE round 4: the digit-packed membership is proven only for
    # r <= INTCELL_MAX_R (row cells clamp to [-2, r+2], digits <= 258);
    # above it the tuning must fall back to the f32 decode, never
    # silently drop neighbors.
    from sphfluidsimulation_tpu.ops.pallas_sph import (INTCELL_MAX_R,
                                                       PallasTuning)
    t = PallasTuning(intcell=True)
    assert t.for_resolution(INTCELL_MAX_R).intcell
    assert not t.for_resolution(INTCELL_MAX_R + 1).intcell
    assert not PallasTuning(intcell=False).for_resolution(8).intcell


@pytest.mark.slow
def test_pallas_forces_skip_self_on_inf_velocities():
    """VelPos.compute:82 `if (j == id_1d) continue` in the pallas force
    walk: a particle with ±inf velocity must not evaluate its own
    inf − inf = NaN self pair. At frame start fresh == stale (zero
    drift), so the candidate set is exactly the reference's and the
    force field must match brute — including the ±inf / NaN PATTERN
    that the injected velocities produce through real pairs (VERDICT
    round 4 weak #3; companion rollout-level slotted pin in
    tests/test_equivalence.py)."""
    from sphfluidsimulation_tpu.models.presets import init_positions
    from sphfluidsimulation_tpu.ops import brute, pallas_sph
    from sphfluidsimulation_tpu.ops.grid import build_bucket

    cfg = GOLDENISH
    r, n = cfg.bucket_resolution, cfg.n_particles
    phys = PhysParams.from_config(cfg)
    pos = init_positions(cfg)
    rng = np.random.default_rng(0)
    vel = jnp.asarray(rng.normal(0, 0.2, (n, 3)), np.float32)
    vel = vel.at[::37, 0].set(jnp.inf)
    vel = vel.at[5::53, 1].set(-jnp.inf)

    bucket, _ = build_bucket(pos, r, 32)
    rho = brute.density_bruteforce(pos, bucket.cell_id, bucket.in_table,
                                   phys, r)
    f_b = np.asarray(brute.fluid_forces_bruteforce(
        pos, vel, rho, bucket.cell_id, bucket.in_table, phys, r))

    frame, (pos_s, vel_s, rho_s) = pallas_sph.build_frame(
        pos, r, 32, extras=(pos, vel, rho))
    f_s, _, cert = pallas_sph.forces_pallas(frame, pos_s, vel_s, rho_s,
                                            phys, r, n)
    assert int(cert) == 0  # exact candidate set at frame start
    f_p = np.asarray(jnp.zeros_like(f_s).at[frame.order].set(f_s))

    # the special-value pattern must match the oracle element-for-element
    np.testing.assert_array_equal(np.isnan(f_p), np.isnan(f_b))
    np.testing.assert_array_equal(np.isposinf(f_p), np.isposinf(f_b))
    np.testing.assert_array_equal(np.isneginf(f_p), np.isneginf(f_b))
    assert np.isinf(f_b).any() or np.isnan(f_b).any()  # scenario is violent
    # finite entries match numerically
    fin = np.isfinite(f_b)
    scale = np.abs(f_b[fin]).max()
    np.testing.assert_allclose(f_p[fin] / scale, f_b[fin] / scale,
                               atol=1e-5)


@pytest.mark.slow
def test_kahan_accumulators_track_default():
    """tune.kahan (compensated pair sums, the VERDICT r4 item-7 order
    experiment) must keep the identical candidate set (equal certs) and
    track the default accumulators to summation tolerance on the calm
    config."""
    from sphfluidsimulation_tpu.ops.pallas_sph import PallasTuning

    sp = sk = initial_state(CALM)
    pstep = jax.jit(make_frame_step(CALM, neighbor="pallas"))
    kstep = jax.jit(make_frame_step(CALM, neighbor="pallas",
                                    pallas_tune=PallasTuning(kahan=True)))
    for _ in range(3):
        sp, mp = pstep(sp)
        sk, mk = kstep(sk)
    assert int(mp.exact_cert) == int(mk.exact_cert) == 0
    np.testing.assert_allclose(np.asarray(sk.pos), np.asarray(sp.pos),
                               atol=1e-5)
