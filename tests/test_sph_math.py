"""Closed-form unit tests of the SPH kernel functions against hand-evaluated
values of the reference's HLSL formulas (Density.compute:22-27,
VelPos.compute:33-44,61,107-137)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from sphfluidsimulation_tpu.ops import sph_math

H = 0.05
H2, H6, H9 = H ** 2, H ** 6, H ** 9


def test_poly6_at_zero():
    # W(0) = 315/(64 pi) * h^6 / h^9 = 315/(64 pi h^3)
    expected = 315.0 / (64.0 * math.pi * H ** 3)
    got = float(sph_math.w_poly6(jnp.float32(0.0), H2, H9))
    assert got == pytest.approx(expected, rel=1e-5)


def test_poly6_support_and_profile():
    # zero at and beyond r = h; positive inside; exact value at r = h/2
    assert float(sph_math.w_poly6(jnp.float32(H2), H2, H9)) == 0.0
    assert float(sph_math.w_poly6(jnp.float32(4 * H2), H2, H9)) == 0.0
    r2 = (H / 2) ** 2
    expected = 315.0 / (64.0 * math.pi) * (H2 - r2) ** 3 / H9
    assert float(sph_math.w_poly6(jnp.float32(r2), H2, H9)) == pytest.approx(
        expected, rel=1e-5)


def test_poly6_integrates_to_one():
    # int W dV = 1 over the support sphere (kernel normalization)
    r = np.linspace(0, H, 20001)
    w = 315.0 / (64.0 * math.pi) * np.maximum(H2 - r ** 2, 0) ** 3 / H9
    integral = np.trapezoid(4 * math.pi * r ** 2 * w, r)
    assert integral == pytest.approx(1.0, rel=1e-4)


def test_pressure_gradient_cubic_profile():
    # The reference uses (h-r)^3, NOT Mueller-03's (h-r)^2 (VelPos.compute:37).
    r = H / 3
    vec = jnp.array([r, 0.0, 0.0], jnp.float32)
    expected = 45.0 / math.pi / H6 * (H - r) ** 3  # * r_hat = (1,0,0)
    got = np.asarray(sph_math.grad_w_press(vec, H, H6))
    assert got[0] == pytest.approx(expected, rel=1e-4)
    assert got[1] == got[2] == 0.0


def test_pressure_gradient_epsilon_guards():
    # zero when |r| <= eps or (h - |r|) <= eps (VelPos.compute:37)
    z = jnp.zeros(3, jnp.float32)
    assert np.all(np.asarray(sph_math.grad_w_press(z, H, H6)) == 0.0)
    at_h = jnp.array([H, 0.0, 0.0], jnp.float32)
    assert np.all(np.asarray(sph_math.grad_w_press(at_h, H, H6)) == 0.0)
    tiny = jnp.array([5e-7, 0.0, 0.0], jnp.float32)
    assert np.all(np.asarray(sph_math.grad_w_press(tiny, H, H6)) == 0.0)


def test_pressure_gradient_direction():
    # gradient points along r = pos_i - pos_j (repulsive for p > 0)
    vec = jnp.array([0.01, -0.02, 0.015], jnp.float32)
    got = np.asarray(sph_math.grad_w_press(vec, H, H6))
    unit = np.asarray(vec) / np.linalg.norm(np.asarray(vec))
    np.testing.assert_allclose(got / np.linalg.norm(got), unit, rtol=1e-5)


def test_viscosity_laplacian():
    # 45/pi/h^6 * (h - r) inside support, 0 outside (VelPos.compute:40-44)
    r = H / 4
    expected = 45.0 / math.pi / H6 * (H - r)
    assert float(sph_math.grad_w_vis_r(jnp.float32(r), H, H6)) == pytest.approx(
        expected, rel=1e-5)
    assert float(sph_math.grad_w_vis_r(jnp.float32(H), H, H6)) == 0.0
    assert float(sph_math.grad_w_vis_r(jnp.float32(2 * H), H, H6)) == 0.0
    # no lower-epsilon guard: at r = 0 the value is 45/pi/h^5
    assert float(sph_math.grad_w_vis_r(jnp.float32(0.0), H, H6)) == pytest.approx(
        45.0 / math.pi / H ** 5, rel=1e-5)


def test_eos_pressure_can_be_negative():
    # p = k (rho - rho0) (VelPos.compute:61) — no clamping
    assert float(sph_math.eos_pressure(jnp.float32(2.0), 150.0, 1.5)) == pytest.approx(75.0)
    assert float(sph_math.eos_pressure(jnp.float32(0.5), 150.0, 1.5)) == pytest.approx(-150.0)


def test_wall_force_scalar_dot_quirk():
    """The damping term dot(damp, v) is a SCALAR subtracted from ALL force
    components (VelPos.compute:135) — hand-computed case."""
    h, k, c, m = 0.1, 5000.0, 10.0, 2.0
    pos = jnp.array([[0.05, 0.5, 0.97]], jnp.float32)   # x < h and z > 1-h
    vel = jnp.array([[1.0, 2.0, 3.0]], jnp.float32)
    # per-axis penetration (VelPos.compute:110-123):
    # r.x = h - 0.05 = 0.05 ; r.y = 0 ; r.z = 1 - 0.97 - h = -0.07
    # damp = (c, 0, c); dot(damp, v) = 10*1 + 0 + 10*3 = 40
    # f = (r * k - 40) * m
    expected = np.array([(0.05 * k - 40) * m, (0.0 * k - 40) * m,
                         (-0.07 * k - 40) * m], np.float32)
    got = np.asarray(sph_math.wall_force(pos, vel, h, k, c, m))[0]
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_wall_force_inactive_inside_box():
    # no force when h <= pos <= 1-h on every axis (max_r == 0 gate, :133)
    pos = jnp.array([[0.5, 0.5, 0.5]], jnp.float32)
    vel = jnp.array([[9.0, 9.0, 9.0]], jnp.float32)
    got = np.asarray(sph_math.wall_force(pos, vel, 0.1, 5000.0, 10.0, 1.0))
    assert np.all(got == 0.0)


def test_wall_force_outside_cube():
    # spawned beyond pos = 1 (preset2 overshoot): r = 1 - pos - h < -h
    h = 0.1
    pos = jnp.array([[1.2, 0.5, 0.5]], jnp.float32)
    vel = jnp.zeros((1, 3), jnp.float32)
    got = np.asarray(sph_math.wall_force(pos, vel, h, 1000.0, 10.0, 1.0))[0]
    assert got[0] == pytest.approx((1 - 1.2 - h) * 1000.0, rel=1e-5)
    assert got[1] == got[2] == 0.0


def test_cell_index_truncation():
    # int3(pos * (R-1)) truncates toward zero (Bucket.compute:27)
    r = 47
    pos = jnp.array([[0.0, 0.5, 0.999], [1.0, -0.01, 1.05]], jnp.float32)
    got = np.asarray(sph_math.cell_index(pos, r))
    assert list(got[0]) == [0, 23, int(0.999 * 46)]
    assert got[1, 0] == 46
    assert got[1, 1] == 0      # -0.46 truncates to 0, like the HLSL int cast
    assert got[1, 2] == int(1.05 * 46)  # out of range, kept (aliases in flat id)
