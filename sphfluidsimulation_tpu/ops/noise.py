"""Textureless 4D simplex noise (Ashima Arts / Stefan Gustavson algorithm).

A from-scratch JAX port of the public-domain-licensed (MIT) Ashima
``webgl-noise`` 4D simplex algorithm, matching the overload the reference's
spawn presets call: ``snoise(float4 v)`` returning a scalar
(Assets/Resources/noiseSimplex.cginc:296-425, used at InitParticles.compute:37,
70, 103). Only the 4D variant is needed — the presets jitter lattice
positions with ``snoise(pos + i)`` where ``pos`` is a float4 and ``i`` the
particle index.

All arithmetic is float32 to match HLSL ``float`` semantics (the init noise
must be bit-close for rollout parity, since dam-break dynamics are chaotic).
Fully vectorized over leading batch dims; shapes are static.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_F32 = jnp.float32
_INV_289 = np.float32(0.00346020761245674740484429065744)  # noiseSimplex.cginc:60


def _mod289(x):
    """x − floor(x/289)·289 (noiseSimplex.cginc:62-76)."""
    return x - jnp.floor(x * _INV_289) * np.float32(289.0)


def _permute(x):
    """mod289(x²·34 + x) (noiseSimplex.cginc:81-97)."""
    return _mod289(x * x * np.float32(34.0) + x)


def _taylor_inv_sqrt(r):
    """1.79284291400159 − 0.85373472095314·r (noiseSimplex.cginc:101-107)."""
    return np.float32(1.79284291400159) - np.float32(0.85373472095314) * r


def _step(edge, x):
    """HLSL step(edge, x) = x >= edge ? 1 : 0."""
    return jnp.where(x >= edge, np.float32(1.0), np.float32(0.0))


def _grad4(j, ip):
    """Gradient on the 4-cross polytope (noiseSimplex.cginc:111-126).

    j: f32[...], ip: the constant float4 (1/294, 1/49, 1/7, 0).
    Returns f32[..., 4].
    """
    p_xyz = jnp.floor((j[..., None] * ip[:3]) % np.float32(1.0) * np.float32(7.0)) \
        * ip[2] - np.float32(1.0)
    p_w = np.float32(1.5) - jnp.sum(jnp.abs(p_xyz), axis=-1, keepdims=True)
    s = np.float32(1.0) - _step(np.float32(0.0), jnp.concatenate([p_xyz, p_w], -1))
    p_xyz = p_xyz + (s[..., :3] * np.float32(2.0) - np.float32(1.0)) * s[..., 3:4]
    return jnp.concatenate([p_xyz, p_w], -1)


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def snoise4(v):
    """Scalar 4D simplex noise of f32[..., 4] input → f32[...].

    Transcribes noiseSimplex.cginc:296-425 (the float4 overload).
    """
    v = jnp.asarray(v, _F32)
    C = np.array([0.138196601125011, 0.276393202250021,
                  0.414589803375032, -0.447213595499958], np.float32)
    F4 = np.float32(0.309016994374947451)  # (sqrt(5)−1)/4

    # First corner
    i = jnp.floor(v + _dot(v, jnp.full((4,), F4))[..., None])
    x0 = v - i + _dot(i, jnp.full((4,), C[0]))[..., None]

    # Rank-sort the simplex corner traversal order
    x0x, x0y, x0z, x0w = (x0[..., k] for k in range(4))
    is_x = jnp.stack([_step(x0y, x0x), _step(x0z, x0x), _step(x0w, x0x)], -1)
    is_yz = jnp.stack([_step(x0z, x0y), _step(x0w, x0y), _step(x0w, x0z)], -1)
    i0x = is_x[..., 0] + is_x[..., 1] + is_x[..., 2]
    i0y = np.float32(1.0) - is_x[..., 0] + is_yz[..., 0] + is_yz[..., 1]
    i0z = (np.float32(1.0) - is_x[..., 1]) + (np.float32(1.0) - is_yz[..., 0]) \
        + is_yz[..., 2]
    i0w = (np.float32(1.0) - is_x[..., 2]) + (np.float32(1.0) - is_yz[..., 1]) \
        + (np.float32(1.0) - is_yz[..., 2])
    i0 = jnp.stack([i0x, i0y, i0z, i0w], -1)

    i3 = jnp.clip(i0, 0.0, 1.0)
    i2 = jnp.clip(i0 - np.float32(1.0), 0.0, 1.0)
    i1 = jnp.clip(i0 - np.float32(2.0), 0.0, 1.0)

    x1 = x0 - i1 + C[0]
    x2 = x0 - i2 + C[1]
    x3 = x0 - i3 + C[2]
    x4 = x0 + C[3]

    # Permutations
    i = _mod289(i)
    ix, iy, iz, iw = (i[..., k] for k in range(4))
    j0 = _permute(_permute(_permute(_permute(iw) + iz) + iy) + ix)
    ones = jnp.ones_like(i1[..., :1])
    corner_w = jnp.concatenate(
        [i1[..., 3:4], i2[..., 3:4], i3[..., 3:4], ones], -1)
    corner_z = jnp.concatenate(
        [i1[..., 2:3], i2[..., 2:3], i3[..., 2:3], ones], -1)
    corner_y = jnp.concatenate(
        [i1[..., 1:2], i2[..., 1:2], i3[..., 1:2], ones], -1)
    corner_x = jnp.concatenate(
        [i1[..., 0:1], i2[..., 0:1], i3[..., 0:1], ones], -1)
    j1 = _permute(
        _permute(
            _permute(
                _permute(iw[..., None] + corner_w) + iz[..., None] + corner_z
            ) + iy[..., None] + corner_y
        ) + ix[..., None] + corner_x
    )

    ip = np.array([0.003401360544217687075,   # 1/294
                   0.020408163265306122449,   # 1/49
                   0.142857142857142857143,   # 1/7
                   0.0], np.float32)

    p0 = _grad4(j0, ip)
    p1 = _grad4(j1[..., 0], ip)
    p2 = _grad4(j1[..., 1], ip)
    p3 = _grad4(j1[..., 2], ip)
    p4 = _grad4(j1[..., 3], ip)

    norm = _taylor_inv_sqrt(
        jnp.stack([_dot(p0, p0), _dot(p1, p1), _dot(p2, p2), _dot(p3, p3)], -1))
    p0 = p0 * norm[..., 0:1]
    p1 = p1 * norm[..., 1:2]
    p2 = p2 * norm[..., 2:3]
    p3 = p3 * norm[..., 3:4]
    p4 = p4 * _taylor_inv_sqrt(_dot(p4, p4))[..., None]

    m0 = jnp.maximum(
        np.float32(0.6) - jnp.stack([_dot(x0, x0), _dot(x1, x1), _dot(x2, x2)], -1),
        np.float32(0.0))
    m1 = jnp.maximum(
        np.float32(0.6) - jnp.stack([_dot(x3, x3), _dot(x4, x4)], -1),
        np.float32(0.0))
    m0 = m0 * m0
    m1 = m1 * m1

    d0 = jnp.stack([_dot(p0, x0), _dot(p1, x1), _dot(p2, x2)], -1)
    d1 = jnp.stack([_dot(p3, x3), _dot(p4, x4)], -1)
    return np.float32(49.0) * (jnp.sum(m0 * m0 * d0, -1) + jnp.sum(m1 * m1 * d1, -1))
