"""Particle spawn presets.

Transcribes the three lattice spawn kernels of
``Assets/Resources/InitParticles.compute``:

* ``preset1`` (kernel 0, :10-41) — dam against the x-wall: x-extent
  ``dam_fill_rate``, y-extent 0.9, z-extent 1.0.
* ``preset2`` (kernel 1, :43-74) — centered column: x and z extents
  ``dam_fill_rate`` with a ``dam_fill_rate/2`` centering offset.
* ``preset3`` (kernel 2, :76-107) — corner column: like preset2 without the
  centering offset.

The host dispatches kernel index == the ``preset`` inspector field
(SphFluidSimulation.cs:182-184), so the canonical scene value ``preset: 1``
selects ``preset2``. Each preset decomposes the particle index ``i`` into a
jittered lattice via integer division (``InitParticles.compute:28-35``) and
adds scalar 4D simplex noise ``snoise(pos + i) * particleCubeSize`` to all
components (:37, :70, :103), then resets w — only xyz survive here since our
state is [N, 3].

Integer lattice math is done in int32 and the float math in float32 in the
same order as the HLSL for bit-closeness.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SimConfig
from ..ops.noise import snoise4


def _lattice_sizes(n: int, fill: float, squared_fill: bool) -> tuple[int, int, int, float]:
    """particlePerDim / axis sizes in f32 exactly as the HLSL computes them.

    InitParticles.compute:20-24 (preset1, squared_fill=False) and :53-57
    (presets 2/3, squared_fill=True).
    """
    fill32 = np.float32(fill)
    denom = fill32 * fill32 if squared_fill else fill32
    ppd = np.uint32(np.ceil(np.power(np.float32(n) / denom, np.float32(1.0 / 3.0),
                                     dtype=np.float32)))
    x_size = np.uint32(np.ceil(np.float32(ppd) * fill32))
    y_size = ppd
    z_size = np.uint32(np.ceil(np.float32(ppd) * fill32)) if squared_fill else ppd
    cube = np.float32(1.0) / np.float32(ppd)
    return int(x_size), int(y_size), int(z_size), float(cube)


def _lattice(n: int, x_size: int, y_size: int, z_size: int):
    """Decompose particle index into integer lattice coords
    (InitParticles.compute:31-33)."""
    i = jnp.arange(n, dtype=jnp.int32)
    xi = i // np.int32(z_size * y_size)
    yi = (i // np.int32(z_size)) % np.int32(y_size)
    zi = i % np.int32(z_size)
    return i, xi.astype(jnp.float32), yi.astype(jnp.float32), zi.astype(jnp.float32)


def _jitter(pos3: jax.Array, i: jax.Array, cube: float, seed: int) -> jax.Array:
    """pos += snoise(pos4 + i) * particleCubeSize (InitParticles.compute:37)."""
    fi = i.astype(jnp.float32) + np.float32(seed)
    pos4 = jnp.concatenate([pos3, jnp.ones_like(pos3[..., :1])], -1)
    noise = snoise4(pos4 + fi[..., None])
    return pos3 + noise[..., None] * np.float32(cube)


def preset1(n: int, fill: float, seed: int = 0) -> jax.Array:
    """Dam against the x-wall (InitParticles.compute:13-41)."""
    x_size, y_size, z_size, cube = _lattice_sizes(n, fill, squared_fill=False)
    i, xi, yi, zi = _lattice(n, x_size, y_size, z_size)
    half = np.float32(cube / 2.0)
    fill32 = np.float32(fill)
    pos = jnp.stack([
        half + xi * fill32 / np.float32(x_size),
        half + yi * np.float32(0.9) / np.float32(y_size),
        half + zi * np.float32(1.0) / np.float32(z_size),
    ], -1)
    return _jitter(pos, i, cube, seed)


def preset2(n: int, fill: float, seed: int = 0) -> jax.Array:
    """Centered column (InitParticles.compute:46-74) — the canonical scene
    spawn (scene preset field 1 → kernel index 1)."""
    x_size, y_size, z_size, cube = _lattice_sizes(n, fill, squared_fill=True)
    i, xi, yi, zi = _lattice(n, x_size, y_size, z_size)
    half = np.float32(cube / 2.0)
    fill32 = np.float32(fill)
    offset = fill32 / np.float32(2.0)
    pos = jnp.stack([
        half + offset + xi * fill32 / np.float32(x_size),
        half + yi * np.float32(0.9) / np.float32(y_size),
        half + offset + zi * fill32 / np.float32(z_size),
    ], -1)
    return _jitter(pos, i, cube, seed)


def preset3(n: int, fill: float, seed: int = 0) -> jax.Array:
    """Corner column (InitParticles.compute:79-107)."""
    x_size, y_size, z_size, cube = _lattice_sizes(n, fill, squared_fill=True)
    i, xi, yi, zi = _lattice(n, x_size, y_size, z_size)
    half = np.float32(cube / 2.0)
    fill32 = np.float32(fill)
    pos = jnp.stack([
        half + xi * fill32 / np.float32(x_size),
        half + yi * np.float32(0.9) / np.float32(y_size),
        half + zi * fill32 / np.float32(z_size),
    ], -1)
    return _jitter(pos, i, cube, seed)


_PRESETS = (preset1, preset2, preset3)


def init_positions(cfg: SimConfig) -> jax.Array:
    """Spawn positions per the config's preset field (kernel dispatch index —
    SphFluidSimulation.cs:182-184)."""
    fn = _PRESETS[cfg.preset]
    return fn(cfg.n_particles, cfg.dam_fill_rate, cfg.seed)
