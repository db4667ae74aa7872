from . import sph_math, noise, brute, grid, cellops  # noqa: F401
