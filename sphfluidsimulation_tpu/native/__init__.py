"""Native (C++) runtime components, loaded via ctypes.

Built on demand with g++ (no pybind11 in the environment); every consumer
has a pure-Python fallback, so the framework works without a toolchain.
"""

from .build import load_framecodec  # noqa: F401
