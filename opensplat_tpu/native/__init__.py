"""Native (C++) acceleration library, loaded via ctypes.

Compiled lazily on first use (g++ -O3 -shared); every consumer falls back
to the pure-numpy path when no compiler / prebuilt library is available,
so the native layer is an accelerator, never a hard dependency.
"""
from .loader import get_lib, native_available  # noqa: F401
