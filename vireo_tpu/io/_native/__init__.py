"""Native (C++) IO accelerators, loaded via ctypes.

The shared library is compiled on first use with the system g++ and
cached next to the source; every caller must tolerate `lib() is None`
and fall back to the pure-Python path.
"""

from .build import lib, available

__all__ = ["lib", "available"]
