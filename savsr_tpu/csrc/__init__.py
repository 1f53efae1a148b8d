"""Native (C++) host-runtime components, loaded via ctypes.

Built lazily with g++ on first use (no pip deps); every entry point has a
pure-numpy fallback so the framework runs without a toolchain.
"""

from .build import load_native  # noqa: F401
