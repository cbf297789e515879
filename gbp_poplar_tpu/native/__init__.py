"""Native (C++) runtime components, exposed via ctypes.

Currently: the fast BAL loader (`balio_native`). The shared library is
built on demand with the system g++ (no pip deps); if the toolchain is
missing, importers fall back to the pure-NumPy paths.
"""
