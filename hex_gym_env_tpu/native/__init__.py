"""Native scalar Hex engine: ctypes loader + build-on-demand.

Compiles ``hexcore.c`` with the system C compiler on first use (cached next
to the source; rebuilt when the source is newer) and binds it with ctypes —
no pybind11/extension-module machinery needed.  See ``native/engine.py``
for the Python-facing wrapper.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "hexcore.c")
_SO = os.path.join(_HERE, "libhexcore.so")

_lib = None


def _build() -> None:
    cc = os.environ.get("CC", "cc")
    cmd = [cc, "-O3", "-shared", "-fPIC", "-o", _SO, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def load() -> ctypes.CDLL:
    """Load (building if needed) the native library; cached per process."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        _build()
    lib = ctypes.CDLL(_SO)

    lib.hex_new.argtypes = [ctypes.c_int]
    lib.hex_new.restype = ctypes.c_void_p
    lib.hex_free.argtypes = [ctypes.c_void_p]
    lib.hex_reset.argtypes = [ctypes.c_void_p]
    lib.hex_step.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float)
    ]
    lib.hex_step.restype = ctypes.c_int
    lib.hex_observe.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int8)]
    lib.hex_legal.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)]
    lib.hex_world_board.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int8)]
    lib.hex_set_board.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int8)]
    for name in ["hex_to_move", "hex_done", "hex_winner", "hex_empty"]:
        fn = getattr(lib, name)
        fn.argtypes = [ctypes.c_void_p]
        fn.restype = ctypes.c_int
    lib.hex_random_playouts.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_uint64, ctypes.POINTER(ctypes.c_int)
    ]
    lib.hex_random_playouts.restype = ctypes.c_long

    _lib = lib
    return lib
