"""Native (C++) host-side components, loaded via ctypes.

The TPU compute path is jax/XLA; host-side hot loops that neither numpy nor
XLA can express well (bit-level codec work) live here. Libraries are built
on first use with the system ``g++`` and cached next to the sources; every
native entry point has a pure-Python fallback, so a missing compiler only
costs speed, never functionality.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

logger = logging.getLogger("mfa_tpu")

_NATIVE_DIR = Path(__file__).resolve().parent
_LIBS: dict = {}


def _build_library(source: Path, lib_path: Path) -> bool:
    """Compile one .cc into a shared library (atomic rename for safety)."""
    try:
        with tempfile.NamedTemporaryFile(
            suffix=".so", dir=str(lib_path.parent), delete=False
        ) as tmp:
            tmp_path = tmp.name
        cmd = [
            "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
            "-o", tmp_path, str(source),
        ]
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if proc.returncode != 0:
            logger.warning("native build of %s failed: %s", source.name, proc.stderr)
            os.unlink(tmp_path)
            return False
        os.replace(tmp_path, lib_path)
        return True
    except (OSError, subprocess.SubprocessError) as e:
        logger.warning("native build of %s failed: %s", source.name, e)
        return False


def load_native(name: str) -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library ``name`` (e.g.
    ``flac_decode``). Returns None when the toolchain is unavailable."""
    if name in _LIBS:
        return _LIBS[name]
    if os.environ.get("MFA_TPU_NO_NATIVE"):
        _LIBS[name] = None
        return None
    source = _NATIVE_DIR / f"{name}.cc"
    lib_path = _NATIVE_DIR / f"_{name}.so"
    lib = None
    try:
        if not lib_path.exists() or (
            source.exists() and source.stat().st_mtime > lib_path.stat().st_mtime
        ):
            if not source.exists() or not _build_library(source, lib_path):
                _LIBS[name] = None
                return None
        lib = ctypes.CDLL(str(lib_path))
    except OSError as e:
        logger.warning("could not load native %s: %s", name, e)
        lib = None
    _LIBS[name] = lib
    return lib


def flac_lib() -> Optional[ctypes.CDLL]:
    lib = load_native("flac_decode")
    if lib is not None and not getattr(lib, "_mfa_configured", False):
        lib.flac_decode_frames.restype = ctypes.c_longlong
        lib.flac_decode_frames.argtypes = [
            ctypes.c_char_p,
            ctypes.c_longlong,
            ctypes.c_longlong,
            ctypes.c_longlong,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_void_p,
        ]
        lib._mfa_configured = True
    return lib


def fmllr_lib() -> Optional[ctypes.CDLL]:
    lib = load_native("fmllr_solve")
    if lib is not None and not getattr(lib, "_mfa_configured", False):
        lib.fmllr_solve_batched.restype = ctypes.c_int
        lib.fmllr_solve_batched.argtypes = [
            ctypes.c_void_p,  # K
            ctypes.c_void_p,  # G
            ctypes.c_void_p,  # beta
            ctypes.c_void_p,  # W (in/out)
            ctypes.c_longlong,  # S
            ctypes.c_longlong,  # D
            ctypes.c_int,  # num_iters
            ctypes.c_int,  # num_threads
        ]
        lib._mfa_configured = True
    return lib
