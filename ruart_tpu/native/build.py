"""Build helpers for the native libraries.

Compiles ``phoc.cc`` into ``libruartphoc.so`` (plain C ABI -> ctypes) and
``fastcollate.cc`` into the CPython extension ``_ruart_fastcollate.so``
next to this file on first use (g++ -O3; pybind11 is unavailable in this
environment — phoc needs no Python API at all and fastcollate uses the raw
CPython C API + buffer protocol, so neither misses it).
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sysconfig
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_HERE, "phoc.cc")
LIB = os.path.join(_HERE, "libruartphoc.so")
FC_SRC = os.path.join(_HERE, "fastcollate.cc")
FC_LIB = os.path.join(_HERE, "_ruart_fastcollate.so")
_lock = threading.Lock()


def _build(src: str, lib: str, extra: list, force: bool) -> str:
    with _lock:
        if (
            not force
            and os.path.exists(lib)
            and os.path.getmtime(lib) >= os.path.getmtime(src)
        ):
            return lib
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            *extra, "-o", lib, src,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        return lib


def ensure_built(force: bool = False) -> str:
    """Compile the PHOC shared library if missing/stale; return its path."""
    return _build(SRC, LIB, [], force)


def load_fastcollate(force: bool = False):
    """Build (if needed) and import the ``_ruart_fastcollate`` extension.

    Returns the module, or None when the toolchain/import fails — callers
    keep their pure-Python path as fallback (and parity oracle). A stale
    prebuilt .so (e.g. compiled against another Python ABI) triggers one
    rebuild from source before giving up.
    """

    def attempt(f: bool):
        _build(
            FC_SRC, FC_LIB,
            ["-I" + sysconfig.get_paths()["include"]], f,
        )
        spec = importlib.util.spec_from_file_location(
            "_ruart_fastcollate", FC_LIB
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    try:
        return attempt(force)
    except Exception:
        try:
            return attempt(True)
        except Exception:
            return None
