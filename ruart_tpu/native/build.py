"""Build helper for the native PHOC library.

Compiles ``phoc.cc`` into ``libruartphoc.so`` next to this file on first use
(g++ -O3, plain C ABI -> consumed via ctypes; pybind11 is unavailable in this
environment and unnecessary for a pure-function kernel).
"""

from __future__ import annotations

import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_HERE, "phoc.cc")
LIB = os.path.join(_HERE, "libruartphoc.so")
_lock = threading.Lock()


def ensure_built(force: bool = False) -> str:
    """Compile the shared library if missing/stale; return its path."""
    with _lock:
        if (
            not force
            and os.path.exists(LIB)
            and os.path.getmtime(LIB) >= os.path.getmtime(SRC)
        ):
            return LIB
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            "-o", LIB, SRC,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        return LIB
