"""Native (C++) runtime components with build-on-first-use.

`get_fastdata()` returns the compiled `_fastdata` extension module (jsonl
reader + line counter) or None when no toolchain is available — callers keep
a pure-Python fallback, so the framework degrades gracefully on machines
without g++.
"""

from __future__ import annotations

import os
import subprocess
import sysconfig
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "_fastdata.so")
_SRC = os.path.join(_DIR, "_fastdata.cpp")

_cached = False
_module = None


def build(force: bool = False) -> Optional[str]:
    """Compile the extension with g++ if needed; returns the .so path."""
    if not force and os.path.exists(_SO) and os.path.getmtime(
        _SO
    ) >= os.path.getmtime(_SRC):
        return _SO
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}", _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return None
    return _SO


def get_fastdata():
    """Import (building if necessary) the native module, or None."""
    global _cached, _module
    if _cached:
        return _module
    _cached = True
    if build() is None:
        return None
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location("_fastdata", _SO)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _module = mod
    except ImportError:
        _module = None
    return _module
