"""On-demand build + load of the native `fastio` C extension
(native/fastio.c). Falls back to the pure-numpy paths if no compiler is
available; callers check `fastio() is not None`."""
from __future__ import annotations

import importlib.util
import os
import subprocess
import sysconfig

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "fastio.c")
_cached = None
_tried = False


def _build() -> str | None:
    import numpy as np

    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(_REPO_ROOT, "native", f"fastio{suffix}")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(_SRC):
        return out
    cc = os.environ.get("CC", "cc")
    cmd = [
        cc, "-O3", "-shared", "-fPIC", "-Wall",
        f"-I{sysconfig.get_paths()['include']}",
        f"-I{np.get_include()}",
        _SRC, "-o", out,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return out
    except Exception:
        return None


def fastio():
    """The fastio module, or None when unavailable."""
    global _cached, _tried
    if _tried:
        return _cached
    _tried = True
    path = _build()
    if path is None:
        return None
    try:
        spec = importlib.util.spec_from_file_location("fastio", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _cached = mod
    except Exception:
        _cached = None
    return _cached
