"""In-place build of the native (C++) components.

The reference's value proposition is a *native* runtime
(/root/reference/src/lib.rs:8-11); here the C++ tier is the CSV fast path
(csrc/csv_loader.cpp) and the tape walker (csrc/tape_walker.cpp), built as
CPython extensions. Rather than shipping wheels, the test harness and the
benchmark call `ensure_native_built()` at startup so any checkout with a
toolchain exercises the native tier — the pure-Python fallbacks remain for
toolchain-less environments.
"""

from __future__ import annotations

import pathlib
import shutil
import subprocess
import sys

_ROOT = pathlib.Path(__file__).resolve().parent.parent


def _native_missing() -> bool:
    eng = _ROOT / "neuronika_tpu" / "_engine"
    dat = _ROOT / "neuronika_tpu" / "data"
    return not (
        list(eng.glob("_native_tape*.so"))
        and list(dat.glob("_native_ext*.so"))
        and list(dat.glob("_native_bpe*.so"))
    )


def ensure_native_built(quiet: bool = True, timeout: int = 300) -> bool:
    """Build csrc/ extensions in-place if absent. Returns True when the
    native tier is available (already built, or built just now)."""
    if not _native_missing():
        return True
    if not (_ROOT / "setup.py").exists():
        return False
    if shutil.which("g++") is None and shutil.which("cc") is None:
        return False
    try:
        subprocess.run(
            [sys.executable, "setup.py", "build_ext", "--inplace"],
            cwd=_ROOT, check=True, capture_output=quiet, timeout=timeout,
        )
    except (subprocess.SubprocessError, OSError):
        return False
    import importlib

    importlib.invalidate_caches()
    return not _native_missing()
