"""Python face of the native CSV fast path (csrc/csv_loader.cpp).

Raises ImportError when the extension isn't built; `DataLoader.from_csv`
catches that and falls back to the pure-Python parser."""

from __future__ import annotations

import numpy as np

from . import _native_ext  # type: ignore[attr-defined]


def load_csv(path: str, delimiter: str = ",", has_headers: bool = True) -> np.ndarray:
    raw, rows, cols = _native_ext.load_csv_bytes(path, delimiter, has_headers)
    return np.frombuffer(raw, dtype=np.float32).reshape(rows, cols).copy()
