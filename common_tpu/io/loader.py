"""Bulk host-side data ingest (native-accelerated).

Reference analog: the reference's dataview layer is C++
(`common:src/core/recarray_dataview.cc` etc.) and users feed it numpy
arrays parsed elsewhere; production corpora arrive as text/CSV.  Here the
hot text → float32 parse runs in the multithreaded C++ loader
(common_tpu/native/loader.cpp, ~#threads× numpy.loadtxt), degrading to
numpy when no toolchain is present.

    X = load_csv_f32("rows.csv")          # [N, D] float32
    defn = st.model_definition(len(X), [models.niw(X.shape[1])], ...)
"""

from __future__ import annotations

import ctypes
import os

import numpy as np


def load_csv_f32(path: str, n_threads: int = 0) -> np.ndarray:
    """Parse a CSV/TSV of numbers into a C-contiguous [rows, cols] f32
    array.  Separators: comma/semicolon/tab/space; '#' comments and blank
    lines are skipped.  Raises ValueError on ragged rows.
    """
    from common_tpu import native

    lib = native._load()
    if lib is not None and hasattr(lib, "ct_csv_shape"):
        cols = ctypes.c_long(0)
        rows = lib.ct_csv_shape(
            os.fsencode(path), ctypes.byref(cols)
        )
        if rows == -1:
            raise FileNotFoundError(path)
        if rows == -2:
            return np.empty((0, 0), np.float32)
        out = np.empty((rows, cols.value), np.float32)
        got = lib.ct_csv_load_f32(
            os.fsencode(path), out, rows, cols.value, n_threads
        )
        if got == -3:
            raise ValueError(
                f"{path}: ragged rows or unparseable fields "
                f"(expected {cols.value} columns per line)"
            )
        if got < 0:
            raise OSError(f"{path}: native csv load failed ({got})")
        return out[:got]

    # pure-numpy fallback
    with open(path) as f:
        first = ""
        for line in f:
            if line.strip() and not line.lstrip().startswith("#"):
                first = line
                break
    delim = "," if "," in first else (";" if ";" in first else None)
    arr = np.loadtxt(path, dtype=np.float32, comments="#", delimiter=delim,
                     ndmin=2)
    return np.ascontiguousarray(arr, np.float32)
