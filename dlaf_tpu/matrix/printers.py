"""Matrix printers for debugging.

Equivalent of the reference's ``print_numpy.h`` / ``print_csv.h``: dump a
distributed matrix in numpy-literal or CSV form (gathers to host).
"""

from __future__ import annotations

import sys

import numpy as np

from .matrix import DistMatrix


def print_numpy(mat: DistMatrix, name: str = "mat", file=None) -> None:
    """``name = np.array([...])`` form (reference ``print_numpy.h``)."""
    file = file or sys.stdout
    arr = np.asarray(mat.to_natural())
    with np.printoptions(threshold=np.inf, linewidth=120):
        inner = np.array2string(arr, separator=", ")
    print(f"{name} = np.array({inner})", file=file)


def print_csv(mat: DistMatrix, file=None) -> None:
    """One CSV row per matrix row (reference ``print_csv.h``)."""
    file = file or sys.stdout
    arr = np.asarray(mat.to_natural())
    for row in arr:
        print(",".join(repr(x) for x in row.tolist()), file=file)
