"""Pure-Python OBJ loader fallback (same subset as native/src/obj.cpp)."""

from __future__ import annotations

import numpy as np


def load_obj_python(path):
    vertices = []
    triangles = []
    with open(path, "r", errors="replace") as f:
        for line in f:
            if line.startswith(("v ", "v\t")):
                parts = line.split()
                if len(parts) >= 4:
                    vertices.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith(("f ", "f\t")):
                idx = []
                nv = len(vertices)
                for tok in line.split()[1:]:
                    head = tok.split("/")[0]
                    if not head:
                        continue
                    v = int(head)
                    v = v - 1 if v > 0 else nv + v
                    if 0 <= v < nv:
                        idx.append(v)
                for k in range(2, len(idx)):  # fan triangulation
                    triangles.append([idx[0], idx[k - 1], idx[k]])
    return (
        np.asarray(vertices, np.float32).reshape(-1, 3),
        np.asarray(triangles, np.int32).reshape(-1, 3),
    )
