"""Minimal PLY point-cloud I/O (pure numpy — no open3d dependency).

The reference reads fragments with ``o3d.io.read_point_cloud``
(``/root/reference/utils/dataset.py:105``) and ``utils/utils_o3d.py``.
This parser covers the formats those datasets actually use: ascii and
binary_little_endian, vertex elements with float/double properties.
"""

from __future__ import annotations

import numpy as np

_PLY_DTYPES = {
    "char": "i1",
    "int8": "i1",
    "uchar": "u1",
    "uint8": "u1",
    "short": "i2",
    "int16": "i2",
    "ushort": "u2",
    "uint16": "u2",
    "int": "i4",
    "int32": "i4",
    "uint": "u4",
    "uint32": "u4",
    "float": "f4",
    "float32": "f4",
    "double": "f8",
    "float64": "f8",
}


def read_ply(path: str) -> np.ndarray:
    """Read vertex x/y/z from a PLY file -> (N, 3) float64."""
    with open(path, "rb") as f:
        header_lines = []
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            header_lines.append(line)
            if line == "end_header":
                break
            if len(header_lines) > 1000:
                raise ValueError(f"{path}: runaway PLY header")

        fmt = None
        elements = []  # (name, count, [(prop_name, dtype_str)])
        cur = None
        for line in header_lines:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "element":
                cur = (parts[1], int(parts[2]), [])
                elements.append(cur)
            elif parts[0] == "property" and cur is not None:
                if parts[1] == "list":
                    cur[2].append((parts[-1], ("list", parts[2], parts[3])))
                else:
                    cur[2].append((parts[-1], _PLY_DTYPES[parts[1]]))

        if fmt is None:
            raise ValueError(f"{path}: no PLY format line")
        if fmt == "binary_big_endian":
            endian = ">"
        elif fmt == "binary_little_endian":
            endian = "<"
        else:
            endian = None  # ascii

        for name, count, props in elements:
            if name != "vertex":
                # skip non-vertex elements that come BEFORE vertex (rare);
                # elements after vertex need no handling for reading xyz
                if any(isinstance(d, tuple) for _, d in props):
                    raise ValueError(f"{path}: list property before vertex")
                if endian:
                    itemsize = sum(np.dtype(d).itemsize for _, d in props)
                    f.seek(count * itemsize, 1)
                else:
                    for _ in range(count):
                        f.readline()
                continue
            if any(isinstance(d, tuple) for _, d in props):
                raise ValueError(f"{path}: list property in vertex element")
            names = [n for n, _ in props]
            if endian:
                dt = np.dtype([(n, endian + d) for n, d in props])
                data = np.frombuffer(f.read(count * dt.itemsize), dtype=dt, count=count)
            else:
                raw = np.loadtxt(
                    f, max_rows=count, dtype=np.float64, ndmin=2
                )
                data = {n: raw[:, i] for i, (n, _) in enumerate(props)}
            return np.stack(
                [np.asarray(data["x"], np.float64),
                 np.asarray(data["y"], np.float64),
                 np.asarray(data["z"], np.float64)],
                axis=1,
            )
    raise ValueError(f"{path}: no vertex element found")


def write_ply(path: str, points: np.ndarray) -> None:
    """Write (N, 3) points as binary_little_endian PLY."""
    pts = np.ascontiguousarray(points, dtype=np.float32)
    with open(path, "wb") as f:
        f.write(
            (
                "ply\nformat binary_little_endian 1.0\n"
                f"element vertex {len(pts)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                "end_header\n"
            ).encode("ascii")
        )
        f.write(pts.tobytes())
