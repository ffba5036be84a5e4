"""Self-contained PLY reader/writer (no plyfile dependency).

Supports ascii 1.0, binary_little_endian 1.0 and binary_big_endian 1.0
with arbitrary scalar vertex properties (list properties on non-vertex
elements, e.g. faces, are skipped for ascii and parsed for binary only when
needed).  The reference uses the external ``plyfile`` package and reads
the 'vertex' element's named properties (reference:
traj_ball_renderer.py:236-277); this module exposes the same
property-by-name access through a plain dict of numpy arrays.
"""

from __future__ import annotations

import io as _io
from typing import Dict, List, Tuple

import numpy as np

_PLY_TO_NUMPY = {
    "char": "i1", "int8": "i1",
    "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2",
    "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4",
    "double": "f8", "float64": "f8",
}


class PlyHeader:
    def __init__(self):
        self.format: str = ""
        # list of (element_name, count, [(prop_name, dtype | ("list", idx_t, val_t))])
        self.elements: List[Tuple[str, int, list]] = []
        self.header_length: int = 0


def _parse_header(data: bytes) -> PlyHeader:
    end = data.find(b"end_header")
    if not data.startswith(b"ply") or end < 0:
        raise ValueError("not a PLY file")
    end = data.find(b"\n", end) + 1
    header = PlyHeader()
    header.header_length = end
    current_props = None
    for raw_line in data[:end].decode("ascii", errors="replace").splitlines():
        parts = raw_line.strip().split()
        if not parts:
            continue
        if parts[0] == "format":
            header.format = parts[1]
        elif parts[0] == "element":
            current_props = []
            header.elements.append((parts[1], int(parts[2]), current_props))
        elif parts[0] == "property" and current_props is not None:
            if parts[1] == "list":
                current_props.append((parts[4], ("list", _PLY_TO_NUMPY[parts[2]],
                                                 _PLY_TO_NUMPY[parts[3]])))
            else:
                current_props.append((parts[2], _PLY_TO_NUMPY[parts[1]]))
    return header


def read_ply(path) -> Dict[str, Dict[str, np.ndarray]]:
    """Read a PLY file into {element_name: {property_name: array}}."""
    with open(path, "rb") as f:
        data = f.read()
    header = _parse_header(data)
    body = data[header.header_length:]
    out: Dict[str, Dict[str, np.ndarray]] = {}

    if header.format == "ascii":
        text = body.decode("ascii")
        tokens = text.split()
        pos = 0
        for name, count, props in header.elements:
            has_list = any(isinstance(d, tuple) for _, d in props)
            if has_list:
                # Ragged rows (e.g. faces): parse row by row.
                rows = []
                for _ in range(count):
                    row = []
                    for _, dt in props:
                        if isinstance(dt, tuple):
                            n = int(tokens[pos]); pos += 1
                            row.append([float(tokens[pos + k]) for k in range(n)])
                            pos += n
                        else:
                            row.append(float(tokens[pos])); pos += 1
                    rows.append(row)
                out[name] = {"_rows": rows, "_props": [p for p, _ in props]}
            else:
                n_props = len(props)
                flat = np.array(tokens[pos: pos + count * n_props], dtype=np.float64)
                pos += count * n_props
                flat = flat.reshape(count, n_props)
                out[name] = {
                    # d is already a numpy short code ('f4', 'i2', ...)
                    # straight from _parse_header's _PLY_TO_NUMPY lookup.
                    p: flat[:, i].astype(d)
                    for i, (p, d) in enumerate(props)
                }
        return out

    byte_order = "<" if header.format == "binary_little_endian" else ">"
    offset = 0
    for name, count, props in header.elements:
        has_list = any(isinstance(d, tuple) for _, d in props)
        if not has_list:
            dtype = np.dtype([(p, byte_order + d) for p, d in props])
            arr = np.frombuffer(body, dtype=dtype, count=count, offset=offset)
            offset += dtype.itemsize * count
            out[name] = {p: np.ascontiguousarray(arr[p]) for p, _ in props}
        else:
            # Ragged binary rows — walk them.
            rows = []
            stream = _io.BytesIO(body)
            stream.seek(offset)
            for _ in range(count):
                row = []
                for _, dt in props:
                    if isinstance(dt, tuple):
                        _, idx_t, val_t = dt
                        n = int(np.frombuffer(
                            stream.read(np.dtype(idx_t).itemsize),
                            dtype=byte_order + idx_t)[0])
                        vals = np.frombuffer(
                            stream.read(np.dtype(val_t).itemsize * n),
                            dtype=byte_order + val_t)
                        row.append(vals)
                    else:
                        row.append(np.frombuffer(
                            stream.read(np.dtype(dt).itemsize),
                            dtype=byte_order + dt)[0])
                rows.append(row)
            offset = stream.tell()
            out[name] = {"_rows": rows, "_props": [p for p, _ in props]}
    return out


def write_ply(path, positions, velocities=None, normals=None, binary=True):
    """Write an (N,3) cloud, optionally with vx/vy/vz or nx/ny/nz properties."""
    positions = np.asarray(positions, np.float32)
    n = positions.shape[0]
    props = [("x", "f4"), ("y", "f4"), ("z", "f4")]
    columns = [positions[:, 0], positions[:, 1], positions[:, 2]]
    if velocities is not None:
        velocities = np.asarray(velocities, np.float32)
        props += [("vx", "f4"), ("vy", "f4"), ("vz", "f4")]
        columns += [velocities[:, 0], velocities[:, 1], velocities[:, 2]]
    if normals is not None:
        normals = np.asarray(normals, np.float32)
        props += [("nx", "f4"), ("ny", "f4"), ("nz", "f4")]
        columns += [normals[:, 0], normals[:, 1], normals[:, 2]]

    fmt = "binary_little_endian" if binary else "ascii"
    header_lines = ["ply", f"format {fmt} 1.0", f"element vertex {n}"]
    type_names = {"f4": "float"}
    header_lines += [f"property {type_names[d]} {p}" for p, d in props]
    header_lines.append("end_header")
    header = ("\n".join(header_lines) + "\n").encode("ascii")

    with open(path, "wb") as f:
        f.write(header)
        if binary:
            rec = np.empty(n, dtype=np.dtype([(p, "<" + d) for p, d in props]))
            for (p, _), col in zip(props, columns):
                rec[p] = col
            f.write(rec.tobytes())
        else:
            mat = np.column_stack(columns)
            for row in mat:
                f.write((" ".join(f"{v:.9g}" for v in row) + "\n").encode("ascii"))
