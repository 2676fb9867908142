"""Minimal reader for DOLFIN-written VTU/PVD files (zlib-compressed,
base64-inline, VTK 0.1 'binary' format) — enough to load the reference's
committed field snapshots (/root/reference/results/bench1/conc*.vtu,
written by dolfin/bench1.py:116-192) as golden data for field-level parity
tests. No VTK/meshio dependency.
"""

from __future__ import annotations

import base64
import os
import re
import zlib
import xml.etree.ElementTree as ET

import numpy as np

_DTYPES = {"Float64": np.float64, "Float32": np.float32,
           "Int64": np.int64, "Int32": np.int32,
           "UInt64": np.uint64, "UInt32": np.uint32, "UInt8": np.uint8}


def _decode_inline(text: str, dtype) -> np.ndarray:
    """VTK inline-binary payload with vtkZLibDataCompressor: base64(header)
    followed by base64(compressed blocks), where header is uint32
    [nblocks, blocksize, lastblocksize, csize_0..csize_{n-1}]."""
    s = "".join(text.split())
    nblocks = int(np.frombuffer(base64.b64decode(s[:8] + "=="), np.uint32,
                                count=1)[0])
    header_bytes = (3 + nblocks) * 4
    header_b64 = ((header_bytes + 2) // 3) * 4
    header = np.frombuffer(base64.b64decode(s[:header_b64]), np.uint32)
    csizes = header[3:3 + nblocks]
    blob = base64.b64decode(s[header_b64:])
    out, off = [], 0
    for cs in csizes:
        out.append(zlib.decompress(blob[off:off + int(cs)]))
        off += int(cs)
    return np.frombuffer(b"".join(out), dtype)


def read_vtu_points_and_field(path: str):
    """Returns (points [N, 3], {name: values [N, ...]}) for P1 point data."""
    root = ET.parse(path).getroot()
    piece = root.find(".//Piece")
    pts_da = piece.find("Points/DataArray")
    pts = _decode_inline(pts_da.text, _DTYPES[pts_da.get("type")])
    ncomp = int(pts_da.get("NumberOfComponents", "1"))
    pts = pts.reshape(-1, ncomp)
    fields = {}
    pdata = piece.find("PointData")
    if pdata is not None:
        for da in pdata.findall("DataArray"):
            v = _decode_inline(da.text, _DTYPES[da.get("type")])
            nc = int(da.get("NumberOfComponents", "1"))
            fields[da.get("Name")] = v.reshape(-1, nc) if nc > 1 else v
    return pts, fields


def read_pvd(path: str):
    """Returns [(timestep, vtu_path)] from a PVD collection."""
    root = ET.parse(path).getroot()
    base = os.path.dirname(os.path.abspath(path))
    return [(float(d.get("timestep")), os.path.join(base, d.get("file")))
            for d in root.iter("DataSet")]


def field_on_grid(path: str, nx: int, ny: int, hx: float, hy: float,
                  name: str | None = None):
    """Nodal values of a P1 field on a crossed mesh, reordered by coordinate
    into (vertex [ny+1, nx+1], center [ny, nx]) grids — DOLFIN's dof order
    is partition-dependent, but coordinates are canonical. Crossed meshes
    carry both corner vertices (integer multiples of h) and cell-center
    vertices (half-integer multiples)."""
    pts, fields = read_vtu_points_and_field(path)
    if name is None:
        name = next(iter(fields))
    v = fields[name]
    v = v if v.ndim == 1 else v[:, 0]
    fx = pts[:, 0] / hx
    fy = pts[:, 1] / hy
    is_vertex = (np.abs(fx - np.rint(fx)) < 1e-6) & \
        (np.abs(fy - np.rint(fy)) < 1e-6)
    vert = np.full((ny + 1, nx + 1), np.nan)
    vert[np.rint(fy[is_vertex]).astype(int),
         np.rint(fx[is_vertex]).astype(int)] = v[is_vertex]
    cent = np.full((ny, nx), np.nan)
    c = ~is_vertex
    cent[np.rint(fy[c] - 0.5).astype(int),
         np.rint(fx[c] - 0.5).astype(int)] = v[c]
    assert np.isfinite(vert).all() and np.isfinite(cent).all(), \
        f"{path}: crossed-mesh grids not fully covered"
    return vert, cent
