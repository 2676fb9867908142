"""VTK ImageData (.vti) field output + PVD time-series index.

Replaces the reference's DOLFIN VTK writer (``df.File('*.pvd') << (c, t)``,
dolfin/bench2.py:178-182, 267-275). Structured grids map onto ImageData:
vertex dofs as PointData, crossed-grid cell-center dofs as CellData —
no unstructured connectivity tables.

Uses the native C++ writer (native/pfio.cc via ctypes) when built
(``make -C native``), else a byte-identical pure-Python fallback.
"""

from __future__ import annotations

import ctypes
import os
import struct

import numpy as np

_LIB = None
_LIB_TRIED = False


def _load_native():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    path = os.path.join(here, "native", "libpfio.so")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.pfio_write_vti.restype = ctypes.c_int
        lib.pfio_append_csv.restype = ctypes.c_int
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def _write_vti_python(path, nx, ny, nz, origin, spacing, point_fields,
                      cell_fields):
    xml = ['<?xml version="1.0"?>\n'
           '<VTKFile type="ImageData" version="1.0" byte_order="LittleEndian" '
           'header_type="UInt64">\n']
    pnz = nz if nz > 0 else 0
    xml.append(
        f'  <ImageData WholeExtent="0 {nx} 0 {ny} 0 {pnz}" '
        f'Origin="{origin[0]:.17g} {origin[1]:.17g} {origin[2]:.17g}" '
        f'Spacing="{spacing[0]:.17g} {spacing[1]:.17g} {spacing[2]:.17g}">\n')
    xml.append(f'    <Piece Extent="0 {nx} 0 {ny} 0 {pnz}">\n')
    appended = []
    offset = 0
    xml.append("      <PointData>\n")
    for name, arr in point_fields:
        xml.append(f'        <DataArray type="Float64" Name="{name}" '
                   f'format="appended" offset="{offset}"/>\n')
        raw = np.ascontiguousarray(arr, dtype="<f8").tobytes()
        appended.append(struct.pack("<Q", len(raw)) + raw)
        offset += 8 + len(raw)
    xml.append("      </PointData>\n      <CellData>\n")
    for name, arr in cell_fields:
        xml.append(f'        <DataArray type="Float64" Name="{name}" '
                   f'format="appended" offset="{offset}"/>\n')
        raw = np.ascontiguousarray(arr, dtype="<f8").tobytes()
        appended.append(struct.pack("<Q", len(raw)) + raw)
        offset += 8 + len(raw)
    xml.append("      </CellData>\n    </Piece>\n  </ImageData>\n")
    xml.append('  <AppendedData encoding="raw">\n_')
    with open(path, "wb") as f:
        f.write("".join(xml).encode())
        for blk in appended:
            f.write(blk)
        f.write(b"\n  </AppendedData>\n</VTKFile>\n")


def write_vti(path, nx, ny, nz, origin, spacing, point_fields, cell_fields=()):
    """point_fields / cell_fields: sequences of (name, C-ordered array).

    Point arrays are [nz+1, ny+1, nx+1] (or [ny+1, nx+1] in 2D); VTK expects
    x-fastest ordering, which matches our layout.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    lib = _load_native()
    point_fields = [(n, np.ascontiguousarray(a, dtype=np.float64))
                    for n, a in point_fields]
    cell_fields = [(n, np.ascontiguousarray(a, dtype=np.float64))
                   for n, a in cell_fields]
    if lib is None:
        return _write_vti_python(path, nx, ny, nz, origin, spacing,
                                 point_fields, cell_fields)
    pn = (ctypes.c_char_p * max(len(point_fields), 1))(
        *[n.encode() for n, _ in point_fields])
    pd = (ctypes.POINTER(ctypes.c_double) * max(len(point_fields), 1))(
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
          for _, a in point_fields])
    cn = (ctypes.c_char_p * max(len(cell_fields), 1))(
        *[n.encode() for n, _ in cell_fields])
    cd = (ctypes.POINTER(ctypes.c_double) * max(len(cell_fields), 1))(
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
          for _, a in cell_fields])
    rc = lib.pfio_write_vti(
        path.encode(), nx, ny, nz,
        ctypes.c_double(origin[0]), ctypes.c_double(origin[1]),
        ctypes.c_double(origin[2]),
        ctypes.c_double(spacing[0]), ctypes.c_double(spacing[1]),
        ctypes.c_double(spacing[2]),
        len(point_fields), pn, pd, len(cell_fields), cn, cd)
    if rc != 0:
        raise OSError(f"pfio_write_vti failed with code {rc} for {path}")


def write_state_vti(path, grid, w, field_names):
    """Dump a 2D crossed-grid state: vertices as PointData, centers as CellData."""
    v, m = w
    pf = [(name, np.asarray(v[i, : grid.ny + 1, : grid.nx + 1]))
          for i, name in enumerate(field_names)]
    cf = [(name + "_center", np.asarray(m[i, : grid.ny, : grid.nx]))
          for i, name in enumerate(field_names)]
    write_vti(path, grid.nx, grid.ny, 0, (0.0, 0.0, 0.0),
              (grid.hx, grid.hy, 1.0), pf, cf)


def write_state_vti_3d(path, grid, w, field_names):
    (v,) = w
    pf = [(name, np.asarray(v[i, : grid.nz + 1, : grid.ny + 1, : grid.nx + 1]))
          for i, name in enumerate(field_names)]
    write_vti(path, grid.nx, grid.ny, grid.nz, (0.0, 0.0, 0.0),
              (grid.hx, grid.hy, grid.hz), pf, [])


class PVDSeries:
    """PVD collection index (the df.File('*.pvd') equivalent)."""

    def __init__(self, path: str):
        self.path = path
        self.entries: list[tuple[float, str]] = []
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def add(self, t: float, vti_relpath: str) -> None:
        self.entries.append((t, vti_relpath))
        self.flush()

    def flush(self) -> None:
        lines = ['<?xml version="1.0"?>\n'
                 '<VTKFile type="Collection" version="0.1" '
                 'byte_order="LittleEndian">\n  <Collection>\n']
        for t, f in self.entries:
            lines.append(f'    <DataSet timestep="{t:.10g}" part="0" file="{f}"/>\n')
        lines.append("  </Collection>\n</VTKFile>\n")
        with open(self.path, "w") as fp:
            fp.write("".join(lines))
