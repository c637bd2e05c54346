"""ParaView output: VTU time series + PVD collections.

Parity: ``ParaViewWriter`` / ``store_timestep!`` / ``store_timestep_field!``
(``src/ferrite-addons/io.jl:3-89``). Host-side, setup/IO tier — never in the
jitted hot loop. Files are VTK XML unstructured grids with base64-encoded
binary payloads (self-contained, no external deps).
"""

from __future__ import annotations

import base64
import os
import struct
from typing import Dict, Optional

import numpy as np

from thunderbolt_tpu.mesh.mesh import Mesh


def _b64(arr: np.ndarray) -> str:
    raw = arr.tobytes()
    header = struct.pack("<I", len(raw))
    return base64.b64encode(header + raw).decode()


_VTK_DTYPES = {
    np.dtype("float32"): "Float32", np.dtype("float64"): "Float64",
    np.dtype("int32"): "Int32", np.dtype("int64"): "Int64",
    np.dtype("uint8"): "UInt8",
}


def _data_array(name, arr, ncomp=1):
    arr = np.ascontiguousarray(arr)
    vtype = _VTK_DTYPES[arr.dtype]
    comp = f' NumberOfComponents="{ncomp}"' if ncomp > 1 else ""
    return (f'<DataArray type="{vtype}" Name="{name}"{comp} '
            f'format="binary">\n{_b64(arr)}\n</DataArray>\n')


def write_vtu(path: str, mesh: Mesh,
              point_data: Optional[Dict[str, np.ndarray]] = None,
              cell_data: Optional[Dict[str, np.ndarray]] = None):
    """Write one unstructured-grid snapshot."""
    nodes = np.asarray(mesh.nodes, dtype=np.float64)
    if nodes.shape[1] < 3:
        nodes = np.pad(nodes, ((0, 0), (0, 3 - nodes.shape[1])))
    conn, offsets, types = [], [], []
    off = 0
    for b in mesh.blocks:
        el = b.element
        for c in range(b.ncells):
            conn.append(b.connectivity[c])
            off += el.nnodes
            offsets.append(off)
            types.append(el.vtk_type)
    connectivity = np.concatenate(conn).astype(np.int64)
    offsets = np.asarray(offsets, dtype=np.int64)
    types = np.asarray(types, dtype=np.uint8)

    parts = ['<?xml version="1.0"?>\n'
             '<VTKFile type="UnstructuredGrid" version="1.0" '
             'byte_order="LittleEndian" header_type="UInt32">\n'
             '<UnstructuredGrid>\n'
             f'<Piece NumberOfPoints="{mesh.nnodes}" '
             f'NumberOfCells="{mesh.ncells}">\n']
    parts.append("<Points>\n")
    parts.append(_data_array("Points", nodes, ncomp=3))
    parts.append("</Points>\n<Cells>\n")
    parts.append(_data_array("connectivity", connectivity))
    parts.append(_data_array("offsets", offsets))
    parts.append(_data_array("types", types))
    parts.append("</Cells>\n")

    parts.append("<PointData>\n")
    for name, arr in (point_data or {}).items():
        arr = np.asarray(arr)
        ncomp = 1 if arr.ndim == 1 else arr.shape[1]
        if ncomp == 2:  # ParaView wants 3-vectors
            arr = np.pad(arr, ((0, 0), (0, 1)))
            ncomp = 3
        parts.append(_data_array(name, arr.astype(np.float32), ncomp))
    parts.append("</PointData>\n<CellData>\n")
    for name, arr in (cell_data or {}).items():
        parts.append(_data_array(name, np.asarray(arr, dtype=np.float32)))
    parts.append("</CellData>\n</Piece>\n</UnstructuredGrid>\n</VTKFile>\n")
    with open(path, "w") as f:
        f.write("".join(parts))


class ParaViewWriter:
    """PVD collection of per-timestep VTU files.

    Usage parity with the reference (``ep01_spiral-wave.jl:179-186``):

        io = ParaViewWriter("sim_dir")
        io.store_timestep(t, mesh, {"phi": phi_nodal})
        io.finalize()
    """

    def __init__(self, name: str, directory: str = "."):
        self.dir = os.path.join(directory, name)
        os.makedirs(self.dir, exist_ok=True)
        self.name = os.path.basename(name)
        self.entries = []

    def store_timestep(self, t, mesh: Mesh, point_data=None, cell_data=None):
        fname = f"{self.name}_{len(self.entries):05d}.vtu"
        write_vtu(os.path.join(self.dir, fname), mesh,
                  point_data=point_data, cell_data=cell_data)
        self.entries.append((float(t), fname))
        return self

    def finalize_timestep(self, t=None):
        """Rewrite the .pvd after a timestep so the collection stays valid
        if the run dies mid-simulation (parity: ``finalize_timestep!``,
        ``src/ferrite-addons/io.jl:81`` — the reference flushes its pvd
        per step for exactly this crash-resume reason). ``t`` is accepted
        only for reference-signature parity: the collection is rewritten
        from ALL stored entries regardless (the entry timestamps come from
        ``store_timestep``)."""
        return self.finalize()

    def finalize(self):
        lines = ['<?xml version="1.0"?>\n'
                 '<VTKFile type="Collection" version="1.0" '
                 'byte_order="LittleEndian">\n<Collection>\n']
        for t, fname in self.entries:
            lines.append(f'<DataSet timestep="{t}" part="0" file="{fname}"/>\n')
        lines.append("</Collection>\n</VTKFile>\n")
        with open(os.path.join(self.dir, f"{self.name}.pvd"), "w") as f:
            f.write("".join(lines))
        return self


def read_vtu(path: str):
    """Read back a VTU written by ``write_vtu`` (parity:
    ``read_vtk_cobivec``, ``src/ferrite-addons/io.jl:264``). Returns
    (nodes [n,3], blocks {vtk_type: conn}, point_data {name: array})."""
    import xml.etree.ElementTree as ET

    def _decode(da):
        raw = base64.b64decode(da.text.strip())
        n = struct.unpack("<I", raw[:4])[0]
        body = raw[4:4 + n]
        dt = {"Float32": np.float32, "Float64": np.float64,
              "Int32": np.int32, "Int64": np.int64,
              "UInt8": np.uint8}[da.get("type")]
        arr = np.frombuffer(body, dtype=dt)
        ncomp = int(da.get("NumberOfComponents", "1"))
        return arr.reshape(-1, ncomp) if ncomp > 1 else arr

    root = ET.parse(path).getroot()
    piece = root.find(".//Piece")
    points = None
    for da in piece.find("Points").iter("DataArray"):
        points = _decode(da)
    cells = {}
    for da in piece.find("Cells").iter("DataArray"):
        cells[da.get("Name")] = _decode(da)
    point_data = {}
    pd = piece.find("PointData")
    if pd is not None:
        for da in pd.iter("DataArray"):
            point_data[da.get("Name")] = _decode(da)
    # split connectivity by cell type
    conn, offs, types = cells["connectivity"], cells["offsets"], cells["types"]
    blocks = {}
    start = 0
    for off, tp in zip(offs, types):
        blocks.setdefault(int(tp), []).append(conn[start:off])
        start = off
    blocks = {tp: np.asarray(v) for tp, v in blocks.items()}
    return points, blocks, point_data
