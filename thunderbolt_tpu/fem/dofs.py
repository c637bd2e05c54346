"""Dof distribution: the TPU-native DofHandler.

Parity target: Ferrite's ``DofHandler``/``SubDofHandler`` as used throughout
the reference (re-exported at ``src/Thunderbolt.jl:107``; subdomain
registration pattern ``src/ferrite-addons/collections.jl:239-264``).

Design (SURVEY.md §7): dofs are numbered **field-major** — every field owns a
contiguous global range, with components interleaved per entity. The output
of ``close()`` is a set of static int32 gather/scatter tables
``cell_dofs[ncells, ndofs_per_cell]`` per (field, block) pair; these are the
only thing device kernels ever see. Entities are vertices, edges (sorted
corner pairs), faces (sorted corner 4-tuples, hex27) and cell interiors.
"""

from __future__ import annotations

import numpy as np
from dataclasses import dataclass, field as dfield
from typing import Dict, List, Optional, Tuple

from thunderbolt_tpu.mesh.mesh import Mesh
from thunderbolt_tpu.mesh.elements import get_element


_P2_FAMILY = {"line2": "line3", "tri3": "tri6", "quad4": "quad9",
              "tet4": "tet10", "hex8": "hex27"}
_P1_FAMILY = {v: k for k, v in _P2_FAMILY.items()}


def field_element_name(celltype: str, order: int) -> str:
    """Element of the same family as `celltype` with polynomial `order`."""
    el = get_element(celltype)
    if order == el.order:
        return celltype
    if order == 1:
        return _P1_FAMILY[celltype]
    if order == 2:
        return _P2_FAMILY[celltype]
    raise ValueError(f"unsupported order {order}")


@dataclass
class FieldInfo:
    name: str
    order: int
    ncomponents: int
    subdomains: Tuple[Optional[str], ...]  # cellset names; (None,) = everywhere
    offset: int = 0          # first global dof of this field
    nentities: int = 0       # entities carrying dofs
    entity_coords: np.ndarray = None  # [nentities, sdim] representative coords
    entity_nodes: np.ndarray = None   # [nentities] mesh node id or -1

    @property
    def ndofs(self):
        return self.nentities * self.ncomponents


@dataclass
class SubDofData:
    """Per (field, block, subdomain) static assembly tables."""
    field: str
    block_index: int
    celltype: str          # the *geometry* cell type
    field_celltype: str    # element carrying the field's basis
    cells: np.ndarray      # global cell ids [nc]
    local_cells: np.ndarray  # block-local cell ids [nc]
    cell_dofs: np.ndarray  # int32 [nc, nbase*ncomp] global dofs
    cell_entities: np.ndarray  # int32 [nc, nbase] field-local entity ids


class DofHandler:
    """Distribute dofs for named fields over (subsets of) the mesh."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh
        self.fields: Dict[str, FieldInfo] = {}
        self._order: List[str] = []
        self.subdofs: List[SubDofData] = []
        self.ndofs = 0
        self._closed = False

    def add_field(self, name: str, order: int = 1, ncomponents: int = 1,
                  subdomains=None):
        assert not self._closed
        if subdomains is None:
            subdomains = (None,)
        elif isinstance(subdomains, str):
            subdomains = (subdomains,)
        self.fields[name] = FieldInfo(name, order, ncomponents, tuple(subdomains))
        self._order.append(name)
        return self

    # ------------------------------------------------------------------

    def close(self):
        assert not self._closed
        mesh = self.mesh
        offset = 0
        for fname in self._order:
            fi = self.fields[fname]
            fi.offset = offset
            entity_ids: Dict[tuple, int] = {}
            entity_coords: List[np.ndarray] = []

            def ent(key, coord):
                if key not in entity_ids:
                    entity_ids[key] = len(entity_ids)
                    entity_coords.append(coord)
                return entity_ids[key]

            # restrict to subdomain cells per block
            sub_cells = set()
            for sd in fi.subdomains:
                sub_cells.update(mesh.cellset(sd).tolist())

            # pre-assign VERTEX entities in mesh-node order: dof numbering
            # then follows the mesh bandwidth, which keeps the sparsity's
            # col-row offset set small — the precondition for the DIA SpMV
            # fast path (fem/sparsity.DIAMatrix). First-touch ordering would
            # scramble structured grids into gather-bound ELL.
            touched = np.zeros(mesh.nnodes, dtype=bool)
            for bi_, b_ in enumerate(mesh.blocks):
                gcells_ = np.arange(b_.cell_offset,
                                    b_.cell_offset + b_.ncells)
                mask_ = np.isin(gcells_, list(sub_cells)) \
                    if len(sub_cells) < mesh.ncells \
                    else np.ones(b_.ncells, bool)
                if not mask_.any():
                    continue
                gel_ = b_.element
                fel_ = get_element(field_element_name(b_.celltype, fi.order))
                conn_ = b_.connectivity[mask_]
                if fel_.name == b_.celltype:
                    touched[np.unique(conn_)] = True
                elif fi.order < gel_.order:
                    vidx = [gel_.vertices[v] for v in fel_.vertices]
                    touched[np.unique(conn_[:, vidx])] = True
                else:
                    touched[np.unique(conn_[:, list(fel_.vertices)])] = True
            for nidx in np.nonzero(touched)[0]:
                ent(("n", int(nidx)), mesh.nodes[nidx])

            for bi, b in enumerate(mesh.blocks):
                gcells = np.arange(b.cell_offset, b.cell_offset + b.ncells)
                mask = np.isin(gcells, list(sub_cells)) if len(sub_cells) < mesh.ncells \
                    else np.ones(b.ncells, bool)
                lc = np.nonzero(mask)[0]
                if lc.size == 0:
                    continue
                gel = b.element
                fel_name = field_element_name(b.celltype, fi.order)
                fel = get_element(fel_name)
                conn = b.connectivity[lc]
                nc = lc.size
                nb = fel.nnodes
                cell_ent = np.zeros((nc, nb), dtype=np.int64)

                nodes = mesh.nodes
                if fel_name == b.celltype:
                    # isoparametric: one entity per mesh node of the cell
                    for j in range(nb):
                        for c in range(nc):
                            nidx = int(conn[c, j])
                            cell_ent[c, j] = ent(("n", nidx), nodes[nidx])
                elif fi.order < gel.order:
                    # P1 field on P2 mesh: corner nodes only
                    for j, v in enumerate(fel.vertices):
                        for c in range(nc):
                            nidx = int(conn[c, gel.vertices[v]])
                            cell_ent[c, j] = ent(("n", nidx), nodes[nidx])
                else:
                    # P2 field on P1 mesh: vertices + generated edge/face/center
                    nv = len(fel.vertices)
                    for j in range(nv):
                        for c in range(nc):
                            nidx = int(conn[c, j])
                            cell_ent[c, j] = ent(("n", nidx), nodes[nidx])
                    col = nv
                    for (a, bb) in fel.edges:
                        for c in range(nc):
                            key = tuple(sorted((int(conn[c, a]), int(conn[c, bb]))))
                            cell_ent[c, col] = ent(
                                ("e",) + key, nodes[list(key)].mean(axis=0))
                        col += 1
                    for f in fel.faces:
                        for c in range(nc):
                            key = tuple(sorted(int(conn[c, v]) for v in f))
                            cell_ent[c, col] = ent(
                                ("f",) + key, nodes[list(key)].mean(axis=0))
                        col += 1
                    if fel.has_center_node:
                        for c in range(nc):
                            key = ("c", int(gcells[lc[c]]))
                            cell_ent[c, col] = ent(
                                key, nodes[conn[c]].mean(axis=0))
                        col += 1
                    assert col == nb

                ncomp = fi.ncomponents
                cd = (offset + cell_ent[:, :, None] * ncomp
                      + np.arange(ncomp)[None, None, :]).reshape(nc, nb * ncomp)
                self.subdofs.append(SubDofData(
                    field=fname, block_index=bi, celltype=b.celltype,
                    field_celltype=fel_name,
                    cells=gcells[lc], local_cells=lc,
                    cell_dofs=cd.astype(np.int32),
                    cell_entities=cell_ent.astype(np.int32),
                ))

            fi.nentities = len(entity_ids)
            fi.entity_coords = (np.vstack(entity_coords)
                                if entity_coords else np.zeros((0, mesh.sdim)))
            # mesh-node id of each vertex entity (-1 for edge/face/interior
            # entities) — the dof <-> node permutation for IO and probes
            fi.entity_nodes = np.full(fi.nentities, -1, dtype=np.int64)
            for key, eid in entity_ids.items():
                if key[0] == "n":
                    fi.entity_nodes[eid] = key[1]
            offset += fi.ndofs
        self.ndofs = offset
        self._closed = True
        return self

    # ------------------------------------------------------------------

    def field_range(self, name: str):
        fi = self.fields[name]
        return fi.offset, fi.offset + fi.ndofs

    def field_dof_coords(self, name: str) -> np.ndarray:
        """[nentities, sdim] — coordinate of each dof entity (per component
        dofs share the entity coordinate)."""
        return self.fields[name].entity_coords

    def subdata(self, field: str, block_index: int = None):
        out = [s for s in self.subdofs if s.field == field
               and (block_index is None or s.block_index == block_index)]
        return out

    def node_dofs(self, field: str, node_ids: np.ndarray,
                  component: int = 0) -> np.ndarray:
        """Global dofs of a field at given mesh nodes (vertex entities).

        Used to translate nodesets into Dirichlet dof lists — the analog of
        Ferrite's ``ConstraintHandler`` dof lookup.
        """
        fi = self.fields[field]
        # build node -> entity map from subdata tables
        nodemap = {}
        for s in self.subdata(field):
            gel = get_element(s.celltype)
            fel = get_element(s.field_celltype)
            conn = self.mesh.blocks[s.block_index].connectivity[s.local_cells]
            if s.field_celltype == s.celltype:
                geo_idx = list(range(fel.nnodes))
            elif fi.order < gel.order:
                geo_idx = [gel.vertices[v] for v in fel.vertices]
            else:
                geo_idx = list(fel.vertices)
            for j, gj in enumerate(geo_idx):
                for c in range(conn.shape[0]):
                    nodemap[int(conn[c, gj])] = int(s.cell_entities[c, j])
        out = []
        for n in np.asarray(node_ids).ravel():
            if int(n) in nodemap:
                out.append(fi.offset + nodemap[int(n)] * fi.ncomponents + component)
        return np.unique(np.asarray(out, dtype=np.int64))
