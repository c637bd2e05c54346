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
              "tet4": "tet10", "hex8": "hex27", "wedge6": "wedge18"}
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
    entity_parents: np.ndarray = None  # [nentities, 8] parent nodes, -1 pad

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
                # only non-bulk paths (rare) land here
                if key not in entity_ids:
                    entity_ids[key] = len(entity_ids)
                    entity_coords.append(np.atleast_2d(coord))
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
            vert_nodes = np.nonzero(touched)[0]
            entity_ids.update(
                (("n", int(n)), i) for i, n in enumerate(vert_nodes))
            entity_coords.append(mesh.nodes[vert_nodes])
            node2ent_field = np.full(mesh.nnodes, -1, dtype=np.int64)
            node2ent_field[vert_nodes] = np.arange(vert_nodes.size)

            # ---- pass 1: collect higher-order entity keys per kind ----
            # (edges as sorted pairs, faces as sorted 4-tuples, centers as
            # global cell ids), bulk-deduplicated with np.unique — no
            # per-entity Python loops.
            block_meta = []
            edge_keys, face_keys, center_keys = [], [], []
            for bi, b in enumerate(mesh.blocks):
                gcells = np.arange(b.cell_offset, b.cell_offset + b.ncells)
                mask = np.isin(gcells, list(sub_cells)) \
                    if len(sub_cells) < mesh.ncells \
                    else np.ones(b.ncells, bool)
                lc = np.nonzero(mask)[0]
                if lc.size == 0:
                    continue
                gel = b.element
                fel_name = field_element_name(b.celltype, fi.order)
                fel = get_element(fel_name)
                conn = b.connectivity[lc]
                meta = {"bi": bi, "lc": lc, "gel": gel, "fel": fel,
                        "fel_name": fel_name, "conn": conn,
                        "gcells": gcells[lc]}
                if fel_name != b.celltype and fi.order > gel.order:
                    e = [np.sort(conn[:, [a, bb]], axis=1)
                         for (a, bb) in fel.edges]
                    meta["edges"] = np.stack(e, axis=1)     # [nc, ne, 2]
                    edge_keys.append(meta["edges"].reshape(-1, 2))
                    if fel.faces:
                        f = [np.sort(conn[:, list(ff)], axis=1)
                             for ff in fel.faces]
                        meta["faces"] = np.stack(f, axis=1)  # [nc, nf, 4]
                        face_keys.append(meta["faces"].reshape(-1, 4))
                    if fel.has_center_node:
                        center_keys.append(meta["gcells"])
                block_meta.append(meta)

            nverts = len(entity_ids)

            def bulk_ids(key_list, width):
                if not key_list:
                    return None, None, 0
                allk = np.concatenate(key_list).astype(np.int64)
                flat = np.zeros(len(allk), dtype=np.int64)
                for w in range(width):
                    flat = flat * (mesh.nnodes + 1) + allk[:, w]
                uniq_flat, first, inv = np.unique(
                    flat, return_index=True, return_inverse=True)
                return allk[first], inv, uniq_flat.size

            euniq, einv, nedges = bulk_ids(edge_keys, 2)
            funiq, finv, nfaces = bulk_ids(face_keys, 4)
            cuniq = (np.concatenate(center_keys)
                     if center_keys else np.zeros(0, np.int64))
            cuniq, cinv = np.unique(cuniq, return_inverse=True) \
                if cuniq.size else (cuniq, None)
            e_base = nverts
            f_base = e_base + nedges
            c_base = f_base + nfaces
            total_entities = c_base + cuniq.size

            # entity coordinates: verts already appended; edges/faces are
            # parent means; centers are cell-node means
            if nedges:
                entity_coords.append(mesh.nodes[euniq].mean(axis=1))
            if nfaces:
                entity_coords.append(mesh.nodes[funiq].mean(axis=1))
            center_coord_rows = []

            # ---- pass 2: build the per-block tables ----
            e_off = f_off = c_off = 0
            for meta in block_meta:
                bi, lc, conn = meta["bi"], meta["lc"], meta["conn"]
                gel, fel = meta["gel"], meta["fel"]
                fel_name = meta["fel_name"]
                b = mesh.blocks[bi]
                nc = lc.size
                nb = fel.nnodes
                cell_ent = np.zeros((nc, nb), dtype=np.int64)
                node2ent = node2ent_field
                if fel_name == b.celltype:
                    cell_ent[:, :] = node2ent[conn]
                elif fi.order < gel.order:
                    vidx = [gel.vertices[v] for v in fel.vertices]
                    cell_ent[:, :] = node2ent[conn[:, vidx]]
                else:
                    nv = len(fel.vertices)
                    cell_ent[:, :nv] = node2ent[conn[:, :nv]]
                    ne = len(fel.edges)
                    cell_ent[:, nv:nv + ne] = e_base + einv[
                        e_off:e_off + nc * ne].reshape(nc, ne)
                    e_off += nc * ne
                    col = nv + ne
                    if fel.faces:
                        nf = len(fel.faces)
                        cell_ent[:, col:col + nf] = f_base + finv[
                            f_off:f_off + nc * nf].reshape(nc, nf)
                        f_off += nc * nf
                        col += nf
                    if fel.has_center_node:
                        cell_ent[:, col] = c_base + cinv[c_off:c_off + nc]
                        c_off += nc
                        col += 1
                        center_coord_rows.append(
                            (cinv[c_off - nc:c_off],
                             mesh.nodes[conn].mean(axis=1)))
                assert (cell_ent >= 0).all()

                ncomp = fi.ncomponents
                cd = (offset + cell_ent[:, :, None] * ncomp
                      + np.arange(ncomp)[None, None, :]).reshape(nc, nb * ncomp)
                self.subdofs.append(SubDofData(
                    field=fname, block_index=bi, celltype=b.celltype,
                    field_celltype=fel_name,
                    cells=meta["gcells"], local_cells=lc,
                    cell_dofs=cd.astype(np.int32),
                    cell_entities=cell_ent.astype(np.int32),
                ))

            if cuniq.size:
                ccoords = np.zeros((cuniq.size, mesh.sdim))
                for idxs, vals in center_coord_rows:
                    ccoords[idxs] = vals
                entity_coords.append(ccoords)
            # register the generated entities so nentities is consistent
            n_extra = nedges + nfaces + cuniq.size
            total = nverts + n_extra

            fi.nentities = total
            fi.entity_coords = (np.vstack(entity_coords)
                                if entity_coords else np.zeros((0, mesh.sdim)))
            assert fi.entity_coords.shape[0] == total, \
                (fi.entity_coords.shape, total)
            # mesh-node id of each vertex entity (-1 for edge/face/interior
            # entities) — the dof <-> node permutation for IO and probes
            fi.entity_nodes = np.full(fi.nentities, -1, dtype=np.int64)
            fi.entity_nodes[:vert_nodes.size] = vert_nodes
            # parent mesh nodes of each entity (-1 padded): vertices are
            # their own parent, edges/faces their corner tuples, centers the
            # cell corners — the p-multigrid transfer table (PMGPrecon
            # parity, solver/multigrid.py)
            par = np.full((total, 8), -1, dtype=np.int64)
            par[:vert_nodes.size, 0] = vert_nodes
            if nedges:
                par[e_base:e_base + nedges, :2] = euniq
            if nfaces:
                par[f_base:f_base + nfaces, :4] = funiq
            for k in range(cuniq.size):
                bi2, lc2 = mesh.block_of_cell(int(cuniq[k]))
                bb = mesh.blocks[bi2]
                vv = bb.connectivity[lc2, list(bb.element.vertices)]
                par[c_base + k, :vv.size] = vv
            fi.entity_parents = par
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


def field_dof_mapping(dh_src: "DofHandler", field_src: str,
                      dh_dst: "DofHandler", field_dst: str) -> np.ndarray:
    """For every dof of ``field_src`` (in ``dh_src``'s layout), the global
    index of the matching ``field_dst`` dof in ``dh_dst``'s solution vector:
    ``u_small = u_big[mapping]`` gathers the field out of the bigger handler
    and ``u_big[mapping] = u_small`` scatters it back. This is the stage
    wiring a Newmark-style solver uses to view a displacement living in a
    (d, v) handler (parity: ``field_dof_mapping`` / ``SolutionVectorMapping``,
    ``test/test_solution_vector_mapping.jl``).

    Both fields must have the same interpolation (order, components,
    subdomains); entities are matched by identical deterministic numbering,
    validated by entity node ids and coordinates."""
    fs, fd = dh_src.fields[field_src], dh_dst.fields[field_dst]
    if (fs.order, fs.ncomponents) != (fd.order, fd.ncomponents):
        raise ValueError(
            f"field interpolations differ: {field_src} is order {fs.order} "
            f"x{fs.ncomponents}, {field_dst} is order {fd.order} "
            f"x{fd.ncomponents}")
    if fs.nentities != fd.nentities:
        raise ValueError(
            f"fields cover different entity sets ({fs.nentities} vs "
            f"{fd.nentities} entities) — same subdomains required")
    if not (np.array_equal(fs.entity_nodes, fd.entity_nodes)
            and np.allclose(fs.entity_coords, fd.entity_coords)):
        raise ValueError("entity numbering mismatch between handlers")
    ent = np.arange(fd.nentities, dtype=np.int64)
    comp = np.arange(fd.ncomponents, dtype=np.int64)
    return (fd.offset + ent[:, None] * fd.ncomponents + comp[None, :]).ravel()
