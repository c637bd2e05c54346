"""Spatially/temporally varying model data ("coefficients").

Parity: the reference coefficient protocol ``setup_coefficient_cache`` +
``evaluate_coefficient`` (``src/modeling/core/coefficients.jl:7,18``) and the
catalog: ``ConstantCoefficient`` (``coefficients.jl:106``),
``FieldCoefficient`` (``coefficients.jl:36``), ``AnalyticalCoefficient``
(``src/modeling/core/analytical_coefficient.jl``),
``SpectralTensorCoefficient`` (``coefficients.jl:451``),
``ConductivityToDiffusivityCoefficient`` (``coefficients.jl:128``),
``SpatiallyHomogeneousDataField`` (``coefficients.jl:501``).

TPU-native protocol: ``setup_coefficient_cache(coeff, batch)`` runs at
discretization time and returns a pytree; ``evaluate_coefficient(cache, t)``
runs *inside jit* and returns an array broadcastable against
``[ncells, nqp, ...]``. Spatial data is materialized to per-(cell, qp)
arrays at setup; only time dependence is traced.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from dataclasses import dataclass
from typing import Any, Callable, Optional


class Coefficient:
    """Base class; subclasses implement ``setup(batch)``."""

    def setup(self, batch):
        raise NotImplementedError


@dataclass(frozen=True)
class _EvalCache:
    """(kind, payload) evaluated by `evaluate_coefficient`."""
    kind: str
    payload: Any

    # make it a valid (static-free) pytree by treating payload as the leaf
    def tree_flatten(self):
        return (self.payload,), self.kind

    @classmethod
    def tree_unflatten(cls, kind, children):
        return cls(kind, children[0])


import jax.tree_util
jax.tree_util.register_pytree_node(
    _EvalCache, _EvalCache.tree_flatten, _EvalCache.tree_unflatten)


def setup_coefficient_cache(coeff, batch):
    """Materialize `coeff` for an element batch (see fem/forms.FormBatch)."""
    if isinstance(coeff, Coefficient):
        return coeff.setup(batch)
    # raw constants (python/numpy scalars & tensors) are coefficients too
    return _EvalCache("const", jnp.asarray(coeff))


def evaluate_coefficient(cache, t):
    """[inside jit] evaluate a coefficient cache at time t.

    Returns an array broadcastable to [ncells, nqp, *value_shape].
    """
    if cache.kind == "const":
        return cache.payload
    if cache.kind == "data":
        return cache.payload
    if cache.kind == "analytic":
        xq, f = cache.payload
        return f(xq, t)
    raise KeyError(cache.kind)


# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ConstantCoefficient(Coefficient):
    """Same value at every quadrature point (``coefficients.jl:106``)."""
    value: Any

    def setup(self, batch):
        return _EvalCache("const", jnp.asarray(self.value))


@dataclass(frozen=True)
class FieldCoefficient(Coefficient):
    """Per-element nodal data interpolated to quadrature points
    (``coefficients.jl:36``). `data` is [ncells_mesh, nbase, *value_shape]
    in mesh-global cell numbering, interpolated with the batch's field basis,
    or [ncells_mesh, *value_shape] for per-cell-constant data.
    """
    data: Any
    per_cell_constant: bool = False

    def setup(self, batch):
        data = np.asarray(self.data)
        cells = np.asarray(batch.cells)
        if self.per_cell_constant or data.ndim == 1 or \
                data.shape[1:2] != (batch.N.shape[1],):
            vals = data[cells]  # [nc, ...]
            return _EvalCache("data", jnp.asarray(vals)[:, None])
        loc = data[cells]  # [nc, nbase, ...]
        N = np.asarray(batch.N)  # [nqp, nbase]
        vals = np.einsum("qb,cb...->cq...", N, loc)
        return _EvalCache("data", jnp.asarray(vals))


@dataclass(frozen=True)
class AnalyticalCoefficient(Coefficient):
    """User closure f(x, t) evaluated at quadrature points
    (``src/modeling/core/analytical_coefficient.jl``). The closure is traced
    into the jitted kernel, so `t` stays dynamic — this is what stimulation
    protocols rely on.

    f maps (x[..., sdim], t) -> value[...]; it must be jnp-vectorized over x.
    """
    f: Callable
    coordinate_system: Any = None

    def setup(self, batch):
        if self.coordinate_system is None:
            xq = batch.xq  # [nc, nqp, sdim] cartesian
        else:
            xq = self.coordinate_system.at_qps(batch)
        return _EvalCache("analytic", (jnp.asarray(xq), self.f))


@dataclass(frozen=True)
class CoordinateSystemCoefficient(Coefficient):
    """Yields the (generalized) coordinate itself at each qp.

    Parity: the reference's use of coordinate systems as coefficients for
    cell-model `x` inputs (``src/modeling/electrophysiology.jl`` MonodomainModel
    cell_coordinates)."""
    coordinate_system: Any = None

    def setup(self, batch):
        if self.coordinate_system is None:
            return _EvalCache("data", jnp.asarray(batch.xq))
        return _EvalCache("data", jnp.asarray(
            self.coordinate_system.at_qps(batch)))


@dataclass(frozen=True)
class ConductivityToDiffusivityCoefficient(Coefficient):
    """D = kappa / (Cm * chi) (``coefficients.jl:128``) — the monodomain
    semidiscretization's coefficient folding (``src/discretization/fem.jl:415``)."""
    kappa: Any
    Cm: Any
    chi: Any

    def setup(self, batch):
        kc = setup_coefficient_cache(self.kappa, batch)
        cc = setup_coefficient_cache(self.Cm, batch)
        xc = setup_coefficient_cache(self.chi, batch)
        if all(c.kind in ("const", "data") for c in (kc, cc, xc)):
            k = evaluate_coefficient(kc, 0.0)
            cm = evaluate_coefficient(cc, 0.0)
            ch = evaluate_coefficient(xc, 0.0)
            val = k / (cm * ch) if k.ndim <= 2 else \
                k / (cm * ch)[..., None, None]
            return _EvalCache("const" if kc.kind == "const" else "data", val)
        raise NotImplementedError("time-dependent conductivity folding")


@dataclass(frozen=True)
class SpectralTensorCoefficient(Coefficient):
    """D = sum_i lambda_i * e_i (x) e_i from a microstructure eigenbasis
    (``coefficients.jl:451``). `eigenvectors` is a coefficient yielding
    [..., nev, dim] orthonormal directions (fiber/sheet/normal), `eigenvalues`
    yields [..., nev]."""
    eigenvectors: Any
    eigenvalues: Any

    def setup(self, batch):
        vc = setup_coefficient_cache(self.eigenvectors, batch)
        lc = setup_coefficient_cache(self.eigenvalues, batch)
        V = np.asarray(evaluate_coefficient(vc, 0.0))
        lam = np.asarray(evaluate_coefficient(lc, 0.0))
        D = np.einsum("...e,...ei,...ej->...ij", lam, V, V)
        return _EvalCache("const" if D.ndim == 2 else "data", jnp.asarray(D))


def evaluate_coefficient_at_dof_locations(coeff, dh, field_name, t=0.0,
                                          cellset=None, out=None):
    """Evaluate ``coeff`` at the spatial locations where ``field_name``'s
    dofs sit, returning an ``[nentities, *value_shape]`` array indexed by
    dof entity (per-component dofs share the entity location).

    Parity: ``evaluate_coefficient_at_dof_locations`` /
    ``..._at_dof_locations!`` (``src/modeling/core/coefficients.jl:173-199``).
    As there, the locations are the nodes of the ANSATZ space, not the mesh:
    the evaluation runs the ordinary coefficient protocol on a pseudo-batch
    whose "quadrature" points are the field element's reference node
    coordinates, so a quadratic field on a linear mesh also evaluates at
    edge midpoints/cell centers. Only meaningful for delta-property
    (Lagrange) interpolations — a dof's value IS the function value there.

    ``cellset`` (iterable of global cell ids) restricts the evaluation to
    entities touched by those cells; other rows are left at ``out``'s
    values (zeros when ``out`` is None). Last writer wins on shared
    entities, which is well-defined because delta-property evaluations of
    the same coefficient at the same location agree.
    """
    from thunderbolt_tpu.fem.forms import FormBatch
    from thunderbolt_tpu.mesh.elements import get_element

    fi = dh.fields[field_name]
    mesh = dh.mesh
    cset = None if cellset is None else np.asarray(
        sorted(set(int(c) for c in np.asarray(cellset).ravel())))
    vals_rows, ent_rows = [], []
    for sub in dh.subdata(field_name):
        sel = slice(None)
        if cset is not None:
            mask = np.isin(np.asarray(sub.cells), cset)
            if not mask.any():
                continue
            sel = np.where(mask)[0]
        block = mesh.blocks[sub.block_index]
        gel = get_element(sub.celltype)
        fel = get_element(sub.field_celltype)
        pts = np.asarray(fel.ref_nodes, dtype=np.float64)   # [nn, rdim]
        N = fel.shape(pts)                                  # identity-ish
        dN = fel.grad(pts)
        Ngeo = gel.shape(pts)
        dNgeo = gel.grad(pts)
        conn = block.connectivity[np.asarray(sub.local_cells)[sel]]
        Xe = mesh.nodes[conn]
        xq = np.einsum("qb,cbs->cqs", Ngeo, Xe)
        batch = FormBatch(
            N=jnp.asarray(N), dN=jnp.asarray(dN),
            Ngeo=jnp.asarray(Ngeo), dNgeo=jnp.asarray(dNgeo),
            wq=jnp.ones(pts.shape[0]), Xe=jnp.asarray(Xe),
            cell_dofs=jnp.asarray(np.asarray(sub.cell_dofs)[sel]),
            xq=jnp.asarray(xq),
            cells=jnp.asarray(np.asarray(sub.cells)[sel], jnp.int32),
            ncomp=fi.ncomponents, celltype=sub.celltype,
            field_celltype=sub.field_celltype)
        cache = setup_coefficient_cache(coeff, batch)
        v = np.asarray(evaluate_coefficient(cache, t))
        nc, nn = xq.shape[0], pts.shape[0]
        v = np.broadcast_to(v, (nc, nn) + v.shape[2:])
        vals_rows.append(v.reshape(nc * nn, *v.shape[2:]))
        ent_rows.append(
            np.asarray(sub.cell_entities)[sel].reshape(nc * nn))
    if out is None:
        vshape = vals_rows[0].shape[1:] if vals_rows else ()
        out = np.zeros((fi.nentities,) + vshape)
    else:
        out = np.array(out, copy=True)
    for ents, vals in zip(ent_rows, vals_rows):
        out[ents] = vals
    return out


@dataclass(frozen=True)
class SpatiallyHomogeneousDataField(Coefficient):
    """Piecewise-constant-in-time, homogeneous-in-space data
    (``coefficients.jl:501``): value jumps at given timestamps."""
    timestamps: Any   # [nt]
    values: Any       # [nt(+1), ...]

    def setup(self, batch):
        ts = jnp.asarray(self.timestamps)
        vals = jnp.asarray(self.values)

        def f(xq, t):
            # side="left": the value jumps strictly AFTER each timestamp
            # (t == timestamps[i] still yields values[i], matching the
            # reference's evaluate at coefficients.jl:501)
            idx = jnp.searchsorted(ts, t, side="left")
            return vals[jnp.minimum(idx, vals.shape[0] - 1)]

        return _EvalCache("analytic", (jnp.zeros(()), f))
