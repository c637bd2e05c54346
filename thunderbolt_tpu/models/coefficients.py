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
