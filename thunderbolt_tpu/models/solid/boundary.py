"""Weak boundary conditions for solid mechanics.

Parity: ``src/modeling/core/weak_boundary_conditions.jl`` — ``RobinBC``,
``NormalSpringBC``, ``BendingSpringBC``, ``ConstantPressureBC``,
``PressureFieldBC`` (types ``:23-71``; facet kernels ``:102-634``).

TPU-native: each BC is a *per-facet residual function* r(uf, t) written in
jnp; tangents come uniformly from ``jax.jacfwd`` under vmap — which also
gives exact consistent tangents for follower (pressure) loads, replacing the
reference's hand-derived facet Jacobians and serving the role of its
``ConsistencyCheckWeakBoundaryCondition`` (``:634``) by construction.

Sign convention: contributions are ADDED to the global residual
``r = r_internal + r_bcs`` solved as r(u) = 0 by Newton; a positive chamber
pressure on a facetset whose outward normal points out of the solid
produces traction t = -p n on the surface.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

import numpy as np

from thunderbolt_tpu.fem.facets import FacetBatch, make_facet_batch
from thunderbolt_tpu.models.coefficients import (
    setup_coefficient_cache, evaluate_coefficient)


def reference_normal_da(batch):
    """Unit outward normal and area element of the REFERENCE surface,
    per (facet, qp), computed on the host in f64.

    The reference configuration is constant, so BCs built on the
    reference normal (RobinBC, NormalSpringBC, BendingSpringBC's n0 —
    weak_boundary_conditions.jl:23-53) take it as a precomputed table
    instead of re-deriving tangents/cross/norm/divide inside every traced
    residual and jacfwd tangent evaluation. Besides being cheaper, this
    keeps the division out of the jitted graph: XLA:TPU mis-fuses the
    normalize-inside-vmap pattern on some refined-LV facet batches into a
    graph that emits NaNs from finite inputs (measured on the v5e; eager
    and every materialized intermediate are finite).

    Returns (n [nf, nqp, sdim], da [nf, nqp]) as batch-dtype arrays."""
    Xf = np.asarray(batch.Xf, np.float64)        # [nf, nbg, sdim]
    dNgeo = np.asarray(batch.dNgeo, np.float64)  # [nqp, nbg, fdim]
    T = np.einsum("qbr,fbs->fqsr", dNgeo, Xf)    # [nf, nqp, sdim, fdim]
    if batch.sdim == 3:
        nda = np.cross(T[..., 0], T[..., 1])
    else:
        t = T[..., 0]
        nda = np.stack([t[..., 1], -t[..., 0]], axis=-1)
    da = np.linalg.norm(nda, axis=-1)
    dt = batch.Xf.dtype
    return (jnp.asarray(nda / da[..., None], dt), jnp.asarray(da, dt))


class WeakBoundaryCondition:
    """Subclasses define `facet_residual(batch, i?, ...)` via `_single`."""

    boundary: str

    def setup(self, dh, field, dtype, cells=None):
        batch = make_facet_batch(dh, field, self.boundary, dtype=dtype,
                                 cells=cells)
        return {"batch": batch, **self._extra_setup(batch)}

    def _extra_setup(self, batch):
        return {}

    # -- single-facet residual r[nbf, ncomp]; vmapped + AD'd by the caller --
    def residual_single(self, uf, Xf, cache_q, batch, t):
        raise NotImplementedError

    def make_kernels(self, cache):
        """Returns (residual(U, t) -> [nf, nbf, ncomp],
                    tangent(U, t) -> [nf, nbf*ncomp, nbf*ncomp])."""
        batch = cache["batch"]

        def single(uf, Xf, xq, t, *extra):
            cache_q = dict(zip(self._extra_keys(), extra))
            cache_q["xq"] = xq
            return self.residual_single(uf, Xf, cache_q, batch, t)

        extras = tuple(cache[k] for k in self._extra_keys())

        def residual(U, t):
            return jax.vmap(lambda uf, Xf, xq, *e: single(uf, Xf, xq, t, *e)
                            )(U, batch.Xf, batch.xq, *extras)

        def tangent(U, t):
            def jac_one(uf, Xf, xq, *e):
                nbf, nc = uf.shape
                f = lambda v: single(v.reshape(nbf, nc), Xf, xq, t,
                                     *e).reshape(-1)
                return jax.jacfwd(f)(uf.reshape(-1))
            return jax.vmap(jac_one)(U, batch.Xf, batch.xq, *extras)

        return residual, tangent

    def _extra_keys(self):
        return ()


@dataclass(frozen=True)
class RobinBC(WeakBoundaryCondition):
    """alpha * u . delta_u on the boundary (``:23``)."""
    alpha: float
    boundary: str

    def _extra_setup(self, batch):
        _, da = reference_normal_da(batch)
        return {"w_q": self.alpha * da * batch.wq}

    def _extra_keys(self):
        return ("w_q",)

    def residual_single(self, uf, Xf, cache_q, batch, t):
        uq = jnp.einsum("qb,bi->qi", batch.N, uf)       # [nqp, ncomp]
        return jnp.einsum("q,qi,qa->ai", cache_q["w_q"], uq, batch.N)


@dataclass(frozen=True)
class NormalSpringBC(WeakBoundaryCondition):
    """k (u.n)(delta_u.n) with the reference normal (``:38``)."""
    stiffness: float
    boundary: str

    def _extra_setup(self, batch):
        n, da = reference_normal_da(batch)
        return {"n_q": n, "w_q": self.stiffness * da * batch.wq}

    def _extra_keys(self):
        return ("n_q", "w_q")

    def residual_single(self, uf, Xf, cache_q, batch, t):
        n, w = cache_q["n_q"], cache_q["w_q"]
        uq = jnp.einsum("qb,bi->qi", batch.N, uf)
        un = jnp.einsum("qi,qi->q", uq, n)
        return jnp.einsum("q,q,qi,qa->ai", w, un, n, batch.N)


@dataclass(frozen=True)
class BendingSpringBC(WeakBoundaryCondition):
    """Penalty on rotation of the surface normal: energy
    kb/2 |n(u) - n0|^2 per unit reference area (``:53``). Conservative, so
    the residual is the AD gradient of the facet energy."""
    stiffness: float
    boundary: str

    def _extra_setup(self, batch):
        n0, da0 = reference_normal_da(batch)
        return {"n0_q": n0, "da0w_q": da0 * batch.wq}

    def _extra_keys(self):
        return ("n0_q", "da0w_q")

    def residual_single(self, uf, Xf, cache_q, batch, t):
        n0, da0w = cache_q["n0_q"], cache_q["da0w_q"]

        def energy(uf_):
            nda = batch.normal_da(Xf, uf_)  # deformed: must stay traced
            n = nda / jnp.linalg.norm(nda, axis=-1, keepdims=True)
            return jnp.sum(0.5 * self.stiffness
                           * jnp.sum((n - n0) ** 2, axis=-1) * da0w)

        return jax.grad(energy)(uf)


@dataclass(frozen=True)
class ConstantPressureBC(WeakBoundaryCondition):
    """Follower pressure load: traction -p n on the DEFORMED surface
    (``:44``). Residual contribution +p (n da)(u) N_a."""
    pressure: Any          # scalar or callable t -> scalar (load ramps)
    boundary: str

    def _p(self, t):
        return self.pressure(t) if callable(self.pressure) else self.pressure

    def residual_single(self, uf, Xf, cache_q, batch, t):
        nda = batch.normal_da(Xf, uf)  # deformed n*da
        return self._p(t) * jnp.einsum("q,qi,qa->ai", batch.wq, nda, batch.N)


@dataclass(frozen=True)
class PressureFieldBC(WeakBoundaryCondition):
    """Follower pressure from a coefficient p(x, t) (``:49``)."""
    pressure: Any          # Coefficient (Analytical/Constant/...)
    boundary: str

    def _extra_setup(self, batch):
        return {"pcache": setup_coefficient_cache(self.pressure, batch)}

    def _extra_keys(self):
        return ()

    def make_kernels(self, cache):
        batch = cache["batch"]
        pcache = cache["pcache"]

        def single(uf, Xf, pq, t):
            nda = batch.normal_da(Xf, uf)
            return jnp.einsum("q,q,qi,qa->ai", batch.wq, pq, nda, batch.N)

        def residual(U, t):
            p = evaluate_coefficient(pcache, t)
            p = jnp.broadcast_to(p, (batch.nfacets, batch.wq.shape[0]))
            return jax.vmap(lambda uf, Xf, pq: single(uf, Xf, pq, t)
                            )(U, batch.Xf, p)

        def tangent(U, t):
            p = evaluate_coefficient(pcache, t)
            p = jnp.broadcast_to(p, (batch.nfacets, batch.wq.shape[0]))

            def jac_one(uf, Xf, pq):
                nbf, nc = uf.shape
                f = lambda v: single(v.reshape(nbf, nc), Xf, pq, t).reshape(-1)
                return jax.jacfwd(f)(uf.reshape(-1))
            return jax.vmap(jac_one)(U, batch.Xf, p)

        return residual, tangent
