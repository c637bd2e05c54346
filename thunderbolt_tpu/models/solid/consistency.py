"""Finite-difference consistency checking for weak boundary conditions.

Parity: ``ConsistencyCheckWeakBoundaryCondition``
(``src/modeling/core/weak_boundary_conditions.jl:634``) — a runtime wrapper
asserting the facet tangent matches finite differences of the facet
residual. Our tangents are AD-exact by construction, so this wrapper is a
trust-but-verify tool for NEW user-defined boundary conditions.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np
import jax.numpy as jnp


@dataclass(frozen=True)
class ConsistencyCheckWeakBoundaryCondition:
    """Wrap a WeakBoundaryCondition; every tangent evaluation is compared
    against central finite differences of the residual (tolerance `delta`).
    Raises on mismatch. Intended for debugging, not hot loops."""

    inner: Any
    delta: float = 1e-6
    atol: float = 1e-4

    @property
    def boundary(self):
        return self.inner.boundary

    def setup(self, dh, field, dtype, cells=None):
        return self.inner.setup(dh, field, dtype, cells=cells)

    def make_kernels(self, cache):
        res_fn, tan_fn = self.inner.make_kernels(cache)
        delta, atol = self.delta, self.atol

        def checked_tangent(U, t):
            K = tan_fn(U, t)
            # FD check on the first facet only (cheap, catches sign/shape
            # errors, mirrors the reference's spot check)
            nf, nbf, nc = U.shape
            nd = nbf * nc
            K0 = np.asarray(K[0])
            U0 = np.asarray(U)
            fd = np.zeros((nd, nd))
            for j in range(nd):
                Up = U0.copy().reshape(nf, -1)
                Um = U0.copy().reshape(nf, -1)
                Up[0, j] += delta
                Um[0, j] -= delta
                rp = np.asarray(res_fn(jnp.asarray(Up.reshape(nf, nbf, nc)),
                                       t))[0].reshape(-1)
                rm = np.asarray(res_fn(jnp.asarray(Um.reshape(nf, nbf, nc)),
                                       t))[0].reshape(-1)
                fd[:, j] = (rp - rm) / (2 * delta)
            scale = max(1.0, np.abs(fd).max())
            if not np.allclose(K0, fd, atol=atol * scale):
                raise AssertionError(
                    f"facet tangent inconsistent with FD: max err "
                    f"{np.abs(K0 - fd).max():.3e} (scale {scale:.3e})")
            return K

        return res_fn, checked_tangent
