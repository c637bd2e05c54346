"""Anisotropic eikonal activation maps (ep05 tutorial topic).

The reference declares an eikonal tutorial (``docs/src/literate-tutorials/
ep05_eikonal.jl``) but ships no solver; this module provides one, built
TPU-first: instead of the inherently sequential fast-marching heap, the
arrival-time field is relaxed by vectorized Bellman-Ford sweeps over the
mesh edge graph,

    T[i] <- min(T[i], min_{j ~ i} T[j] + w_ij),
    w_ij = sqrt(e_ij^T G(x_mid) e_ij),   G = (velocity tensor)^-2,

iterated inside one `lax.while_loop` until stationary. Edge-restricted
paths overestimate the true viscosity solution by O(h) (standard
first-order graph metric error); for cardiac activation maps at EP mesh
resolutions this sits well below physiological accuracy, and the sweep is
embarrassingly parallel — each iteration is one segment-min over the edge
list.

The conduction-velocity tensor is built like a conductivity: either a
constant [sdim, sdim] array or a coefficient evaluated per edge midpoint
(e.g. `SpectralTensorCoefficient` over the fiber microstructure with
(v_f, v_s, v_n) eigen-speeds).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from thunderbolt_tpu.mesh.mesh import Mesh


def _mesh_edges(mesh: Mesh):
    """Unique undirected node-pair edges over all blocks (corner graph +
    element diagonals — diagonals tighten the graph-metric bound)."""
    pairs = []
    for b in mesh.blocks:
        conn = np.asarray(b.connectivity, np.int64)
        nbn = conn.shape[1]
        for a in range(nbn):
            for c in range(a + 1, nbn):
                pairs.append(np.stack([conn[:, a], conn[:, c]], 1))
    e = np.concatenate(pairs)
    e = np.sort(e, axis=1)
    e = np.unique(e, axis=0)
    return e  # [ne, 2]


def solve_eikonal(mesh: Mesh, velocity, sources, source_times=0.0,
                  max_sweeps=100000, check_every=32, dtype=jnp.float32):
    """Arrival times T [nnodes] from `sources` (node indices or a nodeset
    name) with anisotropic conduction-velocity tensor `velocity`
    ([sdim, sdim] array, a scalar speed, or a callable x -> [sdim, sdim]
    evaluated at edge midpoints)."""
    nodes = np.asarray(mesh.nodes)
    sdim = nodes.shape[1]
    edges = _mesh_edges(mesh)
    xe = nodes[edges]                    # [ne, 2, sdim]
    evec = xe[:, 1] - xe[:, 0]
    mid = 0.5 * (xe[:, 0] + xe[:, 1])

    if np.isscalar(velocity) or (hasattr(velocity, "ndim")
                                 and np.asarray(velocity).ndim == 0):
        V = float(velocity) * np.eye(sdim)
        Vm = np.broadcast_to(V, (len(edges), sdim, sdim))
    elif callable(velocity):
        Vm = np.asarray(jax.vmap(velocity)(jnp.asarray(mid)))
    else:
        Vm = np.broadcast_to(np.asarray(velocity, float),
                             (len(edges), sdim, sdim))
    G = np.linalg.inv(Vm @ np.swapaxes(Vm, -1, -2))   # (V V^T)^-1
    w = np.sqrt(np.einsum("es,est,et->e", evec, G, evec))

    if isinstance(sources, str):
        sources = mesh.nodesets[sources]
    src = np.asarray(sources, np.int64)
    t0 = np.broadcast_to(np.asarray(source_times, float), src.shape)

    n = mesh.nnodes
    INF = jnp.asarray(np.finfo(np.float32).max / 4, dtype)
    T0 = jnp.full(n, INF, dtype).at[jnp.asarray(src)].set(
        jnp.asarray(t0, dtype))
    ei = jnp.asarray(edges[:, 0])
    ej = jnp.asarray(edges[:, 1])
    wj = jnp.asarray(w, dtype)

    def sweep(T):
        cand_j = T[ei] + wj            # arrive at j via i
        cand_i = T[ej] + wj
        T = jnp.minimum(T, jax.ops.segment_min(cand_j, ej, n))
        T = jnp.minimum(T, jax.ops.segment_min(cand_i, ei, n))
        return T

    @jax.jit
    def run(T):
        def cond(c):
            T, T_prev, k = c
            return (k < max_sweeps) & jnp.any(T < T_prev)

        def body(c):
            T, _, k = c
            T_prev = T
            for _ in range(check_every):
                T = sweep(T)
            return (T, T_prev, k + check_every)

        T, _, k = jax.lax.while_loop(cond, body, (T0, T0 + 1.0,
                                                  jnp.asarray(0, jnp.int32)))
        return T

    return run(T0)
