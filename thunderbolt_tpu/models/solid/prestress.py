"""Prestress / unloaded-configuration recovery (cm02 tutorial topic).

Parity: ``PrestressedMechanicalModel`` (``src/modeling/solid/
materials.jl:789``) supplies the multiplicative-prestress material; the
reference's cm02 tutorial ("how to include prestress ... and how to
recover the correct initial condition",
``docs/src/literate-tutorials/cm02_prestress.jl``) is a content stub — the
workflow implemented here is the standard Sellier (2011) backward-
displacement fixed point: given an IMAGED (loaded) geometry x* and the
in-vivo load, find the unloaded reference X such that equilibrium from X
under the load reproduces x*:

    X_{k+1} = x* - u(X_k)        (u = displacement solved from X_k)

Each iteration is one quasi-static solve on an updated mesh (host loop —
the mesh tables are rebuilt per iterate, a handful of times).
"""

from __future__ import annotations

from dataclasses import replace as _dc_replace

import numpy as np
import jax.numpy as jnp


def recover_unloaded_configuration(mesh_target, make_function, solve,
                                   max_iter=10, tol=1e-6, relax=1.0,
                                   verbose=False):
    """Sellier backward-displacement fixed point.

    mesh_target: Mesh whose nodes are the loaded (imaged) geometry x*.
    make_function(mesh) -> semidiscrete quasi-static function (the load
        and BCs must be baked in by the caller).
    solve(fn) -> (u [ndofs], converged: bool) equilibrium displacement.
    Returns (mesh_unloaded, history) — a NEW mesh with recovered reference
    nodes, plus the per-iteration geometry-error history.
    """
    x_star = np.asarray(mesh_target.nodes).copy()
    X = x_star.copy()
    history = []
    for k in range(max_iter):
        mesh_k = _with_nodes(mesh_target, X)
        fn = make_function(mesh_k)
        u, ok = solve(fn)
        if not ok:
            raise RuntimeError(
                f"prestress fixed point: equilibrium solve failed at "
                f"iteration {k}")
        U = _nodal_displacement(fn, u, mesh_k)
        x_pred = X + U
        err = float(np.max(np.linalg.norm(x_pred - x_star, axis=1)))
        history.append(err)
        if verbose:
            print(f"  prestress it {k}: |x(X)-x*|_max = {err:.3e}")
        if err < tol:
            break
        X = X + relax * (x_star - x_pred)
    return _with_nodes(mesh_target, X), history


def _with_nodes(mesh, nodes):
    from thunderbolt_tpu.mesh.mesh import Mesh, ElementBlock
    blocks = [ElementBlock(b.celltype, b.connectivity.copy())
              for b in mesh.blocks]
    return Mesh(np.asarray(nodes, float).copy(), blocks,
                nodesets={k: v.copy() for k, v in mesh.nodesets.items()},
                facetsets={k: v.copy() for k, v in mesh.facetsets.items()},
                cellsets={k: v.copy() for k, v in mesh.cellsets.items()})


def _nodal_displacement(fn, u, mesh):
    """[nnodes, sdim] displacement from the solution vector (P1 fields:
    dof = node * ncomp + comp)."""
    fi = fn.dh.fields[fn.field]
    ncomp = fi.ncomponents
    U = np.zeros((mesh.nnodes, ncomp))
    en = fi.entity_nodes
    mask = en >= 0
    vals = np.asarray(u).reshape(-1, ncomp)
    U[en[mask]] = vals[mask]
    return U
