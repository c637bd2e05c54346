"""Geometric multigrid preconditioning.

Parity: the reference's multigrid configs ``GMGPrecon``/``PMGPrecon``/
``ChainedMGPrecon`` + ``KrylovMGSolver`` (``src/solver/linear/
multigrid.jl:11-183``) materialized by the FerriteMultigrid extension
(``ext/ThunderboltFerriteMultigridExt.jl``: grid hierarchies via uniform
refinement, LazyPrecon rebuilds).

TPU-native: levels are built by ``uniform_refinement`` from a coarse mesh;
prolongation weights come directly from the refinement's parent tracking
(new node = mean of its parents), so P needs no geometric search. The
V-cycle is a pure jnp closure (weighted-Jacobi smoothing, dense coarse
solve) usable as the ``Minv`` of the matrix-free CG.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from thunderbolt_tpu.mesh.mesh import Mesh
from thunderbolt_tpu.mesh.generators import elevate_to_quadratic
from thunderbolt_tpu.mesh.tools import _child_templates
from thunderbolt_tpu.mesh.mesh import ElementBlock


def refine_with_parents(mesh: Mesh):
    """One uniform refinement + (fine node -> coarse parent nodes) map.
    Facetsets/nodesets/cellsets transfer like ``uniform_refinement`` (the
    mechanics hierarchy needs each level's BCs)."""
    from thunderbolt_tpu.mesh.tools import _refine_once
    return _refine_once(mesh, return_parents=True)


@dataclass
class GridHierarchy:
    """Meshes coarse -> fine with prolongation tables between levels."""
    meshes: List[Mesh]
    # per level transition: (pidx [nf, kmax] int32 into coarse dofs,
    #                        pw [nf, kmax] weights)
    prolongations: List

    @classmethod
    def from_coarse(cls, coarse: Mesh, nlevels: int):
        meshes = [coarse]
        prolongations = []
        for _ in range(nlevels - 1):
            fine, parents = refine_with_parents(meshes[-1])
            nc = meshes[-1].nnodes
            nf = fine.nnodes
            kmax = max((len(p) for p in parents), default=1)
            pidx = np.zeros((nf, kmax), np.int32)
            pw = np.zeros((nf, kmax))
            pidx[:nc, 0] = np.arange(nc)
            pw[:nc, 0] = 1.0
            for i, pars in enumerate(parents):
                k = len(pars)
                pidx[nc + i, :k] = pars
                pw[nc + i, :k] = 1.0 / k
            meshes.append(fine)
            prolongations.append((jnp.asarray(pidx), jnp.asarray(pw)))
        return cls(meshes, prolongations)


def _prolong(pidx, pw, xc):
    return jnp.sum(pw * xc[pidx], axis=1)


def _restrict(pidx, pw, rf, nc):
    # R = P^T: scatter-add weighted fine residuals onto coarse dofs
    flat = (pw * rf[:, None]).reshape(-1)
    return jax.ops.segment_sum(flat, pidx.reshape(-1), nc)


@dataclass
class GMGPreconditioner:
    """V-cycle preconditioner over an assembled operator per level.

    `operators[l]` must expose .mv and .diagonal() (ELL/DIA matrices); the
    coarsest level is solved densely (materialized once at setup)."""

    operators: List
    hierarchy: GridHierarchy
    presmooth: int = 2
    postsmooth: int = 2
    omega: float = 0.7

    def __post_init__(self):
        from thunderbolt_tpu.fem.sparsity import ell_to_scipy
        A0 = self.operators[0]
        n0 = A0.shape[0]
        if n0 > 4000:
            raise ValueError(
                f"coarse level too large for a dense solve ({n0} dofs); "
                "use fewer refinements or a coarser base mesh")
        try:
            dense = ell_to_scipy(A0).toarray()
        except AttributeError:
            # DIA operator: materialize via matvecs of unit vectors (small)
            dense = np.stack([np.asarray(A0.mv(jnp.eye(n0)[i]))
                              for i in range(n0)], axis=1)
        self._coarse_inv = jnp.asarray(np.linalg.inv(dense))
        self._diags = [op.diagonal() for op in self.operators]

    def _vcycle(self, level, r):
        A = self.operators[level]
        if level == 0:
            return self._coarse_inv @ r
        d = self._diags[level]
        x = jnp.zeros_like(r)
        for _ in range(self.presmooth):
            x = x + self.omega * (r - A.mv(x)) / d
        pidx, pw = self.hierarchy.prolongations[level - 1]
        rc = _restrict(pidx, pw, r - A.mv(x),
                       self.operators[level - 1].shape[0])
        xc = self._vcycle(level - 1, rc)
        x = x + _prolong(pidx, pw, xc)
        for _ in range(self.postsmooth):
            x = x + self.omega * (r - A.mv(x)) / d
        return x

    def __call__(self, r):
        return self._vcycle(len(self.operators) - 1, r)


def pmg_transfer(dh, field: str):
    """(pidx, pw): P1-nodal -> P2-dof prolongation on ONE mesh from the
    dof handler's entity-parent table — the p-multigrid transfer
    (``PMGPrecon`` parity, ``src/solver/linear/multigrid.jl``). Each P2
    entity interpolates the mean of its parent vertices; the P1 level's
    dofs must be in mesh-node order (guaranteed for a full-domain scalar
    field)."""
    fi = dh.fields[field]
    if fi.order != 2 or fi.ncomponents != 1:
        raise ValueError("pmg_transfer expects a scalar order-2 field")
    par = fi.entity_parents
    k = np.maximum((par >= 0).sum(axis=1), 1)
    pw = np.where(par >= 0, 1.0 / k[:, None], 0.0)
    pidx = np.where(par >= 0, par, 0)
    return jnp.asarray(pidx, jnp.int32), jnp.asarray(pw)


def pmg_preconditioner(mesh: Mesh, kappa=1.0, dtype=jnp.float64,
                       mass_shift=0.0, **smooth) -> GMGPreconditioner:
    """Two-level p-multigrid V-cycle for the P2 Laplacian/heat operator on
    `mesh`: weighted-Jacobi smoothing on the P2 level, dense solve on the
    P1 level, transfer from entity parents (no geometric search). Returns
    a GMGPreconditioner whose __call__ serves as the CG ``Minv``.

    Compose with h-coarsening by building a ``GridHierarchy`` below the P1
    level and stacking the operators (the reference's ``ChainedMGPrecon``)."""
    from thunderbolt_tpu.fem.dofs import DofHandler
    from thunderbolt_tpu.fem.forms import (
        make_form_batch, element_diffusion, element_mass, scatter_matrix)
    from thunderbolt_tpu.fem.sparsity import build_sparsity, csr_to_ell

    ops = []
    dh2 = None
    for order in (1, 2):
        dh = DofHandler(mesh).add_field("u", order=order).close()
        sub = dh.subdofs[0]
        batch = make_form_batch(dh, sub, dtype=dtype)
        pat = build_sparsity([sub.cell_dofs], dh.ndofs)
        kv = -scatter_matrix(element_diffusion(batch, kappa),
                             jnp.asarray(pat.elem_maps[0]), pat.nnz)
        if mass_shift:
            kv = kv + mass_shift * scatter_matrix(
                element_mass(batch), jnp.asarray(pat.elem_maps[0]), pat.nnz)
        ops.append(csr_to_ell(pat, kv))
        if order == 2:
            dh2 = dh
    pidx, pw = pmg_transfer(dh2, "u")
    hierarchy = GridHierarchy(meshes=[mesh, mesh],
                              prolongations=[(pidx, pw)])
    return GMGPreconditioner(operators=ops, hierarchy=hierarchy, **smooth)


def assemble_level_laplacians(hierarchy: GridHierarchy, kappa=1.0,
                              dtype=jnp.float64, mass_shift=0.0):
    """Assemble (-K + mass_shift*M) per level (SPD Laplacian / heat
    operator) — the typical GMG target for the EP heat solve and the
    coordinate-system Poisson problems."""
    from thunderbolt_tpu.fem.dofs import DofHandler
    from thunderbolt_tpu.fem.forms import (
        make_form_batch, element_diffusion, element_mass, scatter_matrix)
    from thunderbolt_tpu.fem.sparsity import build_sparsity, csr_to_ell
    ops = []
    for mesh in hierarchy.meshes:
        dh = DofHandler(mesh).add_field("u").close()
        sub = dh.subdofs[0]
        batch = make_form_batch(dh, sub, dtype=dtype)
        pat = build_sparsity([sub.cell_dofs], dh.ndofs)
        kv = -scatter_matrix(element_diffusion(batch, kappa),
                             jnp.asarray(pat.elem_maps[0]), pat.nnz)
        if mass_shift:
            kv = kv + mass_shift * scatter_matrix(
                element_mass(batch), jnp.asarray(pat.elem_maps[0]), pat.nnz)
        ops.append(csr_to_ell(pat, kv))
    return ops
