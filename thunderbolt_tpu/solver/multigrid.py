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


# ---------------------------------------------------------------------------
# mechanics multigrid: multilevel preconditioning of Newton tangents
# ---------------------------------------------------------------------------
#
# Parity: the reference's MG extension preconditions ANY operator,
# including the mechanics Newton linearizations
# (``ext/ThunderboltFerriteMultigridExt.jl:1-413``, configs
# ``src/solver/linear/multigrid.jl:11-183``). Design constraints here come
# from the measured round-1 failure modes: NESTED spaces only (the levels
# are built by uniform midpoint refinement of one coarse mesh, so each
# coarse space is exactly a subspace of the fine one), block (ncomp x
# ncomp) Jacobi SMOOTHING only (scalar Jacobi has rho(D^-1 A) ~ 4 for
# elasticity; Chebyshev must never act as a coarse SOLVE), and an exact
# dense solve on the coarsest level so the cycle is stationary and plain
# CG remains applicable.


def _block_apply(Dinv, ncomp):
    """r -> blockdiag(Dinv) r for [nent, c, c] inverted blocks."""

    def apply(r):
        return jnp.einsum("nab,nb->na", Dinv,
                          r.reshape(-1, ncomp)).reshape(-1)

    return apply


def _lanczos_lam_max(Amv, Dinv, v0, iters):
    """Traced lam_max estimate of the block-Jacobi-preconditioned operator.

    Runs symmetric Lanczos (full two-pass reorthogonalization) on the
    SYMMETRIZED form C = D^{-1/2} A D^{-1/2} — same spectrum as D^{-1} A
    but amenable to the plain symmetric recursion — entirely on device:
    the tridiagonal eigensolve is a [m,m] ``eigvalsh`` inside the trace,
    so the estimate is usable from the jitted Newton loop (no host
    readback, unlike ``solver.linear.lanczos_bounds``)."""
    c = Dinv.shape[-1]
    s, V = jnp.linalg.eigh(Dinv)                   # Dinv = V s V^T, SPD
    Dih = jnp.einsum("nab,nb,ncb->nac", V,
                     jnp.sqrt(jnp.maximum(s, 0.0)), V)   # D^{-1/2}
    bh = _block_apply(Dih, c)

    def cmv(x):
        return bh(Amv(bh(x)))

    n = v0.shape[0]
    v0 = v0 / jnp.linalg.norm(v0)
    Vk = jnp.zeros((iters + 1, n), v0.dtype).at[0].set(v0)
    alphas = jnp.zeros(iters, v0.dtype)
    betas = jnp.zeros(iters, v0.dtype)

    def body(k, carry):
        Vk, alphas, betas = carry
        v = Vk[k]
        w = cmv(v)
        alpha = jnp.sum(v * w)
        w = w - (Vk @ w) @ Vk
        w = w - (Vk @ w) @ Vk
        beta = jnp.linalg.norm(w)
        vn = jnp.where(beta > 1e-12, 1.0, 0.0) * w / jnp.maximum(
            beta, 1e-30)
        return (Vk.at[k + 1].set(vn), alphas.at[k].set(alpha),
                betas.at[k].set(beta))

    _, alphas, betas = jax.lax.fori_loop(0, iters, body,
                                         (Vk, alphas, betas))
    T = jnp.diag(alphas) + jnp.diag(betas[:-1], 1) + \
        jnp.diag(betas[:-1], -1)
    return jnp.linalg.eigvalsh(T)[-1]


def _vec_prolong(pidx, pw, xc, ncomp):
    X = xc.reshape(-1, ncomp)
    return jnp.sum(pw[..., None] * X[pidx], axis=1).reshape(-1)


def _vec_restrict(pidx, pw, rf, nc_nodes, ncomp):
    R = rf.reshape(-1, ncomp)
    contrib = (pw[..., None] * R[:, None, :]).reshape(-1, ncomp)
    return jax.ops.segment_sum(contrib, pidx.reshape(-1),
                               nc_nodes).reshape(-1)


@dataclass
class MechanicsHierarchy:
    """Nested mechanics discretizations coarse -> fine.

    ``functions[l]`` is the full semidiscretization (assembly kernels, weak
    BCs, Dirichlet constraints) of the SAME model on level ``l``'s mesh;
    ``prolongations[l]`` interpolates level ``l`` -> ``l+1`` node fields
    (identity on the surviving coarse nodes, parent-mean on new nodes —
    exactly the nested P1 interpolation); ``injections[l]`` gives, for each
    level-``l`` node, its node index on level ``l+1`` (state restriction
    by injection)."""

    meshes: List[Mesh]
    functions: List
    prolongations: List          # [(pidx [nnf,k] int32, pw [nnf,k])]
    injections: List             # [int32 [nnc]]
    ncomp: int

    @property
    def fine_function(self):
        return self.functions[-1]


def build_mechanics_hierarchy(model, disc, coarse_mesh: Mesh, nlevels: int,
                              renumber: str = "none") -> MechanicsHierarchy:
    """Refine ``coarse_mesh`` ``nlevels-1`` times and semidiscretize
    ``model`` on every level.

    ``model`` may be a callable ``mesh -> model``: mesh-bound coefficients
    (rule-based fiber fields, coordinate systems) must be rebuilt per
    level, since a coefficient holding the fine mesh's connectivity cannot
    be evaluated at a coarse level's quadrature points.

    ``renumber``: per-level node renumbering of the refined meshes —
    ``"none"`` keeps refinement order (coarse nodes first), ``"lex"``
    restores lattice ordering on box-like geometries so the BlockDIA SpMV
    fast path engages on the fine levels, ``"rcm"`` minimizes bandwidth on
    unstructured geometries.

    The FINE function (``hierarchy.fine_function``) is the one to hand to
    Newton; solve it with ``NewtonRaphsonSolver(precon=
    MechanicsGMGPreconditioner(hierarchy))``."""
    from thunderbolt_tpu.disc.semidiscretize import semidiscretize
    from thunderbolt_tpu.mesh.tools import (
        renumber_mesh_nodes, lexsort_node_perm, reorder_mesh_rcm)

    meshes = [coarse_mesh]
    prolongations, injections = [], []
    for _ in range(nlevels - 1):
        fine, parents = refine_with_parents(meshes[-1])
        nc, nf = meshes[-1].nnodes, fine.nnodes
        kmax = max((len(p) for p in parents), default=1)
        pidx = np.zeros((nf, kmax), np.int64)
        pw = np.zeros((nf, kmax))
        pidx[:nc, 0] = np.arange(nc)
        pw[:nc, 0] = 1.0
        for i, pars in enumerate(parents):
            k = len(pars)
            pidx[nc + i, :k] = pars
            pw[nc + i, :k] = 1.0 / k
        injection = np.arange(nc, dtype=np.int64)
        if renumber == "lex":
            perm = lexsort_node_perm(fine)
        elif renumber == "rcm":
            _, perm = reorder_mesh_rcm(fine, return_perm=True)
        elif renumber == "none":
            perm = None
        else:
            raise ValueError(f"unknown renumber mode {renumber!r}")
        if perm is not None:
            fine = renumber_mesh_nodes(fine, perm)
            pidx, pw = pidx[perm], pw[perm]
            inv = np.empty(nf, np.int64)
            inv[perm] = np.arange(nf)
            injection = inv[:nc]
        meshes.append(fine)
        prolongations.append((jnp.asarray(pidx, jnp.int32),
                              jnp.asarray(pw)))
        injections.append(jnp.asarray(injection, jnp.int32))

    make = model if callable(model) and not hasattr(model, "field") \
        else (lambda _m: model)
    functions = [semidiscretize(make(m), disc, m) for m in meshes]
    fi = functions[-1].dh.fields[functions[-1].field]
    if fi.order != 1:
        raise ValueError("mechanics multigrid expects a P1 displacement "
                         "field (node-level transfers)")
    en = fi.entity_nodes
    if not np.array_equal(en[: meshes[-1].nnodes],
                          np.arange(meshes[-1].nnodes)):
        raise ValueError("displacement dof entities must be in mesh-node "
                         "order (full-domain field)")
    return MechanicsHierarchy(meshes, functions, prolongations, injections,
                              ncomp=fi.ncomponents)


def _lv_lattice_ids(ne_c, ne_r, ne_l):
    """Node-id helpers for ``generate_ideal_lv_mesh``'s lattice layout
    (``mesh/generators.py``: ``nid(i,j,k) = i%nn_c + j*nn_c + k*nn_c*nn_r``
    plus an apex-cap column of nn_r pole nodes)."""
    nn_c, nn_r, nn_l = ne_c, ne_r + 1, ne_l + 1
    cap_start = nn_c * nn_r * nn_l

    def nid(i, j, k):
        return (i % nn_c) + j * nn_c + k * nn_c * nn_r

    return nn_c, nn_r, nn_l, cap_start, nid


def _axis_parents(v, wrap_n=None):
    """Coarse parents of fine 1D lattice index ``v`` under 2:1 coarsening:
    even nodes coincide with coarse nodes, odd nodes average neighbours."""
    if v % 2 == 0:
        p = v // 2
        return [(p % wrap_n if wrap_n else p, 1.0)]
    lo, hi = (v - 1) // 2, (v + 1) // 2
    if wrap_n:
        lo, hi = lo % wrap_n, hi % wrap_n
    return [(lo, 0.5), (hi, 0.5)]


def build_lv_mg_hierarchy(model, disc, coarse_elems, nlevels: int,
                          scale: float = None, **lv_kwargs):
    """Nested-LATTICE ideal-LV hierarchy: every level is generated by
    ``generate_ideal_lv_mesh(nc*2^l, nr*2^l, nl*2^l)`` in the generator's
    own (circumferential, transmural, apicobasal) lattice order.

    Why not ``build_mechanics_hierarchy`` + RCM: midpoint refinement
    destroys the lattice ordering, the assembled tangent falls back to
    gather-based ELL, and on this TPU gathers are ~100x slower than the
    BlockDIA diagonal slices — measured round 4: MG-CG at 7k dofs ran at
    12 ms/CG-iteration, SLOWER than the host CPU. Generated levels keep
    lattice order at every size (BlockDIA, 27 offsets + seam/apex spill),
    and the generator's parameterization makes even-lattice fine nodes
    EXACTLY coincide with coarse nodes (same analytic formula evaluated at
    the same parameter values), so injection is exact and the trilinear
    lattice transfer below is the natural nested P1 interpolation in
    parameter space. Odd nodes sit on the analytic ellipsoid rather than
    on coarse element faces — immaterial for a preconditioner-grade
    transfer (the V-cycle sits inside CG).

    ``model`` may be a callable ``mesh -> model`` (rule-based fibers are
    mesh-bound). Returns a :class:`MechanicsHierarchy` — drop-in for
    :class:`MechanicsGMGPreconditioner`.
    """
    from thunderbolt_tpu.disc.semidiscretize import semidiscretize
    from thunderbolt_tpu.mesh.generators import generate_ideal_lv_mesh

    nc0, nr0, nl0 = coarse_elems
    meshes = []
    for l in range(nlevels):
        m = generate_ideal_lv_mesh(nc0 * 2 ** l, nr0 * 2 ** l,
                                   nl0 * 2 ** l, **lv_kwargs)
        if scale is not None:
            m.nodes[:] = m.nodes * scale
        meshes.append(m)

    prolongations, injections = [], []
    for l in range(nlevels - 1):
        ne_c, ne_r, ne_l = nc0 * 2 ** l, nr0 * 2 ** l, nl0 * 2 ** l
        nn_c, nn_r, nn_l, cap_c, nid_c = _lv_lattice_ids(ne_c, ne_r, ne_l)
        fn_c2, fn_r, fn_l, cap_f, nid_f = _lv_lattice_ids(
            2 * ne_c, 2 * ne_r, 2 * ne_l)
        nnf = cap_f + fn_r
        nnc = cap_c + nn_r
        pidx = np.zeros((nnf, 8), np.int64)
        pw = np.zeros((nnf, 8))
        # lattice block: vectorized over the 8 corner combinations
        C, B, A = np.meshgrid(np.arange(fn_l), np.arange(fn_r),
                              np.arange(fn_c2), indexing="ij")
        order = (A + B * fn_c2 + C * fn_c2 * fn_r).reshape(-1)
        a, b, c = A.reshape(-1), B.reshape(-1), C.reshape(-1)

        def axis_tables(v, wrap_n=None):
            even = (v % 2 == 0)
            p0 = np.where(even, v // 2, (v - 1) // 2)
            p1 = np.where(even, v // 2, (v + 1) // 2)
            if wrap_n:
                p0, p1 = p0 % wrap_n, p1 % wrap_n
            w0 = np.where(even, 1.0, 0.5)
            w1 = np.where(even, 0.0, 0.5)
            return (p0, w0), (p1, w1)

        ta = axis_tables(a, nn_c)
        tb_ = axis_tables(b)
        tc = axis_tables(c)
        for m_ in range(8):
            ia, wa = ta[m_ & 1]
            jb, wb = tb_[(m_ >> 1) & 1]
            kc, wc = tc[(m_ >> 2) & 1]
            pidx[order, m_] = nid_c(ia, jb, kc)
            pw[order, m_] = wa * wb * wc
        # apex-cap column: 1D transfer along the radius
        for bf in range(fn_r):
            row = cap_f + bf
            for m_, (p, w) in enumerate(_axis_parents(bf)):
                pidx[row, m_] = cap_c + p
                pw[row, m_] = w
        # merge duplicate parents (even axes produce repeated columns
        # with zero weight — harmless, but collapse exact-coarse rows)
        inj = np.zeros(nnc, np.int64)
        I, J, K = np.meshgrid(np.arange(nn_l), np.arange(nn_r),
                              np.arange(nn_c), indexing="ij")
        inj[nid_c(K.reshape(-1), J.reshape(-1), I.reshape(-1))] = nid_f(
            2 * K.reshape(-1), 2 * J.reshape(-1), 2 * I.reshape(-1))
        inj[cap_c + np.arange(nn_r)] = cap_f + 2 * np.arange(nn_r)
        prolongations.append((jnp.asarray(pidx, jnp.int32),
                              jnp.asarray(pw)))
        injections.append(jnp.asarray(inj, jnp.int32))

    make = model if callable(model) and not hasattr(model, "field") \
        else (lambda _m: model)
    functions = [semidiscretize(make(m), disc, m) for m in meshes]
    fi = functions[-1].dh.fields[functions[-1].field]
    return MechanicsHierarchy(meshes, functions, prolongations, injections,
                              ncomp=fi.ncomponents)


def _csr_block_slots(pattern, ncomp: int) -> np.ndarray:
    """Host-side: CSR slot of each (e*c+a, e*c+b) diagonal-block entry —
    the block-Jacobi extraction table for operators whose value layout is
    CSR (the generic assemble() path)."""
    nent = pattern.ndofs // ncomp
    keys = pattern.rows.astype(np.int64) * pattern.ndofs + \
        pattern.indices.astype(np.int64)
    e = np.arange(nent, dtype=np.int64)
    a = np.arange(ncomp, dtype=np.int64)
    want = ((e[:, None, None] * ncomp + a[None, :, None]) * pattern.ndofs
            + e[:, None, None] * ncomp + a[None, None, :])
    slots = np.searchsorted(keys, want)
    if not np.array_equal(keys[slots], want):
        raise ValueError("diagonal blocks incomplete in sparsity pattern")
    return slots.astype(np.int64)


class MechanicsGMGPreconditioner:
    """Multilevel V-cycle preconditioner for mechanics Newton tangents.

    Per Newton iteration (``setup``): the current fine state is restricted
    to every coarser level by injection, each level REDISCRETIZES its
    tangent there (on nested midpoint-refined meshes this is
    Galerkin-equivalent for affine cells), Dirichlet elimination is applied
    per level, and the coarsest masked operator is materialized and
    inverted densely. The returned closure runs a symmetric V-cycle —
    damped block-Jacobi pre/post smoothing, residual restriction by P^T,
    exact coarsest solve — and is SPD, so it serves as the ``Minv`` of
    plain CG inside the one-dispatch Newton loop.

    Pass an instance as ``NewtonRaphsonSolver(precon=...)``.
    """

    def __init__(self, hierarchy: MechanicsHierarchy, presmooth: int = 2,
                 postsmooth: int = 2, cheb_fraction: float = 4.0,
                 lanczos_iters: int = 24, lanczos_safety: float = 1.15,
                 coarse_dense_max: int = 6000):
        self.h = hierarchy
        #: Chebyshev smoothing degrees. Keep presmooth == postsmooth: the
        #: polynomial smoother is A-self-adjoint, so equal degrees make the
        #: V-cycle symmetric (the SPD requirement for plain CG).
        self.presmooth = presmooth
        self.postsmooth = postsmooth
        #: smoothing interval [lam_hi/cheb_fraction, lam_hi] where lam_hi =
        #: min(guaranteed inf-norm bound, 1.1 x Lanczos estimate): the
        #: inf-norm alone overestimates lam_max by up to ~6x on anisotropic
        #: tangents (measured, Holzapfel-Ogden), which parks the smoothing
        #: interval above the actual spectrum and guts the smoother
        self.cheb_fraction = cheb_fraction
        self.lanczos_iters = lanczos_iters
        #: widening applied to the Lanczos lam_max estimate before the
        #: min() with the guaranteed bound. Lanczos approaches lam_max
        #: from BELOW; with full two-pass reorthogonalization and a
        #: continuum-topped FEM spectrum 24 steps land within a few
        #: percent, but isolated clustered tops can lag — if smoothing
        #: ever diverges (CG stalls at inner_maxiter), raise this or
        #: lanczos_iters. The min() caps the damage of an overestimate at
        #: the inf-norm bound.
        self.lanczos_safety = lanczos_safety
        n0 = self.h.functions[0].dh.ndofs
        if n0 > coarse_dense_max:
            raise ValueError(
                f"coarsest level too large for a dense solve ({n0} dofs); "
                "start from a coarser mesh or add levels")
        c = self.h.ncomp
        # static block-extraction tables (pattern-derived, host-side once)
        self._slots = [_csr_block_slots(fn.pattern, c)
                       for fn in self.h.functions]
        self._ell_block_slots = None  # built lazily for the fine operator

    # -- jit-traceable setup: called once per Newton iteration ------------

    def _fine_block_dinv(self, A, free_mask):
        """Inverted diagonal [c,c] blocks of the ALREADY-assembled fine
        operator Newton hands us (MaskedOperator over BlockDIA, or a
        Dirichlet-eliminated ELLMatrix); identity on constrained dofs."""
        from thunderbolt_tpu.fem.sparsity import ELLMatrix, MaskedOperator
        from thunderbolt_tpu.utils.smallmat import det_small, inv_small
        c = self.h.ncomp
        if isinstance(A, MaskedOperator):
            inner = A.A
            k = inner.offsets.index(0)
            D = inner.blocks[k]
            if free_mask is not None:
                f = free_mask.reshape(-1, c)
                fb = f[:, :, None] & f[:, None, :]
                D = jnp.where(fb, D, jnp.eye(c, dtype=D.dtype)[None])
            return inv_small(D, det_small(D))
        if isinstance(A, ELLMatrix):
            # apply_operator already zeroed constrained rows/cols and set
            # unit diagonals, so the extracted blocks are mask-correct
            if self._ell_block_slots is None:
                # cache as HOST numpy: a jnp array materialized here would
                # be trace-bound when this first runs inside jit/cond (the
                # constant becomes a tracer) and leak into later traces
                pat = self.h.fine_function.pattern
                self._ell_block_slots = np.asarray(
                    pat.ell_pos)[self._slots[-1]]
            D = A.vals.reshape(-1)[self._ell_block_slots]
            return inv_small(D, det_small(D))
        raise TypeError(f"unsupported fine operator {type(A).__name__}")

    def _lam_upper_bound(self, A, Dinv):
        """GUARANTEED upper bound on lam_max(D_blk^-1 A): the inf-norm of
        |D^-1 A| computed exactly from the operator's storage. Chebyshev
        smoothing on [ub/f, ub] is non-expansive on the whole spectrum
        whenever ub >= lam_max — an overestimate only weakens smoothing,
        while any underestimate (power iteration, Lanczos truncation) can
        make the smoother silently DIVERGENT, the measured round-1 failure
        mode on stiff/near-incompressible tangents."""
        from thunderbolt_tpu.fem.sparsity import (
            ELLMatrix, MaskedOperator, BlockDIAMatrix)
        c = self.h.ncomp
        if isinstance(A, MaskedOperator):
            return jnp.maximum(self._lam_upper_bound(A.A, Dinv), 1.0)
        if isinstance(A, ELLMatrix):
            n, kmax = A.vals.shape
            V = A.vals.reshape(n // c, c, kmax)
            S = jnp.sum(jnp.abs(jnp.einsum("eab,ebk->eak", Dinv, V)),
                        axis=-1)
            return jnp.max(S)
        if isinstance(A, BlockDIAMatrix):
            S = jnp.zeros((A.nent, c), A.blocks.dtype)
            for k in range(len(A.offsets)):
                S = S + jnp.sum(
                    jnp.abs(jnp.einsum("eab,ebc->eac", Dinv, A.blocks[k])),
                    axis=-1)
            if A.spill_rows is not None:
                rowabs = jax.ops.segment_sum(
                    jnp.abs(A.spill_vals), A.spill_rows,
                    A.nent * c).reshape(A.nent, c)
                S = S + jnp.einsum("eab,eb->ea", jnp.abs(Dinv), rowabs)
            return jnp.max(S)
        raise TypeError(f"unsupported operator {type(A).__name__}")

    def __call__(self, A_fine, u_fine, t, extra=()):
        """Build the V-cycle ``Minv`` closure at the Newton linearization
        point ``(u_fine, t)``. ``extra`` is the FINE function's
        newton_extra tuple; coarse levels use their own internal-state
        templates (a preconditioner-grade approximation)."""
        from thunderbolt_tpu.utils.smallmat import det_small, inv_small
        h = self.h
        c = h.ncomp
        L = len(h.functions)

        from thunderbolt_tpu.solver.linear import chebyshev

        ops = [None] * L
        binvs = [None] * L
        masks = [None] * L
        bounds = [None] * L
        rng = np.random.default_rng(0)

        def lam_hi(A, Dinv):
            ub = self._lam_upper_bound(A, Dinv)
            v0 = jnp.asarray(rng.standard_normal(A.shape[0]),
                             u_fine.dtype)
            est = _lanczos_lam_max(A.mv, Dinv, v0,
                                   min(self.lanczos_iters, A.shape[0]))
            return jnp.minimum(ub, self.lanczos_safety * est)

        chf = h.fine_function.constraints
        masks[-1] = None if chf is None else chf.free_mask
        ops[-1] = A_fine
        Dinv_f = self._fine_block_dinv(A_fine, masks[-1])
        binvs[-1] = _block_apply(Dinv_f, c)
        bounds[-1] = lam_hi(A_fine, Dinv_f)

        u = u_fine
        for l in range(L - 2, -1, -1):
            u = u.reshape(-1, c)[h.injections[l]].reshape(-1)
            fn = h.functions[l]
            ex = fn.newton_extra() if hasattr(fn, "newton_extra") else ()
            kvals, _ = fn.assemble(u, t, *ex)
            A_raw = fn.jacobian_matrix(kvals)
            ch = fn.constraints
            A = ch.apply_operator(A_raw) if ch is not None else A_raw
            ops[l] = A
            masks[l] = None if ch is None else ch.free_mask
            # block diagonal straight from the CSR values; identity on
            # constrained dofs so smoothing never touches them
            D = kvals[self._slots[l]]
            if ch is not None:
                f = ch.free_mask.reshape(-1, c)
                eye = jnp.eye(c, dtype=kvals.dtype)
                fb = f[:, :, None] & f[:, None, :]
                D = jnp.where(fb, D, eye[None])
            Dinv = inv_small(D, det_small(D))
            binvs[l] = _block_apply(Dinv, c)
            bounds[l] = lam_hi(A, Dinv)

        # coarsest: dense masked operator, exact inverse (monotone on all
        # modes — the stationarity requirement for plain CG)
        n0 = ops[0].shape[0]
        dense = jax.vmap(ops[0].mv)(jnp.eye(n0, dtype=u_fine.dtype)).T
        coarse_inv = jnp.linalg.inv(dense)

        pre, post = self.presmooth, self.postsmooth
        frac = self.cheb_fraction

        def zero_con(l, v):
            m = masks[l]
            return v if m is None else jnp.where(m, v, 0.0)

        def vcycle(level, r):
            if level == 0:
                return coarse_inv @ r
            A, binv, ub = ops[level], binvs[level], bounds[level]
            x = chebyshev(A.mv, r, lam_min=ub / frac, lam_max=ub,
                          iters=pre, Minv=binv)
            pidx, pw = h.prolongations[level - 1]
            rc = _vec_restrict(pidx, pw, r - A.mv(x),
                               h.meshes[level - 1].nnodes, c)
            xc = vcycle(level - 1, zero_con(level - 1, rc))
            x = x + zero_con(level, _vec_prolong(pidx, pw, xc, c))
            x = chebyshev(A.mv, r, x0=x, lam_min=ub / frac, lam_max=ub,
                          iters=post, Minv=binv)
            return x

        def minv(r):
            x = vcycle(L - 1, r)
            m = masks[-1]
            if m is not None:
                # identity on constrained dofs, matching MaskedOperator
                x = jnp.where(m, x, r)
            return x

        return minv


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
