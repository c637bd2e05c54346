"""Semidiscretization + solver for the coupled 3D-0D heart model.

Parity: ``semidiscretize(RSAFDQ2022Split, ...)`` (``rsafdq2022.jl:208-251``),
``RSAFDQ20223DFunction`` (``:94``), ``create_chamber_tyings`` (``:173-199``),
the blocked Newton with ``SchurComplementLinearSolver``
(``src/solver/linear/schur.jl:26-80``), and the Lie-Trotter split between
the 3D block and the pointwise 0D circuit (SURVEY.md call stack 3.4).

The saddle system per Newton iteration is

    [ K + sum_i p_i Hess(V_i)    dV_i/du ] [du]   [r_u]
    [ (dV_j/du)^T                   0    ] [dp] = [r_p]

solved by the Schur complement over the (tiny) multiplier block; chamber
volumes and their derivatives come from AD of the surrogate volume integral.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from thunderbolt_tpu.fem.sparsity import build_sparsity, csr_to_ell
from thunderbolt_tpu.fem.facets import make_facet_batch
from thunderbolt_tpu.fem.forms import scatter_vector, scatter_matrix
from thunderbolt_tpu.disc.semidiscretize import semidiscretize
from thunderbolt_tpu.disc.functions import VariableInfo
from thunderbolt_tpu.models.coupling import (
    RSAFDQ2022Split, RSAFDQ2022Model, LumpedFluidSolidCoupler)
from thunderbolt_tpu.solver.nonlinear.newton import NewtonStats


@dataclass
class ChamberTying:
    """One chamber's tying data (``RSAFDQ2022SingleChamberTying``,
    ``rsafdq2022.jl:3``)."""
    name: str
    lumped_symbol: str
    batch: Any                 # FacetBatch of the chamber surface
    elem_map: Any              # facet-block CSR map (for p * Hess(V))
    volume_fn: Any             # U [nf,nbf,3] -> V (differentiable)
    grad_fn: Any               # U -> dV/dU [nf,nbf,3]
    hess_fn: Any               # U -> per-facet Hessian [nf, nd, nd]


@dataclass
class RSAFDQ20223DFunction:
    """Structural function + chamber multipliers, sharing one state
    [u_mech; p_chambers] (``rsafdq2022.jl:94``)."""
    mech: Any
    chambers: List[ChamberTying]

    @property
    def nmech(self):
        return self.mech.solution_size

    @property
    def solution_size(self):
        return self.nmech + len(self.chambers)

    def variables(self):
        out = dict(self.mech.variables())
        for i, ch in enumerate(self.chambers):
            out[f"p_{ch.lumped_symbol}"] = VariableInfo(self.nmech + i, 1)
        return out

    def volumes(self, u):
        return jnp.stack([
            ch.volume_fn(u[ch.batch.facet_dofs].reshape(
                ch.batch.nfacets, ch.batch.nbf, 3))
            for ch in self.chambers])

    def newton_extra(self):
        """Per-step traced operands of the structural block (condensed
        sarcomere state, simulated calcium, ...)."""
        return self.mech.newton_extra() \
            if hasattr(self.mech, "newton_extra") else ()

    def assemble(self, w, t, V_targets, *extra):
        """(kvals incl. p*Hess(V), B [m, n], r_u, r_p)."""
        u = w[: self.nmech]
        p = w[self.nmech:]
        kvals, r = self.mech.assemble(u, t, *extra)
        Bs, rps = [], []
        for i, ch in enumerate(self.chambers):
            U = u[ch.batch.facet_dofs].reshape(ch.batch.nfacets,
                                               ch.batch.nbf, 3)
            V = ch.volume_fn(U)
            G = ch.grad_fn(U)
            g = scatter_vector(G.reshape(ch.batch.nfacets, -1),
                               ch.batch.facet_dofs, self.nmech)
            H = ch.hess_fn(U)
            # pressure virtual work: r_u -= p * dV/du (p > 0 inflates)
            kvals = kvals - p[i] * scatter_matrix(
                H, ch.elem_map, self.mech.pattern.nnz)
            r = r - p[i] * g
            Bs.append(g)
            rps.append(V - V_targets[i])
        return kvals, jnp.stack(Bs), r, jnp.stack(rps)


def _build_tying(mech_fn, coupler: LumpedFluidSolidCoupler, dtype):
    """Extend the structural pattern with chamber facet blocks and build
    the per-chamber AD volume kernels."""
    dh = mech_fn.dh
    field = mech_fn.field
    vm = coupler.volume_method

    chamber_batches = []
    for cc in coupler.chamber_couplings:
        chamber_batches.append(
            (cc, make_facet_batch(dh, field, cc.chamber_surface_setname,
                                  dtype=dtype)))

    # rebuild the sparsity union: volume blocks + wbc blocks + chamber blocks
    vol_tables = [np.asarray(b.cell_dofs) for b in mech_fn.batches]
    wbc_tables = [np.asarray(k[2]) for k in mech_fn.wbc_kernels]
    ch_tables = [np.asarray(b.facet_dofs) for _, b in chamber_batches]
    pattern = build_sparsity(vol_tables + wbc_tables + ch_tables, dh.ndofs)
    nvol, nwbc = len(vol_tables), len(wbc_tables)
    mech_fn.pattern = pattern
    mech_fn.volume_elem_maps = [jnp.asarray(em)
                                for em in pattern.elem_maps[:nvol]]
    mech_fn.wbc_kernels = [
        (res, tan, dofs, jnp.asarray(em))
        for (res, tan, dofs, _), em in zip(mech_fn.wbc_kernels,
                                           pattern.elem_maps[nvol:nvol + nwbc])]

    chambers = []
    for (cc, batch), em in zip(chamber_batches,
                               pattern.elem_maps[nvol + nwbc:]):
        def make(batch):
            def vol(U):
                return jnp.sum(jax.vmap(
                    lambda uf, Xf: vm.facet_volume(batch, uf, Xf)
                )(U, batch.Xf))

            grad = jax.grad(vol)

            def hess(U):
                def facet_grad(uflat, Xf):
                    nbf = batch.nbf
                    f = lambda v: vm.facet_volume(batch, v.reshape(nbf, 3),
                                                  Xf)
                    return jax.jacfwd(jax.grad(f))(uflat)
                return jax.vmap(facet_grad)(
                    U.reshape(batch.nfacets, -1), batch.Xf)

            return vol, grad, hess

        vol, grad, hess = make(batch)
        chambers.append(ChamberTying(
            name=cc.chamber_surface_setname, lumped_symbol=cc.lumped_model_symbol,
            batch=batch, elem_map=jnp.asarray(em),
            volume_fn=vol, grad_fn=grad, hess_fn=hess))
    return chambers


@semidiscretize.register
def _(split: RSAFDQ2022Split, disc, mesh):
    model = split.model
    mech_fn = semidiscretize(model.structural_model, disc, mesh)
    chambers = _build_tying(mech_fn, model.coupler, disc.dtype)
    fn3d = RSAFDQ20223DFunction(mech=mech_fn, chambers=chambers)
    return fn3d, model.circuit_model


# ---------------------------------------------------------------------------
# blocked Newton + 3D/0D Lie-Trotter stepping
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class BlockedNewtonSolver:
    """Newton on the (u, p) saddle system with Schur elimination of p
    (``SchurComplementLinearSolver``, ``src/solver/linear/schur.jl:26``).

    ``inner="schur_cg"`` (default) runs the WHOLE solve on device inside a
    jitted while_loop — Schur elimination with one preconditioned CG solve
    per multiplier column (m+1 inner solves/iteration) and a single host
    readback at the end. ``inner="lu"`` is the host path: transfer the
    assembled tangent, scipy LU, one triangular solve per column — robust
    for indefinite tangents but pays a device->host round-trip per Newton
    iteration."""

    tol: float = 1e-6
    rtol: float = 0.0
    max_iter: int = 25
    inner: str = "schur_cg"
    inner_rtol: float = 1e-8
    inner_atol: float = 1e-12
    inner_maxiter: int = 4000

    def solve(self, fn: RSAFDQ20223DFunction, w0, t, V_targets):
        if self.inner == "lu":
            return self.solve_lu(fn, w0, t, V_targets)
        w, stats = self.solve_device(fn, w0, t, V_targets)
        if not stats.converged:
            # CG on an indefinite mechanics tangent can stall; retry on the
            # robust host-LU path before reporting failure (the docstring's
            # own caveat — advisor round-1 finding)
            return self.solve_lu(fn, w0, t, V_targets)
        return w, stats

    def solve_device(self, fn: RSAFDQ20223DFunction, w0, t, V_targets):
        from thunderbolt_tpu.solver.linear import (
            cg, jacobi_preconditioner, schur_complement_solve)
        ch = fn.mech.constraints
        cfg = self
        extra0 = fn.newton_extra() if hasattr(fn, "newton_extra") else ()

        cache_key = ("_blocked_jit_device", self)
        run = fn.__dict__.get(cache_key)
        if run is None:
            def assemble(w, t, V_targets, extra):
                kvals, B, r_u, r_p = fn.assemble(w, t, V_targets, *extra)
                A_raw = fn.mech.jacobian_matrix(kvals)
                A = ch.apply_operator(A_raw) if ch is not None else A_raw
                if ch is not None:
                    r_u = ch.apply_zero(r_u)
                    B = jax.vmap(ch.apply_zero)(B)
                return A, B, r_u, r_p

            @jax.jit
            def run(w0, t, V_targets, extra):
                u0 = ch.apply(w0[: fn.nmech]) if ch is not None \
                    else w0[: fn.nmech]
                w_init = jnp.concatenate([u0, w0[fn.nmech:]])
                dt_ = w_init.dtype
                i32 = lambda v: jnp.asarray(v, jnp.int32)

                def cond(c):
                    w, rnorm0, rnorm, it, status = c
                    return (status == 0) & (it < cfg.max_iter)

                def body(c):
                    w, rnorm0, rnorm_prev, it, status = c
                    A, B, r_u, r_p = assemble(w, t, V_targets, extra)
                    rnorm = jnp.sqrt(jnp.sum(r_u ** 2) + jnp.sum(r_p ** 2))
                    rnorm0 = jnp.where(it == 0, rnorm, rnorm0)
                    target = jnp.maximum(jnp.asarray(cfg.tol, dt_),
                                         cfg.rtol * rnorm0)
                    status = jnp.where(
                        rnorm <= target, i32(1),
                        jnp.where(~jnp.isfinite(rnorm), i32(2), i32(0)))
                    Minv = A.block_jacobi_inv() \
                        if hasattr(A, "block_jacobi_inv") \
                        else jacobi_preconditioner(A.diagonal())

                    def A_solve(b):
                        x, _ = cg(A.mv, b, Minv=Minv, rtol=cfg.inner_rtol,
                                  atol=cfg.inner_atol,
                                  maxiter=cfg.inner_maxiter)
                        return x

                    # J = [[K, -B], [B^T, 0]] -> schur([A, -B^T; B, 0])
                    du, dp = schur_complement_solve(
                        A_solve, -B.T, B, r_u, r_p)
                    w_new = w - jnp.concatenate([du, dp])
                    w_new = jnp.where(status == 0, w_new, w)
                    return (w_new, rnorm0, rnorm, it + 1, status)

                carry = (w_init, jnp.asarray(0.0, dt_),
                         jnp.asarray(jnp.inf, dt_), i32(0), i32(0))
                w, rnorm0, rnorm, it, status = jax.lax.while_loop(
                    cond, body, carry)
                # final residual check (covers max_iter exits)
                _, _, r_u, r_p = assemble(w, t, V_targets, extra)
                rn = jnp.sqrt(jnp.sum(r_u ** 2) + jnp.sum(r_p ** 2))
                target = jnp.maximum(jnp.asarray(cfg.tol, dt_),
                                     cfg.rtol * rnorm0)
                return w, it, rn, (status == 1) | (rn <= target)

            fn.__dict__[cache_key] = run

        w, it, rnorm, conv = jax.device_get(run(w0, t, V_targets, extra0))
        return jnp.asarray(w), NewtonStats(int(it), float(rnorm),
                                           bool(conv), ())

    def solve_lu(self, fn: RSAFDQ20223DFunction, w0, t, V_targets):
        ch = fn.mech.constraints
        m = len(fn.chambers)

        assemble_j = fn.__dict__.get("_blocked_jit")
        if assemble_j is None:
            @jax.jit
            def assemble_j(w, t, V_targets, extra):
                kvals, B, r_u, r_p = fn.assemble(w, t, V_targets, *extra)
                A_raw = fn.mech.jacobian_matrix(kvals)
                A = ch.apply_operator(A_raw) if ch is not None else A_raw
                if ch is not None:
                    r_u = ch.apply_zero(r_u)
                    B = jax.vmap(ch.apply_zero)(B)
                return A, B, r_u, r_p
            fn.__dict__["_blocked_jit"] = assemble_j

        extra0 = fn.newton_extra() if hasattr(fn, "newton_extra") else ()

        def assemble(w):
            return assemble_j(w, t, V_targets, extra0)

        from thunderbolt_tpu.fem.sparsity import any_to_scipy
        import scipy.sparse.linalg as spla

        u0 = ch.apply(w0[: fn.nmech]) if ch is not None else w0[: fn.nmech]
        w = jnp.concatenate([u0, w0[fn.nmech:]])
        history = []
        for it in range(self.max_iter):
            A, B, r_u, r_p = assemble(w)
            rnorm = float(jnp.sqrt(jnp.sum(r_u ** 2) + jnp.sum(r_p ** 2)))
            history.append(rnorm)
            if rnorm <= max(self.tol, self.rtol * history[0]):
                return w, NewtonStats(it, rnorm, True, tuple(history))
            if not np.isfinite(rnorm):
                return w, NewtonStats(it, rnorm, False, tuple(history))
            # J = [[K, -B], [B^T, 0]]; Schur over the multiplier block
            A_sp = any_to_scipy(A).tocsc()
            lu = spla.splu(A_sp)
            X_b = lu.solve(np.asarray(r_u))
            X_B = np.stack([lu.solve(np.asarray(B[i]))
                            for i in range(m)], axis=1)   # [n, m]
            S = np.asarray(B) @ X_B                        # [m, m]
            dp = np.linalg.solve(S, np.asarray(r_p) - np.asarray(B) @ X_b)
            du = X_b + X_B @ dp
            w = w - jnp.concatenate([jnp.asarray(du),
                                     jnp.asarray(dp)]).astype(w.dtype)
        rnorm = history[-1]
        return w, NewtonStats(self.max_iter, rnorm, rnorm <= self.tol,
                              tuple(history))


@dataclass
class Coupled3D0DSolver:
    """Lie-Trotter split: (1) solve the tied 3D block with the chamber
    volumes prescribed by the circuit state; (2) advance the 0D circuit
    with the multiplier pressures as external inputs (call stack 3.4)."""

    newton: BlockedNewtonSolver = BlockedNewtonSolver()
    circuit_substeps: int = 100

    def init(self, fn3d, circuit, dtype=jnp.float64):
        w = jnp.zeros(fn3d.solution_size, dtype)
        c = jnp.asarray(circuit.default_initial_state(), dtype)
        # consistent multiplier start: 0; chamber volumes of the circuit
        # should start near V3D(0) for a smooth takeoff — the caller may
        # overwrite the circuit volume states accordingly.
        return w, c

    def step(self, fn3d, circuit, w, c, t, dt):
        m = len(fn3d.chambers)
        V_targets = jnp.stack([
            c[circuit.volume_index(ch.lumped_symbol)]
            for ch in fn3d.chambers])
        w, stats = self.newton.solve(fn3d, w, t + dt, V_targets)
        if not stats.converged:
            return w, c, stats
        p = w[fn3d.nmech:]
        # order the external inputs the way the circuit expects — static
        # index map, multipliers stay on device (no per-step host pull)
        idx = np.array([circuit.pressure_input_index(chm.lumped_symbol)
                        for chm in fn3d.chambers])
        ext = jnp.zeros(circuit.num_unknown_pressures(),
                        c.dtype).at[idx].set(p.astype(c.dtype))
        h = dt / self.circuit_substeps

        def body(c, i):
            ti = t + i * h
            k1 = circuit.rhs(c, ti, ext)
            k2 = circuit.rhs(c + 0.5 * h * k1, ti + 0.5 * h, ext)
            return c + h * k2, None

        c, _ = jax.lax.scan(body, c, jnp.arange(self.circuit_substeps))
        return w, c, stats
