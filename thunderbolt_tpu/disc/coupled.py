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

    def residual(self, w, t, V_targets, *extra):
        """(B [m, n], r_u, r_p) WITHOUT the tangent — the cheap evaluation
        the simplified (chord) Newton iterations run against a frozen
        blocked tangent (``newton_raphson.jl:223-233``:
        ``residual!``-only branch of ``simplified_newton``)."""
        u = w[: self.nmech]
        p = w[self.nmech:]
        r = self.mech.residual(u, t, *extra)
        Bs, rps = [], []
        for i, ch in enumerate(self.chambers):
            U = u[ch.batch.facet_dofs].reshape(ch.batch.nfacets,
                                               ch.batch.nbf, 3)
            V = ch.volume_fn(U)
            G = ch.grad_fn(U)
            g = scatter_vector(G.reshape(ch.batch.nfacets, -1),
                               ch.batch.facet_dofs, self.nmech)
            r = r - p[i] * g
            Bs.append(g)
            rps.append(V - V_targets[i])
        return jnp.stack(Bs), r, jnp.stack(rps)


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
    jitted while_loop — Schur elimination with ONE batched preconditioned
    CG over the m+1 right-hand sides [r_u | -B^T] (the columns share every
    matvec) and a single host readback at the end. ``inner="lu"`` is the
    host path: transfer the assembled tangent, scipy LU, one triangular
    solve per column — robust for indefinite tangents but pays a
    device->host round-trip per Newton iteration.

    ``simplified_newton=True`` is the chord mode of the reference
    (``newton_raphson.jl:67,223-242``) extended with automatic
    re-linearization: the blocked tangent + preconditioner are assembled at
    iteration 0 and REUSED while convergence stays fast; an iteration whose
    residual contracts slower than ``relinearize_ratio`` re-assembles at
    the current state. On tightly-stepped coupled marches (dt = 2 ms) most
    steps converge on the predictor-state tangent alone, dropping the
    per-iteration tangent assembly + preconditioner setup."""

    tol: float = 1e-6
    rtol: float = 0.0
    max_iter: int = 25
    inner: str = "schur_cg"
    inner_rtol: float = 1e-8
    inner_atol: float = 1e-12
    inner_maxiter: int = 4000
    simplified_newton: bool = False
    #: chord-mode refresh threshold: re-linearize when
    #: |r_k| > relinearize_ratio * |r_{k-1}|
    relinearize_ratio: float = 0.5
    #: optional preconditioner factory ``(A, w, t, extra) -> pytree data``
    #: with a matching static ``precon_apply(data, r)``; None keeps
    #: block-Jacobi. (Factories returning closures — the
    #: NewtonRaphsonSolver convention — are NOT accepted here because the
    #: chord mode must carry the preconditioner through the while_loop.)
    precon: Any = None
    precon_apply: Any = None

    # -- traceable core ----------------------------------------------------

    def make_device_core(self, fn: RSAFDQ20223DFunction):
        """Build the TRACEABLE blocked-Newton solve
        ``core(w0, t, V_targets, extra) -> (w, iters, rnorm, converged)``
        — no jit wrapper, so callers can embed it inside their own jitted
        loops (``Coupled3D0DSolver.march``'s per-step body)."""
        from thunderbolt_tpu.solver.linear import cg
        ch = fn.mech.constraints
        cfg = self

        def assemble(w, t, V_targets, extra):
            kvals, B, r_u, r_p = fn.assemble(w, t, V_targets, *extra)
            A_raw = fn.mech.jacobian_matrix(kvals)
            A = ch.apply_operator(A_raw) if ch is not None else A_raw
            if ch is not None:
                r_u = ch.apply_zero(r_u)
                B = jax.vmap(ch.apply_zero)(B)
            return A, B, r_u, r_p

        def resid(w, t, V_targets, extra):
            B, r_u, r_p = fn.residual(w, t, V_targets, *extra)
            if ch is not None:
                r_u = ch.apply_zero(r_u)
                B = jax.vmap(ch.apply_zero)(B)
            return B, r_u, r_p

        from thunderbolt_tpu.fem.sparsity import (
            MaskedOperator, BlockDIAMatrix)
        from thunderbolt_tpu.utils.smallmat import det_small, inv_small

        def make_minv(A, w, t, extra):
            """Preconditioner DATA (a pytree, carryable across while_loop
            iterations — a closure could not be). Default: the inverted
            [c,c] diagonal blocks, computed ONCE per linearization.
            ``inner="schur_dense"``: the dense LU factors of the masked
            tangent instead — at ~1k dofs one MXU factorization (~1 ms
            measured) replaces hundreds of latency-bound CG iterations
            per chord step, and chord Newton amortizes it across the
            whole step (the config-3/4 dense-inner policy applied to the
            blocked solve)."""
            if cfg.inner == "schur_dense":
                from thunderbolt_tpu.fem.sparsity import operator_to_dense
                return jax.scipy.linalg.lu_factor(operator_to_dense(A))
            if cfg.precon is not None:
                return cfg.precon(A, w, t, extra)
            inner = A.A if isinstance(A, MaskedOperator) else A
            if isinstance(inner, BlockDIAMatrix):
                D = inner.blocks[inner.offsets.index(0)]
                # component-major [c, c, nent] — the [nent, c, c] einsum
                # pays the same lane-padding tax as the AoS matvec
                return jnp.transpose(inv_small(D, det_small(D)),
                                     (1, 2, 0))
            return 1.0 / A.diagonal()

        def apply_minv(A, data, r):
            if cfg.precon is not None:
                return cfg.precon_apply(data, r)
            if data.ndim == 3:           # block-Jacobi [c, c, nent]
                c_ = data.shape[0]
                Rc = r.reshape(-1, c_).T             # [c, nent]
                outs = []
                for a in range(c_):
                    acc = data[a, 0] * Rc[0]
                    for b in range(1, c_):
                        acc = acc + data[a, b] * Rc[b]
                    outs.append(acc)
                y = jnp.stack(outs, axis=1).reshape(-1)
            else:
                y = data * r
            if isinstance(A, MaskedOperator):
                f = A.free_mask.astype(r.dtype)
                y = f * y + (1.0 - f) * r
            return y

        def schur_step(A, Mdata, B, r_u, r_p):
            """One blocked-Newton update: ONE vmapped CG over the m+1
            right-hand sides [r_u | -B^T] (columns share each sweep's
            matvec batch; per-column scalars, so no scale mixing) — or,
            with ``inner="schur_dense"``, two triangular solves against
            the carried LU factors — then the tiny multiplier Schur
            solve."""
            rhs = jnp.concatenate([r_u[:, None], -B.T], axis=1)  # [n, m+1]

            if cfg.inner == "schur_dense":
                X = jax.scipy.linalg.lu_solve(Mdata, rhs)
            else:
                def solve_col(b):
                    x, _ = cg(A.mv,
                              b, Minv=lambda v: apply_minv(A, Mdata, v),
                              rtol=cfg.inner_rtol, atol=cfg.inner_atol,
                              maxiter=cfg.inner_maxiter)
                    return x

                X = jax.vmap(solve_col, in_axes=1, out_axes=1)(rhs)
            xf, W = X[:, 0], X[:, 1:]
            S = B @ W
            from thunderbolt_tpu.solver.linear import _small_dense_solve
            dp = _small_dense_solve(S, B @ xf - r_p)
            du = xf - W @ dp
            return du, dp

        i32 = lambda v: jnp.asarray(v, jnp.int32)

        def core(w0, t, V_targets, extra):
            u0 = ch.apply(w0[: fn.nmech]) if ch is not None \
                else w0[: fn.nmech]
            w_init = jnp.concatenate([u0, w0[fn.nmech:]])
            dt_ = w_init.dtype
            A0, B0, ru0, rp0 = assemble(w_init, t, V_targets, extra)
            M0 = make_minv(A0, w_init, t, extra)

            def cond(c):
                return (c["status"] == 0) & (c["it"] < cfg.max_iter)

            def body(c):
                w, it = c["w"], c["it"]
                if cfg.simplified_newton:
                    # iteration 0 uses the pre-loop tangent; later
                    # iterations refresh only on slow contraction
                    fresh = resid(w, t, V_targets, extra)
                    rn_here = jnp.sqrt(jnp.sum(fresh[1] ** 2)
                                       + jnp.sum(fresh[2] ** 2))
                    relin = (it > 0) & (rn_here >
                                        cfg.relinearize_ratio * c["rnorm"])

                    def do_relin(_):
                        A, B, r_u, r_p = assemble(w, t, V_targets, extra)
                        return A, make_minv(A, w, t, extra), B, r_u, r_p

                    def reuse(_):
                        B, r_u, r_p = fresh
                        return c["A"], c["M"], B, r_u, r_p

                    A, Mdata, B, r_u, r_p = jax.lax.cond(
                        relin, do_relin, reuse, operand=None)
                else:
                    def first(_):
                        return c["A"], c["M"], c["B"], c["ru"], c["rp"]

                    def again(_):
                        A, B, r_u, r_p = assemble(w, t, V_targets, extra)
                        return A, make_minv(A, w, t, extra), B, r_u, r_p

                    A, Mdata, B, r_u, r_p = jax.lax.cond(
                        it == 0, first, again, operand=None)
                rnorm = jnp.sqrt(jnp.sum(r_u ** 2) + jnp.sum(r_p ** 2))
                rnorm0 = jnp.where(it == 0, rnorm, c["rnorm0"])
                target = jnp.maximum(jnp.asarray(cfg.tol, dt_),
                                     cfg.rtol * rnorm0)
                status = jnp.where(
                    rnorm <= target, i32(1),
                    jnp.where(~jnp.isfinite(rnorm), i32(2), i32(0)))

                def advance(_):
                    du, dp = schur_step(A, Mdata, B, r_u, r_p)
                    return w - jnp.concatenate([du, dp])

                w_new = jax.lax.cond(status == 0, advance, lambda _: w,
                                     operand=None)
                return {"w": w_new, "rnorm0": rnorm0, "rnorm": rnorm,
                        "it": it + 1, "status": status, "A": A, "M": Mdata,
                        "B": B, "ru": r_u, "rp": r_p}

            carry = {"w": w_init, "rnorm0": jnp.asarray(0.0, dt_),
                     "rnorm": jnp.asarray(jnp.inf, dt_), "it": i32(0),
                     "status": i32(0), "A": A0, "M": M0, "B": B0,
                     "ru": ru0, "rp": rp0}
            out = jax.lax.while_loop(cond, body, carry)
            # final residual check (covers max_iter exits)
            _, r_u, r_p = resid(out["w"], t, V_targets, extra)
            rn = jnp.sqrt(jnp.sum(r_u ** 2) + jnp.sum(r_p ** 2))
            target = jnp.maximum(jnp.asarray(cfg.tol, dt_),
                                 cfg.rtol * out["rnorm0"])
            return (out["w"], out["it"], rn,
                    (out["status"] == 1) | (rn <= target))

        return core

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
        extra0 = fn.newton_extra() if hasattr(fn, "newton_extra") else ()
        cache_key = ("_blocked_jit_device", self)
        run = fn.__dict__.get(cache_key)
        if run is None:
            run = jax.jit(self.make_device_core(fn))
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


def make_coupled_step(newton, fn3d, circuit, dt, nsub, stateful, dtype):
    """ONE Lie-Trotter coupled step — blocked 3D Newton at prescribed
    chamber volumes, committed internal-state advance
    (``internal_after_step``), 0D circuit RK2 substeps — as a pure
    traceable function:

        step(w, c, internal, t, static_extra=()) ->
            (w, c, internal, (tn, volumes[m], pressures[m], iters, conv))

    This is the SINGLE step body shared by :meth:`Coupled3D0DSolver.march`
    and :meth:`CoupledElectromechanics3D0D.march` (round 4: the EM march
    previously re-implemented this logic inside its own scan — two copies
    to keep in sync). ``stateful`` threads the condensed internal state
    through ``newton_extra``-layout traced operands; stateless callers
    pass their fixed ``static_extra`` tuple instead.
    """
    from thunderbolt_tpu.solver.time.homotopy import _flatten_internal

    core = newton.make_device_core(fn3d)
    mech = fn3d.mech
    vol_ix = np.array([circuit.volume_index(ch.lumped_symbol)
                       for ch in fn3d.chambers])
    pix = np.array([circuit.pressure_input_index(ch.lumped_symbol)
                    for ch in fn3d.chambers])
    dt = float(dt)
    h = dt / nsub

    def step(w, c, internal, t, static_extra=()):
        tn = t + dt
        V_targets = c[vol_ix].astype(w.dtype)
        extra = _flatten_internal(internal, dt, tn, dtype) if stateful \
            else static_extra
        w, iters, rnorm, conv = core(w, tn, V_targets, extra)
        if stateful:
            internal = mech.internal_after_step(w[: fn3d.nmech], tn, dt,
                                                internal)
        p = w[fn3d.nmech:]
        ext = jnp.zeros(circuit.num_unknown_pressures(),
                        c.dtype).at[pix].set(p.astype(c.dtype))

        def sub(cc, i):
            ti = t + i * h
            k1 = circuit.rhs(cc, ti, ext)
            k2 = circuit.rhs(cc + 0.5 * h * k1, ti + 0.5 * h, ext)
            return cc + h * k2, None

        c, _ = jax.lax.scan(sub, c, jnp.arange(nsub))
        rec = (tn, c[vol_ix], p, iters, conv)
        return w, c, internal, rec

    return step


@dataclass
class CoupledMarchReport:
    """Per-step device records of a :meth:`Coupled3D0DSolver.march` —
    everything a PV-loop analysis needs without any host round-trip
    during the march."""
    ts: Any            # [nsteps] end-of-step times
    volumes: Any       # [nsteps, m] chamber volumes (circuit state)
    pressures: Any     # [nsteps, m] chamber multiplier pressures
    iterations: Any    # [nsteps] blocked-Newton iteration counts
    converged: Any     # [nsteps] bool

    def all_converged(self):
        return bool(jnp.all(self.converged))


@dataclass
class EMMarchReport(CoupledMarchReport):
    """CoupledMarchReport + the EP activation trace of a device-resident
    electromechanics march (``CoupledElectromechanics3D0D.march``)."""
    phi_max: Any = None   # [nsteps] max transmembrane potential


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

    def march(self, fn3d, circuit, w, c, t0, dt, nsteps):
        """Device-resident coupled march: ``nsteps`` Lie-Trotter coupled
        steps — blocked 3D Newton + 0D circuit substepping — inside ONE
        jitted ``lax.scan``. 400 coupled steps cost one dispatch and one
        readback instead of 800 (the round-2 host loop paid a tunnel
        round-trip per blocked solve AND per circuit advance).

        Stateful structural models (condensed sarcomere state) are
        threaded through the scan via ``internal_after_step``; the
        committed state is written back to ``fn3d.mech.internal`` only
        when every step converged, so the host-driver fallback starts
        from the intact pre-march state.

        Returns ``(w, c, CoupledMarchReport)``; the report's per-step
        volumes/pressures are the PV-loop trace. A non-converged step is
        recorded (``report.converged[k] = False``) and the march carries
        on with the unconverged state — callers check ``all_converged()``.
        """
        internal0 = getattr(fn3d.mech, "internal", None)
        stateful = internal0 is not None
        static_extra = () if stateful else (
            fn3d.newton_extra() if hasattr(fn3d, "newton_extra") else ())
        dt = float(dt)

        # circuit is in the key (frozen dataclass, value-hashable): the
        # compiled closure bakes in its rhs/indices, so a different
        # circuit sharing this fn3d must not reuse the entry. dt is baked
        # into the shared step body, so it is in the key too.
        from thunderbolt_tpu.utils.hoist import hoist_enabled, hoisted_jit
        hoist = hoist_enabled()
        cache_key = ("_coupled_march_jit", self.newton,
                     self.circuit_substeps, int(nsteps), circuit, dt,
                     stateful, hoist)
        run = fn3d.__dict__.get(cache_key)
        if run is None:
            step1 = make_coupled_step(self.newton, fn3d, circuit, dt,
                                      self.circuit_substeps, stateful,
                                      w.dtype)

            def run(w, c, t0, internal, extra):
                def body(carry, k):
                    w, c, internal, t = carry
                    w, c, internal, rec = step1(w, c, internal, t, extra)
                    return (w, c, internal, t + dt), rec

                (w, c, internal, t), recs = jax.lax.scan(
                    body, (w, c, internal, jnp.asarray(t0, c.dtype)),
                    jnp.arange(nsteps))
                return w, c, internal, recs

            if hoist:
                # tunnel deployments: FEM tables as jit parameters, not
                # HLO constants (utils/hoist.py; BASELINE.md 353k note).
                # t0 is coerced at the boundary — the hoisted replay is
                # specialized to concrete avals, unlike jax.jit's cache.
                ex_internal = [None if st is None else dict(st)
                               for st in internal0] if stateful else None
                run_h = hoisted_jit(run, w, c, jnp.asarray(t0, c.dtype),
                                    ex_internal, static_extra)

                def run(w, c, t0, internal, extra, _h=run_h):
                    return _h(w, c, jnp.asarray(t0, c.dtype), internal,
                              extra)
                run.n_hoisted = run_h.n_hoisted
                run.hoisted_bytes = run_h.hoisted_bytes
            else:
                run = jax.jit(run)
            fn3d.__dict__[cache_key] = run

        internal_in = [None if st is None else dict(st)
                       for st in internal0] if stateful else None
        w, c, internal, (ts, vols, ps, iters, conv) = run(
            w, c, t0, internal_in, static_extra)
        if stateful and bool(conv.all()):
            committed = [None if st is None else dict(st)
                         for st in internal]
            if hasattr(fn3d.mech, "set_internal"):
                fn3d.mech.set_internal(committed)   # sharded wrapper
            else:
                fn3d.mech.internal = committed
        return w, c, CoupledMarchReport(ts, vols, ps, iters, conv)
