"""Coupled electromechanics: simulated calcium drives the sarcomeres.

Beyond-reference capability: the reference's electromechanics tutorials
(CM03, ``src/modeling/rsafdq2022.jl``) drive contraction from a PRESCRIBED
analytical calcium transient; its EP and mechanics stacks never exchange
state. Here the monodomain solve's ionic calcium (e.g. ten Tusscher 2006
``Ca_i``) is interpolated to the mechanics quadrature points every coupling
step and fed to the Ca-driven sarcomere models — one-way (excitation →
contraction) coupling, the standard weakly-coupled electromechanics
formulation.

TPU-native data path: the nodal Ca → qp interpolation is ONE static gather
(`ca_points[gather_idx]`) + one einsum against the shape table, composed
from the EP and mechanics dof handlers' ``entity_nodes`` maps at setup; the
per-step Ca field rides the mechanics function's internal-state channel
(``QuasiStaticFunction.newton_extra``) as a traced operand, so the cached
one-dispatch Newton loop never recompiles across steps.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import numpy as np
import jax.numpy as jnp

from thunderbolt_tpu.disc.mechanics import make_material_kernels
from thunderbolt_tpu.disc.solution_variables import (
    solution_variable, _leaf_functions)
from thunderbolt_tpu.solver.time.integrator import init as integrator_init
from thunderbolt_tpu.solver.nonlinear.newton import NewtonRaphsonSolver


def refresh_material_kernels(fn):
    """Rebuild each batch's material kernels from the CURRENT internal-state
    key set. Required after injecting a new per-step driving field (e.g.
    ``internal[i]["Ca"]``) into a semidiscretized mechanics function: the
    kernels thread exactly the aux keys they were built with, so a key
    added later would otherwise be silently ignored."""
    internal = fn.internal if fn.internal is not None \
        else [None] * len(fn.batches)
    for bi, (cache, st) in enumerate(zip(fn.mat_caches, internal)):
        material = fn._material(bi)
        if st is not None:
            aux0 = material.aux(cache, 0.0, {
                **st, "dt": jnp.asarray(1.0), "t": jnp.asarray(0.0)})
        else:
            aux0 = material.aux(cache, 0.0)
        cache["aux_keys"] = tuple(aux0.keys())
        cache["kernels"] = make_material_kernels(
            material, cache["frames"], cache["aux_keys"])


class CalciumTransfer:
    """Static EP-point → mechanics-qp calcium transport.

    Builds (once, at setup) the gather maps from the EP dof handler's point
    numbering to each Ca-driven mechanics batch's (cell, node) table; per
    step the transport is ONE gather + one einsum against the shape table.
    Shared by the mechanics-only and the 3D-0D electromechanics drivers."""

    def __init__(self, ep_ode, mech_fn, ca_symbol: str = "Ca_i",
                 ca_transform: Optional[Callable] = None):
        if mech_fn.internal is None:
            raise ValueError(
                "coupled electromechanics needs a mechanics function with "
                "stateful Ca-driven materials (e.g. ActiveStressModel with "
                "an RDQ20MF CaDrivenInternalSarcomereModel)")
        self.fn = mech_fn
        self.ca_transform = ca_transform or (lambda c: c)
        vi = solution_variable(ep_ode, ca_symbol)
        self._ca_slice = vi.slice
        heat = _leaf_functions(ep_ode)[0]
        ep_nodes = heat.dh.fields[heat.field].entity_nodes
        nnodes = int(ep_nodes.max()) + 1
        node_to_point = np.full(nnodes, -1, dtype=np.int64)
        node_to_point[ep_nodes] = np.arange(len(ep_nodes))
        mfi = mech_fn.dh.fields[mech_fn.field]
        ncomp = mfi.ncomponents
        self._gather = []
        for batch, st in zip(mech_fn.batches, mech_fn.internal):
            if st is None:
                self._gather.append(None)
                continue
            ent = np.asarray(batch.cell_dofs)[:, ::ncomp] // ncomp
            cell_nodes = mfi.entity_nodes[ent]           # [nc, nb] mesh ids
            idx = node_to_point[cell_nodes]
            if (idx < 0).any():
                raise ValueError(
                    "mechanics subdomain has nodes outside the EP domain; "
                    "coupled EM requires the EP solve to cover every "
                    "Ca-driven mechanics cell")
            self._gather.append(jnp.asarray(idx))

    def to_qps(self, u_ep):
        """Per-batch [nc, nqp] calcium from the full EP state vector."""
        ca = self.ca_transform(u_ep[self._ca_slice])
        out = []
        for batch, idx in zip(self.fn.batches, self._gather):
            if idx is None:
                out.append(None)
                continue
            ca_elem = ca[idx]                             # [nc, nb]
            out.append(jnp.einsum("qb,cb->cq", batch.N,
                                  ca_elem.astype(batch.N.dtype)))
        return out

    def write(self, ca_qps):
        """Write per-batch qp calcium (zeros when None) into the mechanics
        internal-state channel."""
        for bi, st in enumerate(self.fn.internal):
            if st is None:
                continue
            if ca_qps is None:
                nc, nqp = self.fn.mat_caches[bi]["frames"].shape[:2]
                st["Ca"] = jnp.zeros((nc, nqp), self.fn.batches[bi].N.dtype)
            else:
                st["Ca"] = ca_qps[bi]

    @staticmethod
    def blend(ca_old, ca_new, alpha):
        return [None if co is None else (1 - alpha) * co + alpha * cn
                for co, cn in zip(ca_old, ca_new)]


class CoupledElectromechanics:
    """One-way coupled EP → mechanics driver on a shared mesh.

    Parameters:
      ep_ode / ep_alg / ep_dt: a semidiscretized ``ReactionDiffusionSplit``
        (whose ionic model publishes ``ca_symbol``) and its splitting
        algorithm + inner dt.
      mech_fn: a semidiscretized ``QuasiStaticModel`` whose (stateful,
        Ca-driven) materials consume per-qp calcium; passive subdomains
        (no internal state) are left untouched.
      mech_solver: ``NewtonRaphsonSolver`` (warm-started from the previous
        step's displacement).
      ca_symbol: name of the ionic calcium state (default ``"Ca_i"``).
      ca_transform: elementwise map applied to the nodal calcium before it
        reaches the sarcomeres (unit conversion / scaling, e.g. mM → the
        sarcomere model's μM-calibrated drive). Default identity.
    """

    def __init__(self, ep_ode, ep_alg, ep_dt, mech_fn, mech_solver=None, *,
                 ca_symbol: str = "Ca_i",
                 ca_transform: Optional[Callable] = None):
        self.ep_ode = ep_ode
        self.ep_alg = ep_alg
        self.ep_dt = float(ep_dt)
        self.fn = mech_fn
        self.solver = mech_solver or NewtonRaphsonSolver(
            tol=1e-8, inner="gmres", inner_rtol=1e-10)
        self._ca = CalciumTransfer(ep_ode, mech_fn, ca_symbol, ca_transform)

        # inject the Ca channel (zeros until the march sets the real field)
        # and rebuild the kernels so the new aux key is threaded
        self.set_calcium(None)
        refresh_material_kernels(mech_fn)

    # -- calcium transport ---------------------------------------------------

    def _write_ca(self, ca_qps):
        self._ca.write(ca_qps)

    def set_calcium(self, u_ep):
        """Write the EP state's calcium into the mechanics internal-state
        channel (zeros when ``u_ep`` is None)."""
        self._write_ca(None if u_ep is None else self._ca.to_qps(u_ep))

    # -- time marching ---------------------------------------------------

    def solve(self, tspan, dt_mech, u_mech0=None, u_ep0=None, *,
              monitor: Optional[Callable] = None):
        """March ``tspan`` with mechanics step ``dt_mech``; the EP
        integrator advances to each mechanics time with its own (finer)
        dt. Returns ``(ts, us, u_ep)`` — mechanics times/solutions and the
        final EP state. ``monitor(t, u_mech, u_ep)`` is called after every
        accepted coupled step."""
        from thunderbolt_tpu.disc.solution_variables import (
            create_initial_condition)
        t0, tf = float(tspan[0]), float(tspan[1])
        if u_ep0 is None:
            u_ep0 = create_initial_condition(self.ep_ode, jnp.float64)
        integ = integrator_init(self.ep_ode, self.ep_alg, u_ep0,
                                (t0, tf), self.ep_dt)
        u = u_mech0 if u_mech0 is not None \
            else jnp.zeros(self.fn.solution_size,
                           self.fn.batches[0].N.dtype)
        ca = self._ca.to_qps(integ.u)
        self._ca.write(ca)
        ts, us = [t0], [u]
        nsteps = int(round((tf - t0) / dt_mech))
        for k in range(1, nsteps + 1):
            t_prev, t = t0 + (k - 1) * dt_mech, t0 + k * dt_mech
            integ.advance_to(t)
            ca_new = self._ca.to_qps(integ.u)
            u = self._mech_advance(u, t_prev, t, ca, ca_new)
            ca = ca_new
            ts.append(t)
            us.append(u)
            if monitor is not None:
                monitor(t, u, integ.u)
        return np.asarray(ts), us, integ.u

    def _mech_advance(self, u, t_prev, t, ca_old, ca_new,
                      max_halvings: int = 6):
        """One coupled mechanics step with continuation on Newton reject:
        the calcium drive is linearly interpolated between the two EP
        instants and the step is bisected (Deuflhard-style halving, parity
        with the homotopy controllers) until Newton converges."""
        dt = t - t_prev
        internal0 = [None if st is None else dict(st)
                     for st in self.fn.internal]
        for halving in range(max_halvings + 1):
            nsub = 2 ** halving
            u_try = u
            ok = True
            for j in range(1, nsub + 1):
                alpha = j / nsub
                tj = t_prev + alpha * dt
                self._ca.write(CalciumTransfer.blend(ca_old, ca_new, alpha))
                self.fn.internal_dt = dt / nsub
                self.fn.internal_t = tj
                u_try, stats = self.solver.solve(self.fn, u_try,
                                                 jnp.asarray(tj))
                if not stats.converged:
                    ok = False
                    break
                # commits Q/lam; the Ca entries carry through ({**st, ...})
                self.fn.update_internal_state(u_try, tj, dt / nsub)
            if ok:
                return u_try
            # restore the pre-step internal state before retrying finer
            self.fn.internal = [None if st is None else dict(st)
                                for st in internal0]
        raise RuntimeError(
            f"mechanics Newton failed at t={t} even with "
            f"{2 ** max_halvings} continuation substeps")


class CoupledElectromechanics3D0D:
    """Full heartbeat driver: excitation → contraction → circulation.

    Composes the three stacks end-to-end on one device: the monodomain EP
    solve's ionic calcium (via :class:`CalciumTransfer`) drives the
    Ca-driven sarcomeres of a 3D-0D coupled structural function
    (``RSAFDQ20223DFunction``), whose chamber volumes are tied to a lumped
    0D circulation circuit per step (``Coupled3D0DSolver`` Lie-Trotter
    split, SURVEY.md call stack 3.4). Beyond-reference: the reference's
    CM03 tutorial drives the 3D-0D heartbeat from a PRESCRIBED analytical
    calcium transient; here the transient is the ionic model's own.

    Parameters:
      ep_ode / ep_alg / ep_dt: semidiscretized ``ReactionDiffusionSplit``
        + splitting algorithm + EP dt (ms scale).
      fn3d: ``RSAFDQ20223DFunction`` from
        ``semidiscretize(RSAFDQ2022Split(...))`` whose ``mech`` block has
        stateful Ca-driven materials.
      circuit: the lumped circuit function returned alongside ``fn3d``.
      solver: a ``Coupled3D0DSolver`` (default: BlockedNewtonSolver inside).
      ca_symbol / ca_transform: as in :class:`CoupledElectromechanics`.
    """

    def __init__(self, ep_ode, ep_alg, ep_dt, fn3d, circuit, solver=None, *,
                 ca_symbol: str = "Ca_i",
                 ca_transform: Optional[Callable] = None):
        from thunderbolt_tpu.disc.coupled import Coupled3D0DSolver
        self.ep_ode = ep_ode
        self.ep_alg = ep_alg
        self.ep_dt = float(ep_dt)
        self.fn3d = fn3d
        self.circuit = circuit
        self.solver = solver or Coupled3D0DSolver()
        self._ca = CalciumTransfer(ep_ode, fn3d.mech, ca_symbol,
                                   ca_transform)
        self._ca.write(None)
        refresh_material_kernels(fn3d.mech)

    def solve(self, tspan, dt_mech, w0=None, c0=None, u_ep0=None, *,
              monitor: Optional[Callable] = None):
        """March ``tspan`` with coupled-step ``dt_mech``; the EP integrator
        advances to each coupling time with its own (finer) dt. Returns
        ``(ts, ws, cs, u_ep)`` — times, 3D states ``[u_mech; p]``, circuit
        states, and the final EP state. ``monitor(t, w, c, u_ep)`` runs
        after every accepted coupled step."""
        from thunderbolt_tpu.disc.solution_variables import (
            create_initial_condition)
        t0, tf = float(tspan[0]), float(tspan[1])
        if u_ep0 is None:
            u_ep0 = create_initial_condition(self.ep_ode, jnp.float64)
        integ = integrator_init(self.ep_ode, self.ep_alg, u_ep0,
                                (t0, tf), self.ep_dt)
        w, c = self.solver.init(self.fn3d, self.circuit)
        if w0 is not None:
            w = jnp.asarray(w0, w.dtype)
        if c0 is not None:
            c = jnp.asarray(c0, c.dtype)
        else:
            # smooth takeoff: start each circuit chamber volume at the 3D
            # cavity volume it is tied to
            V0 = self.fn3d.volumes(w[: self.fn3d.nmech])
            for i, ch in enumerate(self.fn3d.chambers):
                c = c.at[self.circuit.volume_index(
                    ch.lumped_symbol)].set(V0[i].astype(c.dtype))
        ca = self._ca.to_qps(integ.u)
        self._ca.write(ca)
        ts, ws, cs = [t0], [w], [c]
        nsteps = int(round((tf - t0) / dt_mech))
        for k in range(1, nsteps + 1):
            t_prev, t = t0 + (k - 1) * dt_mech, t0 + k * dt_mech
            integ.advance_to(t)
            ca_new = self._ca.to_qps(integ.u)
            w, c = self._coupled_advance(w, c, t_prev, t, ca, ca_new)
            ca = ca_new
            ts.append(t)
            ws.append(w)
            cs.append(c)
            if monitor is not None:
                monitor(t, w, c, integ.u)
        return np.asarray(ts), ws, cs, integ.u

    def march(self, t0, dt_mech, nsteps, w0=None, c0=None, u_ep0=None,
              dtype=None):
        """Device-resident full-heartbeat march: ``nsteps`` coupled
        excitation→contraction→circulation steps inside ONE jitted
        ``lax.scan`` — per step: a fixed-count EP sub-march
        (``dt_mech/ep_dt`` splitting steps), the Ca gather+einsum
        transfer, the blocked chord/full Newton 3D-0D solve
        (``BlockedNewtonSolver.make_device_core``) with the condensed
        sarcomere state threaded as traced operands, the pure
        committed-state advance (``internal_after_step``), and the 0D
        circuit substeps. The host loop (:meth:`solve`) pays 3+ tunnel
        round-trips per coupled step plus per-step Python dict copies of
        the internal state; this march pays ONE dispatch for the whole
        beat.

        No continuation ladder: a coupled step whose blocked Newton fails
        is recorded (``report.converged[k] = False``) and the march
        carries on — callers check ``report.all_converged()`` and fall
        back to :meth:`solve`'s halving driver for the failing regime.

        Returns ``(u_ep, w, c, EMMarchReport)``."""
        import jax
        from thunderbolt_tpu.disc.solution_variables import (
            create_initial_condition, solution_variable)
        from thunderbolt_tpu.disc.coupled import EMMarchReport

        mech = self.fn3d.mech
        if dtype is None:
            dtype = mech.batches[0].N.dtype
        nsub_ep = int(round(dt_mech / self.ep_dt))
        if abs(nsub_ep * self.ep_dt - dt_mech) > 1e-9 * max(1.0, dt_mech):
            raise ValueError(
                f"ep_dt={self.ep_dt} must divide dt_mech={dt_mech} for "
                "the fixed-count device march")
        ep_step = self.ep_alg.make_step(self.ep_ode, self.ep_dt)

        if u_ep0 is None:
            u_ep0 = create_initial_condition(
                self.ep_ode, jnp.float64 if dtype == jnp.float64
                else jnp.float32)
        w, c = self.solver.init(self.fn3d, self.circuit, dtype)
        if w0 is not None:
            w = jnp.asarray(w0, w.dtype)
        if c0 is not None:
            c = jnp.asarray(c0, c.dtype)
        else:
            V0 = self.fn3d.volumes(w[: self.fn3d.nmech])
            for i, ch in enumerate(self.fn3d.chambers):
                c = c.at[self.circuit.volume_index(
                    ch.lumped_symbol)].set(V0[i].astype(c.dtype))

        # seed the Ca channel structure so the carried internal state and
        # the kernels' aux threading agree
        self._ca.write(self._ca.to_qps(jnp.asarray(u_ep0)))
        internal0 = [None if st is None else dict(st)
                     for st in mech.internal]

        from thunderbolt_tpu.disc.coupled import make_coupled_step

        fn3d, circuit, ca = self.fn3d, self.circuit, self._ca
        nsub_c = self.solver.circuit_substeps
        phi_slice = solution_variable(self.ep_ode, "phi_m").slice
        dtm, ep_dt = float(dt_mech), self.ep_dt

        # Cache the compiled march on the DRIVER (self), not the shared
        # fn3d: the closure captures dt_mech, ep_dt, ep_step and the
        # circuit, so two drivers sharing one fn3d must not share entries.
        # Everything the closure reads that is not in the key is an
        # attribute of self, so keying on self's dict is sound.
        cache_key = ("_em_march_jit", self.solver.newton, nsub_ep, nsub_c,
                     int(nsteps), dtm, ep_dt)
        run = self.__dict__.get(cache_key)
        if run is None:
            # the 3D-0D half of the step is the SAME body the plain
            # coupled march scans (make_coupled_step) — one copy to keep
            # in sync; this march only prepends excitation (EP substeps)
            # and the Ca transfer into the condensed state
            coupled_step = make_coupled_step(
                self.solver.newton, fn3d, circuit, dtm, nsub_c,
                stateful=True, dtype=dtype)

            @jax.jit
            def run(u_ep, w, c, internal, t0):
                def step(carry, k):
                    u_ep, w, c, internal, t = carry

                    def ep_body(u, i):
                        return ep_step(u, t + i * ep_dt), None

                    u_ep, _ = jax.lax.scan(ep_body, u_ep,
                                           jnp.arange(nsub_ep))
                    ca_qps = ca.to_qps(u_ep)
                    internal = [
                        st if st is None else {**st, "Ca": cq}
                        for st, cq in zip(internal, ca_qps)]
                    w, c, internal, (tn, vols, p, iters, conv) = \
                        coupled_step(w, c, internal, t)
                    rec = (tn, vols, p, jnp.max(u_ep[phi_slice]), iters,
                           conv)
                    return (u_ep, w, c, internal, tn), rec

                carry0 = (u_ep, w, c, internal,
                          jnp.asarray(t0, c.dtype))
                (u_ep, w, c, internal, t), recs = jax.lax.scan(
                    step, carry0, jnp.arange(nsteps))
                return u_ep, w, c, internal, recs

            self.__dict__[cache_key] = run

        u_ep, w, c, internal, (ts, vols, ps, phis, iters, conv) = run(
            jnp.asarray(u_ep0), w, c, internal0, t0)
        if bool(conv.all()):
            # commit only on a fully converged march so the documented
            # host-driver fallback starts from the intact pre-march state
            mech.internal = [None if st is None else dict(st)
                             for st in internal]
        return u_ep, w, c, EMMarchReport(ts, vols, ps, iters, conv, phis)

    def _coupled_advance(self, w, c, t_prev, t, ca_old, ca_new,
                         max_halvings: int = 6):
        """One excitation→contraction→circulation step with continuation on
        Newton reject: Ca linearly interpolated between the EP instants,
        the 3D-0D split bisected until the blocked Newton converges."""
        mech = self.fn3d.mech
        dt = t - t_prev
        internal0 = [None if st is None else dict(st)
                     for st in mech.internal]
        for halving in range(max_halvings + 1):
            nsub = 2 ** halving
            h = dt / nsub
            w_try, c_try = w, c
            ok = True
            for j in range(1, nsub + 1):
                alpha = j / nsub
                tj = t_prev + alpha * dt
                self._ca.write(CalciumTransfer.blend(ca_old, ca_new, alpha))
                mech.internal_dt = h
                mech.internal_t = tj
                w_try, c_try, stats = self.solver.step(
                    self.fn3d, self.circuit, w_try, c_try, tj - h, h)
                if not stats.converged:
                    ok = False
                    break
                mech.update_internal_state(w_try[: self.fn3d.nmech], tj, h)
            if ok:
                return w_try, c_try
            mech.internal = [None if st is None else dict(st)
                             for st in internal0]
        raise RuntimeError(
            f"3D-0D blocked Newton failed at t={t} even with "
            f"{2 ** max_halvings} continuation substeps")
