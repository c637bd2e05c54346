"""Newmark-beta time integration for elastodynamics (displacement form).

Parity: ``NewmarkSolver`` (``src/solver/time/newmark.jl:40-698``):
displacement-form Newmark with the stage operator adding M a(u) to the
residual and M/(beta dt^2) to the Jacobian (``NewmarkStageOperator:65``,
``:91-110``), consistent initial acceleration (``:496``), embedded
half-step error estimate + PI step control (``:606-676``), state rollback
on rejection (``:694``).

TPU-native: the stage residual/Jacobian reuse the quasi-static assembly
closures plus one SpMV; Newton is the host-loop solver (newton.py); the
(u, v, a) state is a plain pytree.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp

from thunderbolt_tpu.solver.nonlinear.newton import NewtonRaphsonSolver, NewtonStats


@dataclass
class NewmarkState:
    u: Any
    v: Any
    a: Any
    t: float


class _NewmarkStageFunction:
    """Residual/Jacobian of the Newmark stage: R(u) = r_qs(u, t) +
    c M (u - u_pred), c = 1/(beta dt^2); J = K(u) + c M. The per-step
    (u_pred, c) are threaded as traced Newton extras so the jitted assembly
    compiles once for the whole march."""

    def __init__(self, fn):
        self.fn = fn                      # ElastodynamicsFunction
        self.u_pred = None
        self.c = None
        self.constraints = fn.constraints
        self.pattern = fn.pattern

    @property
    def solution_size(self):
        return self.fn.solution_size

    def newton_extra(self):
        inner = self.fn.newton_extra() if hasattr(self.fn, "newton_extra") \
            else ()
        return (self.u_pred, self.c) + tuple(inner)

    def residual(self, u, t, u_pred, c, *extra):
        return self.fn.residual(u, t, *extra) + c * self.fn.M.mv(u - u_pred)

    def assemble(self, u, t, u_pred, c, *extra):
        kvals, r = self.fn.assemble(u, t, *extra)
        r = r + c * self.fn.M.mv(u - u_pred)
        kvals = kvals + c * self.fn.mass_vals
        return kvals, r

    def assemble_operator(self, u, t, u_pred, c, *extra):
        """Scatter-free stage operator J = K + c M on lattice meshes (both
        in the shared BlockDIA layout); CSR fallback otherwise."""
        M_bdia = getattr(self.fn, "M_bdia", None)
        if M_bdia is None:
            kvals, r = self.assemble(u, t, u_pred, c, *extra)
            return self.jacobian_matrix(kvals), r
        A, r = self.fn.assemble_operator(u, t, *extra)
        r = r + c * M_bdia.mv(u - u_pred)
        return A.add_scaled(M_bdia, c), r

    def jacobian_matrix(self, kvals):
        return self.fn.jacobian_matrix(kvals)


@dataclass
class NewmarkSolver:
    """gamma = 1/2, beta = 1/4 (trapezoidal, unconditionally stable,
    2nd order) by default."""

    newton: NewtonRaphsonSolver = dfield(
        default_factory=lambda: NewtonRaphsonSolver(inner="lu", tol=1e-8))
    beta: float = 0.25
    gamma: float = 0.5

    def consistent_initial_acceleration(self, fn, u0, v0, t0):
        """Solve M a0 = -r(u0) (``newmark.jl:496``)."""
        from thunderbolt_tpu.fem.sparsity import ell_to_scipy
        import scipy.sparse.linalg as spla
        extra = fn.newton_extra() if hasattr(fn, "newton_extra") else ()
        r = fn.residual(u0, t0, *extra)
        ch = fn.constraints
        if ch is not None:
            r = ch.apply_zero(r)
        M_sp = ell_to_scipy(fn.M).tocsc()
        a0 = spla.spsolve(M_sp, -np.asarray(r))
        return jnp.asarray(a0, u0.dtype)

    def init(self, fn, u0=None, v0=None, t0=0.0):
        n = fn.solution_size
        dtype = fn.M.vals.dtype
        u0 = jnp.zeros(n, dtype) if u0 is None else u0
        v0 = jnp.zeros(n, dtype) if v0 is None else v0
        ch = fn.constraints
        if ch is not None:
            u0 = ch.apply(u0)
        a0 = self.consistent_initial_acceleration(fn, u0, v0, t0)
        return NewmarkState(u0, v0, a0, float(t0))

    def _stage_for(self, fn):
        """Stage-function cache keyed on the *live* fn object (stored in
        ``fn.__dict__`` like the jit caches), never on ``id(fn)`` — a
        garbage-collected fn's address can be reused by a new function,
        which would silently resurrect a stale stage wrapping the old fn."""
        stage = fn.__dict__.get("_tb_newmark_stage")
        if stage is None:
            stage = _NewmarkStageFunction(fn)
            fn.__dict__["_tb_newmark_stage"] = stage
        return stage

    def step(self, fn, state: NewmarkState, dt, commit_internal=True):
        """One Newmark step; returns (new_state, NewtonStats)."""
        b, g = self.beta, self.gamma
        u, v, a, t = state.u, state.v, state.a, state.t
        u_pred = u + dt * v + dt * dt * (0.5 - b) * a
        v_pred = v + dt * (1.0 - g) * a
        stage = self._stage_for(fn)
        stage.u_pred = u_pred
        stage.c = jnp.asarray(1.0 / (b * dt * dt), u.dtype)
        if getattr(fn, "internal", None) is not None:
            fn.internal_dt = dt
            fn.internal_t = t
        u_new, stats = self.newton.solve(stage, u, t + dt)
        if not stats.converged:
            return state, stats
        if commit_internal and getattr(fn, "internal", None) is not None:
            fn.update_internal_state(u_new, t + dt, dt)
        a_new = (u_new - u_pred) / (b * dt * dt)
        v_new = v_pred + g * dt * a_new
        return NewmarkState(u_new, v_new, a_new, t + dt), stats

    def commit_internal(self, fn, state: NewmarkState, dt):
        if getattr(fn, "internal", None) is not None:
            fn.update_internal_state(state.u, state.t, dt)

    def march(self, fn, state: NewmarkState, dt, nsteps):
        """Device-resident fixed-dt Newmark march: ``nsteps`` implicit
        steps — stage-function Newton (one embedded while_loop each),
        kinematic update, committed internal-state advance — inside ONE
        jitted ``lax.scan``. The host loop (:meth:`solve`) pays a tunnel
        round-trip per step; below ~10k dofs that dispatch latency, not
        compute, bounds steps/s on a remote chip. Adaptive error control
        (:meth:`solve_adaptive`) remains the host path — rollback is
        data-dependent control flow the fixed march intentionally omits.

        A step whose Newton fails is recorded (``converged[k] = False``)
        and the march continues from the unconverged state; callers check
        ``converged.all()`` and fall back to the host driver.

        Returns ``(state, iterations [nsteps], converged [nsteps])``."""
        from thunderbolt_tpu.solver.time.homotopy import _flatten_internal

        b, g = self.beta, self.gamma
        stage = self._stage_for(fn)
        core = self.newton.make_device_core(stage)
        internal0 = getattr(fn, "internal", None)
        stateful = internal0 is not None
        dtype = state.u.dtype
        dt = float(dt)
        c = jnp.asarray(1.0 / (b * dt * dt), dtype)

        from thunderbolt_tpu.utils.hoist import hoist_enabled, hoisted_jit
        hoist = hoist_enabled()
        cache_key = ("_newmark_march_jit", self.newton, b, g, dt,
                     int(nsteps), hoist)
        run = fn.__dict__.get(cache_key)
        if run is None:
            def run(u, v, a, t0, internal):
                def body(carry, k):
                    u, v, a, t, internal = carry
                    tn = t + dt
                    u_pred = u + dt * v + dt * dt * (0.5 - b) * a
                    v_pred = v + dt * (1.0 - g) * a
                    inner = _flatten_internal(internal, dt, t, dtype) \
                        if stateful else ()
                    extra = (u_pred, c) + inner
                    u_new, it, rn, conv, status, hist, ihist = core(
                        u, tn, extra)
                    if stateful:
                        internal = fn.internal_after_step(
                            u_new, tn, dt, internal)
                    a_new = (u_new - u_pred) / (b * dt * dt)
                    v_new = v_pred + g * dt * a_new
                    return (u_new, v_new, a_new, tn, internal), (it, conv)

                (u, v, a, t, internal), (its, convs) = jax.lax.scan(
                    body, (u, v, a, t0, internal),
                    jnp.arange(int(nsteps), dtype=jnp.int32))
                return u, v, a, t, internal, its, convs

            if hoist:
                # tunnel deployments: FEM tables as jit parameters, not
                # HLO constants (utils/hoist.py; BASELINE.md 353k note)
                ex_internal = [None if st is None else dict(st)
                               for st in internal0] if stateful else None
                run = hoisted_jit(
                    run, state.u, state.v, state.a,
                    jnp.asarray(state.t, dtype), ex_internal)
            else:
                run = jax.jit(run)
            fn.__dict__[cache_key] = run

        internal_in = [None if st is None else dict(st)
                       for st in internal0] if stateful else None
        u, v, a, t, internal, its, convs = run(
            state.u, state.v, state.a,
            jnp.asarray(state.t, dtype), internal_in)
        if stateful and bool(convs.all()):
            # commit only on a fully converged march so the documented
            # host-driver fallback starts from the intact pre-march state
            fn.internal = [None if st is None else dict(st)
                           for st in internal]
        return NewmarkState(u, v, a, float(t)), its, convs

    @staticmethod
    def _fit_h(dt, rem):
        """Step length that lands exactly on t_end without ever emitting a
        sliver step (c = 1/(beta h^2) blows up as h -> 0): take the whole
        remainder when it is ~one step, half of it when under two."""
        if rem <= dt * 1.05:
            return rem
        if rem <= 2.0 * dt:
            return 0.5 * rem
        return dt

    def solve(self, fn, state, t_end, dt, store=None):
        while state.t < t_end - 1e-12 * max(1.0, abs(t_end)):
            h = self._fit_h(dt, t_end - state.t)
            state, stats = self.step(fn, state, h)
            if not stats.converged:
                raise RuntimeError(
                    f"Newmark step failed at t={state.t}: {stats}")
            if store is not None:
                store(state)
        return state

    # ------------------------------------------------------------------

    def error_estimate(self, state_old, state_new, dt, abstol, reltol):
        """Embedded local displacement error of Newmark-beta:
        e = (beta - 1/6) dt^2 (a_{n+1} - a_n), scaled RMS
        (parity: ``_newmark_report_error!``, ``newmark.jl:636``)."""
        e = abs(self.beta - 1.0 / 6.0) * dt * dt \
            * (state_new.a - state_old.a)
        scale = abstol + reltol * jnp.maximum(jnp.abs(state_new.u),
                                              jnp.abs(state_old.u))
        return float(jnp.sqrt(jnp.mean((e / scale) ** 2)))

    def solve_adaptive(self, fn, state, t_end, dt0, controller=None,
                       abstol=1e-6, reltol=1e-4, dt_min_factor=1e-4,
                       dt_max=None, store=None):
        """PID-controlled adaptive march with rollback on rejection
        (parity: the accept/reject/rollback protocol of
        ``src/solver/time/integrator/type.jl:510-534`` + ``newmark.jl``
        adaptivity). Returns (state, stats_dict)."""
        from thunderbolt_tpu.solver.time.controllers import PIDController
        if controller is None:
            controller = PIDController()
        dt = float(dt0)
        dt_min = dt0 * dt_min_factor
        dt_max = dt_max if dt_max is not None else 4 * dt0
        naccept = nreject = 0
        while state.t < t_end - 1e-12 * max(1.0, abs(t_end)):
            h = self._fit_h(dt, t_end - state.t)
            new_state, stats = self.step(fn, state, h,
                                         commit_internal=False)
            if not stats.converged:
                nreject += 1
                dt = max(dt * 0.5, dt_min)
                if dt <= dt_min:
                    raise RuntimeError(f"Newton failure at dt_min, "
                                       f"t={state.t}")
                continue
            EEst = self.error_estimate(state, new_state, h, abstol, reltol)
            factor = controller.propose_factor(EEst, order=2)
            if controller.should_accept(factor):
                controller.accept()
                self.commit_internal(fn, new_state, h)
                state = new_state           # accept
                naccept += 1
                if store is not None:
                    store(state)
            else:
                nreject += 1                # rollback = keep old state
            dt = float(np.clip(dt * factor, dt_min, dt_max))
        return state, {"naccept": naccept, "nreject": nreject,
                       "dt_final": dt}


def kinetic_energy(fn, v):
    return 0.5 * float(v @ fn.M.mv(v))


def _hermite_weights(theta, dt, deriv):
    """D-th t-derivative of the cubic Hermite basis (h00, h10, h01, h11)
    at theta = (t - t0)/dt; the h10/h11 columns already carry the dt
    scaling of the velocity end conditions."""
    th = theta
    if deriv == 0:
        return (2 * th ** 3 - 3 * th ** 2 + 1,
                dt * (th ** 3 - 2 * th ** 2 + th),
                -2 * th ** 3 + 3 * th ** 2,
                dt * (th ** 3 - th ** 2))
    if deriv == 1:
        return ((6 * th ** 2 - 6 * th) / dt,
                3 * th ** 2 - 4 * th + 1,
                (-6 * th ** 2 + 6 * th) / dt,
                3 * th ** 2 - 2 * th)
    if deriv == 2:
        return ((12 * th - 6) / dt ** 2,
                (6 * th - 4) / dt,
                (-12 * th + 6) / dt ** 2,
                (6 * th - 2) / dt)
    raise ValueError(deriv)


def interpolate_newmark(state_old: NewmarkState, state_new: NewmarkState,
                        t: float, deriv: int = 0):
    """Dense output between two Newmark states: the D-th derivative at
    ``t`` of the cubic Hermite interpolant through (u, v) at both step
    ends (parity: ``_newmark_hermite!``, ``newmark.jl:288-345``).

    deriv=0 -> displacement, 1 -> velocity (the exact derivative of the
    displacement returned, exact at both endpoints), 2 -> acceleration
    (the interpolant's own — linear in the step). A linear interpolation
    of u and v separately would NOT satisfy v = du/dt; this one does.
    """
    dt = state_new.t - state_old.t
    if dt == 0.0:
        return (state_old.u, state_old.v, state_old.a)[deriv]
    theta = (float(t) - state_old.t) / dt
    c0, c1, c2, c3 = _hermite_weights(theta, dt, deriv)
    return (c0 * state_old.u + c1 * state_old.v
            + c2 * state_new.u + c3 * state_new.v)


def velocity(state_or_pair, t=None):
    """Endpoint velocity, or the Hermite-consistent velocity at ``t`` when
    called with (state_old, state_new) (parity: ``velocity(integrator[,t])``,
    ``newmark.jl:241-281``)."""
    if t is None:
        return state_or_pair.v
    s0, s1 = state_or_pair
    return interpolate_newmark(s0, s1, t, deriv=1)


def acceleration(state_or_pair, t=None):
    """Endpoint acceleration, or the interpolant's second derivative at
    ``t`` when called with (state_old, state_new)."""
    if t is None:
        return state_or_pair.a
    s0, s1 = state_or_pair
    return interpolate_newmark(s0, s1, t, deriv=2)
