"""How-to: adding custom sarcomere (contraction) models.

Mirrors the topic of ``docs/src/literate-howto/custom-sarcomere.jl`` (a
stub in the reference; the machinery is
``src/modeling/solid/contraction.jl``). Two tiers:

**Steady-state** (stateless): subclass ``SteadyStateSarcomereModel`` and
implement

* ``compute_lambda_a(Ca)``   — active stretch for active-strain models
  (GeneralizedHill / ExtendedHill);
* ``activation_scale(Ca, F, frame)`` — the scale N(.) multiplying the
  active stress T^a for ActiveStressModel (default: Ca itself).

**Stateful** (internal variables, the reference's condensed-DAE tier):
provide ``nstates``, ``default_initial_state()``, ``activation_scale(Q, F,
frame)`` and ``local_solve(Qprev, lam, lam_prev, Ca, t, dt)`` — the per-qp
backward-Euler solve of your state ODE. It runs *inside* the stress
evaluation and is differentiated through (jax.jacfwd upstream), which is
the TPU-native form of the reference's multilevel Newton — the consistent
tangent of the condensation comes for free.

Run:  python examples/howto_custom_sarcomere.py
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# single-element demos; remote-TPU compile latency dominates — force CPU
import jax
jax.config.update("jax_platforms", "cpu")

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.models.solid.contraction import SteadyStateSarcomereModel


# ---------------------------------------------------------------------------
# tier 1: steady-state — a Hill-saturation activation
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class HillActivationModel(SteadyStateSarcomereModel):
    """N(Ca) = Ca^n / (Ca^n + K^n); lambda_a decreases with activation."""
    K: float = 0.5
    n: float = 4.0
    max_shortening: float = 0.3

    def _sat(self, Ca):
        can = jnp.maximum(Ca, 0.0) ** self.n
        return can / (can + self.K ** self.n)

    def compute_lambda_a(self, Ca):
        return 1.0 - self.max_shortening * self._sat(Ca)

    def activation_scale(self, Ca, F=None, frame=None):
        return self._sat(Ca)


def make_box_function(contraction_model, dtype=jnp.float64):
    """1-element bar with fibers along x (the default frame), free to
    shorten; returns the semidiscrete function."""
    mesh = tb.generate_mesh("hex8", (2, 1, 1), (0., 0., 0.), (1., .5, .5))
    material = tb.ActiveStressModel(
        material_model=tb.NeoHookeanModel(mu=5.0, lam=20.0),
        active_stress_model=tb.SimpleActiveStress(Tmax=15.0),
        contraction_model=contraction_model)
    dbcs = [tb.Dirichlet("d", "left", 0.0, components=[0]),
            tb.Dirichlet("d", "front", 0.0, components=[1]),
            tb.Dirichlet("d", "bottom", 0.0, components=[2])]
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)}, dbcs=dbcs, dtype=dtype)
    return tb.semidiscretize(tb.QuasiStaticModel("d", material, ()),
                             disc, mesh)


def shortening(fn, u):
    """Mean x-contraction of the free (right) face — positive = shorter."""
    xd = fn.dh.field_dof_coords("d")
    d = np.asarray(u[:xd.shape[0] * 3]).reshape(-1, 3)
    return -float(d[xd[:, 0] > 0.99, 0].mean())


# Ramp calcium through the Hill curve: shortening saturates monotonically.
newton = tb.NewtonRaphsonSolver(tol=1e-9, inner="lu", max_iter=30)
vals = []
for ca in (0.25, 0.5, 1.0, 2.0):
    fn = make_box_function(tb.CaDrivenInternalSarcomereModel(
        HillActivationModel(), tb.ConstantCoefficient(ca)))
    u, stats = newton.solve(fn, jnp.zeros(fn.solution_size, jnp.float64), 0.0)
    assert stats.converged, stats
    vals.append(shortening(fn, u))
    print(f"Ca = {ca:4.2f}   shortening = {vals[-1]:.4f}")
assert all(b > a for a, b in zip(vals, vals[1:])), "not monotone in Ca"
assert vals[-1] / max(vals[0], 1e-12) > 2.0, "Hill saturation not visible"


# ---------------------------------------------------------------------------
# tier 2: stateful — first-order activation kinetics (1 internal state)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class FirstOrderActivationModel:
    """dQ/dt = (sat(Ca) - Q)/tau: tension develops with a time constant
    instead of tracking calcium instantaneously. Backward Euler in closed
    form — for nonlinear kinetics use a fixed-iteration Newton (see
    RDQ20MFModel.local_solve)."""
    tau: float = 30.0    # ms
    K: float = 0.5
    n: float = 4.0

    nstates = 1
    state_symbols = ("Q",)
    rate_dependent = False   # rhs ignores dlambda/dt

    def default_initial_state(self):
        return np.zeros(1)

    def _sat(self, Ca):
        can = jnp.maximum(Ca, 0.0) ** self.n
        return can / (can + self.K ** self.n)

    def local_solve(self, Qprev, lam, lam_prev, Ca, t, dt, iters=0):
        a = dt / self.tau
        return (Qprev + a * self._sat(Ca)) / (1.0 + a)

    def activation_scale(self, Q, F=None, frame=None):
        return Q[..., 0] if Q.ndim else Q


# March a calcium step Ca: 0 -> 2 at t=0 and watch tension develop with
# the 30 ms time constant; the homotopy/Newton path threads Qprev
# automatically because the material reports has_internal_state.
fn = make_box_function(
    tb.CaDrivenInternalSarcomereModel(FirstOrderActivationModel(),
                                      tb.ConstantCoefficient(2.0)),
    dtype=jnp.float32)
solver = tb.HomotopyPathSolver(
    tb.NewtonRaphsonSolver(tol=1e-6, inner="lu", max_iter=30))

history = []
u = jnp.zeros(fn.solution_size, jnp.float32)
u, rep = solver.solve(
    fn, u, (0.0, 90.0), dt=10.0,
    store=lambda t, uu: history.append((t, shortening(fn, uu))))
assert rep.converged, rep
for t, s in history:
    print(f"t = {t:5.1f} ms   shortening = {s:.4f}")

# Self-checks: tension LAGS the calcium step (far from saturated at t=10),
# and by t = 3*tau it approaches the steady-state (Hill) value.
steady = vals[-1]                              # Hill model at Ca = 2.0
early = dict(history)[10.0]
late = history[-1][1]
assert early < 0.6 * steady, "no lag — internal state not threading?"
assert late > 0.85 * steady, f"did not approach steady state: {late} vs {steady}"
print(f"OK: first-order kinetics lag the step (t=10: {early:.4f}) and "
      f"relax to the steady-state value {steady:.4f}.")
