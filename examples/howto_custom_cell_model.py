"""How-to: adding a custom EP cell model.

Mirrors ``docs/src/literate-howto/custom-ep-cell-model.jl``: define a
FitzHugh-Nagumo variant whose recovery-rate parameter ``e`` varies in
space — heterogeneous cellular behavior driven by the per-point
coordinate ``x`` that the cell protocol threads into the right-hand side.

The cell-model protocol (``models/cells/base.py:CellModel``; reference
API ``electrophysiology.jl:100-165``):

* ``state_symbols``   — names, in the order they occupy the local state;
* ``phi_index``       — where the transmembrane potential sits (any slot);
* ``default_initial_state`` — what ``create_initial_condition`` seeds;
* ``rhs(u, x, t)``    — du/dt with u[nstates, ...]; array-native so it is
  jit/vmap-safe (no Python branching on traced values);
* ``uses_coordinates = True`` — declares that ``rhs`` reads ``x`` so the
  fused coordinate-free Pallas kernels stand down.

Run:  python examples/howto_custom_cell_model.py
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# tiny 2D demo; remote-TPU compile latency dwarfs the march — force CPU
import jax
jax.config.update("jax_platforms", "cpu")

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.models.cells import CellModel


# 1. The model. Frozen dataclass => hashable => static under jit. Spatially
#    varying parameters are just fields holding a callable of (x, t); the
#    rhs evaluates it on the traced coordinate array.
@dataclass(frozen=True)
class HeterogeneousFHNModel(CellModel):
    a: float = 0.1
    b: float = 0.5
    c: float = 1.0
    d: float = 0.0
    e: object = None          # callable (x[..., sdim], t) -> rate array

    phi_index = 0
    uses_coordinates = True   # rhs reads x — disables coordinate-free kernels

    @property
    def state_symbols(self):
        return ("phi_m", "s")

    def default_initial_state(self):
        return np.array([0.0, 0.0])

    def rhs(self, u, x, t):
        phi, s = u[0], u[1]
        e = self.e(x, t) if self.e is not None else 0.01
        dphi = phi * (1.0 - phi) * (phi - self.a) - s
        ds = e * (self.b * phi - self.c * s - self.d)
        return jnp.stack([dphi, ds])


# 2. Use it like any built-in: recovery is 5x slower on the right half, so
#    the action potential there lasts several times longer (a crude
#    apex-base APD-gradient model).
def recovery_rate(x, t):
    return jnp.where(x[..., 0] > 1.0, 0.002, 0.01)


mesh = tb.generate_mesh("quad4", (32, 8), (0.0, 0.0), (2.0, 0.5))
model = tb.MonodomainModel(
    chi=1.0, Cm=1.0, kappa=1e-3,
    stim=tb.NoStimulationProtocol(),
    ion=HeterogeneousFHNModel(e=recovery_rate),
    # what the rhs receives as `x`: here plain Cartesian node coordinates;
    # any coordinate system (LV/BiV) plugs in the same way
    cell_coordinates=tb.CartesianCoordinateSystem())
ode = tb.semidiscretize(
    tb.ReactionDiffusionSplit(model),
    tb.FiniteElementDiscretization({"phi_m": 1}, dtype=jnp.float32), mesh)

u0 = tb.create_initial_condition(ode, jnp.float32)
u0 = tb.setvariable(u0, ode, "phi_m",
                    lambda x: np.where(x[:, 0] < 0.25, 1.0, 0.0))

alg = tb.LieTrotterGodunov((tb.BackwardEulerSolver(rtol=1e-6, atol=1e-8),
                            tb.ForwardEulerCellSolver(substeps=8)))
integ = tb.init(ode, alg, u0, (0.0, 400.0), 1.0)

vi = tb.solution_variable(ode, "phi_m")
xs = vi.coords
left = int(np.argmin(np.linalg.norm(xs - [0.6, 0.25], axis=1)))
right = int(np.argmin(np.linalg.norm(xs - [1.6, 0.25], axis=1)))

sample = 10.0
trace = {left: [], right: []}
for t, u in tb.TimeChoiceIterator(integ, np.arange(0.0, 401.0, sample)):
    phi = np.asarray(u[vi.slice])
    for p in trace:
        trace[p].append(float(phi[p]))
    if t % 50 == 0:
        print(f"t = {t:6.1f}   phi(left) = {phi[left]:+.3f}   "
              f"phi(right) = {phi[right]:+.3f}")

# 3. Self-check: the wave passed both probes, and the slow-recovery side
#    holds its action potential several times longer.
tl, tr = np.array(trace[left]), np.array(trace[right])
assert tl.max() > 0.8 and tr.max() > 0.8, "wave died"
apd_left, apd_right = sample * np.sum(tl > 0.5), sample * np.sum(tr > 0.5)
print(f"APD(left, e=0.01) = {apd_left:.0f} ms   "
      f"APD(right, e=0.002) = {apd_right:.0f} ms")
assert apd_right > 2.0 * apd_left, (
    "heterogeneous recovery had no effect — is `x` reaching the rhs?")
print("OK: spatially heterogeneous cell model behaves as designed.")
