"""How-to: custom stimulation protocols (an S1-S2 pacing example).

Mirrors ``docs/src/literate-howto/custom-stimulation-protocols.jl``: the
easiest custom protocol is a callable handed to
``AnalyticalTransmembraneStimulationProtocol`` — the callable returns the
stimulus current density at (x, t), and the ``intervals`` tuple tells the
integrator when the stimulus can be nonzero (outside them the source term
is identically zero, so the backward-Euler stage skips re-evaluating it).

Because the callable is traced into the jitted step, time-dependence must
be expressed with ``jnp.where`` on the traced ``t`` — not Python ``if``.

Run:  python examples/howto_custom_stimulation.py
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# tiny 2D demo; remote-TPU compile latency dwarfs the march — force CPU
import jax
jax.config.update("jax_platforms", "cpu")

from dataclasses import dataclass
from typing import Any, Tuple

import numpy as np
import jax.numpy as jnp

import thunderbolt_tpu as tb


# 1. The protocol: two independent stimuli, each a callable of (x, t) with
#    its own active window. The S2 clock restarts at its window's opening
#    (t - t_on), so each stimulus is authored in its own local time.
@dataclass(frozen=True)
class SimpleS1S2Protocol:
    S1: Any
    S1_window: Tuple[float, float]
    S2: Any
    S2_window: Tuple[float, float]

    def __call__(self, x, t):
        in1 = (t >= self.S1_window[0]) & (t <= self.S1_window[1])
        in2 = (t >= self.S2_window[0]) & (t <= self.S2_window[1])
        return (jnp.where(in1, self.S1(x, t - self.S1_window[0]), 0.0)
                + jnp.where(in2, self.S2(x, t - self.S2_window[0]), 0.0))


def stim_left_edge(x, t):
    """S1: plane stimulus at the left edge."""
    return jnp.where(x[..., 0] < 0.2, 0.6, 0.0)


def stim_center_ball(x, t):
    """S2: focal stimulus in the middle of the strip."""
    r = jnp.linalg.norm(x - jnp.asarray([1.0, 0.25]), axis=-1)
    return jnp.where(r < 0.2, 0.6, 0.0)


s1s2 = SimpleS1S2Protocol(stim_left_edge, (0.0, 2.0),
                          stim_center_ball, (220.0, 222.0))
protocol = tb.AnalyticalTransmembraneStimulationProtocol(
    f=s1s2, intervals=(s1s2.S1_window, s1s2.S2_window))

# 2. Monodomain strip paced by the protocol.
mesh = tb.generate_mesh("quad4", (32, 8), (0.0, 0.0), (2.0, 0.5))
model = tb.MonodomainModel(chi=1.0, Cm=1.0, kappa=1e-3,
                           stim=protocol, ion=tb.FHNModel())
ode = tb.semidiscretize(
    tb.ReactionDiffusionSplit(model),
    tb.FiniteElementDiscretization({"phi_m": 1}, dtype=jnp.float32), mesh)
u0 = tb.create_initial_condition(ode, jnp.float32)

alg = tb.LieTrotterGodunov((tb.BackwardEulerSolver(rtol=1e-6, atol=1e-8),
                            tb.ForwardEulerCellSolver(substeps=8)))
integ = tb.init(ode, alg, u0, (0.0, 400.0), 1.0)

# 3. Probe at 3/4 length: S1's wave passes once, then S2's focal wave
#    (launched after the tissue recovered) passes again.
vi = tb.solution_variable(ode, "phi_m")
probe = int(np.argmin(np.linalg.norm(vi.coords - [1.5, 0.25], axis=1)))

trace = []
for t, u in tb.TimeChoiceIterator(integ, np.arange(0.0, 401.0, 5.0)):
    phi = float(np.asarray(u[vi.slice])[probe])
    trace.append(phi)
    if t % 50 == 0:
        print(f"t = {t:6.1f}   phi(probe) = {phi:+.3f}")

trace = np.array(trace)
up = np.sum((trace[1:] > 0.5) & (trace[:-1] <= 0.5))   # upstroke count
print(f"activations at the probe: {up}")
assert up == 2, f"expected the S1 and S2 waves (2 activations), saw {up}"
print("OK: S1-S2 protocol delivered both stimuli.")
