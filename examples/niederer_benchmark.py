"""Niederer et al. 2011 N-version EP benchmark (BASELINE.md config 2).

Run:  python examples/niederer_benchmark.py [h_mm]
(h = 0.5 by default; 0.2/0.1 are the paper's finer levels — run those on
the TPU.)
"""

import sys
import time

import numpy as np
import jax.numpy as jnp

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import thunderbolt_tpu as tb
from thunderbolt_tpu.benchmarks import niederer
from thunderbolt_tpu.utils.smoke import smoke

h = float(sys.argv[1]) if len(sys.argv) > 1 else smoke(1.0, 0.5)
t0 = time.time()
mesh, ode, u0 = niederer.build(h=h, dtype=jnp.float32)
print(f"slab h={h} mm: {ode.functions[0].dh.ndofs} dofs "
      f"(setup {time.time() - t0:.1f} s)")

alg = tb.LieTrotterGodunov((
    tb.BackwardEulerSolver(rtol=1e-5, atol=1e-6),
    tb.RushLarsenCellSolver(substeps=2),
))
act, sps = niederer.activation_times(ode, u0, alg, T=smoke(20.0, 80.0),
                                     dt=0.05, sample_dt=0.5)
print(f"march to 80 ms at dt=0.05: {sps:.0f} steps/s "
      f"(steady-state, compile excluded)")

probes = niederer.corner_probes(ode)
print("activation times [ms] (paper P1..P8 + center):")
for k, i in probes.items():
    print(f"  {k}: {act[i]:6.2f}")
print(f"activated fraction: {np.isfinite(act).mean() * 100:.1f}%")
