"""Electromechanics 2: the full simulated heartbeat chain.

Excitation → contraction → circulation on one device: an apex-paced
monodomain solve (ten Tusscher-Panfilov 2006) runs on the ideal LV; its
ionic calcium transient drives the RDQ20-MF sarcomeres (rule-based ±60°
helical fibers, Tmax = a_XB so the active stress is the published RDQ20
tension); the contracting cavity is volume-tied to the RSAFDQ2022
closed-loop circulation through the blocked Schur Newton. The whole
800 ms beat runs as ONE device dispatch
(``CoupledElectromechanics3D0D.march``).

Beyond-reference capability: the reference's CM03 tutorial prescribes an
ANALYTICAL calcium transient and never couples its EP stack to mechanics;
here every link of the chain is simulated state.

Measured physiology (also asserted by
``tests/test_electromechanics.py::test_full_beat_physiological_pv_loop``):
EDV 140.1 mL, ESV 81.8 mL, SV 58.3 mL, EF 41.6 %, peak LV pressure
15.1 kPa (≈ 113 mmHg), with all four PV-loop phases — isovolumetric
contraction, ejection, an exactly volume-pinned isovolumetric
relaxation, and diastolic refilling.

Run:  python examples/em02_full_heartbeat.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from thunderbolt_tpu.benchmarks import full_beat
from thunderbolt_tpu.utils.smoke import smoke

mesh, ode, fn3d, circ, em = full_beat.build(
    dims=smoke((6, 2, 3), (10, 2, 5)))
NSTEPS = smoke(10, 160)
print(f"marching {'a partial' if NSTEPS < 160 else 'one full 800 ms'} "
      f"beat ({NSTEPS} coupled steps, one dispatch)...")
u_ep, w, c, rep = em.march(0.0, 5.0, NSTEPS)

ts = np.asarray(rep.ts)
V = np.asarray(rep.volumes)[:, 0]
p = np.asarray(rep.pressures)[:, 0]
phi = np.asarray(rep.phi_max)

print(f"{'t [ms]':>7} {'V_LV [mL]':>10} {'p_LV [kPa]':>10} {'phi_max':>8}")
for k in range(0, len(ts), 8):
    print(f"{ts[k]:7.1f} {V[k]:10.2f} {p[k]:10.3f} {phi[k]:8.2f}")

s = full_beat.pv_stats(rep)
print(f"\nEDV={s['EDV']:.1f} mL  ESV={s['ESV']:.1f} mL  "
      f"SV={s['SV']:.1f} mL  EF={s['EF']:.1f}%  "
      f"peak p={s['peak_p']:.2f} kPa (~{s['peak_p'] * 7.5:.0f} mmHg)")
