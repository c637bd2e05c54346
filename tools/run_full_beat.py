"""Drive one FULL 800 ms EP-driven heartbeat through the device-resident
electromechanics march and print the PV-loop statistics — the tuning /
artifact-generation harness behind ``tests/test_electromechanics.py``'s
full-beat assertion (configuration lives in
``thunderbolt_tpu/benchmarks/full_beat.py``).

Run:  python tools/run_full_beat.py [Tmax] [nsteps] [--save out.csv]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from thunderbolt_tpu.benchmarks import full_beat

args = [a for a in sys.argv[1:] if not a.startswith("--")]
save = None
if "--save" in sys.argv:
    save = sys.argv[sys.argv.index("--save") + 1]
Tmax = float(args[0]) if args else full_beat.DEFAULT_TMAX
nsteps = int(args[1]) if len(args) > 1 else 160
dt_mech = 5.0

mesh, ode, fn3d, circ, em = full_beat.build(Tmax)
t0 = time.perf_counter()
u_ep, w, c, rep = em.march(0.0, dt_mech, nsteps)
el = time.perf_counter() - t0

ts = np.asarray(rep.ts)
V = np.asarray(rep.volumes)[:, 0]
p = np.asarray(rep.pressures)[:, 0]
phi = np.asarray(rep.phi_max)
conv = np.asarray(rep.converged)
its = np.asarray(rep.iterations)

print(f"march {nsteps} steps in {el:.1f} s; all converged: {conv.all()} "
      f"(max iters {its.max()})")
for k in range(0, nsteps, max(1, nsteps // 20)):
    print(f"t={ts[k]:6.1f}  V={V[k]:8.2f}  p={p[k]:8.3f}  "
          f"phi={phi[k]:7.2f}  its={its[k]}")

s = full_beat.pv_stats(rep)
print(f"\nEDV={s['EDV']:.1f} mL  ESV={s['ESV']:.1f} mL  SV={s['SV']:.1f} mL"
      f"  EF={s['EF']:.1f}%  peak p={s['peak_p']:.2f} kPa")

if save:
    np.savetxt(save, np.column_stack([ts, V, p, phi]),
               delimiter=",", header="t,V_lv,p_lv,phi_max", comments="")
    print(f"saved trace -> {save}")
