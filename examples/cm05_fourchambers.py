"""Mechanics tutorial 5: four-chamber simulation (0D closed loop).

Mirrors the topic of ``docs/src/literate-tutorials/cm05_fourchambers.jl``
(a content stub in the reference): all four chambers (LA/LV/RA/RV) beat in
the closed RSAFDQ2022 circulation with time-varying elastances, the
systemic and pulmonary circuits, and the four valves. This runs the 0D
four-chamber loop standalone and reports per-chamber function; a 3D
four-chamber geometry plugs into the same circuit via
``LumpedFluidSolidCoupler`` with one ``ChamberVolumeCoupling`` per chamber
surface (the cm03 machinery, unchanged — supply an imported four-chamber
mesh through the CARP/MFEM/voom2 loaders).

Run:  python examples/cm05_fourchambers.py
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# 0D circuit march in f64: native on CPU, emulated on TPU — force CPU
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.utils.smoke import smoke

circ = tb.RSAFDQ2022LumpedCircuitModel()
u = jnp.asarray(circ.default_initial_state(), jnp.float64)
THB, dt = 800.0, 0.1   # ms
nsteps = int(smoke(2, 5) * THB / dt)   # beats; report the last


@jax.jit
def march(u):
    def body(c, i):
        t = i * dt
        k1 = circ.rhs(c, t)
        k2 = circ.rhs(c + 0.5 * dt * k1, t + 0.5 * dt)
        c = c + dt * k2
        return c, c[:4]
    return jax.lax.scan(body, u, jnp.arange(nsteps))


u_end, Vs = march(u)
Vs = np.asarray(Vs[-int(THB / dt):])    # last beat
names = ("LA", "LV", "RA", "RV")
print(f"{'chamber':>8} {'EDV [mL]':>9} {'ESV [mL]':>9} {'SV [mL]':>8} {'EF':>6}")
for i, n in enumerate(names):
    edv, esv = float(Vs[:, i].max()), float(Vs[:, i].min())
    print(f"{n:>8} {edv:9.1f} {esv:9.1f} {edv-esv:8.1f} {(edv-esv)/edv:6.1%}")
sv_l = float(Vs[:, 1].max() - Vs[:, 1].min())
sv_r = float(Vs[:, 3].max() - Vs[:, 3].min())
print(f"L/R stroke-volume balance: {sv_l:.1f} / {sv_r:.1f} mL "
      f"(closed loop -> equal at steady state)")
