"""Mechanics tutorial 6: heart valve models in the circulation.

Mirrors the topic of ``docs/src/literate-tutorials/cm06_heartvalves.jl``
(a content stub in the reference): the RSAFDQ2022 circulation's four
valves are pressure-gated diodes R(p1, p2) = Rmin if p1 > p2 else Rmax
(branch-free `where`, so the loop stays jittable/differentiable). This
example traces one beat and reports valve opening/closing times and
trans-valvular flows; stenosis/regurgitation are modeled by changing a
valve's Rmin/Rmax — shown for mitral regurgitation.

Run:  python examples/cm06_heartvalves.py
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


def trace(circ, label):
    u = jnp.asarray(circ.default_initial_state(), jnp.float64)
    THB, dt = 800.0, 0.1   # ms
    nsteps = int(smoke(2, 4) * THB / dt)

    @jax.jit
    def march(u):
        def body(c, i):
            t = i * dt
            k1 = circ.rhs(c, t)
            c = c + dt * (circ.rhs(c + 0.5 * dt * k1, t + 0.5 * dt))
            p_lv, p_rv, p_la, p_ra = circ.chamber_pressures(c, t)
            q_mv = (p_la - p_lv) / jnp.where(p_la > p_lv, circ.Rmin, circ.Rmax)
            q_av = (p_lv - c[4]) / jnp.where(p_lv > c[4], circ.Rmin, circ.Rmax)
            return c, jnp.stack([q_mv, q_av, p_lv, p_la, c[4]])
        return jax.lax.scan(body, u, jnp.arange(nsteps))

    u_end, tr = march(u)
    THBn = int(800.0 / 0.1)
    tr = np.asarray(tr[-THBn:])
    t = np.arange(THBn) * 0.1e-3  # s
    mv_open = tr[:, 0] > 1e-3
    av_open = tr[:, 1] > 1e-3
    def spans(mask):
        d = np.diff(mask.astype(int))
        return t[np.nonzero(d == 1)[0]], t[np.nonzero(d == -1)[0]]
    mv_o, mv_c = spans(mv_open)
    av_o, av_c = spans(av_open)
    print(f"--- {label}")
    print(f"  mitral opens at {[f'{x:.2f}' for x in mv_o]} s, "
          f"closes at {[f'{x:.2f}' for x in mv_c]} s")
    print(f"  aortic opens at {[f'{x:.2f}' for x in av_o]} s, "
          f"closes at {[f'{x:.2f}' for x in av_c]} s")
    print(f"  peak mitral inflow {tr[:, 0].max():.1f} mL/ms, "
          f"peak aortic outflow {tr[:, 1].max():.1f} mL/ms, "
          f"regurgitant aortic flow {min(tr[:, 1].min(), 0):.2f} mL/ms")


trace(tb.RSAFDQ2022LumpedCircuitModel(), "healthy valves")
# mitral regurgitation: the closed mitral valve leaks (Rmax down 75x)
import dataclasses
trace(dataclasses.replace(tb.RSAFDQ2022LumpedCircuitModel(),
                          Rmax=1000.0), "leaky valves (Rmax 75000 -> 1000)")
