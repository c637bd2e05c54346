"""RDQ20-MF transient validation against the original authors' reference
solution.

Oracle: ``tests/data/trajectories/rdq20_transient_test.csv`` — the stored
trajectory of the ORIGINAL RDQ20 implementation (Regazzoni et al. 2020)
shipped by the reference as
``test/data/trajectories/RDQ20-MF/transient-test.csv`` and asserted in
``test/test_sarcomere.jl:4-110``: drive the model with the published
calcium and sarcomere-length transients, integrate with forward Euler at
dt = 1e-3 ms, and compare all 20 states plus the derived active tension
Ta and active stiffness As at every stored sample. Measured agreement:
all states within 2.0e-3 relative (a single transient blip on the
smallest RU occupancy at t = 20 ms; <= 2.4e-4 everywhere after 50 ms),
Ta/As within 5e-4 — asserted at rtol 5e-3 / 1e-3 respectively.

CSV columns: t [s], Ca, SL [um], dSL_dt [um/s], Ta, As, S0..S19 where
S0..S15 are the RU occupancies in C-order over (TL, TC, TR, CC) — exactly
our ``Q[:16]`` flattening — and S16..S19 the XB moments.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from thunderbolt_tpu.models.solid.contraction_rdq20 import RDQ20MFModel

DATA = os.path.join(os.path.dirname(__file__), "data", "trajectories",
                    "rdq20_transient_test.csv")


def _calcium(t):
    """Published calcium transient (``test_sarcomere.jl:27-37``), t in ms."""
    c0, cmax, tau1, tau2, t0 = 0.1, 0.9, 20.0, 50.0, 10.0
    beta = (tau1 / tau2) ** (-1 / (tau1 / tau2 - 1)) \
        - (tau1 / tau2) ** (-1 / (1 - tau2 / tau1))
    act = c0 + (cmax - c0) / beta * (jnp.exp(-(t - t0) / tau1)
                                     - jnp.exp(-(t - t0) / tau2))
    return jnp.where(t < t0, c0, act)


def _stretch(t):
    """Published SL transient over SL0 (``test_sarcomere.jl:39-55``)."""
    SL0, SLt0, SLt1, SLtau0, SLtau1 = 2.2, 50.0, 350.0, 50.0, 20.0
    SL1 = SL0 * 0.97
    ramp0 = jnp.maximum(0.0, 1.0 - jnp.exp((SLt0 - t) / SLtau0))
    ramp1 = jnp.maximum(0.0, 1.0 - jnp.exp((SLt1 - t) / SLtau1))
    return (SL0 + (SL1 - SL0) * (ramp0 - ramp1)) / SL0


def test_rdq20_transient_matches_original_solution():
    ref = np.genfromtxt(DATA, delimiter=",", names=True)
    model = RDQ20MFModel()
    dt = 1e-3          # ms
    sample = 0.01e3    # stored every 10 ms
    inner = int(round(sample / dt))

    def step(i, u):
        t = i * dt
        lam = _stretch(t)
        dlam = (lam - _stretch(t - dt)) / dt
        du = model.rhs(u, lam, dlam, _calcium(t), t)
        return u + dt * du

    @jax.jit
    def run(u0):
        # the reference compares AFTER the Euler update at t = t_sample
        # (``test_sarcomere.jl:66-75``), so each segment ends inclusive
        u1 = step(0, u0)

        def seg(u, k):
            u = jax.lax.fori_loop(k * inner + 1, (k + 1) * inner + 1,
                                  step, u)
            return u, u
        _, us = jax.lax.scan(seg, u1, jnp.arange(len(ref) - 1))
        return us

    u0 = jnp.asarray(model.default_initial_state(), jnp.float64)
    us = np.asarray(run(u0))          # [60, 20], samples at t=10..600 ms

    for row in range(1, len(ref)):
        t_ms = 1000.0 * ref["t"][row]
        u = us[row - 1]
        uref = np.array([ref[f"S{i}"][row] for i in range(20)])
        # calcium input parity (sanity that the drive matches)
        np.testing.assert_allclose(float(_calcium(t_ms)), ref["Ca"][row],
                                   rtol=1e-3)
        np.testing.assert_allclose(u, uref, rtol=5e-3, atol=1e-9,
                                   err_msg=f"states diverge at t={t_ms} ms")
        lam = float(_stretch(t_ms))
        np.testing.assert_allclose(lam * 2.2, ref["SL"][row], rtol=1e-2)
        Ta = float(model.compute_active_tension(jnp.asarray(u), lam))
        As = float(model.compute_active_stiffness(jnp.asarray(u), lam))
        np.testing.assert_allclose(Ta, ref["Ta"][row], rtol=1e-3, atol=1e-8,
                                   err_msg=f"Ta diverges at t={t_ms} ms")
        np.testing.assert_allclose(As, ref["As"][row], rtol=1e-3, atol=1e-8,
                                   err_msg=f"As diverges at t={t_ms} ms")
