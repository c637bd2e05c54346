"""Dissect the monodomain split-step composition on the real chip.

Times, per mesh size: (a) the full split step, (b) a heat-only
backward-Euler/Chebyshev integrator on the same operator, (c) a
reaction-only integrator on the same cell grid — all through the
standard ``tb.init(...).step(n)`` machinery (traced step counts, one
device program per march), so the ~35 ms tunnel dispatch amortizes away.

Usage:  [PROFILE_ITERS=20000] python tools/profile_ep_step.py [N ...]
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def march_rate(integ, iters):
    """steps/s of integ.step(iters) after a warm/compile call."""
    integ.step(10)
    integ.u.block_until_ready()
    t0 = time.perf_counter()
    integ.step(iters)
    integ.u.block_until_ready()
    return iters / (time.perf_counter() - t0)


def main(sizes):
    import thunderbolt_tpu as tb

    base = int(os.environ.get("PROFILE_ITERS", "20000"))
    for N in sizes:
        dtype = jnp.float32
        mesh = tb.generate_mesh("quad4", (N, N), (0.0, 0.0), (2.5, 2.5))
        kappa = np.array([[4.5e-5, 0.0], [0.0, 2.0e-5]])
        model = tb.MonodomainModel(
            chi=1.0, Cm=1.0, kappa=kappa,
            stim=tb.NoStimulationProtocol(), ion=tb.FHNModel())
        odeform = tb.semidiscretize(
            tb.ReactionDiffusionSplit(model),
            tb.FiniteElementDiscretization({"phi_m": 1}, dtype=dtype), mesh)
        u0 = tb.create_initial_condition(odeform, dtype)
        u0 = tb.setvariable(
            u0, odeform, "phi_m",
            lambda x: np.where((x[:, 0] <= 1.25) & (x[:, 1] <= 1.25),
                               1.0, 0.0))
        u0 = tb.setvariable(
            u0, odeform, "s", lambda x: np.where(x[:, 1] >= 1.25, 0.1, 0.0))
        be = tb.BackwardEulerSolver(rtol=1e-5, atol=1e-6, solver="chebyshev")
        fe = tb.AdaptiveForwardEulerSubstepper(reaction_threshold=0.1)
        dt = 1.0
        iters = max(100, base // max(1, (N // 256) ** 2))

        # (a) full split
        integ = tb.init(odeform, tb.LieTrotterGodunov((be, fe)), u0,
                        (0.0, 1e9), dt)
        integ.step(50)                       # spin up live dynamics
        u_live = integ.u
        full = march_rate(integ, iters)

        # (b) heat only: same diffusion operator, standalone integrator
        heat_fn = odeform.functions[0]
        ih = tb.init(heat_fn, be, u_live[odeform.ranges[0]], (0.0, 1e9), dt)
        heat = march_rate(ih, iters)

        # (c) reaction only
        react_fn = odeform.functions[1]
        ir = tb.init(react_fn, fe, u_live[odeform.ranges[1]], (0.0, 1e9),
                     dt)
        react = march_rate(ir, iters)

        t_full, t_heat, t_react = 1e6 / full, 1e6 / heat, 1e6 / react
        print(f"N={N:5d} heat {t_heat:9.1f} us  reaction {t_react:9.1f} us"
              f"  full {t_full:9.1f} us ({full:,.0f} steps/s)"
              f"  overhead {t_full - t_heat - t_react:8.1f} us", flush=True)


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [256, 512, 1024]
    main(sizes)
