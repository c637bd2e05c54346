"""Dissect the monodomain split-step composition on the real chip.

Times, per mesh size: (a) the Chebyshev heat solve alone, (b) the
reaction substep chain alone, (c) the full split step — each as an
on-device lax.fori_loop over many iterations so the ~35 ms tunnel
dispatch amortizes away (docs/howto-benchmark.md protocol).

Usage:  python tools/profile_ep_step.py [N ...]    (default 256 512 1024)
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def bench_loop(step, u0, iters):
    """Wall time per application of step(u, t) inside one fori_loop."""

    @jax.jit
    def run(u, n):
        return jax.lax.fori_loop(0, n, lambda i, u: step(u, 0.0), u)

    jax.block_until_ready(run(u0, 10))          # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(run(u0, iters))
    return (time.perf_counter() - t0) / int(iters)


def main(sizes):
    import thunderbolt_tpu as tb

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
        alg = tb.LieTrotterGodunov((be, fe))
        dt = 1.0

        integ = tb.init(odeform, alg, u0, (0.0, 1e9), dt)
        integ.step(50)                           # spin up live dynamics
        u_live = integ.u

        import os
        base = int(os.environ.get("PROFILE_ITERS", "20000"))
        iters = max(100, base // max(1, (N // 256) ** 2))

        t_full = bench_loop(integ._step, u_live, iters)

        heat_fn, react_fn = odeform.functions[0], odeform.functions[1]
        r0, r1 = odeform.ranges[0], odeform.ranges[1]
        heat_step = be.make_step(heat_fn, dt)
        react_step = fe.make_step(react_fn, dt)
        t_heat = bench_loop(heat_step, u_live[r0], iters)
        t_react = bench_loop(react_step, u_live[r1], iters)

        print(f"N={N:5d} heat {t_heat*1e6:9.1f} us  reaction "
              f"{t_react*1e6:9.1f} us  full {t_full*1e6:9.1f} us "
              f"({1.0/t_full:,.0f} steps/s)  "
              f"overhead {(t_full-t_heat-t_react)*1e6:7.1f} us")


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [256, 512, 1024]
    main(sizes)
