"""Roofline accounting for the large-mesh EP heat solves (VERDICT r2
item 5): measured steps/s x an analytic bytes-per-step model for the
Chebyshev backward-Euler chain => achieved HBM GB/s vs chip peak.

Byte model (minimum HBM traffic under perfect on-chip reuse; every
quantity read once from and written once to HBM per use):

    per Chebyshev iteration:
        A.mv(d)  : diag table (ndiag * n * isize) + read d + write Ad
        axpys    : x += d (r x, w x), r -= Ad (r r, w r),
                   z = Minv r (Jacobi: read dinv, read r, write z),
                   d = a*d + b*z (read d, z, write d)
    per step, outside the loop:
        b = M.mv(u): M diags + read u + write b
        r0 = b - A x0, d0 = Minv r0 / theta

so  bytes/step ~= iters * (ndiag_A + 10) * n * isize
               + (ndiag_M + ndiag_A + 8) * n * isize.

The model COUNTS AGAINST the kernel (a smaller true traffic means the
reported fraction understates efficiency, never overstates it) because
XLA may fuse vector temporaries into registers — achieved fractions
near 1.0 therefore mean "at roofline for any schedule that reads the
diagonals once per iteration".

Peak HBM defaults to the v5e's 819 GB/s; override with TPU_PEAK_GBS.

Usage: python tools/roofline_ep.py [--sizes 256 512 1024] [--niederer 0.1]
Writes one JSON line per config (also the BASELINE.md table source).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def cheb_config(heat_fn, be, dt):
    """(iters, operator, ndiag_A, ndiag_M) exactly as make_step computes."""
    import jax.numpy as jnp
    from thunderbolt_tpu.solver.linear import (lanczos_bounds,
                                               chebyshev_iterations)
    M, K = be._ops(heat_fn)
    A = M.axpby(1.0, K, -dt)
    diag = A.diagonal()
    s = 1.0 / jnp.sqrt(jnp.abs(diag))
    lmin, lmax = lanczos_bounds(lambda v: s * A.mv(s * v), diag.shape[0],
                                diag.dtype)
    iters = chebyshev_iterations(1.02 * lmax / (0.9 * lmin), be.rtol)
    return iters, A, len(A.offsets), len(M.offsets)


def measure(heat_fn, u0, be, dt, march_iters):
    import jax
    import thunderbolt_tpu as tb
    integ = tb.init(heat_fn, be, u0, (0.0, 1e9), dt)
    integ.step(10)
    integ.u.block_until_ready()
    t0 = time.perf_counter()
    integ.step(march_iters)
    integ.u.block_until_ready()
    return march_iters / (time.perf_counter() - t0)


def report(name, heat_fn, u0, be, dt, march_iters, peak):
    import jax.numpy as jnp
    iters, A, nd_A, nd_M = cheb_config(heat_fn, be, dt)
    n = heat_fn.solution_size
    isize = jnp.dtype(u0.dtype).itemsize
    rate = measure(heat_fn, u0, be, dt, march_iters)
    bytes_step = (iters * (nd_A + 10) + (nd_M + nd_A + 8)) * n * isize
    gbs = rate * bytes_step / 1e9
    print(json.dumps({
        "config": name, "ndofs": int(n), "cheb_iters": int(iters),
        "ndiag": int(nd_A), "solves_per_s": round(rate, 1),
        "model_bytes_per_step": int(bytes_step),
        "achieved_GB_s": round(gbs, 1), "peak_GB_s": peak,
        "fraction_of_peak": round(gbs / peak, 3)}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=[256, 512, 1024])
    ap.add_argument("--niederer", type=float, default=0.1)
    ap.add_argument("--iters", type=int, default=4000)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import thunderbolt_tpu as tb
    peak = float(os.environ.get("TPU_PEAK_GBS", "819"))
    be = tb.BackwardEulerSolver(rtol=1e-5, atol=1e-6, solver="chebyshev")
    dt = 1.0

    for N in args.sizes:
        mesh = tb.generate_mesh("quad4", (N, N), (0.0, 0.0), (2.5, 2.5))
        kappa = np.array([[4.5e-5, 0.0], [0.0, 2.0e-5]])
        model = tb.MonodomainModel(chi=1.0, Cm=1.0, kappa=kappa,
                                   stim=tb.NoStimulationProtocol(),
                                   ion=tb.FHNModel())
        ode = tb.semidiscretize(
            tb.ReactionDiffusionSplit(model),
            tb.FiniteElementDiscretization({"phi_m": 1},
                                           dtype=jnp.float32), mesh)
        heat = ode.functions[0]
        u0 = jnp.zeros(heat.solution_size, jnp.float32) + 0.3
        it = max(200, args.iters // max(1, (N // 256) ** 2))
        report(f"spiral_{N}x{N}", heat, u0, be, dt, it, peak)

    if args.niederer:
        from thunderbolt_tpu.benchmarks import niederer
        mesh, ode, u0 = niederer.build(h=args.niederer, dtype=jnp.float32)
        heat = ode.functions[0]
        uh = u0[ode.ranges[0]]
        report(f"niederer_h{args.niederer}", heat, uh, be, 0.1,
               max(100, args.iters // 16), peak)


if __name__ == "__main__":
    main()
