"""Config-3 solver-variant shootout (VERDICT r2 item 2).

Solves the SAME passive Holzapfel-Ogden LV inflation (config 3 protocol:
rule-based fibers, endocardial pressure + epicardial springs, base
clamped, f32, full homotopy ramp 0->1 @ 0.25) with three inner solvers:

  bj-bicgstab : round-2 baseline — BiCGStab, block-Jacobi preconditioner
  mg-cg       : CG preconditioned by MechanicsGMGPreconditioner (2-level
                nested LV hierarchy; the fine problem IS the hierarchy's
                fine level so all variants solve identical systems)
  dense-lu    : on-device dense materialization + LU (operator_to_dense);
                the TPU small-problem path — one MXU factorization vs
                hundreds of sequential latency-bound Krylov steps

Each variant runs REPEATS timed ramps after one warm ramp; per-run times
expose the round-2 "1.5x run-to-run spread" (tunnel/host contention vs
compute). Run on the TPU (default) or CPU (--cpu).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--nlev", type=int, default=2)
    ap.add_argument("--variants", type=str, default="",
                    help="comma-separated subset, e.g. dense-lu,mg-cg")
    args = ap.parse_args()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import thunderbolt_tpu as tb
    from thunderbolt_tpu.solver.multigrid import (
        build_mechanics_hierarchy, MechanicsGMGPreconditioner)

    # Setup (coordinate-system Laplace solves, fiber generation, transfer
    # operators) jits small one-shot programs per level; on the remote
    # axon backend each costs a 20-90 s tunnel compile (>10 min at
    # nlev=3). Run setup on the host CPU backend — its arrays are
    # uncommitted, so the benchmark jits still place everything on the
    # chip. Requires JAX_PLATFORMS=axon,cpu; falls back to the default
    # device when no cpu backend is registered.
    try:
        setup_dev = jax.devices("cpu")[0] if not args.cpu else None
    except RuntimeError:
        setup_dev = None

    coarse = tb.generate_ideal_lv_mesh(6, 2, 3)
    micro_mesh = None  # per-level microstructure handled below

    def make_model(mesh):
        cs = tb.compute_lv_coordinate_system(mesh)
        micro = tb.create_microstructure_model(
            cs, endo_helix_angle=np.deg2rad(60.0),
            epi_helix_angle=np.deg2rad(-60.0))
        material = tb.PK1Model(tb.HolzapfelOgden2009Model(),
                               microstructure_model=micro)
        return tb.QuasiStaticModel(
            "displacement", material,
            (tb.ConstantPressureBC(0.12, "Endocardium"),
             tb.NormalSpringBC(0.5, "Epicardium")))

    disc = tb.FiniteElementDiscretization(
        {"displacement": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("displacement", "Base", 0.0)],
        dtype=jnp.float32)

    # hierarchy whose fine level is the shared benchmark problem;
    # rule-based fibers are mesh-bound, so the model is built per level
    import contextlib
    setup_ctx = (jax.default_device(setup_dev) if setup_dev is not None
                 else contextlib.nullcontext())
    with setup_ctx:
        hier = build_mechanics_hierarchy(make_model, disc, coarse,
                                         args.nlev, renumber="rcm")
    fn = hier.fine_function
    print(f"# fine ndofs = {fn.dh.ndofs}", flush=True)

    mg = MechanicsGMGPreconditioner(hier)

    variants = {
        "dense-lu": tb.NewtonRaphsonSolver(
            tol=1e-5, inner="dense", max_iter=30),
        "mg-cg": tb.NewtonRaphsonSolver(
            tol=1e-5, inner="cg", inner_rtol=1e-6,
            inner_maxiter=2000, max_iter=30, precon=mg),
        "bj-bicgstab": tb.NewtonRaphsonSolver(
            tol=1e-5, inner="bicgstab", inner_rtol=1e-6,
            inner_maxiter=2000, max_iter=30),
    }
    if args.variants:
        keep = set(args.variants.split(","))
        variants = {k: v for k, v in variants.items() if k in keep}

    # measure the jitted device solve itself (one dispatch, from u0 = 0 at
    # full load, tight tol so every variant does real iterations) — a
    # host-driven homotopy ramp would time tunnel dispatches, not solvers
    u0 = jnp.zeros(fn.solution_size, jnp.float32)
    out = {}
    for name, newton in variants.items():
        try:
            u, stats = newton.solve(fn, u0, 1.0)   # warm/compile
        except Exception as e:
            print(f"{name}: FAILED ({type(e).__name__}: {e})", flush=True)
            continue
        if not stats.converged:
            print(f"{name}: DID NOT CONVERGE ({stats})", flush=True)
            continue
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            u, stats = newton.solve(fn, u0, 1.0)
            jax.block_until_ready(u)
            times.append(time.perf_counter() - t0)
        times = np.array(times)
        res = {
            "ndofs": int(fn.dh.ndofs),
            "newton_iters": int(stats.iterations),
            "solve_s_med": round(float(np.median(times)), 4),
            "solve_s_min": round(float(times.min()), 4),
            "solve_s_max": round(float(times.max()), 4),
            "iters_per_s_med": round(
                float(stats.iterations / np.median(times)), 1),
        }
        out[name] = res
        print(json.dumps({"variant": name, **res}), flush=True)
    return out


if __name__ == "__main__":
    main()
