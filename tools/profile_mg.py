"""Profile the mechanics-GMG Newton inner stage on the chip (round 4).

Times, separately jitted, at a chosen hierarchy level:
  assemble : fine tangent assembly (+ Dirichlet elimination)
  mgsetup  : MechanicsGMGPreconditioner.__call__ traced to a V-cycle
             closure — coarse rediscretizations, Lanczos bounds, dense
             coarse inverse (returns the preconditioned residual once)
  vcycle   : one V-cycle apply at a fixed linearization point
  cg(eta)  : full CG solve to eta with the V-cycle / block-Jacobi
             preconditioner, reporting iteration counts

This separates "MG setup per Newton iteration" from "V-cycle apply per
CG iteration" — the split that decides whether chord Newton (setup once)
or transfer-free smoothing (apply cost) is the right lever at scale.

Run: JAX_PLATFORMS=axon,cpu python tools/profile_mg.py --level 1
     (add --cpu for the host)
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, *args, repeats=3):
    """Each repeat perturbs the first array argument: the axon tunnel
    appears to memoize (executable, identical-buffers) pairs, which made
    repeat timings of pure functions on unchanged inputs read ~0 ms."""
    import jax
    import jax.numpy as jnp
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for k in range(repeats):
        bump = jnp.asarray(1e-6 * (k + 1), args[0].dtype)
        a0 = args[0] + bump
        t0 = time.perf_counter()
        out = fn(a0, *args[1:])
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--level", type=int, default=1)
    ap.add_argument("--etas", type=str, default="0.1,0.01,1e-5")
    args = ap.parse_args()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import thunderbolt_tpu as tb
    from thunderbolt_tpu.solver.multigrid import MechanicsGMGPreconditioner
    from thunderbolt_tpu.solver.linear import cg, jacobi_preconditioner
    from bench_mech_sweep import build_hierarchy, sub_hierarchy

    try:
        setup_dev = jax.devices("cpu")[0] if not args.cpu else None
    except RuntimeError:
        setup_dev = None

    hier, disc, _ = build_hierarchy(args.level + 1, setup_dev, None)
    fn = hier.functions[args.level]
    n = fn.dh.ndofs
    print(f"# level {args.level}: {n} dofs", flush=True)
    mg = MechanicsGMGPreconditioner(sub_hierarchy(hier, args.level))

    ch = fn.constraints
    u = jnp.zeros(fn.solution_size, jnp.float32)
    t = 1.0

    @jax.jit
    def assemble(u):
        A_raw, r = fn.assemble_operator(u, t)
        A = ch.apply_operator(A_raw) if ch is not None else A_raw
        r = ch.apply_zero(r) if ch is not None else r
        return A, r

    el, (A, r) = timed(assemble, u)
    print(f"assemble: {el * 1e3:.1f} ms", flush=True)

    @jax.jit
    def mg_setup_apply(u, r):
        A, _ = assemble(u)
        minv = mg(A, u, t, ())
        return minv(r)

    el, z = timed(mg_setup_apply, u, r)
    print(f"mgsetup+1apply: {el * 1e3:.1f} ms", flush=True)

    # apply-only: freeze the setup by closing over assembled A
    minv_traced = None

    @jax.jit
    def vcycle_only(r):
        minv = mg(A, u, t, ())
        return minv(r)
    # NOTE: tracing rebuilds setup INSIDE this jit too; to time the apply
    # alone we difference: apply_k = (setup + k applies - setup)/k

    @jax.jit
    def mg_setup_apply8(u, r):
        A_, _ = assemble(u)
        minv = mg(A_, u, t, ())
        z = r
        for _ in range(8):
            z = minv(z)
        return z

    el8, _ = timed(mg_setup_apply8, u, r)
    el1 = el
    per_apply = (el8 - el1) / 7.0
    print(f"mgsetup+8applies: {el8 * 1e3:.1f} ms -> "
          f"~{per_apply * 1e3:.1f} ms per V-cycle apply", flush=True)

    for eta in [float(s) for s in args.etas.split(",")]:
        @jax.jit
        def solve_mg(u, r):
            A_, _ = assemble(u)
            minv = mg(A_, u, t, ())
            du, info = cg(A_.mv, r, Minv=minv, rtol=eta, atol=1e-12,
                          maxiter=400)
            return du, info.iterations

        el, (du, it) = timed(solve_mg, u, r)
        print(f"cg(mg, eta={eta}): {el * 1e3:.1f} ms, {int(it)} iters",
              flush=True)

        @jax.jit
        def solve_bj(u, r):
            A_, _ = assemble(u)
            Minv = A_.block_jacobi_inv() if hasattr(A_, "block_jacobi_inv") \
                else jacobi_preconditioner(A_.diagonal())
            du, info = cg(A_.mv, r, Minv=Minv, rtol=eta, atol=1e-12,
                          maxiter=4000)
            return du, info.iterations

        el, (du, it) = timed(solve_bj, u, r)
        print(f"cg(bj, eta={eta}): {el * 1e3:.1f} ms, {int(it)} iters",
              flush=True)


if __name__ == "__main__":
    main()
