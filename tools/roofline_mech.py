"""Roofline/MFU accounting for the mechanics path (VERDICT r3 item 3).

The EP treatment (``tools/roofline_ep.py``) applied to the mechanics
stack: measured wall-clock x XLA's own compiled-HLO cost model
(``compiled.cost_analysis()``: flops + bytes accessed) for the three
kernels that carry the mechanics configs, at the bench_mech_sweep sizes:

  assemble   : the vmapped material-AD tangent+residual assembly
               (Holzapfel-Ogden + rule-based fibers, BlockDIA scatter)
  dense_lu   : the on-device dense stage solve (configs 3-5 below the
               dense cutoff) — one LU factorization + triangular solves
  cg_iter_bj : one block-Jacobi-preconditioned CG iteration on the
               assembled tangent (SpMV + precon + axpys)
  cg_iter_mg : one MechanicsGMG V-cycle-preconditioned CG iteration

Peaks (override by env):
  TPU_PEAK_F32_TFLOPS (default 32.8 = v5e 197 bf16 TFLOP/s / 6-pass
    "highest"-precision f32 emulation — the package forces highest
    matmul precision, utils/smallmat.py docstring) — the MXU bound;
  TPU_PEAK_VPU_TFLOPS (default 3.9 = 8x128 lanes x 4 ALUs x 0.94 GHz)
    — the VPU bound for the elementwise-AD-dominated assembly;
  TPU_PEAK_GBS (default 819, v5e HBM) — the memory bound.

Each JSON line reports achieved GFLOP/s and GB/s plus the fraction of
every roofline, so "is mechanics actually fast" is answered the same way
EP's was: by a utilization fraction against the binding resource.

Usage: python tools/roofline_mech.py [--levels 0,1,2] [--cpu]
       (--cpu reports the same kernels on the host for scale)
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def timed_loop(body, state0, K, repeats=3):
    """Seconds per application of ``body`` (state -> state), measured as
    K CHAINED applications inside ONE dispatch: the ~35 ms tunnel
    dispatch overhead otherwise dominates every sub-50-ms kernel and the
    single-dispatch numbers report overhead, not compute (the round-5
    fix — the first recorded roofline used single dispatches and its
    level-0/1 rows were latency, not bandwidth). Each repeat perturbs
    the first leaf (the tunnel memoizes identical (executable, buffers)
    pairs)."""
    import jax
    import jax.numpy as jnp

    loop = jax.jit(lambda s: jax.lax.fori_loop(
        0, K, lambda i, s_: body(s_), s))
    out = loop(state0)
    jax.block_until_ready(out)
    ts = []
    leaves, treedef = jax.tree.flatten(state0)
    for k in range(repeats):
        bump = jnp.asarray(1e-7 * (k + 1), leaves[0].dtype)
        s0 = jax.tree.unflatten(treedef,
                                [leaves[0] + bump] + leaves[1:])
        t0 = time.perf_counter()
        out = loop(s0)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / K


def timed(fn, *args, repeats=5):
    """Median wall-clock of a jitted call; each repeat perturbs the first
    array operand (the axon tunnel memoizes (executable, identical
    buffers) pairs — see tools/profile_mg.py)."""
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
    return float(np.median(ts))


def emit(level, ndofs, kernel, t_s, flops, bytes_, peaks, extra=None):
    gflops = flops / t_s / 1e9
    gbs = bytes_ / t_s / 1e9
    rec = {"level": level, "ndofs": int(ndofs), "kernel": kernel,
           "time_ms": round(1e3 * t_s, 3),
           "hlo_gflop": round(flops / 1e9, 3),
           "achieved_GFLOP_s": round(gflops, 1),
           "frac_mxu_f32": round(gflops / (peaks["mxu"] * 1e3), 4),
           "frac_vpu": round(gflops / (peaks["vpu"] * 1e3), 4),
           "achieved_GB_s": round(gbs, 1),
           "frac_hbm": round(gbs / peaks["hbm"], 4)}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", type=str, default="0,1,2")
    ap.add_argument("--dense-max", type=int, default=8000)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from bench_mech_sweep import build_hierarchy, sub_hierarchy
    from thunderbolt_tpu.solver.multigrid import MechanicsGMGPreconditioner
    from thunderbolt_tpu.solver.linear import jacobi_preconditioner
    from thunderbolt_tpu.fem.sparsity import operator_to_dense

    peaks = {"mxu": float(os.environ.get("TPU_PEAK_F32_TFLOPS", "32.8")),
             "vpu": float(os.environ.get("TPU_PEAK_VPU_TFLOPS", "3.9")),
             "hbm": float(os.environ.get("TPU_PEAK_GBS", "819"))}
    if args.cpu:
        peaks = {"mxu": 1e-9, "vpu": 1e-9, "hbm": 1e-9}  # fractions n/a

    levels = sorted(int(s) for s in args.levels.split(","))
    try:
        setup_dev = jax.devices("cpu")[0] if not args.cpu else None
    except RuntimeError:
        setup_dev = None
    hier, disc, _ = build_hierarchy(max(levels) + 1, setup_dev, None)
    print(json.dumps({"roofline": "mech",
                      "platform": jax.devices()[0].platform,
                      "peaks": peaks, "levels": levels}), flush=True)

    for lv in levels:
        fn = hier.functions[lv]
        n = fn.dh.ndofs
        t = jnp.asarray(1.0, jnp.float32)
        rng = np.random.default_rng(lv)
        u = jnp.asarray(0.01 * rng.standard_normal(n), jnp.float32)

        # iteration counts per ONE-dispatch chain: sized for ~2-3 s per
        # measurement so the ~35 ms tunnel dispatch overhead stays ~1%
        K_asm = max(8, min(256, int(1.5e6 / max(n, 1))))
        K_cg = max(64, min(20000, int(2e7 / max(n, 1))))

        # (a) material-AD assembly: values + residual. The chain feeds a
        # hash of BOTH outputs back into u so XLA cannot dead-code the
        # tangent-value computation inside the loop.
        def asm_body(u_):
            kv_, r_ = fn.assemble(u_, t)
            return u_ + 1e-18 * r_ + 1e-30 * kv_.reshape(-1)[: r_.size]

        asm = jax.jit(lambda u_: fn.assemble(u_, t))
        fl, by = _cost(asm.lower(u).compile())
        emit(lv, n, "assemble", timed_loop(asm_body, u, K_asm), fl, by,
             peaks, {"chain_K": K_asm})

        kv, r = asm(u)
        A = fn.constraints.apply_operator(fn.jacobian_matrix(kv))
        r = fn.constraints.apply_zero(r)

        # (b) dense LU stage solve (the sub-cutoff inner)
        if n <= args.dense_max:
            Ad = operator_to_dense(A)
            K_lu = max(8, min(1024, int(1e12 / max(n, 1) ** 3)))

            def lu_body(r_):
                return r_ + 1e-12 * jnp.linalg.solve(Ad, r_)

            ds = jax.jit(lambda r_: jnp.linalg.solve(Ad, r_))
            fl, by = _cost(ds.lower(r).compile())
            emit(lv, n, "dense_lu", timed_loop(lu_body, r, K_lu), fl, by,
                 peaks,
                 {"analytic_gflop": round((2 / 3) * n ** 3 / 1e9, 3),
                  "chain_K": K_lu})

        # (c) one preconditioned CG iteration: SpMV + precon + 3 axpys
        #     + 2 dots. The CG recurrence IS the chain — K iterations in
        #     one dispatch, exactly what the solver's while_loop runs
        #     (cost_analysis counts a loop body once, so the single body
        #     is lowered separately for the FLOP/byte numbers).
        def make_iter(Minv):
            def body(s):
                d, x, rr, z = s
                Ad = A.mv(d)
                alpha = jnp.vdot(rr, z) / jnp.vdot(d, Ad)
                x2 = x + alpha * d
                r2 = rr - alpha * Ad
                z2 = Minv(r2)
                beta = jnp.vdot(r2, z2) / jnp.vdot(rr, z)
                return (d * beta + z2, x2, r2, z2)

            return body

        bj = jacobi_preconditioner(A.diagonal())
        body_bj = make_iter(bj)
        z0 = bj(r)
        s0 = (z0, u * 0, r, z0)
        fl, by = _cost(jax.jit(body_bj).lower(s0).compile())
        emit(lv, n, "cg_iter_bj", timed_loop(body_bj, s0, K_cg), fl, by,
             peaks, {"chain_K": K_cg})

        if lv >= 1:
            mg = MechanicsGMGPreconditioner(sub_hierarchy(hier, lv))
            vc = mg(A, u, t, ())
            body_mg = make_iter(vc)
            z0 = vc(r)
            s0 = (z0, u * 0, r, z0)
            K_mg = max(8, K_cg // 8)
            fl, by = _cost(jax.jit(body_mg).lower(s0).compile())
            emit(lv, n, "cg_iter_mg", timed_loop(body_mg, s0, K_mg), fl,
                 by, peaks, {"chain_K": K_mg})


if __name__ == "__main__":
    main()
