"""Patient-style mesh end-to-end at scale (VERDICT r4 item 7).

Every "honest-scale" mechanics number so far rides the ideal-LV
generator's LATTICE node order, which the BlockDIA scatter-free assembly
and sliced SpMV depend on. A patient mesh arrives with an arbitrary
as-found numbering — the lattice detector (``fem/lattice.py``) returns
None and the whole mechanics stack falls back to the gather-ELL path the
lattice benches deliberately avoid. This tool drives that path end to
end and MEASURES it:

1. build the 46.8k-dof ideal LV, randomly PERMUTE the node numbering
   (seeded), and round-trip it through the MFEM v1.0 ascii format — the
   same loader a real patient mesh would use (``load_mfem_grid``,
   reference ``src/mesh/tools.jl:491-660``), with the
   Endocardium/Epicardium/Base surfaces carried as boundary attributes;
2. coordinates -> rule-based fibers -> Holzapfel-Ogden inflation
   (config-3 protocol: 4-rung homotopy ladder, bj-CG inner) on the
   loaded mesh — the tangent is gather-ELL by construction (asserted);
3. the same protocol on the lattice-ordered original (BlockDIA tangent,
   asserted) — the ELL-vs-BlockDIA penalty is the ratio of the two;
4. optional RCM renumbering of the loaded mesh (``reorder_mesh_rcm``) —
   band-ordered but still non-lattice: quantifies how much of the
   penalty is numbering vs format;
5. a config-5-shaped 3D-0D coupled march on the loaded mesh (NeoHookean
   + RSAFDQ2022 circulation) — the full patient chain
   coordinates -> fibers -> mechanics -> circulation.

One JSON line per measurement. Run on the chip (default) or --cpu.

Usage:
  python tools/bench_patient_mesh.py [--level 2] [--configs 3,5]
         [--skip-rcm] [--cpu]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_MFEM_GEOM = {"tri3": 2, "quad4": 3, "tet4": 4, "hex8": 5,
              "wedge6": 6, "pyramid5": 7}
_BND_GEOM = {3: 2, 4: 3}     # corner count -> MFEM geometry id

# facetset name <-> MFEM boundary attribute
_ATTRS = {"Endocardium": 1, "Epicardium": 2, "Base": 3}


def save_mfem_grid(mesh, path):
    """Minimal MFEM v1.0 ascii writer (inverse of ``load_mfem_grid``):
    volume blocks with attribute 1, named facetsets as boundary
    attributes per ``_ATTRS``."""
    lines = ["MFEM mesh v1.0", "", "dimension", str(mesh.sdim), ""]
    elems = []
    for b in mesh.blocks:
        g = _MFEM_GEOM[b.celltype]
        for row in np.asarray(b.connectivity):
            elems.append("1 %d %s" % (g, " ".join(str(int(v))
                                                  for v in row)))
    lines += ["elements", str(len(elems))] + elems + [""]
    bnd = []
    for name, attr in _ATTRS.items():
        if name not in mesh.facetsets:
            continue
        for gc, lf in mesh.facetset(name):
            bi, lc = mesh.block_of_cell(int(gc))
            b = mesh.blocks[bi]
            corners = b.connectivity[lc, list(b.element.facets[lf])]
            bnd.append("%d %d %s" % (attr, _BND_GEOM[len(corners)],
                                     " ".join(str(int(v))
                                              for v in corners)))
    lines += ["boundary", str(len(bnd))] + bnd + [""]
    verts = np.asarray(mesh.nodes)
    lines += ["vertices", str(len(verts)), str(verts.shape[1])]
    lines += [" ".join(repr(float(x)) for x in row) for row in verts]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def load_patient_mesh(src_mesh, seed=0):
    """Permute + MFEM round-trip: the as-found-numbering patient path."""
    from thunderbolt_tpu.mesh.tools import renumber_mesh_nodes
    from thunderbolt_tpu.mesh.tools import load_mfem_grid
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(src_mesh.nodes))
    shuffled = renumber_mesh_nodes(src_mesh, perm)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "patient_lv.mesh")
        save_mfem_grid(shuffled, path)
        loaded = load_mfem_grid(path)
    # attribute ids -> the canonical surface names
    for name, attr in _ATTRS.items():
        loaded.facetsets[name] = loaded.facetsets.pop(str(attr))
    np.testing.assert_allclose(np.asarray(loaded.nodes),
                               np.asarray(shuffled.nodes), atol=0.0)
    return loaded


def _emit(rec):
    print(json.dumps(rec), flush=True)


def build_fn3(mesh, dtype, setup_dev):
    """coordinates -> fibers -> HO inflation function (config-3 shape)."""
    import contextlib
    import jax
    import jax.numpy as jnp
    import thunderbolt_tpu as tb
    ctx = (jax.default_device(setup_dev) if setup_dev is not None
           else contextlib.nullcontext())
    with ctx:
        cs = tb.compute_lv_coordinate_system(mesh)
        micro = tb.create_microstructure_model(
            cs, endo_helix_angle=np.deg2rad(60.0),
            epi_helix_angle=np.deg2rad(-60.0))
        model = tb.QuasiStaticModel(
            "displacement",
            tb.PK1Model(tb.HolzapfelOgden2009Model(),
                        microstructure_model=micro),
            (tb.ConstantPressureBC(0.12, "Endocardium"),
             tb.NormalSpringBC(0.5, "Epicardium")))
        disc = tb.FiniteElementDiscretization(
            {"displacement": tb.FieldSpec(order=1, ncomponents=3)},
            dbcs=[tb.Dirichlet("displacement", "Base", 0.0)],
            dtype=dtype)
        fn = tb.semidiscretize(model, disc, mesh)
    return fn


def run_config3_on(fn, label, platform, repeats, expect_format):
    import jax
    import jax.numpy as jnp
    import thunderbolt_tpu as tb
    from thunderbolt_tpu.fem.sparsity import BlockDIAMatrix, ELLMatrix
    from thunderbolt_tpu.solver.time.homotopy import march_fixed_ladder

    n = fn.dh.ndofs
    kv, _ = fn.assemble(jnp.zeros(fn.solution_size, jnp.float32), 0.0)
    A = fn.jacobian_matrix(kv)
    fmt = type(A).__name__
    assert fmt.startswith(expect_format), (fmt, expect_format)

    newton = tb.NewtonRaphsonSolver(tol=5e-4, inner="cg", inner_rtol=1e-5,
                                    inner_maxiter=4000, max_iter=30)
    u0 = jnp.zeros(fn.solution_size, jnp.float32)
    u, its, convs = march_fixed_ladder(newton, fn, u0, (0.0, 1.0), 4)
    if not bool(jnp.all(convs)):
        _emit({"patient_bench": label, "ndofs": n, "format": fmt,
               "platform": platform, "error": "ladder diverged",
               "converged": np.asarray(convs).tolist()})
        return None
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        u, its, convs = march_fixed_ladder(newton, fn, u0, (0.0, 1.0), 4)
        jax.block_until_ready(u)
        times.append(time.perf_counter() - t0)
    el = float(np.median(times))
    iters = int(np.asarray(its).sum())
    rec = {"patient_bench": label, "config": 3, "ndofs": n,
           "format": fmt, "platform": platform,
           "newton_iters": iters, "ladder_s": round(el, 3),
           "iters_per_s": round(iters / el, 2),
           "max_u": round(float(jnp.abs(u).max()), 6)}
    _emit(rec)
    return rec


def run_config3_kernels(fn, label, platform, expect_format):
    """Bounded-dispatch kernel measurement for the config-3 path:
    chained-K one-dispatch timing of the material-AD assembly and one
    preconditioned CG iteration on the tangent (roofline recipe). Used
    at 46.8k where the full gather-ELL ladder is a single multi-minute
    dispatch that trips the remote worker watchdog."""
    import jax
    import jax.numpy as jnp
    from roofline_mech import timed_loop
    from thunderbolt_tpu.solver.linear import jacobi_preconditioner

    n = fn.dh.ndofs
    t = jnp.asarray(1.0, jnp.float32)
    u = jnp.zeros(fn.solution_size, jnp.float32)
    kv, r = fn.assemble(u, t)
    A = fn.constraints.apply_operator(fn.jacobian_matrix(kv))
    fmt = type(A).__name__ if not hasattr(A, "A") else (
        f"Masked[{type(A.A).__name__}]")
    assert expect_format in fmt, (fmt, expect_format)
    r = fn.constraints.apply_zero(r)

    K_asm = max(4, min(64, int(8e5 / n)))

    def asm_body(u_):
        kv_, r_ = fn.assemble(u_, t)
        return u_ + 1e-6 * r_ + 1e-12 * kv_.reshape(-1)[: r_.size]

    t_asm = timed_loop(asm_body, u, K_asm)

    Minv = (A.block_jacobi_inv() if hasattr(A, "block_jacobi_inv")
            else jacobi_preconditioner(A.diagonal()))

    def cg_body(s):
        d, x, rr, z = s
        Ad = A.mv(d)
        alpha = jnp.vdot(rr, z) / jnp.vdot(d, Ad)
        x2 = x + alpha * d
        r2 = rr - alpha * Ad
        z2 = Minv(r2)
        beta = jnp.vdot(r2, z2) / jnp.vdot(rr, z)
        return (d * beta + z2, x2, r2, z2)

    z0 = Minv(r)
    K_cg = max(32, min(4000, int(4e6 / n)))
    t_cg = timed_loop(cg_body, (z0, u * 0, r, z0), K_cg)
    rec = {"patient_bench": label, "config": 3, "mode": "kernels",
           "ndofs": n, "format": fmt, "platform": platform,
           "assemble_ms": round(1e3 * t_asm, 3),
           "cg_iter_ms": round(1e3 * t_cg, 4)}
    _emit(rec)
    return rec


def run_config5_on(mesh, platform, repeats, setup_dev, nsteps=50,
                   scale=5.14, chunk=0):
    import contextlib
    import jax
    import jax.numpy as jnp
    import thunderbolt_tpu as tb

    ctx = (jax.default_device(setup_dev) if setup_dev is not None
           else contextlib.nullcontext())
    with ctx:
        mesh.nodes[:] = mesh.nodes * scale
        model = tb.QuasiStaticModel(
            "displacement",
            tb.PK1Model(tb.NeoHookeanModel(mu=2.0, lam=10.0)), ())
        coupler = tb.LumpedFluidSolidCoupler(
            (tb.ChamberVolumeCoupling("Endocardium", "lv"),),
            "displacement",
            volume_method=tb.RSAFDQ2022SurrogateVolume(
                h=(0.0, 0.0, 1.0), b=(0.0, 0.0, 0.2 * scale)))
        circuit = tb.RSAFDQ2022LumpedCircuitModel(lv_pressure_given=False)
        coupled = tb.RSAFDQ2022Model(model, circuit, coupler)
        disc = tb.FiniteElementDiscretization(
            {"displacement": tb.FieldSpec(order=1, ncomponents=3)},
            dbcs=[tb.Dirichlet("displacement", "Base", 0.0)],
            dtype=jnp.float32)
        fn3d, circ = tb.semidiscretize(tb.RSAFDQ2022Split(coupled),
                                       disc, mesh)
    n = fn3d.nmech
    solver = tb.Coupled3D0DSolver(
        newton=tb.BlockedNewtonSolver(tol=5e-4, rtol=1e-3, max_iter=25,
                                      inner="schur_cg", inner_rtol=1e-5,
                                      simplified_newton=True))
    w0, c0 = solver.init(fn3d, circ, jnp.float32)
    V0 = float(fn3d.volumes(w0[: fn3d.nmech])[0])
    c0 = c0.at[circ.volume_index("lv")].set(V0)
    dt = 2.0

    def march_all(w, c):
        """Bounded ``chunk``-step dispatches (the gather-ELL coupled
        march is slow enough per step to trip the remote worker
        watchdog on one long dispatch)."""
        if not chunk or chunk >= nsteps:
            return solver.march(fn3d, circ, w, c, 0.0, dt, nsteps)
        convs, its = [], []
        t = 0.0
        for s in range(0, nsteps, chunk):
            m = min(chunk, nsteps - s)
            w, c, rp = solver.march(fn3d, circ, w, c, t, dt, m)
            jax.block_until_ready(w)
            convs.append(np.asarray(rp.converged))
            its.append(np.asarray(rp.iterations))
            t += m * dt
        rp_all = type(rp)(ts=None, volumes=None, pressures=None,
                          iterations=np.concatenate(its),
                          converged=np.concatenate(convs))
        return w, c, rp_all

    w, c, rep = march_all(w0, c0)
    if not bool(np.all(np.asarray(rep.converged))):
        bad = np.where(~np.asarray(rep.converged))[0]
        _emit({"patient_bench": "mfem-loaded", "config": 5, "ndofs": n,
               "platform": platform,
               "error": f"march diverged at steps {bad[:5].tolist()}"})
        return
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        w, c, rep = march_all(w0, c0)
        jax.block_until_ready(w)
        times.append(time.perf_counter() - t0)
    el = float(np.median(times))
    _emit({"patient_bench": "mfem-loaded", "config": 5, "ndofs": n,
           "platform": platform, "steps": nsteps,
           "march_s": round(el, 3),
           "ms_per_coupled_step": round(1e3 * el / nsteps, 2),
           "beat_equivalent_s": round(el * 400.0 / nsteps, 2),
           "newton_iters": int(np.asarray(rep.iterations).sum())})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--level", type=int, default=2,
                    help="LV refinement level (0: 1k dofs, 2: 46.8k)")
    ap.add_argument("--configs", type=str, default="3,5")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--skip-rcm", action="store_true")
    ap.add_argument("--skip-lattice", action="store_true",
                    help="skip the lattice-ordered BlockDIA reference run")
    ap.add_argument("--c3-mode", choices=["auto", "ladder", "kernels"],
                    default="auto",
                    help="config 3: full homotopy ladder (one dispatch) "
                    "or bounded chained-kernel timing; auto = ladder "
                    "below level 2 (a gather-ELL ladder at 46.8k is a "
                    "multi-minute dispatch that trips the worker "
                    "watchdog), kernels at level >= 2")
    ap.add_argument("--c5-chunk", type=int, default=0,
                    help="config 5: split the march into chunk-step "
                    "dispatches")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        setup_dev = jax.devices("cpu")[0] if not args.cpu else None
    except RuntimeError:
        setup_dev = None
    platform = "cpu" if args.cpu else jax.devices()[0].platform
    configs = {int(s) for s in args.configs.split(",")}

    import jax.numpy as jnp
    import thunderbolt_tpu as tb
    k = 2 ** args.level
    dims = (12 * k, 3 * k, 6 * k)
    src = tb.generate_ideal_lv_mesh(*dims)
    _emit({"sweep": "patient_mesh", "dims": dims, "platform": platform,
           "level": args.level, "host_cores": os.cpu_count()})

    patient = load_patient_mesh(src)

    kernels = (args.c3_mode == "kernels"
               or (args.c3_mode == "auto" and args.level >= 2))
    if 3 in configs:
        fn_p = build_fn3(patient, jnp.float32, setup_dev)
        if kernels:
            rec_p = run_config3_kernels(fn_p, "mfem-loaded", platform,
                                        "ELL")
        else:
            rec_p = run_config3_on(fn_p, "mfem-loaded", platform,
                                   args.repeats, "ELL")
        del fn_p
        if not args.skip_rcm:
            from thunderbolt_tpu.mesh.tools import reorder_mesh_rcm
            rcm = reorder_mesh_rcm(patient)
            fn_r = build_fn3(rcm, jnp.float32, setup_dev)
            if kernels:
                run_config3_kernels(fn_r, "mfem-loaded+rcm", platform,
                                    "ELL")
            else:
                run_config3_on(fn_r, "mfem-loaded+rcm", platform,
                               args.repeats, "ELL")
            del fn_r
        if not args.skip_lattice:
            fn_l = build_fn3(src, jnp.float32, setup_dev)
            if kernels:
                rec_l = run_config3_kernels(fn_l, "lattice", platform,
                                            "BlockDIA")
                if rec_p and rec_l:
                    _emit({"patient_bench": "penalty", "config": 3,
                           "mode": "kernels", "ndofs": rec_p["ndofs"],
                           "ell_vs_blockdia_cg_iter_slowdown": round(
                               rec_p["cg_iter_ms"] / rec_l["cg_iter_ms"],
                               2),
                           "assemble_slowdown": round(
                               rec_p["assemble_ms"] / rec_l["assemble_ms"],
                               2)})
            else:
                rec_l = run_config3_on(fn_l, "lattice", platform,
                                       args.repeats, "BlockDIA")
                if rec_p and rec_l:
                    _emit({"patient_bench": "penalty", "config": 3,
                           "ndofs": rec_p["ndofs"],
                           "ell_vs_blockdia_slowdown": round(
                               rec_l["iters_per_s"] / rec_p["iters_per_s"],
                               2)})
            del fn_l

    if 5 in configs:
        run_config5_on(patient, platform, args.repeats, setup_dev,
                       nsteps=(10 if args.c5_chunk else 50),
                       chunk=args.c5_chunk)


if __name__ == "__main__":
    main()
