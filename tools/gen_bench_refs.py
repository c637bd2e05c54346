"""Generate stored f64 CPU references for the on-chip correctness gates
(VERDICT r3 item 2).

The reference's GPU suite asserts accelerator-vs-CPU solution equality
(``test/gpu/diffusion-test.jl:23-45``: ``Vector(gpu.u) ≈ cpu.u``). The
TPU analog: ``bench.py`` / ``bench_configs.py`` compare the chip's f32
end states against the f64 CPU references stored here and emit
``ok_correctness`` in the JSON line the driver records — a chip
numerics/compiler regression now FAILS the bench instead of shipping
inside a great-looking steps/s number.

Protocols (fixed; the bench replays them exactly):
  spiral:   bench.py's 256x256 FHN setup, 200 operator-split steps of
            dt = 1 ms from the stored initial condition -> phi_m field.
  config3:  build_config3 ladder march (0 -> 1 in 4 rungs) -> u.
  config4:  build_config4, Newmark march 20 steps of dt = 1 ms from
            rest -> u.
  config5:  build_config5, coupled march 400 steps of dt = 2 ms ->
            LV volume + pressure traces (the PV loop).

Run on the host:  python tools/gen_bench_refs.py [--only spiral,3,4,5]
Writes bench_refs/*.npz (committed; a few hundred kB total).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REFS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench_refs")

SPIRAL_STEPS = 200
C4_STEPS = 20
C5_STEPS = 400


def _save(name, **arrays):
    os.makedirs(REFS, exist_ok=True)
    path = os.path.join(REFS, name + ".npz")
    np.savez_compressed(path, jax_version=jax.__version__, **arrays)
    sizes = {k: np.asarray(v).shape for k, v in arrays.items()}
    print(f"wrote {path}: {sizes}")


def gen_spiral():
    import thunderbolt_tpu as tb
    import bench as bench_mod  # reuse the bench's exact setup

    # inline the setup from bench.main() at f64
    N = 256
    dtype = jnp.float64
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
        lambda x: np.where((x[:, 0] <= 1.25) & (x[:, 1] <= 1.25), 1.0, 0.0))
    u0 = tb.setvariable(
        u0, odeform, "s", lambda x: np.where(x[:, 1] >= 1.25, 0.1, 0.0))
    # tight-CG heat: solver-agnostic gold (the chip runs chebyshev f32)
    alg = tb.LieTrotterGodunov((
        tb.BackwardEulerSolver(rtol=1e-10, atol=1e-12, maxiter=2000),
        tb.AdaptiveForwardEulerSubstepper(reaction_threshold=0.1)))
    step = jax.jit(alg.make_step(odeform, 1.0))
    u = u0
    for i in range(SPIRAL_STEPS):
        u = step(u, jnp.asarray(float(i), u.dtype))
    u.block_until_ready()
    phi = np.asarray(tb.getvariable(u, odeform, "phi_m"))
    _save("spiral256_t200", phi=phi.astype(np.float32),
          steps=np.int64(SPIRAL_STEPS))


def gen_config3():
    import thunderbolt_tpu as tb
    from bench_configs import build_config3
    from thunderbolt_tpu.solver.time.homotopy import march_fixed_ladder
    fn = build_config3(jnp.float64)
    newton = tb.NewtonRaphsonSolver(tol=1e-9, inner="dense", max_iter=30)
    u0 = jnp.zeros(fn.solution_size, jnp.float64)
    u, its, convs = march_fixed_ladder(newton, fn, u0, (0.0, 1.0), 4)
    assert bool(jnp.all(convs)), np.asarray(convs)
    _save("config3_u", u=np.asarray(u).astype(np.float32))


def gen_config4():
    import thunderbolt_tpu as tb
    from bench_configs import build_config4
    fn = build_config4(jnp.float64)
    solver = tb.NewmarkSolver(newton=tb.NewtonRaphsonSolver(
        tol=1e-9, inner="dense", max_iter=30))
    state = solver.init(fn)
    state, its, convs = solver.march(fn, state, 1.0, C4_STEPS)
    assert bool(jnp.all(convs)), np.asarray(convs)
    _save("config4_u_t20", u=np.asarray(state.u).astype(np.float32),
          steps=np.int64(C4_STEPS))


def gen_config5():
    import thunderbolt_tpu as tb
    from bench_configs import build_config5
    fn3d, circ = build_config5(jnp.float64)
    solver = tb.Coupled3D0DSolver(
        newton=tb.BlockedNewtonSolver(tol=1e-7, rtol=1e-6, max_iter=25,
                                      inner="schur_cg"))
    w0, c0 = solver.init(fn3d, circ, jnp.float64)
    V0 = float(fn3d.volumes(w0[: fn3d.nmech])[0])
    c0 = c0.at[circ.volume_index("lv")].set(V0)
    w, c, rep = solver.march(fn3d, circ, w0, c0, 0.0, 2.0, C5_STEPS)
    assert rep.all_converged(), np.where(~np.asarray(rep.converged))[0]
    _save("config5_pv_400",
          volumes=np.asarray(rep.volumes)[:, 0].astype(np.float32),
          pressures=np.asarray(rep.pressures)[:, 0].astype(np.float32),
          steps=np.int64(C5_STEPS))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default="spiral,3,4,5")
    args = ap.parse_args()
    only = set(args.only.split(","))
    if "spiral" in only:
        gen_spiral()
    if "3" in only:
        gen_config3()
    if "4" in only:
        gen_config4()
    if "5" in only:
        gen_config5()


if __name__ == "__main__":
    main()
