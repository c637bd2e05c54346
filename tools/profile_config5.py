"""Phase breakdown of one config-5 coupled step (VERDICT r2 ask #1 'done'
criterion: per-phase breakdown assembly / Krylov / circuit / dispatch).

Runs a shortened beat (N steps) and times, separately:
  - blocked-Newton dispatch wall-clock (the jitted while_loop incl. its
    device_get readback)
  - circuit scan wall-clock
  - Newton iteration counts + CG behavior (via a one-off eager re-run of
    the phases at the final state)
"""
import time, json, sys
import numpy as np
import jax
import jax.numpy as jnp

import thunderbolt_tpu as tb

N = int(sys.argv[1]) if len(sys.argv) > 1 else 30

mesh = tb.generate_ideal_lv_mesh(12, 3, 6)
mesh.nodes[:] = mesh.nodes * 5.14
material = tb.PK1Model(tb.NeoHookeanModel(mu=2.0, lam=10.0))
coupler = tb.LumpedFluidSolidCoupler(
    (tb.ChamberVolumeCoupling("Endocardium", "lv"),),
    "displacement",
    volume_method=tb.RSAFDQ2022SurrogateVolume(
        h=(0.0, 0.0, 1.0), b=(0.0, 0.0, 0.2 * 5.14)))
circuit = tb.RSAFDQ2022LumpedCircuitModel(lv_pressure_given=False)
coupled = tb.RSAFDQ2022Model(
    tb.QuasiStaticModel("displacement", material, ()), circuit, coupler)
disc = tb.FiniteElementDiscretization(
    {"displacement": tb.FieldSpec(order=1, ncomponents=3)},
    dbcs=[tb.Dirichlet("displacement", "Base", 0.0)],
    dtype=jnp.float32)
fn3d, circ = tb.semidiscretize(tb.RSAFDQ2022Split(coupled), disc, mesh)
print("nmech dofs:", fn3d.nmech, "nnz:", fn3d.mech.pattern.nnz, flush=True)

from thunderbolt_tpu.disc.coupled import BlockedNewtonSolver, Coupled3D0DSolver
newton = BlockedNewtonSolver(tol=5e-4, rtol=1e-3, max_iter=25,
                             inner="schur_cg")
solver = Coupled3D0DSolver(newton=newton)
w, c = solver.init(fn3d, circ, jnp.float32)
V0 = float(fn3d.volumes(w[: fn3d.nmech])[0])
c = c.at[circ.volume_index("lv")].set(V0)

t, dt = 0.0, 2.0
# warm
for _ in range(2):
    w, c, stats = solver.step(fn3d, circ, w, c, t, dt)
    t += dt

# --- timed phases --------------------------------------------------------
t_newton = 0.0
t_circuit = 0.0
iters = []
m = len(fn3d.chambers)
idx = np.array([circ.pressure_input_index(ch.lumped_symbol)
                for ch in fn3d.chambers])
vol_ix = [circ.volume_index(ch.lumped_symbol) for ch in fn3d.chambers]

for k in range(N):
    V_targets = jnp.stack([c[i] for i in vol_ix])
    t0 = time.perf_counter()
    w, stats = newton.solve(fn3d, w, t + dt, V_targets)
    t_newton += time.perf_counter() - t0
    iters.append(stats.iterations)
    p = w[fn3d.nmech:]
    ext = jnp.zeros(circ.num_unknown_pressures(), c.dtype).at[idx].set(
        p.astype(c.dtype))
    t0 = time.perf_counter()
    h = dt / solver.circuit_substeps
    def body(cc, i):
        ti = t + i * h
        k1 = circ.rhs(cc, ti, ext)
        k2 = circ.rhs(cc + 0.5 * h * k1, ti + 0.5 * h, ext)
        return cc + h * k2, None
    c, _ = jax.lax.scan(body, c, jnp.arange(solver.circuit_substeps))
    jax.block_until_ready(c)
    t_circuit += time.perf_counter() - t0
    t += dt

print(json.dumps({
    "n_steps": N,
    "newton_s_per_step": round(t_newton / N, 4),
    "circuit_s_per_step": round(t_circuit / N, 4),
    "newton_iters_mean": round(float(np.mean(iters)), 2),
    "newton_iters_max": int(np.max(iters)),
}), flush=True)

# --- dissect one Newton solve: assembly vs CG ----------------------------
from thunderbolt_tpu.solver.linear import cg, jacobi_preconditioner
ch = fn3d.mech.constraints
extra0 = fn3d.newton_extra()
V_targets = jnp.stack([c[i] for i in vol_ix])

@jax.jit
def assemble_j(w, t, V_targets, extra):
    kvals, B, r_u, r_p = fn3d.assemble(w, t, V_targets, *extra)
    A_raw = fn3d.mech.jacobian_matrix(kvals)
    A = ch.apply_operator(A_raw)
    r_u = ch.apply_zero(r_u)
    B = jax.vmap(ch.apply_zero)(B)
    return A, B, r_u, r_p

A, B, r_u, r_p = jax.block_until_ready(assemble_j(w, t, V_targets, extra0))
t0 = time.perf_counter()
for _ in range(10):
    A, B, r_u, r_p = assemble_j(w, t, V_targets, extra0)
jax.block_until_ready(r_u)
asm = (time.perf_counter() - t0) / 10
print(json.dumps({"assembly_s": round(asm, 4)}), flush=True)

Minv = A.block_jacobi_inv() if hasattr(A, "block_jacobi_inv") \
    else jacobi_preconditioner(A.diagonal())

@jax.jit
def cg_j(A, r):
    Minv = A.block_jacobi_inv() if hasattr(A, "block_jacobi_inv") \
        else jacobi_preconditioner(A.diagonal())
    x, info = cg(A.mv, r, Minv=Minv, rtol=newton.inner_rtol,
                 atol=newton.inner_atol, maxiter=newton.inner_maxiter)
    return x, info

x, info = cg_j(A, r_u)
jax.block_until_ready(x)
t0 = time.perf_counter()
for _ in range(5):
    x, info = cg_j(A, r_u)
jax.block_until_ready(x)
cg_time = (time.perf_counter() - t0) / 5
try:
    cg_iters = int(info["iterations"]) if isinstance(info, dict) else info
except Exception:
    cg_iters = repr(info)[:200]
print(json.dumps({"cg_s": round(cg_time, 4), "cg_info": str(cg_iters)}),
      flush=True)

# dispatch overhead: a trivial jitted op round-trip
@jax.jit
def trivial(x):
    return x + 1.0
trivial(jnp.zeros(4)).block_until_ready()
t0 = time.perf_counter()
for _ in range(20):
    jax.block_until_ready(trivial(jnp.zeros(4)))
print(json.dumps({"dispatch_roundtrip_s":
                  round((time.perf_counter() - t0) / 20, 5)}), flush=True)
