"""Differentiable simulation 2: material stiffness identification.

Beyond-reference capability (no Julia analog exists): recover the
passive stiffness of a pressurized tissue block from an "imaged"
deflection field by gradient descent THROUGH the Newton equilibrium
solver. Reverse mode is the implicit-function-theorem adjoint
(`thunderbolt_tpu.ad.make_parametric_equilibrium_solve`): one transposed
tangent solve + one reverse residual pass per gradient, for EVERY
parameter at once, and theta rides the traced extra channel so the whole
optimization reuses ONE compiled Newton loop.

A synthetic observation is generated at (mu*, lam*); starting from a 3x
wrong guess, Adam on the displacement misfit recovers mu to <1%. (lam is
weakly observable under this near-isochoric load — its gradient is ~14x
smaller; the fit still reduces its error.)

Run:  python examples/ad02_stiffness_identification.py
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# tiny inverse problem; remote-TPU compile latency dominates — force CPU
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import dataclasses as dc
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.ad import make_parametric_equilibrium_solve
from thunderbolt_tpu.utils.smoke import smoke

DT = jnp.float64

# 1. the forward model: clamped block, pressure on the far face
mesh = tb.generate_mesh("hex8", (4, 3, 3), (0, 0, 0), (2.0, 1.0, 1.0))
model = tb.QuasiStaticModel(
    "d", tb.PK1Model(tb.NeoHookeanModel(mu=1.0, lam=2.0)),
    (tb.ConstantPressureBC(lambda t: 0.04 * t, "right"),))
disc = tb.FiniteElementDiscretization(
    {"d": tb.FieldSpec(order=1, ncomponents=3)},
    dbcs=[tb.Dirichlet("d", "left", 0.0)], dtype=DT)
fn = tb.semidiscretize(model, disc, mesh)
newton = tb.NewtonRaphsonSolver(tol=1e-11, inner="gmres",
                                inner_rtol=1e-12, max_iter=40)


def apply_params(mat, th):
    # exp-parameterization: positivity by construction
    return dc.replace(mat, material_model=dc.replace(
        mat.material_model, mu=jnp.exp(th["log_mu"]),
        lam=jnp.exp(th["log_lam"])))


solve = make_parametric_equilibrium_solve(fn, newton, apply_params,
                                          adjoint_rtol=1e-12)
u0 = jnp.zeros(fn.solution_size, DT)
t_load = jnp.asarray(1.0, DT)

# 2. synthetic "imaged" deflection at the true parameters
mu_true, lam_true = 0.8, 1.6
th_true = {"log_mu": jnp.log(jnp.asarray(mu_true, DT)),
           "log_lam": jnp.log(jnp.asarray(lam_true, DT))}
u_obs = solve(u0, t_load, th_true)
print(f"observation: max |u| = {float(jnp.abs(u_obs).max()):.4f}")

# 3. Adam on the displacement-field misfit, from a 3x-stiff guess
def loss(th):
    return jnp.mean((solve(u0, t_load, th) - u_obs) ** 2) * 1e4


grad_fn = jax.value_and_grad(loss)
th = {"log_mu": jnp.log(jnp.asarray(3 * mu_true, DT)),
      "log_lam": jnp.log(jnp.asarray(3 * lam_true, DT))}
m = {k: 0.0 for k in th}
v = {k: 0.0 for k in th}
b1, b2 = 0.9, 0.999
NITER = smoke(10, 60)
for it in range(NITER):
    lr = 0.2 * 0.95 ** it
    L, g = grad_fn(th)
    for k in th:
        m[k] = b1 * m[k] + (1 - b1) * g[k]
        v[k] = b2 * v[k] + (1 - b2) * g[k] * g[k]
        mh, vh = m[k] / (1 - b1 ** (it + 1)), v[k] / (1 - b2 ** (it + 1))
        th[k] = th[k] - lr * mh / (jnp.sqrt(vh) + 1e-12)
    if it % 10 == 0 or it == NITER - 1:
        print(f"iter {it:3d}   loss = {float(L):.3e}   "
              f"mu = {float(jnp.exp(th['log_mu'])):.4f}   "
              f"lam = {float(jnp.exp(th['log_lam'])):.4f}")

mu_fit = float(jnp.exp(th["log_mu"]))
err = abs(mu_fit - mu_true) / mu_true
print(f"true mu = {mu_true:.4f}   fitted mu = {mu_fit:.4f}   "
      f"relative error = {100 * err:.2f}%")
assert err < smoke(0.5, 0.01), "identification failed"
print("OK: stiffness recovered by gradient descent through Newton.")
