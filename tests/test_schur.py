"""Standalone Schur-complement linear solver (parity:
``SchurComplementLinearSolver``, ``src/solver/linear/schur.jl:26-80``)."""

import numpy as np
import jax.numpy as jnp

import thunderbolt_tpu as tb


def _saddle(n=40, m=3, seed=0):
    rng = np.random.default_rng(seed)
    Q = rng.standard_normal((n, n))
    A = Q @ Q.T + n * np.eye(n)          # SPD
    B = rng.standard_normal((n, m))
    C = rng.standard_normal((m, n))
    f = rng.standard_normal(n)
    g = rng.standard_normal(m)
    K = np.block([[A, B], [C, np.zeros((m, m))]])
    ref = np.linalg.solve(K, np.concatenate([f, g]))
    return A, B, C, f, g, ref[:n], ref[n:]


def test_schur_solve_matches_dense():
    A, B, C, f, g, x_ref, y_ref = _saddle()
    Avec = lambda v: jnp.asarray(A) @ v
    solver = tb.SchurComplementLinearSolver(inner="cg", rtol=1e-12,
                                            atol=1e-14)
    x, y = solver.solve(Avec, jnp.asarray(B), jnp.asarray(C),
                        jnp.asarray(f), jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-7, atol=1e-9)


def test_schur_solve_callable_inner():
    A, B, C, f, g, x_ref, y_ref = _saddle(seed=1)
    Ainv = np.linalg.inv(A)
    x, y = tb.schur_complement_solve(
        lambda b: jnp.asarray(Ainv) @ b, jnp.asarray(B), jnp.asarray(C),
        jnp.asarray(f), jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-8)


def test_compute_chamber_volume_free_function():
    """Volume of the undeformed ideal-LV cavity from u=0 matches the tying
    machinery's volume (rsafdq2022.jl:22-64 parity)."""
    import thunderbolt_tpu.disc.mechanics  # noqa: F401
    mesh = tb.generate_ideal_lv_mesh(8, 2, 4)
    material = tb.PK1Model(tb.NeoHookeanModel(mu=2.0, lam=10.0))
    model = tb.QuasiStaticModel("displacement", material, ())
    disc = tb.FiniteElementDiscretization(
        {"displacement": tb.FieldSpec(order=1, ncomponents=3)},
        dtype=jnp.float64)
    fn = tb.semidiscretize(model, disc, mesh)
    u = jnp.zeros(fn.solution_size, jnp.float64)
    V = tb.compute_chamber_volume(fn.dh, u, "Endocardium",
                                  field="displacement")
    assert np.isfinite(float(V))
    assert 0.0 < float(V) < 10.0
    # uniform inflation (displace radially outward in the xy-plane) must
    # GROW the cavity volume; deflation must shrink it
    X = fn.dh.field_dof_coords("displacement").reshape(-1, 3)
    r = np.linalg.norm(X[:, :2], axis=1, keepdims=True)
    radial = np.where(r > 1e-9, X[:, :2] / np.maximum(r, 1e-9), 0.0)
    d = np.zeros_like(X)
    d[:, :2] = 0.02 * radial
    V_out = tb.compute_chamber_volume(fn.dh, jnp.asarray(d.reshape(-1)),
                                      "Endocardium")
    V_in = tb.compute_chamber_volume(fn.dh, jnp.asarray(-d.reshape(-1)),
                                     "Endocardium")
    assert float(V_out) > float(V) > float(V_in)
