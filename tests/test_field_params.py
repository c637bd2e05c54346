"""Per-cell material-parameter fields (``FieldParametrizedMaterial``) and
differentiable stiffness MAPS through the adjoint equilibrium solve.

Forward: a heterogeneous parameter field in ONE vmapped kernel must match
the reference-style per-subdomain material split (``fem.jl:843-895``)
exactly. Inverse: the gradient of a deflection QoI w.r.t. every cell's
stiffness comes from one adjoint solve and matches finite differences.
"""

import pytest
import dataclasses as dc

import numpy as np
import jax
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.ad import make_parametric_equilibrium_solve

DT = jnp.float64


def _disc():
    return tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("d", "left", 0.0)], dtype=DT)


def _newton():
    return tb.NewtonRaphsonSolver(tol=1e-12, inner="gmres",
                                  inner_rtol=1e-12, inner_maxiter=2000,
                                  max_iter=40)


def _build_neo(m, v):
    return dc.replace(m, material_model=dc.replace(
        m.material_model, mu=v["mu"]))


@pytest.mark.slow
def test_field_material_matches_subdomain_split():
    """A per-cell mu field equals the two-subdomain material split: same
    equilibrium to solver tolerance (and one kernel instead of two)."""
    mesh = tb.generate_mesh("hex8", (4, 2, 2), (0, 0, 0), (2.0, 1.0, 1.0))
    centers = mesh.nodes[mesh.blocks[0].connectivity].mean(axis=1)
    mesh.add_cellset("soft", lambda x: x[:, 0] <= 1.0)
    mesh.add_cellset("stiff", lambda x: x[:, 0] >= 1.0)
    mu = np.where(centers[:, 0] < 1.0, 0.7, 2.5)
    bcs = (tb.ConstantPressureBC(lambda t: 0.04 * t, "right"),)

    # reference-style split: two materials, two assembly batches
    models = {
        "soft": tb.QuasiStaticModel(
            "d", tb.PK1Model(tb.NeoHookeanModel(mu=0.7, lam=2.0)), ()),
        # the loaded "right" facets live in the stiff subdomain's cells
        "stiff": tb.QuasiStaticModel(
            "d", tb.PK1Model(tb.NeoHookeanModel(mu=2.5, lam=2.0)), bcs),
    }
    fn_split = tb.semidiscretize(models, _disc(), mesh)

    # field form: one material, one batch, mu rides the aux channel;
    # order the field by the assembly batch's cells
    base = tb.PK1Model(tb.NeoHookeanModel(mu=1.0, lam=2.0))
    fn_probe = tb.semidiscretize(
        tb.QuasiStaticModel("d", base, bcs), _disc(), mesh)
    batch_cells = np.asarray(fn_probe.batches[0].cells)
    mat = tb.FieldParametrizedMaterial(
        base=base, fields={"mu": jnp.asarray(mu[batch_cells], DT)},
        build=_build_neo)
    fn_field = tb.semidiscretize(tb.QuasiStaticModel("d", mat, bcs),
                                 _disc(), mesh)

    newton = _newton()
    u0s = jnp.zeros(fn_split.solution_size, DT)
    u_split, st1 = newton.solve(fn_split, u0s, jnp.asarray(1.0, DT))
    u_field, st2 = newton.solve(fn_field,
                                jnp.zeros(fn_field.solution_size, DT),
                                jnp.asarray(1.0, DT))
    assert st1.converged and st2.converged
    assert float(jnp.abs(u_field).max()) > 1e-3      # nontrivial deformation
    np.testing.assert_allclose(np.asarray(u_field), np.asarray(u_split),
                               atol=1e-9)


@pytest.mark.slow
def test_stiffness_map_gradient_matches_fd():
    """d QoI / d mu_c for EVERY cell c from ONE adjoint solve; checked
    against central FD re-solves on two cells (one near the load, one near
    the clamp)."""
    mesh = tb.generate_mesh("hex8", (3, 2, 2), (0, 0, 0), (1.5, 1.0, 1.0))
    base = tb.PK1Model(tb.NeoHookeanModel(mu=1.0, lam=2.0))
    fn = tb.semidiscretize(tb.QuasiStaticModel(
        "d", base, (tb.ConstantPressureBC(lambda t: 0.04 * t, "right"),)),
        _disc(), mesh)
    batch_cells = np.asarray(fn.batches[0].cells)

    def apply_params(mat, th):
        return tb.FieldParametrizedMaterial(
            base=mat, fields={"mu": th[batch_cells]}, build=_build_neo)

    solve = make_parametric_equilibrium_solve(fn, _newton(), apply_params,
                                              adjoint_rtol=1e-12)
    u0 = jnp.zeros(fn.solution_size, DT)
    t = jnp.asarray(1.0, DT)
    w = jnp.asarray(np.random.default_rng(3).standard_normal(
        fn.solution_size))

    def qoi(th):
        return jnp.vdot(w, solve(u0, t, th))

    th0 = jnp.full(mesh.ncells, 1.0, DT)
    g = jax.grad(qoi)(th0)
    assert g.shape == (mesh.ncells,)
    h = 1e-5
    for c in (0, mesh.ncells - 1):
        fd = (qoi(th0.at[c].add(h)) - qoi(th0.at[c].add(-h))) / (2 * h)
        assert abs(float(fd)) > 1e-9, c
        np.testing.assert_allclose(float(g[c]), float(fd), rtol=2e-5,
                                   err_msg=f"cell {c}")


def test_field_material_forward_heterogeneity():
    """Forward use without any adjoint: a soft half deflects more than a
    stiff half under the same pressure."""
    mesh = tb.generate_mesh("hex8", (4, 2, 2), (0, 0, 0), (2.0, 1.0, 1.0))
    base = tb.PK1Model(tb.NeoHookeanModel(mu=1.0, lam=2.0))
    centers = mesh.nodes[mesh.blocks[0].connectivity].mean(axis=1)
    fnp = tb.semidiscretize(tb.QuasiStaticModel(
        "d", base, (tb.ConstantPressureBC(lambda t: 0.03, "top"),)),
        _disc(), mesh)
    batch_cells = np.asarray(fnp.batches[0].cells)
    coords = fnp.dh.fields["d"].entity_coords
    newton = _newton()

    def band_deflections(mu):
        mat = tb.FieldParametrizedMaterial(
            base=base, fields={"mu": jnp.asarray(mu, DT)}, build=_build_neo)
        fn = tb.semidiscretize(tb.QuasiStaticModel(
            "d", mat, (tb.ConstantPressureBC(lambda t: 0.03, "top"),)),
            _disc(), mesh)
        u, st = newton.solve(fn, jnp.zeros(fn.solution_size, DT),
                             jnp.asarray(1.0, DT))
        assert st.converged
        d = np.asarray(u).reshape(-1, 3)
        return (np.linalg.norm(d[coords[:, 1] < 0.26], axis=1).max(),
                np.linalg.norm(d[coords[:, 1] > 0.74], axis=1).max())

    # one asymmetric field is enough for the fast gate: the soft band must
    # deflect decisively more (the mirrored case lives in the slow-marked
    # adjoint tests, which exercise per-cell sensitivity on both halves)
    b1, t1 = band_deflections(
        np.where(centers[batch_cells, 1] < 0.5, 0.4, 4.0))  # soft bottom
    assert b1 > 1.3 * t1, (b1, t1)
