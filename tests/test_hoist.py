"""Constant-hoisting jit (``utils/hoist.py``): the hoisted march must be
numerically identical to the embedded-constant march (same jaxpr replayed),
with the FEM tables moved from HLO constants to parameters — the axon
tunnel's remote-compile body limit is a deployment constraint, never a
semantics change (BASELINE.md 353k-dof note)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import thunderbolt_tpu as tb
from thunderbolt_tpu.solver.time.homotopy import march_fixed_ladder
from thunderbolt_tpu.utils.hoist import hoisted_jit

DT = jnp.float64


def _ramp_fn():
    mesh = tb.generate_mesh("hex8", (4, 2, 2), (0, 0, 0), (3.0, 1.0, 1.0))
    material = tb.PK1Model(tb.NeoHookeanModel(mu=1.0, lam=5.0))
    press = tb.PressureFieldBC(
        tb.AnalyticalCoefficient(lambda x, t: jnp.minimum(t, 1.0) * 0.06),
        "bottom")
    model = tb.QuasiStaticModel("d", material, (press,))
    disc = tb.FiniteElementDiscretization(
        {"d": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("d", "left", 0.0)], dtype=DT)
    return tb.semidiscretize(model, disc, mesh)


def test_hoisted_jit_bitwise_and_hoists():
    big = np.arange(4096, dtype=np.float32)  # 16 KiB -> at threshold

    def f(x):
        return {"y": (big * x).sum(), "z": x * 2.0}

    x = jnp.linspace(0.0, 1.0, 4096, dtype=jnp.float32)
    hf = hoisted_jit(f, x, threshold_bytes=1 << 14)
    ref = jax.jit(f)(x)
    got = hf(x)
    assert hf.n_hoisted >= 1 and hf.hoisted_bytes >= big.nbytes
    assert np.array_equal(np.asarray(got["y"]), np.asarray(ref["y"]))
    assert np.array_equal(np.asarray(got["z"]), np.asarray(ref["z"]))


def test_hoisted_ladder_bitwise(monkeypatch):
    """march_fixed_ladder under THUNDERBOLT_HOIST_CONSTS=1 reproduces the
    embedded-constant march bitwise (same jaxpr, different byte placement)."""
    newton = tb.NewtonRaphsonSolver(tol=1e-9, max_iter=25, inner="dense")

    fn_a = _ramp_fn()
    u0 = jnp.zeros(fn_a.solution_size, DT)
    u_ref, its_ref, convs_ref = march_fixed_ladder(
        newton, fn_a, u0, (0.0, 1.0), 3)
    assert bool(jnp.all(convs_ref))

    monkeypatch.setenv("THUNDERBOLT_HOIST_CONSTS", "1")
    # the test mesh's tables are tiny; lower the threshold so they hoist
    monkeypatch.setenv("THUNDERBOLT_HOIST_THRESHOLD", "4096")
    fn_b = _ramp_fn()  # fresh fn: the jit cache is keyed on the instance
    u_h, its_h, convs_h = march_fixed_ladder(
        newton, fn_b, u0, (0.0, 1.0), 3)
    assert bool(jnp.all(convs_h))
    assert np.array_equal(np.asarray(u_ref), np.asarray(u_h))
    assert np.array_equal(np.asarray(its_ref), np.asarray(its_h))
    run = next(v for k, v in fn_b.__dict__.items()
               if isinstance(k, tuple) and k[0] == "_homotopy_ladder_jit")
    assert run.n_hoisted >= 1, "no tables were hoisted"


def test_hoisted_newmark_march_bitwise(monkeypatch):
    """NewmarkSolver.march under hoisting == the embedded-constant march."""
    def _block():
        mesh = tb.generate_mesh("hex8", (2, 2, 2))
        material = tb.PK1Model(tb.NeoHookeanModel(mu=5.0, lam=5.0))
        model = tb.ElastodynamicsModel("d", "v", material, rho=1.0)
        disc = tb.FiniteElementDiscretization(
            {"d": tb.FieldSpec(order=1, ncomponents=3)},
            dbcs=[tb.Dirichlet("d", "left", 0.0)], dtype=DT)
        return tb.semidiscretize(model, disc, mesh)

    solver = tb.NewmarkSolver(newton=tb.NewtonRaphsonSolver(
        tol=1e-10, max_iter=25, inner="dense"))

    fn_a = _block()
    st0 = solver.init(fn_a)
    v0 = fn_a.constraints.apply_zero(jnp.full(fn_a.solution_size, 0.05, DT))
    st0 = type(st0)(st0.u, v0, st0.a, st0.t)
    st_ref, its_ref, convs_ref = solver.march(fn_a, st0, 0.1, 5)
    assert bool(jnp.all(convs_ref))

    monkeypatch.setenv("THUNDERBOLT_HOIST_CONSTS", "1")
    monkeypatch.setenv("THUNDERBOLT_HOIST_THRESHOLD", "4096")
    fn_b = _block()
    st_h, its_h, convs_h = solver.march(fn_b, st0, 0.1, 5)
    assert bool(jnp.all(convs_h))
    for a, b in ((st_ref.u, st_h.u), (st_ref.v, st_h.v),
                 (st_ref.a, st_h.a)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    run = next(v for k, v in fn_b.__dict__.items()
               if isinstance(k, tuple) and k[0] == "_newmark_march_jit")
    assert run.n_hoisted >= 1, "no tables were hoisted"


def test_hoisted_coupled_march_bitwise(monkeypatch):
    """Coupled3D0DSolver.march under hoisting == the embedded-constant
    march (the config-5 path at the 353k tunnel level)."""
    from thunderbolt_tpu.models.fluid.lumped import (
        RSAFDQ2022LumpedCircuitModel)
    from thunderbolt_tpu.disc.coupled import (
        BlockedNewtonSolver, Coupled3D0DSolver)
    from tests.test_fsi import _lv_setup

    circuit = RSAFDQ2022LumpedCircuitModel(lv_pressure_given=False)
    sol = Coupled3D0DSolver(newton=BlockedNewtonSolver(tol=1e-8,
                                                       max_iter=25))

    _, fn_a, circ_a = _lv_setup(circuit, scale=5.14)
    w0, c0 = sol.init(fn_a, circ_a, DT)
    V0 = float(fn_a.volumes(w0[: fn_a.nmech])[0])
    c0 = c0.at[circ_a.volume_index("lv")].set(V0)
    w_ref, c_ref, rep_ref = sol.march(fn_a, circ_a, w0, c0, 0.0, 2.0, 3)
    assert rep_ref.all_converged()

    monkeypatch.setenv("THUNDERBOLT_HOIST_CONSTS", "1")
    monkeypatch.setenv("THUNDERBOLT_HOIST_THRESHOLD", "4096")
    _, fn_b, circ_b = _lv_setup(circuit, scale=5.14)
    w_h, c_h, rep_h = sol.march(fn_b, circ_b, w0, c0, 0.0, 2.0, 3)
    assert rep_h.all_converged()
    assert np.array_equal(np.asarray(w_ref), np.asarray(w_h))
    assert np.array_equal(np.asarray(c_ref), np.asarray(c_h))
    assert np.array_equal(np.asarray(rep_ref.volumes),
                          np.asarray(rep_h.volumes))
    run = next(v for k, v in fn_b.__dict__.items()
               if isinstance(k, tuple) and k[0] == "_coupled_march_jit")
    assert run.n_hoisted >= 1, "no tables were hoisted"
