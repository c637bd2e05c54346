"""Halo-exchange partitioned BlockDIA CG for mechanics tangents
(VERDICT r4 item 6): the shard_map + ppermute matvec must match the
unsharded MaskedOperator arithmetic exactly, Dirichlet mask and COO
spill included, with O(bandwidth) communication per iteration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import thunderbolt_tpu as tb
from thunderbolt_tpu.fem.sparsity import BlockDIAMatrix, MaskedOperator
from thunderbolt_tpu.parallel.sharding import (
    make_device_mesh, shard_mechanics_dofs)
from thunderbolt_tpu.parallel.halo_mech import (
    blockdia_halo_partition, make_halo_blockdia_cg,
    mech_collective_bytes_per_mv)
from thunderbolt_tpu.solver.linear import cg

needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8 virtual devices")


def _random_spd_blockdia(nent=64, c=3, B=2, with_spill=True, seed=0):
    """A random banded SPD block matrix: symmetric band (offsets -B..B)
    made diagonally dominant, plus a few spill entries coupling row 1 to
    a far-ish column (within the bandwidth bound)."""
    rng = np.random.default_rng(seed)
    n = nent * c
    dense = np.zeros((n, n))
    for d in range(-B, B + 1):
        for e in range(nent):
            if 0 <= e + d < nent:
                dense[e * c:(e + 1) * c, (e + d) * c:(e + d + 1) * c] = \
                    rng.standard_normal((c, c)) * 0.3
    dense = 0.5 * (dense + dense.T) + n * np.eye(n)
    offsets = tuple(range(-B, B + 1))
    blocks = np.zeros((len(offsets), nent, c, c))
    for k, d in enumerate(offsets):
        for e in range(nent):
            if 0 <= e + d < nent:
                blocks[k, e] = dense[e * c:(e + 1) * c,
                                     (e + d) * c:(e + d + 1) * c]
    spill = None
    if with_spill:
        # move a few in-band entries from the blocks into the COO spill
        # (symmetrically, to keep SPD): entity 1 <- entity 1+B
        sr, sc, sv = [], [], []
        for a in range(c):
            r, q = 1 * c + a, (1 + B) * c + a
            v = 0.05 * n
            dense[r, q] += v
            dense[q, r] += v
            sr += [r, q]
            sc += [q, r]
            sv += [v, v]
        spill = (np.asarray(sr, np.int32), np.asarray(sc, np.int32),
                 np.asarray(sv))
    A = BlockDIAMatrix(
        offsets, jnp.asarray(blocks), nent, c,
        spill_rows=None if spill is None else jnp.asarray(spill[0]),
        spill_cols=None if spill is None else jnp.asarray(spill[1]),
        spill_vals=None if spill is None else jnp.asarray(spill[2]))
    return A, dense


@needs8
@pytest.mark.parametrize("with_spill", [False, True])
@pytest.mark.parametrize("masked", [False, True])
def test_halo_cg_matches_reference(with_spill, masked):
    A, dense = _random_spd_blockdia(with_spill=with_spill)
    n = dense.shape[0]
    rng = np.random.default_rng(1)
    if masked:
        free = np.ones(n, bool)
        free[:6] = False           # clamp the first entity pair
        free[-3:] = False
        Aop = MaskedOperator(A, jnp.asarray(free))
    else:
        Aop = A
    b = jnp.asarray(rng.standard_normal(n))
    if masked:
        b = b * jnp.asarray(free, b.dtype)

    x_ref, info = cg(Aop.mv, b, Minv=Aop.block_jacobi_inv(),
                     rtol=1e-12, atol=0.0, maxiter=500)
    assert bool(info.converged)

    mesh = make_device_mesh(8)
    solve = make_halo_blockdia_cg(Aop, mesh, rtol=1e-12, atol=0.0,
                                  maxiter=500)
    x_h = solve(b)
    err = np.abs(np.asarray(x_h) - np.asarray(x_ref)).max()
    assert err < 1e-9 * max(1.0, np.abs(np.asarray(x_ref)).max()), err
    # the halo solve also solves the dense system
    if masked:
        freeix = np.nonzero(free)[0]
        r = dense[np.ix_(freeix, freeix)] @ np.asarray(x_h)[freeix] \
            - np.asarray(b)[freeix]
    else:
        r = dense @ np.asarray(x_h) - np.asarray(b)
    assert np.abs(r).max() < 1e-8 * np.abs(dense).max()


def _lv_halo_case(dims, ndev, rtol=1e-11):
    """Config-3-shaped LV tangent (BlockDIA + apex spill + Dirichlet
    base), entity-padded by the dof-distribution wrapper, solved by the
    halo CG vs the unsharded CG."""
    mesh = tb.generate_ideal_lv_mesh(*dims)
    model = tb.QuasiStaticModel(
        "displacement", tb.PK1Model(tb.NeoHookeanModel(mu=2.0, lam=10.0)),
        (tb.ConstantPressureBC(0.05, "Endocardium"),))
    disc = tb.FiniteElementDiscretization(
        {"displacement": tb.FieldSpec(order=1, ncomponents=3)},
        dbcs=[tb.Dirichlet("displacement", "Base", 0.0)],
        dtype=jnp.float64)
    fn = tb.semidiscretize(model, disc, mesh)
    dmesh = make_device_mesh(ndev)
    sfn = shard_mechanics_dofs(fn, dmesh)
    u0 = sfn.place(jnp.zeros(fn.solution_size))
    A0, r = sfn.assemble_operator(u0, 1.0)
    assert isinstance(A0, BlockDIAMatrix)
    assert A0.spill_rows is not None     # the apex plug must be in play
    A = sfn.constraints.apply_operator(A0)
    assert isinstance(A, MaskedOperator)
    b = sfn.constraints.apply_zero(-r)

    x_ref, info = cg(A.mv, b, Minv=A.block_jacobi_inv(),
                     rtol=rtol, atol=0.0, maxiter=4000)
    assert bool(info.converged)

    solve = make_halo_blockdia_cg(A, dmesh, rtol=rtol, atol=0.0,
                                  maxiter=4000)
    x_h = solve(b)
    scale = np.abs(np.asarray(x_ref)).max()
    err = np.abs(np.asarray(x_h) - np.asarray(x_ref)).max()
    assert err < 1e-8 * max(scale, 1e-30), (err, scale)
    # communication model (only favourable at scale: at the 1k fast-gate
    # size the band is a large fraction of the block — the 6.5k 8-way
    # slow test asserts the win)
    return mech_collective_bytes_per_mv(
        A.A.nent, solve.halo_entities, 3, ndev,
        nu=solve.spill_rows_unique)


@needs8
def test_halo_cg_on_lv_tangent():
    """Fast-gate size: 1,020-dof LV on a 2-device mesh (the band must
    fit the per-device block; 8-way needs the 6.5k mesh — slow test)."""
    _lv_halo_case((12, 3, 6), 2)


@needs8
@pytest.mark.slow
def test_halo_cg_on_lv_tangent_8dev():
    """8-way partition at 6,573 dofs — the sweep's level-1 mesh."""
    cb = _lv_halo_case((24, 6, 12), 8)
    # measured at this size: 23,016 B all-gather vs 8,460 B halo (2.7x);
    # the gap widens with refinement (block size grows h^-3, band h^-2)
    assert cb["all_gather_bytes"] > 2 * cb["halo_bytes"]


def test_partition_rejects_wide_band():
    """Entity bandwidth above nent/ndev must be rejected loudly."""
    A, _ = _random_spd_blockdia(nent=16, c=2, B=3, with_spill=False)
    with pytest.raises(ValueError, match="bandwidth"):
        blockdia_halo_partition(A, 8)


def test_partition_rejects_ell():
    """Gather-ELL tangents stay on the GSPMD path."""
    from thunderbolt_tpu.fem.sparsity import ELLMatrix
    A = ELLMatrix(jnp.zeros((8, 1), jnp.int32), jnp.ones((8, 1)))
    with pytest.raises(ValueError, match="BlockDIA"):
        blockdia_halo_partition(A, 8)
