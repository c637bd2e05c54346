"""Coordinate systems + microstructure. Parity with the reference's
``test_coordinate_systems.jl`` (ranges/monotonicity of transmural/
apicobasal/rotational) and ``test_microstructures.jl`` (SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

import thunderbolt_tpu as tb
from thunderbolt_tpu.models.coordinates import (
    CartesianCoordinateSystem, compute_lv_coordinate_system,
    compute_midmyocardial_section_coordinate_system, solve_laplace_nodal,
    compute_long_axis)
from thunderbolt_tpu.models.microstructure import (
    create_microstructure_model, OrthotropicMicrostructureModel,
    ODB25LTMicrostructureParameters)
from thunderbolt_tpu.models.coefficients import (
    setup_coefficient_cache, evaluate_coefficient, SpectralTensorCoefficient)
from thunderbolt_tpu.fem.dofs import DofHandler
from thunderbolt_tpu.fem.forms import make_form_batch
from thunderbolt_tpu.fem.constraints import Dirichlet


def test_laplace_nodal_linear_profile():
    """Laplace on a box with opposite-face BCs gives a linear profile."""
    mesh = tb.generate_mesh("hex8", (4, 3, 3))
    u = solve_laplace_nodal(mesh, [Dirichlet("u", "left", 0.0),
                                   Dirichlet("u", "right", 1.0)])
    assert np.allclose(u, mesh.nodes[:, 0], atol=1e-8)


@pytest.fixture(scope="module")
def ring_cs():
    mesh = tb.generate_ring_mesh(16, 4, 3, inner_radius=0.75,
                                 outer_radius=1.0, longitudinal_upper=0.3)
    return mesh, compute_midmyocardial_section_coordinate_system(mesh)


def test_ring_coordinates(ring_cs):
    mesh, cs = ring_cs
    r = np.linalg.norm(mesh.nodes[:, :2], axis=1)
    # the radial Laplace solution on an annulus is logarithmic, not linear
    t_exact = np.log(r / 0.75) / np.log(1.0 / 0.75)
    assert np.abs(cs.nodal["transmural"] - t_exact).max() < 0.02
    # monotone with radius
    order = np.argsort(r)
    assert (np.diff(cs.nodal["transmural"][order]) > -1e-6).all()
    assert cs.nodal["apicobasal"].min() == 0.0
    assert cs.nodal["apicobasal"].max() == 1.0
    rot = cs.nodal["rotational"]
    assert rot.min() >= -np.pi - 1e-9 and rot.max() <= np.pi + 1e-9


def test_lv_coordinate_system():
    mesh = tb.generate_ideal_lv_mesh(12, 3, 6)
    cs = compute_lv_coordinate_system(mesh)
    t = cs.nodal["transmural"]
    ab = cs.nodal["apicobasal"]
    endo = mesh.nodes_of_facetset("Endocardium")
    epi = mesh.nodes_of_facetset("Epicardium")
    base = mesh.nodes_of_facetset("Base")
    assert np.allclose(t[endo], 0.0, atol=1e-8)
    assert np.allclose(t[epi], 1.0, atol=1e-8)
    assert (t >= -1e-6).all() and (t <= 1 + 1e-6).all()
    assert np.allclose(ab[base], 1.0, atol=1e-8)
    apex = mesh.nodeset("Apex")
    assert np.allclose(ab[apex], 0.0, atol=1e-8)
    assert (ab >= -1e-6).all() and (ab <= 1 + 1e-6).all()
    axis, apex_pt, base_pt = compute_long_axis(mesh)
    assert axis @ np.array([0, 0, 1.0]) > 0.99  # long axis is z


def test_rule_based_fibers_orthonormal(ring_cs):
    mesh, cs = ring_cs
    micro = create_microstructure_model(
        cs, endo_helix_angle=np.deg2rad(60.0),
        epi_helix_angle=np.deg2rad(-60.0))
    dh = DofHandler(mesh).add_field("u").close()
    batch = make_form_batch(dh, dh.subdofs[0], dtype=jnp.float64)
    basis = np.asarray(evaluate_coefficient(
        setup_coefficient_cache(micro, batch), 0.0))
    f, s, n = basis[..., 0, :], basis[..., 1, :], basis[..., 2, :]
    # orthonormal frame
    assert np.allclose(np.linalg.norm(f, axis=-1), 1.0, atol=1e-10)
    assert np.allclose(np.linalg.norm(s, axis=-1), 1.0, atol=1e-10)
    assert np.allclose((f * s).sum(-1), 0.0, atol=1e-10)
    assert np.allclose((f * n).sum(-1), 0.0, atol=1e-10)
    assert np.allclose(np.cross(f, s), n, atol=1e-10)
    # helix: fiber z-component flips sign from endo to epi
    xq = np.asarray(batch.xq)
    gc = np.asarray(cs.at_qps(batch))
    endo_mask = gc[..., 0] < 0.1
    epi_mask = gc[..., 0] > 0.9
    assert f[..., 2][endo_mask].mean() > 0.5     # +60 deg at endo
    assert f[..., 2][epi_mask].mean() < -0.5     # -60 deg at epi
    # normal is radial-ish: points outward (the reference's convention —
    # sheetlets live in the wall-tangent plane, test_microstructures.jl:57)
    r_hat = xq[..., :2] / np.linalg.norm(xq[..., :2], axis=-1, keepdims=True)
    assert ((n[..., :2] * r_hat).sum(-1) > 0.85).all()


def test_spectral_conductivity_from_fibers(ring_cs):
    """SpectralTensorCoefficient(micro, eigvals) builds a valid SPD tensor
    field aligned with the fibers (ep01 tutorial tip block)."""
    mesh, cs = ring_cs
    micro = create_microstructure_model(cs)
    dh = DofHandler(mesh).add_field("u").close()
    batch = make_form_batch(dh, dh.subdofs[0], dtype=jnp.float64)
    D = np.asarray(evaluate_coefficient(setup_coefficient_cache(
        SpectralTensorCoefficient(micro, np.array([3e-4, 1e-4, 5e-5])),
        batch), 0.0))
    assert D.shape == (batch.ncells, batch.nqp, 3, 3)
    assert np.allclose(D, np.swapaxes(D, -1, -2), atol=1e-18)
    eig = np.linalg.eigvalsh(D.reshape(-1, 3, 3))
    assert np.allclose(np.sort(eig, axis=-1),
                       np.sort([3e-4, 1e-4, 5e-5]), atol=1e-12)


def test_cartesian_cs_in_monodomain():
    """cell_coordinates plumbed through to the pointwise function."""
    mesh = tb.generate_mesh("quad4", (4, 4))
    model = tb.MonodomainModel(
        chi=1.0, Cm=1.0, kappa=1e-4, stim=tb.NoStimulationProtocol(),
        ion=tb.FHNModel(), cell_coordinates=CartesianCoordinateSystem())
    ode = tb.semidiscretize(tb.ReactionDiffusionSplit(model),
                            tb.FiniteElementDiscretization({"phi_m": 1}),
                            mesh)
    cells = ode.functions[1]
    assert cells.x.shape == (25, 2)


def test_relative_rotation():
    a = np.array([[1.0, 0, 0], [1, 0, 0]])
    b = np.array([[0.0, 1, 0], [np.cos(-0.3), np.sin(-0.3), 0]])
    ang = tb.compute_relative_rotation(a, b, [0, 0, 1.0])
    assert np.allclose(ang, [np.pi / 2, -0.3], atol=1e-12)


def test_fit_basal_plane():
    """Basal plane of the ideal LV: z = base height, normal along +long
    axis (parity: fit_basal_plane, src/mesh/long_axis.jl)."""
    import thunderbolt_tpu as tb
    mesh = tb.generate_ideal_lv_mesh(8, 2, 6)
    c, n = tb.fit_basal_plane(mesh)
    axis, apex, base_c = tb.compute_long_axis(mesh)
    assert abs(float(n @ axis)) > 0.999
    pts = mesh.nodes[mesh.nodes_of_facetset("Base")]
    assert np.abs((pts - c) @ n).max() < 1e-8  # truly planar base
    # fallback path (no "Base" facetset): a box still yields a unit normal
    box = tb.generate_mesh("hex8", (3, 3, 3))
    c2, n2 = tb.fit_basal_plane(box)
    assert np.isclose(np.linalg.norm(n2), 1.0)


def test_biv_coordinate_system_roundtrip(tmp_path):
    """BiV coordinates: construct from nodal data (the Cobiveco-import
    workflow — the reference also only ships the container + VTK readback,
    ``read_vtk_cobivec``, ``io.jl:264``), write/read through VTU, and use
    as a CoordinateSystemCoefficient."""
    import thunderbolt_tpu as tb
    from thunderbolt_tpu.io.vtk import write_vtu, read_vtu
    from thunderbolt_tpu.fem.dofs import DofHandler
    from thunderbolt_tpu.fem.forms import make_form_batch

    mesh = tb.generate_mesh("hex8", (4, 3, 3))
    n = mesh.nnodes
    x = mesh.nodes
    fields = {
        "transmural": x[:, 0],
        "apicobasal": x[:, 2],
        "rotational": np.arctan2(x[:, 1] - 0.5, x[:, 0] - 0.5)
        / (2 * np.pi) + 0.5,
        "transventricular": (x[:, 1] > 0.5).astype(float),
    }
    p = str(tmp_path / "cobiveco.vtu")
    write_vtu(p, mesh, point_data=fields)
    nodes_b, blocks_b, pdata = read_vtu(p)
    cs = tb.BiVCoordinateSystem(
        mesh, {k: np.asarray(pdata[k]) for k in fields})
    for k, v in fields.items():
        np.testing.assert_allclose(cs.nodal[k], v, atol=1e-6)

    # evaluate at quadrature points through the coefficient protocol
    dh = DofHandler(mesh).add_field("u", order=1).close()
    batch = make_form_batch(dh, dh.subdofs[0], dtype=jnp.float64)
    coeff = tb.CoordinateSystemCoefficient(cs)
    cache = tb.setup_coefficient_cache(coeff, batch)
    vals = tb.evaluate_coefficient(cache, 0.0)
    assert vals.shape[:2] == (batch.ncells, batch.nqp)
    assert vals.shape[-1] == 4
    # transmural at qps must stay within the nodal range
    assert float(vals[..., 0].min()) >= -1e-9
    assert float(vals[..., 0].max()) <= 1.0 + 1e-9


def test_biv_coordinate_builder():
    """In-package Cobiveco-style BiV builder (beyond the reference's
    import-only model): split the ideal LV's endocardium by rotational
    angle into two pseudo-ventricle surfaces and build all four fields."""
    import thunderbolt_tpu as tb
    mesh = tb.generate_ideal_lv_mesh(12, 3, 6)
    # label endocardial facets by the angle of their facet centroid
    endo = mesh.facetset("Endocardium")
    lv_f, rv_f = [], []
    for gc, lf in endo:
        bi, lc = mesh.block_of_cell(int(gc))
        b = mesh.blocks[bi]
        from thunderbolt_tpu.mesh.mesh import facet_nodes
        fn = facet_nodes(b.element, int(lf), b.connectivity[lc])
        c = mesh.nodes[fn].mean(axis=0)
        (lv_f if np.arctan2(c[1], c[0]) >= 0.0 else rv_f).append((gc, lf))
    mesh.facetsets["EndocardiumLV"] = np.asarray(lv_f, np.int64)
    mesh.facetsets["EndocardiumRV"] = np.asarray(rv_f, np.int64)
    mesh.nodesets["EndocardiumLV"] = mesh.nodes_of_facetset("EndocardiumLV")
    mesh.nodesets["EndocardiumRV"] = mesh.nodes_of_facetset("EndocardiumRV")

    cs = tb.compute_biv_coordinate_system(mesh)
    tm = cs.nodal["transmural"]
    tv = cs.nodal["transventricular"]
    ab = cs.nodal["apicobasal"]
    for f in (tm, tv, ab):
        assert np.isfinite(f).all()
        # FEM Laplace on non-obtuse-violating hexes can overshoot [0,1]
        # slightly (no discrete maximum principle); bound the wiggle
        assert f.min() >= -0.02 and f.max() <= 1.02
    # boundary values honored
    epi = mesh.nodes_of_facetset("Epicardium")
    lv = mesh.nodeset("EndocardiumLV")
    rv = mesh.nodeset("EndocardiumRV")
    interface = np.intersect1d(lv, rv)
    lv_only = np.setdiff1d(lv, interface)
    rv_only = np.setdiff1d(rv, interface)
    assert np.allclose(tm[np.concatenate([lv_only, rv_only])], 0.0,
                       atol=1e-6)
    assert np.allclose(tm[np.setdiff1d(epi, np.concatenate([lv, rv]))],
                       1.0, atol=1e-6)
    assert np.allclose(tv[lv_only], 0.0, atol=1e-6)
    assert np.allclose(tv[rv_only], 1.0, atol=1e-6)
    base = mesh.nodes_of_facetset("Base")
    assert np.allclose(ab[base], 1.0, atol=1e-6)
    # the 4-field stack evaluates as a coefficient (pipeline contract)
    vals = cs.at_dofs(mesh.nodes[:5])
    assert vals.shape == (5, 4)


def test_compute_lv_axes():
    """LVAxes frame on the ideal LV (``heart_axes.jl:139-185``): long
    axis is +z (apex at the bottom), the frame is right-handed and
    orthonormal, apex/base pin the axis line."""
    mesh = tb.generate_ideal_lv_mesh(8, 2, 4)
    ax = tb.compute_lv_axes(mesh)
    np.testing.assert_allclose(ax.longitudinal, [0, 0, 1], atol=1e-6)
    assert ax.apex[2] < ax.base_center[2]
    np.testing.assert_allclose(ax.longitudinal @ ax.lateral, 0, atol=1e-12)
    np.testing.assert_allclose(
        np.cross(ax.longitudinal, ax.lateral), ax.anteroposterior,
        atol=1e-12)
    for v in (ax.longitudinal, ax.lateral, ax.anteroposterior):
        np.testing.assert_allclose(np.linalg.norm(v), 1.0, rtol=1e-12)


def test_compute_lv_axes_from_plane():
    """Plane form (``heart_axes.jl:187-214``) agrees with the facetset
    form on the ideal LV."""
    mesh = tb.generate_ideal_lv_mesh(8, 2, 4)
    ax = tb.compute_lv_axes(mesh)
    ax2 = tb.compute_lv_axes_from_plane(mesh, ax.base_center,
                                        ax.longitudinal)
    np.testing.assert_allclose(ax2.longitudinal, ax.longitudinal, atol=1e-6)
    np.testing.assert_allclose(ax2.apex, ax.apex, atol=1e-6)
    # base_center from the 5% band sits near the true basal plane
    assert abs(ax2.base_center[2] - ax.base_center[2]) < 0.1


def test_lv_axes_collinear_lateral_raises():
    with pytest.raises(ValueError):
        tb.LVAxes.from_directions([0, 0, 1], [0, 0, 2], [0, 0, -1],
                                  [0, 0, 0.2])


def test_rotational_coordinate_seam_safe_at_qps():
    """Cells straddling theta=+-pi must interpolate the rotational
    coordinate on the correct branch — the reference guarantees this with
    per-cell DiscontinuousLagrange rotational dofs
    (coordinate_systems.jl:903); we unwrap per cell in at_qps."""
    import jax.numpy as jnp
    from thunderbolt_tpu.fem.dofs import DofHandler
    from thunderbolt_tpu.fem.forms import make_form_batch
    from thunderbolt_tpu.models.coordinates import (
        compute_midmyocardial_section_coordinate_system)
    ring = tb.generate_ring_mesh(8, 3, 3)
    cs = compute_midmyocardial_section_coordinate_system(ring)
    dh = DofHandler(ring).add_field("u", 1).close()
    sub = list(dh.subdata("u"))[0]
    fb = make_form_batch(dh, sub, dtype=jnp.float64)
    rot = np.asarray(cs.at_qps(fb))[..., 2]
    xq = np.einsum("qb,cbs->cqs", np.asarray(fb.Ngeo), np.asarray(fb.Xe))
    exact = np.arctan2(xq[..., 1], xq[..., 0])
    err = np.abs(np.angle(np.exp(1j * (rot - exact))))
    assert err.max() < 0.06      # interpolation error only, no 2pi branch
    assert np.all(np.abs(rot) <= np.pi + 1e-12)


def test_zero_angle_frame_matches_reference_convention(ring_cs):
    """All angles zero on a ring: fiber circumferential, sheetlets along
    the (negative) apicobasal axis, normal radially outward — the exact
    frame the reference pins (test_microstructures.jl:43-71)."""
    mesh, cs = ring_cs
    micro = create_microstructure_model(
        cs, endo_helix_angle=0.0, epi_helix_angle=0.0,
        endo_transversal_angle=0.0, epi_transversal_angle=0.0,
        endo_sheetlet_angle=0.0, epi_sheetlet_angle=0.0)
    dh = DofHandler(mesh).add_field("u").close()
    batch = make_form_batch(dh, dh.subdofs[0], dtype=jnp.float64)
    basis = np.asarray(evaluate_coefficient(
        setup_coefficient_cache(micro, batch), 0.0))
    f, s, n = basis[..., 0, :], basis[..., 1, :], basis[..., 2, :]
    xq = np.asarray(batch.xq)
    r_hat3 = np.concatenate(
        [xq[..., :2] / np.linalg.norm(xq[..., :2], axis=-1, keepdims=True),
         np.zeros(xq.shape[:-1] + (1,))], axis=-1)
    # sheet along +-z (a line: sign is not physical for quadratic invariants)
    assert np.abs(np.abs(s[..., 2]) - 1.0).max() < 0.05
    # normal radial: |n . r_hat| ~ 1
    assert (np.abs((n * r_hat3).sum(-1)) > 0.95).all()
    # fiber circumferential: orthogonal to both z and r
    assert np.abs(f[..., 2]).max() < 0.05
    assert np.abs((f * r_hat3).sum(-1)).max() < 0.3   # coarse ring facets


def test_fibers_correct_on_off_center_geometry():
    """Gradient-based local axes make the fiber rule geometry-agnostic: a
    ring translated far from the origin gets the SAME frame field as the
    centered one (the old radial-from-origin proxy would be wildly wrong).
    This is the reference's ``setup_coordinate_axes_cache`` capability
    (coordinate_systems.jl:13-35) — required for imported patient meshes."""
    from thunderbolt_tpu.models.coordinates import (
        compute_midmyocardial_section_coordinate_system)

    def frame(shift):
        mesh = tb.generate_ring_mesh(12, 3, 3)
        mesh.nodes[:] = mesh.nodes + np.asarray(shift)
        # coordinates rebuilt on the shifted mesh (the Laplace transmural
        # solve and the z-range apicobasal are translation-covariant)
        cs = compute_midmyocardial_section_coordinate_system(mesh)
        dh = DofHandler(mesh).add_field("u").close()
        batch = make_form_batch(dh, dh.subdofs[0], dtype=jnp.float64)
        micro = create_microstructure_model(
            cs, endo_helix_angle=np.deg2rad(60.0),
            epi_helix_angle=np.deg2rad(-60.0))
        return np.asarray(evaluate_coefficient(
            setup_coefficient_cache(micro, batch), 0.0))

    b0 = frame((0.0, 0.0, 0.0))
    b1 = frame((25.0, -40.0, 7.0))
    assert np.abs(b0 - b1).max() < 1e-6, np.abs(b0 - b1).max()


def test_transversal_angle_paths_agree():
    """With a nonzero transversal angle, the gradient-axes path and the
    idealized radial-proxy path apply the SAME rotation (Rodrigues about
    the apicobasal axis) — on a centered ring the two frames coincide up
    to the discretization error of grad(transmural)."""
    from thunderbolt_tpu.models.coordinates import (
        compute_midmyocardial_section_coordinate_system)
    from thunderbolt_tpu.models.microstructure import (
        _rule_based_frame, ODB25LTMicrostructureParameters)
    ring = tb.generate_ring_mesh(32, 6, 3)
    cs = compute_midmyocardial_section_coordinate_system(ring)
    dh = DofHandler(ring).add_field("u").close()
    batch = make_form_batch(dh, dh.subdofs[0], dtype=jnp.float64)
    params = ODB25LTMicrostructureParameters(
        endo_helix_angle=np.deg2rad(50.0), epi_helix_angle=np.deg2rad(-40.0),
        endo_transversal_angle=0.3, epi_transversal_angle=0.1)
    micro = tb.create_microstructure_model(cs, params)
    basis_axes = np.asarray(evaluate_coefficient(
        setup_coefficient_cache(micro, batch), 0.0)).reshape(-1, 3, 3)
    gc = np.asarray(cs.at_qps(batch))
    xq = np.asarray(batch.xq).reshape(-1, 3)
    f_p, s_p, n_p = _rule_based_frame(
        xq, gc[..., 0].reshape(-1), np.array([0.0, 0.0, 1.0]), params)
    basis_proxy = np.stack([f_p, s_p, n_p], axis=-2)
    # measured first-order gap: 0.114/0.057/0.028 at 16/32/64 segments
    assert np.abs(basis_axes - basis_proxy).max() < 0.08
