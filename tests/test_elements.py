"""Reference element sanity: partition of unity, interpolation exactness,
quadrature exactness. Parity with the reference's interpolation collection
tests (SURVEY.md §4 test strategy)."""

import numpy as np
import pytest

from thunderbolt_tpu.mesh.elements import get_element, element_names
from thunderbolt_tpu.mesh.quadrature import quadrature_rule, default_degree

ALL = element_names()


def _random_ref_points(el, n=7, seed=0):
    rng = np.random.default_rng(seed)
    if el.name[:3] in ("tri", "tet"):
        # random barycentric
        lam = rng.dirichlet(np.ones(el.dim + 1), size=n)
        return lam[:, 1:]
    return rng.uniform(-1, 1, size=(n, el.dim))


@pytest.mark.parametrize("name", ALL)
def test_partition_of_unity(name):
    el = get_element(name)
    xi = _random_ref_points(el)
    N = el.shape(xi)
    assert np.allclose(N.sum(axis=-1), 1.0, atol=1e-12)
    dN = el.grad(xi)
    assert np.allclose(dN.sum(axis=-2), 0.0, atol=1e-12)


@pytest.mark.parametrize("name", ALL)
def test_nodal_kronecker(name):
    el = get_element(name)
    N = el.shape(el.ref_nodes)
    assert np.allclose(N, np.eye(el.nnodes), atol=1e-12)


@pytest.mark.parametrize("name", ALL)
def test_interpolation_exactness(name):
    """Order-p element reproduces polynomials of degree p exactly."""
    el = get_element(name)
    rng = np.random.default_rng(1)
    coef = rng.normal(size=(el.dim + 1,))

    def poly(x):
        val = coef[0] + x @ coef[1:]
        if el.order == 2:
            # full quadratic incl. one cross term (in every P2/Q2 space)
            val = val + (x ** 2) @ coef[1:] + 0.3 * x[..., 0] * x[..., -1]
        return val

    xi = _random_ref_points(el)
    nodal = poly(el.ref_nodes)
    interp = el.shape(xi) @ nodal
    assert np.allclose(interp, poly(xi), atol=1e-10)


@pytest.mark.parametrize("name", ALL)
def test_gradient_matches_fd(name):
    el = get_element(name)
    xi = _random_ref_points(el) * 0.4  # stay interior
    h = 1e-6
    dN = el.grad(xi)
    for d in range(el.dim):
        e = np.zeros(el.dim)
        e[d] = h
        fd = (el.shape(xi + e) - el.shape(xi - e)) / (2 * h)
        assert np.allclose(dN[..., d], fd, atol=1e-6)


@pytest.mark.parametrize("name", ALL)
def test_quadrature_volume_and_degree(name):
    el = get_element(name)
    ref_vol = {"lin": 2.0, "qua": 4.0, "hex": 8.0, "tri": 0.5,
               "tet": 1.0 / 6.0, "wed": 0.5, "pyr": 4.0 / 3.0}[name[:3]]
    for deg in (1, 2, 3, 4):
        qr = quadrature_rule(name, deg)
        assert np.isclose(qr.weights.sum(), ref_vol, atol=1e-12)
        # exactness on monomials of total degree <= deg
        if name[:3] in ("qua", "hex", "lin"):
            # separable: check x^deg integrates exactly per dim
            exact = 2.0 / (deg + 1) if deg % 2 == 0 else 0.0
            val = (qr.weights * qr.points[:, 0] ** deg).sum()
            assert np.isclose(val, exact * ref_vol / 2.0, atol=1e-12)


def test_tri_tet_quadrature_exactness():
    # integrate x^a y^b over unit triangle: a! b! / (a+b+2)!
    from math import factorial

    for deg in (2, 3, 4, 5):
        qr = quadrature_rule("tri3", deg)
        for a in range(deg + 1):
            for b in range(deg + 1 - a):
                exact = factorial(a) * factorial(b) / factorial(a + b + 2)
                val = (qr.weights * qr.points[:, 0] ** a
                       * qr.points[:, 1] ** b).sum()
                assert np.isclose(val, exact, atol=1e-10), (deg, a, b)
    for deg in (2, 3, 5):
        qr = quadrature_rule("tet4", deg)
        for a in range(deg + 1):
            for b in range(deg + 1 - a):
                for c in range(deg + 1 - a - b):
                    exact = (factorial(a) * factorial(b) * factorial(c)
                             / factorial(a + b + c + 3))
                    val = (qr.weights * qr.points[:, 0] ** a
                           * qr.points[:, 1] ** b * qr.points[:, 2] ** c).sum()
                    assert np.isclose(val, exact, atol=1e-9), (deg, a, b, c)


def test_quadratic_geometry_facet_areas_exact():
    """Facet batches on QUADRATIC geometry (hex27/tet10/wedge18 from
    straight-midpoint elevation of unit-box meshes) must integrate every
    boundary face of the box to its exact area. Regression: the geometry
    nodes used to be gathered in cell-edge order while the shape tables
    are tabulated in the facet element's own ordering — garbling some
    facets (unit-cube hex27 'left' integrated to 0.887)."""
    import jax
    import jax.numpy as jnp
    import thunderbolt_tpu as tb
    from thunderbolt_tpu.fem.dofs import DofHandler
    from thunderbolt_tpu.fem.facets import make_facet_batch

    for celltype in ("hex8", "tet4", "wedge6"):
        mesh = tb.elevate_to_quadratic(tb.generate_mesh(celltype, (1, 1, 1)))
        dh = DofHandler(mesh).add_field("d", order=2, ncomponents=3).close()
        for name in ("left", "right", "top", "bottom", "front", "back"):
            if name not in mesh.facetsets:
                continue
            try:
                fb = make_facet_batch(dh, "d", name, dtype=jnp.float64)
            except NotImplementedError:
                continue          # mixed tri+quad facetsets (wedge boxes)
            nda = jax.vmap(lambda X: fb.normal_da(X))(fb.Xf)
            da = np.linalg.norm(np.asarray(nda), axis=-1)
            area = float((da * np.asarray(fb.wq)[None]).sum())
            assert abs(area - 1.0) < 1e-12, (celltype, name, area)
