"""Quadrature rules per reference element (host side, numpy).

TPU-native analog of the reference's ``QuadratureRuleCollection``
(``src/ferrite-addons/collections.jl:114-150``): a rule is just static
``(points[nqp, dim], weights[nqp])`` tables baked into jitted kernels.

Default degree follows the reference's semidiscretize policy of picking a
rule exact for the assembled forms (``src/discretization/fem.jl:52-79``):
we default to degree ``2*order`` (exact mass matrix for affine elements).
"""

from __future__ import annotations

import numpy as np
from dataclasses import dataclass

from thunderbolt_tpu.mesh.elements import get_element


@dataclass(frozen=True)
class QuadratureRule:
    points: np.ndarray   # [nqp, dim] float64
    weights: np.ndarray  # [nqp] float64

    @property
    def nqp(self):
        return self.weights.shape[0]


def _gauss_1d(n):
    x, w = np.polynomial.legendre.leggauss(n)
    return x, w


def _tensor_rule(n, dim):
    x, w = _gauss_1d(n)
    grids = np.meshgrid(*([x] * dim), indexing="ij")
    pts = np.stack([g.ravel() for g in grids], axis=-1)
    ws = np.ones(pts.shape[0])
    wgrids = np.meshgrid(*([w] * dim), indexing="ij")
    for g in wgrids:
        ws = ws * g.ravel()
    return QuadratureRule(pts, ws)


# --- simplex rules (standard tables; weights sum to reference volume) ------

def _tri_rule(degree):
    if degree <= 1:
        pts = np.array([[1 / 3, 1 / 3]])
        ws = np.array([0.5])
    elif degree == 2:
        pts = np.array([[1 / 6, 1 / 6], [2 / 3, 1 / 6], [1 / 6, 2 / 3]])
        ws = np.full(3, 1 / 6)
    elif degree == 3:
        pts = np.array([
            [1 / 3, 1 / 3], [0.2, 0.2], [0.6, 0.2], [0.2, 0.6],
        ])
        ws = np.array([-27 / 96, 25 / 96, 25 / 96, 25 / 96])
    elif degree == 4:
        a1, b1 = 0.445948490915965, 0.111690794839005
        a2, b2 = 0.091576213509771, 0.054975871827661
        pts = np.array([
            [a1, a1], [1 - 2 * a1, a1], [a1, 1 - 2 * a1],
            [a2, a2], [1 - 2 * a2, a2], [a2, 1 - 2 * a2],
        ])
        ws = np.array([b1, b1, b1, b2, b2, b2])
    else:  # degree 5: 7-point rule
        a = 0.470142064105115
        b = 0.101286507323456
        pts = np.array([
            [1 / 3, 1 / 3],
            [a, a], [1 - 2 * a, a], [a, 1 - 2 * a],
            [b, b], [1 - 2 * b, b], [b, 1 - 2 * b],
        ])
        wa = 0.066197076394253
        wb = 0.062969590272414
        ws = np.array([9 / 80, wa, wa, wa, wb, wb, wb])
    return QuadratureRule(pts, ws)


def _tet_rule(degree):
    if degree <= 1:
        pts = np.array([[0.25, 0.25, 0.25]])
        ws = np.array([1 / 6])
    elif degree == 2:
        a = 0.585410196624969
        b = 0.138196601125011
        pts = np.array([[b, b, b], [a, b, b], [b, a, b], [b, b, a]])
        ws = np.full(4, 1 / 24)
    elif degree == 3:
        pts = np.array([
            [0.25, 0.25, 0.25],
            [1 / 6, 1 / 6, 1 / 6], [0.5, 1 / 6, 1 / 6],
            [1 / 6, 0.5, 1 / 6], [1 / 6, 1 / 6, 0.5],
        ])
        ws = np.array([-4 / 30, 9 / 120, 9 / 120, 9 / 120, 9 / 120])
    else:  # degree 4/5: Keast 14-point rule (degree 5)
        # points: 4 + 4 + 6 symmetric orbits
        a1 = 0.0673422422100983
        b1 = 0.3108859192633005
        a2 = 0.7217942490673264
        b2 = 0.0927352503108912
        c = 0.4544962958743506
        d = 0.0455037041256494
        w1 = 0.1126879257180162 / 6
        w2 = 0.0734930431163619 / 6
        w3 = 0.0425460207770812 / 6
        orb1 = np.array([[b1, b1, b1], [a1, b1, b1], [b1, a1, b1], [b1, b1, a1]])
        orb2 = np.array([[b2, b2, b2], [a2, b2, b2], [b2, a2, b2], [b2, b2, a2]])
        orb3 = np.array([
            [c, c, d], [c, d, c], [d, c, c],
            [d, d, c], [d, c, d], [c, d, d],
        ])
        pts = np.vstack([orb1, orb2, orb3])
        ws = np.concatenate([np.full(4, w1), np.full(4, w2), np.full(6, w3)])
    return QuadratureRule(pts, ws)


def quadrature_rule(celltype: str, degree: int) -> QuadratureRule:
    """Gauss rule on the reference element of `celltype`, exact to `degree`."""
    el = get_element(celltype)
    base = celltype[:3]
    if base in ("lin", "qua", "hex"):
        n1 = max(1, (degree + 2) // 2)  # ceil((degree+1)/2)
        return _tensor_rule(n1, el.dim)
    if base == "tri":
        return _tri_rule(min(degree, 5))
    if base == "tet":
        return _tet_rule(min(degree, 5))
    if base == "wed":
        # prism = tri(x, y) x line(z on [0, 1])
        tr = _tri_rule(min(degree, 5))
        zx, zw = _gauss_1d(max(1, (degree + 2) // 2))
        zx, zw = (zx + 1.0) / 2.0, zw / 2.0
        pts = np.concatenate(
            [np.repeat(tr.points, zx.size, axis=0),
             np.tile(zx, tr.points.shape[0])[:, None]], axis=1)
        ws = (tr.weights[:, None] * zw[None, :]).ravel()
        return QuadratureRule(pts, ws)
    if base == "pyr":
        # conical product: cube [-1,1]^3 -> pyramid via
        # zeta=(1+c)/2, xi=a(1-zeta), eta=b(1-zeta); Jacobian (1-zeta)^2/2.
        # One extra Gauss point in zeta absorbs the (1-zeta)^2 factor.
        n1 = max(1, (degree + 2) // 2)
        ax, aw = _gauss_1d(n1)
        cx, cw = _gauss_1d(n1 + 1)
        zeta = (1.0 + cx) / 2.0
        pts, ws = [], []
        for a, wa in zip(ax, aw):
            for b, wb in zip(ax, aw):
                for z, wc in zip(zeta, cw):
                    u = 1.0 - z
                    pts.append([a * u, b * u, z])
                    ws.append(wa * wb * wc * u * u / 2.0)
        return QuadratureRule(np.asarray(pts), np.asarray(ws))
    raise KeyError(celltype)


def default_degree(order: int) -> int:
    return 2 * order


def nodal_rule(celltype: str) -> QuadratureRule:
    """Quadrature with points at the element nodes (lumping / nodal data).

    Analog of the reference's ``NodalQuadratureRuleCollection``
    (``collections.jl:114``). Weights are row sums of the exact mass matrix
    only for P1; here we use equal weights normalized to the reference
    volume, sufficient for nodal *evaluation* use-cases.
    """
    el = get_element(celltype)
    ref_vol = {
        "lin": 2.0, "qua": 4.0, "hex": 8.0,
        "tri": 0.5, "tet": 1.0 / 6.0, "wed": 0.5, "pyr": 4.0 / 3.0,
    }[celltype[:3]]
    n = el.nnodes
    return QuadratureRule(el.ref_nodes.copy(), np.full(n, ref_vol / n))
