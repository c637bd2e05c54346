"""Cardiac microstructure: fiber / sheet / normal direction fields.

Parity: ``src/modeling/microstructure.jl`` —
``OrthotropicMicrostructureModel`` (``:140``),
``TransverselyIsotropicMicrostructureModel``,
``AnisotropicPlanarMicrostructureModel`` (``:28-156``),
``ODB25LTMicrostructureParameters`` + ``create_microstructure_model``
(helix-angle rule, ``:192,280``) — the rule-based fiber architecture of
Ogiermann/Dual-Balzani-style idealized ventricles: the fiber direction is
the circumferential direction rotated toward the long axis by a helix angle
interpolated transmurally between endo and epi values; the sheet direction
is (approximately) transmural; normal completes the frame.

TPU-native: a microstructure model is a Coefficient producing the
orthonormal eigenbasis [..., 3, 3] at quadrature points, materialized at
setup; ``SpectralTensorCoefficient`` then folds it with eigenvalues into
conductivity/stiffness tensors.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np
import jax.numpy as jnp

from thunderbolt_tpu.models.coefficients import Coefficient, _EvalCache
from thunderbolt_tpu.models.coordinates import (
    NodalCoordinateSystem, compute_long_axis)


from thunderbolt_tpu.models.coordinates import _unit as _normalize


@dataclass(frozen=True)
class OrthotropicMicrostructureModel(Coefficient):
    """Full (f, s, n) frame; each direction is a coefficient-like object
    yielding [..., 3] (``microstructure.jl:140``). Evaluates to the stacked
    eigenbasis [..., 3, 3] (rows f, s, n)."""
    fiber: Any
    sheet: Any
    normal: Any

    def setup(self, batch):
        from thunderbolt_tpu.models.coefficients import (
            setup_coefficient_cache, evaluate_coefficient)
        f = evaluate_coefficient(setup_coefficient_cache(self.fiber, batch), 0.0)
        s = evaluate_coefficient(setup_coefficient_cache(self.sheet, batch), 0.0)
        n = evaluate_coefficient(setup_coefficient_cache(self.normal, batch), 0.0)
        basis = jnp.stack(jnp.broadcast_arrays(f, s, n), axis=-2)
        return _EvalCache("data" if basis.ndim > 2 else "const", basis)


@dataclass(frozen=True)
class TransverselyIsotropicMicrostructureModel(Coefficient):
    """Only the fiber direction (``microstructure.jl:28``); evaluates to
    [..., 1, 3]."""
    fiber: Any

    def setup(self, batch):
        from thunderbolt_tpu.models.coefficients import (
            setup_coefficient_cache, evaluate_coefficient)
        f = evaluate_coefficient(setup_coefficient_cache(self.fiber, batch), 0.0)
        basis = f[..., None, :]
        return _EvalCache("data" if basis.ndim > 2 else "const", basis)


@dataclass(frozen=True)
class AnisotropicPlanarMicrostructureModel(Coefficient):
    """(f, s) without normal (``microstructure.jl:80``); [..., 2, 3]."""
    fiber: Any
    sheet: Any

    def setup(self, batch):
        from thunderbolt_tpu.models.coefficients import (
            setup_coefficient_cache, evaluate_coefficient)
        f = evaluate_coefficient(setup_coefficient_cache(self.fiber, batch), 0.0)
        s = evaluate_coefficient(setup_coefficient_cache(self.sheet, batch), 0.0)
        basis = jnp.stack(jnp.broadcast_arrays(f, s), axis=-2)
        return _EvalCache("data" if basis.ndim > 2 else "const", basis)


@dataclass(frozen=True)
class ODB25LTMicrostructureParameters:
    """Helix-angle rule parameters (``microstructure.jl:192``): the
    (alpha, beta, gamma) = (helix, transversal, sheetlet) angle pairs,
    linearly interpolated endo -> epi in the transmural coordinate."""
    endo_helix_angle: float = np.deg2rad(60.0)
    epi_helix_angle: float = np.deg2rad(-60.0)
    endo_transversal_angle: float = 0.0
    epi_transversal_angle: float = 0.0
    endo_sheetlet_angle: float = 0.0
    epi_sheetlet_angle: float = 0.0
    make_endo_epi_arcs: bool = False
    #: back-compat: a single transmurally constant gamma; when given it
    #: overrides both endo/epi sheetlet angles
    sheetlet_pseudo_angle: float = None

    def __post_init__(self):
        if self.sheetlet_pseudo_angle is not None:
            object.__setattr__(self, "endo_sheetlet_angle",
                               float(self.sheetlet_pseudo_angle))
            object.__setattr__(self, "epi_sheetlet_angle",
                               float(self.sheetlet_pseudo_angle))
        else:
            object.__setattr__(self, "sheetlet_pseudo_angle",
                               self.endo_sheetlet_angle)


def _rule_based_frame(x, transmural, axis, params):
    """Compute (f, s, n) at points x given transmural coordinate.

    Frame construction matches ``compute_local_microstructure``
    (``microstructure.jl:208-244``): with radial r (transmural proxy),
    circumferential c = axis x r,

    * fiber  f = c rotated by the helix angle alpha(t) about r (toward the
      long axis), then by -beta(t) about the axis (transversal angle);
    * sheet  s = the wall-tangent vector at alpha + 90 deg (so s spans the
      apicobasal/circumferential plane), orthogonalized against f, then
      rotated by -gamma(t) about f (sheetlet angle);
    * normal n = f x s — RADIAL at zero angles (the reference's
      ``test_microstructures.jl:57-71`` convention: sheetlets apicobasal,
      normal pointing transmurally).
    """
    t = np.clip(transmural, 0.0, 1.0)
    axis = np.asarray(axis, dtype=np.float64)
    rel = x - (x @ axis)[:, None] * axis[None]
    r = _normalize(rel)                       # radial (short-axis plane)
    c = _normalize(np.cross(axis[None], r))   # circumferential
    alpha = (params.endo_helix_angle
             + (params.epi_helix_angle - params.endo_helix_angle) * t)
    beta = (params.endo_transversal_angle
            + (params.epi_transversal_angle
               - params.endo_transversal_angle) * t)
    gamma = (params.endo_sheetlet_angle
             + (params.epi_sheetlet_angle
                - params.endo_sheetlet_angle) * t)
    f = (np.cos(alpha)[:, None] * c
         + np.sin(alpha)[:, None] * axis[None])
    if np.any(beta != 0.0):
        # SAME transversal rotation as the gradient-axes path: Rodrigues
        # about the apicobasal axis (ref rotate_around(f, apicobasal, -b))
        f = _normalize(_rodrigues(f, np.broadcast_to(axis, f.shape), -beta))
    # sheet: alpha + 90 deg in the wall-tangent (c, axis) plane
    s = (-np.sin(alpha)[:, None] * c
         + np.cos(alpha)[:, None] * axis[None])
    s = _normalize(s - (np.sum(s * f, axis=-1, keepdims=True)) * f)
    n = np.cross(f, s)
    if np.any(gamma != 0.0):
        s, n = (np.cos(gamma)[:, None] * s - np.sin(gamma)[:, None] * n,
                np.cos(gamma)[:, None] * n + np.sin(gamma)[:, None] * s)
    return f, s, n


def _rodrigues(v, k, theta):
    """Rotate v about unit axis k by theta (vectorized [..., 3])."""
    ct = np.cos(theta)[..., None]
    st = np.sin(theta)[..., None]
    kxv = np.cross(k, v)
    kdv = np.sum(k * v, axis=-1, keepdims=True)
    return v * ct + kxv * st + k * kdv * (1.0 - ct)


def _rule_based_frame_from_axes(tcoord, t_hat, ab_hat, params):
    """(f, s, n) from gradient-based local axes (patient-mesh-correct path;
    parity: ``compute_local_microstructure``, ``microstructure.jl:208-244``
    on ``LocalCoordinateAxes``). Same rotation recipe as the idealized
    proxy: helix alpha about the transmural axis, transversal -beta about
    the apicobasal axis, sheet at alpha + 90 deg gamma-rotated about f."""
    t = np.clip(tcoord, 0.0, 1.0)
    alpha = (params.endo_helix_angle
             + (params.epi_helix_angle - params.endo_helix_angle) * t)
    beta = (params.endo_transversal_angle
            + (params.epi_transversal_angle
               - params.endo_transversal_angle) * t)
    gamma = (params.endo_sheetlet_angle
             + (params.epi_sheetlet_angle
                - params.endo_sheetlet_angle) * t)
    # circumferential with the OUTWARD-normal handedness (ab x t): the
    # zero-angle frame is then f = c, s = apicobasal, n = +transmural —
    # the same line fields as the reference's (its c = t x ab merely
    # flips the f and s signs, which quadratic invariants cannot see)
    c_hat = np.cross(ab_hat, t_hat)
    f = np.cos(alpha)[..., None] * c_hat + np.sin(alpha)[..., None] * ab_hat
    if np.any(beta != 0.0):
        f = _normalize(_rodrigues(f, ab_hat, -beta))
    s = -np.sin(alpha)[..., None] * c_hat + np.cos(alpha)[..., None] * ab_hat
    s = _normalize(s - np.sum(s * f, axis=-1, keepdims=True) * f)
    n = np.cross(f, s)
    if np.any(gamma != 0.0):
        s, n = (np.cos(gamma)[..., None] * s - np.sin(gamma)[..., None] * n,
                np.cos(gamma)[..., None] * n + np.sin(gamma)[..., None] * s)
    return f, s, n


@dataclass(frozen=True)
class RuleBasedMicrostructure(Coefficient):
    """Coefficient form of the helix-angle rule: evaluates (f, s, n) at
    quadrature points from a coordinate system's transmural coordinate.

    Parity: ``create_microstructure_model`` (``microstructure.jl:280``)."""
    coordinate_system: Any
    params: ODB25LTMicrostructureParameters

    def setup(self, batch):
        cs = self.coordinate_system
        gc = np.asarray(cs.at_qps(batch))     # [nc, nqp, >=1] (transmural first)
        nc, nqp = gc.shape[:2]
        names = getattr(cs, "component_names", ())
        if "transmural" in names and "apicobasal" in names \
                and hasattr(cs, "axes_at_qps"):
            # gradient-based local axes: correct on arbitrary (patient)
            # geometries where the idealized radial proxy is wrong
            t_hat, ab_hat, _ = cs.axes_at_qps(batch)
            f, s, n = _rule_based_frame_from_axes(
                gc[..., names.index("transmural")].reshape(-1),
                t_hat.reshape(-1, 3), ab_hat.reshape(-1, 3), self.params)
        else:
            xq = np.asarray(batch.xq).reshape(-1, 3)
            axis = getattr(cs, "axis", None)
            if axis is None:
                axis, _, _ = compute_long_axis(cs.mesh)
            f, s, n = _rule_based_frame(xq, gc[..., 0].reshape(-1), axis,
                                        self.params)
        basis = np.stack([f, s, n], axis=-2).reshape(nc, nqp, 3, 3)
        return _EvalCache("data", jnp.asarray(basis, batch.xq.dtype))


def create_microstructure_model(coordinate_system,
                                params: ODB25LTMicrostructureParameters = None,
                                **kw) -> RuleBasedMicrostructure:
    """Build the rule-based (f, s, n) microstructure coefficient.

    kwargs accept the reference's keyword API: endo_helix_angle,
    epi_helix_angle, ... (``microstructure.jl:280``)."""
    if params is None:
        params = ODB25LTMicrostructureParameters(**kw)
    return RuleBasedMicrostructure(coordinate_system, params)


# ---------------------------------------------------------------------------
# traced-angle frame recomputation (fiber-angle gradients; ad/parametric.py)
# ---------------------------------------------------------------------------

ANGLE_PARAM_NAMES = (
    "endo_helix_angle", "epi_helix_angle",
    "endo_transversal_angle", "epi_transversal_angle",
    "endo_sheetlet_angle", "epi_sheetlet_angle")


def frame_geometry(microstructure, batch):
    """Angle-INDEPENDENT geometric inputs of the helix rule at a batch's
    quadrature points: transmural coordinate, circumferential and
    apicobasal unit fields, flattened over (cell, qp).

    Both :class:`RuleBasedMicrostructure` evaluation branches (gradient
    axes and idealized radial proxy) reduce to the same rotation recipe
    once ``(tcoord, c_hat, ab_hat)`` are fixed; this extracts exactly the
    inputs ``setup`` would feed it, so :func:`traced_rule_frames` on this
    geometry at the base angles reproduces the setup-time frames. Used by
    ``ParametricQuasiStaticFunction`` to re-evaluate the frames with
    TRACED angles — the fiber-angle gradient channel."""
    if not isinstance(microstructure, RuleBasedMicrostructure):
        raise TypeError(
            "frame_geometry needs a RuleBasedMicrostructure; got "
            f"{type(microstructure).__name__}")
    cs = microstructure.coordinate_system
    gc = np.asarray(cs.at_qps(batch))
    nc, nqp = gc.shape[:2]
    names = getattr(cs, "component_names", ())
    if "transmural" in names and "apicobasal" in names \
            and hasattr(cs, "axes_at_qps"):
        t_hat, ab_hat, _ = cs.axes_at_qps(batch)
        t_hat = np.asarray(t_hat).reshape(-1, 3)
        ab_hat = np.asarray(ab_hat).reshape(-1, 3)
        tcoord = gc[..., names.index("transmural")].reshape(-1)
        c_hat = np.cross(ab_hat, t_hat)
    else:
        xq = np.asarray(batch.xq).reshape(-1, 3)
        axis = getattr(cs, "axis", None)
        if axis is None:
            axis, _, _ = compute_long_axis(cs.mesh)
        axis = np.asarray(axis, np.float64)
        rel = xq - (xq @ axis)[:, None] * axis[None]
        r = _normalize(rel)
        c_hat = _normalize(np.cross(axis[None], r))
        ab_hat = np.broadcast_to(axis, c_hat.shape).copy()
        tcoord = gc[..., 0].reshape(-1)
    return {"tcoord": np.clip(tcoord, 0.0, 1.0),
            "c_hat": c_hat, "ab_hat": ab_hat, "shape": (nc, nqp)}


def traced_rule_frames(geom, params, dtype):
    """jnp (traceable, reverse-differentiable) re-evaluation of the helix
    rule on a :func:`frame_geometry` with possibly-TRACED angle values.

    ``params`` maps each of :data:`ANGLE_PARAM_NAMES` to a scalar (python
    float or traced jnp scalar). Matches ``_rule_based_frame_from_axes``
    exactly — the zero-angle branches there are algebraic no-ops of the
    unconditional rotations applied here, so equality holds for every
    angle set, not just nonzero ones."""
    t = jnp.asarray(geom["tcoord"], dtype)
    c = jnp.asarray(geom["c_hat"], dtype)
    ab = jnp.asarray(geom["ab_hat"], dtype)

    def lerp(endo, epi):
        e0 = jnp.asarray(params[endo], dtype)
        e1 = jnp.asarray(params[epi], dtype)
        return e0 + (e1 - e0) * t

    alpha = lerp("endo_helix_angle", "epi_helix_angle")
    beta = lerp("endo_transversal_angle", "epi_transversal_angle")
    gamma = lerp("endo_sheetlet_angle", "epi_sheetlet_angle")
    f = jnp.cos(alpha)[:, None] * c + jnp.sin(alpha)[:, None] * ab
    # transversal rotation: Rodrigues about the apicobasal axis by -beta
    # (identity at beta = 0, so safe to apply unconditionally)
    ct, st = jnp.cos(-beta)[:, None], jnp.sin(-beta)[:, None]
    f = (f * ct + jnp.cross(ab, f) * st
         + ab * jnp.sum(ab * f, axis=-1, keepdims=True) * (1.0 - ct))
    f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
    s = -jnp.sin(alpha)[:, None] * c + jnp.cos(alpha)[:, None] * ab
    s = s - jnp.sum(s * f, axis=-1, keepdims=True) * f
    s = s / jnp.linalg.norm(s, axis=-1, keepdims=True)
    n = jnp.cross(f, s)
    cg, sg = jnp.cos(gamma)[:, None], jnp.sin(gamma)[:, None]
    s, n = cg * s - sg * n, cg * n + sg * s
    nc, nqp = geom["shape"]
    return jnp.stack([f, s, n], axis=-2).reshape(nc, nqp, 3, 3)
