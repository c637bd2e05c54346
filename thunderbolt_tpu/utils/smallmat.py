"""Closed-form determinant/inverse for 1x1/2x2/3x3 matrices.

The geometry Jacobians of every reference element are <= 3x3; hand-rolled
cofactor formulas vectorize on the VPU and avoid XLA's generic LU path.
Analog of the stack-allocated ``Tensors.jl`` ops the reference leans on
(``src/Thunderbolt.jl`` deps; SURVEY.md §2.2 "Tensor helpers").
"""

import jax.numpy as jnp


def det_small(J):
    """Determinant over the last two axes (size 1, 2 or 3)."""
    d = J.shape[-1]
    if d == 1:
        return J[..., 0, 0]
    if d == 2:
        return J[..., 0, 0] * J[..., 1, 1] - J[..., 0, 1] * J[..., 1, 0]
    if d == 3:
        return (
            J[..., 0, 0] * (J[..., 1, 1] * J[..., 2, 2] - J[..., 1, 2] * J[..., 2, 1])
            - J[..., 0, 1] * (J[..., 1, 0] * J[..., 2, 2] - J[..., 1, 2] * J[..., 2, 0])
            + J[..., 0, 2] * (J[..., 1, 0] * J[..., 2, 1] - J[..., 1, 1] * J[..., 2, 0])
        )
    raise ValueError(f"det_small supports dims 1-3, got {d}")


def inv_small(J, det=None):
    """Inverse over the last two axes (size 1, 2 or 3)."""
    d = J.shape[-1]
    if det is None:
        det = det_small(J)
    idet = 1.0 / det
    if d == 1:
        return idet[..., None, None]
    if d == 2:
        row0 = jnp.stack([J[..., 1, 1], -J[..., 0, 1]], axis=-1)
        row1 = jnp.stack([-J[..., 1, 0], J[..., 0, 0]], axis=-1)
        return jnp.stack([row0, row1], axis=-2) * idet[..., None, None]
    if d == 3:
        c00 = J[..., 1, 1] * J[..., 2, 2] - J[..., 1, 2] * J[..., 2, 1]
        c01 = J[..., 0, 2] * J[..., 2, 1] - J[..., 0, 1] * J[..., 2, 2]
        c02 = J[..., 0, 1] * J[..., 1, 2] - J[..., 0, 2] * J[..., 1, 1]
        c10 = J[..., 1, 2] * J[..., 2, 0] - J[..., 1, 0] * J[..., 2, 2]
        c11 = J[..., 0, 0] * J[..., 2, 2] - J[..., 0, 2] * J[..., 2, 0]
        c12 = J[..., 0, 2] * J[..., 1, 0] - J[..., 0, 0] * J[..., 1, 2]
        c20 = J[..., 1, 0] * J[..., 2, 1] - J[..., 1, 1] * J[..., 2, 0]
        c21 = J[..., 0, 1] * J[..., 2, 0] - J[..., 0, 0] * J[..., 2, 1]
        c22 = J[..., 0, 0] * J[..., 1, 1] - J[..., 0, 1] * J[..., 1, 0]
        row0 = jnp.stack([c00, c01, c02], axis=-1)
        row1 = jnp.stack([c10, c11, c12], axis=-1)
        row2 = jnp.stack([c20, c21, c22], axis=-1)
        return jnp.stack([row0, row1, row2], axis=-2) * idet[..., None, None]
    raise ValueError(f"inv_small supports dims 1-3, got {d}")


# ---------------------------------------------------------------------------
# VPU-friendly small contractions
#
# Under the package-wide "highest" matmul precision every 3x3 `@` in the
# per-qp material AD chain lowers to multi-pass MXU dot_generals at ~0.05%
# systolic-array utilization — measured 4-40x slower than the same math as
# broadcast multiply-reduce on the VPU (which is also exactly-f32, so the
# precision flag becomes irrelevant). Use these for all per-quadrature-point
# tensor algebra; keep `@`/einsum for genuinely large contractions.
# ---------------------------------------------------------------------------

import jax.numpy as _jnp


def mtm(F):
    """F^T F over the last two axes (broadcast-reduce, no dot_general)."""
    return _jnp.sum(F[..., :, :, None] * F[..., :, None, :], axis=-3)


def mmul(A, B):
    """A @ B over the last two axes without dot_general."""
    return _jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)


def mv(A, x):
    """A @ x (matrix-vector) without dot_general."""
    return _jnp.sum(A * x[..., None, :], axis=-1)


def vtmv(x, A, y):
    """x^T A y without dot_general."""
    return _jnp.sum(A * (x[..., :, None] * y[..., None, :]), axis=(-2, -1))


def vdot(x, y):
    """x . y without dot_general."""
    return _jnp.sum(x * y, axis=-1)


def outer(x, y):
    return x[..., :, None] * y[..., None, :]


def trace3(A):
    return A[..., 0, 0] + A[..., 1, 1] + A[..., 2, 2]
