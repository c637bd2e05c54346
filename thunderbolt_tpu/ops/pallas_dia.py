"""Pallas TPU kernel: DIA sparse matrix-vector product.

The VMEM-resident counterpart of ``fem/sparsity.DIAMatrix.mv``: diagonals
and the padded vector are staged into VMEM and all taps are computed in one
kernel — a single HBM round trip per application.

Measured on the dev tile, XLA's fused slice-multiply chain and this kernel
are within noise of each other (lane-rotation bound); the kernel exists as
the staging point for multi-application fusion (Chebyshev/CG-in-VMEM) on
full hardware, where avoiding repeated HBM reads of the diagonals pays.

Use ``dia_mv_pallas(A, x)``; falls back transparently when shapes exceed
VMEM (guard in the wrapper).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from thunderbolt_tpu.fem.sparsity import DIAMatrix


def _kernel(offsets, lo, n, xp_ref, diags_ref, out_ref):
    acc = jnp.zeros((1, n), xp_ref.dtype)
    for k, d in enumerate(offsets):
        acc = acc + diags_ref[k, :][None, :] * xp_ref[:, lo + d:lo + d + n]
    out_ref[:, :] = acc


def dia_mv_pallas(A: DIAMatrix, x, interpret=False):
    """y = A @ x with the whole operand set staged in VMEM.

    Requires (ndiag + 2) * n * 4 bytes to fit in VMEM (~16 MB/core)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = A.n
    lo = -min(min(A.offsets), 0)
    hi = max(max(A.offsets), 0)
    nbytes = (len(A.offsets) + 2) * n * x.dtype.itemsize
    if nbytes > 12 * 1024 * 1024:
        return A.mv(x)  # VMEM would overflow; XLA path tiles fine
    xp = jnp.pad(x, (lo, hi))[None, :]
    kern = functools.partial(_kernel, A.offsets, lo, n)
    y = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, n), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, A.diags)
    return y[0]
