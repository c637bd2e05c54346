"""thunderbolt_tpu — a TPU-native cardiac multiphysics engine.

A brand-new JAX/XLA/Pallas framework with the capabilities of
JuliaHealth/Thunderbolt.jl (finite-element cardiac electrophysiology,
nonlinear active solid mechanics, 0D circulation coupling, operator-splitting
and Newton/Newmark time integration, ECG forward models, ParaView IO), built
TPU-first:

* unstructured meshes become static, type-sorted element batches
  (``mesh/``) with precomputed shape tables,
* quadrature-loop assembly becomes vmapped per-element kernels scattered
  through ``segment_sum`` into shared CSR/ELL sparsity (``fem/``),
* pointwise ionic models become fused SoA array kernels (``models/cells``),
* Krylov/Newton solves are matrix-free jitted iterations (``solver/``),
* multi-chip scale-out rides ``jax.sharding`` + collectives (``parallel/``).

Reference parity is documented per-module with ``file:line`` citations into
the reference tree.
"""

from thunderbolt_tpu.mesh.mesh import Mesh, ElementBlock
from thunderbolt_tpu.mesh.generators import (
    generate_mesh,
    generate_ring_mesh,
    generate_ideal_lv_mesh,
)
from thunderbolt_tpu.fem.dofs import DofHandler
from thunderbolt_tpu.fem.discretization import FiniteElementDiscretization, FieldSpec
from thunderbolt_tpu.fem.constraints import Dirichlet
from thunderbolt_tpu.models.coefficients import (
    ConstantCoefficient,
    FieldCoefficient,
    AnalyticalCoefficient,
    SpectralTensorCoefficient,
    ConductivityToDiffusivityCoefficient,
    CoordinateSystemCoefficient,
    evaluate_coefficient,
    setup_coefficient_cache,
)

__version__ = "0.1.0"
