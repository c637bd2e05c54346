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

import jax as _jax

# FEM geometry Jacobians involve catastrophic cancellation at element scale
# (detJ ~ h^dim); TPU's default bf16 MXU passes zero them out and poison the
# assembly with NaNs. Our matmuls are tiny, so full-f32 einsums cost little.
# Users can relax this per-region with jax.default_matmul_precision(...).
_jax.config.update("jax_default_matmul_precision", "highest")

from thunderbolt_tpu.mesh.mesh import Mesh, ElementBlock
from thunderbolt_tpu.mesh.generators import (
    generate_mesh,
    generate_simple_disc_mesh,
    generate_ring_mesh,
    generate_open_ring_mesh,
    generate_ideal_lv_mesh,
    generate_ideal_lv_mesh_hex,
    generate_quadratic_ring_mesh,
    generate_quadratic_open_ring_mesh,
    generate_quadratic_ideal_lv_mesh,
    elevate_to_quadratic,
)
from thunderbolt_tpu.mesh.tools import (
    uniform_refinement,
    hexahedralize,
    load_mfem_grid,
    load_carp_grid,
    load_voom2_grid,
    extract_outer_surface_mesh,
    compute_center_of_mass,
    compute_center_of_surface,
    split_facetset_by_type,
)
from thunderbolt_tpu.fem.points import (
    PointEvalHandler,
    evaluate_at_points,
    NodalIntergridTransfer,
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
    SpatiallyHomogeneousDataField,
    evaluate_coefficient,
    evaluate_coefficient_at_dof_locations,
    setup_coefficient_cache,
)
from thunderbolt_tpu.models.ep import (
    MonodomainModel,
    ParabolicParabolicBidomainModel,
    ParabolicEllipticBidomainModel,
    ReactionDiffusionSplit,
    TransientDiffusionModel,
    SteadyDiffusionModel,
    InterfaceDiffusionModel,
    NoStimulationProtocol,
    AnalyticalTransmembraneStimulationProtocol,
)
from thunderbolt_tpu.models.cells import (
    CellModel,
    FHNModel,
    AlievPanfilovModel,
    PCG2019Model,
    TenTusscherPanfilov2006Model,
    TenTusscherPanfilov2006EpiModel,
    TenTusscherPanfilov2006EndoModel,
    TenTusscherPanfilov2006MModel,
    HodgkinHuxleyModel,
)
from thunderbolt_tpu.models.coordinates import (
    LocalCoordinateAxes,
    evaluate_coordinate_axes,
    CartesianCoordinateSystem,
    CellIndexCoordinateSystem,
    LVCoordinateSystem,
    BiVCoordinateSystem,
    compute_lv_coordinate_system,
    compute_biv_coordinate_system,
    compute_midmyocardial_section_coordinate_system,
    solve_laplace_nodal,
    compute_long_axis,
    fit_basal_plane,
    LVAxes,
    compute_lv_axes,
    compute_lv_axes_from_plane,
    compute_relative_rotation,
)
from thunderbolt_tpu.models.microstructure import (
    OrthotropicMicrostructureModel,
    TransverselyIsotropicMicrostructureModel,
    AnisotropicPlanarMicrostructureModel,
    ODB25LTMicrostructureParameters,
    create_microstructure_model,
)
from thunderbolt_tpu.disc.semidiscretize import semidiscretize
from thunderbolt_tpu.disc.solution_variables import (
    create_initial_condition,
    getvariable,
    setvariable,
    solution_variable,
    solution_variable_names,
    nodal_values,
    to_point_blocked,
    from_point_blocked,
)
from thunderbolt_tpu.solver.time.euler import (
    BackwardEulerSolver,
    ForwardEulerSolver,
    ForwardEulerCellSolver,
    AdaptiveForwardEulerSubstepper,
    RushLarsenCellSolver,
)
from thunderbolt_tpu.solver.time.splitting import (
    LieTrotterGodunov, StrangSplitting, Substepped)
from thunderbolt_tpu.solver.time.integrator import (
    init,
    solve,
    Integrator,
    StepController,
    TimeChoiceIterator,
    ReturnCode,
)
from thunderbolt_tpu.models.solid_mechanics import (
    QuasiStaticModel,
    ElastodynamicsModel,
)
from thunderbolt_tpu.models.solid.energies import (
    NullEnergyModel,
    NeoHookeanModel,
    BioNeoHookean,
    HolzapfelOgden2009Model,
    Guccione1991PassiveModel,
    LinYinPassiveModel,
    LinYinActiveModel,
    HumphreyStrumpfYinModel,
    TransverseIsotopicNeoHookeanModel,
    LinearSpringModel,
    SimpleActiveSpring,
    SimpleCompressionPenalty,
    HartmannNeffCompressionPenalty1,
    HartmannNeffCompressionPenalty2,
    HartmannNeffCompressionPenalty3,
    NullCompressionPenalty,
)
from thunderbolt_tpu.models.solid.materials import (
    PK1Model,
    ActiveStressModel,
    GeneralizedHillModel,
    ExtendedHillModel,
    PrestressedMechanicalModel,
    FieldParametrizedMaterial,
)
from thunderbolt_tpu.models.solid.active import (
    ActiveMaterialAdapter,
    GMKActiveDeformationGradientModel,
    GMKIncompressibleActiveDeformationGradientModel,
    RLRSQActiveDeformationGradientModel,
    SimpleActiveStress,
    PiersantiActiveStress,
    Guccione1993ActiveModel,
)
from thunderbolt_tpu.models.solid.contraction import (
    PelceSunLangeveld1995Model,
    ConstantStretchModel,
    CaDrivenInternalSarcomereModel,
)
from thunderbolt_tpu.models.solid.contraction_rdq20 import (
    RDQ20MFModel,
    AsRateIndependent,
    StandaloneSarcomereModel,
)
from thunderbolt_tpu.models.solid.viscoelastic import LinearMaxwellMaterial
from thunderbolt_tpu.models.solid.consistency import (
    ConsistencyCheckWeakBoundaryCondition,
)
from thunderbolt_tpu.models.solid.boundary import (
    RobinBC,
    NormalSpringBC,
    BendingSpringBC,
    ConstantPressureBC,
    PressureFieldBC,
)
from thunderbolt_tpu.solver.nonlinear.newton import (
    NewtonRaphsonSolver,
    EisenstatWalkerForcing,
)
from thunderbolt_tpu.solver.time.homotopy import (
    HomotopyPathSolver,
    Deuflhard2004DiscreteContinuationController,
    Deuflhard2004_B_DiscreteContinuationControllerVariant,
    ExperimentalDiscreteContinuationController,
    IterationCountContinuationController,
)
from thunderbolt_tpu.solver.time.newmark import NewmarkSolver, NewmarkState
from thunderbolt_tpu.solver.time.controllers import (
    PIDController,
    ReactionTangentController,
)
import thunderbolt_tpu.disc.mechanics  # registers semidiscretize(QuasiStaticModel)
from thunderbolt_tpu.models.coupling import (
    RSAFDQ2022SurrogateVolume,
    Hirschvogel2017SurrogateVolume,
    ConstantChamberVolume,
    ChamberVolumeCoupling,
    LumpedFluidSolidCoupler,
    RSAFDQ2022Model,
    RSAFDQ2022Split,
    compute_chamber_volume,
)
from thunderbolt_tpu.solver.linear import (
    cg,
    bicgstab,
    gmres,
    jacobi_preconditioner,
    SchurComplementLinearSolver,
    schur_complement_solve,
)
from thunderbolt_tpu.utils.logging import (
    DefaultProgressMonitor,
    VTKNewtonMonitor,
    enable_debug_timings,
    timeit,
    reset_timers,
    print_timers,
)
from thunderbolt_tpu.models.fluid.lumped import (
    RSAFDQ2022LumpedCircuitModel,
    DummyLumpedCircuitModel,
)
from thunderbolt_tpu.models.fluid.circuit import (
    CircuitBuilder,
    SymbolicCircuitModel,
    ElastanceChamber,
    CapacitorNode,
    ResistorInductor,
    Resistor,
    Valve,
    PressureSource,
    build_rsafdq2022_circuit,
)
from thunderbolt_tpu.models.eikonal import solve_eikonal
from thunderbolt_tpu.models.ecg import (
    Plonsey1964ECGGaussCache,
    Geselowitz1989ECGLeadCache,
    PoissonECGReconstructionCache,
)
import thunderbolt_tpu.disc.coupled  # registers semidiscretize(RSAFDQ2022Split)
from thunderbolt_tpu.disc.coupled import BlockedNewtonSolver, Coupled3D0DSolver
from thunderbolt_tpu.disc.electromechanics import (
    CalciumTransfer, CoupledElectromechanics, CoupledElectromechanics3D0D)
from thunderbolt_tpu.io.vtk import ParaViewWriter, write_vtu, read_vtu

__version__ = "0.3.0"
