"""Semidiscrete function types — the lowered, device-ready problems.

Parity: ``src/modeling/functions.jl`` — ``AffineODEFunction`` (M du/dt = K u
+ f, ``:79``), ``AffineSteadyStateFunction`` (``:90``),
``PointwiseODEFunction`` (``:46``), ``NullFunction`` (``:35``), and the
``GenericSplitFunction`` of OrdinaryDiffEqOperatorSplitting
(``src/solver/time/integrator/operatorsplitting-interface.jl``).

TPU-native state layout: one flat vector per problem. For the
reaction-diffusion split the layout is SoA ("StateBlockedLayout",
``src/modeling/solution_variables.jl:33-67``): ``u.reshape(nstates, nphi)``,
and the transmembrane-potential block *is* the heat subproblem's solution —
the reference's overlapping-index-ranges trick (``src/discretization/
fem.jl:399-402,532-534``) expressed as a slice instead of a view.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from thunderbolt_tpu.fem.sparsity import ELLMatrix, SparsityPattern
from thunderbolt_tpu.fem.dofs import DofHandler
from thunderbolt_tpu.models.cells.base import CellModel


@dataclass(frozen=True)
class VariableInfo:
    """Named view descriptor into the flat solution vector.

    Parity: ``FieldVariable``/``LocalStateVariable`` named access
    (``src/modeling/solution_variables.jl:334-392``)."""
    offset: int
    size: int
    coords: Optional[np.ndarray] = None  # [size, sdim] dof locations

    @property
    def slice(self):
        return slice(self.offset, self.offset + self.size)


@dataclass
class AffineODEFunction:
    """M du/dt = K u + f(t) on one scalar FEM field."""
    dh: DofHandler
    field: str
    pattern: SparsityPattern
    M: ELLMatrix
    K: ELLMatrix
    source: Optional[Callable] = None       # t -> rhs vector (jit-traceable)
    lumped_mass: Optional[Any] = None       # [n] row-sum mass (explicit path)
    constraints: Optional[Any] = None
    #: DIA fast-path operators (None when the dof ordering is too scattered
    #: or on sharded/padded copies) — see fem/sparsity.DIAMatrix
    M_dia: Optional[Any] = None
    K_dia: Optional[Any] = None

    @property
    def solution_size(self):
        return self.dh.fields[self.field].ndofs

    def variables(self) -> Dict[str, VariableInfo]:
        fi = self.dh.fields[self.field]
        return {self.field: VariableInfo(0, fi.ndofs, fi.entity_coords)}


@dataclass
class BidomainFunction:
    """Parabolic-elliptic bidomain diffusion stage (conductivities folded
    to diffusivities D = kappa/(chi*Cm)):

    dphi_m/dt = div(D_i grad(phi_m + phi_e)) + f(t)
    0         = div(D_i grad phi_m + (D_i + D_e) grad phi_e)

    ``K_i``/``K_e`` carry the ``-∫∇N⋅D∇N`` sign convention (negative
    semidefinite), so the backward-Euler block system

        [[M - dt K_i,        -dt K_i      ],
         [   -dt K_i,  -dt (K_i + K_e)    ]]  [phi_m; phi_e]

    is symmetric positive semidefinite with the single nullvector
    [0; 1] (the extracellular gauge) — one CG solve per step. The
    reference declares-but-does-not-implement this physics
    (``src/modeling/electrophysiology.jl:319``).

    This function owns the FULL split vector slice (ion SoA block + the
    appended phi_e block) and updates only its phi_m/phi_e sub-blocks,
    identified by static offsets.
    """
    dh: DofHandler
    field: str                       # phi_m
    field_e: str                     # phi_e
    pattern: SparsityPattern
    M: ELLMatrix
    K_i: ELLMatrix
    K_e: ELLMatrix
    source: Optional[Callable] = None
    phi_offset: int = 0              # start of phi_m within the slice
    e_offset: int = 0                # start of phi_e within the slice
    total_size: int = 0
    M_dia: Optional[Any] = None
    K_i_dia: Optional[Any] = None
    K_e_dia: Optional[Any] = None

    @property
    def ndofs_field(self):
        return self.dh.fields[self.field].ndofs

    @property
    def solution_size(self):
        return self.total_size


@dataclass
class PPBidomainFunction(BidomainFunction):
    """Parabolic-parabolic bidomain diffusion stage: same assembled
    operators and state layout as :class:`BidomainFunction`, but the
    backward-Euler solve runs in the UNTRANSFORMED unknowns (phi_i, phi_e)

        [[M - dt K_i,      -M     ],
         [    -M,      M - dt K_e ]]

    (SPD up to the shared-potential nullvector [1; 1]) and writes back
    phi_m = phi_i - phi_e plus the zero-mean-gauged phi_e. Discrete
    trajectories are exactly those of the parabolic-elliptic form (block
    row difference/sum); see ``ParabolicParabolicBidomainModel``."""


@dataclass
class AffineSteadyStateFunction:
    """0 = K u + f with constraints (``functions.jl:90``)."""
    dh: DofHandler
    field: str
    pattern: SparsityPattern
    K: ELLMatrix
    rhs: Any
    constraints: Any

    @property
    def solution_size(self):
        return self.dh.fields[self.field].ndofs

    def variables(self) -> Dict[str, VariableInfo]:
        fi = self.dh.fields[self.field]
        return {self.field: VariableInfo(0, fi.ndofs, fi.entity_coords)}

    def solve(self, rtol=1e-10, atol=1e-12, maxiter=10000):
        """Direct steady solve: -K u = f with Dirichlet elimination +
        Jacobi-CG (the ``init(problem, solver)`` one-shot path of the
        reference's steady diffusion, ``fem.jl:300,325``)."""
        from thunderbolt_tpu.solver.linear import cg, jacobi_preconditioner
        import jax.numpy as jnp
        A_raw = self.K
        # K from the diffusion form is negative-definite: solve (-K) u = f
        negK = type(A_raw)(A_raw.cols, -A_raw.vals, A_raw.diag_pos)
        ch = self.constraints
        f = self.rhs(0.0) if callable(self.rhs) else self.rhs
        if ch is not None:
            A = ch.apply_operator(negK)
            b = ch.apply_rhs(negK, f)
        else:
            A, b = negK, f
        x, info = cg(A.mv, b, Minv=jacobi_preconditioner(A.diagonal()),
                     rtol=rtol, atol=atol, maxiter=maxiter)
        if not bool(info.converged):
            raise RuntimeError(f"steady solve did not converge: {info}")
        return x


@dataclass
class PointwiseODEFunction:
    """npoints independent ODE systems du/dt = g(u, x, t), SoA layout.

    Parity: ``PointwiseODEFunction`` (``functions.jl:46``) + the pointwise
    solver kernels (``src/solver/time/partitioned_solver.jl``)."""
    ion: CellModel
    npoints: int
    x: Optional[Any] = None          # [npoints, xdim] cell-model coordinates
    dof_coords: Optional[np.ndarray] = None   # physical coords (for IC/IO)

    @property
    def solution_size(self):
        return self.ion.nstates * self.npoints

    def reshape(self, u):
        return u.reshape(self.ion.nstates, self.npoints)


@dataclass(frozen=True)
class MultiODEPart:
    """One subdomain's pointwise system within a PointwiseMultiODEFunction:
    its ionic model, the global dofs of its phi points, and where its non-phi
    state block lives in the flat solution vector."""
    ion: Any
    phi_dofs: Any            # int32 [n_k] global dofs of the phi points
    state_offset: int        # start of the (nstates-1)*n_k SoA state block
    x: Any = None            # per-point coordinates

    @property
    def npoints(self):
        return self.phi_dofs.shape[0]

    @property
    def state_size(self):
        return (self.ion.nstates - 1) * self.npoints

    def gather(self, u):
        """[nstates, n_k] SoA state with phi inserted at ion.phi_index."""
        import jax.numpy as jnp
        ion = self.ion
        phi = u[self.phi_dofs]
        ns = ion.nstates
        S = u[self.state_offset:self.state_offset + self.state_size
              ].reshape(ns - 1, self.npoints)
        rows = []
        k = 0
        for i in range(ns):
            if i == ion.phi_index:
                rows.append(phi)
            else:
                rows.append(S[k])
                k += 1
        return jnp.stack(rows)

    def scatter(self, u, U):
        import jax.numpy as jnp
        ion = self.ion
        ns = ion.nstates
        u = u.at[self.phi_dofs].set(U[ion.phi_index])
        rows = [U[i] for i in range(ns) if i != ion.phi_index]
        if rows:
            u = u.at[self.state_offset:self.state_offset + self.state_size
                     ].set(jnp.stack(rows).reshape(-1))
        return u


@dataclass
class PointwiseMultiODEFunction:
    """Per-subdomain pointwise ODE systems sharing the global phi dofs
    (parity: ``PointwiseMultiODEFunction``, ``functions.jl:72`` + the
    multi-subdomain EP packing of ``fem.jl:434-542``)."""
    parts: Tuple
    solution_size: int


@dataclass
class NullFunction:
    """Placeholder subproblem (``functions.jl:35``)."""
    solution_size: int = 0


@dataclass
class GenericSplitFunction:
    """An ordered tuple of subproblems sharing one flat solution vector.

    functions[i] owns `ranges[i]` (a slice of the parent vector); ranges may
    overlap — that is the point (fem.jl:532-534).
    """
    functions: Tuple
    ranges: Tuple
    variables_map: Dict[str, VariableInfo] = dfield(default_factory=dict)

    @property
    def solution_size(self):
        return max(r.stop for r in self.ranges)

    def variables(self):
        return self.variables_map
