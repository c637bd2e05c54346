"""Electrophysiology models: monodomain, bidomain stubs, stimulation.

Parity: ``src/modeling/electrophysiology.jl`` —
``MonodomainModel`` (``:338``), bidomain placeholders (``:296,319``, marked
"Not implemented yet" in the reference as well), stimulation protocols
(``NoStimulationProtocol``/``AnalyticalTransmembraneStimulationProtocol``,
``:251,260``) and the ``ReactionDiffusionSplit`` annotation (``:379``).

The model layer stays purely symbolic (no dofs, no arrays) exactly like the
reference's modeling tier (SURVEY.md L2); ``semidiscretize`` lowers it.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

from thunderbolt_tpu.models.cells.base import CellModel


# ---------------------------------------------------------------------------
# stimulation protocols
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class TransmembraneStimulationProtocol:
    """Base marker type (``electrophysiology.jl:244``)."""


@dataclass(frozen=True)
class NoStimulationProtocol(TransmembraneStimulationProtocol):
    """No applied current (``electrophysiology.jl:251``)."""


@dataclass(frozen=True)
class AnalyticalTransmembraneStimulationProtocol(TransmembraneStimulationProtocol):
    """Applied current given by an analytical coefficient f(x, t) plus active
    intervals (``electrophysiology.jl:260``). `f` must be jnp-vectorized over
    x; `intervals` is a tuple of (t_on, t_off) pairs — the current is f
    inside any interval and 0 outside (traced, so t stays dynamic).
    """
    f: Any                      # callable (x[..., sdim], t) -> current
    intervals: Tuple = ((0.0, float("inf")),)

    def current(self, x, t):
        import jax.numpy as jnp
        val = self.f(x, t)
        active = False
        for (t0, t1) in self.intervals:
            active = active | ((t >= t0) & (t <= t1))
        return jnp.where(active, val, 0.0)


# ---------------------------------------------------------------------------
# models
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class MonodomainModel:
    """chi*Cm dphi/dt = div(kappa grad phi) + chi*(I_ion + I_stim);
    ds/dt = g(phi, s).   Parity: ``electrophysiology.jl:338-363``.

    chi, Cm, kappa are coefficients (constants, tensors, or Coefficient
    objects); `cell_coordinates` picks what the ionic model receives as its
    `x` (None, a coordinate system, or a Coefficient) — mirroring the
    reference's `cell_coordinates` slot.
    """
    chi: Any
    Cm: Any
    kappa: Any
    stim: TransmembraneStimulationProtocol
    ion: CellModel
    cell_coordinates: Any = None
    transmembrane_solution_symbol: str = "phi_m"
    internal_state_symbol: str = "s"

    def field_variable_names(self):
        return (self.transmembrane_solution_symbol,)


@dataclass(frozen=True)
class ParabolicParabolicBidomainModel:
    """Parabolic-parabolic (untransformed) bidomain:

    chi*Cm dphi_m/dt =  div(kappa_i grad phi_i) + chi*(I_ion + I_stim)
    chi*Cm dphi_m/dt = -div(kappa_e grad phi_e) - chi*(I_ion + I_stim)
    phi_m            =  phi_i - phi_e

    BEYOND-reference: the reference declares this model but marks it "Not
    implemented yet" (``electrophysiology.jl:296``; its docstring also
    carries a sign slip on the extracellular row — the conservation law
    div(kappa_i grad phi_i + kappa_e grad phi_e) = 0 fixes the sign used
    here). The diffusion stage solves the UNTRANSFORMED (phi_i, phi_e)
    backward-Euler block system

        [[M - dt K_i,      -M     ],     [ M phi_m^n + dt f]
         [    -M,      M - dt K_e ]]  =  [-M phi_m^n - dt f]

    (K = -S negative semidefinite), which is symmetric positive
    semidefinite with the single nullvector [1; 1] (shared potential
    gauge, fixed by zero-mean phi_e). Block-row difference/sum shows the
    discrete trajectories are IDENTICAL to the parabolic-elliptic
    transformation's (tests/test_bidomain.py asserts this exactly);
    stored state is (phi_m, phi_e), with phi_i = phi_m + phi_e derived.
    """
    chi: Any
    Cm: Any
    kappa_i: Any
    kappa_e: Any
    stim: Any
    ion: Any
    cell_coordinates: Any = None
    transmembrane_solution_symbol: str = "phi_m"
    extracellular_solution_symbol: str = "phi_e"
    internal_state_symbol: str = "s"

    def field_variable_names(self):
        return (self.transmembrane_solution_symbol,
                self.extracellular_solution_symbol)


@dataclass(frozen=True)
class ParabolicEllipticBidomainModel:
    """Parabolic-elliptic bidomain:

    chi*Cm dphi_m/dt = div(kappa_i grad(phi_m + phi_e)) + chi*(I_ion+I_stim)
    0                = div(kappa_i grad phi_m + (kappa_i+kappa_e) grad phi_e)

    The reference only *declares* this model ("Not implemented yet",
    ``electrophysiology.jl:319``); here it is fully implemented: the
    diffusion stage of the reaction-diffusion split solves the coupled
    parabolic-elliptic system as one symmetric positive-semidefinite
    2x2-block backward-Euler solve (see ``BidomainFunction`` and
    ``BackwardEulerSolver._make_bidomain_step``), with the zero-mean gauge
    on phi_e. Sanity anchor: for kappa_e = lambda*kappa_i the discrete
    system reduces *exactly* to the monodomain with
    kappa = kappa_i*lambda/(1+lambda) (tests/test_bidomain.py).
    """
    chi: Any
    Cm: Any
    kappa_i: Any
    kappa_e: Any
    stim: Any
    ion: Any
    cell_coordinates: Any = None
    transmembrane_solution_symbol: str = "phi_m"
    extracellular_solution_symbol: str = "phi_e"
    internal_state_symbol: str = "s"

    def field_variable_names(self):
        return (self.transmembrane_solution_symbol,
                self.extracellular_solution_symbol)


@dataclass(frozen=True)
class ReactionDiffusionSplit:
    """Annotation: solve `model` with a reaction-diffusion operator split
    (``electrophysiology.jl:379``)."""
    model: Any


@dataclass(frozen=True)
class TransientDiffusionModel:
    """du/dt = div(kappa grad u) + f  (``src/modeling/core/diffusion.jl:67``)."""
    kappa: Any
    source: Any = None
    solution_variable_symbol: str = "u"


@dataclass(frozen=True)
class SteadyDiffusionModel:
    """0 = div(kappa grad u) + f  (``diffusion.jl:164``)."""
    kappa: Any
    source: Any = None
    solution_variable_symbol: str = "u"


@dataclass(frozen=True)
class InterfaceDiffusionModel:
    """Jump-penalty coupling -int_Gamma [[du]] G [[u]] dGamma across a pair
    of coincident facetsets (``src/modeling/core/diffusion.jl:146-158``) —
    couples disconnected subdomains (e.g. Purkinje <-> myocardium)."""
    G: Any
    solution_variable_symbol: str = "phi_m"
    interface: Tuple[str, str] = ("InterfaceA", "InterfaceB")
