"""Structural model descriptors.

Parity: ``src/modeling/solid_mechanics.jl`` — ``QuasiStaticModel`` (``:7``)
and ``ElastodynamicsModel`` (``:50``): purely symbolic bundles of
(displacement symbol, material composite, weak boundary conditions).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple


@dataclass(frozen=True)
class QuasiStaticModel:
    """div P(F, Q) = 0 with weak BCs (``solid_mechanics.jl:7``)."""
    displacement_symbol: str
    material_model: Any
    face_models: Tuple = ()


@dataclass(frozen=True)
class ElastodynamicsModel:
    """rho d2u/dt2 = div P + ... (``solid_mechanics.jl:50``)."""
    displacement_symbol: str
    velocity_symbol: str
    material_model: Any
    rho: Any = 1.0
    face_models: Tuple = ()
