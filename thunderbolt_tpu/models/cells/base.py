"""Ionic cell model protocol, array-native.

Parity: the reference's cell-model protocol ``num_states``,
``state_symbols``, ``transmembranepotential_index``,
``default_initial_state``, ``cell_rhs!``
(``src/modeling/electrophysiology.jl:100-165``).

TPU-native design (SURVEY.md §7): a model's right-hand side is a pure
function over SoA state arrays ``u[nstates, npoints]`` — one fused
elementwise kernel over millions of independent cells, replacing the
reference's per-point ``cell_rhs!`` loop under Polyester/@cuda
(``src/solver/time/partitioned_solver.jl:38-99``). Models that expose
Hodgkin-Huxley gate structure additionally provide ``gating_inf_tau`` so the
Rush-Larsen exponential integrator can treat gates exactly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np


@dataclass(frozen=True)
class CellModel:
    """Base class: frozen (hashable) so models are static under jit."""

    #: index of the transmembrane potential within the state vector
    #: (plain class attributes, NOT dataclass fields — subclasses override
    #: them at class level)
    phi_index = 0
    #: indices of Hodgkin-Huxley gating states (for Rush-Larsen); empty if
    #: the model does not expose gate structure.
    gating_indices = ()
    #: set True in a subclass whose rhs reads the per-point coordinates x —
    #: the fused Pallas cell kernels (ops/pallas_cells.py) then stand down.
    uses_coordinates = False

    @property
    def nstates(self) -> int:
        return len(self.state_symbols)

    @property
    def state_symbols(self) -> Tuple[str, ...]:
        raise NotImplementedError

    def default_initial_state(self) -> np.ndarray:
        raise NotImplementedError

    def rhs(self, u, x, t):
        """du/dt for state u[nstates, ...]; x: coordinates [..., xdim] or
        None; t: scalar time. Returns [nstates, ...]."""
        raise NotImplementedError

    def gating_inf_tau(self, u, x, t):
        """(inf, tau) for the gating states, each [ngates, ...]."""
        raise NotImplementedError

    # -- convenience ------------------------------------------------------

    def initial_state_array(self, npoints, dtype=np.float32):
        u0 = np.asarray(self.default_initial_state(), dtype=dtype)
        return np.broadcast_to(u0[:, None], (self.nstates, npoints)).copy()
