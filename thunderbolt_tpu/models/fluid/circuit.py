"""Declarative lumped-circuit builder.

Parity: the ModelingToolkit circuit extension — ``MTKLumpedCicuitModel``
(``src/modeling/fluid/lumped-mtk.jl``, ``ext/ThunderboltMTKExt.jl:40-65``)
and the prebuilt ``RSAFDQ2022CircuitMTK`` ``@mtkmodel``
(``ext/mtkmodels.jl``). The reference composes symbolic components and lets
MTK structurally simplify them into compiled code; here the same composition
happens at setup time in Python and produces a **branch-free jnp rhs** (the
JAX analog of MTK's code generation): valve diodes are ``where`` selects,
the state layout is fixed at build time, and the resulting model satisfies
the exact same protocol as the hand-written
``RSAFDQ2022LumpedCircuitModel`` (``nstates``/``state_symbols``/``rhs``/
``chamber_pressures``/3D-0D coupling hooks), so built circuits drop into
``LumpedFluidSolidCoupler`` unchanged.

Primitives (hydraulic analog of the MTK component library):

* ``ElastanceChamber`` — time-varying-elastance chamber; contributes a
  volume state ``V_<name>`` and the pressure ``p = E(t) (V - V0)``;
* ``CapacitorNode``    — compliance node; pressure state ``p_<name>`` with
  ``C dp/dt = net inflow``;
* ``ResistorInductor`` — RL branch; flow state ``Q_<name>`` with
  ``L dQ/dt = p_from - p_to - R Q``;
* ``Resistor``         — algebraic branch ``Q = (p_from - p_to)/R``;
* ``Valve``            — ideal diode ``Q = (p_from - p_to)/R(sign)``;
* ``PressureSource``   — fixed/driven boundary node ``p(t)``.

Validated by reproducing the hand-written RSAFDQ2022 rhs to machine
precision (``tests/test_circuit_builder.py``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from thunderbolt_tpu.models.fluid.lumped import elastance


@dataclass(frozen=True)
class ElastanceChamber:
    """Time-varying elastance chamber: p = E(t)(V - V0), dV/dt = net inflow.

    ``pressure_given=False`` exposes the chamber pressure as an external
    input (the 3D-0D Lagrange multiplier) exactly like the
    ``*_pressure_given`` flags of the hand-written model."""
    name: str
    Epass: float
    Eactmax: float
    V0: float
    tC: float
    TC: float
    TR: float
    V_init: float = 0.0
    pressure_given: bool = True


@dataclass(frozen=True)
class CapacitorNode:
    name: str
    C: float
    p_init: float = 0.0


@dataclass(frozen=True)
class ResistorInductor:
    name: str
    node_from: str
    node_to: str
    R: float
    L: float
    Q_init: float = 0.0


@dataclass(frozen=True)
class Resistor:
    name: str
    node_from: str
    node_to: str
    R: float


@dataclass(frozen=True)
class Valve:
    """Ideal diode: R = Rmin when p_from > p_to else Rmax."""
    name: str
    node_from: str
    node_to: str
    Rmin: float = 1.0
    Rmax: float = 9.999e6


@dataclass(frozen=True)
class PressureSource:
    """Boundary node with prescribed pressure p(t) (constant or callable)."""
    name: str
    p: Any = 0.0


class CircuitBuilder:
    """Compose primitives, then ``build()`` a circuit model.

    State layout (fixed at build): chamber volumes in insertion order, then
    capacitor pressures, then RL flows — matching the hand-written
    RSAFDQ2022 layout when components are added in its order."""

    def __init__(self, THB: float = 800.0):
        self.THB = THB
        self.chambers: List[ElastanceChamber] = []
        self.capacitors: List[CapacitorNode] = []
        self.inductors: List[ResistorInductor] = []
        self.resistors: List[Resistor] = []
        self.valves: List[Valve] = []
        self.sources: List[PressureSource] = []

    def add(self, *components):
        for c in components:
            if isinstance(c, ElastanceChamber):
                self.chambers.append(c)
            elif isinstance(c, CapacitorNode):
                self.capacitors.append(c)
            elif isinstance(c, ResistorInductor):
                self.inductors.append(c)
            elif isinstance(c, Resistor):
                self.resistors.append(c)
            elif isinstance(c, Valve):
                self.valves.append(c)
            elif isinstance(c, PressureSource):
                self.sources.append(c)
            else:
                raise TypeError(f"unknown circuit component {type(c)}")
        return self

    def build(self) -> "SymbolicCircuitModel":
        node_names = ([c.name for c in self.chambers]
                      + [c.name for c in self.capacitors]
                      + [s.name for s in self.sources])
        if len(set(node_names)) != len(node_names):
            raise ValueError("duplicate node names in circuit")
        known = set(node_names)
        for br in (*self.inductors, *self.resistors, *self.valves):
            for n in (br.node_from, br.node_to):
                if n not in known:
                    raise ValueError(
                        f"branch {br.name!r} references unknown node {n!r}")
        return SymbolicCircuitModel(
            chambers=tuple(self.chambers),
            capacitors=tuple(self.capacitors),
            inductors=tuple(self.inductors),
            resistors=tuple(self.resistors),
            valves=tuple(self.valves),
            sources=tuple(self.sources),
            THB=self.THB,
        )


@dataclass(frozen=True)
class SymbolicCircuitModel:
    """A built circuit; satisfies the LumpedCircuitModel protocol."""
    chambers: Tuple[ElastanceChamber, ...]
    capacitors: Tuple[CapacitorNode, ...]
    inductors: Tuple[ResistorInductor, ...]
    resistors: Tuple[Resistor, ...]
    valves: Tuple[Valve, ...]
    sources: Tuple[PressureSource, ...]
    THB: float = 800.0

    # -- protocol ----------------------------------------------------------
    @property
    def nstates(self) -> int:
        return (len(self.chambers) + len(self.capacitors)
                + len(self.inductors))

    @property
    def state_symbols(self) -> Tuple[str, ...]:
        return tuple([f"V_{c.name}" for c in self.chambers]
                     + [f"p_{c.name}" for c in self.capacitors]
                     + [f"Q_{b.name}" for b in self.inductors])

    def num_unknown_pressures(self) -> int:
        return sum(int(not c.pressure_given) for c in self.chambers)

    def pressure_input_index(self, chamber: str) -> int:
        i = 0
        for c in self.chambers:
            if c.name == chamber:
                if c.pressure_given:
                    raise ValueError(f"{chamber} pressure is not external")
                return i
            if not c.pressure_given:
                i += 1
        raise KeyError(chamber)

    def volume_index(self, chamber: str) -> int:
        for i, c in enumerate(self.chambers):
            if c.name == chamber:
                return i
        raise KeyError(chamber)

    def default_initial_state(self) -> np.ndarray:
        return np.array([c.V_init for c in self.chambers]
                        + [c.p_init for c in self.capacitors]
                        + [b.Q_init for b in self.inductors])

    # -- evaluation --------------------------------------------------------
    def _node_pressures(self, u, t, external=()) -> Dict[str, Any]:
        p: Dict[str, Any] = {}
        iext = 0
        for i, c in enumerate(self.chambers):
            if c.pressure_given:
                E = elastance(t, c.Epass, c.Eactmax, c.tC, c.TC, c.TR,
                              self.THB)
                p[c.name] = E * (u[i] - c.V0)
            else:
                p[c.name] = external[iext]
                iext += 1
        nc = len(self.chambers)
        for j, cap in enumerate(self.capacitors):
            p[cap.name] = u[nc + j]
        for s in self.sources:
            p[s.name] = s.p(t) if callable(s.p) else jnp.asarray(s.p)
        return p

    def chamber_pressures(self, u, t, external=()):
        p = self._node_pressures(u, t, external)
        return tuple(p[c.name] for c in self.chambers)

    def rhs(self, u, t, external=()):
        p = self._node_pressures(u, t, external)
        nc, ncap = len(self.chambers), len(self.capacitors)

        # branch flows: RL states + algebraic resistors/diodes
        net: Dict[str, Any] = {n: 0.0 for n in p}
        flows = []
        for k, b in enumerate(self.inductors):
            Q = u[nc + ncap + k]
            net[b.node_from] = net[b.node_from] - Q
            net[b.node_to] = net[b.node_to] + Q
            flows.append((p[b.node_from] - p[b.node_to] - b.R * Q) / b.L)
        for b in self.resistors:
            Q = (p[b.node_from] - p[b.node_to]) / b.R
            net[b.node_from] = net[b.node_from] - Q
            net[b.node_to] = net[b.node_to] + Q
        for v in self.valves:
            dp = p[v.node_from] - p[v.node_to]
            Q = dp / jnp.where(dp > 0.0, v.Rmin, v.Rmax)
            net[v.node_from] = net[v.node_from] - Q
            net[v.node_to] = net[v.node_to] + Q

        du = ([net[c.name] for c in self.chambers]
              + [net[c.name] / c.C for c in self.capacitors]
              + flows)
        return jnp.stack([jnp.asarray(x, dtype=u.dtype) + 0.0 * u[0]
                          if np.isscalar(x) else x for x in du])


def build_rsafdq2022_circuit(**chamber_given) -> SymbolicCircuitModel:
    """The RSAFDQ2022 four-chamber circulation assembled from primitives —
    the analog of the prebuilt ``RSAFDQ2022CircuitMTK`` ``@mtkmodel``
    (``ext/mtkmodels.jl``). Reproduces ``RSAFDQ2022LumpedCircuitModel.rhs``
    to machine precision. ``chamber_given``: e.g. ``lv_pressure_given=False``
    to expose the LV pressure for 3D-0D coupling."""
    from thunderbolt_tpu.models.fluid.lumped import RSAFDQ2022LumpedCircuitModel
    m = RSAFDQ2022LumpedCircuitModel()  # reuse the published defaults
    given = {c: chamber_given.get(f"{c}_pressure_given", True)
             for c in ("la", "lv", "ra", "rv")}
    b = CircuitBuilder(THB=m.THB)
    b.add(
        ElastanceChamber("la", m.Epass_la, m.Eactmax_la, m.V0_la,
                         m.tC_la, m.TC_la, m.TR_la, V_init=65.0,
                         pressure_given=given["la"]),
        ElastanceChamber("lv", m.Epass_lv, m.Eactmax_lv, m.V0_lv,
                         m.tC_lv, m.TC_lv, m.TR_lv, V_init=120.0,
                         pressure_given=given["lv"]),
        ElastanceChamber("ra", m.Epass_ra, m.Eactmax_ra, m.V0_ra,
                         m.tC_ra, m.TC_ra, m.TR_ra, V_init=65.0,
                         pressure_given=given["ra"]),
        ElastanceChamber("rv", m.Epass_rv, m.Eactmax_rv, m.V0_rv,
                         m.tC_rv, m.TC_rv, m.TR_rv, V_init=145.0,
                         pressure_given=given["rv"]),
        CapacitorNode("sys_ar", m.Csys_ar, p_init=10.66),
        CapacitorNode("sys_ven", m.Csys_ven, p_init=4.0),
        CapacitorNode("pul_ar", m.Cpul_ar, p_init=4.67),
        CapacitorNode("pul_ven", m.Cpul_ven, p_init=3.2),
        ResistorInductor("sys_ar", "sys_ar", "sys_ven", m.Rsys_ar, m.Lsys_ar),
        ResistorInductor("sys_ven", "sys_ven", "ra", m.Rsys_ven, m.Lsys_ven),
        ResistorInductor("pul_ar", "pul_ar", "pul_ven", m.Rpul_ar, m.Lpul_ar),
        ResistorInductor("pul_ven", "pul_ven", "la", m.Rpul_ven, m.Lpul_ven),
        Valve("mv", "la", "lv", m.Rmin, m.Rmax),
        Valve("av", "lv", "sys_ar", m.Rmin, m.Rmax),
        Valve("tv", "ra", "rv", m.Rmin, m.Rmax),
        Valve("pv", "rv", "pul_ar", m.Rmin, m.Rmax),
    )
    return b.build()
