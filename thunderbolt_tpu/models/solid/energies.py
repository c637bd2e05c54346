"""Hyperelastic strain-energy catalog (per-qp, jnp, differentiable).

Parity: ``src/modeling/solid/energies.jl`` — the published energies with the
reference's default parameterizations: ``HolzapfelOgden2009Model``
(``energies.jl:136``), ``Guccione1991PassiveModel`` (``:284``),
``LinYinPassiveModel``/``LinYinActiveModel`` (``:178,207``),
``HumphreyStrumpfYinModel`` (``:235``), ``TransverseIsotopicNeoHookeanModel``
(``:93``), ``BioNeoHookean`` (``:461``), ``LinearSpringModel`` (``:293``),
compression penalties (``:13-90``).

TPU-native: every model is ``psi(F, frame) -> scalar`` traced under vmap;
stresses and tangents come from ``jax.grad``/``jax.jacfwd`` (the analog of
the reference's ``Tensors.hessian`` AD design, ``materials.jl:302-573``).
`frame` is a [k, 3] row-stack (f, s, n) — rows beyond what a model needs are
ignored. Tension-only fiber terms use `where` masks whose gradients vanish
at the switch point, so AD stays exact.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import Any

import jax.numpy as jnp

from thunderbolt_tpu.utils.smallmat import (
    det_small, mtm, mv, vtmv, vdot, trace3)


def invariants(F, frame=None):
    """Common invariants of C = F^T F (+ fiber invariants when frame given)."""
    C = mtm(F)
    I1 = trace3(C)
    I3 = det_small(C)
    out = {"C": C, "I1": I1, "I3": I3, "J": jnp.sqrt(I3)}
    # VPU broadcast-reduces (smallmat): under the package's "highest"
    # matmul precision, 3x3 dot_generals lower to multi-pass MXU ops
    # measured 4-40x slower in the AD hot path.
    if frame is not None:
        f0 = frame[0]
        out["I4f"] = vtmv(f0, C, f0)
        if frame.shape[0] > 1:
            s0 = frame[1]
            out["I4s"] = vtmv(s0, C, s0)
            out["I8fs"] = (vtmv(f0, C, s0) + vtmv(s0, C, f0)) / 2.0
    return out


# ---------------------------------------------------------------------------
# compression penalties U(I3)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class NullCompressionPenalty:
    def U(self, I3):
        return 0.0


@dataclass(frozen=True)
class HartmannNeffCompressionPenalty1:
    """U = beta (I3^b + I3^-b - 2)^a — Hartmann & Neff 2003, table 3 entry 1."""
    a: float = 1.0
    b: float = 2.0
    beta: float = 1.0

    def U(self, I3):
        base = I3 ** self.b + I3 ** (-self.b) - 2.0
        # static integer exponents avoid the AD 0*inf trap of x**float at
        # the rest state (d2/dx2 x**1.0 -> 0 * x**-1)
        if float(self.a) == int(self.a):
            out = 1.0
            for _ in range(int(self.a)):
                out = out * base
            return self.beta * out
        return self.beta * base ** self.a


@dataclass(frozen=True)
class HartmannNeffCompressionPenalty2:
    """U = beta (sqrt(I3) - 1)^a — Hartmann & Neff 2003, entry 2."""
    a: float = 1.1
    beta: float = 1.0

    def U(self, I3):
        return self.beta * (jnp.sqrt(I3) - 1.0) ** self.a


@dataclass(frozen=True)
class HartmannNeffCompressionPenalty3:
    """U = beta (I3 - 2 log J + 4 (log J)^2 - 1) — Hartmann & Neff 2003,
    entry 3."""
    beta: float = 1.0

    def U(self, I3):
        lJ = 0.5 * jnp.log(I3)
        return self.beta * (I3 - 2.0 * lJ + 4.0 * lJ ** 2 - 1.0)


@dataclass(frozen=True)
class SimpleCompressionPenalty:
    """U = beta (I3 - 1 - 2 log J)."""
    beta: float = 1.0

    def U(self, I3):
        return self.beta * (I3 - 1.0 - jnp.log(I3))


# ---------------------------------------------------------------------------
# energies
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class NullEnergyModel:
    def psi(self, F, frame):
        return 0.0


@dataclass(frozen=True)
class HolzapfelOgden2009Model:
    """Orthotropic passive myocardium (Holzapfel & Ogden 2009), with the
    isochoric I1 and tension-only I4 terms as in the reference."""
    a: float = 0.059
    b: float = 8.023
    a_f: float = 18.472
    b_f: float = 16.026
    a_s: float = 2.581
    b_s: float = 11.120
    a_fs: float = 0.216
    b_fs: float = 11.436
    mpU: Any = SimpleCompressionPenalty()

    def psi(self, F, frame):
        iv = invariants(F, frame)
        I1bar = iv["I1"] / jnp.cbrt(iv["I3"])
        I4f, I4s, I8fs = iv["I4f"], iv["I4s"], iv["I8fs"]
        psi = (self.a / (2 * self.b) * (jnp.exp(self.b * (I1bar - 3.0)) - 1.0)
               + self.a_fs / (2 * self.b_fs)
               * (jnp.exp(self.b_fs * I8fs ** 2) - 1.0)
               + self.mpU.U(iv["I3"]))
        e4f = I4f - 1.0
        psi = psi + jnp.where(
            e4f >= 0.0,
            self.a_f / (2 * self.b_f) * (jnp.exp(self.b_f * e4f ** 2) - 1.0),
            0.0)
        e4s = I4s - 1.0
        psi = psi + jnp.where(
            e4s >= 0.0,
            self.a_s / (2 * self.b_s) * (jnp.exp(self.b_s * e4s ** 2) - 1.0),
            0.0)
        return psi


@dataclass(frozen=True)
class Guccione1991PassiveModel:
    """Orthotropic Fung-type exponential (Guccione, McCulloch & Waldman
    1991); defaults as in the reference (Zheng et al. 2023)."""
    C0: float = 0.1
    Bff: float = 29.8
    Bss: float = 14.9
    Bnn: float = 14.9
    Bns: float = 9.3
    Bfs: float = 19.2
    Bfn: float = 14.4
    mpU: Any = SimpleCompressionPenalty(50.0)

    def psi(self, F, frame):
        f0, s0, n0 = frame[0], frame[1], frame[2]
        C = mtm(F)
        I3 = det_small(C)
        E = 0.5 * (C - jnp.eye(3, dtype=F.dtype))
        Eff = vtmv(f0, E, f0)
        Ess = vtmv(s0, E, s0)
        Enn = vtmv(n0, E, n0)
        Efs = vtmv(f0, E, s0)
        Esn = vtmv(s0, E, n0)
        Efn = vtmv(f0, E, n0)
        Q = (self.Bff * Eff ** 2 + self.Bss * Ess ** 2 + self.Bnn * Enn ** 2
             + 2 * self.Bns * Esn ** 2 + 2 * self.Bfs * Efs ** 2
             + 2 * self.Bfn * Efn ** 2)
        return self.C0 * jnp.exp(Q) / 2.0 + self.mpU.U(I3)


@dataclass(frozen=True)
class LinYinPassiveModel:
    """Lin & Yin 1998 passive transverse-isotropic Fung model."""
    C1: float = 1.05
    C2: float = 9.13
    C3: float = 2.32
    C4: float = 0.08
    mpU: Any = SimpleCompressionPenalty()

    def psi(self, F, frame):
        iv = invariants(F, frame)
        I1, I3, I4 = iv["I1"], iv["I3"], iv["I4f"]
        Q = (self.C2 * (I1 - 3) ** 2 + self.C3 * (I1 - 3) * (I4 - 1)
             + self.C4 * (I4 - 1) ** 2)
        return self.C1 * (jnp.exp(Q) - 1.0) + self.mpU.U(I3)


@dataclass(frozen=True)
class LinYinActiveModel:
    """Lin & Yin 1998 active-state polynomial model."""
    C0: float = 0.0
    C1: float = -13.03
    C2: float = 36.65
    C3: float = 35.42
    C4: float = 15.52
    C5: float = 1.62
    mpU: Any = SimpleCompressionPenalty()

    def psi(self, F, frame):
        iv = invariants(F, frame)
        I1, I3, I4 = iv["I1"], iv["I3"], iv["I4f"]
        return (self.C0 + self.C1 * (I1 - 3) * (I4 - 1)
                + self.C2 * (I1 - 3) ** 2 + self.C3 * (I4 - 1) ** 2
                + self.C4 * (I1 - 3) + self.C5 * (I4 - 1)
                + self.mpU.U(I3))


@dataclass(frozen=True)
class HumphreyStrumpfYinModel:
    """Humphrey, Strumpf & Yin 1990 transverse-isotropic model."""
    C1: float = 15.93
    C2: float = 55.85
    C3: float = 3.59
    C4: float = 30.21
    mpU: Any = SimpleCompressionPenalty()

    def psi(self, F, frame):
        iv = invariants(F, frame)
        I1, I3 = iv["I1"], iv["I3"]
        sI4 = jnp.sqrt(iv["I4f"])
        return (self.C1 * (sI4 - 1) ** 2 + self.C2 * (sI4 - 1) ** 3
                + self.C3 * (sI4 - 1) * (I1 - 3) + self.C4 * (I1 - 3) ** 2
                + self.mpU.U(I3))


@dataclass(frozen=True)
class TransverseIsotopicNeoHookeanModel:
    """Polynomial transverse-isotropic Neo-Hookean-type model."""
    a1: float = 2.6
    a2: float = 2.82
    alpha1: float = 30.48
    alpha2: float = 7.25
    mpU: Any = HartmannNeffCompressionPenalty1()

    def psi(self, F, frame):
        iv = invariants(F, frame)
        I1bar = iv["I1"] / jnp.cbrt(iv["I3"])
        # clamp numerical noise below the stress-free state
        I1bar = jnp.maximum(I1bar, 3.0)
        I4 = iv["I4f"]
        psi = self.alpha1 * (I1bar - 3.0) ** self.a1 + self.mpU.U(iv["I3"])
        psi = psi + jnp.where(I4 >= 1.0,
                              self.alpha2 * jnp.abs(I4 - 1.0) ** self.a2, 0.0)
        return psi


@dataclass(frozen=True)
class BioNeoHookean:
    """psi = alpha (I1bar - 3) + U(I3)."""
    alpha: float = 1.0
    mpU: Any = SimpleCompressionPenalty()

    def psi(self, F, frame):
        iv = invariants(F)
        return (self.alpha * (iv["I1"] / jnp.cbrt(iv["I3"]) - 3.0)
                + self.mpU.U(iv["I3"]))


@dataclass(frozen=True)
class NeoHookeanModel:
    """Compressible Neo-Hooke: mu/2 (I1 - 3 - 2 log J) + lambda/2 (log J)^2
    (standard form; used for Poisson-free verification problems)."""
    mu: float = 1.0
    lam: float = 1.0

    def psi(self, F, frame=None):
        C = mtm(F)
        I1 = trace3(C)
        J = det_small(F)
        lJ = jnp.log(J)
        return 0.5 * self.mu * (I1 - 3.0 - 2.0 * lJ) + 0.5 * self.lam * lJ ** 2


@dataclass(frozen=True)
class LinearSpringModel:
    """psi = eta/2 (I4 - 1)^2 — linear fiber spring for tests."""
    eta: float = 10.0

    def psi(self, F, frame):
        f0 = frame[0]
        Ff = mv(F, f0)
        I4 = vdot(Ff, Ff)
        return self.eta / 2.0 * (I4 - 1.0) ** 2


@dataclass(frozen=True)
class SimpleActiveSpring:
    """Active-strain fiber spring psi(Fe) = a_f/2 (I4e - 1)^2 (Goektepe,
    Menzel & Kuhl 2014)."""
    a_f: float = 1.0

    def psi(self, F, frame):
        f0 = frame[0]
        Ff = mv(F, f0)
        I4 = vdot(Ff, Ff)
        return self.a_f / 2.0 * (I4 - 1.0) ** 2
