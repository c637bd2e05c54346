"""Active deformation-gradient and active-stress components.

Parity: ``src/modeling/solid/active.jl`` — ``ActiveMaterialAdapter``
(``:4``), ``GMKActiveDeformationGradientModel`` (``:29``),
``GMKIncompressibleActiveDeformationGradientModel`` (``:51``),
``RLRSQActiveDeformationGradientModel`` (``:74``), ``SimpleActiveStress``
(``:100``), ``PiersantiActiveStress`` (``:116``),
``Guccione1993ActiveModel`` (``:141``) — the published formulations
(Goektepe-Menzel-Kuhl 2014; Rossi et al. 2014; Piersanti et al. 2022;
Guccione-Waldman-McCulloch 1993), array-native per qp.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp

from thunderbolt_tpu.utils.smallmat import inv_small, mmul, mv, vdot


def _outer(a, b):
    return a[:, None] * b[None, :]


# ---------------------------------------------------------------------------
# active deformation gradients F^a(lambda_a, frame)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class GMKActiveDeformationGradientModel:
    """F^a = I + (lambda_a - 1) f0 (x) f0."""

    def compute_Fa(self, lam_a, frame):
        f0 = frame[0]
        return jnp.eye(3, dtype=f0.dtype) + (lam_a - 1.0) * _outer(f0, f0)


@dataclass(frozen=True)
class GMKIncompressibleActiveDeformationGradientModel:
    """F^a = lam f0f0 + (s0s0 + n0n0)/sqrt(lam)."""

    def compute_Fa(self, lam_a, frame):
        f0, s0, n0 = frame[0], frame[1], frame[2]
        return (lam_a * _outer(f0, f0)
                + (_outer(s0, s0) + _outer(n0, n0)) / jnp.sqrt(lam_a))


@dataclass(frozen=True)
class RLRSQActiveDeformationGradientModel:
    """Rossi et al. 2014: F^a = lam f0f0 + (1+k(lam-1)) s0s0
    + 1/((1+k(lam-1)) lam) n0n0."""
    sheetlet_part: float = 0.75

    def compute_Fa(self, lam_a, frame):
        f0, s0, n0 = frame[0], frame[1], frame[2]
        ks = 1.0 + self.sheetlet_part * (lam_a - 1.0)
        return (lam_a * _outer(f0, f0) + ks * _outer(s0, s0)
                + 1.0 / (ks * lam_a) * _outer(n0, n0))


# ---------------------------------------------------------------------------
# active stress tensors T^a(F, frame)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class SimpleActiveStress:
    """T^a = Tmax (F f0)(x)f0 / |F f0| (scaled by the activation outside)."""
    Tmax: float = 1.0

    def stress(self, F, frame):
        f0 = frame[0]
        Ff = mv(F, f0)
        return self.Tmax * _outer(Ff, f0) / jnp.sqrt(vdot(Ff, Ff))


@dataclass(frozen=True)
class PiersantiActiveStress:
    """Piersanti et al. 2022 (Eq. 3): weighted fiber/sheet/normal dyads."""
    Tmax: float = 1.0
    pf: float = 1.0
    ps: float = 0.75
    pn: float = 0.0

    def stress(self, F, frame):
        f0, s0, n0 = frame[0], frame[1], frame[2]
        Ff, Fs, Fn = mv(F, f0), mv(F, s0), mv(F, n0)
        return self.Tmax * (
            self.pf * _outer(Ff, f0) / jnp.sqrt(vdot(Ff, Ff))
            + self.ps * _outer(Fs, s0) / jnp.sqrt(vdot(Fs, Fs))
            + self.pn * _outer(Fn, n0) / jnp.sqrt(vdot(Fn, Fn)))


@dataclass(frozen=True)
class Guccione1993ActiveModel:
    """Guccione, Waldman & McCulloch 1993 length-dependent active tension."""
    Tmax: float = 135.0   # kPa
    l0: float = 1.45      # um
    lR: float = 1.8       # um
    Ca0: float = 4.35     # uM
    Ca0max: float = 4.35  # uM
    B: float = 3.8        # 1/um

    def stress(self, F, frame):
        f0 = frame[0]
        Ff = mv(F, f0)
        lam_f = jnp.sqrt(vdot(Ff, Ff))
        l = self.lR * lam_f
        ECa50sq = self.Ca0max ** 2 / (jnp.exp(self.B * (l - self.l0)) - 1.0)
        T0 = self.Tmax * self.Ca0 ** 2 / (self.Ca0 ** 2 + ECa50sq)
        return T0 * _outer(Ff / lam_f, f0)


@dataclass(frozen=True)
class ActiveMaterialAdapter:
    """Use a passive energy as the active-strain energy: psi_a =
    psi(Fe, pushed-forward frame) with Fe = F (F^a)^-1 (``active.jl:4``)."""
    mat: Any

    def psi(self, F, Fa, frame):
        Fa_inv = inv_small(Fa)
        Fe = mmul(F, Fa_inv)
        rows = [mv(Fa, frame[i]) for i in range(frame.shape[0])]
        tilde = jnp.stack([r / jnp.sqrt(vdot(r, r)) for r in rows])
        return self.mat.psi(Fe, tilde)
