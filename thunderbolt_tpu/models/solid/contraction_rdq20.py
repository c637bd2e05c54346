"""RDQ20-MF: mean-field sarcomere model of Regazzoni, Dede & Quarteroni 2020.

Parity: ``RDQ20MFModel`` (``src/modeling/solid/contraction.jl:337-640``) —
the published 20-state model ("Biophysically detailed mathematical models of
multiscale cardiac active mechanics", PLOS Comput Biol 2020): a 16-state
regulatory-unit (RU) Markov chain (2 tropomyosin states x 2 calcium states
per triplet neighborhood) + 4 crossbridge (XB) distribution moments.

Array-native: the state is ``Q[20, ...]`` (RU occupancies as a flattened
[2,2,2,2] tensor, then the XB moments); ``rhs`` is branch-free jnp so it
vmaps over quadrature points and differentiates (the AD path replaces the
reference's ForwardDiff local Jacobians, ``multilevel_newton_raphson.jl``).

Active tension: T_a = a_XB (XB[1] + XB[3]) * single-overlap(lambda)
(``contraction.jl:617``); activation scale N = same quantity
(``contraction.jl:628-640``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from thunderbolt_tpu.utils.smallmat import mv, vdot


def smooth_abs(v, eps):
    """C1 regularization of |v| (parity: ``smooth_abs``, src/utils.jl:580)."""
    return jnp.sqrt(v * v + eps * eps)


@dataclass(frozen=True)
class RDQ20MFModel:
    # geometric parameters (um)
    LA: float = 1.25
    LM: float = 1.65
    LB: float = 0.18
    SL0: float = 2.2
    # RU steady-state parameters
    Q: float = 2.0
    Kd0: float = 0.381
    alphaKd: float = -0.571
    mu: float = 10.0
    gamma: float = 12.0
    # RU kinetics (1/ms)
    Koff: float = 0.1
    Kbasic: float = 0.013
    # XB cycling (1/ms)
    r0: float = 0.13431
    alpha: float = 25.184
    mu0_fP: float = 0.032653
    mu1_fP: float = 0.000778
    # upscaling (kPa)
    a_XB: float = 22.894e3
    # |dlambda/dt| regularization width
    eps_v: float = 1.0e-6

    nstates = 20
    state_symbols = tuple(f"RU{i}" for i in range(16)) + (
        "XB0", "XB1", "XB2", "XB3")

    rate_dependent = True

    def default_initial_state(self):
        q = np.zeros(20)
        q[0] = 1.0  # all RUs in (blocked, blocked, blocked, unbound)
        return q

    # ------------------------------------------------------------------

    def _transition_rates(self):
        """dT[TL, TC, TR, CC] of the RU chain (``contraction.jl:383``)."""
        dT = np.zeros((2, 2, 2, 2))
        for TL in range(2):
            for TC in range(2):
                for TR in range(2):
                    for CC in range(2):
                        pn = TL + TR  # permissive neighbors (0-based)
                        if TC == 1:
                            dT[TL, TC, TR, CC] = (
                                self.Kbasic * self.gamma ** (2 - pn))
                        elif CC == 0:
                            dT[TL, TC, TR, CC] = (
                                self.Q * self.Kbasic * self.gamma ** pn
                                / self.mu)
                        else:
                            dT[TL, TC, TR, CC] = (
                                self.Q * self.Kbasic * self.gamma ** pn)
        return dT

    def _ru_rhs(self, uRU, lam, Ca):
        """RU chain rates; uRU [2,2,2,2, ...] (``rhs_fast``)."""
        SL = self.SL0 * lam
        dC1 = self.Koff / (self.Kd0 - self.alphaKd * (2.15 - SL)) * Ca
        koff = jnp.broadcast_to(jnp.asarray(self.Koff, uRU.dtype), dC1.shape)
        dC = jnp.stack([jnp.stack([dC1, dC1]),
                        jnp.stack([koff, koff / self.mu])])  # [CC, TC, ...]

        dT = jnp.asarray(self._transition_rates(), uRU.dtype)
        shape_tail = (1,) * (uRU.ndim - 4)
        dTb = dT.reshape(dT.shape + shape_tail)

        PhiT_C = uRU * dTb
        # dC indexed [CC, TC]: factor[TL, TC, TR, CC, ...] = dC[CC, TC, ...]
        dC_full = jnp.swapaxes(dC, 0, 1)[None, :, None]  # [1, TC, 1, CC, ..]
        PhiC_C = uRU * dC_full

        suRU4 = uRU.sum(axis=3)           # [TL, TC, TR, ...]
        sPhiT4 = PhiT_C.sum(axis=3)

        # left-unit rates: sum over TR
        flux_L = sPhiT4.sum(axis=2)       # [TL, TC, ...]
        prob_L = suRU4.sum(axis=2)
        dT_L = jnp.where(prob_L > 1e-12, flux_L / jnp.maximum(prob_L, 1e-12),
                         0.0)             # [TL, TC, ...] (center flips TL)
        # right-unit rates: sum over TL
        flux_R = sPhiT4.sum(axis=0)       # [TC, TR, ...]
        prob_R = suRU4.sum(axis=0)
        dT_R = jnp.where(prob_R > 1e-12, flux_R / jnp.maximum(prob_R, 1e-12),
                         0.0)             # [TC, TR, ...]

        # fluxes of the external units: note the reference's index flip —
        # the LEFT unit's own transition rate is looked up at (TC=TL_state):
        # PhiT_L[TL,TC,TR,CC] = uRU * dT_L[TC_center, TL]
        PhiT_L = uRU * jnp.moveaxis(dT_L, (0, 1), (1, 0))[:, :, None, None]
        PhiT_R = uRU * dT_R.swapaxes(0, 1)[None, :, :, None]

        def flip(A, axis):
            return jnp.flip(A, axis=axis)

        dRU = (-PhiT_L + flip(PhiT_L, 0)
               - PhiT_C + flip(PhiT_C, 1)
               - PhiT_R + flip(PhiT_R, 2)
               - PhiC_C + flip(PhiC_C, 3))
        return dRU, dT

    def rhs(self, Q, lam, dlam_dt, Ca, t):
        """dQ/dt for Q [20, ...] given stretch, stretch rate, calcium.

        Parity: ``sarcomere_rhs!`` (``contraction.jl:532-583``)."""
        tail = Q.shape[1:]
        uRU = Q[:16].reshape((2, 2, 2, 2) + tail)
        uXB = Q[16:20]
        dRU, dT = self._ru_rhs(uRU, lam, Ca)

        shape_tail = (1,) * len(tail)
        dTb = jnp.asarray(self._transition_rates(), Q.dtype
                          ).reshape((2, 2, 2, 2) + shape_tail)
        permissivity = uRU[:, 1].sum(axis=(0, 1, 2))
        flux_PN = (uRU[:, 1] * dTb[:, 1]).sum(axis=(0, 1, 2))
        flux_NP = (uRU[:, 0] * dTb[:, 0]).sum(axis=(0, 1, 2))
        k_PN = jnp.where(permissivity >= 1e-12,
                         flux_PN / jnp.maximum(permissivity, 1e-12), 0.0)
        k_NP = jnp.where(1.0 - permissivity >= 1e-12,
                         flux_NP / jnp.maximum(1.0 - permissivity, 1e-12),
                         0.0)
        r = self.r0 + self.alpha * smooth_abs(dlam_dt, self.eps_v)
        diag_P = r + k_PN
        diag_N = r + k_NP
        x0, x1, x2, x3 = uXB[0], uXB[1], uXB[2], uXB[3]
        dXB0 = -diag_P * x0 + k_NP * x2 + self.mu0_fP * permissivity
        dXB1 = dlam_dt * x0 - diag_P * x1 + k_NP * x3 \
            + self.mu1_fP * permissivity
        dXB2 = k_PN * x0 - diag_N * x2
        dXB3 = k_PN * x1 + dlam_dt * x2 - diag_N * x3
        dXB = jnp.stack([dXB0, dXB1, dXB2, dXB3])
        return jnp.concatenate([dRU.reshape((16,) + tail), dXB])

    # ------------------------------------------------------------------

    def fraction_single_overlap(self, lam):
        """Piecewise-linear filament overlap (``contraction.jl:598``)."""
        SL = lam * self.SL0
        LMh = (self.LM - self.LB) * 0.5
        out = jnp.where(
            (SL > self.LA) & (SL <= self.LM),
            (SL - self.LA) / LMh,
            jnp.where(
                (SL > self.LM) & (SL <= 2 * self.LA - self.LB),
                (SL + self.LM - 2 * self.LA) * 0.5 / LMh,
                jnp.where(
                    (SL > 2 * self.LA - self.LB)
                    & (SL <= 2 * self.LA + self.LB),
                    1.0,
                    jnp.where(
                        (SL > 2 * self.LA + self.LB)
                        & (SL <= 2 * self.LA + self.LM),
                        (self.LM + 2 * self.LA - SL) * 0.5 / LMh,
                        0.0))))
        return out

    def compute_active_tension(self, Q, lam):
        return self.a_XB * (Q[17] + Q[19]) * self.fraction_single_overlap(lam)

    def compute_active_stiffness(self, Q, lam):
        return self.a_XB * (Q[16] + Q[18]) * self.fraction_single_overlap(lam)

    def activation_scale(self, Q, F=None, frame=None):
        """N(Q, F): (XB1 + XB3) * overlap(|F f0|) (``contraction.jl:628``)."""
        if F is None:
            return Q[17] + Q[19]
        f = mv(F, frame[0])
        lam = jnp.sqrt(vdot(f, f))
        return (Q[17] + Q[19]) * self.fraction_single_overlap(lam)

    def local_solve(self, Qprev, lam, lam_prev, Ca, t, dt, iters=4):
        """Backward-Euler local solve for the condensed state:
        find Q with (Q - Qprev)/dt = rhs(Q, lam, dlam, Ca).

        Fixed-iteration Newton in jnp — differentiating THROUGH this solver
        (jacfwd over lam/F upstream) yields the exact condensed consistent
        tangent, the TPU-native form of the reference's multilevel Newton
        (``src/solver/nonlinear/multilevel_newton_raphson.jl``; SURVEY.md §7
        "per-qp local Newton ... fixed iteration counts under vmap")."""
        dlam = (lam - lam_prev) / dt

        def res(Q):
            return Q - Qprev - dt * self.rhs(Q, lam, dlam, Ca, t + dt)

        Q = Qprev
        for _ in range(iters):
            J = jax.jacfwd(res)(Q)        # [20, 20]
            r = res(Q)
            Q = Q - jnp.linalg.solve(J, r)
        return Q


@dataclass(frozen=True)
class AsRateIndependent:
    """Evaluate a rate-dependent sarcomere at zero shortening velocity
    (``contraction.jl:107-139``)."""
    model: Any

    rate_dependent = False

    @property
    def nstates(self):
        return self.model.nstates

    def default_initial_state(self):
        return self.model.default_initial_state()

    def rhs(self, Q, lam, dlam_dt, Ca, t):
        return self.model.rhs(Q, lam, jnp.zeros_like(jnp.asarray(dlam_dt)),
                              Ca, t)

    def compute_active_tension(self, Q, lam):
        return self.model.compute_active_tension(Q, lam)

    def activation_scale(self, Q, F=None, frame=None):
        return self.model.activation_scale(Q, F, frame)

    def fraction_single_overlap(self, lam):
        return self.model.fraction_single_overlap(lam)

    def local_solve(self, Qprev, lam, lam_prev, Ca, t, dt, iters=4):
        return self.model.local_solve(Qprev, lam, lam, Ca, t, dt, iters)


@dataclass(frozen=True)
class StandaloneSarcomereModel:
    """Drive a sarcomere model with prescribed stretch/velocity/calcium
    histories (``contraction.jl:152-163``) — the fitting/testing harness."""
    model: Any
    calcium: Any         # t -> Ca
    fiber_stretch: Any   # t -> lambda
    fiber_velocity: Any  # t -> dlambda/dt

    def rhs(self, Q, t):
        return self.model.rhs(Q, self.fiber_stretch(t),
                              self.fiber_velocity(t), self.calcium(t), t)
