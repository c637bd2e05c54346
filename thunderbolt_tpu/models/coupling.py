"""3D-0D fluid-solid coupling descriptors (chamber volume tying).

Parity: ``src/modeling/coupler/fsi.jl`` (``ChamberVolumeCoupling:4``,
``LumpedFluidSolidCoupler:28``) and ``src/modeling/rsafdq2022.jl``
(``RSAFDQ2022Model:125``, ``RSAFDQ2022Split:138``, surrogate volume
integral ``:75-87``): each chamber surface gets a Lagrange-multiplier
pressure dof tying the 3D cavity volume to the 0D circuit volume; the
multiplier is simultaneously the chamber pressure driving the circuit.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import Any, Tuple

import numpy as np
import jax.numpy as jnp


@dataclass(frozen=True)
class RSAFDQ2022SurrogateVolume:
    """V = -integral det(F) ((h (x) h)(x + d - b)) . (F^-T N) dGamma —
    the axis-projected volume surrogate of Regazzoni et al. 2022
    (``rsafdq2022.jl:75-87``). `h`: the measuring axis; `b`: a base point
    below the chamber."""
    h: Tuple[float, float, float] = (0.0, 1.0, 0.0)
    b: Tuple[float, float, float] = (0.0, 0.0, -0.1)

    def facet_volume(self, batch, uf, Xf):
        """Volume contribution of ONE facet (differentiable in uf)."""
        h = jnp.asarray(self.h, batch.N.dtype)
        b = jnp.asarray(self.b, batch.N.dtype)
        nda = batch.normal_da(Xf, uf)              # deformed normal*area
        x = jnp.einsum("qb,bs->qs", batch.Ngeo, Xf)
        d = jnp.einsum("qb,bs->qs", batch.N, uf)
        proj = (x + d - b[None]) @ h               # [nqp]
        return -jnp.sum(proj * (nda @ h) * batch.wq)


@dataclass(frozen=True)
class Hirschvogel2017SurrogateVolume:
    """V = -integral (x + d) . n da over the chamber surface (deformed
    normal via Nanson, det(F) F^-T N) — Hirschvogel et al. 2017
    (``fsi.jl:53-58``). Assumes a convex chamber closed by a valvular
    plane at z = 0 with no apicobasal displacement there."""

    def facet_volume(self, batch, uf, Xf):
        """Volume contribution of ONE facet (differentiable in uf)."""
        nda = batch.normal_da(Xf, uf)              # deformed normal*area
        x = jnp.einsum("qb,bs->qs", batch.Ngeo, Xf)
        d = jnp.einsum("qb,bs->qs", batch.N, uf)
        return -jnp.sum(jnp.sum((x + d) * nda, axis=-1) * batch.wq)


@dataclass(frozen=True)
class ConstantChamberVolume:
    """Locked chamber volume (``fsi.jl:33-41``): the volume 'integral' is
    the given constant, so dV/du = 0 and the multiplier only transmits
    pressure. Used with dummy circuits to pin a cavity volume."""
    volume: float = 0.0

    def facet_volume(self, batch, uf, Xf):
        # constant split uniformly over facets; zero gradient by AD
        return (jnp.asarray(self.volume, uf.dtype) / batch.nfacets
                + 0.0 * jnp.sum(uf))


@dataclass(frozen=True)
class ChamberVolumeCoupling:
    """Couple a chamber surface facetset to a 0D chamber
    (``fsi.jl:4``)."""
    chamber_surface_setname: str
    lumped_model_symbol: str     # "lv" / "rv" / "la" / "ra"
    pressure_symbol: str = None  # published name of the multiplier

    @property
    def psym(self):
        return self.pressure_symbol or f"p_{self.lumped_model_symbol}"


@dataclass(frozen=True)
class LumpedFluidSolidCoupler:
    """Bundle of chamber couplings + the solid field they act on
    (``fsi.jl:28``)."""
    chamber_couplings: Tuple
    displacement_symbol: str = "displacement"
    volume_method: Any = RSAFDQ2022SurrogateVolume()


@dataclass(frozen=True)
class RSAFDQ2022Model:
    """structural model + 0D circuit + coupler (``rsafdq2022.jl:125``)."""
    structural_model: Any
    circuit_model: Any
    coupler: LumpedFluidSolidCoupler


@dataclass(frozen=True)
class RSAFDQ2022Split:
    """Solve the coupled model with the 3D/0D operator split
    (``rsafdq2022.jl:138``)."""
    model: RSAFDQ2022Model


def compute_chamber_volume(dh, u, facetset: str, field: str = None,
                           method: Any = None):
    """Deformed chamber cavity volume from the displacement field ``u``
    over the chamber surface ``facetset`` (parity:
    ``compute_chamber_volume``, ``src/modeling/rsafdq2022.jl:22-64``).

    ``dh``: the DofHandler of the structural function; ``u``: full solution
    vector (only the facet dofs are gathered). Uses the axis-projected
    surrogate integral (``RSAFDQ2022SurrogateVolume``) by default.
    """
    import jax
    from thunderbolt_tpu.fem.facets import make_facet_batch

    if field is None:
        field = next(iter(dh.fields))
    if method is None:
        method = RSAFDQ2022SurrogateVolume()
    batch = make_facet_batch(dh, field, facetset, dtype=jnp.asarray(u).dtype)
    U = jnp.asarray(u)[batch.facet_dofs].reshape(
        batch.facet_dofs.shape[0], -1, batch.ncomp)
    vols = jax.vmap(lambda uf, Xf: method.facet_volume(batch, uf, Xf))(
        U, batch.Xf)
    return jnp.sum(vols)
