"""FiniteElementDiscretization: field -> (order, quadrature, constraints).

Parity: ``FiniteElementDiscretization(ips; dbcs, qrcs, ...)``
(``src/discretization/fem.jl:19-47``). The assembly-strategy knob of the
reference collapses away (SURVEY.md §2.9): there is exactly one TPU strategy
(vmapped element kernels + segment_sum).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import Dict, Optional, Sequence, Tuple, Union

import jax.numpy as jnp

from thunderbolt_tpu.fem.constraints import Dirichlet


@dataclass(frozen=True)
class FieldSpec:
    order: int = 1
    ncomponents: int = 1
    subdomains: Union[None, str, Tuple[str, ...]] = None


@dataclass
class FiniteElementDiscretization:
    """Declarative spatial discretization choice.

    fields: name -> order (int) or FieldSpec.
    dbcs: strong Dirichlet conditions.
    quadrature: name -> integration degree override (default 2*order,
      matching the reference's default rule policy, fem.jl:52-79).
    dtype: device dtype of states and operators (f32 default on TPU; the
      reference similarly runs f32 on GPU, tutorials ep01:157-172).
    """

    fields: Dict[str, Union[int, FieldSpec]]
    dbcs: Sequence[Dirichlet] = ()
    quadrature: Dict[str, int] = dfield(default_factory=dict)
    dtype: object = jnp.float32

    def __post_init__(self):
        # honoring an explicit float64 request requires the x64 flag;
        # without it jax silently truncates to f32 (and spams warnings)
        import jax
        if self.dtype == jnp.float64 and not jax.config.jax_enable_x64:
            jax.config.update("jax_enable_x64", True)

    def field_spec(self, name) -> FieldSpec:
        v = self.fields[name]
        if isinstance(v, FieldSpec):
            return v
        return FieldSpec(order=int(v))

    def degree_for(self, name) -> Optional[int]:
        return self.quadrature.get(name)
