"""Named access to solution vectors.

Parity: ``src/modeling/solution_variables.jl`` — ``solution_variables``,
``getvariable`` (``:339``), ``setvariable!`` (``:366-392``),
``create_initial_condition`` (``src/modeling/functions.jl:319``). Functional
(returns new arrays) since JAX state is immutable.
"""

from __future__ import annotations

from typing import Callable, Union

import numpy as np
import jax.numpy as jnp

from thunderbolt_tpu.disc.functions import (
    AffineODEFunction, PointwiseODEFunction, GenericSplitFunction,
    VariableInfo,
)


def solution_variable_names(fn):
    return tuple(fn.variables().keys())


def solution_variable(fn, name) -> VariableInfo:
    return fn.variables()[name]


def create_initial_condition(fn, dtype=jnp.float32):
    """Allocate u0 filled with every submodel's default initial state
    (``functions.jl:319``)."""
    if isinstance(fn, GenericSplitFunction):
        u0 = np.zeros(fn.solution_size, dtype=np.float64)
        for sub, rng in zip(fn.functions, fn.ranges):
            if isinstance(sub, PointwiseODEFunction):
                init = sub.ion.initial_state_array(sub.npoints, np.float64)
                u0[rng] = init.reshape(-1)
        return jnp.asarray(u0, dtype)
    return jnp.zeros(fn.solution_size, dtype)


def getvariable(u, fn, name):
    vi = solution_variable(fn, name)
    return u[vi.slice]


def setvariable(u, fn, name, value: Union[Callable, float, np.ndarray]):
    """Set a named variable; `value` may be an array, a scalar, or a callable
    f(x[n, sdim]) -> [n] evaluated at the variable's dof coordinates."""
    vi = solution_variable(fn, name)
    if callable(value):
        if vi.coords is None:
            raise ValueError(f"variable {name!r} has no dof coordinates")
        vals = np.asarray(value(vi.coords))
        vals = np.broadcast_to(vals, (vi.size,))
    else:
        vals = np.broadcast_to(np.asarray(value), (vi.size,))
    return u.at[vi.slice].set(jnp.asarray(vals, u.dtype))
