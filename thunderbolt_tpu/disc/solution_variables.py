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
    AffineODEFunction, PointwiseODEFunction, PointwiseMultiODEFunction,
    GenericSplitFunction, VariableInfo,
)


def solution_variable_names(fn):
    """All published variable names of a (split) function, tree-wide."""
    return tuple(fn.variables().keys())


def solution_variable(fn, name) -> VariableInfo:
    """The VariableInfo (offset/size/coords view descriptor) for `name`."""
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
            elif isinstance(sub, PointwiseMultiODEFunction):
                for part in sub.parts:
                    ion = part.ion
                    rest = np.asarray(ion.default_initial_state())
                    u0[np.asarray(part.phi_dofs)] = rest[ion.phi_index]
                    rows = [rest[i] for i in range(ion.nstates)
                            if i != ion.phi_index]
                    if rows:
                        blk = np.repeat(np.asarray(rows)[:, None],
                                        part.npoints, axis=1)
                        u0[part.state_offset:
                           part.state_offset + part.state_size] = blk.reshape(-1)
        return jnp.asarray(u0, dtype)
    return jnp.zeros(fn.solution_size, dtype)


def getvariable(u, fn, name):
    """The named variable's slice of the flat state vector `u`."""
    vi = solution_variable(fn, name)
    return u[vi.slice]


def nodal_values(u, fn, name, mesh, fill=np.nan):
    """Reorder a named variable from dof-entity order to mesh-node order
    (for VTU point data / probes). Nodes without a dof get `fill`."""
    vi = solution_variable(fn, name)
    # find the owning field's entity->node map
    for f in _leaf_functions(fn):
        dh = getattr(f, "dh", None)
        if dh is not None and name in dh.fields:
            fi = dh.fields[name]
            break
    else:
        # fall back: split functions publish phi under the model's symbol;
        # use the heat child's (single) field
        heat = _leaf_functions(fn)[0]
        fi = heat.dh.fields[heat.field]
    vals = np.asarray(u[vi.slice])
    out = np.full(mesh.nnodes, fill, dtype=vals.dtype)
    mask = fi.entity_nodes >= 0
    out[fi.entity_nodes[mask]] = vals[mask]
    return out


def _leaf_functions(fn):
    if isinstance(fn, GenericSplitFunction):
        out = []
        for f in fn.functions:
            out.extend(_leaf_functions(f))
        return out
    return [fn]


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


def to_point_blocked(u, fn):
    """SoA ("StateBlockedLayout") -> AoS ("PointBlockedLayout") view of the
    EP split state: [npoints, nstates]. Parity: the two layouts of
    ``src/modeling/solution_variables.jl:33-67`` — SoA is the native TPU
    layout; AoS is provided for interop/IO."""
    cells = fn.functions[1]
    return jnp.swapaxes(cells.reshape(u[fn.ranges[1]]), 0, 1)


def from_point_blocked(U_aos, fn, u=None):
    """AoS [npoints, nstates] -> flat SoA state."""
    cells = fn.functions[1]
    soa = jnp.swapaxes(U_aos, 0, 1).reshape(-1)
    if u is None:
        return soa
    return u.at[fn.ranges[1]].set(soa)
