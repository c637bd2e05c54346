"""Constant-hoisting jit: move large closed-over tables into parameters.

Why this exists (TPU-tunnel deployment): jitted march programs close over
the FEM tables (dNdx, detJw, fiber frames, scatter maps). JAX embeds
closed-over arrays as HLO *constants*, so the serialized module shipped to
a remote compile service grows with the mesh — at the 353k-dof LV level
the ladder program's embedded tables exceed the axon tunnel's HTTP body
limit and the compile is rejected with 413 (BASELINE.md "Round 5" notes).
On a directly-attached TPU the limit does not exist, but parameters are
the better layout anyway: the data ships once over the data plane
(device_put) instead of inside every compile request.

``hoisted_jit(f, *example_args)`` traces ``f`` once, lifts every jaxpr
constant above ``threshold_bytes`` into a runtime argument of an
``eval_jaxpr``-replaying wrapper, jits that wrapper, and returns a callable
with the original signature. Numerics are identical — the same jaxpr is
replayed with the same values; only *where* the bytes live changes
(HLO constant -> parameter).

Opt-in: the marches use this only when ``THUNDERBOLT_HOIST_CONSTS=1``
(or when a caller passes ``hoist=True``), because hoisting changes the
XLA cache key of every program and would invalidate the committed
compile-cache seed for the ordinary (small) test problems.

No reference counterpart: Thunderbolt.jl has no remote-compile path
(CUDA modules are built host-side); this is a TPU-deployment concern.
"""

from __future__ import annotations

import os
from typing import Any, Callable

import numpy as np
import jax
from jax import core, tree_util


def hoist_enabled() -> bool:
    return os.environ.get("THUNDERBOLT_HOIST_CONSTS", "0") == "1"


def _default_threshold() -> int:
    return int(os.environ.get("THUNDERBOLT_HOIST_THRESHOLD", 1 << 16))


def hoisted_jit(f: Callable, *example_args: Any,
                threshold_bytes: int | None = None) -> Callable:
    """jit ``f`` with large closed-over constants lifted to parameters.

    ``example_args`` must match the real calls in pytree structure,
    shapes and dtypes (the returned callable is specialized to them,
    like one entry of a jit cache). Constants smaller than
    ``threshold_bytes`` stay embedded — scalars and tiny tables fold
    better as literals and don't threaten any body limit.

    The returned callable carries ``n_hoisted`` / ``hoisted_bytes`` /
    ``embedded_bytes`` attributes for observability (the sweep tool
    prints them at the 353k level).
    """
    if threshold_bytes is None:
        threshold_bytes = _default_threshold()
    closed, out_shape = jax.make_jaxpr(f, return_shape=True)(*example_args)
    jaxpr, consts = closed.jaxpr, list(closed.consts)
    _, out_tree = tree_util.tree_flatten(out_shape)

    def _nbytes(c):
        try:
            return int(np.asarray(c).nbytes)
        except Exception:
            return 0

    big_idx = [i for i, c in enumerate(consts)
               if _nbytes(c) >= threshold_bytes]
    big_set = set(big_idx)
    small = [None if i in big_set else c for i, c in enumerate(consts)]
    big = [consts[i] for i in big_idx]

    def replay(big_consts, *args):
        cs = list(small)
        for i, c in zip(big_idx, big_consts):
            cs[i] = c
        flat, _ = tree_util.tree_flatten(args)
        out = core.eval_jaxpr(jaxpr, cs, *flat)
        return tree_util.tree_unflatten(out_tree, out)

    jf = jax.jit(replay)

    def wrapper(*args):
        return jf(big, *args)

    wrapper.n_hoisted = len(big)
    wrapper.hoisted_bytes = sum(_nbytes(c) for c in big)
    wrapper.embedded_bytes = sum(_nbytes(c) for c in small if c is not None)
    return wrapper
