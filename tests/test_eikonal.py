"""Anisotropic eikonal activation maps (ep05 topic; solver absent in the
reference — `models/eikonal.py` is beyond-reference)."""

import numpy as np
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.models.eikonal import solve_eikonal


def test_isotropic_distance():
    mesh = tb.generate_mesh("quad4", (30, 30), (0, 0), (3.0, 3.0))
    src = np.array([0])  # corner node (0,0)
    T = solve_eikonal(mesh, 1.0, src)
    d = np.linalg.norm(mesh.nodes - mesh.nodes[0], axis=1)
    err = np.asarray(T) - d
    assert err.min() > -1e-5            # graph metric never undershoots
    assert np.max(err / np.maximum(d, 0.1)) < 0.09  # diag edges ~8% over


def test_anisotropic_speedup_along_fibers():
    mesh = tb.generate_mesh("hex8", (20, 8, 8), (0, 0, 0), (5.0, 2.0, 2.0))
    V = np.diag([2.0, 0.5, 0.5])        # fast along x
    corner = int(np.argmin(np.linalg.norm(mesh.nodes, axis=1)))
    T = solve_eikonal(mesh, V, [corner])
    far_x = int(np.argmin(np.linalg.norm(mesh.nodes - [5, 0, 0], axis=1)))
    far_y = int(np.argmin(np.linalg.norm(mesh.nodes - [0, 2, 0], axis=1)))
    tx, ty = float(T[far_x]), float(T[far_y])
    # 5 units at speed 2 = 2.5; 2 units at speed 0.5 = 4
    assert abs(tx - 2.5) < 0.25, tx
    assert abs(ty - 4.0) < 0.4, ty


def test_multiple_sources_and_offset_times():
    mesh = tb.generate_mesh("quad4", (20, 20), (0, 0), (2.0, 2.0))
    n0 = int(np.argmin(np.linalg.norm(mesh.nodes - [0, 0], axis=1)))
    n1 = int(np.argmin(np.linalg.norm(mesh.nodes - [2, 2], axis=1)))
    T = solve_eikonal(mesh, 1.0, [n0, n1], source_times=[0.0, 1.0])
    assert float(T[n0]) == 0.0 and abs(float(T[n1]) - 1.0) < 1e-6
    mid = int(np.argmin(np.linalg.norm(mesh.nodes - [1, 1], axis=1)))
    # sqrt(2) from either source; the t=0 source wins
    assert abs(float(T[mid]) - np.sqrt(2.0)) < 0.15


def test_callable_velocity_tensor():
    """Velocity as a callable x -> [sdim, sdim] (fiber-field style),
    evaluated per edge midpoint."""
    import jax.numpy as jnp
    mesh = tb.generate_mesh("quad4", (20, 20), (0, 0), (2.0, 2.0))

    def V(x):
        # fast along x in the lower half, isotropic slow in the upper
        fast = jnp.where(x[1] < 1.0, 2.0, 0.5)
        return jnp.diag(jnp.stack([fast, jnp.asarray(0.5)]))

    n0 = int(np.argmin(np.linalg.norm(mesh.nodes - [0, 0], axis=1)))
    T = solve_eikonal(mesh, V, [n0])
    lo = int(np.argmin(np.linalg.norm(mesh.nodes - [2.0, 0.0], axis=1)))
    hi = int(np.argmin(np.linalg.norm(mesh.nodes - [2.0, 2.0], axis=1)))
    # 2 units at speed 2 = 1.0 along the fast floor
    assert abs(float(T[lo]) - 1.0) < 0.15
    assert float(T[hi]) > float(T[lo]) + 0.5
