"""Niederer et al. 2011 cardiac electrophysiology N-version benchmark.

S.A. Niederer et al., "Verification of cardiac tissue electrophysiology
simulators using an N-version benchmark", Phil Trans R Soc A 369 (2011)
4331-4351. BASELINE.md config 2 — the rebuild's primary EP benchmark (the
reference repo itself has no Niederer setup and no ten Tusscher model).

Problem: monodomain on a 20 x 7 x 3 mm slab, ten Tusscher-Panfilov 2006 epi
cells, fibers along the long (x) axis; stimulate a 1.5 mm cube at the
corner; report activation times (phi crossing 0 mV), in particular at the
far corner P8 (benchmark Table 1 codes report ~25-55 ms at h=0.5 mm,
converging toward ~42-43 ms at h=0.1 mm with dt=0.005 ms).

Parameters (paper Table 1):
  chi = 140 / mm, Cm = 0.01 uF/mm^2, stimulus 50 uA/mm^3 for 2 ms,
  monodomain conductivities (harmonic mean of i/e), in mS/mm — numerically
  equal to S/m (1 S/m = 1000 mS / 1000 mm):
    sigma_f = 0.17*0.62/(0.17+0.62) = 0.13342 -> D_f = sigma/(chi*Cm) = 0.0953 mm^2/ms
    sigma_t = 0.019*0.24/(0.019+0.24) = 0.017607 -> D_t = 0.01258 mm^2/ms
  (unit system mV/ms/mm/uF/mS: conductance mS, capacitance uF, time ms.)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

import thunderbolt_tpu as tb


SIGMA_F = 0.17 * 0.62 / (0.17 + 0.62)   # mS/mm (== S/m numerically)
SIGMA_T = 0.019 * 0.24 / (0.019 + 0.24)
CHI = 140.0       # 1/mm
CM = 0.01         # uF/mm^2
STIM_CURRENT = 50.0   # uA/mm^3
STIM_DURATION = 2.0   # ms
STIM_SIZE = 1.5       # mm cube at the corner
LX, LY, LZ = 20.0, 7.0, 3.0


def build(h=0.5, dtype=jnp.float32, celltype="epi"):
    """Semidiscretize the benchmark slab at resolution h (mm)."""
    dims = (int(round(LX / h)), int(round(LY / h)), int(round(LZ / h)))
    mesh = tb.generate_mesh("hex8", dims, (0.0, 0.0, 0.0), (LX, LY, LZ))
    kappa = np.diag([SIGMA_F, SIGMA_T, SIGMA_T])

    def stim_f(x, t):
        inside = ((x[..., 0] <= STIM_SIZE) & (x[..., 1] <= STIM_SIZE)
                  & (x[..., 2] <= STIM_SIZE))
        return jnp.where(inside, STIM_CURRENT / CHI, 0.0)

    stim = tb.AnalyticalTransmembraneStimulationProtocol(
        f=stim_f, intervals=((0.0, STIM_DURATION),))
    ion = tb.TenTusscherPanfilov2006Model(celltype=celltype)
    model = tb.MonodomainModel(chi=CHI, Cm=CM, kappa=kappa, stim=stim,
                               ion=ion)
    odeform = tb.semidiscretize(
        tb.ReactionDiffusionSplit(model),
        tb.FiniteElementDiscretization({"phi_m": 1}, dtype=dtype), mesh)
    u0 = tb.create_initial_condition(odeform, dtype)
    return mesh, odeform, u0


def activation_times(odeform, u0, alg, T=60.0, dt=0.05, sample_dt=None,
                     threshold=0.0):
    """March the benchmark and record first-crossing times of `threshold`.

    TPU-native: the activation map is carried INSIDE the jitted time loop
    (one device program, per-step dt resolution, no host sampling), instead
    of the reference's post-hoc sampling of stored snapshots.

    Returns act [ndofs] in ms (inf where never activated)."""
    import jax
    step = alg.make_step(odeform, dt)
    vi = tb.solution_variable(odeform, "phi_m")
    sl = vi.slice
    nsteps = int(round(T / dt))

    @jax.jit
    def march(u, k):
        # k is TRACED: one compilation serves every horizon (warmup calls
        # with tiny k hit the same executable as the timed full march)
        act0 = jnp.full(vi.size, jnp.inf, u.dtype)

        def body(i, carry):
            u, act = carry
            t = i * dt
            u = step(u, t)
            phi = u[sl]
            act = jnp.where((phi > threshold) & jnp.isinf(act), t + dt, act)
            return (u, act)

        u, act = jax.lax.fori_loop(0, k, body, (u, act0))
        return u, act

    import time as _time
    jax.block_until_ready(march(u0, 1))      # compile once (k is traced)
    t0 = _time.perf_counter()
    u, act = march(u0, nsteps)
    jax.block_until_ready(act)
    steps_per_sec = nsteps / (_time.perf_counter() - t0)
    return np.asarray(act), steps_per_sec


def corner_probes(odeform):
    """P1..P8 benchmark probes (slab corners) + center C, as indices into
    the phi_m dof vector (dof-entity order, NOT mesh-node order)."""
    import thunderbolt_tpu as tb
    coords = tb.solution_variable(odeform, "phi_m").coords
    pts = np.array([
        [0, 0, 0], [0, LY, 0], [LX, 0, 0], [LX, LY, 0],
        [0, 0, LZ], [0, LY, LZ], [LX, 0, LZ], [LX, LY, LZ],
        [LX / 2, LY / 2, LZ / 2],
    ])
    idx = [int(np.argmin(np.linalg.norm(coords - p, axis=1)))
           for p in pts]
    return dict(zip(["P1", "P2", "P3", "P4", "P5", "P6", "P7", "P8", "C"],
                    idx))
