"""Measure differentiable-EP throughput on the chip (or CPU).

Three numbers (README "differentiable simulation" section):
  1. forward steps/s of DifferentiableMonodomain at 256x256 (same grid as
     bench.py, fixed-count Chebyshev + 4 fixed substeps) — the price of
     the fully static program vs the adaptive production path;
  2. value_and_grad steps/s for the same march (forward+reverse per step,
     jax.checkpoint remat);
  3. ensemble amortization: 8-member vmapped conductivity population at
     128x128 vs one member, per-member steps/s.

Run: python tools/bench_ad.py            (TPU via the tunnel)
     JAX_PLATFORMS=cpu python tools/bench_ad.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import thunderbolt_tpu as tb
from thunderbolt_tpu.ad import DifferentiableMonodomain


def timeit(f, *a):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(*a)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def main():
    DT = jnp.float32
    kappa = np.array([[4.5e-5, 0.0], [0.0, 2.0e-5]], np.float32)

    # -- 1/2: 256x256 forward and grad ------------------------------------
    N, nsteps = 256, 10_000
    mesh = tb.generate_mesh("quad4", (N, N), (0.0, 0.0), (2.5, 2.5))
    dm = DifferentiableMonodomain(mesh, tb.FHNModel(), dt=1.0, substeps=4,
                                  dtype=DT, rtol=1e-5, D_ref=kappa)
    s0 = dm.initial_states()
    xs = np.asarray(dm.coords)
    s0 = s0.at[0].set(jnp.asarray(
        ((xs[:, 0] <= 1.25) & (xs[:, 1] <= 1.25)).astype(np.float32)))
    s0 = s0.at[1].set(jnp.asarray((xs[:, 1] >= 1.25) * 0.1, DT))

    fwd = jax.jit(lambda d, s: dm.march(d, s, nsteps)[0])
    dt_f = timeit(fwd, jnp.asarray(kappa), s0)
    print(f"forward 256^2: {nsteps / dt_f:,.0f} steps/s "
          f"(cheb iters/step = {dm.cheb_iters})")

    ng = 2_000
    probe = np.array([int(np.argmin(np.linalg.norm(xs - [1.9, 1.9], axis=1)))])

    def loss(d, s):
        _, tr = dm.march(d, s, ng, probe=probe)
        return jnp.sum(tr ** 2)

    vg = jax.jit(jax.value_and_grad(loss))
    dt_g = timeit(vg, jnp.asarray(kappa), s0)
    print(f"value_and_grad 256^2: {ng / dt_g:,.0f} steps/s "
          f"({dt_f / nsteps and (dt_g / ng) / (dt_f / nsteps):.2f}x forward cost)")

    # -- 3: ensemble amortization at 128x128 -------------------------------
    N2, ns2, B = 128, 5_000, 8
    mesh2 = tb.generate_mesh("quad4", (N2, N2), (0.0, 0.0), (2.5, 2.5))
    dm2 = DifferentiableMonodomain(mesh2, tb.FHNModel(), dt=1.0, substeps=4,
                                   dtype=DT, rtol=1e-5, D_ref=kappa)
    s02 = dm2.initial_states()
    xs2 = np.asarray(dm2.coords)
    s02 = s02.at[0].set(jnp.asarray(
        ((xs2[:, 0] <= 1.25) & (xs2[:, 1] <= 1.25)).astype(np.float32)))
    Ds = jnp.asarray(np.linspace(0.7, 1.3, B)[:, None, None] * kappa, DT)

    one = jax.jit(lambda d, s: dm2.march(d, s, ns2)[0])
    dt_1 = timeit(one, Ds[0], s02)
    ens = jax.jit(jax.vmap(lambda d: dm2.march(d, s02, ns2)[0]))
    dt_B = timeit(ens, Ds)
    print(f"single 128^2: {ns2 / dt_1:,.0f} steps/s; "
          f"vmapped x{B}: {B * ns2 / dt_B:,.0f} member-steps/s "
          f"({dt_1 * B / dt_B:.2f}x amortization)")


if __name__ == "__main__":
    main()
