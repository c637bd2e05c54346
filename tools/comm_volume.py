"""Compiled-HLO collective byte counts: GSPMD all-gather vs halo exchange
(VERDICT r3 item 4 "Done =" clause).

Compiles the 8-way sharded EP heat+reaction step BOTH ways on the virtual
CPU mesh at the Niederer h=0.2 slab (~58k dofs) — the honest-scale
configuration of ``tests/test_sharding_scale.py`` — and reports, per
compiled program:

  * every all-gather / collective-permute / all-reduce instruction in the
    optimized HLO with its payload bytes (static counts; instructions
    inside while-loop bodies appear once but execute once per iteration),
  * the analytic per-matvec communication model
    (``parallel/halo.py:collective_bytes_per_mv``) scaled by the measured
    solver iteration count — the runtime volume.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      JAX_PLATFORMS=cpu python tools/comm_volume.py [--spiral]
(the script re-execs itself with those env vars when launched bare).
"""

import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_CHILD = "TB_COMM_VOLUME_CHILD"

if os.environ.get(_CHILD):
    import jax
    jax.config.update("jax_platforms", "cpu")


_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8,
                "s32": 4, "u64": 8, "u32": 4, "s8": 1, "u8": 1, "pred": 1}

_COLLECTIVES = ("all-gather", "collective-permute", "all-reduce",
                "reduce-scatter", "all-to-all")


def shape_bytes(shape: str) -> int:
    """'f32[8,57600]' -> 8*57600*4; tuple shapes sum their leaves."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_stats(hlo_text: str):
    """Static per-program collective instruction census from HLO."""
    out = {}
    for line in hlo_text.splitlines():
        line = line.strip()
        m = re.match(r"^(?:ROOT\s+)?%?\S+\s*=\s*(\([^)]*\)|\S+)\s+"
                     r"(all-gather|collective-permute|all-reduce|"
                     r"reduce-scatter|all-to-all)(?:-start|-done)?\(",
                     line)
        if not m:
            continue
        shape, op = m.group(1), m.group(2)
        b = shape_bytes(shape)
        rec = out.setdefault(op, {"count": 0, "bytes": 0})
        rec["count"] += 1
        rec["bytes"] += b
    return out


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    import thunderbolt_tpu as tb
    from thunderbolt_tpu.parallel.sharding import (
        make_device_mesh, make_sharded_step)
    from thunderbolt_tpu.parallel import halo as halo_mod

    spiral = "--spiral" in sys.argv
    if spiral:
        N = 256
        mesh = tb.generate_mesh("quad4", (N, N), (0.0, 0.0), (2.5, 2.5))
        kappa = np.array([[4.5e-5, 0.0], [0.0, 2.0e-5]])
        model = tb.MonodomainModel(chi=1.0, Cm=1.0, kappa=kappa,
                                   stim=tb.NoStimulationProtocol(),
                                   ion=tb.FHNModel())
        ode = tb.semidiscretize(
            tb.ReactionDiffusionSplit(model),
            tb.FiniteElementDiscretization({"phi_m": 1},
                                           dtype=jnp.float32), mesh)
        u0 = tb.create_initial_condition(ode, jnp.float32)
        cells = tb.AdaptiveForwardEulerSubstepper(reaction_threshold=0.1)
        label = "spiral 256x256 (66k dofs)"
    else:
        from thunderbolt_tpu.benchmarks import niederer
        mesh, ode, u0 = niederer.build(h=0.2, dtype=jnp.float32)
        cells = tb.RushLarsenCellSolver(substeps=1, use_pallas=False)
        label = "niederer h=0.2 slab (58k dofs)"

    heat = tb.BackwardEulerSolver(rtol=1e-5, solver="chebyshev")
    alg = tb.LieTrotterGodunov((heat, cells))
    dmesh = make_device_mesh(8)
    dt = jnp.asarray(0.1 if not spiral else 1.0, u0.dtype)

    results = {"config": label, "ndevices": 8}
    for mode in ("gspmd", "halo"):
        step, place = make_sharded_step(ode, alg, float(dt), dmesh,
                                        spmv=mode)
        U = place(u0)
        lowered = step.lower(U, jnp.asarray(0.0, U.dtype)) \
            if hasattr(step, "lower") else jax.jit(step).lower(
                U, jnp.asarray(0.0, U.dtype))
        compiled = lowered.compile()
        txt = compiled.as_text()
        stats = collective_stats(txt)
        results[mode] = stats
        # sanity: the compiled program must actually run
        out = step(U, jnp.asarray(0.0, U.dtype))
        out.block_until_ready()

    # analytic per-matvec model at this operator's measured bandwidth
    heat_fn = ode.functions[0]
    n = heat_fn.M.cols.shape[0]
    npad = ((n + 7) // 8) * 8
    import numpy as _np
    cols = _np.asarray(jax.device_get(heat_fn.M.cols))
    # pad rows reference their own row; bandwidth from the unpadded table
    rows = _np.arange(n)[:, None]
    B = int(_np.max(_np.abs(cols.astype(_np.int64) - rows)))
    results["analytic_per_mv"] = dict(
        halo_mod.collective_bytes_per_mv(npad, B, 8), bandwidth=B,
        ndofs=n)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    if not os.environ.get(_CHILD):
        env = dict(os.environ, **{_CHILD: "1"}, JAX_PLATFORMS="cpu")
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if "host_platform_device_count" not in f]
        env["XLA_FLAGS"] = " ".join(
            flags + ["--xla_force_host_platform_device_count=8"])
        raise SystemExit(subprocess.call(
            [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
            env=env))
    main()
