"""Multi-chip electromechanics: the full excitation → contraction →
circulation march with EVERY link distributed over the device mesh.

Composes the three sharded stacks (VERDICT r3 item "sharded EM beat"):

* EP: the reaction-diffusion split padded to the device count and
  row-partitioned exactly like :func:`make_sharded_step`
  (``pad_split_function`` + ``shard_split_function``); the reaction
  sub-step is communication-free, the heat solve's SpMV all-gathers (or
  halo-exchanges) over ICI.
* Ca transfer: the EP→qp gather + einsum of
  :class:`~thunderbolt_tpu.disc.electromechanics.CalciumTransfer`,
  re-derived against the PADDED/sharded mechanics batches and the 2D SoA
  EP state (row = ion state index).
* 3D-0D: the blocked Schur-CG Newton with the structural block
  dof-distributed (:func:`shard_coupled_3d0d`) and the SAME unified step
  body (``make_coupled_step``) the single-chip marches scan.

The reference has no distributed-memory electromechanics at all (its
parallelism is shared-memory threads, ``src/utils.jl:167-246``); parity
anchor for the *physics* chain is ``docs/src/literate-tutorials/
cm03_3d0d-coupling.jl`` + the monodomain stack.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from thunderbolt_tpu.parallel.sharding import (
    pad_split_function, shard_split_function, shard_coupled_3d0d)


class ShardedEM3D0D:
    """Device-mesh counterpart of
    :class:`~thunderbolt_tpu.disc.electromechanics.CoupledElectromechanics3D0D`
    — same ``march`` contract (one jitted ``lax.scan`` over coupled
    steps), every carried state partitioned.

    Parameters mirror the single-chip driver plus ``mesh`` (a
    ``jax.sharding.Mesh``) and ``axis`` (its sharded axis name).
    """

    def __init__(self, ep_ode, ep_alg, ep_dt, fn3d, circuit, mesh,
                 solver=None, *, ca_symbol: str = "Ca_i",
                 ca_transform: Optional[Callable] = None,
                 axis: str = "shard", spmv: str = "auto"):
        from thunderbolt_tpu.disc.coupled import Coupled3D0DSolver
        from thunderbolt_tpu.disc.electromechanics import (
            refresh_material_kernels)

        n_devices = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        self.circuit = circuit
        self.solver = solver or Coupled3D0DSolver()
        self.ep_dt = float(ep_dt)
        self.device_mesh = mesh
        self.ep_ode = ep_ode

        # EP split: pad dofs to the device count, shard the rows, build
        # the two sub-steps (same recipe as make_sharded_step)
        self.axis = axis
        fn_p, self._pad_ep, self._unpad_ep = pad_split_function(
            ep_ode, n_devices)
        fn_s = shard_split_function(fn_p, mesh, axis)
        heat_s, cells_s = fn_s.functions
        from thunderbolt_tpu.parallel.halo import resolve_spmv
        self.spmv_mode = resolve_spmv(spmv, heat_s, ep_alg.algorithms[0],
                                      n_devices)
        if self.spmv_mode == "halo":
            from thunderbolt_tpu.parallel.halo import make_halo_heat_step
            self._heat_step = make_halo_heat_step(
                heat_s, ep_alg.algorithms[0], self.ep_dt, mesh, axis)
        else:
            self._heat_step = ep_alg.algorithms[0].make_step(heat_s,
                                                             self.ep_dt)
        self._cell_step = ep_alg.algorithms[1].make_step(cells_s,
                                                         self.ep_dt)
        ion = cells_s.ion
        self._ion = ion
        self._npts = cells_s.npoints
        self._phi_row = ion.phi_index
        self._ca_row = tuple(ion.state_symbols).index(ca_symbol)
        self._ca_transform = ca_transform or (lambda c: c)

        # 3D-0D: dof-distributed structural block, replicated circuit
        self.fn3ds = shard_coupled_3d0d(fn3d, mesh, axis)
        mech = self.fn3ds.mech
        if mech.internal is None:
            raise ValueError(
                "sharded electromechanics needs stateful Ca-driven "
                "mechanics materials (ActiveStressModel with a "
                "CaDrivenInternalSarcomereModel)")

        # Ca gather maps: EP point numbering -> each PADDED mechanics
        # batch's (cell, node) table (CalciumTransfer's construction,
        # against the padded/sharded batches; pad rows replicate the last
        # real cell so their node ids stay valid)
        from thunderbolt_tpu.disc.solution_variables import _leaf_functions
        heat0 = _leaf_functions(ep_ode)[0]
        ep_nodes = heat0.dh.fields[heat0.field].entity_nodes
        nnodes = int(ep_nodes.max()) + 1
        node_to_point = np.full(nnodes, -1, dtype=np.int64)
        node_to_point[ep_nodes] = np.arange(len(ep_nodes))
        mfi = mech.dh.fields[mech.field]
        ncomp = mfi.ncomponents
        self._gather = []
        for batch, st in zip(mech.batches, mech.internal):
            if st is None:
                self._gather.append(None)
                continue
            ent = np.asarray(batch.cell_dofs)[:, ::ncomp] // ncomp
            idx = node_to_point[mfi.entity_nodes[ent]]
            if (idx < 0).any():
                raise ValueError(
                    "mechanics subdomain has nodes outside the EP domain")
            self._gather.append(jnp.asarray(idx))

        # seed the Ca channel so the kernels thread it as an aux operand
        for bi, st in enumerate(mech.internal):
            if st is None:
                continue
            nc, nqp = mech.mat_caches[bi]["frames"].shape[:2]
            st["Ca"] = jnp.zeros((nc, nqp), mech.batches[bi].N.dtype)
        refresh_material_kernels(mech)

    # -- EP state helpers ---------------------------------------------------

    def place_ep(self, u_ep):
        """Flat unpadded EP state -> padded 2D SoA state sharded over the
        mesh."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        U = self._pad_ep(jnp.asarray(u_ep))
        U = U.reshape(self._ion.nstates, self._npts)
        return jax.device_put(
            U, NamedSharding(self.device_mesh, P(None, self.axis)))

    def unpad_ep(self, U):
        """Padded 2D SoA state -> flat unpadded EP state."""
        return self._unpad_ep(U.reshape(-1))

    def _to_qps(self, U):
        """Per-(padded-)batch [nc, nqp] calcium from the 2D EP state."""
        ca = self._ca_transform(U[self._ca_row])
        mech = self.fn3ds.mech
        out = []
        for batch, idx in zip(mech.batches, self._gather):
            if idx is None:
                out.append(None)
                continue
            out.append(jnp.einsum("qb,cb->cq", batch.N,
                                  ca[idx].astype(batch.N.dtype)))
        return out

    # -- the march ----------------------------------------------------------

    def march(self, t0, dt_mech, nsteps, w0=None, c0=None, u_ep0=None,
              dtype=None):
        """``nsteps`` coupled excitation→contraction→circulation steps in
        ONE jitted ``lax.scan`` with partitioned carries. Same contract as
        the single-chip ``CoupledElectromechanics3D0D.march``; ``w0`` is
        in the BASE (unpadded) layout and is placed automatically.

        Returns ``(U_ep, w, c, EMMarchReport)`` — ``U_ep`` is the padded
        2D SoA EP state (``unpad_ep`` recovers the flat vector)."""
        from thunderbolt_tpu.disc.coupled import (EMMarchReport,
                                                  make_coupled_step)
        from thunderbolt_tpu.disc.solution_variables import (
            create_initial_condition)

        fn3ds, circuit, mech = self.fn3ds, self.circuit, self.fn3ds.mech
        if dtype is None:
            dtype = mech.batches[0].N.dtype
        nsub_ep = int(round(dt_mech / self.ep_dt))
        if abs(nsub_ep * self.ep_dt - dt_mech) > 1e-9 * max(1.0, dt_mech):
            raise ValueError(
                f"ep_dt={self.ep_dt} must divide dt_mech={dt_mech}")

        if u_ep0 is None:
            u_ep0 = create_initial_condition(
                self.ep_ode,
                jnp.float64 if dtype == jnp.float64 else jnp.float32)
        U = self.place_ep(u_ep0)

        wb, c = self.solver.init(fn3ds.base, circuit, dtype)
        if w0 is not None:
            wb = jnp.asarray(w0, dtype)
        w = fn3ds.place(wb)
        if c0 is not None:
            c = jnp.asarray(c0, c.dtype)
        else:
            V0 = fn3ds.volumes(w[: fn3ds.nmech])
            for i, ch in enumerate(fn3ds.chambers):
                c = c.at[circuit.volume_index(
                    ch.lumped_symbol)].set(V0[i].astype(c.dtype))

        internal0 = [None if st is None else dict(st)
                     for st in mech.internal]
        phi_row, ca_row = self._phi_row, self._ca_row
        heat_step, cell_step = self._heat_step, self._cell_step
        ep_dt = self.ep_dt
        nstates, npts = self._ion.nstates, self._npts
        nsub_c = self.solver.circuit_substeps

        cache_key = ("_sharded_em_march", self.solver.newton, nsub_ep,
                     nsub_c, int(nsteps), float(dt_mech), ep_dt)
        run = self.__dict__.get(cache_key)
        if run is None:
            coupled_step = make_coupled_step(
                self.solver.newton, fn3ds, circuit, float(dt_mech),
                nsub_c, stateful=True, dtype=dtype)
            to_qps = self._to_qps

            @jax.jit
            def run(U, w, c, internal, t0):
                def step(carry, k):
                    U, w, c, internal, t = carry

                    def ep_body(u, i):
                        ti = t + i * ep_dt
                        phi = heat_step(u[phi_row], ti)
                        u = u.at[phi_row].set(phi)
                        u2 = cell_step(u.reshape(-1), ti)
                        return u2.reshape(nstates, npts), None

                    U, _ = jax.lax.scan(ep_body, U, jnp.arange(nsub_ep))
                    ca_qps = to_qps(U)
                    internal = [
                        st if st is None else {**st, "Ca": cq}
                        for st, cq in zip(internal, ca_qps)]
                    w, c, internal, (tn, vols, p, iters, conv) = \
                        coupled_step(w, c, internal, t)
                    rec = (tn, vols, p, jnp.max(U[phi_row]), iters, conv)
                    return (U, w, c, internal, tn), rec

                carry0 = (U, w, c, internal, jnp.asarray(t0, c.dtype))
                (U, w, c, internal, t), recs = jax.lax.scan(
                    step, carry0, jnp.arange(nsteps))
                return U, w, c, internal, recs

            self.__dict__[cache_key] = run

        U, w, c, internal, (ts, vols, ps, phis, iters, conv) = run(
            U, w, c, internal0, t0)
        if bool(conv.all()):
            mech.set_internal([None if st is None else dict(st)
                               for st in internal])
        return U, w, c, EMMarchReport(ts, vols, ps, iters, conv, phis)
