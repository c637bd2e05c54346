"""Multi-chip domain decomposition via jax.sharding.

The reference is single-process shared-memory (SURVEY.md §2.9); multi-chip
scale-out is new capability, built the TPU way (SURVEY.md §5.8): the mesh's
dof axis is the parallel axis (the cardiac analog of data/sequence
parallelism — millions of independent cell ODEs + row-partitioned SpMV), a
1D ``jax.sharding.Mesh`` over axis "shard" partitions

* the SoA ionic state ``[nstates, ndofs]`` along dofs (embarrassingly
  parallel reaction kernels, zero communication),
* the ELL matrix rows + the heat unknown (SpMV gathers remote columns —
  GSPMD inserts the all-gather over ICI; CG dot products become psums).

No NCCL/MPI layer exists — XLA collectives are the backend.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from thunderbolt_tpu.disc.functions import GenericSplitFunction, AffineODEFunction


def make_device_mesh(n_devices: Optional[int] = None, axis: str = "shard"):
    """1D device mesh over exactly ``n_devices`` devices.

    Errors (instead of silently truncating to a 1-device mesh) when the
    backend exposes fewer devices than requested — a short mesh would
    validate nothing. For an n-device virtual CPU mesh set
    ``JAX_PLATFORMS=cpu`` + ``--xla_force_host_platform_device_count=n``
    before backend init (see ``__graft_entry__.dryrun_multichip``).
    """
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"make_device_mesh: requested {n_devices} devices but the "
                f"{devs[0].platform} backend exposes only {len(devs)}; "
                "force a virtual CPU mesh via JAX_PLATFORMS=cpu and "
                "XLA_FLAGS=--xla_force_host_platform_device_count=<n> "
                "before jax initializes.")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def round_up(n, m):
    return ((n + m - 1) // m) * m


def pad_split_function(odeform: GenericSplitFunction, multiple: int):
    """Pad the EP split's dof axis to a multiple (device count and/or TPU
    lane width). Padded heat rows are identity rows decoupled from the
    physics (M diag 1, K row 0); padded reaction points sit at the cell
    model's rest state, evolving as isolated healthy cells. Returns
    (padded_fn, pad_state, unpad_state); all variable descriptors are
    rebuilt for the padded stride.
    """
    from thunderbolt_tpu.fem.sparsity import ELLMatrix
    from thunderbolt_tpu.disc.functions import VariableInfo
    import dataclasses

    heat, cells = odeform.functions
    ion = cells.ion
    nd = cells.npoints
    nd_pad = round_up(nd, multiple)
    npad = nd_pad - nd
    if npad == 0:
        def ident(u):
            return u
        return odeform, ident, ident

    def pad_ell(A, diag_val):
        k = A.cols.shape[1]
        cols = jnp.concatenate(
            [A.cols, jnp.broadcast_to(
                (nd + jnp.arange(npad, dtype=A.cols.dtype))[:, None],
                (npad, k))])
        pvals = jnp.zeros((npad, k), A.vals.dtype).at[:, 0].set(diag_val)
        vals = jnp.concatenate([A.vals, pvals])
        dpos = None
        if A.diag_pos is not None:
            extra = (nd + jnp.arange(npad, dtype=A.diag_pos.dtype)) * k
            dpos = jnp.concatenate([A.diag_pos, extra])
        return ELLMatrix(cols, vals, dpos)

    source = heat.source
    psource = None
    if source is not None:
        def psource(t):
            return jnp.pad(source(t), (0, npad))

    pch = heat.constraints
    if pch is not None:
        from thunderbolt_tpu.fem.constraints import ConstraintHandler
        pch = ConstraintHandler(
            jnp.pad(pch.free_mask, (0, npad), constant_values=True),
            pch.cdofs, pch.cvals)

    heat_p = AffineODEFunction(
        dh=heat.dh, field=heat.field, pattern=heat.pattern,
        M=pad_ell(heat.M, 1.0), K=pad_ell(heat.K, 0.0),
        M_dia=None, K_dia=None,
        source=psource,
        lumped_mass=None if heat.lumped_mass is None
        else jnp.pad(heat.lumped_mass, (0, npad), constant_values=1.0),
        constraints=pch,
    )
    xpad = None
    if cells.x is not None:
        xpad = jnp.concatenate(
            [cells.x, jnp.broadcast_to(cells.x[-1:],
                                       (npad,) + cells.x.shape[1:])])
    cells_p = dataclasses.replace(cells, npoints=nd_pad, x=xpad)

    p = ion.phi_index
    heat_range = slice(p * nd_pad, p * nd_pad + nd_pad)
    cell_range = slice(0, ion.nstates * nd_pad)
    variables = {}
    for name, vi in odeform.variables_map.items():
        if vi.size != nd:
            continue  # multi-block aliases are not contiguous once padded
        blk = vi.offset // nd
        variables[name] = VariableInfo(blk * nd_pad, nd, vi.coords)
    fn_p = GenericSplitFunction((heat_p, cells_p), (heat_range, cell_range),
                                variables)

    rest = np.asarray(ion.default_initial_state(), dtype=np.float64)

    def pad_state(u):
        U = jnp.asarray(u).reshape(ion.nstates, nd)
        P_ = jnp.broadcast_to(
            jnp.asarray(rest, U.dtype)[:, None], (ion.nstates, npad))
        return jnp.concatenate([U, P_], axis=1).reshape(-1)

    def unpad_state(u):
        U = jnp.asarray(u).reshape(ion.nstates, nd_pad)
        return U[:, :nd].reshape(-1)

    return fn_p, pad_state, unpad_state


def shard_split_function(odeform: GenericSplitFunction, mesh: Mesh,
                         axis: str = "shard") -> GenericSplitFunction:
    """Place the heat operator's row-partitioned arrays on the device mesh.

    ELL rows, lumped mass and the diagonal follow the dof partition; shape
    tables and element batches stay replicated (they are only used at
    assembly time, which already happened).
    """
    heat, cells = odeform.functions
    row_sharded = NamedSharding(mesh, P(axis, None))
    vec_sharded = NamedSharding(mesh, P(axis))

    def shard_ell(A):
        from thunderbolt_tpu.fem.sparsity import ELLMatrix
        return ELLMatrix(
            jax.device_put(A.cols, row_sharded),
            jax.device_put(A.vals, row_sharded),
            None if A.diag_pos is None
            else jax.device_put(A.diag_pos, vec_sharded),
        )

    heat_sharded = AffineODEFunction(
        dh=heat.dh, field=heat.field, pattern=heat.pattern,
        M=shard_ell(heat.M), K=shard_ell(heat.K),
        M_dia=None, K_dia=None,
        source=heat.source,
        lumped_mass=None if heat.lumped_mass is None
        else jax.device_put(heat.lumped_mass, vec_sharded),
        constraints=heat.constraints,
    )
    import dataclasses
    cells_sharded = dataclasses.replace(
        cells, x=None if cells.x is None
        else jax.device_put(cells.x, vec_sharded))
    return GenericSplitFunction(
        functions=(heat_sharded, cells_sharded),
        ranges=odeform.ranges, variables_map=odeform.variables_map)


def shard_state(u, odeform: GenericSplitFunction, mesh: Mesh,
                axis: str = "shard"):
    """Shard the SoA state [nstates, ndofs] along the dof axis. The sharded
    hot path keeps the state 2D at program boundaries (the flat-vector view
    is a single-chip convenience)."""
    cells = odeform.functions[1]
    U = jnp.asarray(u).reshape(cells.ion.nstates, cells.npoints)
    return jax.device_put(U, NamedSharding(mesh, P(None, axis)))


def make_sharded_step(odeform: GenericSplitFunction, alg, dt, mesh: Mesh,
                      axis: str = "shard", spmv: str = "auto"):
    """jit the reaction-diffusion split step on the device mesh.

    Supports the 2-child EP split (heat, pointwise cells). The state is the
    SoA block [nstates, nd] sharded P(None, axis); the heat sub-step slices
    the phi row (P(axis)); the reaction sub-step is communication-free.

    ``spmv`` selects the partitioned-SpMV communication pattern:

    * ``"auto"`` (default): halo when the operator qualifies
      (band-ordered, unconstrained, Jacobi-preconditioned — see
      ``halo.halo_eligibility``), gspmd otherwise (reason logged).
    * ``"gspmd"``: GSPMD inserts an all-gather of the full
      operand vector per matvec — O(ndofs) bytes/device/iteration.
    * ``"halo"``: shard_map + lax.ppermute neighbour exchange of the
      O(bandwidth) halo only (``parallel/halo.py``; the SURVEY §2.9
      contract — TPU-native form of the reference's partitioned SpMV
      layer, ``src/utils.jl:167-246``). Requires band-ordered dofs and a
      Jacobi-preconditioned BackwardEulerSolver heat child.

    Returns (step, place): ``place(u_flat_or_2d)`` shards a state,
    ``step(U, t) -> U`` advances one dt. The resolved SpMV mode is
    recorded on ``place.spmv_mode``.
    """
    from thunderbolt_tpu.parallel.halo import resolve_spmv
    n_devices = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    fn_p, pad_state, unpad_state = pad_split_function(odeform, n_devices)
    fn = shard_split_function(fn_p, mesh, axis)
    heat_s, cells_s = fn.functions
    ion = cells_s.ion
    p = ion.phi_index
    spmv = resolve_spmv(spmv, heat_s, alg.algorithms[0], n_devices)
    if spmv == "halo":
        from thunderbolt_tpu.parallel.halo import make_halo_heat_step
        heat_step = make_halo_heat_step(heat_s, alg.algorithms[0], dt,
                                        mesh, axis)
    else:
        heat_step = alg.algorithms[0].make_step(heat_s, dt)
    cell_step = alg.algorithms[1].make_step(cells_s, dt)

    def step(U, t):
        phi = heat_step(U[p], t)
        U = U.at[p].set(phi)
        u = cell_step(U.reshape(-1), t)
        return u.reshape(ion.nstates, cells_s.npoints)

    state_sharding = NamedSharding(mesh, P(None, axis))
    jstep = jax.jit(step, in_shardings=(state_sharding, None),
                    out_shardings=state_sharding)

    def place(u):
        return shard_state(pad_state(u), fn_p, mesh, axis)

    place.spmv_mode = spmv
    return jstep, place


def pad_form_batch(batch, multiple):
    """Pad a FormBatch's cell axis to a multiple with ZERO-WEIGHT copies of
    the last cell (their detJw is masked to 0, so assembly contributions
    vanish while geometry stays non-singular)."""
    from thunderbolt_tpu.fem.forms import FormBatch
    nc = batch.ncells
    ncp = round_up(nc, multiple)
    if ncp == nc and batch.cell_weight is not None:
        return batch
    npad = ncp - nc

    def padrow(a):
        return jnp.concatenate(
            [a, jnp.broadcast_to(a[-1:], (npad,) + a.shape[1:])])

    w = jnp.concatenate([jnp.ones(nc, batch.Xe.dtype),
                         jnp.zeros(npad, batch.Xe.dtype)])
    return FormBatch(
        N=batch.N, dN=batch.dN, Ngeo=batch.Ngeo, dNgeo=batch.dNgeo,
        wq=batch.wq, Xe=padrow(batch.Xe), cell_dofs=padrow(batch.cell_dofs),
        xq=padrow(batch.xq), cells=padrow(batch.cells), ncomp=batch.ncomp,
        celltype=batch.celltype, field_celltype=batch.field_celltype,
        cell_weight=w)


class ShardedMechanicsFunction:
    """Dof-distributed mechanics: row/entity-partitions the assembled
    operator AND the solution/residual vectors over the device mesh, so
    per-chip memory scales with ndofs / n_devices (VERDICT r1 item 3 —
    element-sharded assembly alone keeps the Krylov state replicated and
    caps multi-chip problems at single-chip sizes).

    Wraps an (ideally element-sharded, see ``shard_quasistatic_function``)
    QuasiStaticFunction; every residual/operator product is pinned with
    ``with_sharding_constraint`` so the Newton/CG iterates inside the
    one-dispatch jitted loop stay partitioned: BlockDIA diagonals shard
    along the entity axis (the static slice shifts become ICI
    collective-permute halos under GSPMD), ELL rows shard like the EP heat
    path (``sharding.py:159``), dots psum. The EP dof partition is the
    template; this is its BlockDIA analog."""

    def __init__(self, fn, mesh: Mesh, axis: str = "shard"):
        self.fn = fn
        self.mesh = mesh
        self.axis = axis
        self.vec_spec = NamedSharding(mesh, P(axis))
        c = fn.dh.fields[fn.field].ncomponents
        n = fn.dh.ndofs
        ndev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        # pad the ENTITY axis to the device count (XLA shardings demand
        # divisibility); padded dofs are identity rows decoupled from the
        # physics — the mechanics analog of ``pad_split_function``
        self.c = c
        self.n = n
        self.nent = n // c
        self.nent_pad = round_up(self.nent, ndev)
        self.npad = self.nent_pad * c - n
        ch = fn.constraints
        if ch is not None and self.npad:
            from thunderbolt_tpu.fem.constraints import ConstraintHandler
            ch = ConstraintHandler(
                jnp.pad(ch.free_mask, (0, self.npad),
                        constant_values=True), ch.cdofs, ch.cvals)
        self.constraints = ch

    def __getattr__(self, name):
        # delegate everything else (dh, pattern, caches, material, ...)
        return getattr(self.__dict__["fn"], name)

    @property
    def solution_size(self):
        return self.n + self.npad

    def unpad(self, u):
        """Strip the device-count padding from a solution vector."""
        return u[: self.n]

    def update_internal_state(self, u, t, dt):
        if hasattr(self.fn, "update_internal_state"):
            self.fn.update_internal_state(self.unpad(u), t, dt)

    def internal_after_step(self, u, t, dt, internal):
        """Pure committed-state advance with the device-count padding
        stripped (the base function's qp tables only know unpadded u)."""
        return self.fn.internal_after_step(self.unpad(u), t, dt, internal)

    def set_internal(self, internal):
        """Write-through commit: __getattr__ delegates reads of
        ``.internal`` to the base function, so the committed state must
        land THERE — a plain attribute assignment on this wrapper would
        shadow the delegation and fork the state."""
        self.fn.internal = internal

    # -- sharding pins -----------------------------------------------------

    def _vec(self, v):
        return jax.lax.with_sharding_constraint(v, self.vec_spec)

    def _pad_vec(self, v):
        return v if not self.npad else jnp.pad(v, (0, self.npad))

    def _pad_op(self, A):
        if not self.npad:
            return A
        from thunderbolt_tpu.fem.sparsity import (
            ELLMatrix, BlockDIAMatrix, MaskedOperator)
        if isinstance(A, MaskedOperator):
            return MaskedOperator(
                self._pad_op(A.A),
                jnp.pad(A.free_mask, (0, self.npad), constant_values=True))
        if isinstance(A, BlockDIAMatrix):
            k0 = A.offsets.index(0)
            npe = self.nent_pad - A.nent
            pad_blocks = jnp.zeros(
                (len(A.offsets), npe) + A.blocks.shape[2:], A.blocks.dtype)
            pad_blocks = pad_blocks.at[k0].set(
                jnp.eye(A.ncomp, dtype=A.blocks.dtype))
            out = BlockDIAMatrix(
                A.offsets, jnp.concatenate([A.blocks, pad_blocks], axis=1),
                self.nent_pad, A.ncomp, spill_rows=A.spill_rows,
                spill_cols=A.spill_cols, spill_vals=A.spill_vals)
            return out.with_soa() if A.blocks_soa is not None else out
        if isinstance(A, ELLMatrix):
            k = A.cols.shape[1]
            extra = (self.n + jnp.arange(self.npad,
                                         dtype=A.cols.dtype))[:, None]
            cols = jnp.concatenate(
                [A.cols, jnp.broadcast_to(extra, (self.npad, k))])
            pvals = jnp.zeros((self.npad, k),
                              A.vals.dtype).at[:, 0].set(1.0)
            vals = jnp.concatenate([A.vals, pvals])
            dpos = None
            if A.diag_pos is not None:
                dpos = jnp.concatenate(
                    [A.diag_pos,
                     (self.n + jnp.arange(self.npad,
                                          dtype=A.diag_pos.dtype)) * k])
            return ELLMatrix(cols, vals, dpos)
        raise TypeError(f"unsupported operator {type(A).__name__}")

    def _op(self, A):
        from thunderbolt_tpu.fem.sparsity import (
            ELLMatrix, BlockDIAMatrix, MaskedOperator)
        mesh, axis = self.mesh, self.axis

        def pin(x, spec):
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, spec))

        if isinstance(A, MaskedOperator):
            return MaskedOperator(self._op(A.A), pin(A.free_mask, P(axis)))
        if isinstance(A, BlockDIAMatrix):
            blocks = pin(A.blocks, P(None, axis, None, None))
            soa = None if A.blocks_soa is None else pin(
                A.blocks_soa, P(None, None, None, axis))
            return BlockDIAMatrix(A.offsets, blocks, A.nent, A.ncomp,
                                  spill_rows=A.spill_rows,
                                  spill_cols=A.spill_cols,
                                  spill_vals=A.spill_vals,
                                  blocks_soa=soa)
        if isinstance(A, ELLMatrix):
            return ELLMatrix(pin(A.cols, P(axis, None)),
                             pin(A.vals, P(axis, None)),
                             None if A.diag_pos is None
                             else pin(A.diag_pos, P(axis)))
        return A

    # -- the Newton-facing protocol ---------------------------------------

    def residual(self, u, t, *extra):
        r = self.fn.residual(self.unpad(self._vec(u)), t, *extra)
        return self._vec(self._pad_vec(r))

    def assemble(self, u, t, *extra):
        kvals, r = self.fn.assemble(self.unpad(self._vec(u)), t, *extra)
        return kvals, self._vec(self._pad_vec(r))

    def assemble_operator(self, u, t, *extra):
        A, r = self.fn.assemble_operator(self.unpad(self._vec(u)), t,
                                         *extra)
        return self._op(self._pad_op(A)), self._vec(self._pad_vec(r))

    def jacobian_matrix(self, kvals):
        return self._op(self._pad_op(self.fn.jacobian_matrix(kvals)))

    def newton_extra(self):
        fn = self.fn
        return fn.newton_extra() if hasattr(fn, "newton_extra") else ()

    def place(self, u):
        """Pad a state to the device-count stride and physically
        distribute it over the mesh."""
        return jax.device_put(self._pad_vec(jnp.asarray(u)), self.vec_spec)


def shard_mechanics_dofs(fn, mesh: Mesh, axis: str = "shard",
                         shard_elements: bool = True):
    """Full multi-chip mechanics: element-sharded assembly + dof-sharded
    operator/Krylov. Returns a function usable anywhere a
    QuasiStaticFunction is (NewtonRaphsonSolver, homotopy, Newmark)."""
    base = shard_quasistatic_function(fn, mesh, axis) if shard_elements \
        else fn
    return ShardedMechanicsFunction(base, mesh, axis)


class ShardedCoupled3D0DFunction:
    """Dof-distributed RSAFDQ2022 blocked function (3D-0D coupling).

    The structural block's assembly, operator rows, residuals and every
    Newton/Krylov iterate inside ``BlockedNewtonSolver``'s device core are
    partitioned over the device mesh (via :class:`ShardedMechanicsFunction`);
    the m chamber multipliers, the m×m Schur block and the 0D circuit stay
    replicated — they are O(m) / O(m²) with m ≲ 4, so sharding them would
    only add collective latency. State layout ``[u_padded; p]`` (the
    multiplier tail rides replicated on every chip; only the mechanics
    block carries per-chip partitions).

    Drop-in for ``BlockedNewtonSolver`` and ``Coupled3D0DSolver`` (both the
    host ``step`` loop and the one-dispatch ``march``): the same blocked
    Schur-CG while_loop runs with sharded carries, CG dots psum over ICI
    and the BlockDIA SpMV all-gathers remote columns exactly like the
    dof-distributed mechanics Newton (``ShardedMechanicsFunction``).
    Multi-chip counterpart of ``rsafdq2022.jl:94`` + ``schur.jl:26-80``
    (the reference is single-process shared-memory)."""

    def __init__(self, fn3d, mesh: Mesh, axis: str = "shard",
                 shard_elements: bool = True):
        self.base = fn3d
        self.smech = shard_mechanics_dofs(fn3d.mech, mesh, axis,
                                          shard_elements)
        # BlockedNewtonSolver reads fn.mech.{constraints,jacobian_matrix}
        self.mech = self.smech
        self.chambers = fn3d.chambers

    @property
    def nmech(self):
        return self.smech.solution_size          # padded

    @property
    def solution_size(self):
        return self.nmech + len(self.chambers)

    def newton_extra(self):
        return self.smech.newton_extra()

    def variables(self):
        from thunderbolt_tpu.disc.functions import VariableInfo
        out = dict(self.base.mech.variables())   # offsets precede the pad
        for i, ch in enumerate(self.chambers):
            out[f"p_{ch.lumped_symbol}"] = VariableInfo(self.nmech + i, 1)
        return out

    def volumes(self, u):
        return self.base.volumes(u[: self.base.nmech])

    def place(self, w):
        """Distribute a base-layout state ``[u; p]`` over the mesh
        (mechanics block padded to the device stride + partitioned)."""
        nb = self.base.nmech
        u = self.smech.place(jnp.asarray(w)[:nb])
        return jnp.concatenate([u, jnp.asarray(w)[nb:].astype(u.dtype)])

    def unpad(self, w):
        """Back to the base (unpadded) ``[u; p]`` layout."""
        return jnp.concatenate([w[: self.base.nmech], w[self.nmech:]])

    def _chamber_terms(self, u_pad, p, V_targets, with_hess, kvals=None):
        from thunderbolt_tpu.fem.forms import scatter_vector, scatter_matrix
        u0 = u_pad[: self.base.nmech]
        Bs, rps, r_extra = [], [], 0.0
        for i, ch in enumerate(self.chambers):
            U = u0[ch.batch.facet_dofs].reshape(ch.batch.nfacets,
                                                ch.batch.nbf, 3)
            V = ch.volume_fn(U)
            G = ch.grad_fn(U)
            g = scatter_vector(G.reshape(ch.batch.nfacets, -1),
                               ch.batch.facet_dofs, self.base.nmech)
            g = self.smech._vec(self.smech._pad_vec(g))
            if with_hess:
                H = ch.hess_fn(U)
                kvals = kvals - p[i] * scatter_matrix(
                    H, ch.elem_map, self.smech.pattern.nnz)
            r_extra = r_extra + p[i] * g
            Bs.append(g)
            rps.append(V - V_targets[i])
        return kvals, jnp.stack(Bs), r_extra, jnp.stack(rps)

    def assemble(self, w, t, V_targets, *extra):
        u = w[: self.nmech]
        p = w[self.nmech:]
        kvals, r = self.smech.assemble(u, t, *extra)
        kvals, B, r_extra, r_p = self._chamber_terms(
            u, p, V_targets, with_hess=True, kvals=kvals)
        return kvals, B, r - r_extra, r_p

    def residual(self, w, t, V_targets, *extra):
        u = w[: self.nmech]
        p = w[self.nmech:]
        r = self.smech.residual(u, t, *extra)
        _, B, r_extra, r_p = self._chamber_terms(
            u, p, V_targets, with_hess=False)
        return B, r - r_extra, r_p


def shard_coupled_3d0d(fn3d, mesh: Mesh, axis: str = "shard",
                       shard_elements: bool = True):
    """Multi-chip 3D-0D coupling: dof-distribute the structural block of an
    ``RSAFDQ20223DFunction`` over the device mesh; multipliers + circuit
    stay replicated. Returns a drop-in for ``Coupled3D0DSolver``."""
    return ShardedCoupled3D0DFunction(fn3d, mesh, axis, shard_elements)


def shard_quasistatic_function(fn, mesh: Mesh, axis: str = "shard"):
    """Shard a QuasiStaticFunction's element batches over the device mesh:
    cells are the parallel axis; per-element kernels are embarrassingly
    parallel and the segment_sum scatters psum into the replicated
    residual/CSR values (GSPMD inserts the collectives). The mechanics
    analog of the EP dof partition."""
    n_devices = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    row = NamedSharding(mesh, P(axis))
    import copy
    out = copy.copy(fn)

    def shard_rows(tree):
        def place(x):
            if hasattr(x, "ndim") and x.ndim >= 1:
                return jax.device_put(x, NamedSharding(
                    mesh, P(*((axis,) + (None,) * (x.ndim - 1)))))
            return x
        return jax.tree_util.tree_map(place, tree)

    new_batches, new_caches, new_internal = [], [], []
    for i, batch in enumerate(fn.batches):
        nc0 = batch.ncells
        pb = pad_form_batch(batch, n_devices)
        npad = pb.ncells - nc0
        new_batches.append(shard_rows(pb))
        cache = dict(fn.mat_caches[i])
        frames = cache["frames"]
        if frames.shape[0] == nc0 and npad:
            frames = jnp.concatenate(
                [frames, jnp.broadcast_to(frames[-1:],
                                          (npad,) + frames.shape[1:])])
        cache["frames"] = shard_rows(frames)
        # the stress/tangent kernels close over `frames`; rebuild them for
        # the padded, sharded arrays
        from thunderbolt_tpu.disc.mechanics import make_material_kernels
        material = fn._material(i)
        st_i = fn.internal[i] if fn.internal is not None else None
        if st_i is not None:
            aux0 = material.aux(cache, 0.0, {
                "Qprev": st_i["Qprev"], "lam_prev": st_i["lam_prev"],
                "dt": jnp.asarray(1.0), "t": jnp.asarray(0.0)})
        else:
            aux0 = material.aux(cache, 0.0)
        cache["kernels"] = make_material_kernels(
            material, cache["frames"], tuple(aux0.keys()))
        new_caches.append(cache)
        if fn.internal is not None:
            if st_i is None:
                new_internal.append(None)
            else:
                st2 = {}
                for k, v in st_i.items():
                    if v.shape[0] == nc0 and npad:
                        v = jnp.concatenate(
                            [v, jnp.broadcast_to(v[-1:],
                                                 (npad,) + v.shape[1:])])
                    st2[k] = shard_rows(v)
                new_internal.append(st2)
    out.batches = new_batches
    out.mat_caches = new_caches
    if fn.internal is not None:
        out.internal = new_internal
    # element maps pad with the LAST cell's map (contributions are 0-weighted)
    out.volume_elem_maps = []
    for em, batch in zip(fn.volume_elem_maps, fn.batches):
        npad = round_up(batch.ncells, n_devices) - batch.ncells
        if npad:
            em = jnp.concatenate(
                [em, jnp.broadcast_to(em[-1:], (npad,) + em.shape[1:])])
        out.volume_elem_maps.append(shard_rows(em))
    return out
