"""semidiscretize: lower a symbolic model to device-ready functions.

Parity: the single generic entry point ``semidiscretize(model, disc, mesh)``
(``src/discretization/interface.jl:1-34``) with the per-model-class methods
of ``src/discretization/fem.jl``:

* transient diffusion -> ``AffineODEFunction`` (``fem.jl:170-196``),
* steady diffusion (``fem.jl:300,325``),
* ``ReactionDiffusionSplit{MonodomainModel}`` -> split of (heat, pointwise
  cell ODEs) with **overlapping** solution ranges — the phi block of the SoA
  ionic state *is* the heat unknown (``fem.jl:371-419``, overlap note
  ``:532-534``), conductivities folded as kappa/(Cm*chi) (``fem.jl:415``).

Everything returned is setup-time-composed: static sparsity, materialized
coefficient arrays, traced-time-only closures. No per-step host work.
"""

from __future__ import annotations

from functools import singledispatch
from typing import Optional

import numpy as np
import jax.numpy as jnp

from thunderbolt_tpu.mesh.mesh import Mesh
from thunderbolt_tpu.fem.dofs import DofHandler
from thunderbolt_tpu.fem.discretization import FiniteElementDiscretization
from thunderbolt_tpu.fem.constraints import close_constraints
from thunderbolt_tpu.fem.forms import (
    make_form_batch, element_mass, element_diffusion, element_load,
    scatter_matrix, scatter_vector, lumped_mass,
)
from thunderbolt_tpu.fem.sparsity import build_sparsity, csr_to_ell, csr_to_dia
from thunderbolt_tpu.models.coefficients import (
    setup_coefficient_cache, evaluate_coefficient,
    ConductivityToDiffusivityCoefficient,
)
from thunderbolt_tpu.models.ep import (
    MonodomainModel, ParabolicEllipticBidomainModel,
    ParabolicParabolicBidomainModel, ReactionDiffusionSplit,
    TransientDiffusionModel, SteadyDiffusionModel, InterfaceDiffusionModel,
    NoStimulationProtocol, AnalyticalTransmembraneStimulationProtocol,
)
from thunderbolt_tpu.disc.functions import (
    AffineODEFunction, AffineSteadyStateFunction, BidomainFunction,
    PPBidomainFunction, PointwiseODEFunction,
    PointwiseMultiODEFunction, MultiODEPart, GenericSplitFunction,
    VariableInfo,
)


def _assemble_heat(dh: DofHandler, field: str, kappa, disc, mesh,
                   stim_source=None):
    """Shared lowering for scalar diffusion fields: pattern, M, K, source."""
    dtype = disc.dtype
    subs = dh.subdata(field)
    pattern = build_sparsity([s.cell_dofs for s in subs], dh.ndofs)
    batches = [make_form_batch(dh, s, degree=disc.degree_for(field),
                               dtype=dtype) for s in subs]
    mvals = jnp.zeros(pattern.nnz, dtype)
    kvals = jnp.zeros(pattern.nnz, dtype)
    mlump = jnp.zeros(dh.ndofs, dtype)
    kappa_caches = []
    for batch, em in zip(batches, pattern.elem_maps):
        em = jnp.asarray(em)
        mvals = mvals + scatter_matrix(element_mass(batch), em, pattern.nnz)
        kc = setup_coefficient_cache(kappa, batch)
        kappa_caches.append(kc)
        D = evaluate_coefficient(kc, 0.0)
        kvals = kvals + scatter_matrix(element_diffusion(batch, D), em,
                                       pattern.nnz)
        mlump = mlump + lumped_mass(batch, dh.ndofs)
    M = csr_to_ell(pattern, mvals)
    K = csr_to_ell(pattern, kvals)
    M_dia = csr_to_dia(pattern, mvals)
    K_dia = csr_to_dia(pattern, kvals) if M_dia is not None else None

    source = None
    if stim_source is not None:
        stim_caches = [stim_source(batch) for batch in batches]

        def source(t):
            b = jnp.zeros(dh.ndofs, dtype)
            for batch, (fq_fn,) in zip(batches, stim_caches):
                fe = element_load(batch, fq_fn(t))
                b = b + scatter_vector(fe, batch.cell_dofs, dh.ndofs)
            return b

    return pattern, M, K, mlump, source, batches, M_dia, K_dia


@singledispatch
def semidiscretize(model, disc: FiniteElementDiscretization, mesh: Mesh):
    """Assemble `model` on `mesh` under `disc` into a solver-ready function
    object (parity: ``semidiscretize``, ``src/discretization/fem.jl``);
    overloads are registered per model class below."""
    raise NotImplementedError(
        f"semidiscretize not implemented for {type(model).__name__}")


# ---------------------------------------------------------------------------


@semidiscretize.register
def _(model: TransientDiffusionModel, disc, mesh):
    sym = model.solution_variable_symbol
    spec = disc.field_spec(sym)
    dh = DofHandler(mesh).add_field(sym, order=spec.order,
                                    subdomains=spec.subdomains).close()
    stim_source = None
    if model.source is not None:
        def stim_source(batch):
            cache = setup_coefficient_cache(model.source, batch)
            def fq(t):
                v = evaluate_coefficient(cache, t)
                return jnp.broadcast_to(v, (batch.ncells, batch.nqp))
            return (fq,)

    pattern, M, K, mlump, source, _, M_dia, K_dia = _assemble_heat(
        dh, sym, model.kappa, disc, mesh, stim_source)
    ch = close_constraints(dh, disc.dbcs, dtype=disc.dtype) if disc.dbcs \
        else None
    return AffineODEFunction(dh=dh, field=sym, pattern=pattern, M=M, K=K,
                             source=source, lumped_mass=mlump,
                             constraints=ch,
                             M_dia=None if ch is not None else M_dia,
                             K_dia=None if ch is not None else K_dia)


@semidiscretize.register
def _(model: SteadyDiffusionModel, disc, mesh):
    sym = model.solution_variable_symbol
    spec = disc.field_spec(sym)
    dh = DofHandler(mesh).add_field(sym, order=spec.order,
                                    subdomains=spec.subdomains).close()
    stim_source = None
    if model.source is not None:
        def stim_source(batch):
            cache = setup_coefficient_cache(model.source, batch)
            def fq(t):
                v = evaluate_coefficient(cache, t)
                return jnp.broadcast_to(v, (batch.ncells, batch.nqp))
            return (fq,)
    pattern, M, K, mlump, source, _, _, _ = _assemble_heat(
        dh, sym, model.kappa, disc, mesh, stim_source)
    ch = close_constraints(dh, disc.dbcs, dtype=disc.dtype)
    rhs = source(0.0) if source is not None else jnp.zeros(dh.ndofs, disc.dtype)
    return AffineSteadyStateFunction(dh=dh, field=sym, pattern=pattern,
                                     K=K, rhs=rhs, constraints=ch)


# ---------------------------------------------------------------------------


@semidiscretize.register
def _(split: ReactionDiffusionSplit, disc, mesh):
    model = split.model
    if isinstance(model, dict):
        return _semidiscretize_multidomain_split(model, disc, mesh)
    if isinstance(model, (ParabolicEllipticBidomainModel,
                          ParabolicParabolicBidomainModel)):
        return _semidiscretize_bidomain_split(model, disc, mesh)
    if not isinstance(model, MonodomainModel):
        raise NotImplementedError(
            f"ReactionDiffusionSplit of {type(model).__name__}")

    phisym = model.transmembrane_solution_symbol
    ssym = model.internal_state_symbol
    spec = disc.field_spec(phisym)
    dh = DofHandler(mesh).add_field(phisym, order=spec.order,
                                    subdomains=spec.subdomains).close()

    # kappa / (Cm * chi) folding (fem.jl:415)
    Dcoeff = ConductivityToDiffusivityCoefficient(model.kappa, model.Cm,
                                                  model.chi)

    stim_source = None
    if isinstance(model.stim, AnalyticalTransmembraneStimulationProtocol):
        stim = model.stim
        Cm = model.Cm

        def stim_source(batch):
            cm_cache = setup_coefficient_cache(Cm, batch)
            inv_cm = 1.0 / evaluate_coefficient(cm_cache, 0.0)
            xq = batch.xq

            def fq(t):
                return stim.current(xq, t) * inv_cm
            return (fq,)
    elif not isinstance(model.stim, NoStimulationProtocol):
        raise NotImplementedError(type(model.stim).__name__)

    pattern, M, K, mlump, source, _, M_dia, K_dia = _assemble_heat(
        dh, phisym, Dcoeff, disc, mesh, stim_source)
    if source is not None and isinstance(
            model.stim, AnalyticalTransmembraneStimulationProtocol):
        source = _separable_stimulus_fastpath(model.stim, source, dh, disc)
    heat = AffineODEFunction(dh=dh, field=phisym, pattern=pattern, M=M, K=K,
                             source=source, lumped_mass=mlump,
                             M_dia=M_dia, K_dia=K_dia)

    # pointwise reaction at the phi dofs (nodal collocation — same dof
    # aliasing as the reference, fem.jl:399-402)
    fi = dh.fields[phisym]
    nd = fi.ndofs
    coords = fi.entity_coords
    ion = model.ion
    if model.cell_coordinates is None:
        x = jnp.asarray(coords, disc.dtype)
    elif hasattr(model.cell_coordinates, "at_dofs"):
        x = jnp.asarray(model.cell_coordinates.at_dofs(coords), disc.dtype)
    else:
        x = jnp.asarray(coords, disc.dtype)
    cells_fn = PointwiseODEFunction(ion=ion, npoints=nd, x=x,
                                    dof_coords=coords)

    # SoA layout: u.reshape(nstates, nd); heat owns the phi block.
    p = ion.phi_index
    nstates = ion.nstates
    heat_range = slice(p * nd, (p + 1) * nd)
    cell_range = slice(0, nstates * nd)

    variables = {phisym: VariableInfo(p * nd, nd, coords)}
    for i, name in enumerate(ion.state_symbols):
        if i != p:
            variables[name] = VariableInfo(i * nd, nd, coords)
    non_phi = [i for i in range(nstates) if i != p]
    if non_phi and (non_phi == list(range(min(non_phi), max(non_phi) + 1))):
        variables.setdefault(
            ssym, VariableInfo(min(non_phi) * nd,
                               len(non_phi) * nd, None))

    return GenericSplitFunction(
        functions=(heat, cells_fn),
        ranges=(heat_range, cell_range),
        variables_map=variables,
    )


def _semidiscretize_bidomain_split(model, disc, mesh):
    """ReactionDiffusionSplit of a ParabolicElliptic- or
    ParabolicParabolicBidomainModel: (coupled 2x2-block diffusion stage,
    pointwise cell ODEs).

    BEYOND-reference: the reference declares both models but has no
    lowering or solver for either (``electrophysiology.jl:296,319``).
    Layout (shared): the ion SoA block as in the monodomain split (phi_m
    aliased at ``phi_index``), with the extracellular potential phi_e
    appended at ``nstates*nd``; the two formulations differ only in the
    backward-Euler block system the solver forms (see
    ``BidomainFunction`` / ``PPBidomainFunction``). Both conductivities
    are folded by 1/(Cm*chi) so the block rows share one scaling
    (``fem.jl:415`` analog).
    """
    phisym = model.transmembrane_solution_symbol
    esym = model.extracellular_solution_symbol
    ssym = model.internal_state_symbol
    spec = disc.field_spec(phisym)
    dh = DofHandler(mesh).add_field(phisym, order=spec.order,
                                    subdomains=spec.subdomains).close()

    Di = ConductivityToDiffusivityCoefficient(model.kappa_i, model.Cm,
                                              model.chi)
    De = ConductivityToDiffusivityCoefficient(model.kappa_e, model.Cm,
                                              model.chi)

    stim_source = None
    if isinstance(model.stim, AnalyticalTransmembraneStimulationProtocol):
        stim = model.stim
        Cm = model.Cm

        def stim_source(batch):
            cm_cache = setup_coefficient_cache(Cm, batch)
            inv_cm = 1.0 / evaluate_coefficient(cm_cache, 0.0)
            xq = batch.xq

            def fq(t):
                return stim.current(xq, t) * inv_cm
            return (fq,)
    elif not isinstance(model.stim, NoStimulationProtocol):
        raise NotImplementedError(type(model.stim).__name__)

    pattern, M, Ki, mlump, source, batches, M_dia, Ki_dia = _assemble_heat(
        dh, phisym, Di, disc, mesh, stim_source)
    if source is not None and isinstance(
            model.stim, AnalyticalTransmembraneStimulationProtocol):
        source = _separable_stimulus_fastpath(model.stim, source, dh, disc)

    # extracellular stiffness on the shared sparsity pattern
    kevals = jnp.zeros(pattern.nnz, disc.dtype)
    for batch, em in zip(batches, pattern.elem_maps):
        kc = setup_coefficient_cache(De, batch)
        Dq = evaluate_coefficient(kc, 0.0)
        kevals = kevals + scatter_matrix(element_diffusion(batch, Dq),
                                         jnp.asarray(em), pattern.nnz)
    Ke = csr_to_ell(pattern, kevals)
    Ke_dia = csr_to_dia(pattern, kevals) if M_dia is not None else None

    fi = dh.fields[phisym]
    nd = fi.ndofs
    coords = fi.entity_coords
    ion = model.ion
    x = jnp.asarray(coords, disc.dtype)
    cells_fn = PointwiseODEFunction(ion=ion, npoints=nd, x=x,
                                    dof_coords=coords)

    p = ion.phi_index
    ns = ion.nstates
    total = (ns + 1) * nd
    fn_cls = PPBidomainFunction \
        if isinstance(model, ParabolicParabolicBidomainModel) \
        else BidomainFunction
    bido = fn_cls(
        dh=dh, field=phisym, field_e=esym, pattern=pattern,
        M=M, K_i=Ki, K_e=Ke, source=source,
        phi_offset=p * nd, e_offset=ns * nd, total_size=total,
        M_dia=M_dia, K_i_dia=Ki_dia, K_e_dia=Ke_dia)

    variables = {phisym: VariableInfo(p * nd, nd, coords),
                 esym: VariableInfo(ns * nd, nd, coords)}
    for i, name in enumerate(ion.state_symbols):
        if i != p:
            variables[name] = VariableInfo(i * nd, nd, coords)
    non_phi = [i for i in range(ns) if i != p]
    if non_phi and (non_phi == list(range(min(non_phi), max(non_phi) + 1))):
        variables.setdefault(
            ssym, VariableInfo(min(non_phi) * nd, len(non_phi) * nd, None))

    return GenericSplitFunction(
        functions=(bido, cells_fn),
        ranges=(slice(0, total), slice(0, ns * nd)),
        variables_map=variables,
    )


def _semidiscretize_multidomain_split(models: dict, disc, mesh):
    """Dict of per-subdomain MonodomainModels -> one heat problem over the
    union + PointwiseMultiODEFunction (parity: ``fem.jl:434-542``). Each phi
    dof is owned by the FIRST subdomain (dict order) that touches it; the
    state layout is [phi(all); states_sub1; states_sub2; ...] with explicit
    gather/scatter index maps replacing the reference's overlapping views."""
    interface_models = [m for m in models.values()
                        if isinstance(m, InterfaceDiffusionModel)]
    models = {k: m for k, m in models.items()
              if not isinstance(m, InterfaceDiffusionModel)}
    names = list(models.keys())
    first = models[names[0]]
    phisym = first.transmembrane_solution_symbol
    spec = disc.field_spec(phisym)
    dh = DofHandler(mesh).add_field(
        phisym, order=spec.order, subdomains=tuple(names)).close()
    dtype = disc.dtype
    nd = dh.fields[phisym].ndofs

    iface_batches = []
    from thunderbolt_tpu.fem.facets import make_interface_batch
    for im in interface_models:
        iface_batches.append(
            (im, make_interface_batch(dh, phisym, im.interface[0],
                                      im.interface[1], dtype=dtype)))
    iface_tables = [np.asarray(ib["pair_dofs"]) for _, ib in iface_batches]
    pattern = build_sparsity([s.cell_dofs for s in dh.subdata(phisym)]
                             + iface_tables, dh.ndofs)
    # the subdata list covers the union; re-derive PER-SUBDOMAIN batches
    mvals = jnp.zeros(pattern.nnz, dtype)
    kvals = jnp.zeros(pattern.nnz, dtype)
    mlump = jnp.zeros(dh.ndofs, dtype)
    stim_parts = []
    dof_owner = np.full(nd, -1, dtype=np.int64)
    part_dofs = []
    for si, name in enumerate(names):
        m = models[name]
        cells_in = set(mesh.cellset(name).tolist())
        sub_entities = set()
        Dcoeff = ConductivityToDiffusivityCoefficient(m.kappa, m.Cm, m.chi)
        for s in dh.subdata(phisym):
            mask = np.isin(np.asarray(s.cells), list(cells_in))
            if not mask.any():
                continue
            import dataclasses as _dc
            s_sub = _dc.replace(
                s, cells=s.cells[mask], local_cells=s.local_cells[mask],
                cell_dofs=s.cell_dofs[mask], cell_entities=s.cell_entities[mask])
            batch = make_form_batch(dh, s_sub, degree=disc.degree_for(phisym),
                                    dtype=dtype)
            # element map for the restricted batch: rebuild via pair lookup
            em_full = None
            for sf, emf in zip(dh.subdata(phisym), pattern.elem_maps):
                if sf is s:
                    em_full = emf[mask]
            em = jnp.asarray(em_full)
            mvals = mvals + scatter_matrix(element_mass(batch), em,
                                           pattern.nnz)
            kc = setup_coefficient_cache(Dcoeff, batch)
            D = evaluate_coefficient(kc, 0.0)
            kvals = kvals + scatter_matrix(element_diffusion(batch, D), em,
                                           pattern.nnz)
            mlump = mlump + lumped_mass(batch, dh.ndofs)
            if isinstance(m.stim, AnalyticalTransmembraneStimulationProtocol):
                cm_cache = setup_coefficient_cache(m.Cm, batch)
                inv_cm = 1.0 / evaluate_coefficient(cm_cache, 0.0)
                stim_parts.append((batch, m.stim, inv_cm))
            ents = np.unique(np.asarray(s_sub.cell_entities))
            free = ents[dof_owner[ents] < 0]
            dof_owner[free] = si
            sub_entities.update(ents.tolist())
        part_dofs.append(sub_entities)

    # interface jump coupling: K_e = -sum_q G [[N_i]][[N_j]] w_dG
    nvol = len(dh.subdata(phisym))
    for (im, ib), em in zip(iface_batches, pattern.elem_maps[nvol:]):
        Nj = ib["N_jump"]                 # [np, nqp, nd]
        w = ib["w_dG"]                    # [np, nqp]
        G = jnp.asarray(im.G, dtype)
        Ke = -jnp.einsum("pqa,pqb,pq->pab", Nj, Nj, w) * G
        kvals = kvals + scatter_matrix(Ke, jnp.asarray(em), pattern.nnz)

    source = None
    if stim_parts:
        def source(t):
            b = jnp.zeros(dh.ndofs, dtype)
            for batch, stim, inv_cm in stim_parts:
                fe = element_load(batch, stim.current(batch.xq, t) * inv_cm)
                b = b + scatter_vector(fe, batch.cell_dofs, dh.ndofs)
            return b

    M_dia = csr_to_dia(pattern, mvals)
    heat = AffineODEFunction(
        dh=dh, field=phisym, pattern=pattern, M=csr_to_ell(pattern, mvals),
        K=csr_to_ell(pattern, kvals), source=source,
        lumped_mass=mlump, M_dia=M_dia,
        K_dia=csr_to_dia(pattern, kvals) if M_dia is not None else None)

    fi = dh.fields[phisym]
    coords = fi.entity_coords
    parts = []
    offset = nd
    variables = {phisym: VariableInfo(0, nd, coords)}
    for si, name in enumerate(names):
        m = models[name]
        dofs = np.asarray(sorted(e for e in part_dofs[si]
                                 if dof_owner[e] == si), dtype=np.int32)
        ion = m.ion
        xk = jnp.asarray(coords[dofs], dtype)
        part = MultiODEPart(ion=ion, phi_dofs=jnp.asarray(dofs),
                            state_offset=offset, x=xk)
        parts.append(part)
        nk = dofs.shape[0]
        k = 0
        for i, symname in enumerate(ion.state_symbols):
            if i == ion.phi_index:
                continue
            variables[f"{name}/{symname}"] = VariableInfo(
                offset + k * nk, nk, coords[dofs])
            k += 1
        offset += (ion.nstates - 1) * nk

    cells_fn = PointwiseMultiODEFunction(parts=tuple(parts),
                                         solution_size=offset)
    return GenericSplitFunction(
        functions=(heat, cells_fn),
        ranges=(slice(0, nd), slice(0, offset)),
        variables_map=variables)


def _separable_stimulus_fastpath(stim, source, dh, disc):
    """When the stimulus profile f(x, t) is time-independent (checked by
    probing two times), precompute the assembled load vector once and gate
    it by the active-interval indicator — removing the per-step
    element_load + scatter (the dominant cost of stimulated EP runs on TPU,
    where scatters are expensive)."""
    import numpy as _np
    try:
        xprobe = jnp.asarray(_np.zeros((2, 3 if dh.mesh.sdim == 3 else 2)),
                             disc.dtype)
        f0 = _np.asarray(stim.f(xprobe, 0.0))
        f1 = _np.asarray(stim.f(xprobe, 0.5 + _np.pi))
        # also probe at a couple of random locations
        xr = jnp.asarray(_np.random.default_rng(0).normal(
            size=(4, dh.mesh.sdim)), disc.dtype)
        g0 = _np.asarray(stim.f(xr, 0.0))
        g1 = _np.asarray(stim.f(xr, 0.5 + _np.pi))
        if not (_np.allclose(f0, f1) and _np.allclose(g0, g1)):
            return source
    except Exception:
        return source
    b_x = source(jnp.asarray((stim.intervals[0][0] + stim.intervals[0][1])
                             / 2.0 if _np.isfinite(stim.intervals[0][1])
                             else stim.intervals[0][0], disc.dtype))

    def fast(t):
        active = False
        for (t0, t1) in stim.intervals:
            active = active | ((t >= t0) & (t <= t1))
        return jnp.where(active, 1.0, 0.0) * b_x

    return fast
