"""Dirichlet constraints as precomputed masks (no in-place matrix surgery).

Parity: Ferrite's ``ConstraintHandler`` + the reference's CSR-side
``apply_zero!`` elimination (``src/utils.jl:263-278``) and the rebuild plan's
"precomputed mask + value arrays" design (SURVEY.md §7). Symmetric
elimination keeps SPD systems SPD for CG:

    solve  A_ff u_f = b_f - A_fc g,   u_c = g

implemented as: zero constrained rows+cols of the ELL matrix, unit diagonal,
shift the rhs by A @ (extension of g by zeros), overwrite constrained slots.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from dataclasses import dataclass
from typing import Callable, Optional, Sequence, Union

from thunderbolt_tpu.fem.dofs import DofHandler
from thunderbolt_tpu.fem.sparsity import ELLMatrix


@dataclass(frozen=True)
class Dirichlet:
    """Strong boundary condition spec: field values on a named boundary.

    `boundary` names a facetset (preferred) or nodeset of the mesh; `value`
    is a constant or a callable f(x) -> value (per component, vectorized
    over x[n, sdim]); `components` selects vector-field components.
    """
    field: str
    boundary: str
    value: Union[float, Callable] = 0.0
    components: Optional[Sequence[int]] = None


@jax.tree_util.register_pytree_node_class
class ConstraintHandler:
    """Closed set of Dirichlet dofs with values (device-resident)."""

    def __init__(self, free_mask, cdofs, cvals):
        self.free_mask = free_mask  # bool [ndofs]
        self.cdofs = cdofs          # int32 [ncon]
        self.cvals = cvals          # [ncon]

    def tree_flatten(self):
        return (self.free_mask, self.cdofs, self.cvals), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def ndofs(self):
        return self.free_mask.shape[0]

    # --- jit-side operations ------------------------------------------------

    def constrained_extension(self, dtype=None):
        """Vector: g on constrained dofs, 0 on free dofs."""
        z = jnp.zeros(self.ndofs, dtype or self.cvals.dtype)
        return z.at[self.cdofs].set(self.cvals.astype(z.dtype))

    def apply_operator(self, A: ELLMatrix) -> ELLMatrix:
        """Zero constrained rows/cols, unit diagonal (symmetric elimination).
        Operators without a mutable value layout (BlockDIAMatrix) get the
        matrix-free MaskedOperator wrapper instead."""
        if not isinstance(A, ELLMatrix):
            from thunderbolt_tpu.fem.sparsity import MaskedOperator
            return MaskedOperator(A, self.free_mask)
        free = self.free_mask
        rowfree = free[:, None]
        colfree = free[A.cols]
        vals = jnp.where(rowfree & colfree, A.vals, 0.0)
        out = ELLMatrix(A.cols, vals, A.diag_pos)
        # unit diagonal on constrained rows — via the true diagonal slot
        # (ELL pad slots also carry col == row and must stay 0)
        return out.set_diagonal_where(~free, 1.0)

    def apply_rhs(self, A_raw: ELLMatrix, b):
        """Shift rhs for inhomogeneities; overwrite constrained entries."""
        g = self.constrained_extension(b.dtype)
        b2 = b - A_raw.mv(g)
        return jnp.where(self.free_mask, b2, g)

    def apply_zero(self, v):
        """Zero constrained entries (for residuals / increments)."""
        return jnp.where(self.free_mask, v, 0.0)

    def apply(self, u):
        """Set constrained entries to their prescribed values."""
        return u.at[self.cdofs].set(self.cvals.astype(u.dtype))


def _boundary_entities(dh: DofHandler, field: str, facetset: str):
    """All dof entities (vertex + edge + face + any higher-order) of `field`
    on a facetset — NOT just mesh-node entities; a P2 field on a P1 mesh has
    generated midside/face entities on the boundary that must be constrained
    too."""
    from thunderbolt_tpu.fem.facets import facet_basis_indices
    from thunderbolt_tpu.mesh.elements import get_element
    mesh = dh.mesh
    ents = set()
    for gc, lf in mesh.facetset(facetset):
        bi, lc = mesh.block_of_cell(int(gc))
        subs = dh.subdata(field, bi)
        if not subs:
            continue
        sub = subs[0]
        hit = np.nonzero(sub.local_cells == lc)[0]
        if hit.size == 0:
            continue
        fel = get_element(sub.field_celltype)
        fidx = facet_basis_indices(fel, int(lf))
        ents.update(int(e) for e in sub.cell_entities[hit[0]][fidx])
    return np.asarray(sorted(ents), dtype=np.int64)


def close_constraints(dh: DofHandler, dbcs: Sequence[Dirichlet],
                      dtype=jnp.float32) -> ConstraintHandler:
    """Resolve Dirichlet specs to (dof, value) pairs (host side)."""
    mesh = dh.mesh
    cdofs, cvals = [], []
    for bc in dbcs:
        fi = dh.fields[bc.field]
        comps = bc.components if bc.components is not None \
            else range(fi.ncomponents)
        if bc.boundary in mesh.facetsets:
            ents = _boundary_entities(dh, bc.field, bc.boundary)
            ent_by_comp = {c: ents for c in comps}
        elif bc.boundary in mesh.nodesets:
            nids = mesh.nodeset(bc.boundary)
            # node -> entity via the entity_nodes map
            lut = {int(n): e for e, n in enumerate(fi.entity_nodes)
                   if n >= 0}
            ents = np.asarray(sorted(lut[int(n)] for n in nids
                                     if int(n) in lut), dtype=np.int64)
            ent_by_comp = {c: ents for c in comps}
        else:
            raise KeyError(f"no facetset/nodeset named {bc.boundary!r}")
        for comp in comps:
            ents = ent_by_comp[comp]
            dofs = fi.offset + ents * fi.ncomponents + comp
            if callable(bc.value):
                coords = fi.entity_coords[ents]
                vals = np.asarray(bc.value(coords), dtype=np.float64)
                vals = np.broadcast_to(np.atleast_1d(vals), (dofs.size,))
            else:
                vals = np.full(dofs.size, float(bc.value))
            cdofs.append(dofs)
            cvals.append(vals)
    if cdofs:
        cdofs = np.concatenate(cdofs)
        cvals = np.concatenate(cvals)
        cdofs, idx = np.unique(cdofs, return_index=True)
        cvals = cvals[idx]
    else:
        cdofs = np.zeros(0, np.int64)
        cvals = np.zeros(0)
    free = np.ones(dh.ndofs, bool)
    free[cdofs] = False
    return ConstraintHandler(
        jnp.asarray(free),
        jnp.asarray(cdofs, dtype=jnp.int32),
        jnp.asarray(cvals, dtype=dtype),
    )
