"""Differentiable simulation (adjoint / reverse-mode gradients).

A capability the reference framework has no analog for: because the whole
stack is jax-native, gradients of physical quantities of interest flow
through assembly, linear solves, time marches, and Newton equilibria —

* :func:`make_equilibrium_solve` — adjoint (implicit-function-theorem)
  differentiation of quasi-static Newton solves: O(1) linear adjoint
  solve per gradient instead of differentiating through Newton's
  iteration history;
* :func:`make_parametric_equilibrium_solve` — the same adjoint with an
  arbitrary pytree of MATERIAL parameters: one reverse pass through the
  residual yields every stiffness/modulus gradient simultaneously, and
  theta rides Newton's traced extra channel so parameter sweeps reuse
  one compiled solve;
* :class:`DifferentiableMonodomain` — a reverse-differentiable
  operator-split monodomain march (traced conductivity assembly +
  fixed-count Chebyshev backward Euler + unrolled reaction substeps),
  for conductivity/parameter identification from activation data.
"""

from thunderbolt_tpu.ad.implicit import make_equilibrium_solve
from thunderbolt_tpu.ad.parametric import (
    ParametricQuasiStaticFunction, make_parametric_equilibrium_solve)
from thunderbolt_tpu.ad.ep import DifferentiableMonodomain

__all__ = ["make_equilibrium_solve", "make_parametric_equilibrium_solve",
           "ParametricQuasiStaticFunction", "DifferentiableMonodomain"]

from thunderbolt_tpu.ad.march import make_differentiable_ep_march

__all__.append("make_differentiable_ep_march")

from thunderbolt_tpu.ad.em import (
    parametric_coupled_function, make_coupled_step_adjoint,
    make_differentiable_coupled_march)

__all__ += ["parametric_coupled_function", "make_coupled_step_adjoint",
            "make_differentiable_coupled_march"]
