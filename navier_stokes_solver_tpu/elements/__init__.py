"""Reference-element tables for tensor-product Taylor-Hood elements.

Plays the role of deal.II's ``FE_Q``/``FESystem``/``QGauss`` surface used by
the reference (NSSolver.cpp:118-141): shape values/gradients of a
Q(deg_v)/Q(deg_p) Taylor-Hood pair at Gauss quadrature points, plus face
tables.  Everything is precomputed host-side with NumPy and baked as
constants into the matrix-free cell kernels.
"""

from navier_stokes_solver_tpu.elements.taylor_hood import (
    TaylorHoodTables,
    gauss_legendre_01,
    gauss_lobatto_01,
    lagrange_derivs,
    lagrange_values,
    make_taylor_hood,
)

__all__ = [
    "TaylorHoodTables",
    "make_taylor_hood",
    "gauss_lobatto_01",
    "gauss_legendre_01",
    "lagrange_values",
    "lagrange_derivs",
]
