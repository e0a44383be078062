"""TPU-native RCWA solver package.

Modules:
  orders   -- reciprocal-lattice truncation (the SetNumG equivalent)
  special  -- J1 Bessel (analytic ellipse Fourier transform)
  epsilon  -- differentiable Toeplitz eps matrices for pillar layouts
  basis    -- S4-convention plane-wave bases, incident vectors, powers
  rcwa     -- eig-free S-matrix solver (thin-slab expm + Redheffer doubling)
  eig      -- general complex eigendecomposition (host callback) cross-check
  fom      -- figure-of-merit as data + differentiable scoring
"""

from . import orders, special, epsilon, basis, rcwa  # noqa: F401
