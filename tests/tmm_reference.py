"""Independent transfer-matrix-method (TMM) reference for uniform multilayer
stacks at oblique incidence.  Plain NumPy, textbook characteristic-matrix
formulation -- deliberately shares no code with the solver.  This fills the
independent-cross-check role that Lumerical FDTD plays for the reference
(reference README.md:41)."""

import numpy as np


def tmm_rt(n_list, d_list, wavelength, theta0, pol):
    """Power reflection/transmission of a stack.

    n_list: indices [n_in, n_1, ..., n_out] (semi-infinite first/last)
    d_list: thicknesses of the interior layers (len = len(n_list) - 2)
    theta0: incidence angle in the first medium (radians)
    pol: 's' or 'p'
    Returns (R, T).
    """
    n_list = [complex(n) for n in n_list]
    k0 = 2 * np.pi / wavelength
    sin0 = n_list[0] * np.sin(theta0)
    cos = [np.sqrt(1 - (sin0 / n) ** 2) for n in n_list]
    # admittances
    if pol == "s":
        Y = [n * c for n, c in zip(n_list, cos)]
    else:
        Y = [n / c for n, c in zip(n_list, cos)]
    M = np.eye(2, dtype=complex)
    for j, d in enumerate(d_list, start=1):
        delta = k0 * n_list[j] * cos[j] * d
        Mj = np.array([[np.cos(delta), 1j * np.sin(delta) / Y[j]],
                       [1j * Y[j] * np.sin(delta), np.cos(delta)]])
        M = M @ Mj
    Y0, Ys = Y[0], Y[-1]
    denom = Y0 * M[0, 0] + Y0 * Ys * M[0, 1] + M[1, 0] + Ys * M[1, 1]
    r = (Y0 * M[0, 0] + Y0 * Ys * M[0, 1] - M[1, 0] - Ys * M[1, 1]) / denom
    t = 2 * Y0 / denom
    R = abs(r) ** 2
    T = abs(t) ** 2 * np.real(Ys) / np.real(Y0)
    return R, T
