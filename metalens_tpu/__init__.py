"""metalens_tpu -- a TPU-native metasurface-lens design framework.

A from-scratch rebuild of the capabilities of ``sbyrnes321/metalens``
(reference mounted at /root/reference) as an idiomatic JAX/XLA system:

* the external S4.exe RCWA binary + Lua driver + subprocess/file IPC is
  replaced by an in-framework, batched, *differentiable*, eig-free
  Fourier-modal-method solver (:mod:`metalens_tpu.solver`);
* process fan-out parallelism becomes vmap/pjit batching over
  (geometry, angle, wavelength, polarization) with device-mesh sharding
  (:mod:`metalens_tpu.parallel`);
* the scene/state API (Grating, GratingCollection, HexGridSet,
  design/assembly, near- and far-field) is preserved, including the
  spec-roundtrip ``repr`` persistence format.

Quick start::

    from metalens_tpu import Grating, optimize
    from metalens_tpu.units import nm, degree
    import numpy as np
    g = Grating(lateral_period=560*nm, cyl_height=500*nm,
                target_wavelength=785*nm, angle_in_air=65*degree,
                xyrra_list_in_nm_deg=np.array([[0., 0., 200., 150., 0.]]))
    g_opt = optimize(g, target_wavelength=785*nm)
"""

import os as _os


def _enable_compile_cache():
    """Persistent XLA compilation cache, on by default.

    Remote-TPU compiles cost minutes per jit signature per process
    (measured: the second process running bench.py drops 3m40s -> 2m20s
    wall once the cache is warm), and the CPU test suite re-jits dozens
    of programs per run.  Opt out with METALENS_NO_COMPILE_CACHE=1 or by
    setting jax's cache dir yourself first."""
    if _os.environ.get("METALENS_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            path = _os.path.join(_os.path.expanduser("~"), ".cache",
                                 "metalens_tpu_xla")
            _os.makedirs(path, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
    except Exception:
        pass  # cache is an optimization; never block import


_enable_compile_cache()

from . import units, materials, geometry
from .units import nm, um, degree
from .grating import (Grating, GratingCollection, validate, resize,
                      min_diameter, min_distance)

__version__ = "0.1.0"

__all__ = [
    "units", "materials", "geometry", "nm", "um", "degree",
    "Grating", "GratingCollection", "validate", "resize",
    "min_diameter", "min_distance",
]


def __getattr__(name):
    # heavier subsystems loaded lazily (importlib, not `from . import`, to
    # avoid re-entering this hook during the submodule import)
    import importlib
    if name == "optimize":
        # both the submodule name and a function name; return the submodule's
        # function (callable), matching the reference's flat-module usage
        mod = importlib.import_module(".optimize", __name__)
        return mod.optimize
    if name in ("optimize2", "optimize_gradient", "vary_angle"):
        mod = importlib.import_module(".optimize", __name__)
        return getattr(mod, name)
    if name in ("optimize_fused", "optimize2_fused", "optimize_multistart"):
        mod = importlib.import_module(".optimize_fused", __name__)
        # pin the functions over the submodule attribute the import just
        # installed, or `from metalens_tpu import optimize_fused` binds the
        # MODULE (hasattr triggers this hook, the import sets the package
        # attr, and the from-import's second lookup then sees the module)
        globals()["optimize_fused"] = mod.optimize_fused
        globals()["optimize2_fused"] = mod.optimize2_fused
        globals()["optimize_multistart"] = mod.optimize_multistart
        return getattr(mod, name)
    if name == "HexGridSet":
        return importlib.import_module(".hexgrid", __name__).HexGridSet
    if name in ("save", "load"):
        return getattr(importlib.import_module(".serialization", __name__),
                       name)
    raise AttributeError(name)
