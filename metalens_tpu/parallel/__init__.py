"""Multi-chip execution: device meshes, sharded solve batches, distributed
FFT.

The reference's only parallelism is OS-process fan-out over independent S4
solves (reference ``grating.py:1062-1072, 1173-1184``).  The TPU-native
equivalents:

* the solve batch axis (cells x angles x wavelengths) is sharded over the
  device mesh with shard_map -- thousands of independent RCWA solves per
  step, gradients combined with psum (:mod:`.sweep`);
* the full-lens aperture (up to 10^8 points for mm lenses) is sharded
  across HBMs, and the near-to-far-field FFT runs as a distributed
  transpose-based 2-D FFT with all_to_all over ICI (:mod:`.fft`), replacing
  the reference's RAM-slab chunk loops (``nearfield_farfield.py:45-66``);
* multi-host pod slices run the SAME sharded programs over a global mesh
  wired up by `jax.distributed` (:mod:`.distributed`), replacing the
  reference's run-the-script-on-N-computers worker_number split
  (``grating.py:30-35, 1173-1184``).
"""

from .mesh import make_mesh, default_mesh
from .sweep import sharded_fom_and_grad, sharded_characterize_amps
from .fft import fft2_sharded, farfield_sharded
from .nearfield import build_nearfield_sharded
from .design import sharded_member_optimize
from .distributed import (init_distributed, global_mesh,
                          global_batch_from_host_shards, replicate_to_mesh,
                          host_slice, multihost_barrier)

__all__ = ["make_mesh", "default_mesh", "sharded_fom_and_grad",
           "sharded_characterize_amps", "fft2_sharded", "farfield_sharded",
           "build_nearfield_sharded", "sharded_member_optimize",
           "init_distributed", "global_mesh",
           "global_batch_from_host_shards", "replicate_to_mesh",
           "host_slice", "multihost_barrier"]
