"""deepfly3d_tpu — TPU-native multi-view 3D motion capture.

A ground-up JAX/XLA/Pallas rebuild of the DeepFly3D capability set
(reference: NeLy-EPFL/DeepFly3D): batched stacked-hourglass 2D pose
inference, calibration-free sparse bundle adjustment, DLT triangulation,
procrustes registration, One-Euro trajectory filtering, pictorial-structure
MAP correction, and multi-recording data parallelism over a TPU mesh.

Design notes
------------
* Compute path is JAX (jit/vmap/pjit + Pallas kernels); geometry that must
  match the reference's float64 semantics (reference tests assert 1e-5 on 3D
  points, tests/test_df3d.py:221-232) runs in x64 on the host CPU backend
  while the network hot path stays bf16/f32 on TPU.
* The ``df3d_result_*.pkl`` schema (reference df3d/core.py:349-369) and the
  CLI surface (reference df3d/cli.py:62-166) are preserved so downstream
  consumers of the reference can switch without changes.
"""

import os

__version__ = "0.1.0"

# Enable x64 before any array is created. Parity-critical geometry
# (triangulation/bundle-adjust/procrustes) needs float64; model code uses
# explicit f32/bf16 dtypes so the TPU hot path is unaffected.
import jax

if os.environ.get("DF3D_TPU_DISABLE_X64", "0") != "1":
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: first hourglass compiles are minutes-long on
# this host; subsequent processes reuse them.
if os.environ.get("DF3D_TPU_DISABLE_COMPILE_CACHE", "0") != "1":
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("DF3D_TPU_COMPILE_CACHE", "/tmp/jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from deepfly3d_tpu.config import Config, fly_config  # noqa: E402,F401
