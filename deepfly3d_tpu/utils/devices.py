"""Device placement policy.

The split declared in the package docstring — network hot path on the
accelerator, float64 parity geometry (triangulation / bundle adjustment /
procrustes, reference tolerances 1e-5/1e-4) on the host CPU backend — is
enforced here.  On TPU backends f64 is emulated op-by-op and every dispatch
pays the transfer-link latency, which turns the calibration stage into a
multi-minute stall; pinning those stages to the CPU backend restores
second-scale runtimes without touching the inference path.
"""

from __future__ import annotations

import contextlib

import jax


def cpu_device():
    """The host CPU device, or None if the CPU backend is unavailable."""
    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return None


@contextlib.contextmanager
def geometry_device():
    """Context: run parity-critical geometry on host CPU.

    No-op when CPU is already the default backend (tests, CI) or when no
    CPU backend is registered.
    """
    dev = None if jax.default_backend() == "cpu" else cpu_device()
    if dev is None:
        yield
    else:
        with jax.default_device(dev):
            yield
