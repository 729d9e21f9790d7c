"""Orbax training-state checkpoint round trip."""

import jax
import jax.numpy as jnp
import numpy as np

from deepfly3d_tpu.models import checkpoint as ckpt
from deepfly3d_tpu.models.hourglass import HourglassSpec, init_params


def test_round_trip(tmp_path):
    spec = HourglassSpec(num_stacks=1, features=16, depth=2, num_classes=4)
    variables = init_params(spec, (32, 64), jax.random.PRNGKey(0))
    state = {"variables": variables, "opt": {"count": jnp.asarray(7)}}
    path = str(tmp_path / "ck")
    ckpt.save_checkpoint(path, state, step=11, spec=spec)
    restored, spec2, step = ckpt.load_checkpoint(path)
    assert step == 11
    assert spec2.features == spec.features and spec2.depth == spec.depth
    for a, b in zip(
        jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
