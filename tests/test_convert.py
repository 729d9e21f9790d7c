"""Torch-checkpoint conversion: structural round-trip test.

Builds a synthetic torch-style state dict with the canonical stacked-
hourglass names from our own initialized model, converts it, and checks the
resulting variable tree reproduces the original parameters exactly.
"""

import jax
import numpy as np
import pytest

from deepfly3d_tpu.models.convert_torch import convert_state_dict
from deepfly3d_tpu.models.hourglass import HourglassSpec, init_params

SPEC = HourglassSpec(num_stacks=2, features=16, depth=2, num_blocks=1, num_classes=5)


def _to_torch_conv(leaf):
    out = {"weight": np.transpose(np.asarray(leaf["kernel"]), (3, 2, 0, 1))}
    if "bias" in leaf:
        out["bias"] = np.asarray(leaf["bias"])
    return out


def _to_torch_bn(p_leaf, s_leaf):
    return {
        "weight": np.asarray(p_leaf["scale"]),
        "bias": np.asarray(p_leaf["bias"]),
        "running_mean": np.asarray(s_leaf["mean"]),
        "running_var": np.asarray(s_leaf["var"]),
    }


def _emit(sd, prefix, tensors):
    for k, v in tensors.items():
        sd[f"{prefix}.{k}"] = v


def _bottleneck_to_torch(sd, params, stats, flax_name, torch_prefix):
    mod_p = params
    mod_s = stats
    for part in flax_name.split("/"):
        mod_p = mod_p[part]
        mod_s = mod_s.get(part, {}) if isinstance(mod_s, dict) else {}
    order = [
        ("bn1", "bn1"), ("conv1", "conv1"),
        ("bn2", "bn2"), ("conv2", "conv2"),
        ("bn3", "bn3"), ("conv3", "conv3"),
    ]
    for flax_sub, torch_sub in order:
        if flax_sub.startswith("bn"):
            _emit(sd, f"{torch_prefix}.{torch_sub}",
                  _to_torch_bn(mod_p[flax_sub], mod_s[flax_sub]))
        else:
            _emit(sd, f"{torch_prefix}.{torch_sub}", _to_torch_conv(mod_p[flax_sub]))
    if "proj" in mod_p:  # skip projection
        _emit(sd, f"{torch_prefix}.downsample.0", _to_torch_conv(mod_p["proj"]))


@pytest.fixture(scope="module")
def fake_torch_checkpoint():
    variables = init_params(SPEC, (32, 64), jax.random.PRNGKey(0))
    params, stats = variables["params"], variables["batch_stats"]
    sd = {}
    _emit(sd, "conv1", _to_torch_conv(params["stem_conv"]))
    _emit(sd, "bn1", _to_torch_bn(params["stem_bn"], stats["stem_bn"]))
    for i, name in enumerate(("stem_res1", "stem_res2", "stem_res3"), start=1):
        _bottleneck_to_torch(sd, params, stats, name, f"layer{i}.0")
    for s in range(SPEC.num_stacks):
        for level in range(SPEC.depth):
            d = level + 1  # canonical: hg[0] = innermost (see convert_torch)
            for slot, flax_name in {
                0: f"hg{s}/skip_d{d}_0",
                1: f"hg{s}/down_d{d}_0",
                2: f"hg{s}/up_d{d}_0",
                3: f"hg{s}/innermost_0",
            }.items():
                top = flax_name.split("/")
                node = params
                ok = True
                for part in top:
                    if part not in node:
                        ok = False
                        break
                    node = node[part]
                if ok:
                    _bottleneck_to_torch(
                        sd, params, stats, flax_name, f"hg.{s}.hg.{level}.{slot}.0"
                    )
        _bottleneck_to_torch(sd, params, stats, f"feat_res{s}", f"res.{s}.0")
        _emit(sd, f"fc.{s}.conv", _to_torch_conv(params[f"feat_conv{s}"]))
        _emit(sd, f"fc.{s}.bn",
              _to_torch_bn(params[f"feat_bn{s}"], stats[f"feat_bn{s}"]))
        _emit(sd, f"score.{s}", _to_torch_conv(params[f"score{s}"]))
        if f"remap_feat{s}" in params:
            _emit(sd, f"fc_.{s}", _to_torch_conv(params[f"remap_feat{s}"]))
            _emit(sd, f"score_.{s}", _to_torch_conv(params[f"remap_score{s}"]))
    return variables, sd


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def test_round_trip_exact(fake_torch_checkpoint):
    variables, sd = fake_torch_checkpoint
    params, stats = convert_state_dict(sd, SPEC, strict=True)
    want_p = _flatten(variables["params"])
    got_p = _flatten(params)
    assert set(got_p) == set(want_p), (
        set(want_p) ^ set(got_p)
    )
    for k in want_p:
        np.testing.assert_array_equal(got_p[k], want_p[k], err_msg=str(k))
    want_s = _flatten(variables["batch_stats"])
    got_s = _flatten(stats)
    assert set(got_s) == set(want_s)
    for k in want_s:
        np.testing.assert_array_equal(got_s[k], want_s[k], err_msg=str(k))


def test_strict_rejects_unknown_keys(fake_torch_checkpoint):
    _, sd = fake_torch_checkpoint
    sd = dict(sd)
    sd["mystery.weight"] = np.zeros(3)
    with pytest.raises(ValueError, match="could not be mapped"):
        convert_state_dict(sd, SPEC, strict=True)
