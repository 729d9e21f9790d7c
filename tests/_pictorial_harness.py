"""Shared harness for the pictorial-structures corruption-recovery golden.

The reference retains only hyperparameter hooks for this capability
(reference df3d/config.py:55-60, skeleton_fly.py:252-261 — SURVEY §5.9), so
the rebuild generates its own golden: golden 2D observations are corrupted
at known (cam, t, joint) triples (the true peak demoted to slot 1, a
uniform outlier promoted to top-1 — exactly the failure mode the MAP must
fix), and the expected MAP output is committed as
``tests/data/pictorial_golden.pkl`` (regenerate with
``scripts/make_pictorial_golden.py``).

Everything is seeded, so the corrupted candidate sets are reconstructed
identically by tests and by the generation script.
"""

import numpy as np

IMAGE_W, IMAGE_H = 960, 480
NUM_PEAK = 10
CORRUPT_FRACTION = 0.15
SEED = 42
SIDES = (("left", (0, 1, 2), 0), ("right", (4, 5, 6), 19))


def build_side_problem(golden_2d, golden_3d, positions, joint0):
    """Corrupted candidate sets for one body side's 3 cameras x 15 leg joints.

    Returns a dict with candidates/scores (C,T,15,K,…), projection matrices,
    golden pixels, the visible-in-all-cams mask, and the corrupted triples.
    """
    import jax.numpy as jnp

    from deepfly3d_tpu.ops import geometry

    order = list(golden_2d["camera_ordering"])
    cams = [order[p] for p in positions]
    p2 = np.asarray(golden_2d["points2d"])[cams, :, joint0:joint0 + 15]
    T = p2.shape[1]
    px = np.stack([p2[..., 1] * IMAGE_W, p2[..., 0] * IMAGE_H], axis=-1)
    vis = (p2[..., 0] != 0) & (p2[..., 1] != 0) & (p2[..., 1] != 1.0)
    vis_all = vis.all(axis=0)

    rng = np.random.default_rng(SEED)
    corrupt = [
        (c, t, j)
        for c in range(3)
        for t in range(T)
        for j in range(15)
        if vis_all[t, j] and rng.random() < CORRUPT_FRACTION
    ]

    cand = np.zeros((3, T, 15, NUM_PEAK, 2))
    scores = np.zeros((3, T, 15, NUM_PEAK))
    cand[..., 0, :] = px
    scores[..., 0] = 1.0
    for k in range(1, NUM_PEAK):
        cand[..., k, :] = px + rng.uniform(-120, 120, size=px.shape)
        scores[..., k] = 0.3
    for (c, t, j) in corrupt:
        # true peak demoted to slot 1; gross outlier takes the argmax slot
        cand[c, t, j, 1] = cand[c, t, j, 0]
        scores[c, t, j, 1] = 0.85
        cand[c, t, j, 0] = [rng.uniform(0, IMAGE_W), rng.uniform(0, IMAGE_H)]
        scores[c, t, j, 0] = 1.0

    R, tvec, intr, _ = geometry.calib_to_arrays(
        {i: golden_3d[c] for i, c in enumerate(cams)}, 3
    )
    P = np.asarray(
        geometry.projection_matrices(
            jnp.asarray(R), jnp.asarray(tvec), jnp.asarray(intr)
        )
    )
    return {
        "cand": cand,
        "scores": scores,
        "P": P,
        "px": px,
        "vis": vis,
        "corrupt": corrupt,
        "T": T,
    }


def solve_side(problem, joint0, skeleton):
    """Run the MAP on a side problem; returns points3d (T, 15, 3)."""
    import jax.numpy as jnp

    from deepfly3d_tpu.ops import pictorial

    edge = np.asarray(
        [joint0 + l * 5 + e + 1 for l in range(3) for e in range(4)]
    )
    bp = skeleton.bone_param
    return np.asarray(
        pictorial.correct_legs_map(
            jnp.asarray(problem["cand"], jnp.float32),
            jnp.asarray(problem["scores"], jnp.float32),
            jnp.asarray(problem["P"], jnp.float32),
            jnp.asarray(bp[edge, 0], jnp.float32),
            jnp.asarray(bp[edge, 1], jnp.float32),
            pictorial.PictorialParams(),
            legs=3,
            leg_len=5,
        )
    )


def reproject(P, pts3d):
    """(3,3,4) x (T,15,3) -> pixel reprojections (3,T,15,2)."""
    T = pts3d.shape[0]
    out = np.zeros((3, T, 15, 2))
    flat = pts3d.reshape(-1, 3)
    for i in range(3):
        h = P[i, :, :3] @ flat.T + P[i, :, 3:]
        out[i] = (h[:2] / h[2]).T.reshape(T, 15, 2)
    return out
