"""Generate the pictorial-structures golden artifact.

Runs the MAP on the seeded corruption problems built by
``tests/_pictorial_harness.py`` and commits the expected 3D output to
``tests/data/pictorial_golden.pkl``. Re-run ONLY when the MAP algorithm is
intentionally changed; the recovery-rate assertions in
``tests/test_pictorial.py`` must still pass on the new output.

Usage: python scripts/make_pictorial_golden.py
"""

import os
import pickle
import sys

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import _pictorial_harness as H  # noqa: E402

from deepfly3d_tpu.config import fly_config  # noqa: E402


def main():
    with open(
        os.path.join(REPO, "tests/data/reference_df3d/df3d_result_2d.pkl"), "rb"
    ) as f:
        golden_2d = pickle.load(f)
    with open(
        os.path.join(REPO, "tests/data/reference_df3d/df3d_result_3d.pkl"), "rb"
    ) as f:
        golden_3d = pickle.load(f)
    skeleton = fly_config().skeleton

    artifact = {"seed": H.SEED, "corrupt_fraction": H.CORRUPT_FRACTION}
    for side, positions, joint0 in H.SIDES:
        problem = H.build_side_problem(golden_2d, golden_3d, positions, joint0)
        pts3d = H.solve_side(problem, joint0, skeleton)
        err = np.linalg.norm(
            H.reproject(problem["P"], pts3d) - problem["px"], axis=-1
        )
        cerr = np.array([err[c, t, j] for (c, t, j) in problem["corrupt"]])
        rate = float((cerr < 10).mean())
        print(f"{side}: {len(problem['corrupt'])} corrupted, "
              f"recovery<10px = {rate:.3f}, median = {np.median(cerr):.2f}px")
        artifact[side] = {
            "points3d": pts3d,
            "corrupt": problem["corrupt"],
            "recovery_rate": rate,
        }

    out = os.path.join(REPO, "tests/data/pictorial_golden.pkl")
    with open(out, "wb") as f:
        pickle.dump(artifact, f)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
