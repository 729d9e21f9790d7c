"""H3.6M-profile end-to-end walkthrough on a synthetic 4-camera human.

Proves the framework is not fly-hardcoded (SURVEY §7.10, BASELINE config
#4): a 17-joint human skeleton with realistic bone lengths walks in place,
is filmed by a ring of 4 cameras with REAL lens distortion (barrel k1/k2 +
tangential p1/p2 — the fly rig's shipped calibration has distort == 0, so
this is the path that exercises the iterative undistortion inside
``ops/geometry.triangulate`` and the distortion-aware LM residuals), a
small hourglass checkpoint is TRAINED on the rendered frames, and the
full shipped CLI (`--profile h36m`) runs pose estimation → bundle
adjustment (from a deliberately perturbed extrinsic prior) → DLT
triangulation, ending with a similarity-aligned 3D RMSE against the
ground-truth skeleton.

Run:  python examples/h36m_synthetic.py            (64px, ~6 min on 1 CPU
      core; measured: median 2D 1.8 px, aligned median 3D 0.091 m,
      calibration recovered below the perturbed prior's error)
      python examples/h36m_synthetic.py --full     (128px / 12 frames /
      2000 steps — hourglass training is the bottleneck: ~1-2 h on a
      single core, minutes on a TPU chip or multi-core host)
Test: tests/test_h36m_synthetic.py runs the 64px configuration.
"""

from __future__ import annotations

import os
import pickle
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NUM_CAMERAS = 4
NUM_JOINTS = 17
IMG = 128                 # square frames (see set_scale)
FOCAL = 160.0
CAM_RADIUS = 4.0          # meters
DISTORT = np.array([-0.25, 0.08, 0.001, -0.001, 0.0])


def set_scale(img: int) -> None:
    """Rescale the synthetic rig (frame size + focal) — the test runs the
    identical pipeline at 64px so hourglass training fits the CI budget."""
    global IMG, FOCAL
    IMG = img
    FOCAL = 160.0 * img / 128.0

# H3.6M-style joint order (deepfly3d_tpu/skeletons/h36m.py):
# pelvis, r_hip, r_knee, r_ankle, l_hip, l_knee, l_ankle,
# spine, thorax, neck, head, l_shoulder, l_elbow, l_wrist,
# r_shoulder, r_elbow, r_wrist


WALK_RADIUS = 0.9  # meters — the subject traverses the capture volume


def make_walk_sequence(T: int, seed: int = 0) -> np.ndarray:
    """(T, 17, 3) world-space human walking a circle, meters, y-up.

    The circular traverse is load-bearing for calibration: a subject
    walking IN PLACE at the volume center leaves bundle adjustment
    near-degenerate (camera orbit trades against the free 3D points over
    a shallow scene — measured 20+ deg relative-rotation wander at 1 px
    observation noise), while covering the volume pins the extrinsics to
    ~1 deg.  Real rigs condition calibration the same way (wand waving).
    """
    rng = np.random.default_rng(seed)
    out = np.zeros((T, NUM_JOINTS, 3))
    for t in range(T):
        ph = 2 * np.pi * t / max(T, 1)
        walk_off = WALK_RADIUS * np.array([np.cos(ph), 0.0, np.sin(ph)])
        bob = 0.02 * np.sin(2 * ph)
        pelvis = np.array([0.0, 0.95 + bob, 0.0])
        spine = pelvis + [0.0, 0.25, 0.0]
        thorax = pelvis + [0.0, 0.45, 0.0]
        neck = pelvis + [0.0, 0.55, 0.0]
        head = pelvis + [0.0, 0.72, 0.0]

        def leg(side, phase):
            hip = pelvis + [side * 0.10, -0.05, 0.0]
            swing = 0.35 * np.sin(ph + phase)
            knee = hip + [0.0, -0.45 * np.cos(swing * 0.5),
                          0.45 * np.sin(swing * 0.5)]
            lift = max(0.0, 0.08 * np.sin(ph + phase))
            ankle = knee + [0.0, -0.45 + lift, 0.1 * np.sin(swing)]
            return hip, knee, ankle

        def arm(side, phase):
            sh = thorax + [side * 0.20, 0.05, 0.0]
            swing = 0.5 * np.sin(ph + phase)
            el = sh + [side * 0.05, -0.28, 0.12 * np.sin(swing)]
            wr = el + [side * 0.02, -0.22, 0.18 * np.sin(swing)]
            return sh, el, wr

        r_hip, r_knee, r_ankle = leg(+1, 0.0)
        l_hip, l_knee, l_ankle = leg(-1, np.pi)
        l_sh, l_el, l_wr = arm(-1, 0.0)
        r_sh, r_el, r_wr = arm(+1, np.pi)
        pts = [pelvis, r_hip, r_knee, r_ankle, l_hip, l_knee, l_ankle,
               spine, thorax, neck, head, l_sh, l_el, l_wr,
               r_sh, r_el, r_wr]
        out[t] = (np.asarray(pts) + walk_off
                  + rng.normal(0, 0.003, (NUM_JOINTS, 3)))
    return out


def make_cameras():
    """Ring of 4 distorted cameras looking at the subject's torso."""
    K = np.array([[FOCAL, 0, IMG / 2], [0, FOCAL, IMG / 2], [0, 0, 1.0]])
    target = np.array([0.0, 0.95, 0.0])
    calib = {}
    for c in range(NUM_CAMERAS):
        az = 2 * np.pi * c / NUM_CAMERAS + 0.2
        pos = target + CAM_RADIUS * np.array([np.sin(az), 0.05, np.cos(az)])
        # camera looks along +z (OpenCV): build R from the look-at frame
        fwd = target - pos
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, -1.0, 0.0])   # image y runs downward
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        R = np.stack([right, up2, fwd])   # world -> camera rows
        tvec = -R @ pos
        calib[c] = {
            "R": R, "tvec": tvec, "intr": K, "distort": DISTORT.copy(),
        }
    return calib


def project_sequence(points3d: np.ndarray, calib) -> np.ndarray:
    """(T, J, 3) -> per-camera distorted pixel projections (C, T, J, 2)."""
    import jax.numpy as jnp

    from deepfly3d_tpu.ops import geometry

    T = points3d.shape[0]
    px = np.zeros((NUM_CAMERAS, T, NUM_JOINTS, 2))
    flat = jnp.asarray(points3d.reshape(-1, 3))
    for c, cal in calib.items():
        px[c] = np.asarray(geometry.project(
            flat, jnp.asarray(cal["R"]), jnp.asarray(cal["tvec"]),
            jnp.asarray(cal["intr"]), jnp.asarray(cal["distort"]),
        )).reshape(T, NUM_JOINTS, 2)
    return px


# joint rendering palette: 17 RGB colors so the network can identify
# joints from appearance (a real human has distinct body parts; the
# synthetic stand-in needs distinct colors instead).  Greedy farthest-
# point selection on an RGB lattice (min pairwise distance 96 vs 65 for
# a hand-picked set — measured to cut the decode p95 from 9.8 to 5.7 px
# at the 64px test scale by removing joint-confusion outliers).
PALETTE = np.array([
    [255, 255, 255], [40, 40, 126], [126, 255, 40], [255, 40, 40],
    [40, 212, 255], [212, 40, 255], [255, 169, 126], [83, 83, 255],
    [40, 169, 83], [126, 83, 40], [126, 255, 169], [169, 169, 255],
    [255, 255, 40], [126, 126, 169], [169, 40, 126], [40, 255, 126],
    [169, 169, 40],
], dtype=np.float64)


def render_frames(px: np.ndarray, seed: int = 1) -> np.ndarray:
    """(C, T, J, 2) pixels -> (C, T, IMG, IMG, 3) uint8 synthetic frames."""
    import cv2

    from deepfly3d_tpu.skeletons import h36m

    rng = np.random.default_rng(seed)
    C, T = px.shape[:2]
    frames = np.zeros((C, T, IMG, IMG, 3), np.uint8)
    yy, xx = np.mgrid[0:IMG, 0:IMG]
    for c in range(C):
        for t in range(T):
            img = np.full((IMG, IMG, 3), 12.0)
            # body: dim limb lines for context
            for j0, j1 in h36m.bones:
                p0 = tuple(np.round(px[c, t, j0]).astype(int))
                p1 = tuple(np.round(px[c, t, j1]).astype(int))
                cv2.line(img, p0, p1, (60, 60, 60), 2, lineType=cv2.LINE_AA)
            # joints: colored Gaussian blobs at the TRUE subpixel position
            for j in range(NUM_JOINTS):
                x, y = px[c, t, j]
                if not (0 <= x < IMG and 0 <= y < IMG):
                    continue
                g = np.exp(-((yy - y) ** 2 + (xx - x) ** 2) / (2 * 2.0**2))
                img += g[..., None] * PALETTE[j][None, None, :]
            img += rng.normal(0, 2.0, img.shape)
            frames[c, t] = np.clip(img, 0, 255).astype(np.uint8)
    return frames


def write_recording(folder: str, frames: np.ndarray) -> np.ndarray:
    """Write the jpg recording; return the frames as the CLI will DECODE
    them.  4:4:4 sampling matters: default 4:2:0 chroma subsampling at
    64px destroys the color-coded joint identity (measured: deployed p95
    decode error ~10px vs ~5.7px on uncompressed frames); training on
    the decoded files removes the remaining train/serve skew."""
    import cv2

    os.makedirs(folder, exist_ok=True)
    C, T = frames.shape[:2]
    decoded = np.empty_like(frames)
    for c in range(C):
        for t in range(T):
            path = os.path.join(folder, f"camera_{c}_img_{t}.jpg")
            cv2.imwrite(
                path, frames[c, t][:, :, ::-1],
                [cv2.IMWRITE_JPEG_QUALITY, 98,
                 cv2.IMWRITE_JPEG_SAMPLING_FACTOR,
                 cv2.IMWRITE_JPEG_SAMPLING_FACTOR_444],
            )
            decoded[c, t] = cv2.imread(path)[:, :, ::-1]
    return decoded


def train_checkpoint(
    frames: np.ndarray, px: np.ndarray, out_path: str, steps: int = 1000
):
    """Fit a small hourglass to the synthetic frames; save the checkpoint.

    Recipe (swept on CPU, round 4): FULL-batch deterministic gradients at
    lr 5e-3 — the toy set is tiny so mini-batching only adds noise; the
    decode error reaches the argmax-cell floor (~0.4 heatmap cells) in
    ~1000 steps, which soft-argmax then refines below a pixel.
    """
    from deepfly3d_tpu.models import train as train_mod
    from deepfly3d_tpu.models.hourglass import HourglassSpec, save_weights

    spec = HourglassSpec(
        num_stacks=1, features=24 if IMG <= 64 else 32,
        depth=2 if IMG <= 64 else 3, num_blocks=1,
        num_classes=NUM_JOINTS, stem="patch8", input_shape=(IMG, IMG),
    )
    C, T = frames.shape[:2]
    images = frames.reshape(C * T, IMG, IMG, 3).astype(np.float32) / 255.0
    coords = np.zeros((C * T, NUM_JOINTS, 2))
    coords[..., 0] = px[..., 1].reshape(C * T, NUM_JOINTS) / IMG  # row
    coords[..., 1] = px[..., 0].reshape(C * T, NUM_JOINTS) / IMG  # col
    peaks = np.ones((C * T, NUM_JOINTS))
    known = (
        (coords[..., 0] > 0) & (coords[..., 0] < 1)
        & (coords[..., 1] > 0) & (coords[..., 1] < 1)
    )
    hm_shape = (IMG // 4, IMG // 4)
    # subpixel targets: Gaussians centered at the TRUE position (not the
    # quantized cell) so soft-argmax decoding is sub-cell accurate — the
    # fly recipe quantizes deliberately (golden points live on the grid)
    targets, cells = train_mod.render_target_heatmaps(
        coords, peaks, known, hm_shape, sigma=1.5, subpixel=True
    )
    cfg = train_mod.TrainConfig(
        learning_rate=5e-3, steps=steps, batch_size=images.shape[0],
        noise_scale=0.002,
    )
    variables, history = train_mod.train_overfit(
        images, targets, cells, peaks, spec, cfg,
    )
    # the BN EMA (momentum 0.99) cannot converge in a short run — adopt
    # the true dataset statistics so the inference-time forward matches
    # the train-mode forward the loss saw (the fly recipe does the same,
    # scripts/train_fly_weights.py)
    variables = train_mod.recalibrate_batch_stats(variables, spec, images)
    save_weights(out_path, variables, spec)
    return spec


def perturb_calib(calib, rot_deg: float = 2.0, trans_m: float = 0.02,
                  seed: int = 3):
    """The CLI's starting prior: ground truth + realistic drift (the fly
    rig's shipped calib.pkl is likewise a prior the BA must refine)."""
    import jax.numpy as jnp

    from deepfly3d_tpu.ops import geometry

    rng = np.random.default_rng(seed)
    out = {}
    for c, cal in calib.items():
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        dR = np.asarray(geometry.rodrigues(
            jnp.asarray(axis * np.deg2rad(rot_deg))
        ))
        out[c] = {
            "R": dR @ cal["R"],
            "tvec": cal["tvec"] + rng.normal(0, trans_m, 3),
            "intr": cal["intr"].copy(),
            "distort": cal["distort"].copy(),
        }
    return out


def aligned_errors(got: np.ndarray, want: np.ndarray) -> np.ndarray:
    """Similarity-aligned (s, R, t) per-point errors between (T, J, 3)
    point sets, meters.  BA has a global similarity gauge freedom, so 3D
    quality is only meaningful after alignment."""
    A = got.reshape(-1, 3)
    B = want.reshape(-1, 3)
    muA, muB = A.mean(0), B.mean(0)
    A0, B0 = A - muA, B - muB
    U, S, Vt = np.linalg.svd(A0.T @ B0)
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    D = np.diag([1.0, 1.0, d])
    R = Vt.T @ D @ U.T
    s = (S * np.diag(D)).sum() / (A0**2).sum()
    aligned = s * A0 @ R.T + muB
    return np.sqrt(((aligned - B) ** 2).sum(-1))


def aligned_rmse(got: np.ndarray, want: np.ndarray) -> float:
    return float(np.sqrt((aligned_errors(got, want) ** 2).mean()))


def relative_rotation_errors_deg(calib_est: dict, calib_true: dict):
    """Per-camera rotation error vs truth, measured on camera-0-RELATIVE
    rotations (R_c R_0^T) — the gauge-invariant part of the extrinsics
    that bundle adjustment can actually pin down."""
    out = {}
    R0e = calib_est[0]["R"]
    R0t = calib_true[0]["R"]
    for c in calib_true:
        rel_e = calib_est[c]["R"] @ R0e.T
        rel_t = calib_true[c]["R"] @ R0t.T
        dR = rel_e @ rel_t.T
        cosang = np.clip((np.trace(dR) - 1.0) / 2.0, -1.0, 1.0)
        out[c] = float(np.degrees(np.arccos(cosang)))
    return out


def run(workdir: str, T: int = 12, train_steps: int = 1000,
        expect_rmse_m: float = 0.12, img: int = 128):
    """Full walkthrough; returns the result dict + metrics."""
    from deepfly3d_tpu import cli

    set_scale(img)

    pts3d_true = make_walk_sequence(T)
    calib = make_cameras()
    px = project_sequence(pts3d_true, calib)
    frames = render_frames(px)

    rec = os.path.join(workdir, "h36m_rec")
    frames = write_recording(rec, frames)  # train on what the CLI decodes
    ckpt = os.path.join(workdir, "hourglass_h36m_demo.npz")
    print(f"training checkpoint ({train_steps} steps)...", flush=True)
    train_checkpoint(frames, px, ckpt, steps=train_steps)

    prior_path = os.path.join(workdir, "h36m_prior.pkl")
    with open(prior_path, "wb") as f:
        pickle.dump(perturb_calib(calib), f)

    out = os.path.join(workdir, "h36m_out")
    args = cli.parse_cli_args([
        rec, "--output-folder", out, "--profile", "h36m",
        "--calib-prior", prior_path, "--checkpoint", ckpt,
        "--solver", "lm", "--soft-argmax",
    ])
    rc = cli.run(args)
    assert rc == 0, "CLI pipeline failed"

    result_files = [f for f in os.listdir(out) if f.startswith("df3d_result")]
    with open(os.path.join(out, result_files[0]), "rb") as f:
        result = pickle.load(f)

    got = np.asarray(result["points3d_wo_procrustes"])
    err3d = aligned_errors(got, pts3d_true)
    rmse = float(np.sqrt((err3d**2).mean()))
    # 2D quality: decoded points vs true projections (in pixels)
    got2d = np.asarray(result["points2d"])  # (C, T, J, 2) normalized (r, c)
    got_px = np.stack([got2d[..., 1] * IMG, got2d[..., 0] * IMG], -1)
    err2d = np.linalg.norm(got_px - px, axis=-1)
    # calibration recovery: the CLI started from the perturbed prior —
    # gauge-invariant rotation error vs ground truth, before and after BA
    est_calib = {c: result[c] for c in range(NUM_CAMERAS)}
    with open(prior_path, "rb") as f:
        prior = pickle.load(f)
    rot_after = relative_rotation_errors_deg(est_calib, calib)
    rot_prior = relative_rotation_errors_deg(prior, calib)
    metrics = {
        "rmse_3d_m": rmse,
        "median_3d_m": float(np.median(err3d)),
        "median_2d_px": float(np.median(err2d)),
        "p95_2d_px": float(np.percentile(err2d, 95)),
        "calib_rot_err_deg": max(rot_after.values()),
        "prior_rot_err_deg": max(rot_prior.values()),
    }
    print("metrics:", metrics)
    assert rmse < expect_rmse_m, (
        f"3D RMSE {rmse:.4f} m exceeds {expect_rmse_m} m"
    )
    return result, metrics


def main():
    import argparse
    import tempfile

    import jax

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--full", action="store_true",
                   help="128px / 12 frames / 2000 steps (hours on one CPU "
                        "core; minutes on TPU) instead of the validated "
                        "64px / 6 frames / 1500 steps configuration")
    args = p.parse_args()

    jax.config.update("jax_platforms", "cpu")
    workdir = tempfile.mkdtemp(prefix="df3d_h36m_")
    print(f"working in {workdir}")
    if args.full:
        _, metrics = run(workdir, T=12, train_steps=2000, img=128)
    else:
        _, metrics = run(workdir, T=6, train_steps=1500,
                         expect_rmse_m=0.5, img=64)
    print("OK — the h36m profile runs the full pipeline end-to-end with "
          "real lens distortion; metrics above.")


if __name__ == "__main__":
    main()
