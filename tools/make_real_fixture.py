#!/usr/bin/env python
"""Generate tests/fixtures/tum_micro — a committed REAL-FORMAT TUM micro
dataset (no real dataset ships in this environment; this is the closest
committed stand-in, with a documented fetch-and-run protocol for the real
thing in docs/real_data.md).

What makes it "real format" rather than the clean synthetic fixtures
(io/synthetic.py:write_tum_dataset):

- true 16-bit depth PNGs at 640x480 with a Kinect-like value distribution:
  disparity-quantized depth (step ~ z^2 / (8*f*b), f*b = 43.5 m*px like the
  Kinect v1), multiplicative sensor noise, speckle dropout holes, and
  IR-shadow dropout at occlusion edges (zeros on the shadowed side) — the
  distributions the reference's TUM pipeline actually ingests
  (rgbd_video_io_tum_dataset.h:138-251);
- fr1 intrinsics in calibration.txt (517.3 516.5 318.6 255.3, pixel-center
  convention; the loader applies the +0.5 corner shift,
  rgbd_video_io_tum_dataset.h:243-244);
- fr1-style epoch timestamps; rgb and depth timestamps DISAGREE per frame
  (~15 ms offset + jitter) like TUM associate.py output;
- one association is MISSING (a dropped frame mid-sequence) and one
  adjacent pair is OUT OF ORDER in associated.txt;
- groundtruth.txt runs at ~100 Hz (denser than frames, exercising slerp
  interpolation, rgbd_video_io_tum_dataset.h:84-128) with '#' comments,
  timestamp jitter, and one 0.4 s GAP near the end so the last frames are
  dropped by max_pose_interpolation_time_extent (default 0.05 s).

Deterministic: re-running reproduces the committed bytes.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from surfelmeshing_tpu.io.synthetic import SCENES, render_frame  # noqa: E402
from surfelmeshing_tpu.io.synthetic import TRAJECTORIES  # noqa: E402
from surfelmeshing_tpu.utils.camera import PinholeCamera  # noqa: E402

W, H = 640, 480
NUM_FRAMES = 14
DEPTH_SCALING = 5000.0          # TUM convention: 5000 units per metre
FB8 = 8.0 * 43.5                # Kinect v1: 8 * focal(px) * baseline(m)
BASE_TS = 1305031452.0          # fr1-style epoch seconds
FRAME_DT = 1.0 / 30.0

# fr1 (freiburg1) intrinsics, pixel-center convention as published.
FX, FY, CX, CY = 517.306408, 516.469215, 318.643040, 255.313989


def kinectify(depth_u16: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Degrade clean synthetic depth into a Kinect-like measurement."""
    z = depth_u16.astype(np.float64) / DEPTH_SCALING
    valid = z > 0

    # Multiplicative sensor noise before quantization.
    z = np.where(valid, z * (1.0 + 0.002 * rng.standard_normal(z.shape)), 0.0)

    # Disparity quantization: step grows ~ z^2 (the dominant Kinect
    # artifact; depth histograms are combs, not continuous).
    disp = np.where(valid, np.round(FB8 / np.maximum(z, 1e-6)), 0.0)
    z_q = np.where(disp > 0, FB8 / np.maximum(disp, 1.0), 0.0)

    # IR shadow: near strong depth discontinuities the far side loses
    # returns on the emitter side (left of the edge here).
    gy, gx = np.gradient(np.where(valid, z_q, np.nan))
    edge = np.abs(np.nan_to_num(gx, nan=0.0)) > 0.04
    shadow = np.zeros_like(edge)
    for s in range(1, 9):
        shadow[:, s:] |= edge[:, :-s]
    z_q = np.where(shadow, 0.0, z_q)

    # Speckle dropout: small random holes (~2% of pixels, clustered).
    holes = rng.random(z.shape) < 0.004
    grow = holes.copy()
    for dy, dx in ((0, 1), (1, 0), (0, -1), (-1, 0)):
        grow |= np.roll(holes, (dy, dx), axis=(0, 1))
    z_q = np.where(grow, 0.0, z_q)

    # Kinect range limits.
    z_q = np.where((z_q < 0.4) | (z_q > 9.0), 0.0, z_q)
    return np.clip(DEPTH_SCALING * z_q + 0.5, 0, 65535).astype(np.uint16)


def main(out_dir: str) -> None:
    from PIL import Image as PILImage

    rng = np.random.default_rng(7)
    os.makedirs(os.path.join(out_dir, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "depth"), exist_ok=True)

    cam = PinholeCamera(W, H, FX, FY, CX + 0.5, CY + 0.5)
    poses = TRAJECTORIES["arc"](NUM_FRAMES)
    scene = SCENES["default"]

    with open(os.path.join(out_dir, "calibration.txt"), "w") as f:
        f.write(f"{FX} {FY} {CX} {CY}\n")

    depth_ts = [BASE_TS + i * FRAME_DT +
                float(rng.normal(0.0, 0.002)) for i in range(NUM_FRAMES)]
    rgb_ts = [t - 0.015 + float(rng.normal(0.0, 0.003)) for t in depth_ts]

    assoc = []
    for i in range(NUM_FRAMES):
        depth_clean, color = render_frame(cam, poses[i], DEPTH_SCALING,
                                          noise_sigma=0.0, scene=scene)
        depth = kinectify(depth_clean, rng)
        rgb_name = f"rgb/{rgb_ts[i]:.6f}.png"
        depth_name = f"depth/{depth_ts[i]:.6f}.png"
        PILImage.fromarray(color).save(os.path.join(out_dir, rgb_name))
        PILImage.fromarray(depth, mode="I;16").save(
            os.path.join(out_dir, depth_name))
        assoc.append(f"{rgb_ts[i]:.6f} {rgb_name} "
                     f"{depth_ts[i]:.6f} {depth_name}")

    # Drop one association mid-sequence (frame 6 has images on disk but no
    # association — exactly what TUM associate.py produces when timestamps
    # fail to match) and swap one adjacent pair out of order.
    del assoc[6]
    assoc[2], assoc[3] = assoc[3], assoc[2]
    with open(os.path.join(out_dir, "associated.txt"), "w") as f:
        f.write("\n".join(assoc) + "\n")

    # Ground truth at ~100 Hz with jitter; one 0.4 s gap before the final
    # two frames so their poses cannot be interpolated within the default
    # 0.05 s extent and the loader drops them.
    gt_lines = ["# ground truth trajectory",
                "# timestamp tx ty tz qx qy qz qw"]
    t = depth_ts[0] - 0.05
    gap_lo = depth_ts[-3] - 0.02
    gap_hi = depth_ts[-3] + 0.14
    # GT must continue past the gap: a frame AFTER the last sample is
    # clamped (not dropped) by InterpolatePose's boundary rule.
    t_end = max(depth_ts[-1] + 0.05, gap_hi + 0.05)
    frame_t = np.asarray(depth_ts)

    def pose_at(ts: float):
        # Piecewise-linear reference trajectory in time for GT samples.
        j = int(np.clip(np.searchsorted(frame_t, ts) - 1, 0,
                        NUM_FRAMES - 2))
        a = float(np.clip((ts - frame_t[j]) /
                          (frame_t[j + 1] - frame_t[j]), 0.0, 1.0))
        pa, pb = poses[j], poses[j + 1]
        tr = (1 - a) * pa.t + a * pb.t
        q = (1 - a) * pa.q + a * pb.q
        q = q / np.linalg.norm(q)
        return tr, q

    while t < t_end:
        if not (gap_lo < t < gap_hi):
            tr, q = pose_at(t)
            gt_lines.append(
                f"{t:.6f} {tr[0]:.6f} {tr[1]:.6f} {tr[2]:.6f} "
                f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}")
        t += 0.01 + float(rng.normal(0.0, 0.001))

    with open(os.path.join(out_dir, "groundtruth.txt"), "w") as f:
        f.write("\n".join(gt_lines) + "\n")

    n_png = sum(len(files) for _, _, files in os.walk(out_dir))
    size = sum(os.path.getsize(os.path.join(r, f))
               for r, _, files in os.walk(out_dir) for f in files)
    print(f"wrote {out_dir}: {n_png} files, {size / 2**20:.2f} MiB")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "..", "tests", "fixtures", "tum_micro"))
