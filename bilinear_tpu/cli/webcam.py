"""Live / offline pose demo — working rebuild of the reference's webcam.py
(whose imports are stale and whose quit key never fires due to an operator-
precedence bug, webcam.py:6-11,47 — SURVEY.md §2.3).

Captures frames (webcam, video file, or a synthetic moving pattern for
headless testing), resizes to 256x256, runs the fused End2End program
(hourglass -> softargmax -> lifting in one jitted call), and overlays the 16
detected keypoints as red squares on a 4x-upscaled display, exactly the
reference's presentation (webcam.py:27-45). 'q' quits (actually working).

Usage:
  python -m bilinear_tpu.cli.webcam                 # camera 0
  python -m bilinear_tpu.cli.webcam --video in.mp4  # offline file
  python -m bilinear_tpu.cli.webcam --synthetic --frames 10 --out-dir out/
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from bilinear_tpu.io.checkpoint import resume_or_init_fast
from bilinear_tpu.train.end2end import End2EndTrainer
from bilinear_tpu.utils.residency import packed_device_put


def build_forward(variant: str, save_root: str, comment: str, seed: int = 0):
    trainer = End2EndTrainer(variant=variant)
    mean = jnp.zeros(32)
    std = jnp.ones(32)
    state, epoch = resume_or_init_fast(
        lambda k: trainer.init_state(k, mean, std), jax.random.PRNGKey(seed),
        os.path.join(save_root, comment, "parameter")
    )
    # Pin the restored (numpy) weights on device once — per-FRAME dispatch
    # would otherwise re-upload the whole tree every frame (seconds/frame
    # at production size on a slow host link; see eval/pckh.py). Only the
    # fields the forward reads: uploading the optimizer moments too would
    # double the startup transfer for nothing.
    state = state.replace(
        params=packed_device_put(state.params),
        batch_stats=packed_device_put(state.batch_stats),
    )
    model = trainer.model

    @jax.jit
    def forward(params, batch_stats, frame):
        """frame: (256, 256, 3) float32 [0,1] -> (pose2d (16,2) in frame px,
        pose3d (48,) normalized)."""
        images = frame[None]
        centers = jnp.asarray([[128.0, 128.0]])
        scales = jnp.asarray([256.0 / 200.0])
        _, pose2d, pose3d = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, centers, scales, mean, std, train=False,
        )
        return pose2d[0], pose3d[0]

    return forward, state, epoch


def draw_keypoints(frame_u8: np.ndarray, pose2d: np.ndarray, upscale: int = 4):
    """Red 4x4 squares at 4x-upscaled keypoint positions (webcam.py:33-43)."""
    big = np.repeat(np.repeat(frame_u8, upscale, 0), upscale, 1).copy()
    h, w = big.shape[:2]
    for x, y in pose2d:
        xi, yi = int(x * upscale), int(y * upscale)
        if 0 <= xi < w - 4 and 0 <= yi < h - 4:
            big[yi : yi + 4, xi : xi + 4] = (255, 0, 0)
    return big


def synthetic_frames(n: int):
    rng = np.random.RandomState(0)
    base = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    for i in range(n):
        frame = np.roll(np.kron(base, np.ones((8, 8, 1))).astype(np.uint8),
                        shift=8 * i, axis=1)
        yield frame


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--variant", default="torch7")
    parser.add_argument("--save-root", default="save")
    parser.add_argument("--comment", default="End2End")
    parser.add_argument("--video", default=None)
    parser.add_argument("--camera", type=int, default=0)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--frames", type=int, default=30)
    parser.add_argument("--out-dir", default=None)
    args = parser.parse_args(argv)

    forward, state, epoch = build_forward(
        args.variant, args.save_root, args.comment
    )
    print(f"End2End forward ready (epoch {epoch})")

    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)

    if args.synthetic:
        source = synthetic_frames(args.frames)
        show = False
    else:
        import cv2

        cap = cv2.VideoCapture(args.video if args.video else args.camera)
        if not cap.isOpened():
            raise SystemExit("could not open capture source")

        def gen():
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                yield cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)

        source = gen()
        show = args.out_dir is None

    for i, frame in enumerate(source):
        from PIL import Image

        img = Image.fromarray(frame).resize((256, 256), Image.BILINEAR)
        arr = np.asarray(img, np.float32) / 255.0
        pose2d, pose3d = forward(state.params, state.batch_stats, jnp.asarray(arr))
        overlay = draw_keypoints(np.asarray(img, np.uint8), np.asarray(pose2d))

        if args.out_dir:
            Image.fromarray(overlay).save(
                os.path.join(args.out_dir, f"frame_{i:04d}.png")
            )
        if show:
            import cv2

            cv2.imshow("bilinear_tpu", cv2.cvtColor(overlay, cv2.COLOR_RGB2BGR))
            # The reference's `waitKey(1) and 0xFF == ord('q')` never quits;
            # this one does.
            if cv2.waitKey(1) & 0xFF == ord("q"):
                break
    print("done")


if __name__ == "__main__":
    main()
