"""Quantify the crop_ratio>=2 deviation (VERDICT r3 item 5).

The reference's crop_image takes an early-downscale path when the person box
exceeds 2x the output resolution (H36M/util.py:38-52, MPII/util.py:22-38):
it bilinearly resizes the WHOLE image down by crop_ratio first, then crops —
resampling twice and losing high frequencies. Our pipeline crops in one
affine gather (ops/affine.py; the host canvas stage only downscales by the
region margin). ops/affine.py argues the single pass is more faithful; this
probe replaces the argument with numbers:

1. pixel deltas between the two 256x256 crops on big-box records;
2. the end-metric effect: ONE detector (trained through our pipeline on a
   big-box learnable tree) evaluated twice on the SAME valid records — once
   on reference-two-pass crops, once on our crops — PCKh@0.5 each way.

Run (CPU is fine; small config):
    BILINEAR_TPU_PLATFORM=cpu python benchmarks/crop_ratio_probe.py
Results are recorded in docs/PARITY.md.
"""
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def build_tree(root: str, n_train=32, n_valid_extra=0, seed=0):
    from bilinear_tpu.data.synthetic import write_mpii_dataset

    # raw scale 2.2-3.2 -> record scale (x1.25) 2.75-4.0 -> crop_ratio
    # 200*scale/256 = 2.15-3.1: every record takes the reference's
    # early-downscale path.
    write_mpii_dataset(
        root, n_train_images=n_train, n_test_images=2, img_size=(1500, 1500),
        seed=seed, learnable=True, scale_range=(2.2, 3.2),
    )
    return root


def reference_crop(image_path, center, scale):
    """The reference's own crop_image (H36M/util.py:29-79) -> (256,256,3)
    float32 in [0,1]."""
    from oracle_loader import load_reference_module

    util = load_reference_module("H36M/util.py", "ref_h36m_util_croprobe")
    import vectormath

    img = util.crop_image(image_path, vectormath.Vector2(np.asarray(center)),
                          float(scale), 0)
    return np.asarray(img, np.float32) / 255.0


def our_crop(image_path, rec, canvas=512):
    from PIL import Image

    from bilinear_tpu.data.pipeline import record_to_canvas
    from bilinear_tpu.ops.affine import crop_batch

    with Image.open(image_path) as img:
        region, c, s, kp, head = record_to_canvas(img.convert("RGB"), rec, canvas)
    crop = np.asarray(crop_batch(
        jnp.asarray(region)[None], jnp.asarray(c)[None], jnp.asarray(s)[None],
        jnp.zeros((1,)),
    ))[0]
    return crop, (c, s, kp, head)


def main():
    from bilinear_tpu.data.h36m import Task
    from bilinear_tpu.data.mpii import MPIIAnnotations
    from bilinear_tpu.data.pipeline import MPIIHostPipeline
    from bilinear_tpu.eval.recalibrate import recalibrate
    from bilinear_tpu.models.hourglass_torch7 import MainModel
    from bilinear_tpu.ops.decode import argmax_decode, heatmap_to_image_space
    from bilinear_tpu.train.hourglass import HourglassTrainer

    root = build_tree(os.path.join(tempfile.mkdtemp(), "MPII"))
    anns_tr = MPIIAnnotations(root, Task.Train, split_seed=0)
    anns_va = MPIIAnnotations(root, Task.Valid)

    # ---- 1. pixel deltas on valid records --------------------------------
    deltas = []
    for i in range(len(anns_va)):
        rec = anns_va.record(i)
        path = anns_va.image_path(rec)
        ref = reference_crop(path, rec.center, rec.scale)
        ours, _ = our_crop(path, rec)
        d = np.abs(ref - ours)
        mse = float(np.mean((ref - ours) ** 2))
        deltas.append((float(d.mean()), float(d.max()),
                       10 * np.log10(1.0 / max(mse, 1e-12))))
    mean_abs = float(np.mean([d[0] for d in deltas]))
    max_abs = float(np.max([d[1] for d in deltas]))
    psnr = float(np.mean([d[2] for d in deltas]))
    print(json.dumps({"probe": "crop_ratio_pixels", "n": len(deltas),
                      "mean_abs": mean_abs, "max_abs": max_abs,
                      "psnr_db": psnr}), flush=True)

    # ---- 2. end metric: one detector, two crop paths ---------------------
    trainer = HourglassTrainer(batch_size=4, canvas=512)
    trainer.model = MainModel(n_stacks=1, features=32, depth=2)
    state = trainer.init_state(jax.random.PRNGKey(0))
    pipe = MPIIHostPipeline(anns_tr, batch_size=4, canvas=512, shuffle=True,
                            drop_last=True, seed=1)
    epochs = int(os.environ.get("CROP_PROBE_EPOCHS", "30"))
    for epoch in range(epochs):
        state, loss = trainer.fit_epoch(state, pipe, epoch, jax.random.PRNGKey(2))
    print(json.dumps({"probe": "train", "epochs": epochs,
                      "final_loss": float(loss)}), flush=True)

    stats = recalibrate(
        trainer.model, state.params, state.batch_stats,
        MPIIHostPipeline(anns_tr, 4, canvas=512, pad=True), max_batches=8,
    )
    variables = {"params": state.params, "batch_stats": stats}

    @jax.jit
    def forward_decode(crops):  # (B,256,256,3) -> (B,16,2) heatmap-space
        out = trainer.model.apply(variables, crops, train=False)
        hm = jnp.transpose(out[-1], (0, 3, 1, 2))  # (B,J,H,W)
        return argmax_decode(hm)

    # PCKh over 14 joints (drop pelvis 6, thorax 7 — valid_hourglass.py:119-128)
    keep = np.asarray([0, 1, 2, 3, 4, 5, 8, 9, 10, 11, 12, 13, 14, 15])
    hits = {"ref": 0, "ours": 0}
    total = 0
    for i in range(len(anns_va)):
        rec = anns_va.record(i)
        path = anns_va.image_path(rec)

        ref_img = reference_crop(path, rec.center, rec.scale)
        pose_hm = np.asarray(forward_decode(jnp.asarray(ref_img)[None]))[0]
        pose_ref = np.asarray(heatmap_to_image_space(
            jnp.asarray(pose_hm)[None], jnp.asarray(rec.center)[None],
            jnp.asarray(rec.scale)[None]))[0]

        our_img, (c, s, kp_canvas, head_canvas) = our_crop(path, rec)
        pose_hm2 = np.asarray(forward_decode(jnp.asarray(our_img)[None]))[0]
        pose_ours_canvas = np.asarray(heatmap_to_image_space(
            jnp.asarray(pose_hm2)[None], jnp.asarray(c)[None],
            jnp.asarray(s)[None]))[0]

        thr_orig = 0.5 * rec.head
        thr_canvas = 0.5 * head_canvas
        for j in keep:
            if not rec.valid[j]:
                continue
            total += 1
            d_ref = np.linalg.norm(pose_ref[j] - rec.keypoints[j])
            d_our = np.linalg.norm(pose_ours_canvas[j] - kp_canvas[j])
            hits["ref"] += d_ref <= thr_orig
            hits["ours"] += d_our <= thr_canvas

    pckh_ref = 100.0 * hits["ref"] / max(total, 1)
    pckh_ours = 100.0 * hits["ours"] / max(total, 1)
    print(json.dumps({
        "probe": "crop_ratio_pckh", "n_joints": total,
        "pckh_reference_twopass_crop": pckh_ref,
        "pckh_our_singlepass_crop": pckh_ours,
        "delta": pckh_ours - pckh_ref,
    }), flush=True)


if __name__ == "__main__":
    main()
