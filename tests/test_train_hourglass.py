"""M3 integration: MPII pipeline -> hourglass training -> PCKh eval, all on
synthetic data with small model configs (CPU-feasible)."""
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bilinear_tpu.data.h36m import Task
from bilinear_tpu.data.mpii import MPIIAnnotations
from bilinear_tpu.data.pipeline import MPIIHostPipeline
from bilinear_tpu.data.synthetic import write_mpii_dataset
from bilinear_tpu.eval.pckh import evaluate_pckh
from bilinear_tpu.eval.recalibrate import recalibrate
from bilinear_tpu.models.hourglass_torch7 import MainModel
from bilinear_tpu.train.hourglass import HourglassTrainer, preprocess_batch


@pytest.fixture(scope="module")
def mpii_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("MPII")
    write_mpii_dataset(str(root), n_train_images=10, n_test_images=2)
    # Create the split files deterministically up front.
    MPIIAnnotations(str(root), Task.Train, split_seed=0)
    return str(root)


@pytest.fixture(scope="module")
def small_trainer():
    t = HourglassTrainer(batch_size=4, canvas=256)
    t.model = MainModel(n_stacks=2, features=16, depth=2)
    return t


def test_split_files_created_and_disjoint(mpii_root):
    tr = MPIIAnnotations(mpii_root, Task.Train)
    va = MPIIAnnotations(mpii_root, Task.Valid)
    tr_set = {tuple(r) for r in tr.subset}
    va_set = {tuple(r) for r in va.subset}
    assert tr_set and va_set
    assert not (tr_set & va_set)
    # ~90/10
    assert len(tr_set) == int(0.9 * (len(tr_set) + len(va_set)))


def test_record_annotation_math(mpii_root):
    """scale 1.25x, center y-offset 15*raw_scale, head 0.6*diag
    (MPII/data.py:83-93)."""
    anns = MPIIAnnotations(mpii_root, Task.Train)
    rec = anns.record(0)
    rect = anns.annolist[rec.img_idx].annorect
    if isinstance(rect, np.ndarray):
        rect = rect[rec.r_idx]
    raw = float(rect.scale)
    assert rec.scale == pytest.approx(1.25 * raw)
    assert rec.center[1] == pytest.approx(float(rect.objpos.y) + 15 * raw)
    diag = np.hypot(float(rect.x2) - float(rect.x1), float(rect.y2) - float(rect.y1))
    assert rec.head == pytest.approx(0.6 * diag)
    assert np.isnan(rec.keypoints[~rec.valid]).all()


def test_pipeline_prefetch_thread_exits_on_early_abandon(mpii_root):
    """Abandoning a prefetched epoch() mid-iteration (recalibrate's
    max_batches break) must release the worker thread — it previously
    blocked forever on the bounded queue, pinning decoded batches."""
    import threading

    anns = MPIIAnnotations(mpii_root, Task.Train)
    pipe = MPIIHostPipeline(anns, batch_size=2, canvas=256)
    gen = pipe.epoch(0, prefetch=2)
    next(gen)
    gen.close()  # early abandon
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline:
        leaked = [
            t for t in threading.enumerate()
            if t.name == "pipeline-prefetch" and t.is_alive()
        ]
        if not leaked:
            break
        time.sleep(0.05)
    assert not leaked, f"prefetch worker leaked: {leaked}"


def test_pipeline_prefetch_sentinel_put_honors_abandon(mpii_root):
    """Regression: the worker's TERMINAL puts (sentinel / error) must also
    honor the stop flag. With the queue full right as the worker finishes
    its last batch, the old unbounded q.put(sentinel) blocked forever after
    the consumer abandoned the generator."""
    import threading

    anns = MPIIAnnotations(mpii_root, Task.Train)
    pipe = MPIIHostPipeline(anns, batch_size=2, canvas=256)
    pipe._index_batches = lambda epoch: [0, 1]  # exactly two batches
    pipe._load = lambda b: b

    before = set(threading.enumerate())
    gen = pipe.epoch(0, prefetch=1)
    next(gen)  # worker then loads batch 1 (queue full) and reaches the
    # sentinel put while the queue still holds batch 1
    time.sleep(0.3)
    gen.close()
    (worker,) = [
        t for t in set(threading.enumerate()) - before
        if t.name == "pipeline-prefetch"
    ] or [None]
    if worker is not None:
        worker.join(timeout=10)
        assert not worker.is_alive(), "sentinel put ignored the stop flag"


def test_canvas_batch_contains_keypoints(mpii_root):
    anns = MPIIAnnotations(mpii_root, Task.Train)
    pipe = MPIIHostPipeline(anns, batch_size=4, canvas=256)
    batch = next(iter(pipe))
    assert batch.images.shape == (4, 256, 256, 3)
    assert batch.images.max() <= 1.0 and batch.images.min() >= 0.0
    # Annotated keypoints should land inside the canvas.
    kp = batch.keypoints[batch.valid]
    assert (kp >= -1).all() and (kp < 256 + 1).all()


def test_preprocess_batch_eval_deterministic(mpii_root):
    anns = MPIIAnnotations(mpii_root, Task.Train)
    pipe = MPIIHostPipeline(anns, batch_size=2, canvas=256)
    b = next(iter(pipe))
    args = (
        jnp.asarray(b.images), jnp.asarray(b.centers), jnp.asarray(b.scales),
        jnp.asarray(b.keypoints), jnp.asarray(b.valid),
    )
    c1, h1, _ = preprocess_batch(jax.random.PRNGKey(0), *args, augment=False)
    c2, h2, _ = preprocess_batch(jax.random.PRNGKey(5), *args, augment=False)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    assert c1.shape == (2, 256, 256, 3)
    assert h1.shape == (2, 16, 64, 64)
    # Heatmaps render only for valid in-bounds joints; peak value 1.
    assert 0.99 <= float(h1.max()) <= 1.0


def test_preprocess_batch_augment_varies(mpii_root):
    anns = MPIIAnnotations(mpii_root, Task.Train)
    pipe = MPIIHostPipeline(anns, batch_size=2, canvas=256)
    b = next(iter(pipe))
    args = (
        jnp.asarray(b.images), jnp.asarray(b.centers), jnp.asarray(b.scales),
        jnp.asarray(b.keypoints), jnp.asarray(b.valid),
    )
    c1, _, _ = preprocess_batch(jax.random.PRNGKey(0), *args, augment=True)
    c2, _, _ = preprocess_batch(jax.random.PRNGKey(1), *args, augment=True)
    assert not np.allclose(np.asarray(c1), np.asarray(c2))


def test_hourglass_training_loss_decreases(mpii_root, small_trainer):
    anns = MPIIAnnotations(mpii_root, Task.Train)
    pipe = MPIIHostPipeline(anns, batch_size=4, canvas=256, shuffle=True,
                            drop_last=True)
    state = small_trainer.init_state(jax.random.PRNGKey(0))
    losses = []
    for epoch in range(4):
        state, loss = small_trainer.fit_epoch(
            state, pipe, epoch, jax.random.PRNGKey(1)
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert int(state.step) > 1


def test_pckh_eval_protocol(mpii_root, small_trainer):
    """Recalibrate + flip-TTA eval runs, yields sane percentages, and pads
    correctly."""
    state = small_trainer.init_state(jax.random.PRNGKey(0))
    train_pipe = MPIIHostPipeline(
        MPIIAnnotations(mpii_root, Task.Train), 4, canvas=256, pad=True
    )
    stats = recalibrate(
        small_trainer.model, state.params, state.batch_stats, train_pipe,
        max_batches=2,
    )
    count = jax.tree.leaves(
        {k: v for k, v in stats.items() if True}
    )
    valid_pipe = MPIIHostPipeline(
        MPIIAnnotations(mpii_root, Task.Valid), 4, canvas=256, pad=True
    )
    per_joint, avg = evaluate_pckh(
        small_trainer.model,
        {"params": state.params, "batch_stats": stats},
        valid_pipe,
    )
    assert 0.0 <= avg <= 100.0
    assert len(per_joint) == 14
    # Recalibration actually updated the counters.
    flat = jax.tree_util.tree_flatten_with_path(stats)[0]
    counts = [v for p, v in flat if str(p[-1].key) == "count"]
    assert all(int(c) == 2 for c in counts)


def test_pckh_perfect_predictor_scores_100(mpii_root):
    """If the model emits exact GT heatmaps, PCKh must be 100 on annotated
    joints (protocol self-consistency, including flip TTA)."""
    from bilinear_tpu.ops.joints import MPII_FLIP_SWAP

    class Oracle:
        def apply(self, variables, crops, train=False, **kw):
            # variables carries the target heatmaps for this batch.
            return variables["targets"]

    anns = MPIIAnnotations(mpii_root, Task.Valid)
    pipe = MPIIHostPipeline(anns, batch_size=2, canvas=256, pad=True)
    from bilinear_tpu.eval.pckh import make_pckh_step

    hit = np.zeros(14, np.int64)
    total = np.zeros(14, np.int64)
    for batch in pipe.epoch(0):
        args = (
            jnp.asarray(batch.images), jnp.asarray(batch.centers),
            jnp.asarray(batch.scales), jnp.asarray(batch.keypoints),
            jnp.asarray(batch.valid),
        )
        _, targets, _ = preprocess_batch(jax.random.PRNGKey(0), *args, augment=False)
        # Build the model output the decoder expects: (S, B, H, W, J); make
        # it flip-symmetric so flip-TTA averages to the same map. The two
        # "forward passes" inside the step read t1/t2 from `variables`, so
        # they stay traced arguments (no constant folding, no order issues).
        tgt = jnp.transpose(targets, (0, 2, 3, 1))[None]
        flipped = jnp.flip(tgt[..., MPII_FLIP_SWAP], axis=-2)

        class Both:
            def apply(self, variables, crops, train=False, **kw):
                # The step runs one forward over [straight; mirrored]
                # concatenated on the batch axis.
                return jnp.concatenate([variables["t1"], variables["t2"]], axis=1)

        from bilinear_tpu.eval import pckh as pckh_mod

        step = pckh_mod.make_pckh_step(Both())
        h, t = step(
            {"t1": tgt, "t2": flipped}, *args,
            jnp.asarray(batch.heads), jnp.asarray(batch.index >= 0),
        )
        hit += np.asarray(h, np.int64)
        total += np.asarray(t, np.int64)
    assert total.sum() > 0
    # Argmax decode quantizes to 64-grid: allow the rare sub-threshold miss
    # for tiny heads, but require near-perfect overall.
    assert hit.sum() / total.sum() > 0.95


def test_hourglass_bf16_training_matches_f32_quality(mpii_root):
    """bf16 compute (the MXU-native dtype, `--dtype bfloat16`) must converge
    like f32: same model/seeds/batches, loss trajectories within a loose
    band and both strictly decreasing (VERDICT round-1 Weak #6)."""
    anns = MPIIAnnotations(mpii_root, Task.Train)

    def run(dtype):
        t = HourglassTrainer(batch_size=4, canvas=256, dtype=dtype)
        t.model = MainModel(n_stacks=1, features=8, depth=1, dtype=dtype)
        pipe = MPIIHostPipeline(anns, batch_size=4, canvas=256, shuffle=True,
                                drop_last=True, seed=3)
        state = t.init_state(jax.random.PRNGKey(0))
        losses = []
        for epoch in range(3):
            state, loss = t.fit_epoch(state, pipe, epoch, jax.random.PRNGKey(1))
            losses.append(float(loss))
        return losses

    f32 = run(jnp.float32)
    bf16 = run(jnp.bfloat16)
    assert f32[-1] < f32[0] and bf16[-1] < bf16[0]
    # Same loss scale-of-magnitude trajectory: bf16 rounding must not change
    # training behavior, only precision (~3 significant digits).
    for a, b in zip(f32, bf16):
        assert abs(a - b) / max(abs(a), 1e-9) < 0.25, (f32, bf16)


def test_u8_transport_equals_f32(mpii_root):
    """transport='u8' ships uint8 canvases; after crop_batch's on-device
    /255 the training inputs match the f32 transport path."""
    anns = MPIIAnnotations(mpii_root, Task.Train)
    pf = MPIIHostPipeline(anns, batch_size=4, canvas=256)
    pu = MPIIHostPipeline(anns, batch_size=4, canvas=256, transport="u8")
    bf = next(iter(pf))
    bu = next(iter(pu))
    assert bu.images.dtype == np.uint8 and bf.images.dtype == np.float32
    np.testing.assert_allclose(
        bu.images.astype(np.float32) / 255.0, bf.images, atol=1e-7
    )
    np.testing.assert_array_equal(bu.centers, bf.centers)
    np.testing.assert_array_equal(bu.keypoints, bf.keypoints)

    args = lambda b: (
        jnp.asarray(b.centers), jnp.asarray(b.scales),
        jnp.asarray(b.keypoints), jnp.asarray(b.valid),
    )
    cf, hf, _ = preprocess_batch(
        jax.random.PRNGKey(0), jnp.asarray(bf.images), *args(bf), augment=False
    )
    cu, hu, _ = preprocess_batch(
        jax.random.PRNGKey(0), jnp.asarray(bu.images), *args(bu), augment=False
    )
    assert cu.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(cu), np.asarray(cf), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(hu), np.asarray(hf))


def test_u8_transport_train_step(mpii_root):
    """A full jitted train step accepts uint8 canvases and matches f32."""
    anns = MPIIAnnotations(mpii_root, Task.Train)
    pf = MPIIHostPipeline(anns, batch_size=2, canvas=128)
    pu = MPIIHostPipeline(anns, batch_size=2, canvas=128, transport="u8")
    bf, bu = next(iter(pf)), next(iter(pu))

    trainer = HourglassTrainer(batch_size=2, canvas=128)
    trainer.model = MainModel(n_stacks=1, features=8, depth=1)
    state = trainer.init_state(jax.random.PRNGKey(0))

    def as_dict(b):
        return {
            "images": jnp.asarray(b.images), "centers": jnp.asarray(b.centers),
            "scales": jnp.asarray(b.scales),
            "keypoints": jnp.asarray(b.keypoints), "valid": jnp.asarray(b.valid),
        }

    _, loss_f = jax.jit(trainer._train_step)(state, as_dict(bf), jax.random.PRNGKey(1))
    _, loss_u = jax.jit(trainer._train_step)(state, as_dict(bu), jax.random.PRNGKey(1))
    assert float(loss_f) == pytest.approx(float(loss_u), rel=1e-5)


def test_record_to_canvas_downscale_scales_head(mpii_root):
    """When the crop region exceeds the canvas and the source is downscaled
    by f, EVERY length-like annotation must shrink by f — including the PCKh
    head length, or dist/head (eval/pckh.py) inflates by f (round-2 advisor
    finding). Checks the invariant directly: dist(kp, center)/head is
    preserved across the downscale."""
    from bilinear_tpu.data.mpii import MPIIRecord
    from bilinear_tpu.data.pipeline import REGION_MARGIN, record_to_canvas
    from PIL import Image as PILImage

    rng = np.random.RandomState(5)
    img = PILImage.fromarray((rng.rand(400, 500, 3) * 255).astype(np.uint8))
    rec = MPIIRecord(
        image_name="x.jpg",
        center=np.asarray([250.0, 200.0], np.float32),
        scale=1.5,  # 2*100*1.5*MARGIN = 615 > 128 canvas -> downscale path
        head=42.0,
        keypoints=np.full((16, 2), 230.0, np.float32),
        valid=np.ones(16, bool),
        img_idx=0,
        r_idx=0,
    )
    canvas = 128
    f = (2 * 100.0 * rec.scale * REGION_MARGIN) / canvas
    assert f > 1
    _, c, s, kp, head = record_to_canvas(img, rec, canvas=canvas)
    assert s == pytest.approx(rec.scale / f)
    assert head == pytest.approx(rec.head / f)
    # The PCKh ratio is invariant under the prescale.
    d_orig = np.linalg.norm(rec.keypoints[0] - rec.center)
    d_canvas = np.linalg.norm(kp[0] - c)
    assert d_canvas / head == pytest.approx(d_orig / rec.head, rel=1e-5)


def test_fit_epoch_donation_contract(mpii_root):
    """fit_epoch donates the incoming state to the device step; reusing it
    afterwards must fail loudly (on TPU donation invalidates the buffers; on
    CPU fit_epoch deletes them explicitly so the contract is testable here)."""
    anns = MPIIAnnotations(mpii_root, Task.Train)
    pipe = MPIIHostPipeline(anns, batch_size=4, canvas=128, drop_last=True)
    t = HourglassTrainer(batch_size=4, canvas=128)
    t.model = MainModel(n_stacks=1, features=8, depth=1)
    old_state = t.init_state(jax.random.PRNGKey(0))
    new_state, _ = t.fit_epoch(old_state, pipe, 0, jax.random.PRNGKey(1))
    assert int(new_state.step) > 0  # the returned state is live
    with pytest.raises(RuntimeError):
        np.asarray(jax.tree.leaves(old_state.params)[0])


def test_mpii_test_annotations_train_subset(mpii_root):
    """MPIITestAnnotations(train_subset=True) walks img_train==1 entries with
    subset-relative 1-based indices (the SH-preprocess-over-train path)."""
    from bilinear_tpu.data.mpii import MPIITestAnnotations

    test = MPIITestAnnotations(mpii_root)
    train = MPIITestAnnotations(mpii_root, train_subset=True)
    # Synthetic set: 10 train images / 2 test images, single_person=[1] each.
    assert len(test) == 2 and len(train) == 10
    test_names = {r.image_name for r in test.entries}
    train_names = {r.image_name for r in train.entries}
    assert not (test_names & train_names)
    # 1-based, subset-relative img indices; r_idx 1-based from single_person.
    assert [r.img_idx for r in train.entries] == list(range(1, 11))
    assert all(r.r_idx == 1 for r in train.entries)
    # center = raw objpos (no +15*scale shift), scale = 1.25*raw.
    full = MPIIAnnotations(mpii_root, Task.Train)
    raw_rect = _as_list_rect(full.annolist[full.subset[0][0]].annorect)[0]
    some = next(
        r for r in train.entries
        if r.image_name == str(full.annolist[full.subset[0][0]].image.name)
    )
    assert some.center[1] == pytest.approx(float(raw_rect.objpos.y))
    assert some.scale == pytest.approx(1.25 * float(raw_rect.scale))


def _as_list_rect(x):
    return list(x) if isinstance(x, np.ndarray) else [x]


def test_canvas_cache_matches_decode(mpii_root, tmp_path):
    """cache_dir materializes u8 canvases once; cached batches are
    identical to freshly-decoded ones (same records, same content)."""
    anns = MPIIAnnotations(mpii_root, Task.Train)
    fresh = MPIIHostPipeline(anns, batch_size=4, canvas=128, transport="u8")
    cached = MPIIHostPipeline(
        anns, batch_size=4, canvas=128, transport="u8",
        cache_dir=str(tmp_path / "cache"),
    )
    bf = next(iter(fresh))
    bc = next(iter(cached))
    np.testing.assert_array_equal(bc.images, bf.images)
    np.testing.assert_array_equal(bc.centers, bf.centers)
    np.testing.assert_array_equal(bc.scales, bf.scales)
    np.testing.assert_array_equal(bc.keypoints, bf.keypoints)
    np.testing.assert_array_equal(bc.valid, bf.valid)
    np.testing.assert_array_equal(bc.heads, bf.heads)
    np.testing.assert_array_equal(bc.index, bf.index)
    # Second pipeline instance reuses the on-disk cache (no re-decode).
    reread = MPIIHostPipeline(
        anns, batch_size=4, canvas=128, transport="u8",
        cache_dir=str(tmp_path / "cache"),
    )
    br = next(iter(reread))
    np.testing.assert_array_equal(br.images, bf.images)
    # Shuffled epochs shuffle cached batches identically to decode path.
    f2 = list(MPIIHostPipeline(anns, 4, canvas=128, shuffle=True, seed=3,
                               transport="u8").epoch(1))
    c2 = list(MPIIHostPipeline(anns, 4, canvas=128, shuffle=True, seed=3,
                               transport="u8",
                               cache_dir=str(tmp_path / "cache")).epoch(1))
    for a, b in zip(f2, c2):
        np.testing.assert_array_equal(b.images, a.images)
        np.testing.assert_array_equal(b.index, a.index)
