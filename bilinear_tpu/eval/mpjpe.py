"""MPJPE evaluation — the reference protocol (valid_bilinear.py:51-83), as a
single chunked-scan XLA program.

Protocol: eval-mode forward (running BN stats, no dropout); un-normalize both
prediction and ground truth with TRAIN-split mean/std; per-sample distance =
sum over 16 joints of the per-joint Euclidean norm (mm); accumulate per
action with sub-action suffixes merged; per-action MPJPE = total/(count*16);
overall = grand total/(N*16).

TPU-first: instead of a 64-sample DataLoader loop, the whole valid split is
scanned in large static chunks on device, and per-action accumulation is a
segment_sum over precomputed action ids — no host round-trips.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bilinear_tpu.data.h36m import H36MSplit, NUM_JOINTS
from bilinear_tpu.utils.memo import memoize_factory


def _pad(a: np.ndarray, n_pad: int) -> np.ndarray:
    if n_pad == 0:
        return a
    pad_width = [(0, n_pad)] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, pad_width)


@memoize_factory
def make_mpjpe_fn(model, num_actions: int, chunk: int = 8192):
    """Build a jitted evaluator: (variables, x, y, mean_s, std_s, actions,
    mask) -> (per_action_dist_sum_mm, per_action_count). Memoized so
    repeated evaluations reuse one compiled program."""

    @jax.jit
    def evaluate(variables, x, y, mean_s, std_s, actions, mask):
        n_chunks = x.shape[0] // chunk

        def body(carry, inputs):
            dist_sum, count = carry
            cx, cy, ca, cm = inputs
            pred = model.apply(variables, cx, train=False)
            pred_mm = pred * std_s + mean_s
            gt_mm = cy * std_s + mean_s
            d = jnp.sum(
                jnp.sqrt(
                    jnp.sum(
                        jnp.square(
                            pred_mm.reshape(-1, NUM_JOINTS, 3)
                            - gt_mm.reshape(-1, NUM_JOINTS, 3)
                        ),
                        axis=2,
                    )
                ),
                axis=1,
            )  # (chunk,) summed-over-joints mm distances (valid_bilinear.py:60)
            d = d * cm
            dist_sum = dist_sum + jax.ops.segment_sum(d, ca, num_actions)
            count = count + jax.ops.segment_sum(cm, ca, num_actions)
            return (dist_sum, count), None

        init = (
            jnp.zeros(num_actions, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32),
            jnp.zeros(num_actions, jnp.float32),
        )
        xs = (
            x.reshape(n_chunks, chunk, -1),
            y.reshape(n_chunks, chunk, -1),
            actions.reshape(n_chunks, chunk),
            mask.reshape(n_chunks, chunk),
        )
        (dist_sum, count), _ = jax.lax.scan(body, init, xs)
        return dist_sum, count

    return evaluate


def evaluate_mpjpe(
    model, variables, split: H36MSplit, chunk: int = 8192
) -> Tuple[Dict[str, float], float]:
    """Returns ({action: MPJPE_mm}, overall_MPJPE_mm)."""
    n = len(split)
    num_actions = len(split.action_names)
    n_pad = (-n) % chunk

    x = jnp.asarray(_pad(split.part, n_pad))
    y = jnp.asarray(_pad(split.s, n_pad))
    actions = jnp.asarray(_pad(split.actions, n_pad))
    mask = jnp.asarray(_pad(np.ones(n, np.float32), n_pad))

    fn = make_mpjpe_fn(model, num_actions, chunk)
    dist_sum, count = fn(
        variables,
        x,
        y,
        jnp.asarray(split.mean_s),
        jnp.asarray(split.std_s),
        actions,
        mask,
    )
    dist_sum = np.asarray(dist_sum, np.float64)
    count = np.asarray(count, np.float64)

    per_action = {
        name: float(dist_sum[i] / (count[i] * NUM_JOINTS))
        for i, name in enumerate(split.action_names)
        if count[i] > 0
    }
    overall = float(dist_sum.sum() / (count.sum() * NUM_JOINTS))
    return per_action, overall
