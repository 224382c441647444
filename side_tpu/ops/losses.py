"""Training losses for stereo CenterNet, jit-friendly.

Matches the reference loss semantics exactly
(/root/reference/src/lib/models/losses.py and stereoTrainer.py:67-144):
penalty-reduced focal loss, masked-then-mean L1, unmasked grid cross-entropy,
and the Kendall uncertainty-weighted total.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .decode import gather_feat


def clamped_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """Sigmoid clamped away from {0, 1} (models/utils.py:8-10)."""
    return jnp.clip(jax.nn.sigmoid(x), 1e-4, 1.0 - 1e-4)


def focal_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """CornerNet penalty-reduced focal loss (losses.py:42-67).

    pred: sigmoided heatmap in (0, 1); gt: gaussian-splatted target.
    """
    pos = (gt == 1.0).astype(pred.dtype)
    neg = (gt < 1.0).astype(pred.dtype)
    neg_weights = jnp.power(1.0 - gt, 4)

    pos_loss = jnp.log(pred) * jnp.power(1.0 - pred, 2) * pos
    neg_loss = jnp.log(1.0 - pred) * jnp.power(pred, 2) * neg_weights * neg

    num_pos = pos.sum()
    pos_loss = pos_loss.sum()
    neg_loss = neg_loss.sum()
    return jnp.where(num_pos == 0,
                     -neg_loss,
                     -(pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0))


def focal_loss_logits(logits: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """focal_loss computed from raw logits with saturation-safe gradients.

    DELIBERATE (bounded) DEVIATION from the reference's
    `_sigmoid = clamp(sigmoid(x), 1e-4, 1-1e-4)` + `_neg_loss`
    (models/utils.py:8-10, losses.py:42-67): inside the clamp range the
    value is identical (log(clamp(sigmoid(x))) == log_sigmoid(x) there),
    but the clamp's zero gradient outside the range permanently kills any
    positive whose prediction saturates below 1e-4 — observed on the
    fixture overfit as hm_loss pinned at exactly -log(1e-4)*(1-1e-4)^2 /
    num_pos with one object undetectable forever.  log_sigmoid via
    softplus keeps d/dx alive (~1) at arbitrarily negative logits so
    saturated positives can always recover.  The focal *power* weights
    still use the clamped probabilities (value-only role).
    """
    pred = clamped_sigmoid(logits)
    log_p = -jax.nn.softplus(-logits)       # log sigmoid(x), never -inf
    log_1p = -jax.nn.softplus(logits)       # log(1 - sigmoid(x))

    pos = (gt == 1.0).astype(pred.dtype)
    neg = (gt < 1.0).astype(pred.dtype)
    neg_weights = jnp.power(1.0 - gt, 4)

    pos_loss = log_p * jnp.power(1.0 - pred, 2) * pos
    neg_loss = log_1p * jnp.power(pred, 2) * neg_weights * neg

    num_pos = pos.sum()
    pos_loss = pos_loss.sum()
    neg_loss = neg_loss.sum()
    return jnp.where(num_pos == 0,
                     -neg_loss,
                     -(pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0))


def masked_l1_loss(output: jnp.ndarray, mask: jnp.ndarray, ind: jnp.ndarray,
                   target: jnp.ndarray) -> jnp.ndarray:
    """L1 over gathered cells, zero outside mask, MEAN over all slots
    (losses.py:177-185 — note the reference divides by B*K*C, not by the
    number of valid slots)."""
    pred = gather_feat(output, ind)                    # (B, K, C)
    m = mask[..., None].astype(pred.dtype)
    return jnp.abs(pred * m - target * m).mean()


def cross_loss(output: jnp.ndarray, ind: jnp.ndarray,
               target: jnp.ndarray) -> jnp.ndarray:
    """Cross-entropy over grid logits at gathered cells (losses.py:187-198).

    The reference applies NO validity mask here: empty slots train towards
    class 0 — preserved for parity.
    target: (B, K) int class ids over the last-dim logits.
    """
    pred = gather_feat(output, ind)                    # (B, K, C)
    logp = jax.nn.log_softmax(pred, axis=-1)
    picked = jnp.take_along_axis(logp, target[..., None].astype(jnp.int32),
                                 axis=-1)[..., 0]
    return -picked.mean()


def compute_kept_label(kept: jnp.ndarray, wh: jnp.ndarray,
                       grid: int) -> jnp.ndarray:
    """Device version of the keypoint grid quantiser (stereoTrainer.py:77-95).

    kept: (B, K, 6) box-relative u-coords; wh: (B, K, 3).
    Returns (B, K, 3) int32 class targets.
    """
    width = wh[..., 0:1] + 1.0
    t = jnp.round(kept * grid / width)
    t = jnp.where((t < 0) | (t > grid - 1), -225.0, t)
    kpts_pos = jnp.max(t[..., :4], axis=-1)
    kpts_type = jnp.argmax(t[..., :4], axis=-1).astype(jnp.float32)
    merged = jnp.stack(
        [kpts_type * grid + kpts_pos, t[..., 4], t[..., 5]], axis=-1)
    return jnp.maximum(merged, 0.0).astype(jnp.int32)


def depth_bin_ce(logits: jnp.ndarray, depth_bin: jnp.ndarray,
                 gt_depth: jnp.ndarray) -> jnp.ndarray:
    """Soft-target cross-entropy over the cost volume's depth-bin logits.

    DELIBERATE DEVIATION from the reference (which supervises only the
    soft-argmin expectation with L1, stereo_network_old.py:232-236 +
    stereoTrainer.py:102-103): expectation-only supervision is unstable —
    dL1/dlogit_i = sign(err) * p_i * (bin_i - pred) pushes probability mass
    hardest toward the bin FARTHEST below the prediction, so the softmax
    collapses one-hot onto the extreme bin and gradients vanish (observed
    within ~10 steps on small data, round 2).  A gaussian soft target
    centred on the GT depth anchors the distribution at the right bin.
    Weight via cfg.depth_aux_weight; 0 restores exact reference semantics.

    logits, depth_bin: (B, K, D); gt_depth: (B, K) (0 = invalid slot).
    """
    valid = gt_depth > 0
    # sigma = one bin spacing per object (bins are uniform in depth)
    spacing = jnp.maximum(
        (depth_bin[..., 0] - depth_bin[..., -1]) /
        jnp.maximum(depth_bin.shape[-1] - 1, 1), 0.5)          # (B, K)
    d2 = (depth_bin - gt_depth[..., None]) ** 2
    q = jax.nn.softmax(-d2 / (2.0 * spacing[..., None] ** 2), axis=-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.sum(q * logp, axis=-1)                           # (B, K)
    n = jnp.maximum(valid.sum(), 1)
    return jnp.where(valid, ce, 0.0).sum() / n


def stereo_loss(outputs: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray],
                loss_weight: jnp.ndarray, grid: int, uncert: bool,
                use_cost_volume: bool,
                depth_aux_weight: float = 0.0,
                mse_loss: bool = False
                ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total stereo loss (stereoTrainer.py:97-144).

    `loss_weight` is the 7-vector [hm, wh, off, depth, dim, orien, kept];
    with `uncert` it is the learned log-variance vector s and the total is
    sum(L_i * exp(-s_i) + s_i).  `mse_loss` switches the heatmap criterion
    from the focal loss to nn.MSELoss over the clamped sigmoid
    (stereoTrainer.py:70,105-106) — pairs with the MSRA gaussian targets
    (data/targets.py).
    """
    hm_gt = batch["hm"]
    if hm_gt.shape != outputs["hm"].shape:  # targets (B, C, H, W) -> NHWC
        hm_gt = jnp.transpose(hm_gt, (0, 2, 3, 1))
    if mse_loss:
        hm_loss = jnp.mean((clamped_sigmoid(outputs["hm"]) - hm_gt) ** 2)
    else:
        hm_loss = focal_loss_logits(outputs["hm"], hm_gt)

    mask, ind = batch["rot_mask"], batch["ind"]
    dim_loss = masked_l1_loss(outputs["dim"], mask, ind, batch["dim"])
    orien_loss = masked_l1_loss(outputs["orien"], mask, ind, batch["orien"])
    wh_loss = masked_l1_loss(outputs["wh"], mask, ind, batch["wh"])
    off_loss = masked_l1_loss(outputs["reg"], mask, ind, batch["reg"])

    target = compute_kept_label(batch["kept"], batch["wh"], grid)
    kt = outputs["kept_type"]
    kept_type_loss = cross_loss(kt[..., :4 * grid], ind, target[..., 0])
    border_left_loss = cross_loss(kt[..., 4 * grid:5 * grid], ind,
                                  target[..., 1])
    border_right_loss = cross_loss(kt[..., 5 * grid:], ind, target[..., 2])
    kept_loss = (kept_type_loss + border_left_loss + border_right_loss) / 3.0

    if use_cost_volume:
        depth_loss = jnp.abs(outputs["depth"] - batch["depth"]).mean()
        if depth_aux_weight > 0 and "depth_logits" in outputs:
            depth_ce = depth_bin_ce(outputs["depth_logits"],
                                    outputs["depth_bin"],
                                    batch["depth"][..., 0])
            depth_loss = depth_loss + depth_aux_weight * depth_ce
    else:
        depth_loss = jnp.float32(0.0)

    parts = jnp.stack([hm_loss, wh_loss, off_loss, depth_loss,
                       dim_loss, orien_loss, kept_loss])
    lw = jnp.asarray(loss_weight, parts.dtype)
    if uncert:
        total = jnp.sum(parts * jnp.exp(-lw) + lw)
    else:
        total = jnp.sum(parts * lw)

    stats = {
        "loss": total, "hm_loss": hm_loss, "wh_loss": wh_loss,
        "off_loss": off_loss, "dim_loss": dim_loss, "orien_loss": orien_loss,
        "kept_loss": kept_loss,
    }
    if use_cost_volume:
        stats["depth_loss"] = depth_loss
    return total, stats
