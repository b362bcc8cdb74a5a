"""Loss functions (all masked over valid graphs; padded slots contribute 0).

Mirrors the three dataset loss_fns:
  - code2 (seq CE): mean over max_seq_len positions of CrossEntropy on
    y_arr[:, i], then /m for FLAG (/root/reference/dataset/code.py:36-47).
  - mol: BCE-with-logits on labeled entries only (NaN mask), MSE for
    regression, /m (/root/reference/dataset/mol.py:20-33).
  - tud: plain cross-entropy; note the reference IGNORES the FLAG m divisor
    here (tud.py:24-29) — reproduced faithfully.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_mean(x, mask):
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def softmax_cross_entropy(logits, labels):
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    return logz - gold


def seq_token_loss(pred, batch, m=1.0):
    """pred: [G, L, V]; batch.y_arr: [G, L]."""
    L = pred.shape[1]
    ce = softmax_cross_entropy(pred, batch.y_arr)  # [G, L]
    per_pos = jnp.stack([masked_mean(ce[:, i], batch.graph_mask) for i in range(L)])
    return jnp.sum(per_pos) / L / m


def binary_multitask_loss(pred, batch, m=1.0):
    """pred: [G, T] logits; batch.y: [G, T] float with NaN for unlabeled."""
    y = batch.y
    is_labeled = (y == y) & batch.graph_mask[:, None]
    y_safe = jnp.where(is_labeled, y, 0.0)
    p = pred.astype(jnp.float32)
    # numerically-stable BCE-with-logits
    bce = jnp.maximum(p, 0) - p * y_safe + jnp.log1p(jnp.exp(-jnp.abs(p)))
    return masked_mean(jnp.where(is_labeled, bce, 0), is_labeled) / m


def regression_loss(pred, batch, m=1.0):
    y = batch.y
    is_labeled = (y == y) & batch.graph_mask[:, None]
    y_safe = jnp.where(is_labeled, y, 0.0)
    se = (pred.astype(jnp.float32) - y_safe) ** 2
    return masked_mean(jnp.where(is_labeled, se, 0), is_labeled) / m


def classification_loss(pred, batch, m=1.0):
    """pred: [G, C]; batch.y: [G] int class ids. m intentionally unused
    (reference tud.py quirk)."""
    del m
    ce = softmax_cross_entropy(pred, batch.y.astype(jnp.int32))
    return masked_mean(ce, batch.graph_mask)


# ---- masked-mean denominators -------------------------------------------
# Each loss above is a masked MEAN over its shard; under shard_map data
# parallelism the correct global loss/gradient is the count-weighted mean
# over shards: psum(loss*w)/psum(w) (parallel/dp.py). `weight_fn` exposes
# each loss's denominator so unbalanced shards (epoch-tail padding, bucketed
# chunk breaks) reduce exactly like the single-device global batch.

def graph_count_weight(batch):
    return jnp.sum(batch.graph_mask.astype(jnp.float32))


def labeled_count_weight(batch):
    y = batch.y
    is_labeled = (y == y) & batch.graph_mask[:, None]
    return jnp.sum(is_labeled.astype(jnp.float32))


seq_token_loss.weight_fn = graph_count_weight
classification_loss.weight_fn = graph_count_weight
binary_multitask_loss.weight_fn = labeled_count_weight
regression_loss.weight_fn = labeled_count_weight
