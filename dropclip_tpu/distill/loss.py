"""Distillation losses, masked and fixed-shape.

Parity targets:
- cosine distillation loss: ``(1 - CosineSimilarity(out, targets)).mean()``
  (reference engine/distil.py:154-156, torch eps 1e-8);
- L1 variant (engine/distil.py:157-158);
- per-object hinge auxiliary loss (engine/distil.py:52-96
  ``batch_aux_hinge_loss``): within-object cohesion + margin against other
  objects' mean features;
- classification-head cross entropy with ignore_index
  (engine/distil.py:116,187-192).

The reference hinge loss loops over scenes and objects with dynamic unique
labels; here objects are a static ``max_labels`` axis with presence masks,
and the O(n²) within-object mean pairwise cosine uses the closed form
``mean_{ij} f̂_i·f̂_j = ||Σ f̂||² / n²`` (torch's ``cos_sim.mean()`` includes
the diagonal, so this is exact, not an approximation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_COS_EPS = 1e-8  # torch.nn.CosineSimilarity default


def _cosine_similarity(a: jnp.ndarray, b: jnp.ndarray, eps: float = _COS_EPS):
    # sqrt(sum²+tiny) keeps the gradient finite at exactly-zero rows (a relu
    # stack can output an all-zero row for a real voxel); ‖·‖ itself has a
    # NaN gradient at 0 even when the eps-max selects the other branch.
    na = jnp.maximum(jnp.sqrt(jnp.sum(a * a, axis=-1) + 1e-24), eps)
    nb = jnp.maximum(jnp.sqrt(jnp.sum(b * b, axis=-1) + 1e-24), eps)
    return jnp.sum(a * b, axis=-1) / (na * nb)


def cosine_distil_loss(out: jnp.ndarray, targets: jnp.ndarray,
                       mask: jnp.ndarray) -> jnp.ndarray:
    """(1 - cos(out, target)) averaged over valid voxels.

    Padded rows are replaced with ones before the norm: d‖x‖/dx is NaN at
    x=0 and NaN·0 masking would poison the gradients.
    """
    m = mask[..., None]
    safe_out = jnp.where(m, out.astype(jnp.float32), 1.0)
    safe_tgt = jnp.where(m, targets.astype(jnp.float32), 1.0)
    cos = _cosine_similarity(safe_out, safe_tgt)
    w = mask.astype(jnp.float32)
    return jnp.sum((1.0 - cos) * w) / jnp.maximum(jnp.sum(w), 1.0)


def l1_distil_loss(out: jnp.ndarray, targets: jnp.ndarray,
                   mask: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute error over valid voxel-feature entries."""
    w = mask.astype(jnp.float32)[..., None]
    err = jnp.abs(out.astype(jnp.float32) - targets.astype(jnp.float32)) * w
    return jnp.sum(err) / jnp.maximum(jnp.sum(w) * out.shape[-1], 1.0)


def _hinge_single(features: jnp.ndarray, labels: jnp.ndarray,
                  mask: jnp.ndarray, max_labels: int, margin: float):
    """Per-scene (pos_loss, margin_loss) — reference engine/distil.py:64-93."""
    f32 = jnp.where(mask[:, None], features.astype(jnp.float32), 1.0)
    fnorm = jnp.sqrt(jnp.sum(f32 * f32, axis=-1, keepdims=True) + 1e-24)
    fhat = f32 / jnp.maximum(fnorm, 1e-12)
    fhat = fhat * mask[:, None]

    onehot = jax.nn.one_hot(labels, max_labels, dtype=jnp.float32) * mask[:, None]
    counts = jnp.sum(onehot, axis=0)                       # (L,)
    present = counts > 0
    k = jnp.maximum(jnp.sum(present.astype(jnp.float32)), 1.0)

    sums = onehot.T @ fhat                                  # (L, C) Σ f̂ per label
    safe_counts = jnp.maximum(counts, 1.0)
    mean_feats = jnp.where(present[:, None], sums / safe_counts[:, None], 1.0)
    mnorm = jnp.sqrt(jnp.sum(mean_feats**2, axis=-1, keepdims=True) + 1e-24)
    mean_hat = mean_feats / jnp.maximum(mnorm, _COS_EPS)
    mean_hat = mean_hat * present[:, None]

    # pos: mean pairwise cosine within each label = ||Σ f̂||² / n²
    pos_cos = jnp.sum(sums * sums, axis=-1) / (safe_counts**2)  # (L,)

    # neg: mean over members i of label l and ALL labels m of cos(f̂_i, μ̂_m)
    # with the own-label row zeroed — torch divides by K incl. the zero row.
    cross = sums @ mean_hat.T                                # (L, M) Σ_{i∈l} f̂_i·μ̂_m
    cross = cross * (1.0 - jnp.eye(max_labels))              # drop own label
    cross = cross * present[None, :]                         # absent μ are zero rows
    neg_cos = jnp.sum(cross, axis=-1) / (safe_counts * k)    # (L,)

    pos_loss = jnp.sum((1.0 - pos_cos) * present) / k
    margin_loss = jnp.sum(jnp.clip(-pos_cos + neg_cos + margin, 0.0) * present) / k
    return pos_loss, margin_loss


def aux_hinge_loss(features: jnp.ndarray, labels: jnp.ndarray,
                   mask: jnp.ndarray, max_labels: int,
                   margin: float = 0.05):
    """Batched per-object hinge auxiliary loss.

    features: (B, M, C); labels: (B, M) int in [0, max_labels); mask: (B, M).
    Returns (pos_loss, margin_loss) scalars averaged over the batch, matching
    reference ``batch_aux_hinge_loss`` semantics.
    """
    pos, mar = jax.vmap(
        lambda f, l, m: _hinge_single(f, l, m, max_labels, margin))(
            features, labels, mask)
    return jnp.mean(pos), jnp.mean(mar)


def cross_entropy_cls_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                           mask: jnp.ndarray, ignore_label: int = 255):
    """Per-voxel CE with ignore index (reference engine/distil.py:116,187-192)."""
    valid = mask & (labels != ignore_label)
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    w = valid.astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def average_cosine_distance(out: jnp.ndarray, targets: jnp.ndarray,
                            mask: jnp.ndarray) -> jnp.ndarray:
    """Eval-side alias of the cosine loss (reference models/distil/loss.py:104-123)."""
    return cosine_distil_loss(out, targets, mask)


def supervised_contrastive_loss(features: jnp.ndarray, labels: jnp.ndarray,
                                mask: jnp.ndarray, temperature: float = 0.07,
                                base_temperature: float = 0.07) -> jnp.ndarray:
    """SupCon over labeled points (reference models/distil/loss.py:4-56,
    Khosla et al. 2020), masked for padded rows.

    features: (K, C); labels: (K,); mask: (K,) validity. Anchors with no
    positives contribute 0 (the reference divides by 0 there — NaN; fixed
    here since padded buffers make empty-positive anchors routine).
    """
    f32 = jnp.where(mask[:, None], features.astype(jnp.float32), 1.0)
    fhat = f32 / jnp.maximum(
        jnp.linalg.norm(f32, axis=-1, keepdims=True), 1e-12)

    k = labels.shape[0]
    valid_pair = mask[:, None] & mask[None, :]
    eye = jnp.eye(k, dtype=bool)
    pos_mask = (labels[:, None] == labels[None, :]) & ~eye & valid_pair
    logits_mask = ~eye & valid_pair

    logits = (fhat @ fhat.T) / temperature
    logits = logits - jax.lax.stop_gradient(
        jnp.max(jnp.where(valid_pair, logits, -jnp.inf), axis=1,
                keepdims=True))
    exp_logits = jnp.exp(logits) * logits_mask
    log_prob = logits - jnp.log(jnp.maximum(
        jnp.sum(exp_logits, axis=1, keepdims=True), 1e-12))

    n_pos = jnp.sum(pos_mask, axis=1)
    mean_log_prob = jnp.sum(pos_mask * log_prob, axis=1) / jnp.maximum(n_pos, 1)
    per_anchor = -(temperature / base_temperature) * mean_log_prob
    w = (mask & (n_pos > 0)).astype(jnp.float32)
    return jnp.sum(per_anchor * w) / jnp.maximum(jnp.sum(w), 1.0)


def triplet_kl_loss(anchor: jnp.ndarray, positive: jnp.ndarray,
                    negative: jnp.ndarray, margin: float = 1.0,
                    mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Triplet loss over softmax distributions with KL divergence
    (reference models/distil/loss.py:60-101): relu(KL(a‖p) - KL(a‖n) + m).

    Note: mirrors the reference's argument order to F.kl_div — the 'input'
    is the anchor log-distribution, so KL(target ‖ anchor) in math terms.
    """
    a = jax.nn.softmax(anchor.astype(jnp.float32), axis=1)
    p = jax.nn.softmax(positive.astype(jnp.float32), axis=1)
    n = jax.nn.softmax(negative.astype(jnp.float32), axis=1)
    log_a = jnp.log(jnp.maximum(a, 1e-30))

    def kl(target):
        t = jnp.maximum(target, 1e-30)
        return jnp.sum(target * (jnp.log(t) - log_a), axis=1)

    losses = jax.nn.relu(kl(p) - kl(n) + margin)
    if mask is not None:
        w = mask.astype(jnp.float32)
        return jnp.sum(losses * w) / jnp.maximum(jnp.sum(w), 1.0)
    return jnp.mean(losses)
