"""Text-query grounding head: CLIP-feature vs prompt similarity -> 3D mask.

Behavioral parity with the reference ``ClipSimilarity``
(reference models/similarity.py:8-101), split TPU-first into:

- pure jnp kernels (`paired_softmax_probs`, `predict_from_embeddings`)
  that run inside jit/pjit with static shapes and an optional validity
  mask for padded point buffers;
- a thin host-side wrapper (`ClipSimilarity`) owning the text encoder and
  a prompt-embedding cache.

Reference quirks reproduced deliberately:
- the "paired" score is softmax over the concatenation
  [pos broadcast x N_neg, negs] taking the FIRST column (similarity.py:
  51-62) — i.e. exp(p/T) / (N exp(p/T) + sum exp(n_i/T)) — not a min over
  per-pair softmaxes;
- the argmax path min-max-normalizes pos - mean(negs) but thresholds by
  class argmax (similarity.py:91-101).
One quirk fixed: ``norm_vis_feat=False`` is impossible in the reference
(`x = x or default`, similarity.py:74); here it is honored.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp

NEGATIVE_PROMPT_GENERIC = ["object", "thing", "texture", "stuff"]
SOFTMAX_TEMP = 0.1


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 0.0) -> jnp.ndarray:
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / (n + eps)


def paired_softmax_probs(vis_norm: jnp.ndarray, pos_emb: jnp.ndarray,
                         neg_embs: jnp.ndarray,
                         temp: float = SOFTMAX_TEMP,
                         neg_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(..., C) x (C,) x (K, C) -> (...,) positive probability
    (reference similarity.py:49-62): softmax over [pos x K_real, negs],
    first column. ``neg_mask`` (K,) marks real rows of a padded negative
    set — padded rows contribute neither a negative term nor a broadcast
    positive copy, so results match the unpadded computation exactly."""
    pos = vis_norm @ pos_emb  # (...,)
    neg = vis_norm @ neg_embs.T  # (..., K)
    if neg_mask is None:
        neg_mask = jnp.ones(neg_embs.shape[0], dtype=bool)
    n_real = jnp.sum(neg_mask.astype(jnp.float32))
    hi = jnp.maximum(pos, jnp.max(jnp.where(neg_mask, neg, -jnp.inf), -1))
    e_pos = jnp.exp((pos - hi) / temp)
    e_neg = jnp.where(neg_mask, jnp.exp((neg - hi[..., None]) / temp), 0.0)
    denom = n_real * e_pos + jnp.sum(e_neg, axis=-1)
    return jnp.nan_to_num(e_pos / denom)


def _masked_minmax(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Min-max normalize over valid entries (reference similarity.py:83-86:
    falls back to x/max when constant)."""
    if mask is None:
        lo, hi = jnp.min(x), jnp.max(x)
    else:
        lo = jnp.min(jnp.where(mask, x, jnp.inf))
        hi = jnp.max(jnp.where(mask, x, -jnp.inf))
    return jnp.where(hi != lo, (x - lo) / (hi - lo),
                     x / jnp.where(hi == 0, 1.0, hi))


def predict_from_embeddings(
    vis_feats: jnp.ndarray,
    pos_emb: jnp.ndarray,
    neg_embs: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    method: str = "paired",
    threshold: float = 0.7,
    temp: float = SOFTMAX_TEMP,
    norm_vis_feat: bool = True,
    neg_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-point binary mask + normalized similarity for one query.

    vis_feats: (N, C) [or any leading shape]; pos_emb: (C,) normalized;
    neg_embs: (K, C) normalized or None (``neg_mask`` marks real rows of a
    padded set); mask: (N,) validity of padded rows.
    Returns (pred bool (N,), sims_norm f32 (N,)) —
    reference similarity.py:70-101.
    """
    if norm_vis_feat:
        vis_feats = l2_normalize(vis_feats)
    vis_feats = vis_feats.astype(jnp.float32)

    if neg_embs is None:
        sims = vis_feats @ pos_emb
        sims_norm = _masked_minmax(sims, mask)
        pred = sims_norm > threshold
    elif method == "paired":
        sims = paired_softmax_probs(vis_feats, pos_emb, neg_embs, temp,
                                    neg_mask=neg_mask)
        sims_norm = _masked_minmax(sims, mask)
        pred = sims_norm > threshold
    elif method == "argmax":
        if neg_mask is None:
            neg_mask = jnp.ones(neg_embs.shape[0], dtype=bool)
        raw_pos = vis_feats @ pos_emb
        raw_neg = vis_feats @ neg_embs.T
        n_real = jnp.maximum(jnp.sum(neg_mask.astype(jnp.float32)), 1.0)
        mean_neg = jnp.sum(jnp.where(neg_mask, raw_neg, 0.0), -1) / n_real
        sims_dif = raw_pos - mean_neg
        sims_norm = _masked_minmax(sims_dif, mask)
        max_neg = jnp.max(jnp.where(neg_mask, raw_neg, -jnp.inf), -1)
        pred = raw_pos > max_neg  # argmax == positive class
    else:
        raise ValueError(f"unknown method {method!r}")

    if mask is not None:
        pred = pred & mask
    return pred, sims_norm.astype(jnp.float32)


class ClipSimilarity:
    """Host-side wrapper: prompts -> cached normalized text embeddings ->
    device-side predict. ``model``/``variables`` are a teachers.clip.CLIP
    and its params (the reference loads a full CLIP just for text encoding,
    similarity.py:25)."""

    def __init__(self, model, variables, method: str = "paired",
                 threshold: float = 0.7, norm_vis_feat: bool = True):
        import jax

        self.model = model
        self.variables = variables
        self.method = method
        self.threshold = threshold
        self.norm_vis_feat = norm_vis_feat
        self._encode = jax.jit(
            lambda v, t: model.apply(v, t, method="encode_text"))
        self._cache = {}

    def encode_text(self, prompts: Sequence[str]) -> jnp.ndarray:
        """(K, C) L2-normalized prompt embeddings, cached per prompt."""
        from .teachers.tokenizer import tokenize

        key = tuple(prompts)
        if key not in self._cache:
            toks = jnp.asarray(tokenize(list(prompts)))
            emb = self._encode(self.variables, toks)
            self._cache[key] = l2_normalize(emb.astype(jnp.float32))
        return self._cache[key]

    def predict(self, vis_feats: jnp.ndarray, qpos: str,
                qneg: Optional[List[str]] = None,
                mask: Optional[jnp.ndarray] = None,
                norm_vis_feat: Optional[bool] = None,
                method: Optional[str] = None,
                threshold: Optional[float] = None):
        method = method or self.method
        threshold = threshold if threshold is not None else self.threshold
        if norm_vis_feat is None:
            norm_vis_feat = self.norm_vis_feat
        pos_emb = self.encode_text([qpos])[0]
        neg_embs = None
        if qneg is not None:
            neg_embs = self.encode_text(qneg if len(qneg)
                                        else NEGATIVE_PROMPT_GENERIC)
        return predict_from_embeddings(
            vis_feats, pos_emb, neg_embs, mask=mask, method=method,
            threshold=threshold, norm_vis_feat=norm_vis_feat)
