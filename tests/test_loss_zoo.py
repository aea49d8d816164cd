"""Torch-parity tests for the auxiliary loss zoo (reference
models/distil/loss.py:4-101)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from dropclip_tpu.distill.loss import (  # noqa: E402
    supervised_contrastive_loss,
    triplet_kl_loss,
)


def torch_supcon(features, labels, temperature=0.07, base_temperature=0.07):
    """Transliteration of reference loss.py:4-56 (cpu)."""
    features = F.normalize(torch.as_tensor(features), p=2, dim=1)
    labels = torch.as_tensor(labels)
    label_mask = labels.unsqueeze(1) == labels.unsqueeze(0)
    positive_mask = label_mask.fill_diagonal_(0)
    logits = torch.matmul(features, features.T) / temperature
    logits = logits - logits.max(dim=1, keepdim=True)[0].detach()
    logits_mask = torch.ones_like(label_mask).scatter(
        1, torch.arange(labels.size(0)).view(-1, 1), 0)
    exp_logits = torch.exp(logits) * logits_mask
    log_prob = logits - torch.log(exp_logits.sum(1, keepdim=True))
    log_prob = (positive_mask * log_prob).sum(1) / positive_mask.sum(1)
    return float((-(temperature / base_temperature) * log_prob).mean())


def test_supcon_matches_torch(rng):
    k, c = 60, 16
    feats = rng.randn(k, c).astype(np.float32)
    labels = rng.randint(0, 4, k).astype(np.int32)  # every label has >1 member
    want = torch_supcon(feats, labels)
    got = float(supervised_contrastive_loss(jnp.asarray(feats),
                                            jnp.asarray(labels),
                                            jnp.ones(k, bool)))
    assert abs(got - want) < 1e-4


def test_supcon_padding_invariance(rng):
    k, c = 40, 8
    feats = rng.randn(k, c).astype(np.float32)
    labels = rng.randint(0, 3, k).astype(np.int32)
    a = float(supervised_contrastive_loss(jnp.asarray(feats),
                                          jnp.asarray(labels),
                                          jnp.ones(k, bool)))
    feats_p = np.concatenate([feats, rng.randn(10, c).astype(np.float32) * 50])
    labels_p = np.concatenate([labels, np.full(10, 7, np.int32)])
    mask_p = np.concatenate([np.ones(k, bool), np.zeros(10, bool)])
    b = float(supervised_contrastive_loss(jnp.asarray(feats_p),
                                          jnp.asarray(labels_p),
                                          jnp.asarray(mask_p)))
    assert abs(a - b) < 1e-5


def test_triplet_kl_matches_torch(rng):
    n, d = 12, 10
    a = rng.randn(n, d).astype(np.float32)
    p = rng.randn(n, d).astype(np.float32)
    ng = rng.randn(n, d).astype(np.float32)

    ta, tp, tn = map(torch.as_tensor, (a, p, ng))
    ad, pd, nd = F.softmax(ta, 1), F.softmax(tp, 1), F.softmax(tn, 1)
    kl_pos = F.kl_div(ad.log(), pd, reduction="none").sum(1)
    kl_neg = F.kl_div(ad.log(), nd, reduction="none").sum(1)
    want = float(F.relu(kl_pos - kl_neg + 1.0).mean())

    got = float(triplet_kl_loss(jnp.asarray(a), jnp.asarray(p),
                                jnp.asarray(ng)))
    assert abs(got - want) < 1e-5
