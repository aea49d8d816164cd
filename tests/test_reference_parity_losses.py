"""Loss-zoo + metric parity vs the ACTUAL reference source.

Round-1 oracles for these were self-written transliterations (VERDICT r1
"what's weak" #5); here the reference's own torch code runs on shared
fixtures:

- models/distil/loss.py (SupCon, TripletKL, batch_aux_hinge_loss — the
  engine/distil.py:52-96 production copy is line-identical math)
                                 -> dropclip_tpu.distill.loss
- utils/misc.py trainMetricPC / intersectionAndUnionGPU
                                 -> dropclip_tpu.core.metrics
- engine/distil.py:154-158 inline cosine/L1 distillation losses
  (CUDA-only module; the two-line formulas are executed with torch's own
  CosineSimilarity/L1Loss on the same fixture)

The reference code calls ``.cuda()`` mid-math; a Tensor.cuda -> self shim
makes it runnable on CPU without touching any computation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ref_oracle import ref_module

torch = pytest.importorskip("torch")


@pytest.fixture
def cuda_shim(monkeypatch):
    """Reference losses/metrics sprinkle .cuda() on CPU tensors."""
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self,
                        raising=True)


def _labeled_features(rng, n=48, c=16, k=4):
    """Every label 0..k-1 has >=2 members (the reference SupCon divides by
    the positive count with no guard)."""
    labels = np.concatenate([np.arange(k), np.arange(k),
                             rng.randint(0, k, size=n - 2 * k)])
    rng.shuffle(labels)
    feats = rng.randn(n, c).astype(np.float32)
    return feats, labels.astype(np.int64)


# --------------------------------------------------------------- losses

def test_supcon_parity(rng, cuda_shim):
    ref_loss = ref_module("models.distil.loss")
    from dropclip_tpu.distill.loss import supervised_contrastive_loss

    feats, labels = _labeled_features(rng)
    ref = ref_loss.SupervisedContrastiveLoss()(
        torch.tensor(feats), torch.tensor(labels)).item()
    ours = float(supervised_contrastive_loss(
        jnp.asarray(feats), jnp.asarray(labels),
        jnp.ones((len(labels),), bool)))
    assert np.isclose(ref, ours, rtol=1e-4, atol=1e-5), (ref, ours)


def test_supcon_masked_matches_ref_on_subset(rng, cuda_shim):
    """Padding via the mask must equal the reference run on the valid rows
    alone — the padded rows change nothing."""
    ref_loss = ref_module("models.distil.loss")
    from dropclip_tpu.distill.loss import supervised_contrastive_loss

    feats, labels = _labeled_features(rng, n=40)
    n_pad = 9
    fp = np.concatenate([feats, rng.randn(n_pad, feats.shape[1])
                         .astype(np.float32)])
    lp = np.concatenate([labels, np.zeros(n_pad, np.int64)])
    mask = np.concatenate([np.ones(40, bool), np.zeros(n_pad, bool)])

    ref = ref_loss.SupervisedContrastiveLoss()(
        torch.tensor(feats), torch.tensor(labels)).item()
    ours = float(supervised_contrastive_loss(
        jnp.asarray(fp), jnp.asarray(lp), jnp.asarray(mask)))
    assert np.isclose(ref, ours, rtol=1e-4, atol=1e-5), (ref, ours)


@pytest.mark.parametrize("margin", [0.5, 1.0])
def test_triplet_kl_parity(rng, cuda_shim, margin):
    ref_loss = ref_module("models.distil.loss")
    from dropclip_tpu.distill.loss import triplet_kl_loss

    a, p, n = (rng.randn(6, 12).astype(np.float32) for _ in range(3))
    ref = ref_loss.TripletKLLoss(margin=margin)(
        torch.tensor(a), torch.tensor(p), torch.tensor(n)).item()
    ours = float(triplet_kl_loss(jnp.asarray(a), jnp.asarray(p),
                                 jnp.asarray(n), margin=margin))
    assert np.isclose(ref, ours, rtol=1e-5, atol=1e-6), (ref, ours)


def test_batch_aux_hinge_parity(rng, cuda_shim):
    """The aux hinge loss (production copy engine/distil.py:52-96 ==
    models/distil/loss.py:126-170) on a ragged 2-scene batch vs our
    padded static-shape closed form."""
    ref_loss = ref_module("models.distil.loss")
    from dropclip_tpu.distill.loss import aux_hinge_loss

    k = 3
    sizes = [37, 25]
    feat_list, label_list = [], []
    for n in sizes:
        # labels exactly 0..k-1, all present: the reference indexes means
        # by torch.unique order, ours by label value — these coincide here
        labels = np.concatenate([np.arange(k),
                                 rng.randint(0, k, size=n - k)])
        rng.shuffle(labels)
        feat_list.append(rng.randn(n, 8).astype(np.float32))
        label_list.append(labels.astype(np.int64))

    ref_pos, ref_margin = ref_loss.batch_aux_hinge_loss(
        [torch.tensor(f) for f in feat_list],
        [torch.tensor(l) for l in label_list], margin=0.05)

    m = max(sizes)
    b = len(sizes)
    feats = np.ones((b, m, 8), np.float32)
    labels = np.zeros((b, m), np.int64)
    mask = np.zeros((b, m), bool)
    for i, n in enumerate(sizes):
        feats[i, :n] = feat_list[i]
        labels[i, :n] = label_list[i]
        mask[i, :n] = True
    our_pos, our_margin = aux_hinge_loss(
        jnp.asarray(feats), jnp.asarray(labels), jnp.asarray(mask),
        max_labels=k, margin=0.05)
    assert np.isclose(float(ref_pos), float(our_pos),
                      rtol=1e-4, atol=1e-5), (float(ref_pos), float(our_pos))
    assert np.isclose(float(ref_margin), float(our_margin),
                      rtol=1e-4, atol=1e-4), (float(ref_margin),
                                              float(our_margin))


def test_cosine_l1_distil_parity(rng):
    """engine/distil.py:154-158 — dloss = (1 - CosineSimilarity(out,
    targets)).mean() / L1Loss()(out, targets); the module itself imports
    MinkowskiEngine, so the two-line formulas run via torch directly."""
    from dropclip_tpu.distill.loss import cosine_distil_loss, l1_distil_loss

    out = rng.randn(30, 12).astype(np.float32)
    tgt = rng.randn(30, 12).astype(np.float32)
    mask = jnp.ones((30,), bool)

    ref_cos = (1 - torch.nn.CosineSimilarity()(
        torch.tensor(out), torch.tensor(tgt))).mean().item()
    ref_l1 = torch.nn.L1Loss()(torch.tensor(out), torch.tensor(tgt)).item()
    assert np.isclose(ref_cos, float(cosine_distil_loss(
        jnp.asarray(out), jnp.asarray(tgt), mask)), rtol=1e-5, atol=1e-6)
    assert np.isclose(ref_l1, float(l1_distil_loss(
        jnp.asarray(out), jnp.asarray(tgt), mask)), rtol=1e-5, atol=1e-6)


def test_cross_entropy_ignore_parity(rng):
    """Classification-head CE (engine/distil.py:116 criterion =
    CrossEntropyLoss(ignore_index=args.ignore_label))."""
    from dropclip_tpu.distill.loss import cross_entropy_cls_loss

    n, c = 40, 7
    logits = rng.randn(n, c).astype(np.float32)
    labels = rng.randint(0, c, size=n).astype(np.int64)
    labels[rng.rand(n) < 0.25] = 255
    ref = torch.nn.CrossEntropyLoss(ignore_index=255)(
        torch.tensor(logits), torch.tensor(labels)).item()
    ours = float(cross_entropy_cls_loss(
        jnp.asarray(logits), jnp.asarray(labels), jnp.ones((n,), bool),
        ignore_label=255))
    assert np.isclose(ref, ours, rtol=1e-5, atol=1e-6), (ref, ours)


# --------------------------------------------------------------- metrics

def test_train_metric_pc_parity(rng, cuda_shim):
    """trainMetricPC (utils/misc.py:22-50) on a ragged query list vs our
    padded fused grounding_metrics."""
    ref_misc = ref_module("utils.misc")
    from dropclip_tpu.core.metrics import grounding_metrics

    sizes = [50, 33, 41, 28]
    preds = [rng.rand(n).astype(np.float32) for n in sizes]
    gts = [(rng.rand(n) < 0.4) for n in sizes]

    ref_iou, ref_prs = ref_misc.trainMetricPC(
        [torch.tensor(p) for p in preds],
        [torch.tensor(g) for g in gts], threshold=0.35)

    q, m = len(sizes), max(sizes)
    pred_pad = np.zeros((q, m), np.float32)
    gt_pad = np.zeros((q, m), bool)
    pmask = np.zeros((q, m), bool)
    for i, n in enumerate(sizes):
        pred_pad[i, :n] = preds[i]
        gt_pad[i, :n] = gts[i]
        pmask[i, :n] = True
    our_iou, our_prs = grounding_metrics(
        jnp.asarray(pred_pad), jnp.asarray(gt_pad),
        point_mask=jnp.asarray(pmask), threshold=0.35)
    assert np.isclose(float(ref_iou), float(our_iou), rtol=1e-4)
    for r, o in zip([float(x) for x in ref_prs], np.asarray(our_prs)):
        assert np.isclose(r, float(o), rtol=1e-4), (ref_prs, our_prs)


def test_intersection_union_parity(rng, cuda_shim):
    ref_misc = ref_module("utils.misc")
    from dropclip_tpu.core.metrics import intersection_and_union

    k, n = 6, 300
    out = rng.randint(0, k, size=n).astype(np.int64)
    tgt = rng.randint(0, k, size=n).astype(np.int64)
    tgt[rng.rand(n) < 0.15] = 255

    ref_i, ref_u, ref_t = ref_misc.intersectionAndUnionGPU(
        torch.tensor(out.copy()), torch.tensor(tgt.copy()), k,
        ignore_index=255)
    our_i, our_u, our_t = intersection_and_union(
        jnp.asarray(out), jnp.asarray(tgt), k, ignore_index=255)
    np.testing.assert_array_equal(ref_i.numpy(), np.asarray(our_i))
    np.testing.assert_array_equal(ref_u.numpy(), np.asarray(our_u))
    np.testing.assert_array_equal(ref_t.numpy(), np.asarray(our_t))


def test_poly_learning_rate_parity(cuda_shim):
    ref_misc = ref_module("utils.misc")
    from dropclip_tpu.core.schedule import poly_learning_rate

    for it in (0, 10, 99):
        ref = ref_misc.poly_learning_rate(0.01, it, 100, power=0.9)
        ours = float(poly_learning_rate(0.01, it, 100, power=0.9))
        assert np.isclose(ref, ours, rtol=1e-6), (it, ref, ours)
