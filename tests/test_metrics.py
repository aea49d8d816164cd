import jax.numpy as jnp
import numpy as np

from dropclip_tpu.core.metrics import (
    grounding_metrics,
    intersection_and_union,
    masked_mean,
)


def reference_train_metric_pc(output, target, threshold=0.35,
                              pr_ious=(0.25, 0.5, 0.75)):
    """Numpy transliteration of reference utils/misc.py:22-50 for parity."""
    mean_iou = 0.0
    mean_prec = [0.0] * len(pr_ious)
    count = 1e-6
    for pred, gt in zip(output, target):
        count += 1
        pred = (pred >= threshold).astype(bool)
        gt = gt.astype(bool)
        inter = (pred & gt).sum()
        union = (pred | gt).sum()
        iou = inter / (union + 1e-6)
        mean_iou += iou
        for j, t in enumerate(pr_ious):
            mean_prec[j] += float(iou > t)
    mean_iou /= count + 1e-6
    mean_prec = [p / count for p in mean_prec]
    return 100.0 * mean_iou, [100.0 * p for p in mean_prec]


def test_grounding_parity_with_reference(rng):
    preds = rng.rand(7, 100).astype(np.float32)
    gts = (rng.rand(7, 100) > 0.5)
    ref_iou, ref_prs = reference_train_metric_pc(list(preds), list(gts))
    iou, prs = grounding_metrics(jnp.asarray(preds), jnp.asarray(gts))
    np.testing.assert_allclose(float(iou), ref_iou, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(prs), ref_prs, rtol=1e-5)


def test_grounding_query_padding(rng):
    preds = rng.rand(4, 50).astype(np.float32)
    gts = rng.rand(4, 50) > 0.5
    # pad with garbage rows that must not change the result
    preds_p = np.concatenate([preds, rng.rand(3, 50).astype(np.float32)])
    gts_p = np.concatenate([gts, rng.rand(3, 50) > 0.5])
    qmask = np.array([True] * 4 + [False] * 3)
    iou_a, prs_a = grounding_metrics(jnp.asarray(preds), jnp.asarray(gts))
    iou_b, prs_b = grounding_metrics(jnp.asarray(preds_p), jnp.asarray(gts_p),
                                     query_mask=jnp.asarray(qmask))
    np.testing.assert_allclose(float(iou_a), float(iou_b), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(prs_a), np.asarray(prs_b), rtol=1e-5)


def test_grounding_perfect_prediction():
    gt = np.zeros((1, 10), bool)
    gt[0, :5] = True
    iou, prs = grounding_metrics(jnp.asarray(gt.astype(np.float32)), jnp.asarray(gt))
    assert float(iou) > 99.0
    assert np.all(np.asarray(prs) > 99.0)


def test_intersection_and_union_simple():
    out = jnp.asarray([0, 1, 1, 2, 2, 2])
    tgt = jnp.asarray([0, 1, 2, 2, 2, 255])
    inter, union, target = intersection_and_union(out, tgt, num_classes=3,
                                                  ignore_index=255)
    # ignore removes last element; class0: out{0} tgt{0} inter 1
    np.testing.assert_array_equal(np.asarray(inter), [1, 1, 2])
    np.testing.assert_array_equal(np.asarray(target), [1, 1, 3])
    np.testing.assert_array_equal(np.asarray(union), [1, 2, 3])


def test_intersection_and_union_valid_mask():
    out = jnp.asarray([0, 1, 0, 0])
    tgt = jnp.asarray([0, 1, 1, 1])
    mask = jnp.asarray([True, True, False, False])
    inter, union, target = intersection_and_union(out, tgt, 2, valid_mask=mask)
    np.testing.assert_array_equal(np.asarray(inter), [1, 1])
    np.testing.assert_array_equal(np.asarray(union), [1, 1])


def test_masked_mean():
    x = jnp.asarray([1.0, 2.0, 100.0])
    m = jnp.asarray([True, True, False])
    np.testing.assert_allclose(float(masked_mean(x, m)), 1.5)
