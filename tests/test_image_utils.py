"""Host-side image utils vs reference semantics (utils/image.py)."""

import numpy as np
import pytest

from dropclip_tpu.data.image_utils import (add_borders_to_image,
                                           binary_masks_to_seg,
                                           get_mask_bbox, get_mask_center,
                                           get_mask_ellipse,
                                           get_oriented_bounding_box,
                                           mask2box, mask2box_multi_level,
                                           seg_mask_to_binary)


def test_seg_binary_roundtrip(rng):
    seg = rng.randint(0, 4, (20, 30)).astype(np.int32)
    masks = seg_mask_to_binary(seg)
    ids = np.unique(seg)
    assert masks.shape == (len(ids), 20, 30)
    back = binary_masks_to_seg(masks, ids)
    assert np.array_equal(back, seg)


def test_mask2box():
    m = np.zeros((20, 30), bool)
    m[5:10, 12:18] = True
    assert mask2box(m) == (12, 5, 18, 10)
    assert mask2box(np.zeros((5, 5), bool)) is None
    assert mask2box_multi_level(m, 0) == (12, 5, 18, 10)
    x1, y1, x2, y2 = mask2box_multi_level(m, 2, 0.2)
    assert x1 < 12 and x2 > 18 and y1 < 5 and y2 > 10


def test_add_borders():
    img = np.ones((10, 30, 3), np.uint8) * 7
    out = add_borders_to_image(img, 1.0, np.array([0, 0, 0], np.uint8))
    assert out.shape == (30, 30, 3)
    assert (out[10:20] == 7).all() and (out[:10] == 0).all()


def test_cv2_helpers():
    pytest.importorskip("cv2")
    m = np.zeros((40, 40), np.uint8)
    m[10:30, 5:25] = 1
    x, y, w, h = get_mask_bbox(m)
    assert (x, y, w, h) == (5, 10, 20, 20)
    cx, cy = get_mask_center(m)
    assert abs(cx - 15) <= 1 and abs(cy - 20) <= 1
    (ecx, ecy), (ew, eh), _ = get_mask_ellipse(m)
    assert 0 <= ecx <= 40 and 0 <= ecy <= 40 and ew > 0 and eh > 0
    box = get_oriented_bounding_box(m)
    assert box.shape == (4, 2)
