"""COCO RLE codec: native C <-> numpy parity, round trips, polygon path."""

import numpy as np
import pytest

from dropclip_tpu.data import rle as rle_mod
from dropclip_tpu.data.rle import (_counts_from_string, _mask_from_counts,
                                   _string_from_counts, anno_to_mask,
                                   decode_rle, encode_rle)


def random_mask(rng, h=48, w=64):
    m = np.zeros((h, w), np.uint8)
    for _ in range(4):
        y, x = rng.randint(0, h - 8), rng.randint(0, w - 8)
        m[y:y + rng.randint(2, 8), x:x + rng.randint(2, 8)] = 1
    return m


def test_roundtrip(rng):
    for _ in range(5):
        m = random_mask(rng)
        assert np.array_equal(decode_rle(encode_rle(m)), m)
    # edge cases: all zero / all one / single pixel
    for m in (np.zeros((7, 5), np.uint8), np.ones((7, 5), np.uint8)):
        assert np.array_equal(decode_rle(encode_rle(m)), m)
    m = np.zeros((7, 5), np.uint8)
    m[0, 0] = 1
    assert np.array_equal(decode_rle(encode_rle(m)), m)


def test_native_matches_python(rng):
    lib = rle_mod._native()
    if lib is None:
        pytest.skip("native codec unavailable")
    for _ in range(5):
        m = random_mask(rng)
        # python encode -> native decode and vice versa
        py_counts = _string_from_counts(
            rle_mod._counts_from_mask(m))
        native_dec = decode_rle({"size": list(m.shape), "counts": py_counts})
        assert np.array_equal(native_dec, m)
        enc = encode_rle(m)  # native encode
        py_dec = _mask_from_counts(
            _counts_from_string(enc["counts"]), *m.shape)
        assert np.array_equal(py_dec, m)


def test_native_loads():
    assert rle_mod._native() is not None, (
        "C codec failed to build — check native/Makefile toolchain")


def test_uncompressed_counts():
    segm = {"size": [3, 4], "counts": [5, 2, 5]}
    m = decode_rle(segm)
    flat = m.reshape(-1, order="F")
    assert np.array_equal(flat, [0, 0, 0, 0, 0, 1, 1, 0, 0, 0, 0, 0])


def test_polygon_anno(rng):
    cv2 = pytest.importorskip("cv2")
    anno = {"segmentation": [[10, 10, 30, 10, 30, 25, 10, 25]]}
    m = anno_to_mask(anno, 40, 50)
    assert m[15, 20] == 1 and m[5, 5] == 0
    assert m.sum() > 200
