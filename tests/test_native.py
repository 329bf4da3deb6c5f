"""Native C++ data-path kernels: bitwise parity with the numpy pipeline."""

import numpy as np
import pytest

from dcfp_tpu import native
from dcfp_tpu.data.base import BaseDataset

pytestmark = pytest.mark.skipif(native.lib() is None,
                                reason="no native toolchain")


def _numpy_tail(image, label, off_h, off_w, crop_hw, flip, mean, std,
                ignore):
    """The reference-parity numpy path (input_transform + crop + flip)."""
    ch, cw = crop_hw
    img = image.astype(np.float32)[:, :, ::-1]
    img = img / 255.0
    img -= mean
    img /= std
    import cv2
    pad_h = max(ch + off_h - img.shape[0], 0)
    pad_w = max(cw + off_w - img.shape[1], 0)
    if pad_h or pad_w:
        img = cv2.copyMakeBorder(img, 0, pad_h, 0, pad_w,
                                 cv2.BORDER_CONSTANT, value=(0., 0., 0.))
        label = cv2.copyMakeBorder(label.astype(np.float64), 0, pad_h, 0,
                                   pad_w, cv2.BORDER_CONSTANT,
                                   value=(ignore,))
    img = img[off_h:off_h + ch, off_w:off_w + cw]
    lab = label[off_h:off_h + ch, off_w:off_w + cw].astype(np.int64)
    if flip:
        img, lab = img[:, ::-1], lab[:, ::-1]
    return img, lab


@pytest.mark.parametrize("hw,crop,off,flip", [
    ((40, 56), (32, 32), (3, 7), False),
    ((40, 56), (32, 32), (8, 24), True),
    ((20, 24), (32, 32), (0, 0), False),   # pad both dims
    ((32, 20), (32, 32), (0, 0), True),    # pad W only
])
def test_crop_normalize_bitwise(rng, hw, crop, off, flip):
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    image = rng.integers(0, 256, (*hw, 3), dtype=np.uint8)
    label = rng.integers(0, 19, hw).astype(np.int64)
    want_img, want_lab = _numpy_tail(image, label, *off, crop, flip, mean,
                                     std, 255)
    got_img = native.crop_normalize(image, *off, crop, flip, mean, std)
    got_lab = native.crop_label(label, *off, crop, flip, 255)
    np.testing.assert_array_equal(got_img, want_img)  # bitwise f32
    np.testing.assert_array_equal(got_lab, want_lab)


def test_lut_remap_matches_numpy(rng):
    lut = rng.integers(0, 300, 256).astype(np.int64)
    lab = rng.integers(0, 256, (37, 53), dtype=np.uint8)
    got = native.lut_remap(lab, lut)
    np.testing.assert_array_equal(got, lut[lab.astype(np.int64)])


def test_dataset_native_equals_python(tmp_path, rng):
    """Whole __getitem__ train path: native on/off must produce identical
    samples given the same seed (same PRNG draw order, bitwise floats)."""
    from dcfp_tpu.data.datasets import CityscapesDataset
    from dcfp_tpu.data.synthetic import make_cityscapes_fixture
    root = str(tmp_path / "cs")
    manifest = make_cityscapes_fixture(root, n_images=3, hw=(72, 96))
    kw = dict(split="train", crop_size=(48, 48), scale=True, mirror=True,
              brightness=True, balance=0, seed=7)
    ds_native = CityscapesDataset(root, manifest, native=True, **kw)
    ds_python = CityscapesDataset(root, manifest, native=False, **kw)
    for i in range(3):
        a = ds_native[i]
        b = ds_python[i]
        np.testing.assert_array_equal(a["img"], b["img"])
        np.testing.assert_array_equal(a["label"], b["label"])
    assert ds_native[0]["img"].dtype == np.float32
