"""Boundary-IoU utilities (reference utils/edge_utils.py:90-127):
mask <-> one-hot helpers and erosion-based boundary extraction."""

from __future__ import annotations

import cv2
import numpy as np


def mask_to_onehot(mask: np.ndarray, num_classes: int) -> np.ndarray:
    """(H,W) int mask -> (num_classes,H,W) one-hot (ignore pixels all-zero)."""
    return np.stack([(mask == i) for i in range(num_classes)]).astype(
        np.uint8)


def onehot_to_mask(onehot: np.ndarray, background: int = 255) -> np.ndarray:
    """(C,H,W) one-hot -> (H,W) mask; all-zero pixels -> background."""
    mask = onehot.argmax(axis=0)
    mask = np.where(onehot.sum(axis=0) > 0, mask, background)
    return mask.astype(np.int64)


def binary_to_boundary(mask: np.ndarray, dilation_ratio: float = 0.02
                       ) -> np.ndarray:
    """Binary mask -> boundary strip of width dilation_ratio * diagonal
    (reference edge_utils.py:98-116)."""
    h, w = mask.shape
    img_diag = np.sqrt(h ** 2 + w ** 2)
    dilation = max(int(round(dilation_ratio * img_diag)), 1)
    new_mask = cv2.copyMakeBorder(mask, 1, 1, 1, 1, cv2.BORDER_CONSTANT,
                                  value=0)
    kernel = np.ones((3, 3), np.uint8)
    eroded = cv2.erode(new_mask, kernel, iterations=dilation)
    return mask - eroded[1:h + 1, 1:w + 1]


def mask_to_boundary(mask: np.ndarray, num_classes: int,
                     dilation_ratio: float = 0.02,
                     background: int = 255) -> np.ndarray:
    """Class mask -> boundary-only class mask; interiors become
    ``background`` so the confusion matrix scores boundaries only
    (reference edge_utils.py:118-127)."""
    onehot = mask_to_onehot(mask, num_classes)
    boundary = np.zeros_like(onehot)
    for i in np.where(onehot.sum(axis=(1, 2)) > 0)[0]:
        boundary[i] = binary_to_boundary(onehot[i],
                                         dilation_ratio=dilation_ratio)
    return onehot_to_mask(boundary.astype(int), background=background)
