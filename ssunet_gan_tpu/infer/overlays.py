"""Colored-overlay mask visualization writers.

Behaviour-parity with the reference's overlay helpers (duplicated in
aerial_image_segmentation_api.py:255-297 and val.py:38-114): GT regions
blended 50% yellow, predictions 50% pink, BGR order, JPG output.
"""

from __future__ import annotations

import os

import cv2
import numpy as np

YELLOW = np.array([0, 255, 255], np.uint8)  # BGR
PINK = np.array([255, 0, 255], np.uint8)


def _blend(img: np.ndarray, mask: np.ndarray, color: np.ndarray) -> np.ndarray:
    idx = mask > 0
    for c in range(3):
        img[idx, c] = (0.5 * color[c] + 0.5 * img[idx, c]).astype(img.dtype)
    return img


def save_masking(img, mask_gt, mask_out, save_name):
    """GT (yellow) + prediction (pink) overlay (api:255-271)."""
    img = _blend(img, mask_gt, YELLOW)
    img = _blend(img, mask_out, PINK)
    cv2.imwrite(save_name, img)
    return 0


def save_masking_RE(img, mask_gt, mask_out, save_name):
    """Prediction-only pink overlay (api:274-285)."""
    img = _blend(img, mask_out, PINK)
    cv2.imwrite(save_name, img)
    return 0


def save_masking_GT(img, mask_gt, mask_out, save_name):
    """GT-only yellow overlay (api:288-297)."""
    img = _blend(img, mask_gt, YELLOW)
    cv2.imwrite(save_name, img)
    return 0


def save_contour(img, mask_gt, mask_out, save_name):
    """Contour overlay: GT blue, prediction red (api:239-252)."""
    _, gt_bin = cv2.threshold(mask_gt, 127, 255, 0)
    contours, _ = cv2.findContours(gt_bin, cv2.RETR_LIST, cv2.CHAIN_APPROX_SIMPLE)
    for cnt in contours:
        cv2.drawContours(img, [cnt], 0, (255, 0, 0), 2)
    _, out_bin = cv2.threshold(mask_out, 200, 255, cv2.THRESH_BINARY)
    contours, _ = cv2.findContours(out_bin, cv2.RETR_LIST, cv2.CHAIN_APPROX_SIMPLE)
    for cnt in contours:
        cv2.drawContours(img, [cnt], 0, (0, 0, 255), 2)
    cv2.imwrite(save_name, img)


def save_gt_re_mask(output_folder, config, meta, class_idx, out_idx, ori_img,
                    mask, mask_output):
    """Per-class GT/RE/GT+RE trio (val.py:104-114), into per-class dirs."""
    base = os.path.join(output_folder, config["name"], str(class_idx))
    img_id = meta["img_id"][out_idx]
    # the reference's GT filename contains a stray space (val.py:105) — not kept
    save_masking_GT(np.array(ori_img[out_idx]), mask, mask_output,
                    os.path.join(base, img_id + "_GT_masking.jpg"))
    save_masking_RE(np.array(ori_img[out_idx]), mask, mask_output,
                    os.path.join(base, img_id + "_RE_masking.jpg"))
    save_masking(np.array(ori_img[out_idx]), mask, mask_output,
                 os.path.join(base, img_id + "_GT_RE_masking.jpg"))
