"""Loss functions: CE + deep supervision, OHEM, GSRL.

All fully on-device (NHWC logits, integer label maps).  Functional
equivalents of reference loss/criterion.py + loss/ohem.py:

* ``CriterionDSN``     -> :func:`ce_dsn`       (criterion.py:48-74)
* ``CriterionOhemDSN`` -> :func:`ohem_dsn`     (ohem.py:95-119) — the
  reference mines hard examples on the host with scipy at 1/8 resolution
  (ohem.py:20-48); here the threshold search is a single on-device sort of
  the downsampled true-class probabilities, so the whole loss stays inside
  the jitted train step.
* ``CriterionGsrlDSN`` -> :func:`gsrl_dsn`     (criterion.py:77-101) — the
  distribution-calibrated long-tail loss.

Every loss returns a dict with key ``'loss'`` (reference convention).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from dcfp_tpu.ops.resize import resize_bilinear, resize_bilinear_cf


def _take_class(x: jnp.ndarray, safe_labels: jnp.ndarray,
                channels_first: bool) -> jnp.ndarray:
    """x[..., label] over the class axis -> (N, H, W).

    Implemented as a one-hot select + class-dim reduce instead of
    ``take_along_axis``: XLA lowers the gather to a serialized
    per-element fetch on TPU (measured 69.6 ms PER HEAD at the
    Cityscapes recipe shape — 40% of the whole train step across the two
    heads), while the select+reduce fuses into the log_softmax producer
    and vectorizes on the VPU (the same two fusions drop to ~3 ms).
    Numerically identical: exactly one selected element per pixel."""
    ax = 1 if channels_first else -1
    c = x.shape[ax]
    shape = [1] * x.ndim
    shape[ax] = c
    classes = jax.lax.broadcasted_iota(safe_labels.dtype, tuple(shape),
                                       x.ndim + ax if ax < 0 else ax)
    onehot = jnp.expand_dims(safe_labels, ax) == classes
    return jnp.sum(jnp.where(onehot, x, 0), axis=ax)


def _per_pixel_ce(logits: jnp.ndarray, labels: jnp.ndarray,
                  ignore_label: int, channels_first: bool = False
                  ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(nll, valid_mask); nll is zero-filled at ignored pixels.

    ``channels_first``: logits are (N, C, H, W) instead of (N, H, W, C).
    The train step feeds full-resolution logits channels-first because
    thin-C NHWC lane-pads C to 128 on TPU (6.7x HBM blowup for 19
    classes); numerics are layout-independent.
    """
    valid = labels != ignore_label
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32),
                              axis=1 if channels_first else -1)
    nll = -_take_class(logp, safe, channels_first)
    return jnp.where(valid, nll, 0.0), valid


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray, *,
                  ignore_label: int = 255,
                  class_weights: Optional[jnp.ndarray] = None,
                  channels_first: bool = False) -> jnp.ndarray:
    """Mean CE over valid pixels; matches torch CrossEntropyLoss semantics
    (weighted mean normalizes by the sum of applied class weights)."""
    nll, valid = _per_pixel_ce(logits, labels, ignore_label, channels_first)
    if class_weights is not None:
        safe = jnp.where(valid, labels, 0).astype(jnp.int32)
        w = jnp.asarray(class_weights, jnp.float32)[safe] * valid
    else:
        w = valid.astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-8)


# ---------------------------------------------------------------------------
# OHEM
# ---------------------------------------------------------------------------

def _zoom0_indices(n: int, m: int):
    """Source indices of scipy.ndimage.zoom(..., order=0) for n -> m:
    endpoint-aligned coordinates x_i = i*(n-1)/(m-1), order-0 spline
    (nearest, halves round up)."""
    import numpy as np
    if m <= 1 or n <= 1:
        return np.zeros(max(m, 1), np.int32)
    x = np.arange(m, dtype=np.float64) * (n - 1) / (m - 1)
    return np.minimum(np.floor(x + 0.5), n - 1).astype(np.int32)


def ohem_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray, *,
                       ignore_label: int = 255, thresh: float = 0.7,
                       min_kept: int = 100000, factor: int = 8,
                       class_weights: Optional[jnp.ndarray] = None,
                       channels_first: bool = False) -> jnp.ndarray:
    """Online hard example mining CE (reference loss/ohem.py:9-93).

    Semantics preserved exactly: estimate a probability threshold on a
    1/``factor`` downsampled copy — the k-th smallest true-class
    probability among valid pixels with k = min_kept / factor^2, floored
    at ``thresh`` — then keep only full-resolution pixels whose
    true-class prob <= threshold and average CE over them.  The
    downsampling reproduces the reference's ``scipy.ndimage.zoom``
    (ohem.py:23-24): output sizes round(dim/factor), endpoint-aligned
    coordinates (= align_corners=True), order-1 for probs / order-0 for
    labels.  Runs entirely on device with static shapes.
    """
    _, mined = ohem_threshold_and_mined(
        logits, labels, ignore_label=ignore_label, thresh=thresh,
        min_kept=min_kept, factor=factor, channels_first=channels_first)
    return cross_entropy(logits, mined, ignore_label=ignore_label,
                         class_weights=class_weights,
                         channels_first=channels_first)


def ohem_threshold_and_mined(logits, labels, *, ignore_label: int = 255,
                             thresh: float = 0.7, min_kept: int = 100000,
                             factor: int = 8, channels_first: bool = False):
    """(threshold, mined_labels) — the mining half of OHEM, exposed so
    tests can golden it against the reference scipy implementation."""
    probs = jax.nn.softmax(logits.astype(jnp.float32),
                           axis=1 if channels_first else -1)
    probs = jax.lax.stop_gradient(probs)

    # threshold search at 1/factor resolution (ohem.py:20-48)
    h, w = labels.shape[1], labels.shape[2]
    out_h = max(int(round(h / factor)), 1)  # scipy: int(round(dim*zoom))
    out_w = max(int(round(w / factor)), 1)
    small_probs = (resize_bilinear_cf if channels_first else resize_bilinear)(
        probs, (out_h, out_w), align_corners=True)
    small_labels = labels[:, _zoom0_indices(h, out_h)][
        :, :, _zoom0_indices(w, out_w)]
    valid_s = small_labels != ignore_label
    safe_s = jnp.where(valid_s, small_labels, 0).astype(jnp.int32)
    p_true_s = _take_class(small_probs, safe_s, channels_first)
    p_sorted = jnp.sort(jnp.where(valid_s, p_true_s, jnp.inf).ravel())
    k = max(min(min_kept // (factor * factor), p_sorted.size), 1)
    kth = p_sorted[k - 1]
    num_valid = jnp.sum(valid_s)
    threshold = jnp.where(
        num_valid <= k, 1.0,
        jnp.where(jnp.isfinite(kth), jnp.maximum(kth, thresh), 1.0))

    # full-resolution mining (ohem.py:51-78)
    valid = labels != ignore_label
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    p_true = _take_class(probs, safe, channels_first)
    kept = valid & (p_true <= threshold)
    mined = jnp.where(kept, labels, ignore_label)
    return threshold, mined


# ---------------------------------------------------------------------------
# GSRL (distribution-calibrated long-tail loss)
# ---------------------------------------------------------------------------

def gsrl_loss_terms(logits: jnp.ndarray, labels_ori: jnp.ndarray,
                    pixel_weight: jnp.ndarray, *, ignore_label: int,
                    k: int = 9, gamma: float = 9.0,
                    channels_first: bool = False) -> jnp.ndarray:
    """Shared GSRL weight map (criterion.py:86-93): kxk max-pool dilation of
    the per-pixel class weight times a softmax-margin calibration factor.

    The max-pool runs separably (kx1 then 1xk — exact for max), 2k taps
    instead of k^2.
    """
    w = pixel_weight.astype(jnp.float32)
    for dims in ((1, k, 1), (1, 1, k)):
        pad = tuple((d // 2, d // 2) for d in dims)
        w = jax.lax.reduce_window(w, -jnp.inf, jax.lax.max,
                                  window_dimensions=dims,
                                  window_strides=(1, 1, 1), padding=pad)
    caxis = 1 if channels_first else -1
    score = jax.nn.softmax(logits.astype(jnp.float32), axis=caxis)
    if channels_first:
        # top-2 over a non-minor axis: two masked maxes (lax.top_k is
        # last-axis-only, and transposing the full-res tensor would
        # reintroduce the thin-C lane-padded layout this path avoids)
        p1 = jnp.max(score, axis=1)
        arg1 = jnp.argmax(score, axis=1)
        idx = jnp.arange(score.shape[1]).reshape(1, -1, 1, 1)
        p2 = jnp.max(jnp.where(idx == arg1[:, None], -jnp.inf, score),
                     axis=1)
        margin = p1 - p2
    else:
        top2, _ = jax.lax.top_k(score, 2)
        margin = top2[..., 0] - top2[..., 1]
    calibrate = 1.0 + gamma * (1.0 - margin)
    w = calibrate * w
    w = jnp.where(labels_ori == ignore_label, 0.0, w)
    return jax.lax.stop_gradient(w)


def _gsrl_weighted_ce(logits, labels_ori, weight, ignore_label,
                      channels_first=False):
    nll, _ = _per_pixel_ce(logits, labels_ori, ignore_label, channels_first)
    num = jnp.sum(nll * weight, axis=(1, 2))
    den = jnp.sum(weight, axis=(1, 2)) + 1e-8
    return jnp.mean(num / den)


# ---------------------------------------------------------------------------
# DSN (deep supervision) wrappers — the public criterion API
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class Criterion:
    """Callable criterion: (preds, labels) -> {'loss': scalar}.

    ``preds``: dict with 'pred' and optionally 'deepsup' (NHWC logits).
    ``labels``: int map (N,H,W), or dict {'ori','weight'} when the dataset
    attaches balance weights (reference datasets/Base.py:73-89).
    """
    fn: Callable
    name: str

    def __call__(self, preds, labels, *,
                 channels_first: bool = False) -> Dict[str, jnp.ndarray]:
        """``channels_first``: logits in ``preds`` are (N, C, H, W) — the
        layout the fused-loss-tail train step uses for full-resolution
        logits (see engine/trainer.py); numerics are identical."""
        return self.fn(preds, labels, channels_first=channels_first)


def _labels_ori(labels):
    return labels["ori"] if isinstance(labels, dict) else labels


def ce_dsn(ignore_label: int = 255, ds_weight: float = 0.4,
           class_weights=None) -> Criterion:
    """CE + auxiliary deep-supervision CE (criterion.py:48-74)."""
    cw = None if class_weights is None else jnp.asarray(class_weights)

    def fn(preds, labels, channels_first=False):
        y = _labels_ori(labels)
        loss = cross_entropy(preds["pred"], y, ignore_label=ignore_label,
                             class_weights=cw,
                             channels_first=channels_first)
        if "deepsup" in preds:
            loss = loss + ds_weight * cross_entropy(
                preds["deepsup"], y, ignore_label=ignore_label,
                class_weights=cw, channels_first=channels_first)
        return {"loss": loss}

    return Criterion(fn, "ce")


def ohem_dsn(ignore_label: int = 255, ds_weight: float = 0.4,
             ohem_thres: float = 0.7, ohem_keep: int = 100000,
             class_weights=None) -> Criterion:
    """OHEM main head + plain CE deepsup (ohem.py:95-119)."""
    cw = None if class_weights is None else jnp.asarray(class_weights)

    def fn(preds, labels, channels_first=False):
        y = _labels_ori(labels)
        loss = ohem_cross_entropy(preds["pred"], y,
                                  ignore_label=ignore_label,
                                  thresh=ohem_thres, min_kept=ohem_keep,
                                  class_weights=cw,
                                  channels_first=channels_first)
        if "deepsup" in preds:
            loss = loss + ds_weight * cross_entropy(
                preds["deepsup"], y, ignore_label=ignore_label,
                class_weights=cw, channels_first=channels_first)
        return {"loss": loss}

    return Criterion(fn, "ohem")


def gsrl_dsn(ignore_label: int = 255, ds_weight: float = 0.4, k: int = 9,
             gamma: float = 9.0) -> Criterion:
    """Distribution-calibrated loss (criterion.py:77-101).  Requires dict
    labels {'ori','weight'} from a balance-enabled dataset."""

    def fn(preds, labels, channels_first=False):
        y, pw = labels["ori"], labels["weight"]
        w = gsrl_loss_terms(preds["pred"], y, pw, ignore_label=ignore_label,
                            k=k, gamma=gamma, channels_first=channels_first)
        loss = _gsrl_weighted_ce(preds["pred"], y, w, ignore_label,
                                 channels_first)
        if "deepsup" in preds:
            loss = loss + ds_weight * _gsrl_weighted_ce(
                preds["deepsup"], y, w, ignore_label, channels_first)
        return {"loss": loss}

    return Criterion(fn, "gsrl")


def combined(criterions) -> Criterion:
    """Sum of criteria for comma-joined loss types (criterion.py:30-45)."""

    def fn(preds, labels, channels_first=False):
        total = 0.0
        for c in criterions:
            total = total + c(preds, labels,
                              channels_first=channels_first)["loss"]
        return {"loss": total}

    return Criterion(fn, "+".join(c.name for c in criterions))


def build_criterions(loss_type: str, *, ignore_label: int = 255,
                     class_weights=None, loss_para: Optional[dict] = None
                     ) -> Criterion:
    """Registry dispatch (criterion.py:11-27), comma-joined combos allowed."""
    loss_para = dict(loss_para or {})
    balance_weight = loss_para.pop("balance_weight", False)
    cw = class_weights if balance_weight else None

    def one(lt: str) -> Criterion:
        if lt == "ce":
            return ce_dsn(ignore_label=ignore_label, class_weights=cw,
                          **{k: v for k, v in loss_para.items()
                             if k in ("ds_weight",)})
        if lt == "ohem":
            kw = {k: v for k, v in loss_para.items()
                  if k in ("ds_weight", "ohem_thres", "ohem_keep")}
            return ohem_dsn(ignore_label=ignore_label, class_weights=cw,
                            **kw)
        if lt == "gsrl":
            kw = {k: v for k, v in loss_para.items()
                  if k in ("ds_weight", "k", "gamma")}
            return gsrl_dsn(ignore_label=ignore_label, **kw)
        raise NotImplementedError(lt)

    parts = [one(lt.strip()) for lt in loss_type.split(",")]
    return parts[0] if len(parts) == 1 else combined(parts)
