"""Loss golden tests vs the reference torch implementations (CPU).

CE and GSRL are compared against the actual reference modules.  The
reference OHEM's full path calls ``.cuda`` (loss/ohem.py:76) so it cannot
execute here; instead we check our on-device threshold against the
reference's scipy-based ``find_threshold`` and validate the mining +
masked-CE math against a numpy oracle.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from dcfp_tpu.losses.criteria import (build_criterions, ce_dsn,
                                      cross_entropy, gsrl_dsn,
                                      ohem_cross_entropy)

REF = "/root/reference"
HAS_REF = os.path.isdir(REF)
if HAS_REF and REF not in sys.path:
    sys.path.insert(0, REF)


def fake_dataset(num_classes=19, ignore=255):
    return types.SimpleNamespace(ignore_label=ignore, class_weights=None,
                                 num_classes=num_classes)


def make_batch(rng, n=2, h=33, w=31, c=19, ignore=255):
    logits = rng.standard_normal((n, h, w, c), dtype=np.float32) * 2
    labels = rng.integers(0, c, (n, h, w)).astype(np.int64)
    labels[rng.random((n, h, w)) < 0.15] = ignore
    return logits, labels


def t_nchw(x):
    import torch
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
def test_ce_dsn_matches_reference(rng):
    import torch
    from loss.criterion import CriterionDSN
    logits, labels = make_batch(rng)
    ds_logits = rng.standard_normal(logits.shape, dtype=np.float32)

    ref = CriterionDSN(dataset=fake_dataset())
    with torch.no_grad():
        want = ref([t_nchw(logits), t_nchw(ds_logits)],
                   torch.from_numpy(labels))["loss"].item()

    crit = ce_dsn(ignore_label=255)
    got = float(crit({"pred": jnp.asarray(logits),
                      "deepsup": jnp.asarray(ds_logits)},
                     jnp.asarray(labels))["loss"])
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
def test_gsrl_matches_reference(rng):
    import torch
    from loss.criterion import CriterionGsrlDSN
    logits, labels = make_batch(rng)
    ds_logits = rng.standard_normal(logits.shape, dtype=np.float32)
    weight = rng.random(labels.shape).astype(np.float32)

    ref = CriterionGsrlDSN(dataset=fake_dataset())
    with torch.no_grad():
        want = ref([t_nchw(logits), t_nchw(ds_logits)],
                   {"ori": torch.from_numpy(labels),
                    "weight": torch.from_numpy(weight)})["loss"].item()

    crit = gsrl_dsn(ignore_label=255)
    got = float(crit({"pred": jnp.asarray(logits),
                      "deepsup": jnp.asarray(ds_logits)},
                     {"ori": jnp.asarray(labels),
                      "weight": jnp.asarray(weight)})["loss"])
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_weighted_ce_matches_torch(rng):
    import torch
    logits, labels = make_batch(rng, c=7)
    w = rng.random(7).astype(np.float32) + 0.5
    ref = torch.nn.CrossEntropyLoss(weight=torch.from_numpy(w),
                                    ignore_index=255)
    with torch.no_grad():
        want = ref(t_nchw(logits), torch.from_numpy(labels)).item()
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                              ignore_label=255, class_weights=w))
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
@pytest.mark.parametrize("n,h,w,min_kept", [
    (1, 64, 64, 512),      # exact /8 sizes
    (2, 65, 97, 1024),     # odd sizes: zoom rounding paths
    (1, 100, 52, 64),      # tiny min_kept -> kth likely > 0.7
    (1, 36, 44, 10 ** 6),  # min_kept >= num_valid -> threshold 1.0
])
def test_ohem_threshold_and_mined_match_reference(rng, n, h, w, min_kept):
    """Exact golden vs the reference scipy path (loss/ohem.py:20-78).

    Our downsampling now reproduces scipy.ndimage.zoom bit-for-bit in
    structure (round(dim/8) output sizes, endpoint-aligned order-1/order-0
    sampling), so the thresholds must agree to float rounding and the
    mined sets must be identical up to pixels within that rounding of the
    threshold (quantified at <=0.1%; typically 0)."""
    from loss.ohem import OhemCrossEntropy2d
    from dcfp_tpu.losses.criteria import ohem_threshold_and_mined
    import scipy.special

    logits, labels = make_batch(rng, n=n, h=h, w=w)
    probs = scipy.special.softmax(logits, axis=-1)
    ref = OhemCrossEntropy2d(ignore_label=255, thresh=0.7,
                             min_kept=min_kept, factor=8)
    probs_nchw = np.ascontiguousarray(np.transpose(probs, (0, 3, 1, 2)))
    want_thr = ref.find_threshold(probs_nchw, labels)

    got_thr, got_mined = ohem_threshold_and_mined(
        jnp.asarray(logits), jnp.asarray(labels), ignore_label=255,
        thresh=0.7, min_kept=min_kept, factor=8)
    got_thr = float(got_thr)
    np.testing.assert_allclose(got_thr, want_thr, rtol=1e-5, atol=1e-6)

    # reference generate_new_target minus the .cuda() tail (ohem.py:51-78)
    valid = labels != 255
    p_true = np.take_along_axis(
        probs, np.where(valid, labels, 0)[..., None].astype(np.int64),
        axis=-1)[..., 0]
    want_mined = np.where(valid & (p_true <= want_thr), labels, 255)
    disagree = (np.asarray(got_mined) != want_mined).mean()
    assert disagree <= 1e-3, f"mined-set disagreement {disagree:.2e}"


def test_ohem_reduces_to_ce_when_keep_all(rng):
    logits, labels = make_batch(rng, n=1, h=32, w=32)
    full = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    # min_kept larger than the image -> threshold 1.0 -> keep everything
    ohem = float(ohem_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                    min_kept=10 ** 7))
    np.testing.assert_allclose(ohem, full, rtol=1e-6)


def test_ohem_mines_hard_pixels(rng):
    """With tiny min_kept, OHEM loss must exceed plain CE (keeps hard px)."""
    logits, labels = make_batch(rng, n=1, h=64, w=64)
    full = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    ohem = float(ohem_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                    min_kept=64, thresh=0.05))
    assert ohem > full


def test_build_criterions_combined(rng):
    logits, labels = make_batch(rng)
    weight = rng.random(labels.shape).astype(np.float32)
    crit = build_criterions("ce,gsrl", ignore_label=255)
    preds = {"pred": jnp.asarray(logits)}
    lab = {"ori": jnp.asarray(labels), "weight": jnp.asarray(weight)}
    ce_only = build_criterions("ce", ignore_label=255)(preds, lab)["loss"]
    gsrl_only = build_criterions("gsrl", ignore_label=255)(preds, lab)["loss"]
    both = crit(preds, lab)["loss"]
    np.testing.assert_allclose(float(both), float(ce_only) + float(gsrl_only),
                               rtol=1e-6)


@pytest.mark.parametrize("loss_type", ["ce", "gsrl", "ohem"])
def test_channels_first_layout_equivalence(rng, loss_type):
    """The NCHW criterion path (used by the fused-loss-tail train step,
    engine/trainer.py) must match the NHWC path exactly — same math,
    different layout."""
    logits, labels = make_batch(rng)
    aux, _ = make_batch(rng)
    weight = rng.random(labels.shape).astype(np.float32)
    crit = build_criterions(loss_type, ignore_label=255,
                            loss_para={"ohem_keep": 64})
    lab = {"ori": jnp.asarray(labels), "weight": jnp.asarray(weight)}
    preds = {"pred": jnp.asarray(logits), "deepsup": jnp.asarray(aux)}
    preds_cf = {k: jnp.transpose(v, (0, 3, 1, 2)) for k, v in preds.items()}
    ref = float(crit(preds, lab)["loss"])
    cf = float(crit(preds_cf, lab, channels_first=True)["loss"])
    np.testing.assert_allclose(cf, ref, rtol=1e-6)
