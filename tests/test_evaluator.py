"""Evaluator tests: confusion math, sliding/multiscale consistency,
boundary IoU, and an end-to-end eval loop."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcfp_tpu.engine.evaluator import (Predictor, confusion_matrix,
                                       evaluate, metrics_from_confusion,
                                       pad_inf)
from dcfp_tpu.graph.apply import init_graph
from dcfp_tpu.graph.ir import GraphBuilder
from dcfp_tpu.utils.edge import mask_to_boundary


def pointwise_model(num_classes=6):
    """1x1-conv model: per-pixel function -> sliding == whole exactly."""
    b = GraphBuilder("pw")
    x = b.input("image")
    x = b.conv(x, "c1", out_ch=8, kernel=1, padding=0)
    x = b.bn(x, "n1")
    x = b.relu(x, "r1")
    pred = b.conv(x, "pred", out_ch=num_classes, kernel=1, padding=0,
                  bias=True)
    g = b.finish([pred])
    return g


def make_predictor(g, seed=0):
    params, state = init_graph(g, jax.random.key(seed))
    return Predictor(g, params, state)


def test_confusion_matrix_matches_reference_math(rng):
    """Oracle: the reference's bincount-per-cell loop
    (evaluate.py:229-247)."""
    C = 5
    gt = rng.integers(0, C, 1000)
    pred = rng.integers(0, C, 1000)
    got = confusion_matrix(gt, pred, C, ignore_label=255)
    want = np.zeros((C, C))
    index = (gt * C + pred).astype("int32")
    label_count = np.bincount(index)
    for i in range(C):
        for j in range(C):
            cur = i * C + j
            if cur < len(label_count):
                want[i, j] = label_count[cur]
    np.testing.assert_array_equal(got, want)
    # ignore pixels excluded
    gt2 = gt.copy()
    gt2[:100] = 255
    got2 = confusion_matrix(gt2, pred, C)
    assert got2.sum() == 900


def test_confusion_matrix_boundary_mode_matches_reference(rng):
    """Boundary-IoU-shaped input: pred contains ignore_label (255) at
    pixels where gt is a valid boundary class (evaluate.py:352-361
    transforms pred/gt independently and filters on gt only), so
    gt*C + pred runs past C*C.  The reference's per-cell copy loop
    drops entries >= C*C and ALIASES out-of-range idx that land below
    C*C into unrelated cells — assert we reproduce that verbatim."""
    for C in (5, 19):
        gt = rng.integers(0, C, 2000)
        pred = rng.integers(0, C, 2000)
        pred[rng.random(2000) < 0.3] = 255  # non-boundary predictions
        gt[rng.random(2000) < 0.2] = 255
        got = confusion_matrix(gt, pred, C, ignore_label=255)
        keep = gt != 255
        index = (gt[keep] * C + pred[keep]).astype("int32")
        label_count = np.bincount(index)
        want = np.zeros((C, C))
        for i in range(C):
            for j in range(C):
                cur = i * C + j
                if cur < len(label_count):
                    want[i, j] = label_count[cur]
        np.testing.assert_array_equal(got, want)
        # the aliasing is real: some out-of-range idx landed in-range
        assert (gt[keep] * C + pred[keep] >= C * C).any()


def test_metrics_from_confusion():
    cm = np.array([[8., 2.], [1., 9.]])
    m = metrics_from_confusion(cm)
    iu0 = 8 / (10 + 9 - 8)
    iu1 = 9 / (10 + 11 - 9)
    np.testing.assert_allclose(m["IU_array"], [iu0, iu1], rtol=1e-6)
    np.testing.assert_allclose(m["meanIU"], (iu0 + iu1) / 2, rtol=1e-6)


def test_pad_inf():
    assert pad_inf((1024, 2048)) == (1025, 2049)
    assert pad_inf((1025, 2049)) == (1025, 2049)
    assert pad_inf((769, 769)) == (769, 769)


def test_sliding_equals_whole_for_pointwise_model(rng):
    g = pointwise_model()
    p = make_predictor(g)
    img = rng.standard_normal((1, 50, 70, 3), dtype=np.float32)
    whole = np.asarray(p.predict_whole(img))
    slid = p.predict_sliding(img, (32, 32), num_classes=6)
    np.testing.assert_allclose(slid, whole, rtol=1e-4, atol=1e-5)


def test_sliding_pads_undersized_scaled_images(rng):
    """ms scale 0.5 shrinks the image BELOW the tile size; the protocol
    zero-pads the tile to (th, tw) before the forward and crops the
    logits back (reference evaluate.py:166-171).  A pointwise model
    makes sliding exactly equal whole-image inference, including that
    border path, so ms+sliding must reproduce ms+whole labels."""
    g = pointwise_model()
    p = make_predictor(g)
    img = rng.standard_normal((1, 40, 60, 3), dtype=np.float32)
    kw = dict(num_classes=6, flip=False, align_corner=False)
    whole = np.asarray(p.predict_multiscale(img, (32, 32), [0.5, 1.0],
                                            whole=True, **kw))
    slid = np.asarray(p.predict_multiscale(img, (32, 32), [0.5, 1.0],
                                           whole=False, **kw))
    np.testing.assert_array_equal(slid, whole)


@pytest.mark.parametrize("hw,tile,ac,flip", [
    ((37, 53), (24, 24), False, False),
    ((64, 48), (32, 32), True, True),
    ((31, 70), (32, 32), False, True),
])
def test_protocol_mode_equality_sweep(rng, hw, tile, ac, flip):
    """Pointwise-model property sweep over sizes x align_corner x flip:
    ms+sliding must equal ms+whole at every combination (covers odd
    sizes, pad_inf's stride+1 rule, undersized scaled tiles, and flip
    averaging interacting with the overlap-add normalization)."""
    g = pointwise_model()
    p = make_predictor(g)
    img = rng.standard_normal((1, *hw, 3), dtype=np.float32)
    kw = dict(num_classes=6, flip=flip, align_corner=ac)
    whole = np.asarray(p.predict_multiscale(img, tile, [0.75, 1.0],
                                            whole=True, **kw))
    slid = np.asarray(p.predict_multiscale(img, tile, [0.75, 1.0],
                                           whole=False, **kw))
    np.testing.assert_array_equal(slid, whole)


def test_multiscale_single_scale_equals_whole(rng):
    g = pointwise_model()
    p = make_predictor(g)
    img = rng.standard_normal((1, 40, 40, 3), dtype=np.float32)
    # whole-image ms runs fully on device and returns uint8 label maps
    whole_labels = np.argmax(np.asarray(p.predict_whole(img)), -1)
    ms = np.asarray(p.predict_multiscale(img, (32, 32), [1.0], 6,
                                         flip=False, align_corner=False,
                                         whole=True))
    assert ms.ndim == 3 and ms.dtype == np.uint8
    np.testing.assert_array_equal(ms, whole_labels)
    # pointwise model is flip-equivariant -> flip averaging is a no-op
    ms_flip = np.asarray(p.predict_multiscale(img, (32, 32), [1.0], 6,
                                              flip=True,
                                              align_corner=False,
                                              whole=True))
    np.testing.assert_array_equal(ms_flip, whole_labels)


def test_mask_to_boundary():
    mask = np.full((40, 40), 255, np.int64)
    mask[5:35, 5:35] = 1
    b = mask_to_boundary(mask, num_classes=3, dilation_ratio=0.02)
    # interior hollowed out to background
    assert b[20, 20] == 255
    # boundary ring keeps the class id
    assert b[5, 20] == 1
    assert (b == 1).sum() < (mask == 1).sum()


def test_evaluate_end_to_end(rng, tmp_path):
    g = pointwise_model()
    p = make_predictor(g)

    def loader():
        r = np.random.default_rng(0)
        for i in range(8):
            yield {"img": r.standard_normal((1, 33, 45, 3),
                                            dtype=np.float32),
                   "label": r.integers(0, 6, (1, 33, 45)),
                   "img_meta": [{"name": f"im{i}"}]}

    result_file = str(tmp_path / "result.txt")
    res = evaluate(p, loader(), num_classes=6, whole=True,
                   align_corner=True, fps_warmup=2,
                   result_file=result_file, result_tag="unit")
    assert 0.0 <= res["meanIU"] <= 1.0
    assert res["fps"] > 0
    assert res["confusion"].sum() == 8 * 33 * 45
    text = open(result_file).read()
    assert "meanIU" in text and "FPS" in text


def conv3_model(num_classes=6):
    """3x3-conv model (receptive field 5): border effects reach <=2 px."""
    b = GraphBuilder("c3")
    x = b.input("image")
    x = b.conv(x, "c1", out_ch=8, kernel=3)
    x = b.bn(x, "n1")
    x = b.relu(x, "r1")
    pred = b.conv(x, "pred", out_ch=num_classes, kernel=3, bias=True)
    return b.finish([pred])


def test_bucket_hw():
    from dcfp_tpu.engine.evaluator import bucket_hw
    assert bucket_hw((100, 130), 64) == (128, 192)
    assert bucket_hw((128, 128), 64) == (128, 128)
    assert bucket_hw((100, 130), 64, align_corner=True) == (129, 193)
    assert bucket_hw((129, 129), 64, align_corner=True) == (129, 129)
    assert bucket_hw((50, 60), 0) == (50, 60)
    # align buckets satisfy the pad_inf stride+1 rule for stride | quantum
    for hw in [(31, 77), (200, 111)]:
        bh, bw = bucket_hw(hw, 64, align_corner=True)
        assert pad_inf((bh, bw)) == (bh, bw)


def test_bucketed_eval_bounds_compiles_same_miou(rng):
    """A variable-size val set under bucket_quantum compiles a bounded
    program set with mIoU unchanged vs the per-shape predictor.  Labels
    carry an ignore margin wider than the model's receptive field, so
    zero-pad border effects cannot touch the confusion matrix and the
    equality is exact."""
    g = conv3_model()
    params, state = init_graph(g, jax.random.key(0))
    sizes = [(41, 53), (47, 61), (52, 44), (63, 33), (37, 58),
             (59, 47), (45, 45), (50, 62)]

    def loader():
        r = np.random.default_rng(1)
        for h, w in sizes:
            lab = r.integers(0, 6, (1, h, w))
            lab[:, -4:, :] = 255  # ignore margin >= receptive field 5//2
            lab[:, :, -4:] = 255
            yield {"img": r.standard_normal((1, h, w, 3),
                                            dtype=np.float32),
                   "label": lab}

    p_exact = Predictor(g, params, state)
    res_exact = evaluate(p_exact, loader(), num_classes=6, whole=True,
                         fps_warmup=0)
    assert p_exact.num_compiles() == len(set(sizes))

    p_bucket = Predictor(g, params, state, bucket_quantum=32)
    res_bucket = evaluate(p_bucket, loader(), num_classes=6, whole=True,
                          fps_warmup=0)
    assert p_bucket.num_compiles() <= 2  # (64,64) and (64,96) buckets
    np.testing.assert_array_equal(res_bucket["confusion"],
                                  res_exact["confusion"])
    assert res_bucket["meanIU"] == res_exact["meanIU"]


@pytest.mark.parametrize("shard,n_data,n_spatial", [
    ("data", 8, 1),
    ("spatial", 4, 2),
    ("both", 4, 2),
])
def test_mesh_sharded_predictor_matches_single(rng, shard, n_data,
                                               n_spatial):
    """Whole-image forward over a device mesh (batch / spatial-height /
    both sharded) must reproduce the single-device logits — the
    context-parallel analog promised in SURVEY §5 (halo exchanges from
    the SPMD partitioner)."""
    from dcfp_tpu.parallel.mesh import create_mesh
    assert len(jax.devices()) == 8
    g = conv3_model()
    params, state = init_graph(g, jax.random.key(0))
    img = rng.standard_normal((8, 32, 40, 3), dtype=np.float32)

    single = np.asarray(Predictor(g, params, state).predict_whole(img))
    mesh = create_mesh(n_data=n_data, n_spatial=n_spatial)
    p = Predictor(g, params, state, mesh=mesh, shard=shard)
    sharded = np.asarray(p.predict_whole(img))
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)


def test_mesh_eval_reproduces_single_device_miou(rng):
    """End-to-end eval over an 8-device data mesh == single-device eval
    (confusion matrix and mIoU exactly equal) — the reference's
    distributed evaluation capability (evaluate.py:370-372)."""
    from dcfp_tpu.parallel.mesh import create_mesh
    g = conv3_model()
    params, state = init_graph(g, jax.random.key(0))

    def loader():
        r = np.random.default_rng(2)
        for _ in range(3):
            yield {"img": r.standard_normal((8, 33, 41, 3),
                                            dtype=np.float32),
                   "label": r.integers(0, 6, (8, 33, 41))}

    res1 = evaluate(Predictor(g, params, state), loader(),
                    num_classes=6, whole=True, fps_warmup=0)
    mesh = create_mesh(n_data=8, n_spatial=1)
    p = Predictor(g, params, state, mesh=mesh, shard="data")
    res8 = evaluate(p, loader(), num_classes=6, whole=True, fps_warmup=0)
    np.testing.assert_array_equal(res8["confusion"], res1["confusion"])
    assert res8["meanIU"] == res1["meanIU"]


@pytest.mark.parametrize("radius_min", [-1, 1])
def test_distance_transform_edges_match_reference(rng, radius_min):
    """onehot_to_{multiclass,binary}_edges vs the reference scipy
    implementation (edge_utils.py:29-74)."""
    import os, sys
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference repo not mounted")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from utils import edge_utils as ref
    from dcfp_tpu.utils.edge import (mask_to_onehot,
                                     onehot_to_binary_edges,
                                     onehot_to_multiclass_edges)

    mask = rng.integers(0, 5, (40, 52)).astype(np.int64)
    mask[rng.random((40, 52)) < 0.1] = 255
    onehot = mask_to_onehot(mask, 5)

    want_mc = ref.onehot_to_multiclass_edges(onehot, 2, 5, radius_min)
    got_mc = onehot_to_multiclass_edges(onehot, 2, 5, radius_min)
    np.testing.assert_array_equal(got_mc, (want_mc > 0).astype(np.uint8))

    want_bin = ref.onehot_to_binary_edges(onehot, 2, 5, radius_min)
    got_bin = onehot_to_binary_edges(onehot, 2, 5, radius_min)
    np.testing.assert_array_equal(got_bin, want_bin)


@pytest.mark.parametrize("ratio", [0.02, 0.005])
def test_mask_to_boundary_matches_reference(rng, ratio):
    """mask_to_boundary vs the reference's own erosion implementation
    (edge_utils.py:98-127) on random multi-class masks with ignore
    regions — elementwise identical, incl. the border-padding rule and
    the dilation-from-diagonal rounding."""
    import os, sys
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference repo not mounted")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from utils import edge_utils as ref
    from dcfp_tpu.utils.edge import mask_to_boundary as ours

    mask = rng.integers(0, 6, (47, 61)).astype(np.int64)
    mask[rng.random((47, 61)) < 0.15] = 255
    want = ref.mask_to_boundary(mask.copy(), 6, dilation_ratio=ratio,
                                background=255)
    got = ours(mask.copy(), 6, dilation_ratio=ratio, background=255)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("ratio", [0.02, 0.005])
def test_mask_to_boundary_device_matches_host(rng, ratio):
    """The batched on-device erosion (separable min-pool) must reproduce
    the host cv2 path elementwise — random multi-class masks with ignore
    regions, solid regions, and a tiny dilation where rounding matters."""
    from dcfp_tpu.utils.edge import mask_to_boundary_device

    masks = rng.integers(0, 6, (3, 47, 61)).astype(np.int64)
    masks[rng.random((3, 47, 61)) < 0.15] = 255
    masks[1, 10:30, 10:40] = 2  # a solid block: interior must hollow out
    masks[2] = 255              # all-ignore image: stays all background

    got = mask_to_boundary_device(masks, 6, dilation_ratio=ratio,
                                  background=255)
    for i in range(masks.shape[0]):
        want = mask_to_boundary(masks[i].copy(), 6, dilation_ratio=ratio,
                                background=255)
        np.testing.assert_array_equal(got[i], want)


def test_mask_to_boundary_device_variable_shapes(rng):
    """Per-image native label sizes (longsize/shortsize protocols) hit
    the device path with a different (H, W) every batch: the bucketed
    padding must stay exact across shapes sharing and not sharing a
    bucket, and across different dilations at one bucketed shape."""
    from dcfp_tpu.utils.edge import mask_to_boundary_device

    for hw in [(47, 61), (100, 120), (128, 128), (130, 257)]:
        masks = rng.integers(0, 6, (2, *hw)).astype(np.int64)
        masks[rng.random((2, *hw)) < 0.1] = 255
        got = mask_to_boundary_device(masks, 6, dilation_ratio=0.02,
                                      background=255)
        for i in range(2):
            want = mask_to_boundary(masks[i].copy(), 6,
                                    dilation_ratio=0.02, background=255)
            np.testing.assert_array_equal(got[i], want)


def test_label_path_agrees_with_logits_argmax(rng):
    """The deploy-backed label path (BN folded, fused tail) must agree
    with argmax over the raw-graph logits everywhere except exact
    numerical ties (fold reassociates the BN affine)."""
    b = GraphBuilder("bnres")
    x = b.input("image")
    x = b.conv_bn_relu(x, "s", out_ch=8, kernel=3, stride=2)
    z = b.conv(x, "cls", out_ch=6, kernel=1, padding=0, bias=True)
    b.resize(z, "pred", to_input=True, align_corners=False)
    g = b.finish(["pred"])
    p = make_predictor(g)
    img = rng.standard_normal((1, 48, 56, 3), dtype=np.float32)
    labels = np.asarray(p.predict_whole_labels(img))
    ref = np.argmax(np.asarray(p.predict_whole(img)), -1)
    assert labels.shape == ref.shape and labels.dtype == np.uint8
    assert (labels == ref).mean() > 0.995


@pytest.mark.parametrize("shard,n_data,n_spatial", [
    ("data", 8, 1),
    ("both", 4, 2),
])
def test_mesh_sliding_and_ms_match_single(rng, shard, n_data, n_spatial):
    """Sliding-window and multi-scale+flip eval under a device mesh run
    fully device-side (tile batch re-sharded over 'data', image height
    over 'spatial') and reproduce the single-device results — no host
    overlap-add fallback (reference evaluate.py:145-227)."""
    from dcfp_tpu.parallel.mesh import create_mesh
    g = conv3_model()
    params, state = init_graph(g, jax.random.key(0))
    img = rng.standard_normal((2, 40, 48, 3), dtype=np.float32)
    tile, nc = (24, 24), 6

    single = Predictor(g, params, state)
    mesh = create_mesh(n_data=n_data, n_spatial=n_spatial)
    meshed = Predictor(g, params, state, mesh=mesh, shard=shard)

    s1 = np.asarray(single.predict_sliding(img, tile, nc))
    s2 = np.asarray(meshed.predict_sliding(img, tile, nc))
    np.testing.assert_allclose(s2, s1, rtol=1e-5, atol=1e-6)

    kw = dict(scales=(0.75, 1.0), num_classes=nc, flip=True,
              align_corner=False, whole=False, return_probs=True)
    m1 = np.asarray(single.predict_multiscale(img, tile, **kw))
    m2 = np.asarray(meshed.predict_multiscale(img, tile, **kw))
    np.testing.assert_allclose(m2, m1, rtol=1e-5, atol=1e-6)


def test_pipelined_eval_matches_protocol_loop(rng, tmp_path):
    """Throughput-mode eval (device-resident confusion, no per-image
    host sync) must produce a bit-identical confusion matrix / meanIU
    to the protocol loop, including ignore-label pixels, align-corner
    padding and the small-loader warmup path."""
    g = pointwise_model()
    p = make_predictor(g)

    def loader():
        r = np.random.default_rng(7)
        for i in range(9):
            label = r.integers(0, 6, (1, 33, 45))
            label[label == 5] = 255  # exercise ignore handling
            yield {"img": r.standard_normal((1, 33, 45, 3),
                                            dtype=np.float32),
                   "label": label,
                   "img_meta": [{"name": f"im{i}"}]}

    res_proto = evaluate(p, loader(), num_classes=6, whole=True,
                         align_corner=True, fps_warmup=2)
    res_pipe = evaluate(p, loader(), num_classes=6, whole=True,
                        align_corner=True, fps_warmup=2, pipeline=True)
    np.testing.assert_array_equal(res_pipe["confusion"],
                                  res_proto["confusion"])
    assert res_pipe["meanIU"] == res_proto["meanIU"]
    assert res_pipe["fps"] > 0

    # ms/flip and sliding-window run pipelined too (the per-scale
    # forwards, tile scatter-adds and argmax were already device-side in
    # the protocol loop, so the confusion stays bit-identical)
    for kw2 in [dict(whole=True, scales=(0.5, 1.0), flip=True),
                dict(whole=False, tile_size=(24, 24))]:
        res_a = evaluate(p, loader(), num_classes=6, align_corner=True,
                         fps_warmup=2, **kw2)
        res_b = evaluate(p, loader(), num_classes=6, align_corner=True,
                         fps_warmup=2, pipeline=True, **kw2)
        np.testing.assert_array_equal(res_b["confusion"],
                                      res_a["confusion"])
        assert res_b["meanIU"] == res_a["meanIU"]

    # logits-resize protocols still fall back to the protocol loop
    res_fb = evaluate(p, loader(), num_classes=6, whole=True,
                      align_corner=True, fps_warmup=2, pipeline=True,
                      longsize=40)
    res_ls = evaluate(p, loader(), num_classes=6, whole=True,
                      align_corner=True, fps_warmup=2, longsize=40)
    np.testing.assert_array_equal(res_fb["confusion"],
                                  res_ls["confusion"])


def test_compact_uint8_eval_matches_f32(rng):
    """Raw uint8 items (device-side normalize, prep_raw) must reproduce
    the classic host-normalized f32 path bit-for-bit, in both the
    protocol loop and the pipelined loop, including align-corner
    padding (prep masks pad pixels to 0.0 AFTER normalize)."""
    g = pointwise_model()
    params, state = init_graph(g, jax.random.key(0))
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    p = Predictor(g, params, state, normalize=(mean, std))

    r0 = np.random.default_rng(11)
    raws = [r0.integers(0, 256, (1, 33, 45, 3)).astype(np.uint8)
            for _ in range(5)]
    labels = [r0.integers(0, 6, (1, 33, 45)) for _ in range(5)]
    for lb in labels:
        lb[lb == 5] = 255

    def classic_loader():
        for i, raw in enumerate(raws):
            img = raw.astype(np.float32) / 255.0
            img -= np.asarray(mean, np.float32)
            img /= np.asarray(std, np.float32)
            yield {"img": img, "label": labels[i],
                   "img_meta": [{"name": f"im{i}"}]}

    def compact_loader():
        for i, raw in enumerate(raws):
            yield {"img": raw, "label": labels[i].astype(np.uint8),
                   "img_meta": [{"name": f"im{i}"}]}

    kw = dict(num_classes=6, whole=True, align_corner=True, fps_warmup=1)
    want = evaluate(p, classic_loader(), **kw)
    got_proto = evaluate(p, compact_loader(), **kw)
    got_pipe = evaluate(p, compact_loader(), pipeline=True, **kw)
    np.testing.assert_array_equal(got_proto["confusion"],
                                  want["confusion"])
    np.testing.assert_array_equal(got_pipe["confusion"],
                                  want["confusion"])

    # uint8 items without normalize -> explicit error
    p2 = Predictor(g, params, state)
    with pytest.raises(ValueError):
        evaluate(p2, compact_loader(), **kw)
