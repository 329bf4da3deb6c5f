"""End-to-end CLI pipeline on a synthetic Cityscapes fixture:
label_index -> pretrain (EIC) -> prune -> finetune (gsrl/balance/resample,
pruned widths, sharded mesh) -> evaluate -> deploy.  This is the
scripts/{cs}/.sh recipe in miniature."""

import json
import os

import numpy as np
import pytest

from dcfp_tpu.data.synthetic import make_cityscapes_fixture

BACKBONE_PARA = '{"os": 32, "mg_unit": [1, 1, 1], "inplanes": 64}'


@pytest.fixture(scope="module")
def cs_fixture(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cs"))
    train_lst = make_cityscapes_fixture(root, n_images=4, hw=(72, 96),
                                        split="train")
    val_lst = make_cityscapes_fixture(root, n_images=2, hw=(72, 96),
                                      split="val", seed=1)
    os.environ["DCFP_CS_ROOT"] = root
    os.environ["DCFP_CS_TRAIN_LIST"] = train_lst
    os.environ["DCFP_CS_VAL_LIST"] = val_lst
    return root


def test_full_pipeline(cs_fixture, tmp_path_factory):
    work = str(tmp_path_factory.mktemp("work"))
    snap = os.path.join(work, "pretrain")
    prune_dir = os.path.join(work, "prune")
    ft = os.path.join(work, "finetune")

    # 1. label index (reference label_index.py)
    from dcfp_tpu.cli import label_index
    assert label_index.main([
        "--dataset", "CS", "--save-dir", cs_fixture]) == 0
    assert os.path.exists(os.path.join(cs_fixture, "label_index_CS.pkl"))

    # 2. pretrain with EIC accumulation (scripts/cs/pretrain.sh shape)
    from dcfp_tpu.cli import train
    assert train.main([
        "--dataset", "CS", "--model", "simple", "--backbone", "resnet50",
        "--backbone-para", BACKBONE_PARA, "--input-size", "48,48",
        "--batch-size", "2", "--num-steps", "3", "--save-pred-every", "3",
        "--loss-type", "ce", "--deepsup", "true", "--prune-type", "dcfp",
        "--snapshot-dir", snap, "--num-devices", "2", "--log-every", "1",
        "--align-corner", "false"]) == 0
    pretrain_ckpt = os.path.join(snap, "CS_scenes_3.msgpack")
    score = os.path.join(snap, "score.msgpack")
    assert os.path.exists(pretrain_ckpt) and os.path.exists(score)

    # 3. prune to a FLOPs target with round-trip verification
    from dcfp_tpu.cli import prune
    assert prune.main([
        "--dataset", "CS", "--model", "simple", "--backbone", "resnet50",
        "--backbone-para", BACKBONE_PARA, "--align-corner", "false",
        "--model-path", pretrain_ckpt, "--score-path", score,
        "--prune-ratio", "0.3", "--flops-input-size", "48,48",
        "--save-path", prune_dir]) == 0
    cfg_path = os.path.join(prune_dir, "channel_cfg.msgpack")
    pruned_path = os.path.join(prune_dir, "pruned.msgpack")
    assert os.path.exists(cfg_path) and os.path.exists(pruned_path)

    # 4. finetune at pruned widths: gsrl + balance 2 + resample, sharded
    # over a 2x2 (data x spatial) mesh (scripts/cs/finetune.sh shape)
    assert train.main([
        "--dataset", "CS", "--model", "simple", "--backbone", "resnet50",
        "--backbone-para", BACKBONE_PARA, "--input-size", "48,48",
        "--batch-size", "2", "--num-steps", "2", "--save-pred-every", "2",
        "--loss-type", "gsrl", "--deepsup", "true",
        "--balance", "2", "--resample", "true",
        "--channel-cfg", cfg_path, "--resume", pruned_path,
        "--snapshot-dir", ft, "--num-devices", "4",
        "--spatial-shards", "2", "--log-every", "1",
        "--align-corner", "false", "--warmup", "1"]) == 0
    ft_ckpt = os.path.join(ft, "CS_scenes_2.msgpack")
    assert os.path.exists(ft_ckpt)

    # 5. evaluate the pruned model on the val split
    from dcfp_tpu.cli import evaluate
    result_file = os.path.join(work, "result.txt")
    assert evaluate.main([
        "--dataset", "CS", "--data-dir", "val", "--model", "simple",
        "--backbone", "resnet50", "--backbone-para", BACKBONE_PARA,
        "--align-corner", "false", "--whole", "true", "--ms", "1",
        "--input-size", "48,48", "--restore-from", ft_ckpt,
        "--channel-cfg", cfg_path, "--result-file", result_file]) == 0
    txt = open(result_file).read()
    assert "meanIU" in txt

    # 6. deploy: BN-fold + AOT compile + serialized executable + latency
    from dcfp_tpu.cli import deploy
    deploy_dir = os.path.join(work, "deploy")
    assert deploy.main([
        "--dataset", "CS", "--model", "simple", "--backbone", "resnet50",
        "--backbone-para", BACKBONE_PARA, "--align-corner", "false",
        "--input-size", "48,48", "--restore-from", ft_ckpt,
        "--channel-cfg", cfg_path, "--save-dir", deploy_dir,
        "--warmup", "1", "--iters", "2"]) == 0
    assert os.path.exists(os.path.join(deploy_dir, "model.stablehlo"))

    # 7. submission PNGs from the PRUNED model (the reference's
    # evaluate_test.py consumes channel_cfg the same way, :73-108)
    test_lst = os.path.join(os.environ["DCFP_CS_ROOT"], "sub_test.lst")
    with open(test_lst, "w") as f:
        f.write("leftImg8bit/val/img_0000.png\n")
    os.environ["DCFP_CS_TEST_LIST"] = test_lst
    from dcfp_tpu.cli import evaluate_test
    sub_dir = os.path.join(work, "submission")
    assert evaluate_test.main([
        "--dataset", "CS", "--data-dir", "test", "--model", "simple",
        "--backbone", "resnet50", "--backbone-para", BACKBONE_PARA,
        "--align-corner", "false", "--whole", "true", "--ms", "1",
        "--restore-from", ft_ckpt, "--channel-cfg", cfg_path,
        "--output-dir", sub_dir]) == 0
    assert os.listdir(os.path.join(sub_dir, "raw"))


def test_evaluate_test_submission(cs_fixture, tmp_path_factory):
    """Test-split inference saves raw-id + palette PNGs
    (reference evaluate_test.py:133-164)."""
    root = cs_fixture
    test_lst = make_cityscapes_fixture(root, n_images=2, hw=(72, 96),
                                       split="test", seed=2)
    # test .lst has image paths only
    with open(test_lst, "w") as f:
        for i in range(2):
            f.write(f"leftImg8bit/test/img_{i:04d}.png\n")
    os.environ["DCFP_CS_TEST_LIST"] = test_lst

    import jax
    from dcfp_tpu.cli import evaluate_test
    from dcfp_tpu.graph.apply import init_graph
    from dcfp_tpu.models.registry import build_model
    from dcfp_tpu.utils import checkpoint as ckpt

    model = build_model("simple", backbone="resnet50",
                        backbone_para=json.loads(BACKBONE_PARA),
                        num_classes=19, align_corner=False, deepsup=False)
    params, bn = init_graph(model.graph, jax.random.key(0))
    work = str(tmp_path_factory.mktemp("sub"))
    ckpt_path = os.path.join(work, "w.msgpack")
    ckpt.save_pytree(ckpt_path, {"params": params, "bn_state": bn})

    out_dir = os.path.join(work, "out")
    assert evaluate_test.main([
        "--dataset", "CS", "--data-dir", "test", "--model", "simple",
        "--backbone", "resnet50", "--backbone-para", BACKBONE_PARA,
        "--align-corner", "false", "--whole", "true", "--ms", "1",
        "--restore-from", ckpt_path, "--output-dir", out_dir]) == 0
    import cv2
    raws = sorted(os.listdir(os.path.join(out_dir, "raw")))
    assert len(raws) == 2
    raw = cv2.imread(os.path.join(out_dir, "raw", raws[0]),
                     cv2.IMREAD_GRAYSCALE)
    # reverse remap produces raw Cityscapes ids (7..33), never train ids
    assert raw.max() >= 7


def test_evaluate_serves_aot_artifact(cs_fixture, tmp_path_factory):
    """deploy --output argmax exports an executable; evaluate --use-aot
    serves it (the reference's totrt.py -> evaluate --use-trt loop).
    Regression: label-map (N,H,W) outputs must not be argmaxed again."""
    import jax
    from dcfp_tpu.cli import deploy, evaluate
    from dcfp_tpu.graph.apply import init_graph
    from dcfp_tpu.models.registry import build_model
    from dcfp_tpu.utils import checkpoint as ckpt

    work = str(tmp_path_factory.mktemp("aot"))
    model = build_model("simple", backbone="resnet50",
                        backbone_para=json.loads(BACKBONE_PARA),
                        num_classes=19, align_corner=False, deepsup=False)
    params, bn = init_graph(model.graph, jax.random.key(0))
    ckpt_path = os.path.join(work, "w.msgpack")
    ckpt.save_pytree(ckpt_path, {"params": params, "bn_state": bn})

    deploy_dir = os.path.join(work, "deploy")
    # val fixture images are 72x96; align_corner false -> no pad
    assert deploy.main([
        "--dataset", "CS", "--model", "simple", "--backbone", "resnet50",
        "--backbone-para", BACKBONE_PARA, "--align-corner", "false",
        "--input-size", "72,96", "--restore-from", ckpt_path,
        "--save-dir", deploy_dir, "--warmup", "1", "--iters", "2",
        "--dtype", "float32"]) == 0

    result_file = os.path.join(work, "result.txt")
    assert evaluate.main([
        "--dataset", "CS", "--data-dir", "val", "--model", "simple",
        "--backbone", "resnet50", "--backbone-para", BACKBONE_PARA,
        "--align-corner", "false", "--whole", "true", "--ms", "1",
        "--input-size", "72,96", "--restore-from", ckpt_path,
        "--use-aot", "true",
        "--aot-path", os.path.join(deploy_dir, "model.stablehlo"),
        "--result-file", result_file]) == 0
    assert "meanIU" in open(result_file).read()

    # guard: multi-scale serving of an ARGMAX artifact is rejected (ms
    # averages probabilities; it needs a per-scale logits set)
    import pytest
    with pytest.raises(SystemExit):
        evaluate.main([
            "--dataset", "CS", "--data-dir", "val", "--model", "simple",
            "--backbone", "resnet50", "--backbone-para", BACKBONE_PARA,
            "--restore-from", ckpt_path, "--use-aot", "true",
            "--aot-path", os.path.join(deploy_dir, "model.stablehlo"),
            "--whole", "true", "--ms", "0.5,1"])

    # sliding-window serving through a tile-shaped logits export
    # (reference evaluate.py:273-276 uses the TRT engine inside
    # predict_sliding too); mIoU matches the jit sliding path
    tile_dir = os.path.join(work, "deploy_tile")
    assert deploy.main([
        "--dataset", "CS", "--model", "simple", "--backbone", "resnet50",
        "--backbone-para", BACKBONE_PARA, "--align-corner", "false",
        "--input-size", "48,64", "--output", "logits",
        "--restore-from", ckpt_path, "--save-dir", tile_dir,
        "--warmup", "1", "--iters", "2", "--dtype", "float32"]) == 0
    common = ["--dataset", "CS", "--data-dir", "val", "--model", "simple",
              "--backbone", "resnet50", "--backbone-para", BACKBONE_PARA,
              "--align-corner", "false", "--whole", "false", "--ms", "1",
              "--input-size", "48,64", "--restore-from", ckpt_path]
    rf_aot = os.path.join(work, "result_sliding_aot.txt")
    assert evaluate.main(common + [
        "--use-aot", "true",
        "--aot-path", os.path.join(tile_dir, "model.stablehlo"),
        "--result-file", rf_aot]) == 0
    rf_jit = os.path.join(work, "result_sliding_jit.txt")
    assert evaluate.main(common + ["--result-file", rf_jit]) == 0
    miou_aot = json.loads(open(rf_aot).read().splitlines()[1])["meanIU"]
    miou_jit = json.loads(open(rf_jit).read().splitlines()[1])["meanIU"]
    assert abs(miou_aot - miou_jit) < 0.02, (miou_aot, miou_jit)

    # sliding tiles under ms+flip: every tile still runs the one
    # canonical tile executable regardless of scale; at --ms 0.5 the
    # scaled image (36x48) is SMALLER than the tile (48,64), exercising
    # _predict_sliding_aot's pad-to-canonical-shape path.  mIoU matches
    # the jit sliding ms+flip protocol loop
    common_msf = [a for a in common]
    common_msf[common_msf.index("--ms") + 1] = "0.5,1"
    common_msf += ["--flip", "true"]
    rf_msf_aot = os.path.join(work, "result_sliding_msf_aot.txt")
    assert evaluate.main(common_msf + [
        "--use-aot", "true",
        "--aot-path", os.path.join(tile_dir, "model.stablehlo"),
        "--result-file", rf_msf_aot]) == 0
    rf_msf_jit = os.path.join(work, "result_sliding_msf_jit.txt")
    assert evaluate.main(common_msf + ["--result-file", rf_msf_jit]) == 0
    miou_msf_aot = json.loads(
        open(rf_msf_aot).read().splitlines()[1])["meanIU"]
    miou_msf_jit = json.loads(
        open(rf_msf_jit).read().splitlines()[1])["meanIU"]
    assert abs(miou_msf_aot - miou_msf_jit) < 0.02, (miou_msf_aot,
                                                     miou_msf_jit)

    # wrong-shape tile artifact is rejected via meta.json
    with pytest.raises(SystemExit):
        evaluate.main(common[:-4] + [
            "--input-size", "40,40", "--restore-from", ckpt_path,
            "--use-aot", "true",
            "--aot-path", os.path.join(tile_dir, "model.stablehlo")])

    # whole-image argmax serving cannot run the longsize/shortsize
    # logits-resize protocol (evaluate.py:340-343) — rejected up front
    with pytest.raises(SystemExit):
        evaluate.main([
            "--dataset", "CS", "--data-dir", "val", "--model", "simple",
            "--backbone", "resnet50", "--backbone-para", BACKBONE_PARA,
            "--align-corner", "false", "--whole", "true", "--ms", "1",
            "--input-size", "48,64", "--shortsize", "64",
            "--restore-from", ckpt_path, "--use-aot", "true",
            "--aot-path", os.path.join(tile_dir, "model.stablehlo")])

    # NCHW-input artifact (the totrt.py input layout, faster on TPU):
    # evaluate --use-aot reads meta.json and transposes the feed; mIoU
    # matches the NHWC artifact exactly on the f32 CPU path
    nchw_dir = os.path.join(work, "deploy_nchw")
    assert deploy.main([
        "--dataset", "CS", "--model", "simple", "--backbone", "resnet50",
        "--backbone-para", BACKBONE_PARA, "--align-corner", "false",
        "--input-size", "72,96", "--restore-from", ckpt_path,
        "--save-dir", nchw_dir, "--warmup", "1", "--iters", "2",
        "--dtype", "float32", "--input-format", "nchw"]) == 0
    meta = json.loads(open(os.path.join(nchw_dir, "meta.json")).read())
    assert meta["input_format"] == "nchw"
    assert meta["input"][1] == 3
    rf_nchw = os.path.join(work, "result_nchw.txt")
    assert evaluate.main([
        "--dataset", "CS", "--data-dir", "val", "--model", "simple",
        "--backbone", "resnet50", "--backbone-para", BACKBONE_PARA,
        "--align-corner", "false", "--whole", "true", "--ms", "1",
        "--input-size", "72,96", "--restore-from", ckpt_path,
        "--use-aot", "true",
        "--aot-path", os.path.join(nchw_dir, "model.stablehlo"),
        "--result-file", rf_nchw]) == 0
    miou_nchw = json.loads(open(rf_nchw).read().splitlines()[1])["meanIU"]
    miou_nhwc = json.loads(open(result_file).read().splitlines()[1])["meanIU"]
    assert abs(miou_nchw - miou_nhwc) < 1e-6, (miou_nchw, miou_nhwc)

    # tile serving requires NHWC artifacts (the extractor feeds NHWC)
    tile_meta = os.path.join(tile_dir, "meta.json")
    m = json.loads(open(tile_meta).read())
    m["input_format"] = "nchw"
    open(tile_meta, "w").write(json.dumps(m))
    with pytest.raises(SystemExit):
        evaluate.main(common + [
            "--use-aot", "true",
            "--aot-path", os.path.join(tile_dir, "model.stablehlo")])
    m["input_format"] = "nhwc"
    open(tile_meta, "w").write(json.dumps(m))

    # whole-image multi-scale + flip serving through a per-scale logits
    # artifact set (deploy --ms; the reference feeds its TRT engine to
    # predict_multiscale, evaluate.py:273-276 + :198-227)
    ms_dir = os.path.join(work, "deploy_ms")
    assert deploy.main([
        "--dataset", "CS", "--model", "simple", "--backbone", "resnet50",
        "--backbone-para", BACKBONE_PARA, "--align-corner", "false",
        "--input-size", "72,96", "--output", "logits", "--ms", "0.5,1",
        "--restore-from", ckpt_path, "--save-dir", ms_dir,
        "--warmup", "1", "--iters", "2", "--dtype", "float32"]) == 0
    ms_meta = json.loads(open(os.path.join(ms_dir, "meta.json")).read())
    assert sorted(ms_meta["ms"]) == ["0.5", "1.0"]
    assert ms_meta["ms"]["0.5"]["input"] == [1, 36, 48, 3]
    common_ms = ["--dataset", "CS", "--data-dir", "val", "--model",
                 "simple", "--backbone", "resnet50", "--backbone-para",
                 BACKBONE_PARA, "--align-corner", "false",
                 "--whole", "true", "--ms", "0.5,1", "--flip", "true",
                 "--restore-from", ckpt_path]
    rf_ms_aot = os.path.join(work, "result_ms_aot.txt")
    assert evaluate.main(common_ms + [
        "--use-aot", "true",
        "--aot-path", os.path.join(ms_dir, "model_s1.0.stablehlo"),
        "--result-file", rf_ms_aot]) == 0
    rf_ms_jit = os.path.join(work, "result_ms_jit.txt")
    assert evaluate.main(common_ms + ["--result-file", rf_ms_jit]) == 0
    miou_ms_aot = json.loads(
        open(rf_ms_aot).read().splitlines()[1])["meanIU"]
    miou_ms_jit = json.loads(
        open(rf_ms_jit).read().splitlines()[1])["meanIU"]
    # served executables are BN-folded (deploy params); the jit path
    # runs raw BN — same values up to float reassociation
    assert abs(miou_ms_aot - miou_ms_jit) < 0.02, (miou_ms_aot,
                                                   miou_ms_jit)

    # a scale outside the exported set is rejected up front
    with pytest.raises(SystemExit):
        evaluate.main(common_ms[:common_ms.index("--ms") + 1] + [
            "0.75,1", "--flip", "true", "--restore-from", ckpt_path,
            "--use-aot", "true",
            "--aot-path", os.path.join(ms_dir, "model_s1.0.stablehlo")])

    # a batch size the per-scale executables were not exported at is
    # rejected up front (the (h, w) dispatch never re-checks batch; a
    # mismatch would otherwise surface as jax.export's opaque aval
    # error on the first image)
    with pytest.raises(SystemExit, match="exported at batch"):
        evaluate.main(common_ms + [
            "--batch-size", "2", "--use-aot", "true",
            "--aot-path", os.path.join(ms_dir, "model_s1.0.stablehlo")])


def test_deploy_ms_flag_validation():
    """--ms static validation fires before the (expensive) model build:
    non-positive scales would produce zero/negative export shapes, and
    duplicate normalized keys ('1' vs '1.0') would silently collapse to
    one meta entry."""
    from dcfp_tpu.cli import deploy
    base = ["--dataset", "CS", "--model", "simple",
            "--backbone", "resnet50", "--output", "logits",
            "--save-dir", "/tmp/ms_validation_unused"]
    with pytest.raises(SystemExit, match="must be > 0"):
        deploy.main(base + ["--ms", "0,1"])
    with pytest.raises(SystemExit, match="must be > 0"):
        deploy.main(base + ["--ms=-0.5,1"])
    with pytest.raises(SystemExit, match="duplicate scale"):
        deploy.main(base + ["--ms", "1,1.0"])


def test_ctx_pipeline_minimal(tmp_path_factory):
    """The shifted-label dataset family through the CLIs (CTX: 59
    classes, label-1 remap, longsize resize — scripts/ctx recipe shape)."""
    import numpy as np
    from dcfp_tpu.data.synthetic import make_shifted_fixture
    root = str(tmp_path_factory.mktemp("ctx"))
    manifest = make_shifted_fixture(root, fmt="CTX", n_images=3,
                                    hw=(64, 80), num_classes=59)
    os.environ["DCFP_CTX_ROOT"] = root
    os.environ["DCFP_CTX_TRAIN_LIST"] = manifest
    os.environ["DCFP_CTX_VAL_LIST"] = manifest

    from dcfp_tpu.cli import evaluate, train
    work = str(tmp_path_factory.mktemp("ctxwork"))
    snap = os.path.join(work, "pt")
    assert train.main([
        "--dataset", "CTX", "--model", "simple", "--backbone", "resnet50",
        "--backbone-para", BACKBONE_PARA, "--input-size", "48,48",
        "--longsize", "64", "--batch-size", "2", "--num-steps", "2",
        "--save-pred-every", "2", "--loss-type", "ohem", "--deepsup",
        "true", "--random-scale", "--snapshot-dir", snap,
        "--num-devices", "1", "--log-every", "1",
        "--align-corner", "false"]) == 0
    ckpt_path = os.path.join(snap, "CTX_scenes_2.msgpack")
    assert os.path.exists(ckpt_path)

    result_file = os.path.join(work, "result.txt")
    assert evaluate.main([
        "--dataset", "CTX", "--data-dir", "val", "--model", "simple",
        "--backbone", "resnet50", "--backbone-para", BACKBONE_PARA,
        "--align-corner", "false", "--whole", "true", "--ms", "1",
        "--input-size", "48,48", "--longsize", "64",
        "--restore-from", ckpt_path, "--result-file", result_file]) == 0
    assert "meanIU" in open(result_file).read()


def test_hrnet_train_smoke(cs_fixture, tmp_path_factory):
    """HRNetV2 backbone through the train CLI (reference hrnet.py w48,
    scaled to w18-ish width for the test)."""
    from dcfp_tpu.cli import train
    snap = str(tmp_path_factory.mktemp("hr"))
    assert train.main([
        "--dataset", "CS", "--model", "simple", "--backbone", "hrnetv2w48",
        "--backbone-para", '{"width": 18}', "--input-size", "64,64",
        "--batch-size", "2", "--num-steps", "1", "--save-pred-every", "1",
        "--loss-type", "ce", "--deepsup", "true", "--align-corner", "false",
        "--num-devices", "1", "--snapshot-dir", snap]) == 0
    assert os.path.exists(os.path.join(snap, "CS_scenes_1.msgpack"))


def test_hrnet_full_pipeline(cs_fixture, tmp_path_factory):
    """The full DCFP recipe on the HRNetV2 backbone — the channel-coupling
    stress test (SURVEY: dense multi-branch fusion, dozens of coupled
    groups; reference hrnet.py + the same train/prune/finetune flow as
    test_full_pipeline): pretrain+EIC -> DCFP prune with round-trip
    verification -> finetune at pruned widths -> evaluate -> deploy."""
    work = str(tmp_path_factory.mktemp("hrwork"))
    snap = os.path.join(work, "pretrain")
    prune_dir = os.path.join(work, "prune")
    ft = os.path.join(work, "finetune")
    para = '{"width": 18}'

    from dcfp_tpu.cli import label_index
    assert label_index.main([
        "--dataset", "CS", "--save-dir", cs_fixture]) == 0

    from dcfp_tpu.cli import train
    assert train.main([
        "--dataset", "CS", "--model", "simple", "--backbone", "hrnetv2w48",
        "--backbone-para", para, "--input-size", "64,64",
        "--batch-size", "2", "--num-steps", "2", "--save-pred-every", "2",
        "--loss-type", "ce", "--deepsup", "true", "--prune-type", "dcfp",
        "--snapshot-dir", snap, "--num-devices", "1", "--log-every", "1",
        "--align-corner", "false"]) == 0
    pretrain_ckpt = os.path.join(snap, "CS_scenes_2.msgpack")
    score = os.path.join(snap, "score.msgpack")
    assert os.path.exists(pretrain_ckpt) and os.path.exists(score)

    # DCFP prune of the fusion lattice, with the CLI's pruned==masked
    # round-trip verification gate
    from dcfp_tpu.cli import prune
    assert prune.main([
        "--dataset", "CS", "--model", "simple", "--backbone", "hrnetv2w48",
        "--backbone-para", para, "--align-corner", "false",
        "--model-path", pretrain_ckpt, "--score-path", score,
        "--prune-ratio", "0.2", "--flops-input-size", "64,64",
        "--save-path", prune_dir]) == 0
    cfg_path = os.path.join(prune_dir, "channel_cfg.msgpack")
    pruned_path = os.path.join(prune_dir, "pruned.msgpack")
    assert os.path.exists(cfg_path) and os.path.exists(pruned_path)

    assert train.main([
        "--dataset", "CS", "--model", "simple", "--backbone", "hrnetv2w48",
        "--backbone-para", para, "--input-size", "64,64",
        "--batch-size", "2", "--num-steps", "1", "--save-pred-every", "1",
        "--loss-type", "gsrl", "--deepsup", "true", "--balance", "2",
        "--resample", "true",
        "--channel-cfg", cfg_path, "--resume", pruned_path,
        "--snapshot-dir", ft, "--num-devices", "1", "--log-every", "1",
        "--align-corner", "false", "--warmup", "1"]) == 0
    ft_ckpt = os.path.join(ft, "CS_scenes_1.msgpack")
    assert os.path.exists(ft_ckpt)

    from dcfp_tpu.cli import evaluate
    result_file = os.path.join(work, "result.txt")
    assert evaluate.main([
        "--dataset", "CS", "--data-dir", "val", "--model", "simple",
        "--backbone", "hrnetv2w48", "--backbone-para", para,
        "--align-corner", "false", "--whole", "true", "--ms", "1",
        "--input-size", "64,64", "--restore-from", ft_ckpt,
        "--channel-cfg", cfg_path, "--result-file", result_file]) == 0
    assert "meanIU" in open(result_file).read()

    from dcfp_tpu.cli import deploy
    deploy_dir = os.path.join(work, "deploy")
    assert deploy.main([
        "--dataset", "CS", "--model", "simple", "--backbone", "hrnetv2w48",
        "--backbone-para", para, "--align-corner", "false",
        "--input-size", "64,64", "--restore-from", ft_ckpt,
        "--channel-cfg", cfg_path, "--save-dir", deploy_dir,
        "--warmup", "1", "--iters", "2"]) == 0
    assert os.path.exists(os.path.join(deploy_dir, "model.stablehlo"))


def test_ade_longtail_pipeline(tmp_path_factory):
    """The .odgt dataset family (ADE20K: 150 classes, label-1 remap,
    shortsize resize) through label_index -> long-tail train (gsrl +
    balance 2 + resample, the scripts/ade/finetune.sh recipe shape) ->
    evaluate.  Reference: datasets/ADEdatasets.py, scripts/ade/*.sh."""
    from dcfp_tpu.data.synthetic import make_shifted_fixture
    root = str(tmp_path_factory.mktemp("ade"))
    manifest = make_shifted_fixture(root, fmt="ADE", n_images=3,
                                    hw=(64, 80), num_classes=150)
    os.environ["DCFP_ADE_ROOT"] = root
    os.environ["DCFP_ADE_TRAIN_LIST"] = manifest
    os.environ["DCFP_ADE_VAL_LIST"] = manifest

    from dcfp_tpu.cli import evaluate, label_index, train
    assert label_index.main([
        "--dataset", "ADE", "--save-dir", root]) == 0
    assert os.path.exists(os.path.join(root, "label_index_ADE.pkl"))

    work = str(tmp_path_factory.mktemp("adework"))
    snap = os.path.join(work, "ft")
    assert train.main([
        "--dataset", "ADE", "--model", "simple", "--backbone", "resnet50",
        "--backbone-para", BACKBONE_PARA, "--input-size", "48,48",
        "--shortsize", "64", "--batch-size", "2", "--num-steps", "2",
        "--save-pred-every", "2", "--loss-type", "gsrl", "--deepsup",
        "true", "--balance", "2", "--resample", "true", "--warmup", "1",
        "--random-scale", "--snapshot-dir", snap, "--num-devices", "1",
        "--log-every", "1", "--align-corner", "false"]) == 0
    ckpt_path = os.path.join(snap, "ADE_scenes_2.msgpack")
    assert os.path.exists(ckpt_path)

    result_file = os.path.join(work, "result.txt")
    assert evaluate.main([
        "--dataset", "ADE", "--data-dir", "val", "--model", "simple",
        "--backbone", "resnet50", "--backbone-para", BACKBONE_PARA,
        "--align-corner", "false", "--whole", "true", "--ms", "1",
        "--input-size", "48,48", "--shortsize", "64",
        "--restore-from", ckpt_path, "--result-file", result_file]) == 0
    assert "meanIU" in open(result_file).read()


def test_coco_pipeline_minimal(tmp_path_factory):
    """The name-list + _labelTrainIds dataset family (COCO-Stuff: 171
    classes) through train -> evaluate.  Reference:
    datasets/COCOdatasets.py, scripts/coco/*.sh."""
    from dcfp_tpu.data.synthetic import make_shifted_fixture
    root = str(tmp_path_factory.mktemp("coco"))
    manifest = make_shifted_fixture(root, fmt="COCO", n_images=3,
                                    hw=(64, 80), num_classes=171)
    os.environ["DCFP_COCO_ROOT"] = root
    os.environ["DCFP_COCO_TRAIN_LIST"] = manifest
    os.environ["DCFP_COCO_VAL_LIST"] = manifest

    from dcfp_tpu.cli import evaluate, train
    work = str(tmp_path_factory.mktemp("cocowork"))
    snap = os.path.join(work, "pt")
    assert train.main([
        "--dataset", "COCO", "--model", "simple", "--backbone", "resnet50",
        "--backbone-para", BACKBONE_PARA, "--input-size", "48,48",
        "--shortsize", "64", "--batch-size", "2", "--num-steps", "1",
        "--save-pred-every", "1", "--loss-type", "ce", "--deepsup",
        "true", "--snapshot-dir", snap, "--num-devices", "1",
        "--log-every", "1", "--align-corner", "false"]) == 0
    ckpt_path = os.path.join(snap, "COCO_scenes_1.msgpack")
    assert os.path.exists(ckpt_path)

    # boundary-IoU mode + saved prediction PNGs (reference
    # evaluate.py:343-357: mask_to_boundary on pred AND gt, palette save)
    result_file = os.path.join(work, "result.txt")
    assert evaluate.main([
        "--dataset", "COCO", "--data-dir", "val", "--model", "simple",
        "--backbone", "resnet50", "--backbone-para", BACKBONE_PARA,
        "--align-corner", "false", "--whole", "true", "--ms", "1",
        "--input-size", "48,48", "--shortsize", "64",
        "--iou-type", "boundary", "--dilation-ratio", "0.02",
        "--save-predict", "true",
        "--restore-from", ckpt_path, "--result-file", result_file]) == 0
    assert "meanIU" in open(result_file).read()
    predict_dir = os.path.join(snap, "predict")  # defaults next to ckpt
    assert os.path.isdir(predict_dir) and os.listdir(predict_dir)
