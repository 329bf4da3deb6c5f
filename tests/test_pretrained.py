"""--pretrained backbone conversion through the train CLI (regression:
the converted weights must actually land in the train state)."""

import json
import os

import numpy as np
import pytest

from dcfp_tpu.data.synthetic import make_cityscapes_fixture

BACKBONE_PARA = '{"os": 32, "mg_unit": [1, 1, 1], "inplanes": 64}'


def _fake_imagenet_backbone(graph, rng, path):
    """torch-format state dict keyed WITHOUT the 'backbone.' prefix
    (reference ImageNet checkpoints, networks/backbone/resnet.py:185)."""
    import torch
    sd = {}
    for node in graph.toposorted():
        if not node.name.startswith("backbone."):
            continue
        key = node.name[len("backbone."):]
        if node.op == "conv":
            a = node.attrs
            w = rng.standard_normal(
                (a["out_ch"], a["in_ch"] // a["groups"], a["kernel"],
                 a["kernel"])).astype(np.float32)
            sd[f"{key}.weight"] = torch.from_numpy(w)
        elif node.op == "bn":
            ch = node.attrs["channels"]
            sd[f"{key}.weight"] = torch.from_numpy(
                rng.uniform(0.5, 1.5, ch).astype(np.float32))
            sd[f"{key}.bias"] = torch.from_numpy(
                rng.standard_normal(ch).astype(np.float32))
            sd[f"{key}.running_mean"] = torch.from_numpy(
                rng.standard_normal(ch).astype(np.float32))
            sd[f"{key}.running_var"] = torch.from_numpy(
                rng.uniform(0.5, 1.5, ch).astype(np.float32))
    torch.save(sd, path)
    return sd


def test_train_cli_loads_pretrained_backbone(tmp_path, rng):
    import torch

    from dcfp_tpu.cli import train
    from dcfp_tpu.models.registry import build_model
    from dcfp_tpu.utils import checkpoint as ckpt

    root = str(tmp_path / "cs")
    manifest = make_cityscapes_fixture(root, n_images=2, hw=(64, 80))
    os.environ["DCFP_CS_ROOT"] = root
    os.environ["DCFP_CS_TRAIN_LIST"] = manifest

    model = build_model("simple", backbone="resnet50",
                        backbone_para=json.loads(BACKBONE_PARA),
                        num_classes=19, align_corner=False, deepsup=True)
    pth = str(tmp_path / "imagenet.pth")
    sd = _fake_imagenet_backbone(model.graph, rng, pth)

    snap = str(tmp_path / "snap")
    assert train.main([
        "--dataset", "CS", "--model", "simple", "--backbone", "resnet50",
        "--backbone-para", BACKBONE_PARA, "--input-size", "48,48",
        "--batch-size", "2", "--num-steps", "1", "--save-pred-every", "1",
        "--loss-type", "ce", "--deepsup", "true", "--align-corner", "false",
        "--learning-rate", "0.0",  # freeze: snapshot == converted weights
        "--weight-decay", "0.0", "--momentum", "0.0",
        "--pretrained", pth, "--num-devices", "1",
        "--snapshot-dir", snap]) == 0

    raw = ckpt.load_pytree(os.path.join(snap, "CS_scenes_1.msgpack"))
    got = np.asarray(raw["params"]["backbone.layer1.0.conv1"]["kernel"])
    want = np.transpose(
        sd["layer1.0.conv1.weight"].numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    got_var = np.asarray(raw["bn_state"]["backbone.layer1.0.bn1"]["var"])
    # BN running stats update in the single train step, but from the
    # converted starting point — the var must differ from the init value 1
    assert not np.allclose(got_var, 1.0)
