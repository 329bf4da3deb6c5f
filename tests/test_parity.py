"""Smoke test of the north-star parity harness (tools/parity.py): the
full tpu-side recipe runs end-to-end against a synthetic fixture
standing in for the dataset root, emits a parseable result.txt, and the
compare step applies the 0.3-mIoU bound in both directions.  Keeps the
harness validated while waiting for real data (docs/ROADMAP.md
"Accuracy parity")."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from dcfp_tpu.data.synthetic import make_cityscapes_fixture


@pytest.fixture(scope="module")
def parity_fixture(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("parity_cs"))
    train_lst = make_cityscapes_fixture(root, n_images=4, hw=(72, 96),
                                        split="train")
    val_lst = make_cityscapes_fixture(root, n_images=2, hw=(72, 96),
                                      split="val", seed=1)
    old = {k: os.environ.get(k) for k in
           ("DCFP_CS_ROOT", "DCFP_CS_TRAIN_LIST", "DCFP_CS_VAL_LIST")}
    os.environ["DCFP_CS_ROOT"] = root
    os.environ["DCFP_CS_TRAIN_LIST"] = train_lst
    os.environ["DCFP_CS_VAL_LIST"] = val_lst
    yield root
    for k, v in old.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v


def test_parity_harness_smoke(parity_fixture, tmp_path):
    import parity

    work = str(tmp_path / "work")
    rc = parity.main([
        "tpu", "--dataset", "CS", "--work-dir", work,
        "--steps-scale", "0.0001",  # 2-step phases
        "--model", "simple", "--backbone", "resnet50",
        "--backbone-para", '{"os": 32, "mg_unit": [1, 1, 1], '
                           '"inplanes": 64}',
        "--input-size", "48,48", "--batch-size", "2", "--skip-ms",
        "--num-devices", "2", "--prune-ratio", "0.3"])
    assert rc == 0
    result = os.path.join(work, "result.txt")
    blocks = parity.parse_result(result)
    assert len(blocks) == 1 and 0.0 <= blocks[0]["meanIU"] <= 1.0
    # the full pipeline left its artifacts
    assert os.path.exists(os.path.join(work, "prune",
                                       "channel_cfg.msgpack"))

    # reference-format result.txt (evaluate.py:386-394 writes the same
    # block layout ours does)
    near = tmp_path / "ref_near.txt"
    far = tmp_path / "ref_far.txt"
    for path, delta in ((near, 0.05), (far, 0.5)):
        with open(path, "w") as f:
            f.write("test with ref_ckpt.pth\n")
            f.write(json.dumps(
                {"meanIU": blocks[0]["meanIU"] + delta,
                 "IU_array": [0.1] * 19}) + "\n")
            f.write(json.dumps({"meanP": 0.5, "p": [0.5] * 19}) + "\n")
            f.write(json.dumps({"meanR": 0.5, "r": [0.5] * 19})
                    + " FPS: 1.00 img / s\n--------\n")
    assert parity.main(["compare", result, str(near),
                        "--tol", "0.3"]) == 0
    assert parity.main(["compare", result, str(far),
                        "--tol", "0.3"]) == 1

    # ref-commands prints the reference-side recipe
    assert parity.main(["ref-commands", "--dataset", "CS"]) == 0
