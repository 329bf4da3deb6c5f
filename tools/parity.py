"""North-star parity harness: run the dcfp_tpu recipe for a dataset and
diff ``result.txt`` mIoU against a reference-side run.

The accuracy north star (BASELINE.md) — pruned model within 0.3 mIoU of
the reference at equal FLOPs — needs real datasets, which this sandbox
does not mount.  This tool makes the comparison a one-command affair the
hour data appears (point ``DCFP_DATA_ROOT`` at the dataset root):

  python tools/parity.py tpu --dataset CS          # our side (TPU host)
  python tools/parity.py ref-commands --dataset CS # commands for the
                                                   # reference side (GPU
                                                   # host, torch 1.10)
  python tools/parity.py compare ours/result.txt ref/result.txt

``tpu`` drives the full pipeline with the recipe hyperparameters of
scripts/<ds>/{pretrain,prune,finetune}.sh (themselves flag-parity
audited against the reference's scripts): label_index -> pretrain+EIC ->
prune -> finetune -> ss + ms eval, appending both protocols to one
``result.txt``.  ``compare`` pairs the result blocks by protocol tag and
fails if any |mIoU difference| exceeds ``--tol`` (default: the 0.3
north-star bound).

Smoke-scalable: ``--steps-scale``/shape/model overrides shrink the run
to synthetic-fixture size (tests/test_parity.py exercises the whole
harness that way), so the harness itself stays validated while waiting
for data.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Recipe hyperparameters, transcribed from scripts/<ds>/*.sh (which are
# recipe-parity with the reference's scripts/<ds>/*.sh).
RECIPES = {
    "CS": dict(
        model="deeplabv3", backbone="resnet50",
        backbone_para='{"os":8,"mg_unit":[1,2,4],"inplanes":128}',
        input_size="769,769", align_corner="true",
        longsize=-1, shortsize=-1, batch=8,
        pre=dict(lr=0.01, wd=0.0005, warmup=-1, steps=4000),
        prune_ratio=0.6,
        ft=dict(lr=0.01, wd=0.001, warmup=1000, steps=36000),
        ms="0.5,0.75,1,1.25,1.5,1.75", ref_gpus=4),
    "ADE": dict(
        model="deeplabv3", backbone="resnet50",
        backbone_para='{"mg_unit":[1,1,1]}',
        input_size="512,512", align_corner="false",
        longsize=-1, shortsize=512, batch=16,
        pre=dict(lr=0.01, wd=0.0001, warmup=-1, steps=16000),
        prune_ratio=0.6,
        ft=dict(lr=0.01, wd=0.0005, warmup=2000, steps=144000),
        ms="0.5,0.75,1,1.25,1.5,1.75", ref_gpus=8),
    "CTX": dict(
        model="deeplabv3", backbone="resnet50",
        backbone_para='{"os":8,"mg_unit":[1,1,1],"inplanes":128}',
        input_size="480,480", align_corner="false",
        longsize=512, shortsize=-1, batch=16,
        pre=dict(lr=0.001, wd=0.0001, warmup=-1, steps=3000),
        prune_ratio=0.6,
        ft=dict(lr=0.001, wd=0.0005, warmup=1000, steps=27000),
        ms="0.5,0.75,1,1.25,1.5,1.75", ref_gpus=4),
    "COCO": dict(
        model="deeplabv3", backbone="resnet50",
        backbone_para='{"mg_unit":[1,1,1]}',
        input_size="512,512", align_corner="false",
        longsize=-1, shortsize=512, batch=16,
        pre=dict(lr=0.001, wd=0.0001, warmup=-1, steps=6000),
        prune_ratio=0.6,
        ft=dict(lr=0.001, wd=0.0005, warmup=1000, steps=54000),
        ms="0.5,0.75,1,1.25,1.5,1.75", ref_gpus=8),
}


def _run_cli(name: str, argv: list) -> None:
    """Run a dcfp_tpu CLI main in-process (keeps jit caches warm across
    stages; the CLIs are plain argv mains)."""
    import importlib
    print(f"[parity] {name} {' '.join(argv)}", flush=True)
    mod = importlib.import_module(f"dcfp_tpu.cli.{name}")
    rc = mod.main(argv)
    if rc != 0:
        raise SystemExit(f"{name} failed with rc={rc}")


def cmd_tpu(args) -> int:
    r = RECIPES[args.dataset]
    scale = args.steps_scale
    model = args.model or r["model"]
    backbone = args.backbone or r["backbone"]
    bpara = args.backbone_para or r["backbone_para"]
    input_size = args.input_size or r["input_size"]
    batch = args.batch_size or r["batch"]
    work = args.work_dir or os.path.join("ckpt",
                                         f"parity_{args.dataset}")
    pre_dir = os.path.join(work, "pretrain")
    prune_dir = os.path.join(work, "prune")
    ft_dir = os.path.join(work, "finetune")
    result = os.path.join(work, "result.txt")
    os.makedirs(work, exist_ok=True)

    def steps(n):
        return max(int(n * scale), 2)

    pre_steps, ft_steps = steps(r["pre"]["steps"]), steps(r["ft"]["steps"])
    ft_warmup = (int(r["ft"]["warmup"] * scale)
                 if r["ft"]["warmup"] > 0 else r["ft"]["warmup"])
    base = ["--dataset", args.dataset, "--model", model,
            "--backbone", backbone, "--backbone-para", bpara,
            "--align-corner", r["align_corner"]]
    devs = (["--num-devices", str(args.num_devices)]
            if args.num_devices > 0 else [])
    size = ["--input-size", input_size,
            "--longsize", str(r["longsize"]),
            "--shortsize", str(r["shortsize"])]

    # resample index (reference label_index.py; consumed by --resample).
    # The dataset loader reads it from the LIST file's directory
    # (data/datasets.py: osp.dirname(list_path)), so write it there —
    # not the dataset root, which only coincides with it in fixtures.
    from dcfp_tpu.data.paths import data_dir
    _, list_path = data_dir(args.dataset, "train")
    pkl_dir = os.path.dirname(os.path.abspath(list_path))
    pkl = os.path.join(pkl_dir, f"label_index_{args.dataset}.pkl")
    if not os.path.exists(pkl):
        _run_cli("label_index",
                 ["--dataset", args.dataset, "--save-dir", pkl_dir])

    _run_cli("train", base + size + devs + [
        "--balance", "0", "--loss-type", "ce",
        "--loss-para", '{"ds_weight":0.4}', "--deepsup", "true",
        "--random-mirror", "--random-brightness", "--random-scale",
        "--optim", "sgd", "--learning-rate", str(r["pre"]["lr"]),
        "--warmup", str(r["pre"]["warmup"]),
        "--weight-decay", str(r["pre"]["wd"]),
        "--num-steps", str(pre_steps), "--batch-size", str(batch),
        "--random-seed", "42", "--snapshot-dir", pre_dir,
        "--save-pred-every", str(pre_steps), "--prune-type", "dcfp"]
        + (["--pretrained", args.pretrained]
           if args.pretrained not in (None, "none") else []))
    pre_ckpt = os.path.join(pre_dir,
                            f"{args.dataset}_scenes_{pre_steps}.msgpack")

    prune_ratio = (args.prune_ratio if args.prune_ratio is not None
                   else r["prune_ratio"])
    _run_cli("prune", base + [
        "--prune-ratio", str(prune_ratio), "--save-path", prune_dir,
        "--model-path", pre_ckpt,
        "--score-path", os.path.join(pre_dir, "score.msgpack")])
    cfg = os.path.join(prune_dir, "channel_cfg.msgpack")

    _run_cli("train", base + size + devs + [
        "--balance", "2", "--resample", "true", "--loss-type", "gsrl",
        "--loss-para", '{"ds_weight":0.4}', "--deepsup", "true",
        "--random-mirror", "--random-brightness", "--random-scale",
        "--optim", "sgd", "--learning-rate", str(r["ft"]["lr"]),
        "--warmup", str(ft_warmup),
        "--weight-decay", str(r["ft"]["wd"]),
        "--num-steps", str(ft_steps), "--batch-size", str(batch),
        "--random-seed", "42", "--snapshot-dir", ft_dir,
        "--save-pred-every", str(ft_steps),
        "--resume", os.path.join(prune_dir, "pruned.msgpack"),
        "--channel-cfg", cfg])
    ft_ckpt = os.path.join(ft_dir,
                           f"{args.dataset}_scenes_{ft_steps}.msgpack")

    # evaluate APPENDS to result.txt (engine/evaluator._finalize_eval
    # opens 'a', matching the reference) — rotate any blocks from a
    # previous parity run out of the way so `compare` judges THIS run,
    # not stale mIoU from an earlier invocation of the same work dir.
    if os.path.exists(result):
        # unique rotation target: re-running the harness in one work dir
        # must not silently discard an earlier run's mIoU blocks
        n, prev = 0, result + ".prev"
        while os.path.exists(prev):
            n += 1
            prev = f"{result}.prev.{n}"
        os.replace(result, prev)
        print(f"[parity] rotated stale {result} -> {prev}", flush=True)

    eval_base = base + size + [
        "--data-dir", "val", "--batch-size", "1",
        "--restore-from", ft_ckpt, "--channel-cfg", cfg,
        "--result-file", result]
    _run_cli("evaluate", eval_base + ["--whole", "true", "--ms", "1",
                                      "--flip", "false"])
    if not args.skip_ms:
        _run_cli("evaluate", eval_base + ["--whole", "true",
                                          "--ms", r["ms"],
                                          "--flip", "true"])
    print(json.dumps({"result_file": result,
                      "mious": parse_result(result)}))
    return 0


def cmd_ref_commands(args) -> int:
    """Print the reference-side commands for the same recipe (GPU host
    with the reference's environment, torch 1.10 + TensorRT — see
    /root/reference/README.md).  The reference's own scripts encode the
    hyperparameters; its evaluate.py appends the same result.txt format
    ours does (evaluate.py:386-394)."""
    ds = args.dataset.lower()
    n = RECIPES[args.dataset]["ref_gpus"]
    print(f"""# reference side ({args.dataset}): run on a {n}-GPU host from the
# reference repo root (datasets resolved by its mypath.py)
bash scripts/{ds}/pretrain.sh
bash scripts/{ds}/prune.sh
bash scripts/{ds}/finetune.sh   # ends with ss + ms evaluate runs
# result file: <finetune snapshot dir>/result.txt
# then, back on the TPU host:
#   python tools/parity.py compare <ours>/result.txt <ref>/result.txt""")
    return 0


def parse_result(path: str):
    """Parse a result.txt (ours or the reference's — same format:
    'test with <tag>' header + meanIU/meanP/meanR JSON lines per block,
    reference evaluate.py:386-394)."""
    blocks = []
    tag = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("test with "):
                tag = line[len("test with "):]
            elif line.startswith("{") and '"meanIU"' in line:
                js = json.loads(line)
                blocks.append({"tag": tag, "meanIU": js["meanIU"]})
    return blocks


def cmd_compare(args) -> int:
    ours = parse_result(args.ours)
    ref = parse_result(args.ref)
    if not ours or not ref:
        raise SystemExit(f"no result blocks parsed "
                         f"(ours={len(ours)}, ref={len(ref)})")
    if args.ours_block is not None or args.ref_block is not None:
        ours = [ours[args.ours_block if args.ours_block is not None
                     else -1]]
        ref = [ref[args.ref_block if args.ref_block is not None else -1]]
    n = min(len(ours), len(ref))
    if len(ours) != len(ref):
        # The reference tags blocks with the checkpoint path only
        # (evaluate.py:387) — protocol (ss vs ms) is not recoverable
        # from tags, but recipes append ss FIRST then ms, so aligning
        # from the start pairs like with like (e.g. an ours run with
        # --skip-ms still pairs its ss block with the reference's ss,
        # not its ms).  Use --ours-block/--ref-block to pair manually.
        print(f"[parity] block counts differ (ours={len(ours)}, "
              f"ref={len(ref)}); comparing the FIRST {n} of each "
              f"(recipe order: ss, then ms) — check the printed tags, "
              f"or pick blocks with --ours-block/--ref-block")
    ok = True
    for o, r in zip(ours[:n], ref[:n]):
        diff = o["meanIU"] - r["meanIU"]
        status = "OK" if abs(diff) <= args.tol else "FAIL"
        if abs(diff) > args.tol:
            ok = False
        print(f"[{status}] ours={o['meanIU']:.4f} ref={r['meanIU']:.4f} "
              f"diff={diff:+.4f} (tol {args.tol})\n"
              f"       ours tag: {o['tag']}\n"
              f"       ref  tag: {r['tag']}")
    return 0 if ok else 1


def main(argv=None) -> int:
    p = argparse.ArgumentParser("dcfp_tpu parity harness")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("tpu", help="run our side of the recipe")
    t.add_argument("--dataset", choices=sorted(RECIPES), default="CS")
    t.add_argument("--work-dir", default=None)
    t.add_argument("--steps-scale", type=float, default=1.0,
                   help="scale every schedule length (smoke: e.g. 0.001)")
    t.add_argument("--model", default=None)
    t.add_argument("--backbone", default=None)
    t.add_argument("--backbone-para", default=None)
    t.add_argument("--input-size", default=None)
    t.add_argument("--batch-size", type=int, default=None)
    t.add_argument("--pretrained", default=None,
                   help="'auto' to load ImageNet backbone weights "
                        "(recipe default needs pretrained_models/); "
                        "'none' for random init (smoke)")
    t.add_argument("--skip-ms", action="store_true",
                   help="skip the multi-scale+flip eval run")
    t.add_argument("--prune-ratio", type=float, default=None,
                   help="override the recipe prune ratio (smoke: tiny "
                        "models can't reach 40%% FLOPs past the "
                        "layer_keep floors)")
    t.add_argument("--num-devices", type=int, default=-1,
                   help="train over this many devices (-1 = all; the "
                        "smoke test uses 2 so a tiny batch still shards)")

    r = sub.add_parser("ref-commands",
                       help="print the reference-side commands")
    r.add_argument("--dataset", choices=sorted(RECIPES), default="CS")

    c = sub.add_parser("compare", help="diff two result.txt files")
    c.add_argument("ours")
    c.add_argument("ref")
    c.add_argument("--tol", type=float, default=0.3,
                   help="north-star bound (BASELINE.md): |mIoU diff|")
    c.add_argument("--ours-block", type=int, default=None,
                   help="compare only this block index of ours (0-based; "
                        "negative ok) against --ref-block (default -1)")
    c.add_argument("--ref-block", type=int, default=None,
                   help="compare only this block index of the reference "
                        "result.txt (0-based; negative ok)")

    args = p.parse_args(argv)
    return {"tpu": cmd_tpu, "ref-commands": cmd_ref_commands,
            "compare": cmd_compare}[args.cmd](args)


if __name__ == "__main__":
    raise SystemExit(main())
