"""Shared CLI plumbing: flag groups with reference parity
(train.py:50-137 style names), JSON-para parsing, model/dataset
construction, logging setup.  Dispatch goes through explicit registries —
no ``eval()`` (reference train.py:192, datasets/__init__.py:7)."""

from __future__ import annotations

import argparse
import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from dcfp_tpu.data import paths
from dcfp_tpu.data.datasets import build_dataset
from dcfp_tpu.models.registry import build_model
from dcfp_tpu.utils.logger import get_logger

log = get_logger()


def str2bool(v: str) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "1"):
        return True
    if v.lower() in ("no", "false", "f", "0"):
        return False
    raise argparse.ArgumentTypeError(f"boolean value expected, got {v!r}")


def json_para(v: str) -> Dict[str, Any]:
    return json.loads(v) if v else {}


def parse_hw(v: str) -> Tuple[int, int]:
    h, w = map(int, v.split(","))
    return h, w


# ---------------------------------------------------------------------------
# flag groups
# ---------------------------------------------------------------------------

def add_model_args(p: argparse.ArgumentParser, default_model="deeplabv3",
                   default_backbone="resnet50"):
    p.add_argument("--model", type=str, default=default_model,
                   help="seg head: deeplabv3|deeplabv3p|psp|simple")
    p.add_argument("--backbone", type=str, default=default_backbone,
                   help="resnet50|resnet101|resnet152|hrnetv2w48")
    p.add_argument("--backbone-para", type=json_para, default={},
                   help='JSON, e.g. \'{"os":8,"mg_unit":[1,2,4]}\'')
    p.add_argument("--model-para", type=json_para, default={})
    p.add_argument("--align-corner", type=str2bool, default=True)
    p.add_argument("--channel-cfg", type=str, default=None,
                   help="path to channel_cfg.msgpack (pruned widths); "
                        "also accepts a reference channel_cfg.pth")


def add_data_args(p: argparse.ArgumentParser, split="train"):
    p.add_argument("--dataset", type=str, default="CS",
                   help="CS|CTX|ADE|COCO")
    p.add_argument("--data-dir", type=str, default=split,
                   help="dataset split (train/val/test)")
    p.add_argument("--ignore-label", type=int, default=255)
    p.add_argument("--input-size", type=str, default="769,769",
                   help="crop H,W")
    p.add_argument("--longsize", type=int, default=-1)
    p.add_argument("--shortsize", type=int, default=-1)
    p.add_argument("--data-para", type=json_para, default={})
    p.add_argument("--num-workers", type=int,
                   default=4 if split == "train" else 8,
                   help="decode worker processes when >1 (reference "
                        "DataLoader workers + defaults, engine.py:81-115, "
                        "train.py:64, evaluate.py:46); otherwise one "
                        "prefetch thread; single-core hosts auto-fall "
                        "back to the thread")


def add_train_data_args(p: argparse.ArgumentParser):
    p.add_argument("--random-mirror", action="store_true")
    p.add_argument("--random-brightness", action="store_true")
    p.add_argument("--random-scale", action="store_true")
    p.add_argument("--balance", type=int, default=0,
                   help="0 none | 1 inverse-freq | 2 effective-number")
    p.add_argument("--batch-size", type=int, default=8,
                   help="GLOBAL batch (sharded over the mesh)")


def add_optim_args(p: argparse.ArgumentParser):
    p.add_argument("--optim", type=str, default="sgd", help="sgd|adamw")
    p.add_argument("--learning-rate", type=float, default=1e-2)
    p.add_argument("--weight-decay", type=float, default=5e-4)
    p.add_argument("--power", type=float, default=0.9)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--betas", type=str, default="0.9,0.999")
    p.add_argument("--warmup", type=int, default=-1)
    p.add_argument("--no-decay", type=str, default=None,
                   help="comma-joined param-name keywords w/o weight decay")


def add_runtime_args(p: argparse.ArgumentParser):
    p.add_argument("--random-seed", type=int, default=304)
    p.add_argument("--snapshot-dir", type=str, default="snapshots")
    p.add_argument("--save-log", action="store_true")
    p.add_argument("--spatial-shards", type=int, default=1,
                   help="mesh 'spatial' axis size (H sharding)")
    p.add_argument("--num-devices", type=int, default=-1,
                   help="limit the mesh to the first N devices")
    p.add_argument("--dcn-slices", type=int, default=0,
                   help="multi-slice pods: number of slices; lays the "
                        "data axis out slice-major so only the batch "
                        "reduction crosses DCN")
    p.add_argument("--compute-dtype", type=str, default="float32",
                   help="float32|bfloat16 activations")
    add_distributed_args(p)


def add_distributed_args(p: argparse.ArgumentParser):
    """Multi-process (multi-host) runtime flags — the reference's
    torch.distributed.launch env rendezvous (engine.py:38-46) becomes
    jax.distributed.initialize; on TPU pods everything is discovered
    from the environment and only --distributed is needed."""
    p.add_argument("--distributed", type=str2bool, default=False,
                   help="call jax.distributed.initialize (multi-host "
                        "jobs; auto-discovery on TPU pods)")
    p.add_argument("--coordinator", type=str, default=None,
                   help="coordinator address host:port (manual CPU/GPU "
                        "bring-up only)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)


def maybe_initialize_distributed(args) -> None:
    """Bring up the multi-host runtime before any other jax call
    (no-op unless --distributed)."""
    if getattr(args, "distributed", False):
        from dcfp_tpu.parallel.distributed import initialize
        initialize(coordinator_address=args.coordinator,
                   num_processes=args.num_processes,
                   process_id=args.process_id)


# ---------------------------------------------------------------------------
# construction helpers
# ---------------------------------------------------------------------------

def build_dataset_from_args(args, split: Optional[str] = None, **extra):
    split = split or args.data_dir
    root, list_path = paths.data_dir(args.dataset, split)
    crop = parse_hw(args.input_size)
    kw: Dict[str, Any] = dict(
        split=split, crop_size=crop, ignore_label=args.ignore_label,
        longsize=args.longsize, shortsize=args.shortsize,
        seed=getattr(args, "random_seed", 0))
    if split == "train":
        kw.update(scale=getattr(args, "random_scale", False),
                  mirror=getattr(args, "random_mirror", False),
                  brightness=getattr(args, "random_brightness", False),
                  balance=getattr(args, "balance", 0))
    kw.update(args.data_para)
    kw.update(extra)
    return build_dataset(args.dataset, root, list_path, **kw)


def build_model_from_args(args, num_classes: int, deepsup: bool):
    return build_model(args.model, backbone=args.backbone,
                       backbone_para=args.backbone_para,
                       model_para=args.model_para,
                       num_classes=num_classes,
                       align_corner=args.align_corner, deepsup=deepsup)


def maybe_load_channel_cfg(args):
    if getattr(args, "channel_cfg", None):
        from dcfp_tpu.utils.checkpoint import load_channel_cfg
        cfg = load_channel_cfg(args.channel_cfg)
        log.info("loaded channel_cfg from %s (%d layers)",
                 args.channel_cfg, len(cfg))
        return cfg
    return None


def setup_dirs_and_logging(args) -> None:
    os.makedirs(args.snapshot_dir, exist_ok=True)
    if getattr(args, "save_log", False):
        from dcfp_tpu.utils.logger import get_logger as _gl
        _gl(log_file=os.path.join(args.snapshot_dir, "train.log"))


def compute_dtype(args):
    import jax.numpy as jnp
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
            "bf16": jnp.bfloat16}[args.compute_dtype]
