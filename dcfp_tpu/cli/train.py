"""Training entry point (reference train.py CLI parity).

Pretrain:  accumulate DCFP EIC scores while training full-width
           (``--prune-type dcfp``), export ``score.msgpack`` at the end
           (reference train.py:215-216, 284-288).
Finetune:  rebuild at pruned widths from ``--channel-cfg`` and resume the
           pruned weights (reference train.py:200-210), typically with
           ``--loss-type gsrl --balance 2 --resample`` for long-tail.

SPMD runtime: one process drives a (data x spatial) device mesh; the
global batch is sharded at device_put, gradients/BN moments reduce via
the collectives XLA inserts — no torch.distributed.launch equivalent is
needed (reference engine.py:38-71 becomes ~5 lines of mesh setup).

Example (Cityscapes pretrain, matches scripts/cs/pretrain.sh):
  python -m dcfp_tpu.cli.train --dataset CS --model deeplabv3 \\
      --backbone resnet50 --backbone-para '{"os":8,"mg_unit":[1,2,4]}' \\
      --input-size 769,769 --batch-size 8 --num-steps 4000 \\
      --random-mirror --random-scale --random-brightness \\
      --loss-type ce --deepsup true --prune-type dcfp \\
      --snapshot-dir snapshots/cs_pretrain
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from dcfp_tpu.cli.common import (add_data_args, add_model_args,
                                 add_optim_args, add_runtime_args,
                                 add_train_data_args,
                                 build_dataset_from_args,
                                 build_model_from_args, compute_dtype,
                                 maybe_initialize_distributed,
                                 maybe_load_channel_cfg,
                                 setup_dirs_and_logging, str2bool)
from dcfp_tpu.utils.logger import get_logger

log = get_logger()


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("dcfp_tpu train")
    add_data_args(p, split="train")
    add_train_data_args(p)
    add_model_args(p)
    add_optim_args(p)
    add_runtime_args(p)
    p.add_argument("--num-steps", type=int, default=40000)
    p.add_argument("--start-iters", type=int, default=0)
    p.add_argument("--resume", type=str, default=None,
                   help="snapshot/pruned .msgpack to load")
    p.add_argument("--resume-full-state", type=str2bool, default=False,
                   help="restore optimizer/EIC state too (exact resume)")
    p.add_argument("--save-pred-every", type=int, default=10000)
    p.add_argument("--save-steps", type=int, default=0,
                   help="snapshots only at/after this step")
    p.add_argument("--deepsup", type=str2bool, default=True)
    p.add_argument("--loss-type", type=str, default="ce",
                   help="ce|ohem|gsrl or comma-joined")
    p.add_argument("--loss-para", type=lambda s: __import__("json").loads(s)
                   if s else {}, default={})
    p.add_argument("--prune-type", type=str, default=None,
                   help="'dcfp' accumulates EIC during training")
    p.add_argument("--resample", type=str2bool, default=False,
                   help="class-uniform long-tail resampling")
    p.add_argument("--pretrained", type=str, default=None,
                   help="torch backbone checkpoint (.pth) to convert; "
                        "'auto' resolves via the path registry")
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--remat", type=int, default=0,
                   help="split the forward into N jax.checkpoint "
                        "segments: backward activation memory drops "
                        "~Nx for ~1/3 extra FLOPs (0/1 = off). Use "
                        "when batch x crop exceeds chip HBM")
    p.add_argument("--metrics-file", type=str, default=None,
                   help="append JSONL training metrics (one line per log "
                        "window) for external dashboards")
    p.add_argument("--xla-options", type=str, default=None,
                   help="comma-separated XLA compiler options for the "
                        "train-step compile, e.g. "
                        "xla_tpu_scoped_vmem_limit_kib=49152 (~2% "
                        "measured on the CS recipe; also via "
                        "DCFP_XLA_OPTIONS env)")
    p.add_argument("--compact-batches", type=str2bool, default=True,
                   help="ship uint8 batches and normalize / expand "
                        "weight maps on device (~6x less host->device "
                        "traffic); false = classic f32 host batches")
    return p


def _resolve_pretrained(args, graph, params, bn_state):
    """Convert + merge an ImageNet torch backbone checkpoint
    (reference networks/backbone/resnet.py:172-187 build_resnet)."""
    from dcfp_tpu.data import paths
    from dcfp_tpu.models.convert import merge_pretrained_backbone
    path = args.pretrained
    if path == "auto":
        path = paths.pretrained_dir(args.backbone)
    if not path or not os.path.exists(path):
        if path:
            log.warning("pretrained checkpoint %s not found; random init",
                        path)
        return params, bn_state
    from dcfp_tpu.utils.checkpoint import _torch_load
    sd = _torch_load(path)
    params, bn_state = merge_pretrained_backbone(graph, sd, params,
                                                 bn_state)
    log.info("merged pretrained backbone from %s", path)
    return params, bn_state


def device_batches(loader, mesh, spatial: bool):
    """Host batches -> mesh-sharded device batches (drops img_meta).
    Compact batches (uint8 img + weight_class vectors, the default) ship
    as-is — normalization / weight expansion happen inside the train
    step (engine/trainer.expand_batch); classic f32 batches are widened
    here like before."""
    from dcfp_tpu.parallel.mesh import shard_batch
    for batch in loader:
        out = {"img": batch["img"]}
        if batch["img"].dtype != np.uint8:
            out["img"] = batch["img"].astype(np.float32)
        label = batch["label"]
        if isinstance(label, dict) and "weight_class" not in label:
            label = {"ori": label["ori"].astype(np.int32),
                     "weight": label["weight"].astype(np.float32)}
        elif not isinstance(label, dict) and label.dtype != np.uint8:
            label = label.astype(np.int32)
        out["label"] = label
        if "pad" in batch:
            out["pad"] = batch["pad"]
        yield shard_batch(mesh, out, spatial)


def main(argv=None) -> int:
    parser = get_parser()
    args = parser.parse_args(argv)
    # the reference spells resampling --data-para '{"resample":true}'
    # (datasets pass-through); honor both spellings — without this the
    # build_dataset extra kwarg would silently override data_para
    args.resample = bool(args.resample
                         or args.data_para.get("resample", False))
    if args.balance == 2 and not args.resample:
        parser.error("--balance 2 (effective-number weights) needs the "
                     "sampled class id, which only --resample true "
                     "provides (reference datasets/Base.py:82)")
    if args.xla_options:
        # make_train_step defaults its compiler_options from this env var
        os.environ["DCFP_XLA_OPTIONS"] = args.xla_options
    maybe_initialize_distributed(args)  # before any other jax call
    setup_dirs_and_logging(args)
    np.random.seed(args.random_seed)

    from dcfp_tpu.data.loader import TrainLoader
    from dcfp_tpu.engine.optim import build_optimizer, poly_warmup_schedule
    from dcfp_tpu.engine.trainer import TrainLoop, create_train_state
    from dcfp_tpu.graph.apply import init_graph
    from dcfp_tpu.losses.criteria import build_criterions
    from dcfp_tpu.parallel.mesh import create_mesh, replicate_tree
    from dcfp_tpu.prune.pruner import apply_channel_cfg
    from dcfp_tpu.utils import checkpoint as ckpt

    dataset = build_dataset_from_args(args, "train", resample=args.resample,
                                      compact=args.compact_batches)
    # --batch-size is GLOBAL (reference engine.py:81: batch //= world);
    # each process loads its rank's shard of the epoch permutation and
    # decodes with --num-workers processes
    n_proc, rank = jax.process_count(), jax.process_index()
    if args.batch_size % n_proc:
        parser.error(f"--batch-size {args.batch_size} not divisible by "
                     f"{n_proc} processes")
    loader = TrainLoader(dataset, args.batch_size // n_proc,
                         seed=args.random_seed,
                         num_workers=args.num_workers,
                         rank=rank, world=n_proc)

    criterion = build_criterions(
        args.loss_type, ignore_label=dataset.ignore_label,
        class_weights=dataset.class_weights, loss_para=dict(args.loss_para))

    model = build_model_from_args(args, dataset.num_classes, args.deepsup)
    graph = model.graph
    channel_cfg = maybe_load_channel_cfg(args)
    if channel_cfg is not None:  # finetune at pruned widths
        graph = apply_channel_cfg(graph, channel_cfg)
        model.graph = graph

    params, bn_state = init_graph(graph, jax.random.key(args.random_seed))
    if args.pretrained and channel_cfg is None:
        params, bn_state = _resolve_pretrained(args, graph, params,
                                               bn_state)

    tx = build_optimizer(
        optim=args.optim, learning_rate=args.learning_rate,
        momentum=args.momentum, weight_decay=args.weight_decay,
        num_steps=args.num_steps, power=args.power, warmup=args.warmup,
        betas=args.betas, no_decay=args.no_decay, params=params)
    schedule = poly_warmup_schedule(args.learning_rate, args.num_steps,
                                    args.power, warmup=args.warmup)

    state = create_train_state(model, params, bn_state, tx,
                               prune_type=args.prune_type)
    start_step = args.start_iters
    if args.resume:
        if args.resume_full_state:
            state = ckpt.load_train_state(args.resume, state)
            start_step = int(state.step)
            log.info("resumed full state from %s at step %d", args.resume,
                     start_step)
        else:
            p, b = ckpt.load_params_non_strict(args.resume, state.params,
                                               state.bn_state)
            state = state.replace(params=p, bn_state=b,
                                  step=jnp.asarray(start_step, jnp.int32))
            log.info("loaded weights from %s", args.resume)

    spatial = args.spatial_shards
    if args.dcn_slices > 1:
        from dcfp_tpu.parallel.distributed import create_pod_mesh
        mesh = create_pod_mesh(n_spatial=spatial,
                               dcn_data_parallel=args.dcn_slices)
        n_dev = mesh.devices.size
    else:
        devices = jax.devices()
        if args.num_devices > 0:
            devices = devices[:args.num_devices]
        n_dev = len(devices)
        mesh = create_mesh(n_data=n_dev // spatial, n_spatial=spatial,
                           devices=devices)
    state = replicate_tree(mesh, state)
    log.info("mesh: %d data x %d spatial on %d %s device(s) across %d "
             "process(es); global batch %d", n_dev // spatial, spatial,
             n_dev, jax.default_backend(), n_proc, args.batch_size)

    def snapshot_hook(st, step):
        if jax.process_index() != 0:  # rank-0 snapshots (train.py:278)
            return
        path = os.path.join(args.snapshot_dir,
                            f"{args.dataset}_scenes_{step}.msgpack")
        ckpt.save_train_state(path, st)

    loop = TrainLoop(model=model, criterion=criterion, tx=tx,
                     num_steps=args.num_steps, lr_schedule=schedule,
                     save_pred_every=args.save_pred_every,
                     save_steps=args.save_steps,
                     snapshot_hook=snapshot_hook,
                     log_every=args.log_every,
                     prune_type=args.prune_type,
                     compute_dtype=compute_dtype(args),
                     normalize=(dataset.mean, dataset.std),
                     ignore_label=dataset.ignore_label,
                     # preemption grace: snapshot + clean stop; on
                     # multi-process pods the stop is a cross-rank
                     # consensus at log boundaries so no rank deserts
                     # the SPMD program mid-collective
                     handle_signals=True,
                     metrics_file=args.metrics_file,
                     remat_segments=args.remat)

    batches = device_batches(iter(loader), mesh, spatial > 1)
    try:
        state = loop.run(state, batches, jax.random.key(args.random_seed),
                         start_step=start_step)
    finally:
        loader.stop()

    if (args.prune_type == "dcfp" and state.eic is not None
            and jax.process_index() == 0):
        score_path = os.path.join(args.snapshot_dir, "score.msgpack")
        ckpt.save_eic(score_path, jax.tree.map(np.asarray, state.eic))
        log.info("exported EIC scores to %s", score_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
