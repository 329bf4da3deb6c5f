"""Training engine: one jitted SPMD train step + the outer loop.

Replaces the reference hot loop (train.py:239-288): forward + loss + DDP
grad all-reduce + EIC hook + optimizer step become a single compiled XLA
program per step.  LR scheduling is a pure function of the step counter
inside the optax chain (no param-group mutation), the NaN guard
(train.py:260) is a once-per-log-window host check of device-resident
losses (per-step fetches would serialize dispatch), and the EIC EMA
(pruners/dcfp_pruner.py:15-20) is carried functional state.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from dcfp_tpu.engine.optim import build_optimizer, poly_warmup_schedule
from dcfp_tpu.graph.apply import graph_apply
from dcfp_tpu.losses.criteria import Criterion
from dcfp_tpu.models.heads import SegModel
from dcfp_tpu.ops.resize import resize_bilinear_cf
from dcfp_tpu.prune.eic import EicState, eic_update, init_eic
from dcfp_tpu.utils.logger import get_logger

log = get_logger()


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    bn_state: Any
    opt_state: Any
    eic: Optional[EicState]


def create_train_state(model: SegModel, params, bn_state, tx,
                       prune_type: Optional[str] = None) -> TrainState:
    eic = init_eic(model.graph) if prune_type == "dcfp" else None
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      bn_state=bn_state, opt_state=tx.init(params), eic=eic)


def expand_batch(batch, normalize, num_classes: int, ignore_label: int,
                 compute_dtype):
    """Expand a compact batch (data/base.py ``compact=True``) on device:
    uint8 RGB images normalize to the classic f32 values (with the
    reference's post-normalize zero padding reproduced from the ``pad``
    validity triple), uint8 labels widen to int32, and per-image class
    weight vectors gather into the per-pixel GSRL weight map.  Classic
    f32 batches pass through unchanged.  Keeping batches uint8 until the
    device cuts host->device traffic ~6x at the Cityscapes recipe shape
    and removes the host normalize pass."""
    img = batch["img"]
    if img.dtype == jnp.uint8:
        if normalize is None:
            raise ValueError("uint8 (compact) batches need "
                             "make_train_step(..., normalize=(mean, std))")
        mean, std = normalize
        x = img.astype(jnp.float32) / 255.0
        x = (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(
            std, jnp.float32)
        pad = batch.get("pad")
        if pad is not None:
            n, h, w = img.shape[:3]
            rows = jnp.arange(h)[None, :, None]
            cols = jnp.arange(w)[None, None, :]
            hv = pad[:, 0][:, None, None]
            wv = pad[:, 1][:, None, None]
            fl = pad[:, 2][:, None, None]
            valid = (rows < hv) & jnp.where(fl > 0, cols >= w - wv,
                                            cols < wv)
            x = jnp.where(valid[..., None], x, 0.0)
        img = x
    img = img.astype(compute_dtype)
    lab = batch["label"]
    if isinstance(lab, dict) and "weight_class" in lab:
        ori = lab["ori"].astype(jnp.int32)
        idx = jnp.where(ori == ignore_label, num_classes, ori)
        weight = jax.vmap(jnp.take)(lab["weight_class"], idx)
        lab = {"ori": ori, "weight": weight}
    elif isinstance(lab, dict):
        lab = {"ori": lab["ori"].astype(jnp.int32), "weight": lab["weight"]}
    else:
        lab = lab.astype(jnp.int32)
    return img, lab


def make_train_step(model: SegModel, criterion: Criterion,
                    tx: optax.GradientTransformation, *,
                    eic_r: float = 0.999, compute_dtype=jnp.float32,
                    fuse_loss_tail: bool = True, normalize=None,
                    ignore_label: int = 255,
                    remat_segments: int = 0,
                    compiler_options: Optional[dict] = None) -> Callable:
    """Build the jitted train step: (state, batch, rng) -> (state, metrics).

    ``batch``: {'img': NHWC float, 'label': (N,H,W) int or
    {'ori','weight'}}.  Under a mesh, shard the batch over ('data',
    'spatial'); params/opt-state stay replicated and XLA inserts the grad
    reduction implied by the global-mean loss.

    ``fuse_loss_tail``: run each head's final bilinear upsample outside the
    graph in channels-first layout and evaluate the criterion on NCHW
    logits.  Full-resolution NHWC logits lane-pad their thin class dim to
    128 on TPU (6.7x the HBM bytes for 19 classes), which made each loss
    tower (upsample + softmax CE, fwd+bwd) cost ~80 ms of the 359 ms
    Cityscapes-recipe step; channels-first keeps W as the lane axis.
    Numerically identical — same interpolation matrices, same reductions.

    ``remat_segments`` > 1 wraps that many contiguous graph segments in
    ``jax.checkpoint``: activation HBM for the backward drops by roughly
    the segment count at ~1/3 extra FLOPs — use it when batch x
    resolution exceeds chip memory (see graph_apply's docstring).
    """
    graph = model.graph

    tails = {}
    run_graph = graph
    if fuse_loss_tail and all(
            graph.node(o).op == "resize" and
            graph.node(o).attrs.get("to_input") for o in graph.outputs):
        tails = {o: graph.node(o) for o in graph.outputs}
        run_graph = graph.copy()
        run_graph.outputs = [graph.node(o).inputs[0] for o in graph.outputs]

    def loss_fn(params, bn_state, batch, rng):
        img, labels = expand_batch(batch, normalize, model.num_classes,
                                   ignore_label, compute_dtype)
        outs, new_bn = graph_apply(run_graph, params, bn_state,
                                   {"image": img}, train=True, rng=rng,
                                   remat_segments=remat_segments)
        if tails:
            hw = img.shape[1:3]
            preds = {}
            for alias, node in tails.items():
                # keep the graph dtype: resize computes f32 internally and
                # rounds back, exactly like the in-graph NHWC resize did
                z = jnp.transpose(outs[node.inputs[0]], (0, 3, 1, 2))
                preds[alias] = resize_bilinear_cf(
                    z, hw, node.attrs["align_corners"])
            loss = criterion(preds, labels, channels_first=True)["loss"]
        else:
            loss = criterion(outs, labels)["loss"]
        return loss, new_bn

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, rng):
        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.bn_state, batch, rng)
        eic = state.eic
        if eic is not None:
            eic = eic_update(eic, state.params, grads, eic_r)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  bn_state=new_bn, opt_state=new_opt,
                                  eic=eic)
        gnorm = optax.global_norm(grads)
        return new_state, {"loss": loss, "grad_norm": gnorm}

    opts = compiler_options
    if opts is None:
        from dcfp_tpu.engine.deploy import env_compiler_options
        opts = env_compiler_options()
    if not opts:
        return train_step

    # XLA compiler options (PJRT per-compile overrides — the only channel
    # that reaches TPU-side flags through a remote-compile service) need
    # an explicit lower+compile; jit dispatch has no options hook.  AOT
    # at first-call shapes, re-lowered if the batch shape changes.
    # Measured: xla_tpu_scoped_vmem_limit_kib=49152 gives ~2% on the CS
    # recipe step (201.7 -> 197.6 ms, docs/ROADMAP.md).
    cache: dict = {}

    def train_step_with_options(state: TrainState, batch, rng):
        key = tuple((tuple(x.shape), str(x.dtype))
                    for x in jax.tree.leaves(batch))
        compiled = cache.get(key)
        if compiled is None:
            compiled = train_step.lower(state, batch, rng).compile(opts)
            cache[key] = compiled
        return compiled(state, batch, rng)

    # Keep the jitted-step API: callers that lower explicitly (cost
    # analysis, their own compiler options) must not break just because
    # DCFP_XLA_OPTIONS was exported in the environment.
    train_step_with_options.lower = train_step.lower
    return train_step_with_options


@dataclasses.dataclass
class TrainLoop:
    """Outer loop: step scheduling, NaN guard, snapshots, EIC export.

    Mirrors reference train.py:227-288 structure (steps-based with
    save window) without the epoch/DataLoader machinery — the data source
    is any iterator of host batches.

    Beyond the reference: a SIGTERM/SIGINT handler that finishes the
    in-flight step, writes a snapshot, and returns cleanly — preemption
    grace for TPU-VM/spot jobs (the reference's recovery story is a
    manual --resume, SURVEY §5); and optional JSONL metrics
    (``metrics_file``) one line per log window for external dashboards.
    """
    model: SegModel
    criterion: Criterion
    tx: optax.GradientTransformation
    num_steps: int
    lr_schedule: Callable
    save_pred_every: int = 10000
    save_steps: int = 0
    snapshot_hook: Optional[Callable] = None  # (state, step) -> None
    log_every: int = 50
    prune_type: Optional[str] = None
    eic_r: float = 0.999
    compute_dtype: Any = jnp.float32
    normalize: Optional[tuple] = None  # (mean, std) for compact batches
    ignore_label: int = 255
    handle_signals: bool = False  # SIGTERM/SIGINT -> snapshot + return
    metrics_file: Optional[str] = None  # JSONL, one line per log window
    remat_segments: int = 0  # >1: jax.checkpoint segments in the forward

    def run(self, state: TrainState, batches, rng: jax.Array,
            start_step: int = 0) -> TrainState:
        train_step = make_train_step(self.model, self.criterion, self.tx,
                                     eic_r=self.eic_r,
                                     compute_dtype=self.compute_dtype,
                                     normalize=self.normalize,
                                     ignore_label=self.ignore_label,
                                     remat_segments=self.remat_segments)
        interrupted = {"sig": None}
        restore = {}
        # Multi-process SPMD: a signal delivered to ONE rank must not
        # make that rank desert the program while peers block in the
        # next collective.  Ranks therefore agree on stopping via a tiny
        # process_allgather at log boundaries (deterministic step
        # counts, so every rank dispatches the same consensus program);
        # the grace latency is bounded by log_every steps.
        multiproc = jax.process_count() > 1
        if self.handle_signals:
            import signal

            def _on_signal(signum, frame):
                interrupted["sig"] = signum
                log.warning("signal %d: will snapshot and stop %s", signum,
                            "at the next log boundary (multi-process "
                            "consensus)" if multiproc
                            else "after the current step")

            for s in (signal.SIGTERM, signal.SIGINT):
                try:
                    restore[s] = signal.signal(s, _on_signal)
                except ValueError:  # non-main thread
                    break

        t0, last = time.time(), start_step
        # Device-resident loss scalars, fetched once per log window: a
        # per-step float() would force a host round trip every step and
        # stall dispatch pipelining (the reference's per-step guard,
        # train.py:260, is cheap on GPU but serializing on TPU).
        pending: list = []
        metrics_f = open(self.metrics_file, "a") if self.metrics_file \
            else None
        try:
            for step in range(start_step, self.num_steps):
                batch = next(batches)
                rng, sub = jax.random.split(rng)
                state, metrics = train_step(state, batch, sub)
                pending.append(metrics["loss"])
                boundary = ((step + 1) % self.log_every == 0
                            or step + 1 == self.num_steps
                            or (not multiproc
                                and interrupted["sig"] is not None))
                if boundary:
                    losses = np.asarray(jnp.stack(pending))  # ONE sync
                    if not np.isfinite(losses).all():  # NaN guard
                        bad = step + 1 - len(losses) + int(
                            np.argmin(np.isfinite(losses)))
                        raise FloatingPointError(
                            f"non-finite loss at step {bad}")
                    dt = time.time() - t0
                    sps = (step + 1 - last) / max(dt, 1e-9)
                    lr = float(self.lr_schedule(jnp.asarray(step)))
                    log.info("step %d/%d loss=%.4f (avg %.4f) lr=%.3e "
                             "%.2f it/s", step + 1, self.num_steps,
                             float(losses[-1]), float(losses.mean()), lr,
                             sps)
                    if metrics_f is not None:
                        import json
                        metrics_f.write(json.dumps({
                            "step": step + 1,
                            "loss": float(losses[-1]),
                            "loss_avg": float(losses.mean()),
                            "lr": lr,
                            "it_per_s": round(sps, 4),
                            "time": time.time(),
                        }) + "\n")
                        metrics_f.flush()
                    t0, last = time.time(), step + 1
                    pending = []
                stop = interrupted["sig"] is not None
                if multiproc:
                    # collective decision: every rank dispatches the
                    # consensus at the same boundaries, none elsewhere
                    if boundary and self.handle_signals:
                        from jax.experimental import multihost_utils
                        stop = bool(np.max(
                            multihost_utils.process_allgather(
                                np.int32(stop))))
                    else:
                        stop = False
                in_window = (step + 1) >= self.save_steps
                saved_this_step = False
                if self.snapshot_hook and (
                        (in_window
                         and (step + 1) % self.save_pred_every == 0)
                        or step + 1 == self.num_steps):
                    self.snapshot_hook(state, step + 1)
                    saved_this_step = True
                if stop:
                    # don't serialize the same step twice when the signal
                    # lands on a step the save window already snapshotted
                    if self.snapshot_hook and not saved_this_step:
                        self.snapshot_hook(state, step + 1)
                    log.warning("stopped at step %d on signal %s; resume "
                                "with --resume <snapshot> "
                                "--resume-full-state true", step + 1,
                                interrupted["sig"] or "(peer process)")
                    break
        finally:
            if metrics_f is not None:
                metrics_f.close()
            if restore:
                import signal
                for s, h in restore.items():
                    signal.signal(s, h)
        return state
