"""Evaluation harness: whole-image / sliding-window / multi-scale + flip
inference, confusion-matrix metrics, boundary IoU, FPS.

TPU-native redesign of reference evaluate.py:
* forwards are jitted per input shape with stride-8 padding (pad_inf,
  evaluate.py:119-130) plus optional shape *bucketing*: inputs pad up to
  a quantum so variable-resolution val sets (CTX/ADE/COCO) compile a
  bounded program set instead of one per image;
* sliding-window tiles are gathered into ONE batched forward instead of a
  python double loop of single-tile forwards (evaluate.py:145-184) — the
  MXU sees a full batch, overlap averaging happens once on host;
* the Predictor can run over a ``jax.sharding.Mesh``: batch sharded over
  'data' (multi-chip throughput eval) and/or image height over 'spatial'
  (whole-image 1024x2048 on several chips — halo exchanges inserted by
  the SPMD partitioner), with the confusion matrix reduced across
  processes like the reference's NCCL all-reduce (evaluate.py:370-372);
* FPS timing matches the reference protocol (evaluate.py:326-337): the
  H2D transfer happens *before* the timed region and the bracket
  synchronizes by a one-element host fetch (block_until_ready is
  unreliable on tunneled platforms), same 5-iteration warmup exclusion;
* the confusion matrix is one vectorized bincount (evaluate.py:229-247).
"""

from __future__ import annotations

import functools
import json
import math
import os
import time
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dcfp_tpu.graph.apply import graph_apply
from dcfp_tpu.ops.resize import resize_bilinear
from dcfp_tpu.utils.edge import mask_to_boundary_device
from dcfp_tpu.utils.logger import get_logger

log = get_logger()


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------

def confusion_matrix(gt: np.ndarray, pred: np.ndarray, num_classes: int,
                     ignore_label: int = 255) -> np.ndarray:
    """Bincount confusion matrix (reference evaluate.py:229-247).

    Matches the reference's get_confusion_matrix EXACTLY, including its
    handling of out-of-range predictions: in boundary-IoU mode pred
    contains ignore_label (non-boundary) at pixels where gt IS a
    boundary (evaluate.py:352-357 transforms pred and gt independently,
    then filters on gt only at :359-361), so ``idx = gt*C + pred`` can
    exceed C*C.  The reference bincounts all idx values and copies only
    the first C*C entries into the matrix — entries beyond C*C are
    dropped, and out-of-range idx that happen to land BELOW C*C alias
    into unrelated (gt', pred') cells (e.g. gt=0, pred=255, C=19 ->
    cell (13, 8)).  We reproduce that verbatim: published boundary-IoU
    numbers are only comparable under identical binning."""
    valid = gt != ignore_label
    gt = gt[valid].astype(np.int64)
    pred = pred[valid].astype(np.int64)
    idx = gt * num_classes + pred
    n = num_classes * num_classes
    return np.bincount(idx, minlength=n)[:n].reshape(
        num_classes, num_classes).astype(np.float64)


def metrics_from_confusion(cm: np.ndarray) -> Dict:
    """meanIU / per-class IU / precision / recall
    (reference evaluate.py:373-381)."""
    pos = cm.sum(1)
    res = cm.sum(0)
    tp = np.diag(cm)
    iu_array = tp / np.maximum(1.0, pos + res - tp)
    return {
        "meanIU": float(iu_array.mean()),
        "IU_array": iu_array,
        "meanP": float((tp / (res + 1e-5)).mean()),
        "precision": tp / (res + 1e-5),
        "meanR": float((tp / (pos + 1e-5)).mean()),
        "recall": tp / (pos + 1e-5),
    }


def pad_inf(image_hw: Tuple[int, int], stride: int = 8
            ) -> Tuple[int, int]:
    """Padded (H, W): to stride+1 modulo stride (evaluate.py:119-130)."""
    h, w = image_hw
    pad_h = (stride + 1 - h % stride) % stride
    pad_w = (stride + 1 - w % stride) % stride
    return h + pad_h, w + pad_w


def bucket_hw(image_hw: Tuple[int, int], quantum: int,
              align_corner: bool = False) -> Tuple[int, int]:
    """Smallest (H', W') >= (H, W) on the bucket lattice.

    align_corner buckets sit at k*quantum + 1 (so they satisfy the
    stride+1 rule of :func:`pad_inf` for any stride dividing quantum);
    otherwise at k*quantum.  Zero-pad + slice-back is the reference's own
    approximation (pad_inf zero-pads and evaluate.py crops the logits),
    just quantized so a whole variable-size val set compiles O(few)
    programs instead of one per resolution.
    """
    h, w = image_hw
    if quantum <= 1:
        return h, w
    off = 1 if align_corner else 0
    bh = max(math.ceil((h - off) / quantum), 1) * quantum + off
    bw = max(math.ceil((w - off) / quantum), 1) * quantum + off
    return bh, bw


@functools.partial(jax.jit,
                   static_argnames=("num_classes", "ignore_label"))
def confusion_update_device(cm: jnp.ndarray, pred: jnp.ndarray,
                            gt: jnp.ndarray, *, num_classes: int,
                            ignore_label: int = 255) -> jnp.ndarray:
    """Device-resident confusion accumulation: the bincount trick of
    :func:`confusion_matrix` (reference evaluate.py:229-247) as one
    jitted update into an int32 (C, C) counts matrix, so throughput-mode
    eval never fetches per-image predictions to the host."""
    gt = gt.astype(jnp.int32)
    pred = pred.astype(jnp.int32)
    idx = jnp.where(gt != ignore_label, gt * num_classes + pred,
                    num_classes * num_classes)
    counts = jnp.bincount(idx.ravel(),
                          length=num_classes * num_classes + 1)
    return cm + counts[:num_classes * num_classes].reshape(
        num_classes, num_classes).astype(jnp.int32)


def allreduce_confusion(cm: np.ndarray) -> np.ndarray:
    """Sum per-process confusion matrices across all JAX processes —
    the reference's dist.all_reduce of the confusion matrix
    (evaluate.py:370-372).  Identity in single-process runs."""
    if jax.process_count() == 1:
        return cm
    from jax.experimental import multihost_utils
    return np.asarray(
        multihost_utils.process_allgather(jnp.asarray(cm))).sum(0)


# ---------------------------------------------------------------------------
# predictor
# ---------------------------------------------------------------------------

class _CountCompiles:
    """First-party compiled-program counter.

    Wraps a jitted callable and records the distinct (shape, dtype)
    signatures of its *image* argument (the last array positional arg)
    plus any hashable static positional args (the split tail's static
    ``out_hw`` tuple compiles separately per value even at one logits
    shape) — for a fixed Predictor the remaining jit cache keys
    (param/state trees, sharding) never change, so distinct keys ==
    compiles.  Replaces the private ``fn._cache_size()`` probe which
    silently broke across jax versions.
    """

    def __init__(self, fn):
        self._fn = fn
        self._seen = set()

    def __call__(self, *args):
        img = next(a for a in reversed(args) if hasattr(a, "shape"))
        key = [tuple(img.shape), str(img.dtype)]
        for a in args:
            if hasattr(a, "shape") or isinstance(a, (dict, list)):
                continue  # arrays keyed above; pytrees are fixed
            try:
                hash(a)
            except TypeError:
                continue
            key.append(a)
        self._seen.add(tuple(key))
        return self._fn(*args)

    @property
    def count(self) -> int:
        return len(self._seen)


class Predictor:
    """Shape-cached jitted forward over a (graph, params, state) triple.

    Options:
    * ``bucket_quantum`` — pad every input up to the bucket lattice (see
      :func:`bucket_hw`) and slice logits back: bounds the compiled
      program count on variable-resolution datasets.
    * ``mesh`` + ``shard`` — run the forward SPMD over a device mesh:
      ``'data'`` shards the batch dim, ``'spatial'`` shards image height
      (whole-image multi-chip inference; XLA inserts the conv halo
      exchanges), ``'both'`` shards both.  Logits come back replicated.
    """

    def __init__(self, graph, params, state, dtype=jnp.float32, *,
                 bucket_quantum: int = 0, align_corner: bool = False,
                 mesh=None, shard: str = "data", normalize=None):
        self.graph = graph
        self.dtype = dtype
        self.bucket_quantum = int(bucket_quantum)
        self.align_corner = bool(align_corner)
        self.mesh = mesh
        self.normalize = normalize

        def fwd(params, state, image):
            outs, _ = graph_apply(graph, params, state,
                                  {"image": image.astype(dtype)},
                                  train=False)
            return outs["pred"].astype(jnp.float32)

        def fwd_argmax(params, state, image):
            # label path under a mesh: argmax on device.  Full-res f32
            # NHWC logits lane-pad their thin class dim to 128 on TPU
            # (~2 GB physical at 1024x2048x19) — emitting uint8 labels
            # instead skips that HBM round trip, the 160 MB D2H, and the
            # host argmax (measured: 3.9 s -> the forward's own cost).
            outs, _ = graph_apply(graph, params, state,
                                  {"image": image.astype(dtype)},
                                  train=False)
            return jnp.argmax(outs["pred"], -1).astype(jnp.uint8)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(mesh, P())
            spec = {"data": P("data", None, None, None),
                    "spatial": P(None, "spatial", None, None),
                    "both": P("data", "spatial", None, None)}[shard]
            self._img_spec = spec
            self._img_sharding = NamedSharding(mesh, spec)
            self.params = jax.device_put(params, rep)
            self.state = jax.device_put(state, rep)
            # image in_shardings are inferred from the staged argument
            # (device_put through _fitted_sharding) — pinning them here
            # would reject shapes whose dims don't divide the mesh axes
            self._fwd = _CountCompiles(jax.jit(fwd, out_shardings=rep))
            self._fwd_argmax = _CountCompiles(
                jax.jit(fwd_argmax, out_shardings=rep))
        else:
            self._img_sharding = None
            # pin params/state on device: checkpoint loaders return host
            # numpy trees, and leaving them there makes every jitted call
            # re-upload the full weight set (measured: ~3.7 s/image for a
            # 165 MB R50 over a tunneled chip — 30x the forward itself)
            self.params = jax.tree.map(jnp.asarray, params)
            self.state = jax.tree.map(jnp.asarray, state)
            self._fwd = _CountCompiles(jax.jit(fwd))
            # label path = the DEPLOY forward (BN folded into convs +
            # fused upsample-argmax tail) — exact for inference and
            # measured 1.7x the raw eval graph (32.7 vs 57 ms at
            # 1024x2048 R50); the logits path keeps the raw graph the
            # probability-averaging modes need.  Body and Pallas tail
            # run as separate programs so the conv chain keeps XLA's
            # tiled strategy (deploy.make_split_inference_fn).
            from dcfp_tpu.engine.deploy import make_split_inference_fn
            abody, atail, adev = make_split_inference_fn(
                graph, params, state, dtype=dtype, fold_bn=True,
                output="argmax")
            self._afn = _CountCompiles(jax.jit(abody))
            self._atail = (_CountCompiles(
                jax.jit(atail, static_argnums=1))
                if atail is not None else None)
            self._argmax_params = adev

            def _fwd_argmax(p, s, image):
                z = self._afn(self._argmax_params, image)
                if self._atail is None:
                    return z
                return self._atail(z, tuple(int(d)
                                            for d in image.shape[1:3]))

            self._fwd_argmax = _fwd_argmax

    def _fitted_sharding(self, shape):
        """The image sharding with axes DROPPED where the dimension is
        not divisible by the mesh axis (jax rejects uneven input
        shardings) — e.g. a batch of 2 cannot spread over data=8, but
        the 16-tile batch derived from it can."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        axes = []
        for i, ax in enumerate(self._img_spec):
            n = self.mesh.shape[ax] if ax is not None else 1
            axes.append(ax if ax is not None and shape[i] % n == 0
                        else None)
        axes += [None] * (len(shape) - len(axes))
        return NamedSharding(self.mesh, P(*axes))

    def num_compiles(self) -> int:
        """Compiled-program count across all entry points (the
        bucketing discipline metric)."""
        total = 0
        for fn in (self._fwd, self._fwd_argmax,
                   getattr(self, "_afn", None),
                   getattr(self, "_atail", None)):
            if isinstance(fn, _CountCompiles):
                total += fn.count
        # each cached sliding program is compiled for exactly one
        # (image, tile) shape
        total += len(getattr(self, "_sliding_cache", {}))
        return total

    def __call__(self, image: jnp.ndarray) -> jnp.ndarray:
        return self._fwd(self.params, self.state, image)

    # -- serialized-executable serving (the --use-trt analog) ---------------
    def use_aot_whole(self, run, aot_params) -> None:
        """Route whole-image forwards through a serialized deploy
        executable (argmax output, reference evaluate.py:273-276)."""
        self._fwd = lambda p, s, image: run(aot_params, image)
        self._fwd_argmax = self._fwd

    def use_aot_tiles(self, run, aot_params) -> None:
        """Route sliding-window tiles through a tile-shaped serialized
        executable (logits output).  The executable's fixed input shape
        must match (batch, tile_h, tile_w, 3); the overlap scatter-add
        still runs in a jitted program on device.  Works under
        multi-scale + flip too: every tile runs at the canonical tile
        shape regardless of the scaled image size (undersized borders
        zero-pad, reference evaluate.py:166-171)."""
        self._aot_tile = (run, aot_params)

    def use_aot_scales(self, runs_by_hw: Dict[Tuple[int, int], object],
                       aot_params) -> None:
        """Route whole-image forwards through per-scale serialized logits
        executables, dispatched by the input's spatial shape.

        The reference serves its fixed-shape TRT engine as the model
        inside every eval mode (evaluate.py:273-276 feeding
        predict_multiscale :198-227); scales are static per recipe, so
        the TPU analog is one logits executable per scale shape
        (cli.deploy --ms).  Flip needs no extra executables — the
        flipped forward runs at the same shape."""

        def fwd(p, s, image):
            hw = (int(image.shape[1]), int(image.shape[2]))
            run = runs_by_hw.get(hw)
            if run is None:
                raise ValueError(
                    f"no serialized executable for input {hw}; this "
                    f"artifact covers {sorted(runs_by_hw)} — re-export "
                    "with cli.deploy --ms matching the eval scales and "
                    "--input-size matching the (padded) eval resolution")
            return run(aot_params, image.astype(jnp.float32))

        self._fwd = fwd
        self._fwd_argmax = lambda p, s, image: jnp.argmax(
            fwd(p, s, image), -1).astype(jnp.uint8)

    # -- raw uint8 input (compact eval items) -------------------------------
    def prep_raw(self, image: jnp.ndarray, valid_hw) -> jnp.ndarray:
        """Normalize a raw uint8 RGB image on device: f32 ``/255 - mean
        / std`` — the identical IEEE f32 ops the host input_transform
        runs (data/base.py), so results are bitwise-equal — then zero
        pixels beyond ``valid_hw``, reproducing the protocol's
        pad-with-zeros-AFTER-normalize semantics (pad_inf / bucket
        padding happen on the already-normalized image in the classic
        path).  Keeping the wire format uint8 cuts H2D traffic 4x."""
        if self.normalize is None:
            raise ValueError("Predictor(normalize=(mean, std)) is "
                             "required for uint8 (compact) eval items")
        if not hasattr(self, "_prep_jit"):
            mean, std = self.normalize
            mean = jnp.asarray(mean, jnp.float32)
            std = jnp.asarray(std, jnp.float32)

            @jax.jit
            def prep(img, vh, vw):
                from dcfp_tpu.data.base import normalize_f32
                x = normalize_f32(img.astype(jnp.float32), mean, std)
                rows = jnp.arange(x.shape[1])[None, :, None, None]
                cols = jnp.arange(x.shape[2])[None, None, :, None]
                return jnp.where((rows < vh) & (cols < vw), x, 0.0)

            self._prep_jit = prep
        return self._prep_jit(image, valid_hw[0], valid_hw[1])

    # -- input staging -------------------------------------------------------
    def stage(self, image) -> jnp.ndarray:
        """Transfer an NHWC host array to device: into the fitted image
        sharding under a mesh, plain otherwise; jax.Arrays pass through.
        The single staging path every eval mode funnels through."""
        if isinstance(image, jax.Array):
            return image
        if self._img_sharding is not None:
            return jax.device_put(np.asarray(image),
                                  self._fitted_sharding(image.shape))
        return jnp.asarray(np.asarray(image))

    def device_put(self, image: np.ndarray) -> jnp.ndarray:
        """Bucket-pad and transfer an NHWC image to device, synchronously
        (so a following timed region excludes the H2D copy, matching the
        reference protocol evaluate.py:326)."""
        if self.bucket_quantum:
            h, w = image.shape[1:3]
            bh, bw = bucket_hw((h, w), self.bucket_quantum,
                               self.align_corner)
            if (bh, bw) != (h, w):
                image = np.pad(np.asarray(image),
                               ((0, 0), (0, bh - h), (0, bw - w), (0, 0)))
        dev = self.stage(image)
        np.asarray(jax.tree.leaves(dev)[0].ravel()[0])  # sync H2D
        return dev

    # -- whole image -------------------------------------------------------
    def predict_whole(self, image) -> jnp.ndarray:
        """Forward on a host or device image; logits sliced back to the
        input's (unbucketed) spatial size."""
        h, w = image.shape[1:3]
        if not isinstance(image, jax.Array):
            image = self.device_put(image)
        out = self(image)
        if out.shape[1:3] != (h, w):
            out = out[:, :h, :w]
        return out

    def predict_whole_labels(self, image) -> jnp.ndarray:
        """Forward + on-device argmax -> (N, H, W) uint8 label maps.  The
        fast path for single-scale whole-image eval (no probability
        averaging needed)."""
        h, w = image.shape[1:3]
        if not isinstance(image, jax.Array):
            image = self.device_put(image)
        out = self._fwd_argmax(self.params, self.state, image)
        if out.shape[1:3] != (h, w):
            out = out[:, :h, :w]
        return out

    # -- sliding window (evaluate.py:145-184), batched tiles ----------------
    @staticmethod
    def _tile_boxes(h, w, th, tw, overlap):
        stride = int(math.ceil(th * (1 - overlap)))
        rows = int(math.ceil(max(h - th, 0) / stride) + 1)
        cols = int(math.ceil(max(w - tw, 0) / stride) + 1)
        boxes = []
        for r in range(rows):
            for c in range(cols):
                x2 = min(c * stride + tw, w)
                y2 = min(r * stride + th, h)
                boxes.append((max(y2 - th, 0), max(x2 - tw, 0), y2, x2))
        return boxes

    def predict_sliding(self, image, tile_size: Tuple[int, int],
                        num_classes: int, overlap: float = 1 / 3
                        ) -> jnp.ndarray:
        """Overlap-averaged logits over tiles, (N, H, W, C) f32 on
        DEVICE.  Tile extraction, the single batched forward, and the
        overlap scatter-add all run inside one jitted program — the
        earlier host round trip of per-tile logits (360 MB at 1024x2048
        with 769² tiles) made sliding eval device-transfer-bound.  Boxes
        are static for a given (image, tile) shape; programs cache per
        shape like the plain forward."""
        n, h, w, _ = image.shape
        th, tw = tile_size
        boxes = tuple(self._tile_boxes(h, w, th, tw, overlap))
        key = (n, h, w, th, tw, num_classes, boxes)
        if getattr(self, "_aot_tile", None) is not None:
            return self._predict_sliding_aot(image, (th, tw), num_classes,
                                             boxes)
        fn = getattr(self, "_sliding_cache", {}).get(key)
        if fn is None:
            graph, dtype, mesh = self.graph, self.dtype, self.mesh
            if mesh is not None:
                tile_sharding = self._fitted_sharding(
                    (n * len(boxes), th, tw, image.shape[-1]))

            def sliding(params, state, image):
                # zero-pad undersized border tiles to (th, tw) before the
                # forward and crop the logits back — the reference pads
                # then crops (evaluate.py:166-171), so tiles always run
                # at the canonical tile shape
                tiles = jnp.concatenate([
                    jnp.pad(image[:, y1:y2, x1:x2],
                            ((0, 0), (0, th - (y2 - y1)),
                             (0, tw - (x2 - x1)), (0, 0)))
                    for y1, x1, y2, x2 in boxes])
                if mesh is not None:
                    # under a mesh the tile batch re-shards over the
                    # image layout (tile-batch over 'data', height over
                    # 'spatial') so the batched forward runs SPMD —
                    # replaces the transfer-bound host overlap-add
                    tiles = jax.lax.with_sharding_constraint(
                        tiles, tile_sharding)
                outs, _ = graph_apply(graph, params, state,
                                      {"image": tiles.astype(dtype)},
                                      train=False)
                logits = outs["pred"].astype(jnp.float32)
                full = jnp.zeros((n, h, w, num_classes), jnp.float32)
                count = jnp.zeros((1, h, w, 1), jnp.float32)
                for i, (y1, x1, y2, x2) in enumerate(boxes):
                    full = full.at[:, y1:y2, x1:x2].add(
                        logits[i * n:(i + 1) * n, :y2 - y1, :x2 - x1])
                    count = count.at[:, y1:y2, x1:x2].add(1.0)
                return full / count

            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                rep = NamedSharding(mesh, P())
                fn = jax.jit(sliding, out_shardings=rep)
            else:
                fn = jax.jit(sliding)
            if not hasattr(self, "_sliding_cache"):
                self._sliding_cache = {}
            self._sliding_cache[key] = fn
        return fn(self.params, self.state, self.stage(image))

    def _predict_sliding_aot(self, image, tile_size, num_classes, boxes):
        """Sliding eval through a tile-shaped serialized executable: one
        executable call per box (the reference's per-tile TRT forwards,
        evaluate.py:173-177), logits stay on device, one jitted
        scatter-add merges them."""
        run, aot_params = self._aot_tile
        n, h, w, _ = image.shape
        th, tw = tile_size
        dev = image if isinstance(image, jax.Array) \
            else jnp.asarray(np.asarray(image))
        # serialized executables are exported with f32 inputs
        # (export_serialized input_dtype default; the executable casts
        # to its compute dtype internally) — a self.dtype cast here
        # would feed the fixed f32 input aval the wrong dtype
        logits = [run(aot_params,
                      jnp.pad(dev[:, y1:y2, x1:x2].astype(jnp.float32),
                              ((0, 0), (0, th - (y2 - y1)),
                               (0, tw - (x2 - x1)), (0, 0))))
                  for y1, x1, y2, x2 in boxes]
        key = ("aot", n, h, w, th, tw, num_classes, boxes)
        fn = getattr(self, "_sliding_cache", {}).get(key)
        if fn is None:
            def scatter(parts):
                full = jnp.zeros((n, h, w, num_classes), jnp.float32)
                count = jnp.zeros((1, h, w, 1), jnp.float32)
                for part, (y1, x1, y2, x2) in zip(parts, boxes):
                    full = full.at[:, y1:y2, x1:x2].add(
                        part.astype(jnp.float32)[:, :y2 - y1, :x2 - x1])
                    count = count.at[:, y1:y2, x1:x2].add(1.0)
                return full / count

            fn = jax.jit(scatter)
            if not hasattr(self, "_sliding_cache"):
                self._sliding_cache = {}
            self._sliding_cache[key] = fn
        return fn(logits)

    # -- multi-scale + flip (evaluate.py:198-227) ---------------------------
    def predict_multiscale(self, image: np.ndarray,
                           tile_size: Tuple[int, int],
                           scales: Sequence[float], num_classes: int,
                           flip: bool, align_corner: bool,
                           whole: bool,
                           return_probs: bool = False) -> np.ndarray:
        """Scale/flip-averaged prediction as (N, H, W) uint8 label maps,
        computed entirely on device: the image uploads once, per-scale
        resizes / tile scatter / flips / prob accumulation / the final
        argmax all run device-side — the host round trip of
        full-resolution f32 probs per scale (160 MB each at
        1024x2048x19) is what made ms/sliding eval transfer-bound.

        ``return_probs`` returns the accumulated (N, H, W, C) f32 logits
        instead of argmax labels — needed when the caller must resize
        logits back to the original resolution before the argmax
        (reference evaluate.py:340-343 longsize/shortsize protocol).
        """
        n, h, w, _ = image.shape
        # plain transfer (no bucket padding: per-scale shapes derive
        # from the true (h, w) and compile per scale regardless); under
        # a mesh the upload stages straight into the image sharding
        dev = self.stage(image)
        acc = jnp.zeros((n, h, w, num_classes), jnp.float32)
        for scale in scales:
            hs, ws = int(h * float(scale)), int(w * float(scale))
            scaled = resize_bilinear(dev, (hs, ws),
                                     align_corners=align_corner)
            if whole:
                probs = self.predict_whole(scaled)
                if probs.ndim == 3:
                    # a label-emitting (argmax) forward — e.g. an AOT
                    # whole-image executable — cannot feed the
                    # probability-averaging path
                    raise RuntimeError(
                        "predict_multiscale needs a logits forward; the "
                        "served executable emits argmax label maps")
                if flip:
                    fp = self.predict_whole(scaled[:, :, ::-1])
                    probs = 0.5 * (probs + fp[:, :, ::-1])
            else:
                probs = self.predict_sliding(scaled, tile_size,
                                             num_classes)
                if flip:
                    fp = self.predict_sliding(
                        jnp.asarray(scaled)[:, :, ::-1], tile_size,
                        num_classes)
                    probs = 0.5 * (jnp.asarray(probs)
                                   + jnp.asarray(fp)[:, :, ::-1])
            acc = acc + resize_bilinear(jnp.asarray(probs), (h, w),
                                        align_corners=align_corner)
        if return_probs:
            return acc
        return jnp.argmax(acc, -1).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# evaluation loop
# ---------------------------------------------------------------------------

def evaluate(predictor: Predictor, loader: Iterable, *, num_classes: int,
             ignore_label: int = 255, whole: bool = True,
             scales: Sequence[float] = (1.0,), flip: bool = False,
             align_corner: bool = False,
             tile_size: Tuple[int, int] = (769, 769),
             longsize: int = -1, shortsize: int = -1,
             iou_type: str = "mask", dilation_ratio: float = 0.02,
             fps_warmup: int = 5,
             save_predict_dir: Optional[str] = None,
             cmap: Optional[np.ndarray] = None,
             result_file: Optional[str] = None,
             result_tag: str = "", pipeline: bool = False) -> Dict:
    if pipeline:
        if (longsize <= 0 and shortsize <= 0 and iou_type == "mask"
                and save_predict_dir is None):
            return evaluate_pipelined(
                predictor, loader, num_classes=num_classes,
                ignore_label=ignore_label, whole=whole, scales=scales,
                flip=flip, tile_size=tile_size,
                align_corner=align_corner,
                fps_warmup=fps_warmup, result_file=result_file,
                result_tag=result_tag)
        log.warning("pipeline mode needs mask eval without prediction "
                    "saving or longsize/shortsize logits-resize; using "
                    "the protocol loop")
    cm = np.zeros((num_classes, num_classes), np.float64)
    pure_inf_time, fps = 0.0, 0.0
    n_imgs = 0
    if hasattr(loader, "__len__"):
        # tiny sets: still report an FPS instead of warming up everything
        fps_warmup = min(fps_warmup, max(len(loader) - 1, 0))
    for idx, batch in enumerate(loader):
        image = batch["img"]  # NHWC float32 (or raw uint8 compact items)
        if image.dtype == np.uint8:
            if predictor.normalize is None:
                raise ValueError("uint8 (compact) eval items need "
                                 "Predictor(normalize=(mean, std))")
            mean, std = predictor.normalize
            from dcfp_tpu.data.base import normalize_f32
            image = normalize_f32(np.asarray(image, np.float32),
                                  np.asarray(mean, np.float32),
                                  np.asarray(std, np.float32))
        label = batch.get("label")
        metas = batch.get("img_meta", [{}] * image.shape[0])
        orig_hw = image.shape[1:3]
        if longsize > 0 or shortsize > 0:
            size, mode = ((longsize, "long") if longsize > 0
                          else (shortsize, "short"))
            f = (size / max(orig_hw) if mode == "long"
                 else size / min(orig_hw))
            new_hw = (int(orig_hw[0] * f + 0.5), int(orig_hw[1] * f + 0.5))
            image = np.asarray(resize_bilinear(jnp.asarray(image), new_hw))
        size_scale = image.shape[1:3]
        if whole and align_corner:
            ph, pw = pad_inf(size_scale)
            if (ph, pw) != size_scale:
                image = np.pad(image, ((0, 0), (0, ph - size_scale[0]),
                                       (0, pw - size_scale[1]), (0, 0)))

        # longsize/shortsize runs must resize *logits* back to the
        # original resolution before the argmax (reference
        # evaluate.py:340-343 F.interpolate of the output) — route those
        # through the probability path instead of the uint8 label path
        need_resize = ((longsize > 0 or shortsize > 0)
                       and tuple(size_scale) != tuple(orig_hw))
        if (whole and tuple(scales) == (1.0,) and not flip
                and not need_resize):
            # reference protocol (evaluate.py:326-337): H2D before the
            # timed region; bracket closes on a one-element host fetch
            # (device programs run in dispatch order, so that waits for
            # the forward; block_until_ready is unreliable on tunneled
            # platforms and D2H of the full logits stays untimed).
            dev_img = predictor.device_put(image)
            t0 = time.perf_counter()
            out = predictor.predict_whole_labels(dev_img)
            np.asarray(out.ravel()[0])
            elapsed = time.perf_counter() - t0
            out = np.asarray(out)[:, :size_scale[0], :size_scale[1]]
        else:
            # stage H2D outside the timed region (protocol); under a
            # mesh, stage straight into the image sharding so the
            # per-scale forwards run SPMD instead of resharding from a
            # single device every scale
            image = predictor.stage(image)
            np.asarray(image.ravel()[0])
            t0 = time.perf_counter()
            out = predictor.predict_multiscale(
                image, tile_size, scales, num_classes, flip, align_corner,
                whole, return_probs=need_resize)
            if isinstance(out, jax.Array):  # close the bracket on device
                np.asarray(out.ravel()[0])
            elapsed = time.perf_counter() - t0

        if out.ndim == 3:  # executable already emitted argmax label maps
            seg_pred = np.asarray(out)[:, :size_scale[0],
                                       :size_scale[1]].astype(np.uint8)
        else:
            out = out[:, :size_scale[0], :size_scale[1]]
            if longsize > 0 or shortsize > 0:
                out = np.asarray(resize_bilinear(jnp.asarray(out), orig_hw))
            seg_pred = np.argmax(out, axis=-1).astype(np.uint8)

        if save_predict_dir:
            os.makedirs(save_predict_dir, exist_ok=True)
            from PIL import Image as PILImage
            palette = (list(np.asarray(cmap, np.uint8).reshape(-1))
                       if cmap is not None else None)
            for i in range(seg_pred.shape[0]):
                im = PILImage.fromarray(seg_pred[i])
                if palette:
                    im.putpalette(palette)
                name = metas[i].get("name", f"{idx}_{i}")
                im.save(os.path.join(save_predict_dir, f"{name}.png"))

        if label is not None:
            seg_gt = np.asarray(label, np.int64)
            sp = seg_pred.astype(np.int64)
            if iou_type == "boundary":
                # one batched device erosion over pred AND gt (the host
                # per-class cv2 loop is ~2*N*C*46 erosions per batch and
                # made boundary eval host-bound)
                stacked = mask_to_boundary_device(
                    np.concatenate([sp, seg_gt]), num_classes,
                    dilation_ratio, ignore_label).astype(np.int64)
                sp, seg_gt = stacked[:sp.shape[0]], stacked[sp.shape[0]:]
            cm += confusion_matrix(seg_gt, sp, num_classes, ignore_label)

        if idx >= fps_warmup:
            pure_inf_time += elapsed
            n_imgs += image.shape[0]
            fps = n_imgs / pure_inf_time
        if (idx + 1) % 25 == 0:
            log.info("eval %d: FPS %.2f img/s", idx + 1, fps)

    return _finalize_eval(cm, fps, result_file, result_tag)


def _finalize_eval(cm: np.ndarray, fps: float,
                   result_file: Optional[str], result_tag: str) -> Dict:
    cm = allreduce_confusion(cm)  # multi-process eval (evaluate.py:370-372)
    result = metrics_from_confusion(cm)
    result["fps"] = fps
    result["confusion"] = cm
    log.info("meanIU=%.4f meanP=%.4f meanR=%.4f FPS=%.2f",
             result["meanIU"], result["meanP"], result["meanR"], fps)
    if result_file and jax.process_index() == 0:  # rank-0 result.txt
        with open(result_file, "a") as f:
            f.write(f"test with {result_tag}\n")
            f.write(json.dumps({"meanIU": result["meanIU"],
                                "IU_array": result["IU_array"].tolist()}))
            f.write("\n")
            f.write(json.dumps({"meanP": result["meanP"],
                                "p": result["precision"].tolist()}))
            f.write("\n")
            f.write(json.dumps({"meanR": result["meanR"],
                                "r": result["recall"].tolist()}))
            f.write(f" FPS: {fps:.2f} img / s\n--------\n")
    return result


def evaluate_pipelined(predictor: Predictor, loader: Iterable, *,
                       num_classes: int, ignore_label: int = 255,
                       whole: bool = True,
                       scales: Sequence[float] = (1.0,),
                       flip: bool = False,
                       tile_size: Tuple[int, int] = (769, 769),
                       align_corner: bool = False, fps_warmup: int = 5,
                       flush_every: int = 128,
                       result_file: Optional[str] = None,
                       result_tag: str = "") -> Dict:
    """Throughput-mode eval: no per-image host sync.

    The protocol loop (:func:`evaluate`) brackets every image with a
    host fetch (reference evaluate.py:327-337) — over a tunneled or
    remote chip that floors FPS at the round-trip latency regardless of
    device speed.  Here the H2D copy, forwards, argmax and confusion
    update all stay on device and dispatch asynchronously; only the
    (C, C) int32 counts matrix is fetched every ``flush_every`` images
    (bounding int32 overflow), so the loop runs at device speed.

    Covers every probability-averaging mode: whole-image ss takes the
    deploy label path; multi-scale / flip / sliding-window run the same
    device-resident :meth:`Predictor.predict_multiscale` the protocol
    loop uses (per-scale forwards, tile scatter-adds and the final
    argmax never leave the device) — exactly the modes where removing
    the per-image sync pays the most, since each image is several
    forwards.  mIoU is bit-identical to the protocol loop; FPS is the
    wall-clock of the pipelined loop after ``fps_warmup`` images."""
    ss_whole = whole and tuple(scales) == (1.0,) and not flip
    cm_host = np.zeros((num_classes, num_classes), np.float64)
    cm_dev = jnp.zeros((num_classes, num_classes), jnp.int32)
    t0 = None
    n_timed, since_flush, fps = 0, 0, 0.0
    if hasattr(loader, "__len__"):
        fps_warmup = min(fps_warmup, max(len(loader) - 1, 0))

    def flush():
        nonlocal cm_host, cm_dev, since_flush
        cm_host += np.asarray(cm_dev, np.float64)  # syncs all prior work
        cm_dev = jnp.zeros((num_classes, num_classes), jnp.int32)
        since_flush = 0

    for idx, batch in enumerate(loader):
        if idx == fps_warmup and t0 is None:
            flush()
            t0 = time.perf_counter()
        image = batch["img"]
        if "label" not in batch:
            raise ValueError(
                "--pipeline accumulates a confusion matrix on device and "
                "needs labeled batches; this split has no labels — use "
                "the protocol loop (or evaluate_test for submissions)")
        label = batch["label"]
        size_scale = image.shape[1:3]
        if whole and align_corner:
            ph, pw = pad_inf(size_scale)
            if (ph, pw) != size_scale:
                image = np.pad(image,
                               ((0, 0), (0, ph - size_scale[0]),
                                (0, pw - size_scale[1]), (0, 0)))
        if ss_whole and predictor.bucket_quantum:
            # ms/sliding never bucket: per-scale shapes derive from the
            # true (h, w) in the protocol loop too (predict_multiscale)
            h, w = image.shape[1:3]
            bh, bw = bucket_hw((h, w), predictor.bucket_quantum,
                               align_corner)
            if (bh, bw) != (h, w):
                image = np.pad(np.asarray(image),
                               ((0, 0), (0, bh - h), (0, bw - w), (0, 0)))
        dev = jnp.asarray(np.asarray(image))  # async H2D
        if dev.dtype == jnp.uint8:
            # compact item: raw uint8 over the wire (4x less H2D),
            # normalized + pad-masked on device, bitwise-equal logits
            dev = predictor.prep_raw(dev, size_scale)
        if ss_whole:
            out = predictor.predict_whole_labels(dev)
        else:
            out = predictor.predict_multiscale(
                dev, tile_size, scales, num_classes, flip, align_corner,
                whole)
        out = out[:, :size_scale[0], :size_scale[1]]
        lab = np.asarray(label)
        gt = jnp.asarray(lab if lab.dtype == np.uint8
                         else lab.astype(np.int32))
        cm_dev = confusion_update_device(cm_dev, out, gt,
                                         num_classes=num_classes,
                                         ignore_label=ignore_label)
        since_flush += image.shape[0]  # images, not batches: the int32
        # overflow bound is per-image pixel counts (a 1024x2048 image is
        # ~2.1M counts; 128 images stay ~8x under 2^31 even if one
        # confusion cell takes every pixel)
        if t0 is not None:
            n_timed += image.shape[0]
        if since_flush >= flush_every:
            flush()
        if (idx + 1) % 25 == 0 and t0 is not None:
            log.info("eval %d (pipelined): dispatched", idx + 1)
    flush()  # final fetch synchronizes the whole pipeline
    if t0 is not None and n_timed:
        fps = n_timed / (time.perf_counter() - t0)
    return _finalize_eval(cm_host, fps, result_file, result_tag)
