"""Headline benchmark: pruned-model throughput at deploy resolution.

Mirrors the reference deploy benchmark (totrt.py:70-89: TensorRT fp16,
batch 1, 1025x2049, 10 warmup + 50 timed): DeepLabV3-ResNet101 is pruned
to 50% FLOPs (the BASELINE.md north-star config), BatchNorm is folded,
the model is AOT-compiled in bfloat16 with on-device argmax output, and
images/sec is host-fetch synchronized (deploy.benchmark fetches one
element of the last output; block_until_ready is unreliable on tunneled
platforms).

``vs_baseline`` is the pruned model's throughput relative to the
*unpruned* model through the identical deploy path — the speedup the
pruning pipeline buys, measured on the same chip.

Variance protocol: each config is timed as DCFP_BENCH_BLOCKS (default 5)
independent 50-iter blocks after one shared warmup; the headline is the
median block and ``detail.spread`` carries per-config min/max plus the
raw block list, so round-over-round deltas can be read against the
measured noise band (``detail.noise_band_pct``).

Prints ONE JSON line.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: repeat bench runs skip the two AOT compiles
_cache = os.environ.get("DCFP_COMPILE_CACHE",
                        os.path.expanduser("~/.cache/dcfp_tpu_xla"))
if _cache and _cache != "0":
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)


def _backend_or_die(timeout_s: float) -> str:
    """Resolve the JAX backend with a watchdog: on a tunneled TPU
    platform, backend init can hang indefinitely when the tunnel is
    wedged (observed 9+ h outages).  Emit an explicit error JSON line
    and exit nonzero instead of hanging the driver."""
    import threading
    out = {}
    probe = threading.Thread(
        target=lambda: out.setdefault("backend", jax.default_backend()),
        daemon=True)
    probe.start()
    probe.join(timeout_s)
    if "backend" not in out:
        print(json.dumps({
            "metric": "deeplabv3_r101_50pct_flops_1025x2049_bf16_img_per_s",
            "value": 0.0, "unit": "img/s", "vs_baseline": 0.0,
            "error": f"TPU backend init hung >{timeout_s:.0f}s "
                     "(tunnel wedged; see docs/ROADMAP.md environment "
                     "quirks)"}))
        sys.stdout.flush()
        os._exit(1)
    return out["backend"]


def main():
    from dcfp_tpu.engine.deploy import aot_compile_best, benchmark, \
        make_split_inference_fn
    from dcfp_tpu.graph.apply import init_graph
    from dcfp_tpu.models.registry import build_model
    from dcfp_tpu.prune.eic import prunable_bn_names
    from dcfp_tpu.prune.search import prune_to_flops

    backend = _backend_or_die(
        float(os.environ.get("DCFP_BENCH_INIT_TIMEOUT", "900")))
    small = (os.environ.get("DCFP_BENCH_SMALL") == "1"
             or backend == "cpu")
    if small:
        shape, warmup, iters, blocks = (1, 257, 513, 3), 2, 5, 2
    else:
        shape, warmup, iters = (1, 1025, 2049, 3), 10, 50
        blocks = int(os.environ.get("DCFP_BENCH_BLOCKS", "5"))

    model = build_model(
        "deeplabv3", backbone="resnet101",
        backbone_para={"os": 8, "mg_unit": [1, 2, 4], "inplanes": 128},
        num_classes=19, align_corner=True, deepsup=False)
    params, state = init_graph(model.graph, jax.random.key(0))

    # Synthetic EIC scores stand in for the 4k-step pretrain accumulation:
    # throughput depends only on which channel *counts* survive, not on
    # which channels the real scores would pick.
    rng = np.random.default_rng(0)
    eic = {bn: np.abs(rng.standard_normal(
        model.graph.node(bn).attrs["channels"])).astype(np.float32)
        for bn in prunable_bn_names(model.graph)}

    result, gp, report = prune_to_flops(
        model.graph, model.graph, params, state, eic, prune_ratio=0.5,
        layer_keep=0.02, except_start_keys=(), channel_align=128)

    # NCHW input — the reference deploy engine's own format (totrt.py:113
    # feeds (1,3,H,W)); on TPU it also dodges the lane-padded thin-C NHWC
    # layout, letting the stem conv run as decimation matmuls (exact).
    nchw = (shape[0], shape[3], shape[1], shape[2])
    image = jnp.asarray(rng.uniform(-1, 1, nchw).astype(np.float32))

    modes = {}
    spread = {}

    def deploy_ips(graph, p, s, batch=1, tag=""):
        b_nchw = (batch,) + nchw[1:]
        b_image = (image if batch == 1 else
                   jnp.asarray(np.repeat(np.asarray(image), batch, 0)))
        # autotune the deploy form: split (Pallas tail in its own
        # executable, preserving XLA's tiled conv strategy) vs single
        # program — briefly timed, faster one runs the full protocol
        body_fn, tail_fn, dev_params = make_split_inference_fn(
            graph, p, s, dtype=jnp.bfloat16, fold_bn=True,
            output="argmax", input_format="nchw")
        compiled, mode = aot_compile_best(
            body_fn, tail_fn, dev_params, b_nchw, input_format="nchw",
            sample=b_image)
        if tag:
            modes[tag] = mode
        # variance protocol: N independent timed blocks; the headline is
        # the median block, detail carries the spread (VERDICT r4 item 2)
        stats = benchmark(lambda img: compiled(dev_params, img),
                          b_image, warmup=warmup, iters=iters,
                          blocks=blocks)
        if tag:
            spread[tag] = {"median_ms": round(stats["ms_per_batch"], 3),
                           "min_ms": stats["ms_min"],
                           "max_ms": stats["ms_max"],
                           "blocks_ms": stats["ms_blocks"]}
        return stats["images_per_sec"]

    base_ips = deploy_ips(model.graph, params, state, tag="unpruned")
    pruned_ips = deploy_ips(result.graph, result.params, result.state,
                            tag="pruned")
    # batch-1 stays the headline (protocol parity with totrt.py:113);
    # batch 4 measures whether img/s/chip — the north-star unit — gains
    # from batching (VERDICT r2 item 4)
    pruned_ips_b4 = deploy_ips(result.graph, result.params, result.state,
                               batch=4, tag="pruned_b4")

    pr = spread.get("pruned", {})
    noise_pct = (100.0 * (pr["max_ms"] - pr["min_ms"]) / pr["median_ms"]
                 if pr else 0.0)
    print(json.dumps({
        "metric": "deeplabv3_r101_50pct_flops_1025x2049_bf16_img_per_s",
        "value": round(pruned_ips, 3),
        "unit": "img/s",
        "vs_baseline": round(pruned_ips / base_ips, 3),
        "detail": {
            "backend": jax.default_backend(),
            "unpruned_img_per_s": round(base_ips, 3),
            "pruned_img_per_s_batch4": round(pruned_ips_b4, 3),
            "global_percent": gp,
            "flops_ratio": round(report["flops_ratio"], 4),
            "deploy_modes": modes,
            "small_mode": small,
            "timing_blocks": blocks,
            "spread": spread,
            "noise_band_pct": round(noise_pct, 2),
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
