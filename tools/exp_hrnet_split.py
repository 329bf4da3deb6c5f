"""HRNet-W48 deploy: split-executable vs single-program (round 3).

The conclusion of the exp_hrnet{,2,3}.py investigation: compiling the
Pallas upsample-argmax tail in the SAME program as the convs makes XLA
abandon its spatially-tiled convolution strategy for the conv chain
feeding the custom call (head: 18.0 ms fused vs 7.1 ms alone).  Neither
optimization_barrier nor producing channel-major logits natively (via
dot_general or a dedicated Pallas classifier kernel) restores it — any
in-program operand constraint propagates into the conv chain.  The fix
is architectural: body and tail as separate executables
(deploy.make_split_inference_fn + aot_compile_split).

Measured (v5e, 1025x2049 bf16, unpruned HRNetV2-W48 simple head):
  single program: 60.37 ms (16.6 img/s)
  split:          49.34 ms (20.3 img/s)   +22%
  label agreement split vs single: 0.9977 (the tiled conv strategy
  rounds bf16 differently at near-ties; same class of deviation as the
  reference's torch-vs-TRT-fp16).

Usage: python tools/exp_hrnet_split.py
"""

import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("DCFP_COMPILE_CACHE", os.path.expanduser("~/.cache/dcfp_tpu_xla"))
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["DCFP_COMPILE_CACHE"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
import jax.numpy as jnp, numpy as np
from dcfp_tpu.engine.deploy import (aot_compile, aot_compile_split, benchmark,
                                    make_inference_fn,
                                    make_split_inference_fn)
from dcfp_tpu.graph.apply import init_graph
from dcfp_tpu.models.registry import build_model

print("building model...", flush=True)
model = build_model("simple", backbone="hrnetv2w48",
                    backbone_para={"pretrained": False},
                    num_classes=19, align_corner=True, deepsup=False)
params, state = init_graph(model.graph, jax.random.key(0))
shape = (1, 1025, 2049, 3)
rng = np.random.default_rng(0)
image = jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32))

print("compiling split...", flush=True)
body, tail, p = make_split_inference_fn(model.graph, params, state,
                                        dtype=jnp.bfloat16, fold_bn=True,
                                        output="argmax")
run = aot_compile_split(body, tail, p, shape)
r = benchmark(lambda img: run(p, img), image, warmup=5, iters=30)
print(f"HRNet-W48 e2e SPLIT: {r['ms_per_batch']:.2f} ms "
      f"({r['images_per_sec']:.1f} img/s)", flush=True)

print("compiling single...", flush=True)
fn, p1 = make_inference_fn(model.graph, params, state, dtype=jnp.bfloat16,
                           fold_bn=True, output="argmax")
run1 = aot_compile(fn, p1, shape)
r1 = benchmark(lambda img: run1(p1, img), image, warmup=5, iters=30)
print(f"HRNet-W48 e2e SINGLE: {r1['ms_per_batch']:.2f} ms "
      f"({r1['images_per_sec']:.1f} img/s)", flush=True)
a = np.asarray(run(p, image)); b = np.asarray(run1(p1, image))
print("label agreement split vs single:", float((a == b).mean()), flush=True)
