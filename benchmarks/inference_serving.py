"""Inference / serving benchmark: latency + throughput across batch sizes.

The reference has no inference path at all (training script only, SURVEY
§2.4); kanvit ships ``kanvit.infer.Predictor``. This benchmark measures the
serving-relevant numbers on the real device for the reference MNIST config
and the ViT-S production preset:

- per-batch latency (ms, hard-sync) at batch 1 / 8 / 64 / 256,
- steady-state throughput (images/sec) at the largest batch,
- bf16 vs f32 at ViT-S.

Timing follows CLAUDE.md's measured methodology: dispatch N, hard-sync via a
host read once at the end (block_until_ready returns early on this tunneled
transport); latency is additionally reported as a per-call hard-sync p50
over 20 calls, which is what a serving caller would observe.

Usage: python benchmarks/inference_serving.py [--preset vit-s] [--bf16]
Writes benchmarks/inference_serving.json (one entry per config).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PRESETS = {
    "reference": dict(chw=(1, 28, 28), n_patches=7, n_blocks=4,
                      d_hidden=64, n_heads=2, out_d=10),
    "vit-s": dict(chw=(3, 224, 224), n_patches=14, n_blocks=12,
                  d_hidden=384, n_heads=6, out_d=1000),
    "vit-b": dict(chw=(3, 224, 224), n_patches=14, n_blocks=12,
                  d_hidden=768, n_heads=12, out_d=1000),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="reference", choices=sorted(PRESETS))
    p.add_argument("--model-type", default="efficientkan")
    p.add_argument("--batches", type=int, nargs="+", default=[1, 8, 64, 256])
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--microbatch", type=int, default=None,
                   help="serve each batch as one jitted lax.map over chunks "
                        "of this size (Predictor's microbatch mode)")
    p.add_argument("--quant", default=None, choices=("int8",),
                   help="Predictor int8 W8A8 serving mode")
    p.add_argument("--calibrate", type=int, default=0,
                   help="with --quant int8: calibrate static activation "
                        "scales on this many batches first")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from kanvit.models import create_model

    geom = PRESETS[args.preset]
    model = create_model(args.model_type, **geom)
    chw = geom["chw"]
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *chw)))["params"]
    if args.bf16:
        params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    from kanvit.infer import Predictor

    results = []
    for bs in args.batches:
        mb = args.microbatch if args.microbatch else None
        pred = Predictor(model, params, batch_size=bs,
                         microbatch=mb, quant=args.quant)
        x = jax.random.normal(jax.random.PRNGKey(1), (bs, *chw))
        if args.bf16:
            x = x.astype(jnp.bfloat16)
        if args.quant == "int8" and args.calibrate > 0:
            pred.calibrate(np.asarray(x, np.float32), args.calibrate)
        apply_fn = pred._apply
        # warmup / compile
        for _ in range(3):
            y = apply_fn(params, x)
        float(np.asarray(y).ravel()[0])

        # p50 per-call latency: hard sync each call (serving view)
        lats = []
        for _ in range(20):
            t0 = time.perf_counter()
            y = apply_fn(params, x)
            float(np.asarray(y).ravel()[0])
            lats.append((time.perf_counter() - t0) * 1e3)
        lat_p50 = float(np.percentile(lats, 50))

        # steady-state throughput: unchained dispatch, one sync at the end
        t0 = time.perf_counter()
        ys = [apply_fn(params, x) for _ in range(args.steps)]
        float(np.asarray(ys[-1]).ravel()[0])
        dt = time.perf_counter() - t0
        ips = bs * args.steps / dt

        row = {
            "preset": args.preset,
            "model_type": args.model_type,
            "bf16": args.bf16,
            "quant": (f"{args.quant}-static" if args.quant and
                      args.calibrate > 0 else args.quant),
            "batch": bs,
            "microbatch": mb,
            "latency_p50_ms": round(lat_p50, 2),
            "throughput_images_per_sec": round(ips, 1),
            "device": str(jax.devices()[0]),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    out_path = os.path.join(REPO, "benchmarks", "inference_serving.json")
    existing = []
    if os.path.exists(out_path):
        with open(out_path) as f:
            existing = json.load(f)
    key = lambda r: (r["preset"], r["model_type"], r["bf16"], r["batch"],
                     r.get("microbatch") or 0, r.get("quant") or "")
    merged = {key(r): r for r in existing}
    merged.update({key(r): r for r in results})
    with open(out_path, "w") as f:
        json.dump(sorted(merged.values(), key=key), f, indent=2)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
