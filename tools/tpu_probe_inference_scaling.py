"""Probe the ViT-S fwd-only throughput-vs-batch inversion (VERDICT r4 weak #3).

Round-4's inference_serving.json showed ViT-S efficientkan bf16 FORWARD-ONLY
dropping 4,667 -> 3,941 img/s from batch 64 -> 256 while the fwd+bwd train
step rises monotonically. Hypothesis: the fused-basis dispatch gates
(`_should_fuse`, 16384/32768-row thresholds) were tuned on fwd+bwd chains —
where the Pallas tiers win by killing the backward's HBM blowup — and the
crossing happens between batch 64 (12,608 rows at T=197) and 256 (50,432
rows), so batch 256 switches to a Pallas fwd that may LOSE to XLA's fused
forward when no backward follows.

Methodology (CLAUDE.md "Measured facts"): chained fwd-only iterations inside
ONE jit via lax.scan (per-dispatch on this transport costs ~2.9 ms and
swamps per-call timing at these sizes); bf16 perturbation stays bf16; warmup
hard-synced; identity-control floor subtracted implicitly by reporting both.

Writes benchmarks/inference_scaling_probe.json.
Usage: python tools/tpu_probe_inference_scaling.py [--steps 20]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def chain_fwd_timer(apply_fn, params, x, steps=20, warmup=2, reps=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(p, x):
        def body(c, _):
            xp = x * (jnp.asarray(1, x.dtype) + c.astype(x.dtype) * 1e-12)
            logits = apply_fn(p, xp)
            return c + jnp.sum(logits.astype(jnp.float32)) * 1e-30, ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=steps)
        return c

    out = None
    for _ in range(warmup):
        out = run(params, x)
    float(np.asarray(out))  # hard-synced warmup (un-synced overlaps the timed window)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(params, x)
        float(np.asarray(out))
        times.append((time.perf_counter() - t0) / steps * 1000)
    return sorted(times)[len(times) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batches", type=int, nargs="+", default=[64, 128, 256])
    ap.add_argument("--impls", nargs="+", default=["auto", "jnp", "pallas"])
    ap.add_argument("--model-type", default="efficientkan")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from kanvit.models import create_model
    from kanvit.ops import dispatch

    geom = dict(chw=(3, 224, 224), n_patches=14, n_blocks=12,
                d_hidden=384, n_heads=6, out_d=1000)
    model = create_model(args.model_type, **geom)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, *geom["chw"])))["params"]
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    # Gate context: which rows each batch presents to the dispatch gates.
    from kanvit.kernels.fused_basis import _should_fuse

    T = geom["n_patches"] ** 2 + 1
    gate_info = {}
    for bs in args.batches:
        rows = bs * T
        gate_info[str(bs)] = {
            "rows": rows,
            # embedder: nin = 3*16*16 = 768, ng = grid 5 + order 3 = 8
            "embed_bspline_fuse": bool(_should_fuse(bs * T - bs, 8 * 768,
                                                    "bspline", 768)),
            # qkv/mapper: nin = 384
            "mapper_bspline_fuse": bool(_should_fuse(rows, 8 * 384,
                                                     "bspline", 384)),
        }
    print(json.dumps({"gates": gate_info}), flush=True)

    def apply_fn(p, x):
        return model.apply({"params": p}, x)

    results = []
    for impl in args.impls:
        dispatch.set_impl(impl)
        for bs in args.batches:
            x = jax.random.normal(jax.random.PRNGKey(1),
                                  (bs, *geom["chw"])).astype(jnp.bfloat16)
            ms = chain_fwd_timer(apply_fn, params, x, steps=args.steps)
            row = {"impl": impl, "batch": bs, "fwd_ms": round(ms, 2),
                   "img_per_sec": round(bs / ms * 1000, 1)}
            results.append(row)
            print(json.dumps(row), flush=True)
    dispatch.set_impl("auto")

    out = {"gates": gate_info, "results": results,
           "device": str(jax.devices()[0]), "model_type": args.model_type,
           "steps": args.steps}
    path = os.path.join(REPO, "benchmarks", "inference_scaling_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
