"""Auto-dispatch crossover sweep for the slot-grouped qkv MSA launches.

The ``_should_fuse`` row threshold (n >= 32768) was swept in round 2 on the
PER-HEAD vmapped kernels at d_head=64 (tools/tpu_ab_families.py). The round-3
slot-grouped qkv launches amortize per-launch overhead across ALL heads in
one kernel, so their crossover must scale with total head-rows (n * heads),
not rows alone — at ViT-B batch 128 (n=25216, h=12) the old gate turns the
kernels off exactly where they win (vits_breakdown_*_d768h12.json: cheby MSA
forced-pallas 9.77 ms vs auto 13.78; sine 18.97 vs 28.93).

This times the full MSA module (per-head KAN q/k/v + lanes attention)
fwd+bwd, chained device-side, at a (heads, batch) grid under forced pallas
vs forced jnp, and prints the winner per cell. The gate constant in
``_should_fuse`` is picked from the n*h crossover this measures.

Usage: python tools/tpu_probe_sg_crossover.py [--variants cheby fast sine]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from kanvit.ops import dispatch

T = 197
DH = 64


def chain_timer(loss, p, x, steps=10, warmup=2, reps=3):
    @jax.jit
    def run(p, x):
        def body(c, _):
            l, g = jax.value_and_grad(loss)(p, x, c)
            gs = sum(jnp.sum(t.astype(jnp.float32) ** 2)
                     for t in jax.tree.leaves(g))
            return c + (l.astype(jnp.float32) + gs) * 1e-30, ()
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=steps)
        return c

    for _ in range(warmup):
        out = run(p, x)
    float(np.asarray(out))
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(p, x)
        float(np.asarray(out))
        best.append((time.perf_counter() - t0) / steps * 1000)
    return sorted(best)[len(best) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", nargs="+",
                    default=["cheby", "fast", "sine", "efficientkan"])
    ap.add_argument("--cells", nargs="+",
                    default=["6x64", "6x128", "12x32", "12x64", "12x128"],
                    help="headsxbatch cells")
    args = ap.parse_args()

    from kanvit.layers.attention import MSA

    print(f"devices: {jax.devices()}", flush=True)
    rows = []
    for variant in args.variants:
        for cell in args.cells:
            h, b = (int(v) for v in cell.split("x"))
            d = h * DH
            n = b * T
            msa = MSA(d=d, n_heads=h, type=variant)
            x = jax.random.normal(jax.random.PRNGKey(7), (b, T, d),
                                  jnp.bfloat16)
            p = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16),
                msa.init(jax.random.PRNGKey(8), x)["params"],
            )

            def loss(p, x, c):
                x = (x * (1 + c * 1e-12)).astype(x.dtype)
                return (msa.apply({"params": p}, x)
                        .astype(jnp.float32) ** 2).mean()

            t = {}
            for impl in ("pallas", "jnp"):
                dispatch.set_impl(impl)
                t[impl] = chain_timer(loss, p, x)
            dispatch.set_impl("auto")
            win = "PALLAS" if t["pallas"] < t["jnp"] else "jnp"
            row = dict(variant=variant, heads=h, batch=b, n=n, nh=n * h,
                       pallas_ms=round(t["pallas"], 2),
                       jnp_ms=round(t["jnp"], 2), winner=win)
            rows.append(row)
            print(json.dumps(row), flush=True)

    out = os.path.join(REPO, "benchmarks", "sg_crossover_probe.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
