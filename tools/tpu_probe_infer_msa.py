"""Bisect the ViT-S fwd-only per-block superlinearity (VERDICT r4 weak #3).

tpu_probe_inference_scaling.py refuted the dispatch-gate hypothesis (jnp
fwd is 4x slower at every batch; pallas == auto) and the 1-vs-12-block
bisect localized the inversion to the blocks: marginal per-block fwd cost
rises 0.905 -> 4.866 ms (14.15 -> 19.0 us/img) from batch 64 -> 256 while
embed+head scales super-linearly. This probe times each block component
fwd-only, chained (CLAUDE.md methodology: lax.scan inside one jit, bf16
perturbation, hard-synced warmup, identity-control floor subtracted) at
batch 64/128/256 to find which component's per-image cost grows.

Components: full block, full MSA, shared-basis sg qkv alone, lanes
attention alone, LN+FF alone.

Writes benchmarks/infer_msa_probe.json.
Usage: python tools/tpu_probe_infer_msa.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from kanvit.layers.attention import MSA, _shared_basis_qkv
from kanvit.layers.transformer import TransformerBlock

T, D, H = 197, 384, 6
DH = D // H
FF = 4 * D
DT = jnp.bfloat16


def chain(fn, x, steps=30, reps=3):
    """Median ms/iteration of fn chained `steps` times inside one jit."""

    @jax.jit
    def run(x):
        def body(c, _):
            xp = x * (jnp.asarray(1, x.dtype) + c.astype(x.dtype) * 1e-12)
            y = fn(xp)
            return c + jnp.sum(y.astype(jnp.float32)) * 1e-30, ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=steps)
        return c

    out = run(x)
    out = run(x)
    float(np.asarray(out))  # hard-synced warmup
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(x)
        float(np.asarray(out))
        times.append((time.perf_counter() - t0) / steps * 1000)
    return sorted(times)[len(times) // 2]


def main():
    print(f"devices: {jax.devices()}", flush=True)
    msa = MSA(D, H, type="efficientkan")
    blk = TransformerBlock(D, H, feedforward_dim=FF, attn_type="efficientkan")
    key = jax.random.PRNGKey(0)
    x0 = (jax.random.normal(key, (1, T, D)) * 0.5).astype(DT)
    pm = jax.tree.map(lambda a: a.astype(DT),
                      msa.init(jax.random.PRNGKey(1), x0)["params"])
    pb = jax.tree.map(lambda a: a.astype(DT),
                      blk.init(jax.random.PRNGKey(2), x0)["params"])

    results = []
    for b in (64, 128, 192, 256):
        x = (jax.random.normal(key, (b, T, D)) * 0.5).astype(DT)
        floor = chain(lambda xp: xp, x)

        comps = {
            "block": lambda xp: blk.apply({"params": pb}, xp),
            "msa": lambda xp: msa.apply({"params": pm}, xp),
            "qkv_sg": lambda xp: sum(
                _shared_basis_qkv(
                    "efficientkan", xp, DH,
                    pm["q_mappings"], pm["k_mappings"], pm["v_mappings"],
                )[1]
            ),
        }

        # lanes attention on fixed-shape q/k/v derived from the input
        from kanvit.kernels.flash_attention import flash_attention_lanes

        def attn(xp):
            return flash_attention_lanes(xp, xp * 0.5, xp * 0.25, H)

        comps["attn_lanes"] = attn

        # LN + FF chain with the block's own params
        pn, p0, p2 = pb["norm2"], pb["ff_0"], pb["ff_2"]

        def ff(xp):
            h = (xp - xp.mean(-1, keepdims=True)) * jax.lax.rsqrt(
                xp.astype(jnp.float32).var(-1, keepdims=True) + 1e-5
            ).astype(xp.dtype) * pn["scale"] + pn["bias"]
            h = jax.nn.relu(h @ p0["weight"].T + p0["bias"])
            return xp + (h @ p2["weight"].T + p2["bias"])

        comps["ln_ff"] = ff

        row = {"batch": b, "floor_ms": round(floor, 3)}
        for name, fn in comps.items():
            ms = chain(fn, x) - floor
            row[name + "_ms"] = round(ms, 3)
            row[name + "_us_img"] = round(ms / b * 1000, 2)
        print(json.dumps(row), flush=True)
        results.append(row)

    path = os.path.join(REPO, "benchmarks", "infer_msa_probe.json")
    with open(path, "w") as f:
        json.dump({"results": results, "device": str(jax.devices()[0]),
                   "geom": {"T": T, "D": D, "H": H, "FF": FF}}, f, indent=2)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
