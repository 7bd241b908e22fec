"""Clean per-component fwd scaling: repeat-K bodies (VERDICT r4 weak #3).

tpu_probe_infer_msa.py's sub-ms component rows are UNDERSTATED: device
compute overlaps the ~1 ms/iteration scan-step overhead on this transport
(its batch-128 LN+FF row implies >100% MFU; its batch-64 lanes-attention
row sits 5x below the exp-throughput floor). Only bodies >> 1 ms are
trustworthy. This probe repeats each component K=8 times inside the scan
body (chaining each repeat through a bf16 perturbation of its own output,
so XLA cannot CSE them) and reports per-image cost at batch 64 vs 256 —
the clean answer to WHICH component's per-row cost rises with batch.

Writes benchmarks/infer_repeat_probe.json.
Usage: python tools/tpu_probe_infer_repeat.py
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
K = 8  # component repeats per scan iteration


def chain_repeat(fn, x, steps=10, reps=3):
    """Median ms per SINGLE fn application; fn repeated K times per scan
    iteration, each repeat perturbed by a scalar derived from the last."""

    @jax.jit
    def run(x):
        def body(c, _):
            acc = c
            for _ in range(K):
                xp = x * (jnp.asarray(1, x.dtype) + acc.astype(x.dtype) * 1e-12)
                y = fn(xp)
                acc = acc + jnp.sum(y.astype(jnp.float32)) * 1e-30
            return acc, ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=steps)
        return c

    out = run(x)
    out = run(x)
    float(np.asarray(out))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(x)
        float(np.asarray(out))
        times.append((time.perf_counter() - t0) / (steps * K) * 1000)
    return sorted(times)[len(times) // 2]


def main():
    print(f"devices: {jax.devices()}", flush=True)
    msa = MSA(D, H, type="efficientkan")
    blk = TransformerBlock(D, H, feedforward_dim=FF, attn_type="efficientkan")
    x0 = (jax.random.normal(jax.random.PRNGKey(0), (1, T, D)) * 0.5).astype(DT)
    pm = jax.tree.map(lambda a: a.astype(DT),
                      msa.init(jax.random.PRNGKey(1), x0)["params"])
    pb = jax.tree.map(lambda a: a.astype(DT),
                      blk.init(jax.random.PRNGKey(2), x0)["params"])

    from kanvit.kernels.flash_attention import flash_attention_lanes

    pn, p0, p2 = pb["norm2"], pb["ff_0"], pb["ff_2"]

    def ff(xp):
        h = (xp - xp.mean(-1, keepdims=True)) * jax.lax.rsqrt(
            xp.astype(jnp.float32).var(-1, keepdims=True) + 1e-5
        ).astype(xp.dtype) * pn["scale"] + pn["bias"]
        h = jax.nn.relu(h @ p0["weight"].T + p0["bias"])
        return xp + (h @ p2["weight"].T + p2["bias"])

    comps = {
        "block": lambda xp: blk.apply({"params": pb}, xp),
        "msa": lambda xp: msa.apply({"params": pm}, xp),
        "qkv_sg": lambda xp: sum(
            _shared_basis_qkv("efficientkan", xp, DH, pm["q_mappings"],
                              pm["k_mappings"], pm["v_mappings"])[1]
        ),
        "attn_lanes": lambda xp: flash_attention_lanes(
            xp, xp * 0.5, xp * 0.25, H
        ),
        "ln_ff": ff,
        "matmul_4d": lambda xp: (xp @ p0["weight"].T),  # bare XLA control
    }

    results = []
    for b in (64, 256):
        x = (jax.random.normal(jax.random.PRNGKey(3), (b, T, D)) * 0.5
             ).astype(DT)
        row = {"batch": b}
        for name, fn in comps.items():
            ms = chain_repeat(fn, x)
            row[name + "_ms"] = round(ms, 3)
            row[name + "_us_img"] = round(ms / b * 1000, 2)
        print(json.dumps(row), flush=True)
        results.append(row)

    path = os.path.join(REPO, "benchmarks", "infer_repeat_probe.json")
    with open(path, "w") as f:
        json.dump({"results": results, "K": K,
                   "device": str(jax.devices()[0])}, f, indent=2)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
