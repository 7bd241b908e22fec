"""Does the v5e int8 MXU path pay at ViT-B serving shapes through JAX?

v5e peaks 394.7 int8 TOPs vs 197.4 bf16 TFLOPs — if `lax.dot_general` on
int8 operands (int32 accum) actually hits the native int8 systolic path
through this stack, a weight+activation-quantized serving mode is ~2x on
the matmul-bound variants (vanilla / flash-attn at ViT-B/L). If it ties or
loses (XLA may upconvert), quantized serving is dead on arrival and this
artifact is the tombstone.

Method per CLAUDE.md round-5 measurement rules: repeat-K bodies inside one
lax.scan jit (sub-ms dots overlap the ~1 ms scan-step overhead otherwise),
carry-perturbed operands so XLA cannot CSE repeats, synced warmup, median
of reps. Consumption casts the dot result to bf16 before the reduction so
both dtypes pay the same epilogue bytes (and it models the dequant epilogue
a real quantized path would run).

Writes benchmarks/int8_matmul_probe.json.
Usage: python tools/tpu_probe_int8_matmul.py
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
from jax import lax

K = 8      # dot repeats per scan iteration
STEPS = 10
REPS = 3


def time_dot(n, k, m, dtype, steps=STEPS, reps=REPS):
    """Median ms per single (n,k)x(k,m) dot at the given operand dtype."""
    key = jax.random.PRNGKey(0)
    if dtype == "int8":
        x = jax.random.randint(key, (n, k), -127, 127, jnp.int8)
        w = jax.random.randint(jax.random.PRNGKey(1), (k, m), -127, 127,
                               jnp.int8)

        def one(xp):
            y = lax.dot_general(xp, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            return y.astype(jnp.bfloat16)

        def perturb(x, acc):
            # Value is 0 at runtime (acc ~ 1e-30 sums), but XLA cannot know.
            b = jnp.asarray(acc, jnp.int32).astype(jnp.int8) & 1
            return jnp.bitwise_xor(x, b)
    else:
        dt = jnp.bfloat16 if dtype == "bf16" else jnp.float32
        x = (jax.random.normal(key, (n, k)) * 0.1).astype(dt)
        w = (jax.random.normal(jax.random.PRNGKey(1), (k, m)) * 0.1).astype(dt)

        def one(xp):
            y = lax.dot_general(xp, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            return y.astype(jnp.bfloat16)

        def perturb(x, acc):
            return x * (jnp.asarray(1, x.dtype) + acc.astype(x.dtype) * 1e-12)

    @jax.jit
    def run(x):
        def body(acc, _):
            for _ in range(K):
                y = one(perturb(x, acc))
                acc = acc + jnp.sum(y.astype(jnp.float32)) * 1e-30
            return acc, ()

        c, _ = lax.scan(body, jnp.float32(0), None, length=steps)
        return c

    float(np.asarray(run(x)))  # synced warmup (compile)
    float(np.asarray(run(x)))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(x)
        float(np.asarray(out))
        times.append((time.perf_counter() - t0) / (steps * K) * 1000)
    return sorted(times)[len(times) // 2]


def main():
    print(f"devices: {jax.devices()}", flush=True)
    # ViT-B serving shapes (batch 128: rows = 128*197 = 25216 block tokens)
    # qkv 768->2304, FF1 768->3072, FF2 3072->768; plus an MXU-peak square.
    shapes = {
        "vitb_qkv(25216,768,2304)": (25216, 768, 2304),
        "vitb_ff1(50432,768,3072)": (50432, 768, 3072),
        "vitb_ff2(50432,3072,768)": (50432, 3072, 768),
        "square(8192,8192,8192)": (8192, 8192, 8192),
    }
    out = {"K": K, "steps": STEPS, "rows": {}}
    for name, (n, k, m) in shapes.items():
        row = {}
        flops = 2.0 * n * k * m
        for dtype in ("bf16", "int8"):
            ms = time_dot(n, k, m, dtype)
            row[dtype] = {
                "ms": round(ms, 4),
                "tops": round(flops / (ms * 1e-3) / 1e12, 1),
            }
            print(f"{name:32s} {dtype:5s} {ms:8.4f} ms  "
                  f"{row[dtype]['tops']:6.1f} T", flush=True)
        row["int8_speedup"] = round(row["bf16"]["ms"] / row["int8"]["ms"], 3)
        out["rows"][name] = row
    path = os.path.join(REPO, "benchmarks", "int8_matmul_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
