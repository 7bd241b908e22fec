"""Does the fused int8 kernel (in-register Q/DQ) finally beat bf16?

Round-5 state (benchmarks/int8_static_probe.json): static-calibrated W8A8
wins the isolated ViT-B FF pair 1.47x (1.29 vs 1.90 ms) yet bf16 still won
3 of 4 end-to-end serving cells — the XLA path materializes the int8
activation copy and the f32 dequant in HBM. kanvit/kernels/int8_matmul.py
moves quantization in-register (per-row scales, K resident, bias in the
epilogue): HBM traffic equals the bf16 matmul while the dot runs at the
int8 MXU rate.

This probe times a jitted ViT-B FF pair (FF1 -> relu -> FF2) four ways at
the two serving row counts (batch 64 / 256 x 197 tokens):
  bf16        — the serving baseline,
  int8-stat   — the best XLA int8 path (static scales, pre-quantized w),
  int8-kernel — the fused Pallas kernel (dynamic per-row scales),
plus the single FF1 matmul alone for a dot-level roofline check.

Writes benchmarks/int8_kernel_probe.json.
Usage: python tools/tpu_probe_int8_kernel.py
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

from kanvit.kernels.int8_matmul import int8_linear

D, F = 768, 3072
K, STEPS, REPS = 4, 10, 3


def _q_stat(a, s):
    return jnp.clip(
        jnp.round(a.astype(jnp.float32) / s), -127, 127
    ).astype(jnp.int8)


def idot(xq, wq):
    return lax.dot_general(
        xq, wq, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def make_ff(mode, w1, w2, w1q, s1, w2q, s2, sx1, sx2):
    if mode == "bf16":
        def f(x):
            h = jnp.dot(x, w1.T, preferred_element_type=jnp.float32)
            h = jax.nn.relu(h).astype(jnp.bfloat16)
            y = jnp.dot(h, w2.T, preferred_element_type=jnp.float32)
            return y.astype(jnp.bfloat16)
    elif mode == "int8-stat":
        def f(x):
            xq = _q_stat(x, sx1)
            h = idot(xq, w1q).astype(jnp.float32) * (sx1 * s1)
            h = jax.nn.relu(h)
            hq = _q_stat(h, sx2)
            y = idot(hq, w2q).astype(jnp.float32) * (sx2 * s2)
            return y.astype(jnp.bfloat16)
    else:  # int8-kernel
        def f(x):
            h = int8_linear(x, w1)
            h = jax.nn.relu(h).astype(jnp.bfloat16)
            y = int8_linear(h, w2)
            return y.astype(jnp.bfloat16)
    return f


def make_ff1(mode, w1, w1q, s1, sx1):
    if mode == "bf16":
        def f(x):
            return jnp.dot(
                x, w1.T, preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16)
    elif mode == "int8-stat":
        def f(x):
            xq = _q_stat(x, sx1)
            return (idot(xq, w1q).astype(jnp.float32)
                    * (sx1 * s1)).astype(jnp.bfloat16)
    else:
        def f(x):
            return int8_linear(x, w1).astype(jnp.bfloat16)
    return f


def chain_time(f, x):
    @jax.jit
    def run(x):
        def body(acc, _):
            for _ in range(K):
                xp = x * (jnp.asarray(1, x.dtype)
                          + acc.astype(x.dtype) * 1e-12)
                y = f(xp)
                acc = acc + jnp.sum(y.astype(jnp.float32)) * 1e-30
            return acc, ()

        c, _ = lax.scan(body, jnp.float32(0), None, length=STEPS)
        return c

    float(np.asarray(run(x)))
    float(np.asarray(run(x)))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = run(x)
        float(np.asarray(out))
        ts.append((time.perf_counter() - t0) / (STEPS * K) * 1e3)
    return sorted(ts)[len(ts) // 2]


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    out = {"D": D, "F": F, "K": K, "rows": {}}
    w1n = (rng.normal(size=(F, D)) * 0.03).astype(np.float32)
    w2n = (rng.normal(size=(D, F)) * 0.03).astype(np.float32)
    w1 = jnp.asarray(w1n, jnp.bfloat16)
    w2 = jnp.asarray(w2n, jnp.bfloat16)

    def qw(w32):
        s = np.maximum(np.abs(w32).max(axis=1, keepdims=True), 1e-12) / 127
        return (jnp.asarray(np.clip(np.round(w32 / s), -127, 127),
                            jnp.int8),
                jnp.asarray(s.reshape(-1), jnp.float32))

    w1q, s1 = qw(w1n)
    w2q, s2 = qw(w2n)

    for batch in (64, 256):
        n = batch * 197
        xn = (rng.normal(size=(n, D)) * 0.5).astype(np.float32)
        x = jnp.asarray(xn, jnp.bfloat16)
        h = np.maximum(xn @ w1n.T, 0.0)
        sx1 = float(np.abs(xn).max() / 127)
        sx2 = float(np.abs(h).max() / 127)
        for mode in ("bf16", "int8-stat", "int8-kernel"):
            ff = make_ff(mode, w1, w2, w1q, s1, w2q, s2, sx1, sx2)
            ms = chain_time(ff, x)
            f1 = make_ff1(mode, w1, w1q, s1, sx1)
            ms1 = chain_time(f1, x)
            out["rows"][f"b{batch}/{mode}"] = {
                "ff_pair_ms": round(ms, 4), "ff1_ms": round(ms1, 4),
            }
            print(f"b{batch:3d} {mode:12s} pair {ms:8.4f} ms   "
                  f"ff1 {ms1:8.4f} ms", flush=True)

    path = os.path.join(REPO, "benchmarks", "int8_kernel_probe.json")
    with open(path, "w") as fjson:
        json.dump(out, fjson, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()


