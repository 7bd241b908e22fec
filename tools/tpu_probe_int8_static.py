"""Why dynamic W8A8 serving lost, and whether static scales rescue it.

End-to-end int8 serving measured NEGATIVE at ViT-B (vanilla 3,297 vs 3,882
img/s @64, flash-attn 6,142 vs 7,229 — benchmarks/inference_serving.json)
even though the raw int8 dots win 1.26-1.88x. Hypothesis: the per-call
activation max-reduce is a serialization barrier + an extra HBM pass per
Linear, and the f32 dequant epilogue doubles output bytes vs bf16.

This probe times a jitted ViT-B FF pair (LN -> FF1 -> relu -> FF2, the
shape int8 wins hardest at in isolation) three ways:
  bf16      — the serving baseline,
  int8-dyn  — dynamic per-tensor activation scales (the shipped qdot),
  int8-stat — STATIC activation scales (trace-time constants, as offline
              calibration would provide; no max pass, no barrier).

If int8-stat loses too, the negative verdict covers the whole W8A8 family
on this chip and calibration machinery is not worth building.

Writes benchmarks/int8_static_probe.json.
Usage: python tools/tpu_probe_int8_static.py
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

N, D, F = 25216, 768, 3072  # ViT-B batch-128 token rows, width, 4x FF
K, STEPS, REPS = 4, 10, 3


def _q_dyn(a):
    a32 = a.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(a32)), 1e-12) / 127.0
    return jnp.clip(jnp.round(a32 / s), -127, 127).astype(jnp.int8), s


def _q_stat(a, s):
    return jnp.clip(
        jnp.round(a.astype(jnp.float32) / s), -127, 127
    ).astype(jnp.int8)


def make_ff(mode, w1q, s1, w2q, s2, w1, w2, sx1, sx2):
    """Returns f(x) -> bf16 (N, D); weights pre-quantized outside jit for
    the int8 modes (as a serving Predictor would hold them)."""

    def idot(xq, wq):
        return lax.dot_general(
            xq, wq, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    if mode == "bf16":
        def f(x):
            h = jnp.dot(x, w1.T, preferred_element_type=jnp.float32)
            h = jax.nn.relu(h).astype(jnp.bfloat16)
            y = jnp.dot(h, w2.T, preferred_element_type=jnp.float32)
            return y.astype(jnp.bfloat16)
    elif mode == "int8-dyn":
        def f(x):
            xq, sx = _q_dyn(x)
            h = idot(xq, w1q).astype(jnp.float32) * (sx * s1)
            h = jax.nn.relu(h)
            hq, sh = _q_dyn(h)
            y = idot(hq, w2q).astype(jnp.float32) * (sh * s2)
            return y.astype(jnp.bfloat16)
    else:  # int8-stat
        def f(x):
            xq = _q_stat(x, sx1)
            h = idot(xq, w1q).astype(jnp.float32) * (sx1 * s1)
            h = jax.nn.relu(h)
            hq = _q_stat(h, sx2)
            y = idot(hq, w2q).astype(jnp.float32) * (sx2 * s2)
            return y.astype(jnp.bfloat16)
    return f


def chain_time(f, x):
    @jax.jit
    def run(x):
        def body(acc, _):
            for _ in range(K):
                xp = x * (jnp.asarray(1, x.dtype) + acc.astype(x.dtype) * 1e-12)
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
    xn = (rng.normal(size=(N, D)) * 0.5).astype(np.float32)
    w1n = (rng.normal(size=(F, D)) * 0.03).astype(np.float32)
    w2n = (rng.normal(size=(D, F)) * 0.03).astype(np.float32)
    x = jnp.asarray(xn, jnp.bfloat16)
    w1 = jnp.asarray(w1n, jnp.bfloat16)
    w2 = jnp.asarray(w2n, jnp.bfloat16)

    def qw(w32):
        s = np.maximum(np.abs(w32).max(axis=1, keepdims=True), 1e-12) / 127
        return (jnp.asarray(np.clip(np.round(w32 / s), -127, 127),
                            jnp.int8),
                jnp.asarray(s.reshape(-1), jnp.float32))

    w1q, s1 = qw(w1n)
    w2q, s2 = qw(w2n)
    # "calibrated" static activation scales from one float pass (host-side)
    h = np.maximum(xn @ w1n.T, 0.0)
    sx1 = float(np.abs(xn).max() / 127)
    sx2 = float(np.abs(h).max() / 127)

    out = {"shape": [N, D, F], "K": K, "rows": {}}
    for mode in ("bf16", "int8-dyn", "int8-stat"):
        f = make_ff(mode, w1q, s1, w2q, s2, w1, w2, sx1, sx2)
        ms = chain_time(f, x)
        out["rows"][mode] = round(ms, 4)
        print(f"{mode:10s} {ms:8.4f} ms / FF pair", flush=True)
    path = os.path.join(REPO, "benchmarks", "int8_static_probe.json")
    with open(path, "w") as fjson:
        json.dump(out, fjson, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
