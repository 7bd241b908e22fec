"""Scanned A/B: Pallas small-path attention vs XLA fused, across the model
shapes kanvit actually runs, to set the dispatch rule for short sequences.

Round 2 concluded "tie at T=197" from per-dispatch timing; the scanned
roofline probe (tools/tpu_probe_attn_roofline.py) showed that measurement
was transport-polluted and the kernel actually wins there (3.495 vs
3.771 ms fwd+bwd at (256,6,197,64) bf16). This probe sweeps the decision
surface with the same scanned methodology (one lax.scan device program per
window, inputs perturbed by a scan-carried zero so XLA cannot hoist).

Usage: python tools/tpu_probe_attn_dispatch.py
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from kanvit.kernels import flash_attention as FA
from kanvit.ops.attention import multi_head_attention

STEPS = 20


def timeit_scanned(op, args, steps=STEPS):
    @jax.jit
    def window(args, zs):
        def body(c, z):
            out = op(*((a + z.astype(a.dtype)) for a in args))
            first = jax.tree.leaves(out)[0]
            return c + first.ravel()[0].astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), zs)
        return c

    zs = jnp.zeros((steps,), jnp.float32)
    float(np.asarray(window(args, zs)))  # compile + warmup
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        c = window(args, zs)
        float(np.asarray(c))
        ts.append((time.perf_counter() - t0) / steps * 1e3)
    return sorted(ts)[1]


def grad_of(attn):
    def f(q, k, v):
        def loss(args):
            return (attn(*args).astype(jnp.float32) ** 2).mean()
        return jax.value_and_grad(loss)((q, k, v))
    return f


def main():
    print(f"devices: {jax.devices()}", flush=True)
    shapes = [
        # (label, B, H, T, d, dtype)
        ("vit-s msa bf16", 256, 6, 197, 64, jnp.bfloat16),
        ("vit-s msa f32", 256, 6, 197, 64, jnp.float32),
        ("ref-mnist msa f32", 128, 2, 50, 32, jnp.float32),
        ("ref-mnist b1024 f32", 1024, 2, 50, 32, jnp.float32),
        ("ref-cifar msa f32", 128, 8, 17, 8, jnp.float32),
        ("vit-s flash blk bf16", 256, 6, 197, 64, jnp.bfloat16),
    ]
    for label, b, h, t, d, dt in shapes:
        q = jax.random.normal(jax.random.PRNGKey(0), (b, h, t, d)).astype(dt)
        k = jax.random.normal(jax.random.PRNGKey(1), (b, h, t, d)).astype(dt)
        v = jax.random.normal(jax.random.PRNGKey(2), (b, h, t, d)).astype(dt)

        def pallas_attn(q, k, v):
            return FA._flash(q, k, v, None, False, 512, 1024)

        def xla_attn(q, k, v):
            return multi_head_attention(q, k, v)

        mp = timeit_scanned(grad_of(pallas_attn), (q, k, v))
        mx = timeit_scanned(grad_of(xla_attn), (q, k, v))
        win = (mx - mp) / mx * 100
        print(f"  {label:22s}: pallas {mp:7.3f}  xla {mx:7.3f} ms "
              f"({win:+.1f}% for pallas)", flush=True)


main()
