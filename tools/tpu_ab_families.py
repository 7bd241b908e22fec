"""Dispatch-threshold A/B for the trig/RBF basis families on TPU.

Round 1 measured cheby/rbf/sine kernels as ties-or-losses vs XLA; round 2's
kernel machinery (row packing, bf16 MXU dots, reciprocal setup) flips the
ViT-S-scale verdict (cheby end-to-end 894 -> 1563 img/s forced-pallas).
This sweep finds the auto-dispatch crossover N per family at the shapes
that matter (d_head=64 projections, bf16), fwd+bwd.

Usage: python tools/tpu_ab_families.py
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from kanvit.kernels import fused_basis as FB
from kanvit.ops import dispatch
from kanvit.ops import kan_bases as K

DT = jnp.bfloat16


def bench(f, *args, n=20):
    o = f(*args)
    leaf = jax.tree.leaves(o)[0]
    float(np.asarray(leaf).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*args)
    leaf = jax.tree.leaves(o)[0]
    float(np.asarray(leaf).ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


def ab(name, pal_fn, jnp_fn, args):
    dispatch.set_impl("pallas")
    t_p = bench(jax.jit(jax.value_and_grad(pal_fn, argnums=(0, 1))), *args)
    dispatch.set_impl("jnp")
    t_j = bench(jax.jit(jax.value_and_grad(jnp_fn, argnums=(0, 1))), *args)
    dispatch.set_impl("auto")
    verdict = "PALLAS" if t_p < t_j else "jnp"
    print(f"{name}: pallas {t_p:7.2f}ms  jnp {t_j:7.2f}ms  -> {verdict}",
          flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    for n in (8192, 16384, 32768, 65536):
        x = (jax.random.normal(key, (n, 64)) * 0.5).astype(DT)

        co = (jax.random.normal(key, (64, 192, 5)) * 0.05).astype(DT)
        ab(f"cheby  64->192 N={n:6d}",
           lambda x, co: (FB.chebykan(jnp.tanh(x), co).astype(jnp.float32) ** 2).mean(),
           lambda x, co: (K.chebykan_forward(jnp.tanh(x), co).astype(jnp.float32) ** 2).mean(),
           (x, co))

        grid = jnp.linspace(-2.0, 2.0, 8)
        sw = (jax.random.normal(key, (64, 64 * 8)) * 0.05).astype(DT)
        ab(f"rbf    64->64  N={n:6d}",
           lambda x, sw: (FB.fastkan(x, None, None, grid, 4.0 / 7, sw, None, None).astype(jnp.float32) ** 2).mean(),
           lambda x, sw: (K.fastkan_forward(x, None, None, grid, 4.0 / 7, sw, None, None).astype(jnp.float32) ** 2).mean(),
           (x, sw))

        freq = jnp.arange(1, 5, dtype=jnp.float32)
        phase = K.sinekan_phase_init(64, 4)
        amp = (jax.random.normal(key, (64, 64, 4)) * 0.05).astype(DT)
        ab(f"sine g4 64->64 N={n:6d}",
           lambda x, a: (FB.sinekan(x, freq, phase, a, None).astype(jnp.float32) ** 2).mean(),
           lambda x, a: (K.sinekan_forward(x, freq, phase, a, None).astype(jnp.float32) ** 2).mean(),
           (x, amp))


main()
