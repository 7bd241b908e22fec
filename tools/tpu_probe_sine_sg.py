"""Isolated cost of the slot-grouped SineKAN qkv projection at the ViT-S
MSA shape (N=50432, H=6, dh=64, ng=4, bf16): sg op vs the vmapped per-head
plain tier, fwd and fwd+bwd (scalar-sync timing).

Usage: python tools/tpu_probe_sine_sg.py
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
from kanvit.ops import kan_bases as K

DT = jnp.bfloat16
N, H, DH, NG = 50432, 6, 64, 4


def timeit(fn, *args, steps=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    float(np.asarray(out))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(np.asarray(out))
    return (time.perf_counter() - t0) / steps * 1e3


def sc(t):
    return jnp.sum(t.astype(jnp.float32))


def main():
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = (jax.random.normal(k1, (N, H * DH)) * 0.5).astype(DT)
    freq = (0.5 + jax.random.uniform(k2, (H, NG))).astype(DT)
    amps = (jax.random.normal(k3, (H, DH, DH, NG)) * 0.05).astype(DT)
    bias = (jax.random.normal(k4, (H, DH)) * 0.05).astype(DT)
    phase = K.sinekan_phase_init(DH, NG)
    g = jnp.ones((N, H * DH), DT)

    f_sg = jax.jit(lambda x, f, a, b: sc(
        FB.sinekan_qkv_grouped(x, f, phase, a, b)))
    print(f"sg fwd (1 proj):       {timeit(f_sg, x, freq, amps, bias):7.2f} ms",
          flush=True)

    def loss_sg(x, f, a, b):
        return (FB.sinekan_qkv_grouped(x, f, phase, a, b).astype(jnp.float32)
                * g.astype(jnp.float32)).sum()

    g_sg = jax.jit(lambda x, f, a, b: sum(
        sc(t) for t in jax.grad(loss_sg, argnums=(0, 1, 2, 3))(x, f, a, b)))
    print(f"sg fwd+bwd (1 proj):   {timeit(g_sg, x, freq, amps, bias):7.2f} ms",
          flush=True)

    # vmapped per-head plain tier (the pre-sg MSA path)
    xh = x.reshape(N, H, DH).transpose(1, 0, 2)

    def vm(xh, f, a, b):
        return jax.vmap(
            lambda xh_h, f_h, a_h, b_h: FB.sinekan(xh_h, f_h, phase, a_h, b_h)
        )(xh, f, a, b)

    f_vm = jax.jit(lambda xh, f, a, b: sc(vm(xh, f, a, b)))
    print(f"vmapped fwd (1 proj):  {timeit(f_vm, xh, freq, amps, bias):7.2f} ms",
          flush=True)

    def loss_vm(xh, f, a, b):
        return jnp.sum(vm(xh, f, a, b).astype(jnp.float32)
                       * g.reshape(N, H, DH).transpose(1, 0, 2)
                       .astype(jnp.float32))

    g_vm = jax.jit(lambda xh, f, a, b: sum(
        sc(t) for t in jax.grad(loss_vm, argnums=(0, 1, 2, 3))(xh, f, a, b)))
    print(f"vmapped fwd+bwd:       {timeit(g_vm, xh, freq, amps, bias):7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
