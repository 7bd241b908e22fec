"""Stage-level timing of the sine grid-28 mapper (the ViT-S sine embedder,
reference models/sinekan.py:72-91) at the bf16 training shape: fwd alone,
fwd+full bwd, and the bwd decomposed (dx+dfreq vs dw) — to find where the
~70 ms/step (benchmarks/vits_breakdown_sine.json) actually goes and bound
what a split-residual backward could save.

Usage: python tools/tpu_probe_sine_embed.py
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
N, NIN, OUT, NG = 50176, 768, 384, 28


def timeit(fn, *args, steps=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(steps)]
    float(np.asarray(jax.tree.leaves(outs[-1])[0]).ravel()[0])
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    x = (jax.random.normal(k1, (N, NIN)) * 0.5).astype(DT)
    freq = (0.5 + jax.random.uniform(k2, (NG,))).astype(DT)
    amps = (jax.random.normal(k3, (OUT, NIN, NG)) * 0.02).astype(DT)
    phase = K.sinekan_phase_init(NIN, NG)
    g = jnp.ones((N, OUT), DT)

    f_fwd = jax.jit(lambda x, f, a: FB.sinekan(x, f, phase, a, None))
    print(f"fwd only:            {timeit(f_fwd, x, freq, amps):8.2f} ms",
          flush=True)

    def loss(x, f, a):
        return (FB.sinekan(x, f, phase, a, None) * g).sum()

    f_all = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    print(f"fwd+bwd (dx,df,dw):  {timeit(f_all, x, freq, amps):8.2f} ms",
          flush=True)
    f_dx = jax.jit(jax.grad(loss, argnums=(0, 1)))
    print(f"fwd+bwd (dx,df):     {timeit(f_dx, x, freq, amps):8.2f} ms",
          flush=True)
    f_dw = jax.jit(jax.grad(loss, argnums=(2,)))
    print(f"fwd+bwd (dw only):   {timeit(f_dw, x, freq, amps):8.2f} ms",
          flush=True)

    # What the split residual would cost/save: materialize the basis to HBM
    # (bf16) and do dw as one XLA matmul on it.
    def basis_xla(x, f):
        a = (x[:, :, None].astype(jnp.float32) * f.astype(jnp.float32)
             + phase.T[None].astype(jnp.float32))
        return jnp.sin(a).astype(DT).reshape(N, NIN * NG)

    f_basis = jax.jit(basis_xla)
    print(f"XLA basis material.: {timeit(f_basis, x, freq):8.2f} ms",
          flush=True)
    b = f_basis(x, freq)
    f_dwmm = jax.jit(lambda b, g: jax.lax.dot_general(
        b, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    print(f"XLA dw matmul on it: {timeit(f_dwmm, b, g):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
