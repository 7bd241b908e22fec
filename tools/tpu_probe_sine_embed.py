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

    # Every timed fn returns a SCALAR: returning a tensor makes the final
    # sync transfer it through the tunnel inside the timed window
    # (docs/PERFORMANCE.md measurement-integrity notes).
    def sc(t):
        return jnp.sum(t.astype(jnp.float32))

    f_fwd = jax.jit(lambda x, f, a: sc(FB.sinekan(x, f, phase, a, None)))
    print(f"fwd only:            {timeit(f_fwd, x, freq, amps):8.2f} ms",
          flush=True)

    def loss(x, f, a):
        return (FB.sinekan(x, f, phase, a, None) * g).sum()

    def gsc(argnums):
        gfn = jax.grad(loss, argnums=argnums)
        return jax.jit(lambda x, f, a: sum(sc(t) for t in gfn(x, f, a)))

    print(f"fwd+bwd (dx,df,dw):  {timeit(gsc((0, 1, 2)), x, freq, amps):8.2f} ms",
          flush=True)
    print(f"fwd+bwd (df,dw) [model]: {timeit(gsc((1, 2)), x, freq, amps):8.2f} ms",
          flush=True)
    print(f"fwd+bwd (dx,df):     {timeit(gsc((0, 1)), x, freq, amps):8.2f} ms",
          flush=True)
    print(f"fwd+bwd (dw only):   {timeit(gsc((2,)), x, freq, amps):8.2f} ms",
          flush=True)

    # What the split residual would cost/save: materialize the basis to HBM
    # (bf16) and do dw as one XLA matmul on it.
    def basis_xla(x, f):
        a = (x[:, :, None].astype(jnp.float32) * f.astype(jnp.float32)
             + phase[None].astype(jnp.float32))
        # (N, in, ng) -> (N, ng, in) flat, matching w3d (ng, in, out)
        return jnp.sin(a).transpose(0, 2, 1).astype(DT).reshape(N, NIN * NG)

    f_basis = jax.jit(lambda x, f: jnp.sum(basis_xla(x, f).astype(jnp.float32)))
    print(f"XLA basis material.: {timeit(f_basis, x, freq):8.2f} ms",
          flush=True)
    b = jax.jit(basis_xla)(x, freq)
    f_dwmm = jax.jit(lambda b, g: jnp.sum(jax.lax.dot_general(
        b, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)))
    print(f"XLA dw matmul on it: {timeit(f_dwmm, b, g):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
