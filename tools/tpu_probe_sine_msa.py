"""Decompose the ViT-S sine MSA qkv projection cost on TPU.

SUPERSEDED (round 3): this probes the vmapped-era path with the
pre-calibration harness. The slot-grouped era decomposition — with the
synced-warmup/identity-floor harness that the calibration work showed is
required on this transport — lives in ``tpu_probe_sine_sg_stages.py``,
and the "ideal dot+transcendental ~1-2 ms" estimate below undercounts the
real sin rate (~30 cycles/element, ``tpu_probe_vpu_rates.py``). Kept for
the historical A/B record.

After the in-kernel-dfreq joint backward, sine MSA sits at ~22.4 ms/block
(benchmarks/vits_breakdown_sine.json) of which attention is ~4.3 ms —
leaving ~18 ms for the three per-head SineKAN projections whose ideal
dot+transcendental time is ~1-2 ms. This probe A/Bs the projection stack
(H=6 vmapped heads, N=B*T=50432 rows, nin=out=64, ng=4, the reference's
attention grid size, sinekan.py ctor via model.py:84) to find where the
time goes:

  1. qkv fwd only        (3 sinekan calls, Pallas plain tier)
  2. qkv fwd+bwd         (the number that shows up in the block)
  3. qkv fwd+bwd, KANVIT_PACK=0 (no row packing: half the dot MACs,
     half-empty VPU lanes)
  4. qkv fwd+bwd, forced jnp (XLA fused transcendentals)

Usage: python tools/tpu_probe_sine_msa.py
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

B, T, D, H = 256, 197, 384, 6
DH = D // H
NG = 4
DT = jnp.bfloat16


def timeit(fn, *args, steps=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    print(f"devices: {jax.devices()}", flush=True)
    from kanvit.kernels import fused_basis as FB
    from kanvit.ops import dispatch
    from kanvit.ops import kan_bases as K

    N = B * T
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    xh = (jax.random.normal(ks[0], (H, N, DH)) * 0.5).astype(DT)
    phase = K.sinekan_phase_init(DH, NG).astype(jnp.float32)
    freqs = [jnp.ones((1, NG), DT) * (0.9 + 0.1 * i) for i in range(3)]
    amps = [(jax.random.normal(ks[1 + i], (DH, DH, NG)) * 0.1).astype(DT)
            for i in range(3)]
    biases = [jnp.zeros((DH,), DT) for _ in range(3)]
    gh = (jax.random.normal(ks[7], (H, N, DH)) * 0.5).astype(DT)

    def qkv(xh, amps, freqs):
        outs = []
        for a, f in zip(amps, freqs):
            y = jax.vmap(
                lambda xhh, ah: FB.sinekan(xhh, f[0], phase, ah, None)
            )(xh, jnp.broadcast_to(a, (H, *a.shape)))
            outs.append(y)
        return outs

    def loss(args):
        xh, amps, freqs = args
        outs = qkv(xh, amps, freqs)
        return sum((o.astype(jnp.float32) * gh).sum() for o in outs)

    dispatch.set_impl("pallas")
    fwd = jax.jit(lambda a: [o.astype(jnp.float32).sum() for o in qkv(*a)])
    print(f"1. qkv fwd only (pallas):      "
          f"{timeit(fwd, (xh, amps, freqs)):7.2f} ms", flush=True)
    fb = jax.jit(jax.value_and_grad(loss))
    print(f"2. qkv fwd+bwd (pallas):       "
          f"{timeit(fb, (xh, amps, freqs)):7.2f} ms", flush=True)

    os.environ["KANVIT_PACK"] = "0"
    fb_np = jax.jit(
        lambda a: jax.value_and_grad(loss)(a), static_argnums=()
    )
    # fresh trace (env read at trace time)
    print(f"3. qkv fwd+bwd (pallas, no pack): "
          f"{timeit(fb_np, (xh, amps, freqs)):7.2f} ms", flush=True)
    del os.environ["KANVIT_PACK"]

    dispatch.set_impl("jnp")
    fb_j = jax.jit(jax.value_and_grad(loss))
    print(f"4. qkv fwd+bwd (jnp):          "
          f"{timeit(fb_j, (xh, amps, freqs)):7.2f} ms", flush=True)
    dispatch.set_impl("auto")


if __name__ == "__main__":
    main()
