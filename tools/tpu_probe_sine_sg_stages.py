"""Stage costs of the slot-grouped SineKAN qkv projection (sg era).

Supersedes ``tpu_probe_sine_msa.py``'s vmapped-era decomposition. Uses the
corrected chain harness (SYNCED warmup, identity-control floor, median of
3 windows — see ``tpu_probe_vpu_rates.py`` for why both matter on this
transport). Measured on the v5e at the ViT-S sine MSA shape
(B=256, T=197, D=384, H=6, dh=64, ng=4, bf16), 2026-08-18:

    identity floor            1.18 ms
    sg 1-proj fwd             2.24 ms   (-floor)
    sg 3-proj fwd, distinct   6.44 ms   (no CSE across q/k/v)
    sg 3-proj fwd+param-bwd  13.50 ms

Adding the dx backward and ~2.4 ms of lanes attention reconciles the
19.3 ms/block MSA in ``benchmarks/vits_breakdown_sine.json``. Per
projection that is ~1 ms of sin forward (77 M sins at the probed ~30
cycles/element), ~2 ms sin+cos recompute in the backward, ~1 ms dfreq gw
machinery, and ~0.1 ms of (128, 128) pair dots — i.e. the sine family's
cost is sin-rate plus trainable-frequency gradients, with no dot headroom
(``_sg_slots`` already caps slot groups at one MXU tile).
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from kanvit.kernels import fused_basis as FB
from kanvit.ops import kan_bases as K

B, T, D, H, NG = 256, 197, 384, 6, 4
DH = D // H
N = B * T
DT = jnp.bfloat16


def chain(fn, x, steps=20, reps=3):
    @jax.jit
    def run(x):
        def body(c, _):
            return c * 0.999 + fn(c) * 1e-6, ()
        c, _ = jax.lax.scan(body, x, None, length=steps)
        return c.sum()

    float(run(x))  # compile + SYNCED warmup
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(x))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] / steps * 1e3


def main():
    x2d = jax.random.normal(jax.random.PRNGKey(0), (N, D), DT)
    freqs = [(0.5 + jax.random.uniform(jax.random.PRNGKey(10 + i), (H, NG)))
             .astype(DT) for i in range(3)]
    ampss = [(jax.random.normal(jax.random.PRNGKey(20 + i),
                                (H, DH, DH, NG)) * 0.1).astype(DT)
             for i in range(3)]
    bias = jnp.zeros((H, DH), DT)
    phase = K.sinekan_phase_init(DH, NG).astype(DT)

    floor = chain(lambda x: x, x2d)
    print(f"identity floor          : {floor:7.3f} ms")

    one = lambda x: FB.sinekan_qkv_grouped(
        x, freqs[0], phase, ampss[0], bias).astype(DT)
    t1 = chain(one, x2d)
    print(f"sg 1-proj fwd           : {t1:7.3f}  (-floor {t1 - floor:6.3f})")

    three = lambda x: sum(
        FB.sinekan_qkv_grouped(x, f, phase, a, bias)
        for f, a in zip(freqs, ampss)).astype(DT)
    t3 = chain(three, x2d)
    print(f"sg 3-proj fwd (distinct): {t3:7.3f}  (-floor {t3 - floor:6.3f})")

    def fb3(x):
        def loss(params):
            return sum(
                (FB.sinekan_qkv_grouped(x, f, phase, a, bias) ** 2).sum()
                for f, a in zip(params[0], params[1]))
        l, g = jax.value_and_grad(loss)((freqs, ampss))
        gx = sum(jax.tree.leaves(jax.tree.map(
            lambda v: v.astype(jnp.float32).sum(), g)))
        return x * 0.999 + (gx + l).astype(DT) * 1e-9

    tb = chain(fb3, x2d)
    print(f"sg 3-proj fwd+param-bwd : {tb:7.3f}  (-floor {tb - floor:6.3f})")


if __name__ == "__main__":
    main()
