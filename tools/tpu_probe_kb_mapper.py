"""Validate + time the K-blocked streaming tier at the ViT-S trig mapper
shapes on TPU (sine in=768 ng=28 out=384; fourier ng=56).

1. correctness at reduced N vs the XLA closed form (values + dx/dw/dfreq)
2. fwd+bwd timing at N=50176 (B=256): kb kernel vs the XLA path
   (the round-2 status quo for these shapes).

Usage: python tools/tpu_probe_kb_mapper.py
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

DT = jnp.bfloat16
NIN, OUT = 768, 384


def timeit(fn, *args, steps=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(steps)]
    leaf = jax.tree.leaves(outs[-1])[0]
    float(np.asarray(leaf).ravel()[0])
    return (time.perf_counter() - t0) / steps * 1e3


def sine_ref(x, w3d, freq2d, phase):
    b = jnp.sin(x[:, :, None].astype(jnp.float32) * freq2d[0]
                + phase.T[None].astype(jnp.float32))
    return jnp.einsum("nig,gio->no", b, w3d.astype(jnp.float32))


def main():
    print(f"devices: {jax.devices()}", flush=True)
    ng = 28
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)

    # --- correctness at N=2048, f32 ---
    n = 2048
    x = jax.random.normal(ks[0], (n, NIN)) * 0.5
    w = jax.random.normal(ks[1], (ng, NIN, OUT)) * 0.05
    freq2d = (jnp.arange(1, ng + 1.0) / ng).reshape(1, -1)
    phase = jax.random.normal(ks[2], (ng, NIN)) * 0.3
    g = jax.random.normal(ks[3], (n, OUT)) * 0.5
    kb = FB._kb_strategy(x, w)
    print(f"sine kb strategy at (2048,{NIN})x({ng},{NIN},{OUT}): {kb}", flush=True)
    gb, bn, bn_dx, bn_dw = kb[:4] if kb else (4, 128, 128, 128)
    specs = (FB._smem_spec(freq2d), FB._full_vmem_spec(phase))
    axes = (1, 0)
    fam = FB.sine_family(ng)
    y = jax.jit(lambda x, w: FB._fused_fwd_kb(
        x, w, (freq2d, phase), specs, axes, fam, gb, bn))(x, w)
    yr = sine_ref(x, w, freq2d, phase)
    print(f"fwd maxerr: {np.abs(np.asarray(y - yr)).max():.2e}", flush=True)
    dx, dw, dfreq = jax.jit(lambda x, w, g: FB._fused_bwd_kb(
        x, w, g, (freq2d, phase), specs, axes, fam, gb, bn_dx, bn_dw,
        sine_freq_phase=(freq2d, phase)))(x, w, g)
    rx, rw, rf = jax.grad(lambda x, w, f: (sine_ref(x, w, f, phase) * g).sum(),
                          argnums=(0, 1, 2))(x, w, freq2d)
    print(f"dx maxerr: {np.abs(np.asarray(dx - rx)).max():.2e}  "
          f"dw maxerr: {np.abs(np.asarray(dw - rw)).max():.2e}  "
          f"dfreq relerr: {np.abs(np.asarray((dfreq - rf) / (np.abs(np.asarray(rf)) + 1e-3))).max():.2e}",
          flush=True)

    # --- timing at mapper scale, bf16 ---
    n = 50176
    x = (jax.random.normal(ks[0], (n, NIN)) * 0.5).astype(DT)
    w = (jax.random.normal(ks[1], (ng, NIN, OUT)) * 0.05).astype(DT)
    g = (jax.random.normal(ks[3], (n, OUT)) * 0.5).astype(DT)
    kb = FB._kb_strategy(x, w)
    print(f"sine kb strategy at mapper scale: {kb}", flush=True)

    @jax.jit
    def kb_fwd_bwd(x, w, freq2d):
        def loss(ops):
            x, w, f = ops
            y = FB._sine_op(x, w, f, phase.astype(DT), ng)
            return (y.astype(jnp.float32) ** 2).mean()
        return jax.value_and_grad(loss)((x, w, freq2d))

    fp = phase.astype(DT)

    @jax.jit
    def xla_fwd_bwd2(x, w, freq2d):
        def loss(ops):
            x, w, f = ops
            y = sine_ref(x, w, f, fp)
            return (y ** 2).mean()
        return jax.value_and_grad(loss)((x, w, freq2d))

    f16 = freq2d.astype(DT)
    print(f"kb  fwd+bwd @N=50176: {timeit(kb_fwd_bwd, x, w, f16):8.2f} ms", flush=True)
    print(f"xla fwd+bwd @N=50176: {timeit(xla_fwd_bwd2, x, w, f16):8.2f} ms", flush=True)

    # fourier at ng=56
    G = 28
    ngf = 2 * G
    wf = (jax.random.normal(ks[1], (ngf, NIN, OUT)) * 0.05).astype(DT)
    kbf = FB._kb_strategy(x, wf, pair=True)
    print(f"fourier kb strategy: {kbf}", flush=True)

    def fourier_ref(x, w3d):
        kk = jnp.arange(1, G + 1.0)
        xf = x[:, :, None].astype(jnp.float32)
        b = jnp.concatenate([jnp.cos(xf * kk), jnp.sin(xf * kk)], axis=2)
        return jnp.einsum("nig,gio->no", b, w3d.astype(jnp.float32))

    @jax.jit
    def kbf_fwd_bwd(x, w):
        def loss(ops):
            x, w = ops
            y = FB._fourier_op(x, w, G)
            return (y.astype(jnp.float32) ** 2).mean()
        return jax.value_and_grad(loss)((x, w))

    @jax.jit
    def xlaf_fwd_bwd(x, w):
        def loss(ops):
            x, w = ops
            y = fourier_ref(x, w)
            return (y ** 2).mean()
        return jax.value_and_grad(loss)((x, w))

    # fourier correctness quick check at small n on-device
    xs = x[:2048].astype(jnp.float32)
    ws = wf.astype(jnp.float32)
    ykb = jax.jit(lambda x, w: FB._fourier_op(x, w, G))(xs, ws)
    yrf = fourier_ref(xs, ws)
    print(f"fourier fwd maxerr: {np.abs(np.asarray(ykb - yrf)).max():.2e}", flush=True)

    print(f"kb  fourier fwd+bwd @N=50176: {timeit(kbf_fwd_bwd, x, wf):8.2f} ms", flush=True)
    print(f"xla fourier fwd+bwd @N=50176: {timeit(xlaf_fwd_bwd, x, wf):8.2f} ms", flush=True)


main()
