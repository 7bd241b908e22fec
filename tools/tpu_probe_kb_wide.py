"""Validate + time the relaxed (wide-out) kb picks on TPU.

Round-3's ``_pick_kb`` required the JOINT dw fallback (``bn_dw_j >= 32``,
sized against the default 16M scoped VMEM) even though the dw kernel runs
under the raised ``_DW_VMEM_LIMIT`` — so at out >= 768 (the ViT-B/L trig
mappers) the kb tier silently refused and forced-pallas fell to the
out-blocked tier's per-slab transcendental recompute (sine d=768 embedder:
118.6 ms vs 57.5 jnp). The relaxed retry accepts gb on fwd/dx alone and
requires a raised-budget gb_dw.

This probe checks, at the ViT-B (out=768, N=25088) and ViT-L (out=1024,
N=12544) mapper shapes:
1. correctness of the relaxed-pick kernels vs the XLA closed form
   (values + dx/dw/dfreq), f32 at reduced N;
2. fwd+bwd chained-free timing, kb kernel vs the XLA path, bf16 —
   the number that decides whether ``_kb_eligible`` may advertise these
   shapes to the auto dispatch.

Usage: python tools/tpu_probe_kb_wide.py
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
NIN = 768
NG = 28


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


def fourier_ref(x, w3d, G):
    kk = jnp.arange(1, G + 1.0)
    xf = x[:, :, None].astype(jnp.float32)
    b = jnp.concatenate([jnp.cos(xf * kk), jnp.sin(xf * kk)], axis=2)
    return jnp.einsum("nig,gio->no", b, w3d.astype(jnp.float32))


def run_shape(out, n):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    freq2d = (jnp.arange(1, NG + 1.0) / NG).reshape(1, -1)

    # --- correctness, f32, reduced N ---
    nc = 2048
    x = jax.random.normal(ks[0], (nc, NIN)) * 0.5
    w = jax.random.normal(ks[1], (NG, NIN, out)) * 0.05
    phase = jax.random.normal(ks[2], (NG, NIN)) * 0.3
    g = jax.random.normal(ks[3], (nc, out)) * 0.5
    kb = FB._kb_strategy(x, w, sine=True)
    print(f"[out={out}] sine kb pick (f32): {kb}", flush=True)
    y = jax.jit(lambda x, w, f: FB._sine_op(x, w, f, phase, NG))(
        x, w, freq2d)
    yr = sine_ref(x, w, freq2d, phase)
    err = np.abs(np.asarray(y - yr)).max()
    print(f"[out={out}] sine fwd maxerr: {err:.2e}", flush=True)
    assert err < 2e-3, err
    dx, dw, df = jax.grad(
        lambda x, w, f: (FB._sine_op(x, w, f, phase, NG) * g).sum(),
        argnums=(0, 1, 2))(x, w, freq2d)
    rx, rw, rf = jax.grad(
        lambda x, w, f: (sine_ref(x, w, f, phase) * g).sum(),
        argnums=(0, 1, 2))(x, w, freq2d)
    edx = np.abs(np.asarray(dx - rx)).max()
    edw = np.abs(np.asarray(dw - rw)).max()
    edf = np.abs(np.asarray((df - rf) / (np.abs(np.asarray(rf)) + 1e-3))).max()
    print(f"[out={out}] sine dx {edx:.2e} dw {edw:.2e} dfreq rel {edf:.2e}",
          flush=True)
    assert edx < 5e-2 and edw < 5e-2 and edf < 5e-2, (edx, edw, edf)

    G = 28
    wf = jax.random.normal(ks[1], (2 * G, NIN, out)) * 0.05
    kbf = FB._kb_strategy(x, wf, pair=True, recur=True)
    print(f"[out={out}] fourier kb pick (f32): {kbf}", flush=True)
    ykb = jax.jit(lambda x, w: FB._fourier_op(x, w, G))(x, wf)
    yrf = fourier_ref(x, wf, G)
    # G=28 harmonic recurrence drifts vs the direct closed form; gate on
    # error relative to the output scale (the committed G=3 kernel test
    # covers the exact-math case).
    errf = np.abs(np.asarray(ykb - yrf)).max() / np.abs(np.asarray(yrf)).max()
    print(f"[out={out}] fourier fwd rel maxerr: {errf:.2e}", flush=True)
    assert errf < 1e-3, errf
    fdx, fdw = jax.grad(
        lambda x, w: (FB._fourier_op(x, w, G) * g).sum(), argnums=(0, 1))(
        x, wf)
    frx, frw = jax.grad(
        lambda x, w: (fourier_ref(x, w, G) * g).sum(), argnums=(0, 1))(x, wf)
    efx = (np.abs(np.asarray(fdx - frx)).max()
           / max(np.abs(np.asarray(frx)).max(), 1e-6))
    efw = (np.abs(np.asarray(fdw - frw)).max()
           / max(np.abs(np.asarray(frw)).max(), 1e-6))
    print(f"[out={out}] fourier rel dx {efx:.2e} dw {efw:.2e}", flush=True)
    assert efx < 1e-3 and efw < 1e-3, (efx, efw)

    # --- timing, bf16, mapper-scale N ---
    x = (jax.random.normal(ks[0], (n, NIN)) * 0.5).astype(DT)
    w = (jax.random.normal(ks[1], (NG, NIN, out)) * 0.05).astype(DT)
    wf = (jax.random.normal(ks[1], (2 * G, NIN, out)) * 0.05).astype(DT)
    fp = phase.astype(DT)
    f16 = freq2d.astype(DT)
    print(f"[out={out}] sine kb pick (bf16): "
          f"{FB._kb_strategy(x, w, sine=True)}", flush=True)
    print(f"[out={out}] fourier kb pick (bf16): "
          f"{FB._kb_strategy(x, wf, pair=True, recur=True)}", flush=True)

    @jax.jit
    def kb_sine(x, w, f):
        def loss(ops):
            x, w, f = ops
            y = FB._sine_op(x, w, f, fp, NG)
            return (y.astype(jnp.float32) ** 2).mean()
        return jax.value_and_grad(loss)((x, w, f))

    @jax.jit
    def xla_sine(x, w, f):
        def loss(ops):
            x, w, f = ops
            y = sine_ref(x, w, f, fp)
            return (y ** 2).mean()
        return jax.value_and_grad(loss)((x, w, f))

    @jax.jit
    def kb_fourier(x, w):
        def loss(ops):
            x, w = ops
            y = FB._fourier_op(x, w, G)
            return (y.astype(jnp.float32) ** 2).mean()
        return jax.value_and_grad(loss)((x, w))

    @jax.jit
    def xla_fourier(x, w):
        def loss(ops):
            x, w = ops
            y = fourier_ref(x, w, G)
            return (y ** 2).mean()
        return jax.value_and_grad(loss)((x, w))

    print(f"[out={out}] kb  sine    fwd+bwd @N={n}: "
          f"{timeit(kb_sine, x, w, f16):8.2f} ms", flush=True)
    print(f"[out={out}] xla sine    fwd+bwd @N={n}: "
          f"{timeit(xla_sine, x, w, f16):8.2f} ms", flush=True)
    print(f"[out={out}] kb  fourier fwd+bwd @N={n}: "
          f"{timeit(kb_fourier, x, wf):8.2f} ms", flush=True)
    print(f"[out={out}] xla fourier fwd+bwd @N={n}: "
          f"{timeit(xla_fourier, x, wf):8.2f} ms", flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    run_shape(768, 25088)   # ViT-B mapper, batch 128
    run_shape(1024, 12544)  # ViT-L mapper, batch 64
    print("DONE", flush=True)


main()
