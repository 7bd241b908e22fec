"""Sweep the decoupled dw slab (gb_dw, bn_dw, vmem_limit) at the ViT-S
mapper shapes.

The kb dw kernel's grid is (k, rows) and is step-overhead bound
(tools/tpu_probe_fourier_embed.py: dw-only 40.1 ms at gb=2 vs 26.9 at
gb=8, where fwd OOMs at gb=8). ``_pick_kb`` sizes the dw slab
independently against a raised scoped-VMEM limit (``_DW_VMEM_LIMIT``).
This measures the full kb backward (dx config held fixed at auto) across
dw slab configs, plus the auto strategy end-to-end vs the old coupled one.

Usage: python tools/tpu_probe_dw_slab.py
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
N, NIN, OUT = 50176, 768, 384


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
    ks = jax.random.split(key, 4)
    x = (jax.random.normal(ks[0], (N, NIN)) * 0.5).astype(DT)
    g = (jax.random.normal(ks[3], (N, OUT)) * 0.5).astype(DT)

    # --- sine mapper, ng=28 (auto fwd/dx: gb=2, bn_dx=344) ---
    ng = 28
    w = (jax.random.normal(ks[1], (ng, NIN, OUT)) * 0.05).astype(DT)
    freq2d = (jnp.arange(1, ng + 1.0) / ng).reshape(1, -1).astype(DT)
    phase = (jax.random.normal(ks[2], (ng, NIN)) * 0.3).astype(jnp.float32)
    fam_s = FB.sine_family(ng)
    specs_s = (FB._smem_spec(freq2d), FB._full_vmem_spec(phase))
    auto_s = FB._kb_strategy(x, w)
    print(f"auto sine: {auto_s}", flush=True)
    gb_s, _, bndx_s = auto_s[0], auto_s[1], auto_s[2]

    def sine_bwd(gbw, bn):
        def f(x, w, g):
            dx, dw, df = FB._fused_bwd_kb(
                x, w, g, (freq2d, phase), specs_s, (1, 0), fam_s,
                gb_s, bndx_s, bn, sine_freq_phase=(freq2d, phase),
                gb_dw=gbw)
            return (jnp.sum(dx.astype(jnp.float32))
                    + jnp.sum(dw.astype(jnp.float32)))
        return jax.jit(f)

    for gbw, bn in ((2, 480), (4, 480), (4, 256), (14, 480), (14, 256),
                    (14, 128), (28, 256)):
        if ng % gbw:
            continue
        try:
            t = timeit(sine_bwd(gbw, bn), x, w, g)
            print(f"sine bwd gb_dw={gbw:2d} bn={bn:4d}: {t:7.2f} ms",
                  flush=True)
        except Exception as e:
            print(f"sine bwd gb_dw={gbw:2d} bn={bn:4d}: FAIL "
                  f"{str(e)[:120]}", flush=True)

    # --- fourier mapper, G=28 / ng=56 (auto fwd/dx: gb=2, bn_dx=240) ---
    G = 28
    ngf = 2 * G
    wf = (jax.random.normal(ks[1], (ngf, NIN, OUT)) * 0.05).astype(DT)
    fam_f = FB.fourier_family_kb(G)
    perm = FB._fourier_interleave(G)
    wfi = wf[perm]
    hk = FB._fourier_hk(G)
    specs_f = (FB._smem_spec(hk),)
    auto_f = FB._kb_strategy(x, wf, pair=True, recur=True)
    print(f"auto fourier: {auto_f}", flush=True)
    gb_f, _, bndx_f = auto_f[0], auto_f[1], auto_f[2]

    def fourier_bwd(gbw, bn):
        def f(x, w, g):
            dx, dwi = FB._fused_bwd_kb(
                x, w, g, (hk,), specs_f, (1,), fam_f,
                gb_f, bndx_f, bn, recur=True, gb_dw=gbw)
            return (jnp.sum(dx.astype(jnp.float32))
                    + jnp.sum(dwi.astype(jnp.float32)))
        return jax.jit(f)

    for gbw, bn in ((2, 424), (8, 424), (8, 128), (14, 424), (14, 256),
                    (28, 256)):
        if ngf % gbw or gbw % 2:
            continue
        try:
            t = timeit(fourier_bwd(gbw, bn), x, wfi, g)
            print(f"fourier bwd gb_dw={gbw:2d} bn={bn:4d}: {t:7.2f} ms",
                  flush=True)
        except Exception as e:
            print(f"fourier bwd gb_dw={gbw:2d} bn={bn:4d}: FAIL "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
