"""Elementwise-op rate probe: what does a transcendental actually cost?

Times one elementwise op over a ViT-S basis-sized f32 tile, chained through
a lax.scan carry inside ONE jit (the per-dispatch floor on this tunneled
transport is ~2.9 ms — see CLAUDE.md). The harness details matter on this
transport and got a first version of this probe badly wrong:

- The warmup call MUST be synced (``float(run(x))``) — an un-synced warmup
  overlaps the timed window and produced numbers where sin looked cheaper
  than a multiply.
- An identity control measures the carry-update floor (read+write the
  700 MB carry, ~3.6 ms ≈ the chip's ~800 GB/s HBM spec) so per-op cost is
  the DELTA, and chaining the op 4x separates ALU cost from bandwidth.

Measured on the v5e (2026-08-18, 50432 x 3456 f32, 20 chained iterations,
median of 3 windows):

    identity  3.61 ms/iter (the HBM floor)
    mul      +0.05   mul x4 +0.06     -> free, fused into the pass
    exp      -0.07   exp x4 -0.07     -> FREE (hardware exponent path)
    sin      +2.22   sin x4 +15.2     -> ~30 cycles/element, REAL cost

So exp-count is not a cost model (the RBF uniform-grid recurrence that cut
8 exps to 2 measured negative end-to-end — ``KANVIT_RBF_RECUR``), but
sin/cos-count IS: the sine family's mapper (~1.1 G sins fwd) and MSA
projections (~77 M sins/projection fwd, sin+cos in bwd) are genuinely
sin-rate-limited, on top of the dfreq gradient machinery
(docs/PERFORMANCE.md "Per-component breakdown").
"""

import time

import jax
import jax.numpy as jnp


def chain(fn, x, steps=20, reps=3):
    @jax.jit
    def run(x):
        def body(c, _):
            return c * 0.999 + fn(c) * 1e-6, ()
        c, _ = jax.lax.scan(body, x, None, length=steps)
        return c.sum()

    float(run(x))  # compile + SYNCED warmup (hard scalar D2H)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(x))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] / steps * 1e3


def main():
    x = jax.random.normal(jax.random.PRNGKey(0), (50432, 3456), jnp.float32)
    floor = chain(lambda v: v, x)
    print(f"identity {floor:7.3f} ms/iter (carry-update HBM floor)")
    for name, fn in [
        ("mul", lambda v: v * 1.0001),
        ("mul4", lambda v: ((v * 1.0001) * 1.0002) * 1.0003 * 0.9999),
        ("exp", lambda v: jnp.exp(-v * v)),
        ("exp4", lambda v: jnp.exp(-jnp.exp(-jnp.exp(-jnp.exp(-v * v))))),
        ("sin", jnp.sin),
        ("sin4", lambda v: jnp.sin(jnp.sin(jnp.sin(jnp.sin(v))))),
    ]:
        t = chain(fn, x)
        print(f"{name:8s} {t:7.3f} ms/iter  (-floor: {t - floor:+7.3f})",
              flush=True)


if __name__ == "__main__":
    main()
