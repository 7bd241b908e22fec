"""Long-horizon (40-epoch) digits accuracy for every kanvit variant, plus a
learning-rate sweep showing the recipe under which SineKAN learns.

Completes the framework's own accuracy table (``digits_results.json``): the
round-3 table covered vanilla/efficientkan/fast/cheby only, and sine's
short-horizon non-learning at the reference recipe (Adam 1e-3 — replicated
reference behavior, ``docs/PARITY.md``) left open whether kanvit's sine can
learn under ANY recipe. This runs the missing variants at the reference
recipe and sweeps sine over learning rates.

Dataset: sklearn digits upscaled to 32x32 (deterministic 80/20 split) — the
only real image data available offline. Geometry matches the round-3 table
(4 blocks, d=64, 2 heads; reference ctor scale). Reference training recipe
anchor: Adam lr 1e-3, CE, shuffled batches (reference ``train.py:22-23,88-90``).

Usage: python benchmarks/digits_full.py [--epochs 40] [--out digits_results.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GEOM = dict(chw=(1, 32, 32), n_patches=4, n_blocks=4, d_hidden=64,
            n_heads=2, out_d=10)


def train_eval(variant, x_tr, y_tr, x_te, y_te, epochs, batch_size, lr,
               seed=0):
    import jax
    import jax.numpy as jnp

    from kanvit.models import create_model
    from kanvit.train.state import create_train_state
    from kanvit.train.steps import make_train_step

    model = create_model(variant, **GEOM)
    state = create_train_state(
        model, jax.random.PRNGKey(seed), jnp.zeros((1, *GEOM["chw"])),
        learning_rate=lr,
    )
    step = make_train_step()
    rng = np.random.default_rng(seed)
    n = len(x_tr)
    for _ in range(epochs):
        order = rng.permutation(n)
        for lo in range(0, n - batch_size + 1, batch_size):
            idx = order[lo : lo + batch_size]
            state, _, _ = step(
                state, jnp.asarray(x_tr[idx]), jnp.asarray(y_tr[idx])
            )
    apply = jax.jit(lambda p, x: model.apply({"params": p}, x))
    pad = (-len(x_te)) % batch_size
    x_pad = np.concatenate(
        [x_te, np.zeros((pad, *x_te.shape[1:]), x_te.dtype)]
    )
    logits = np.concatenate([
        np.asarray(apply(state.params, jnp.asarray(x_pad[lo : lo + batch_size])))
        for lo in range(0, len(x_pad), batch_size)
    ])[: len(x_te)]
    return float((logits.argmax(-1) == y_te).mean())


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--variants", nargs="+",
                   default=["sine", "fourier", "flash-attn"])
    p.add_argument("--sine-lrs", nargs="+", type=float,
                   default=[1e-3, 3e-4, 1e-4, 3e-5])
    args = p.parse_args()

    from kanvit.data.datasets import load_digits_dataset

    x_tr, y_tr = load_digits_dataset(train=True)
    x_te, y_te = load_digits_dataset(train=False)
    print(f"digits: {len(x_tr)} train / {len(x_te)} test", flush=True)

    rows = {}
    for v in args.variants:
        t0 = time.time()
        acc = train_eval(v, x_tr, y_tr, x_te, y_te, args.epochs,
                         args.batch_size, 1e-3)
        rows[v] = round(acc, 4)
        print(f"{v}: {acc:.4f} ({time.time()-t0:.0f}s)", flush=True)

    sweep = {}
    if "sine" in args.variants:
        for lr in args.sine_lrs:
            if lr == 1e-3 and "sine" in rows:
                sweep[f"{lr:g}"] = rows["sine"]
                continue
            t0 = time.time()
            acc = train_eval("sine", x_tr, y_tr, x_te, y_te, args.epochs,
                             args.batch_size, lr)
            sweep[f"{lr:g}"] = round(acc, 4)
            print(f"sine lr={lr:g}: {acc:.4f} ({time.time()-t0:.0f}s)",
                  flush=True)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "digits_full.json")
    with open(out_path, "w") as f:
        json.dump({
            "dataset": "sklearn digits 8x8 upscaled to 32x32, 80/20 split",
            "recipe": f"Adam, CE, batch {args.batch_size}, "
                      f"{args.epochs} epochs",
            "geometry": GEOM,
            "test_accuracy_lr1e-3": rows,
            "sine_lr_sweep": sweep,
        }, f, indent=2)
    print(f"wrote {out_path}", flush=True)
