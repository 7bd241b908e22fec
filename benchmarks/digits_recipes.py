"""Accuracy-level A/B of the kanvit optimizer extensions on real data.

The round-5 trainer grew ``--lr-schedule/--warmup-steps``, ``--weight-decay``,
``--clip-grad-norm`` and ``--ema-decay`` (all absent in the reference, which
trains with bare ``Adam(lr=1e-3)`` — ``/root/reference/train.py:22-23``).
Unit tests prove the transforms compute what they claim; this harness proves
they matter at the ACCURACY level, on the same 40-epoch digits workload as
``digits_full.py`` (sklearn digits upscaled to 32x32, deterministic 80/20
split — the only real image data available offline).

Recipes, per variant:
  base        Adam 1e-3, constant        (the reference recipe; table anchor)
  cosine      + linear warmup (2 epochs) then cosine decay to 0
  modern      cosine + AdamW wd 0.01 + grad clip 1.0 + EMA 0.99 eval weights

Usage: python benchmarks/digits_recipes.py [--epochs 40]
Writes digits_recipes.json next to this file.
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

RECIPES = {
    "base": dict(),
    "cosine": dict(lr_schedule="cosine", warmup_epochs=2),
    "modern": dict(lr_schedule="cosine", warmup_epochs=2, weight_decay=0.01,
                   clip_grad_norm=1.0, ema_decay=0.99),
}


def train_eval(variant, recipe, x_tr, y_tr, x_te, y_te, epochs, batch_size,
               lr, seed=0):
    import jax
    import jax.numpy as jnp

    from kanvit.models import create_model
    from kanvit.train.state import create_train_state, ema_params
    from kanvit.train.steps import make_train_step

    steps_per_epoch = len(range(0, len(x_tr) - batch_size + 1, batch_size))
    cfg = dict(RECIPES[recipe])
    warmup = cfg.pop("warmup_epochs", 0) * steps_per_epoch
    model = create_model(variant, **GEOM)
    state = create_train_state(
        model, jax.random.PRNGKey(seed), jnp.zeros((1, *GEOM["chw"])),
        learning_rate=lr, warmup_steps=warmup,
        total_steps=epochs * steps_per_epoch, **cfg,
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
    eval_p = ema_params(state)
    eval_p = state.params if eval_p is None else eval_p
    apply = jax.jit(lambda p, x: model.apply({"params": p}, x))
    pad = (-len(x_te)) % batch_size
    x_pad = np.concatenate(
        [x_te, np.zeros((pad, *x_te.shape[1:]), x_te.dtype)]
    )
    logits = np.concatenate([
        np.asarray(apply(eval_p, jnp.asarray(x_pad[lo : lo + batch_size])))
        for lo in range(0, len(x_pad), batch_size)
    ])[: len(x_te)]
    return float((logits.argmax(-1) == y_te).mean())


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--variants", nargs="+",
                   default=["efficientkan", "fast", "cheby", "sine"])
    p.add_argument("--recipes", nargs="+", default=list(RECIPES))
    args = p.parse_args()

    from kanvit.data.datasets import load_digits_dataset

    import jax

    x_tr, y_tr = load_digits_dataset(train=True)
    x_te, y_te = load_digits_dataset(train=False)
    device = str(jax.devices()[0])
    print(f"digits: {len(x_tr)} train / {len(x_te)} test on {device}",
          flush=True)

    rows = {}
    for v in args.variants:
        rows[v] = {}
        for r in args.recipes:
            t0 = time.time()
            acc = train_eval(v, r, x_tr, y_tr, x_te, y_te, args.epochs,
                             args.batch_size, args.lr)
            rows[v][r] = round(acc, 4)
            print(f"{v} / {r}: {acc:.4f} ({time.time()-t0:.0f}s)", flush=True)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "digits_recipes.json")
    with open(out_path, "w") as f:
        json.dump({
            "dataset": "sklearn digits 8x8 upscaled to 32x32, 80/20 split",
            "geometry": GEOM,
            "epochs": args.epochs,
            "batch_size": args.batch_size,
            "device": device,
            "peak_lr": args.lr,
            "recipes": {k: v for k, v in RECIPES.items()
                        if k in args.recipes},
            "test_accuracy": rows,
        }, f, indent=2)
    print(f"wrote {out_path}", flush=True)
