"""Does the round-5 trainer recipe (cosine + warmup + weight decay + EMA)
beat the reference recipe (fixed Adam 1e-3) on real data?

Same data/geometry as the committed digits table
(``benchmarks/digits_full.py``: sklearn digits 32x32, 4 blocks d=64 —
reference ctor scale, 40 epochs), comparing per variant:

  reference recipe:  Adam lr (1e-3, or each variant's best from the
                     committed sweep), no schedule/decay/EMA
                     (= digits_results.json rows)
  tuned recipe:      same peak lr + cosine decay to 0, 5% linear warmup,
                     AdamW wd 0.01, EMA 0.999 evaluated at test time —
                     all CLI-reachable (--lr-schedule cosine
                     --warmup-steps W --weight-decay 0.01 --ema-decay 0.999)

Writes benchmarks/digits_tuned.json.
Usage: python benchmarks/digits_tuned.py [--epochs 40] [--variants ...]
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

# Peak LR per variant: the committed sweep's winners (digits_results.json
# note: sine/fourier prefer 3e-4; everything else uses the reference 1e-3).
PEAK_LR = {"sine": 3e-4, "fourier": 3e-4}


def train_eval(variant, x_tr, y_tr, x_te, y_te, epochs, batch_size, lr,
               tuned, seed=0):
    import jax
    import jax.numpy as jnp

    from kanvit.models import create_model
    from kanvit.train.state import create_train_state, ema_params
    from kanvit.train.steps import make_train_step

    n = len(x_tr)
    steps_per_epoch = (n - batch_size + 1 + batch_size - 1) // batch_size
    total = steps_per_epoch * epochs
    kw = {}
    if tuned:
        kw = dict(lr_schedule="cosine", warmup_steps=max(1, total // 20),
                  total_steps=total, weight_decay=0.01, ema_decay=0.999)
    model = create_model(variant, **GEOM)
    state = create_train_state(
        model, jax.random.PRNGKey(seed), jnp.zeros((1, *GEOM["chw"])),
        learning_rate=lr, **kw,
    )
    step = make_train_step()
    rng = np.random.default_rng(seed)
    for _ in range(epochs):
        order = rng.permutation(n)
        for lo in range(0, n - batch_size + 1, batch_size):
            idx = order[lo : lo + batch_size]
            state, _, _ = step(
                state, jnp.asarray(x_tr[idx]), jnp.asarray(y_tr[idx])
            )
    params = state.params
    if tuned:
        ep = ema_params(state)
        if ep is not None:
            params = ep
    apply = jax.jit(lambda p, x: model.apply({"params": p}, x))
    pad = (-len(x_te)) % batch_size
    x_pad = np.concatenate(
        [x_te, np.zeros((pad, *x_te.shape[1:]), x_te.dtype)]
    )
    logits = np.concatenate([
        np.asarray(apply(params, jnp.asarray(x_pad[lo : lo + batch_size])))
        for lo in range(0, len(x_pad), batch_size)
    ])[: len(x_te)]
    return float((logits.argmax(-1) == y_te).mean())


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--variants", nargs="+",
                   default=["vanilla", "efficientkan", "fast", "sine",
                            "fourier", "cheby", "flash-attn"])
    args = p.parse_args()

    from kanvit.data.datasets import load_digits_dataset

    x_tr, y_tr = load_digits_dataset(train=True)
    x_te, y_te = load_digits_dataset(train=False)
    print(f"digits: {len(x_tr)} train / {len(x_te)} test", flush=True)

    ref_rows, tuned_rows = {}, {}
    for v in args.variants:
        lr = PEAK_LR.get(v, 1e-3)
        for tuned, rows in ((False, ref_rows), (True, tuned_rows)):
            t0 = time.time()
            acc = train_eval(v, x_tr, y_tr, x_te, y_te, args.epochs,
                             args.batch_size, lr, tuned)
            rows[v] = round(acc, 4)
            tag = "tuned" if tuned else "ref  "
            print(f"{v:14s} {tag} lr={lr:g}: {acc:.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "digits_tuned.json")
    with open(out_path, "w") as f:
        json.dump({
            "dataset": "sklearn digits 8x8 upscaled to 32x32, 80/20 split",
            "geometry": GEOM,
            "epochs": args.epochs,
            "peak_lr": {v: PEAK_LR.get(v, 1e-3) for v in args.variants},
            "reference_recipe": ref_rows,
            "tuned_recipe (cosine+warmup+wd0.01+ema0.999)": tuned_rows,
        }, f, indent=2)
    print(f"wrote {out_path}", flush=True)
