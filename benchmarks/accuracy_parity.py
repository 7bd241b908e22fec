"""End-to-end accuracy parity: kanvit vs the executed PyTorch reference.

Trains both frameworks on the same real dataset (sklearn digits, upscaled to
32x32, deterministic 80/20 split — the only real image data available
offline), with the reference's training recipe (Adam 1e-3, CE, shuffled
batches) and the same model geometry, and compares final test accuracy per
variant. This operationalizes BASELINE.json's "test-acc parity per KAN
variant" without network access.

Writes benchmarks/accuracy_parity.json.

Usage: python benchmarks/accuracy_parity.py [--epochs 5] [--variants ...]
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


def train_reference(variant, x_tr, y_tr, x_te, y_te, epochs, batch_size, seed=0):
    import torch

    sys.path.insert(0, os.environ.get("KANVIT_REFERENCE", "/root/reference"))
    from model import VisionTransformer

    torch.manual_seed(seed)
    model = VisionTransformer(
        GEOM["chw"], n_patches=GEOM["n_patches"], n_blocks=GEOM["n_blocks"],
        d_hidden=GEOM["d_hidden"], n_heads=GEOM["n_heads"],
        out_d=GEOM["out_d"], type=variant,
    )
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    crit = torch.nn.CrossEntropyLoss()
    rng = np.random.default_rng(seed)
    xt = torch.tensor(x_tr)
    yt = torch.tensor(y_tr, dtype=torch.long)
    n = len(x_tr)
    model.train()
    for _ in range(epochs):
        order = rng.permutation(n)
        for lo in range(0, n - batch_size + 1, batch_size):
            idx = order[lo : lo + batch_size]
            loss = crit(model(xt[idx]), yt[idx])
            opt.zero_grad(); loss.backward(); opt.step()
    model.eval()
    with torch.no_grad():
        preds = model(torch.tensor(x_te)).argmax(-1).numpy()
    return float((preds == y_te).mean())


def train_kanvit(variant, x_tr, y_tr, x_te, y_te, epochs, batch_size, seed=0):
    import jax
    import jax.numpy as jnp

    from kanvit.models import create_model
    from kanvit.train.state import create_train_state
    from kanvit.train.steps import make_eval_step, make_train_step

    model = create_model(
        variant, chw=GEOM["chw"], n_patches=GEOM["n_patches"],
        n_blocks=GEOM["n_blocks"], d_hidden=GEOM["d_hidden"],
        n_heads=GEOM["n_heads"], out_d=GEOM["out_d"],
    )
    state = create_train_state(
        model, jax.random.PRNGKey(seed), jnp.zeros((1, *GEOM["chw"]))
    )
    step = make_train_step()
    rng = np.random.default_rng(seed)
    n = len(x_tr)
    for _ in range(epochs):
        order = rng.permutation(n)
        for lo in range(0, n - batch_size + 1, batch_size):
            idx = order[lo : lo + batch_size]
            state, _, _ = step(state, jnp.asarray(x_tr[idx]), jnp.asarray(y_tr[idx]))
    apply = jax.jit(lambda p, x: model.apply({"params": p}, x))
    pad = (-len(x_te)) % batch_size
    x_pad = np.concatenate([x_te, np.zeros((pad, *x_te.shape[1:]), x_te.dtype)])
    logits = np.concatenate([
        np.asarray(apply(state.params, jnp.asarray(x_pad[lo : lo + batch_size])))
        for lo in range(0, len(x_pad), batch_size)
    ])[: len(x_te)]
    return float((logits.argmax(-1) == y_te).mean())


def train_kanvit_from_torch_init(variant, x_tr, y_tr, x_te, y_te, epochs,
                                 batch_size, seed=0):
    """Gold-standard dynamics comparison: build the torch reference model,
    import its exact initial weights into kanvit, train both on identical
    batch order, compare test accuracy. Removes init-draw luck entirely.

    Measured (efficientkan, digits, 5 epochs, seed 0): kanvit 0.7139 vs
    reference 0.7194 — equivalent dynamics; per-seed comparisons with
    independent init draws vary by up to ~10pp either way.
    """
    import jax
    import jax.numpy as jnp
    import torch

    sys.path.insert(0, os.environ.get("KANVIT_REFERENCE", "/root/reference"))
    from model import VisionTransformer

    from kanvit.models import create_model
    from kanvit.train.state import create_train_state
    from kanvit.train.steps import make_train_step
    from kanvit.utils.torch_compat import params_from_torch_state_dict

    torch.manual_seed(seed)
    tmodel = VisionTransformer(
        GEOM["chw"], n_patches=GEOM["n_patches"], n_blocks=GEOM["n_blocks"],
        d_hidden=GEOM["d_hidden"], n_heads=GEOM["n_heads"],
        out_d=GEOM["out_d"], type=variant,
    )
    sd = {k: v.detach().numpy().copy() for k, v in tmodel.state_dict().items()}

    model = create_model(
        variant, chw=GEOM["chw"], n_patches=GEOM["n_patches"],
        n_blocks=GEOM["n_blocks"], d_hidden=GEOM["d_hidden"],
        n_heads=GEOM["n_heads"], out_d=GEOM["out_d"],
    )
    state = create_train_state(
        model, jax.random.PRNGKey(seed), jnp.zeros((1, *GEOM["chw"]))
    )
    state = state.replace(
        params=jax.tree.map(jnp.asarray, params_from_torch_state_dict(sd))
    )
    step = make_train_step()
    rng = np.random.default_rng(seed)
    n = len(x_tr)
    for _ in range(epochs):
        order = rng.permutation(n)
        for lo in range(0, n - batch_size + 1, batch_size):
            idx = order[lo : lo + batch_size]
            state, _, _ = step(state, jnp.asarray(x_tr[idx]), jnp.asarray(y_tr[idx]))
    apply = jax.jit(lambda p, x: model.apply({"params": p}, x))
    logits = np.asarray(apply(state.params, jnp.asarray(x_te)))
    acc_k = float((logits.argmax(-1) == y_te).mean())

    # torch side, same init (by construction), same batch order
    opt = torch.optim.Adam(tmodel.parameters(), lr=1e-3)
    crit = torch.nn.CrossEntropyLoss()
    rng = np.random.default_rng(seed)
    xt = torch.tensor(x_tr)
    yt = torch.tensor(y_tr, dtype=torch.long)
    tmodel.train()
    for _ in range(epochs):
        order = rng.permutation(n)
        for lo in range(0, n - batch_size + 1, batch_size):
            idx = order[lo : lo + batch_size]
            loss = crit(tmodel(xt[idx]), yt[idx])
            opt.zero_grad(); loss.backward(); opt.step()
    tmodel.eval()
    with torch.no_grad():
        preds = tmodel(torch.tensor(x_te)).argmax(-1).numpy()
    return acc_k, float((preds == y_te).mean())


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument(
        "--variants", nargs="+",
        default=["vanilla", "efficientkan", "fast", "sine", "flash-attn"],
        help="reference-constructible variants (fourier/cheby crash upstream)",
    )
    p.add_argument("--skip-reference", action="store_true")
    p.add_argument("--same-init", action="store_true",
                   help="import the torch init into kanvit and train both "
                        "on identical batch order (dynamics-only comparison)")
    args = p.parse_args()

    from kanvit.data.datasets import load_digits_dataset

    x_tr, y_tr = load_digits_dataset(train=True)
    x_te, y_te = load_digits_dataset(train=False)
    print(f"digits: {len(x_tr)} train / {len(x_te)} test", flush=True)

    results = {}
    for v in args.variants:
        if args.same_init:
            acc_k, acc_r = train_kanvit_from_torch_init(
                v, x_tr, y_tr, x_te, y_te, args.epochs, args.batch_size
            )
            results[v] = {"kanvit": round(acc_k, 4), "reference": round(acc_r, 4),
                          "gap": round(acc_k - acc_r, 4), "same_init": True}
            print(f"{v} [same-init]: kanvit {acc_k:.4f} vs reference {acc_r:.4f} "
                  f"gap {acc_k - acc_r:+.4f}", flush=True)
            continue
        t0 = time.time()
        acc_k = train_kanvit(v, x_tr, y_tr, x_te, y_te, args.epochs, args.batch_size)
        t_k = time.time() - t0
        if args.skip_reference:
            results[v] = {"kanvit": round(acc_k, 4), "kanvit_sec": round(t_k, 1)}
            print(f"{v}: kanvit {acc_k:.4f} ({t_k:.0f}s)", flush=True)
            continue
        t0 = time.time()
        acc_r = train_reference(v, x_tr, y_tr, x_te, y_te, args.epochs, args.batch_size)
        t_r = time.time() - t0
        results[v] = {
            "kanvit": round(acc_k, 4), "reference": round(acc_r, 4),
            "gap": round(acc_k - acc_r, 4),
            "kanvit_sec": round(t_k, 1), "reference_sec": round(t_r, 1),
        }
        print(f"{v}: kanvit {acc_k:.4f} ({t_k:.0f}s) vs reference {acc_r:.4f} "
              f"({t_r:.0f}s) gap {acc_k - acc_r:+.4f}", flush=True)

    out = {
        "dataset": "sklearn digits 8x8 upscaled to 32x32, 80/20 split",
        "recipe": f"Adam 1e-3, CE, batch {args.batch_size}, {args.epochs} epochs",
        "geometry": GEOM,
        "results": results,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "accuracy_parity.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2, default=str)
    print(f"wrote {path}")
