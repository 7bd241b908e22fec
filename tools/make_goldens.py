"""Generate golden parity fixtures by EXECUTING the PyTorch reference.

Runs the reference implementation at /root/reference (read-only) on fixed
seeded inputs, capturing weights and outputs into tests/goldens/*.npz.
Tests then compare kanvit against these files without needing torch or the
reference at test time (SURVEY §4.1 strategy).

Usage: python tools/make_goldens.py  (requires /root/reference + torch)
"""

import os
import sys

import numpy as np
import torch

REF = os.environ.get("KANVIT_REFERENCE", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")
sys.path.insert(0, REF)

from model import VisionTransformer  # noqa: E402
from models.cheby import ChebyKANLayer  # noqa: E402
from models.effkan import KANLinear  # noqa: E402
from models.fastkan import FastKANLayer  # noqa: E402
from models.nfkan import NaiveFourierKANLayer  # noqa: E402
from models.sinekan import SineKANLayer  # noqa: E402
from utils import FlashAttentionFunction  # noqa: E402
from attention import MSA  # noqa: E402


def sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def save(name, **arrays):
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, f"{name}.npz")
    np.savez_compressed(path, **arrays)
    print(f"wrote {path} ({sum(a.size for a in arrays.values())} values)")


def flat_sd(module, prefix=""):
    return {f"sd.{k}": v for k, v in sd(module).items()}


def layer_goldens():
    torch.manual_seed(42)
    x2 = torch.randn(5, 16)
    x3 = torch.randn(2, 5, 16)

    l = KANLinear(16, 8)
    save("layer_effkan", x2=x2.numpy(), x3=x3.numpy(),
         y2=l(x2).detach().numpy(), y3=l(x3).detach().numpy(), **flat_sd(l))

    l = FastKANLayer(16, 8)
    save("layer_fastkan", x2=x2.numpy(), x3=x3.numpy(),
         y2=l(x2).detach().numpy(), y3=l(x3).detach().numpy(), **flat_sd(l))

    l = SineKANLayer(16, 8, grid_size=4)
    save("layer_sinekan", x2=x2.numpy(), x3=x3.numpy(),
         y2=l(x2).detach().numpy(), y3=l(x3).detach().numpy(), **flat_sd(l))

    l = NaiveFourierKANLayer(16, 8, gridsize=5)
    save("layer_fourierkan", x2=x2.numpy(), x3=x3.numpy(),
         y2=l(x2).detach().numpy(), y3=l(x3).detach().numpy(), **flat_sd(l))

    l = ChebyKANLayer(16, 8, 4)
    # Reference collapses leading dims on 3-D input (SURVEY §2.9.1); the
    # golden stores its flat output, kanvit reshapes before comparing.
    save("layer_chebykan", x2=x2.numpy(), x3=x3.numpy(),
         y2=l(x2).detach().numpy(), y3flat=l(x3).detach().numpy(), **flat_sd(l))


def update_grid_golden():
    torch.manual_seed(7)
    l = KANLinear(16, 8)
    x = torch.randn(64, 16)
    before_w = l.spline_weight.detach().numpy().copy()
    l.update_grid(x)
    save("effkan_update_grid", x=x.numpy(), before_spline_weight=before_w,
         after_grid=l.grid.numpy(), after_spline_weight=l.spline_weight.detach().numpy(),
         spline_scaler=l.spline_scaler.detach().numpy(),
         base_weight=l.base_weight.detach().numpy())


def flash_golden():
    torch.manual_seed(3)
    q = torch.randn(2, 3, 50, 16)
    k = torch.randn(2, 3, 50, 16)
    v = torch.randn(2, 3, 50, 16)
    qg, kg, vg = (t.clone().requires_grad_(True) for t in (q, k, v))
    out = FlashAttentionFunction.apply(qg, kg, vg, None, False, 16, 16)
    (out * out).sum().backward()
    save("flash_attention", q=q.numpy(), k=k.numpy(), v=v.numpy(),
         out=out.detach().numpy(), dq=qg.grad.numpy(), dk=kg.grad.numpy(),
         dv=vg.grad.numpy())

    torch.manual_seed(4)
    q = torch.randn(1, 2, 30, 8)
    k = torch.randn(1, 2, 50, 8)
    v = torch.randn(1, 2, 50, 8)
    out = FlashAttentionFunction.apply(q, k, v, None, True, 16, 16)
    save("flash_attention_causal", q=q.numpy(), k=k.numpy(), v=v.numpy(),
         out=out.numpy())


def msa_goldens():
    x = None
    for t in ["vanilla", "efficientkan", "fast", "sine", "cheby", "fourier"]:
        torch.manual_seed(11)
        m = MSA(16, n_heads=2, type=t)
        torch.manual_seed(12)
        x = torch.randn(2, 5, 16)
        y = m(x).detach().numpy()
        save(f"msa_{t}", x=x.numpy(), y=y, **flat_sd(m))


def model_goldens():
    # MNIST ctor shape (model.py:49). cheby/fourier crash at model level
    # in the reference (SURVEY §2.9.1-2) — no goldens possible for them.
    for t in ["vanilla", "efficientkan", "fast", "sine", "flash-attn"]:
        torch.manual_seed(21)
        m = VisionTransformer((1, 28, 28), n_patches=7, n_blocks=2,
                              d_hidden=64, n_heads=2, out_d=10, type=t)
        m.eval()
        torch.manual_seed(22)
        x = torch.randn(2, 1, 28, 28)
        with torch.no_grad():
            y = m(x).numpy()
        save(f"model_{t}", x=x.numpy(), y=y, **flat_sd(m))


if __name__ == "__main__":
    layer_goldens()
    update_grid_golden()
    flash_golden()
    msa_goldens()
    model_goldens()
    print("done")
