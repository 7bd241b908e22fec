from kanvit.layers.kan import (
    KANLinear,
    FastKANLayer,
    SineKANLayer,
    FourierKANLayer,
    ChebyKANLayer,
    TorchLinear,
    make_kan_layer,
)
from kanvit.layers.attention import MSA, FlashAttentionBlock
from kanvit.layers.transformer import TransformerBlock

__all__ = [
    "KANLinear",
    "FastKANLayer",
    "SineKANLayer",
    "FourierKANLayer",
    "ChebyKANLayer",
    "TorchLinear",
    "make_kan_layer",
    "MSA",
    "FlashAttentionBlock",
    "TransformerBlock",
]
