from kanvit.utils.torch_init import (
    kaiming_uniform,
    linear_default_weight,
    linear_default_bias,
    trunc_normal,
    uniform_symmetric,
)

__all__ = [
    "kaiming_uniform",
    "linear_default_weight",
    "linear_default_bias",
    "trunc_normal",
    "uniform_symmetric",
]
