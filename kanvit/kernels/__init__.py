"""Pallas TPU kernels with hand-derived custom VJPs.

- ``flash_attention``: tiled online-softmax attention, the TPU-native
  equivalent of the reference's Python-tiled ``FlashAttentionFunction``
  (reference ``utils.py:134-295``).
- ``fused_basis``: one generic basis-expand + MXU-contract kernel
  instantiated for all five KAN basis families, avoiding the HBM round trip
  of materializing the basis tensor.
- ``fused_ffn``: the block's whole pre-LN feed-forward tail in one kernel
  (VMEM-resident intermediate, in-kernel parameter grads). Measured
  negative end-to-end against XLA's step-level fusion — opt-in via
  ``KANVIT_FF=1``; kept as the documented counter-example for when NOT to
  hand-fuse (see the module docstring).

Every kernel has a pure-JAX twin in ``kanvit.ops`` used as ground truth in
tests; dispatch between them is ``kanvit.ops.dispatch``.
"""
