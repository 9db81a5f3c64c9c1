"""bts_tpu — a TPU-native JAX/XLA/Pallas framework for BTS monocular depth.

A ground-up rebuild of the capabilities of ``clarencechen/bts-fully-tf``
(the TF2/Keras "fully-TF" rewrite of the BTS model, arXiv:1907.10326),
re-designed TPU-first:

- flax.linen modules compiled to XLA (NHWC layout, bf16 compute / f32 params)
- fused Pallas kernels for the hot path: the ``reduction_1x1`` plane head and
  the 2x/4x/8x Local Planar Guidance (LPG) expansion (``bts_tpu.ops.lpg``)
- data parallelism via ``jax.sharding.Mesh`` + ``jax.jit`` shardings with XLA
  collectives over ICI (``bts_tpu.parallel``), not tf.distribute
- on-device fused augmentation pipeline under ``jit`` (``bts_tpu.data``)
- orbax checkpointing, optax AdamW + polynomial LR decay

Reference parity map (reference mount was empty; reconstructed per SURVEY.md):
  bts.py              -> bts_tpu/models/{bts.py,layers.py,encoders/}
  bts_dataloader.py   -> bts_tpu/data/{dataloader.py,augment.py,crops.py}
  bts_main.py         -> bts_tpu/cli/bts_main.py + bts_tpu/training/
  bts_test.py         -> bts_tpu/cli/bts_test.py
  bts_eval.py         -> bts_tpu/cli/bts_eval.py + bts_tpu/evaluation/metrics.py
  bts_sequence.py     -> bts_tpu/cli/bts_sequence.py
  arguments_*.txt     -> arguments/*.txt (same @-file CLI syntax)
"""

__version__ = "0.1.0"

from bts_tpu.config import Config, parse_args  # noqa: F401
