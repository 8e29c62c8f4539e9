"""vae_lagging_encoder_tpu — TPU-native rebuild of jxhe/vae-lagging-encoder.

A JAX / XLA / Pallas / pjit framework with the full capabilities of the
ICLR 2019 "Lagging Inference Networks and Posterior Collapse in Variational
Autoencoders" reference codebase (He, Spokoyny, Neubig, Berg-Kirkpatrick;
arXiv:1901.05534), re-designed TPU-first:

- LSTM encoder/decoder VAEs for text (Yahoo/Yelp/synthetic) as ``lax.scan``
  cells with the input projection hoisted into one large MXU matmul, and an
  optional Pallas fused recurrent kernel (weights resident in VMEM).
- ResNet encoder + masked-conv PixelCNN decoder VAE for dynamically
  binarized OmniGlot (XLA convs).
- The paper's *aggressive* inference-network training compiled to a single
  on-device ``lax.while_loop`` over a device-resident batch pool, with the
  mutual-information plateau switch-off evaluated in-graph.
- The complete evaluation suite — 500-sample importance-weighted NLL, KL,
  mutual information, active units — as batched on-device reductions.
- Data-parallel training over ICI via ``jax.sharding.Mesh`` + ``psum``.

Reference parity citations use the convention ``<ref>file.py §Component``
(SURVEY.md §2) because the reference mount was empty at build time; see
SURVEY.md's evidence caveat.
"""

__version__ = "0.4.0"  # kept in sync with pyproject.toml

DEFAULT_SEED = 783435  # <ref>text.py §init_config default --seed
