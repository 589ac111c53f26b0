"""control_gic_tpu — a TPU-native (JAX/XLA/Pallas) granularity-adaptive
generative image compression framework.

Re-designed from scratch with the capabilities of Control-GIC
(lianqi1008/Control-GIC, ICLR 2025, arXiv 2406.00758): a single VQGAN codec
that serves a continuum of bitrates from one trained model by routing each
spatial region to one of three token granularities (fine 4x4 / medium 8x8 /
coarse 16x16 pixels per latent code) driven by local patch entropy and a
user-supplied (coarse, medium, fine) ratio triple.

Layout:
  ops/        pure-function numerics (entropy, router, VQ, resampling, attention)
  models/     flax.linen modules (encoder, decoder, CGIC codec, LPIPS, PatchGAN)
  coding/     entropy coding (canonical-reference Huffman + bitmap), C++ hot path
  train/      losses, train state, jitted train steps, data pipeline
  parallel/   device-mesh helpers, data/tile sharding, spatial halo exchange
  utils/      checkpointing (orbax), torch-checkpoint porting, metrics, drawing
"""

__version__ = "0.1.0"
