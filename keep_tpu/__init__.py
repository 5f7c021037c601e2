"""keep_tpu — a TPU-native (JAX/XLA/Pallas/pjit) vision-language pathology framework.

Re-designed from scratch with the capabilities of MAGIC-AI4Med/KEEP
(CLIP-style ViT-L/16 + BERT pathology foundation model; see SURVEY.md):

- ``keep_tpu.models``   — pure-functional ViT / BERT encoders + the KEEP facade
  (``encode_image`` / ``encode_text`` API contract of
  reference ``quick_start/keep_inference.py:54-62``).
- ``keep_tpu.ops``      — shared NN ops (layernorm, attention, MLP) and the fused
  device-side preprocessing pipeline (bicubic resize → center-crop → normalize).
- ``keep_tpu.kernels``  — Pallas TPU kernels (flash attention, grid stencils).
- ``keep_tpu.text``     — WordPiece tokenizer (HF-BERT contract, max_length=256).
- ``keep_tpu.zeroshot`` — prompt-ensemble classifier build + screening.
- ``keep_tpu.wsi``      — whole-slide zero-shot detection / segmentation / subtyping
  as vectorized coordinate-grid sweeps (replaces the reference's Python dict loops,
  ``WSI_evaluation/detection_utils.py:39-74``).
- ``keep_tpu.metrics``  — AUROC / Dice / BACC / WF1 / retrieval metrics.
- ``keep_tpu.train``    — contrastive + hierarchical-metric pretraining stack.
- ``keep_tpu.parallel`` — mesh / sharding helpers (DP batch axis, WSI patch axis).
- ``keep_tpu.compat``   — PyTorch checkpoint → JAX pytree converters + local
  hub publishing (``compat.hub``).
- ``keep_tpu.presets``  — the reference's 62 OpenCLIP arch presets as native
  config data (all 62 build natively as of round 3).
- ``keep_tpu.serve``    — batching HTTP inference server
  (``python -m keep_tpu.serve``).
"""

__version__ = "0.1.0"

from keep_tpu import configs  # noqa: F401
from keep_tpu.factory import create_model, list_models  # noqa: F401
