"""Coarse-to-fine cascade WSI sweep — beyond-reference throughput.

The reference (and our default pipelines) encode EVERY level-0 tissue tile
(WSI_evaluation/zeroshot_detection_WSI.py consumes a full CLAM sweep's
features). Most of a slide is confidently normal or confidently tumor; only
decision-boundary regions need full resolution. This module scores the
slide at a coarse pyramid level first (d× downsample ⇒ d² fewer tiles),
then refines ONLY the coarse tiles whose tumor probability falls inside an
uncertainty band around the decision threshold — the WISE-FUSE-style
coarse-to-fine patch selection idea (arXiv:2508.14537), built TPU-first on
the same compiled fixed-shape batched encoder as the plain sweep.

Semantics: the candidate universe is EXACTLY the full sweep's level-0
tissue grid; confident regions inherit their parent's coarse probability,
refined regions get their own level-0 probabilities. With ``margin >= 0.5``
every parent refines and the result equals the plain sweep bit-for-bit
(tested in tests/test_cascade.py). This is an OPT-IN accelerator: the
default pipelines remain exact reference parity.

Quality note: the speed/fidelity tradeoff depends on how well the encoder
agrees across scales — measure on your checkpoint (the CLI prints coarse/
fine agreement; see docs/PERF.md "Cascade sweep" for the synthetic-slide
numbers) before shipping a margin.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CascadeResult:
    """Outcome of :func:`cascade_detect`.

    ``probs``/``coords`` cover the full level-0 candidate grid (refined
    tiles carry their own probability, others their parent's), so the
    standard decision rules run on them unchanged."""

    tumor_prob: float            # fraction of candidate tiles called tumor
    probs: np.ndarray            # [N, C] per level-0 candidate tile
    coords: np.ndarray           # [N, 2] level-0 (x, y)
    refined: np.ndarray          # [N] bool: probability came from level 0
    n_coarse: int                # coarse tiles encoded
    n_fine_encoded: int          # level-0 tiles encoded
    n_fine_total: int            # level-0 tiles a full sweep would encode
    coarse_level: int
    downsample: int

    @property
    def encode_fraction(self) -> float:
        """Encoded tiles (both passes, fine-tile equivalents) over the full
        sweep's; < 1 is the cascade's win. Coarse tiles cost one fine-tile
        encode each (same pixel count)."""
        if self.n_fine_total == 0:
            return 1.0
        return (self.n_coarse + self.n_fine_encoded) / self.n_fine_total


def _candidate_grid(reader, patch_size: int, tissue_fraction: float):
    """The full sweep's level-0 tissue-candidate coords (host-cheap: the
    same ≤2048px-thumbnail mask io.tiles uses; no tile decodes)."""
    from keep_tpu.io.tiles import tissue_mask

    w, h = reader.level_dimensions[0]
    scale = max(1, -(-max(w, h) // 2048))
    overview = np.asarray(reader.get_thumbnail((w // scale, h // scale)))
    mask = tissue_mask(overview)
    sy = h / max(1, overview.shape[0])
    sx = w / max(1, overview.shape[1])
    coords = []
    for y in range(0, h - patch_size + 1, patch_size):
        for x in range(0, w - patch_size + 1, patch_size):
            my0, mx0 = int(y / sy), int(x / sx)
            my1 = max(my0 + 1, int((y + patch_size) / sy))
            mx1 = max(mx0 + 1, int((x + patch_size) / sx))
            if mask[my0:my1, mx0:mx1].mean() >= tissue_fraction:
                coords.append((x, y))
    return np.asarray(coords, np.int64).reshape(-1, 2)


def _encode_probs(model, reader, locs, level, patch_size, classifier,
                  batch_size, scale, resize):
    """Read regions (threaded native decode) → encode → softmax(·scale)
    probs, chunked so decode of chunk N+1 overlaps the device."""
    from keep_tpu.wsi.extract import extract_features
    from keep_tpu.wsi.pipelines import score_tiles

    def chunks():
        for i in range(0, len(locs), batch_size):
            yield reader.read_regions(locs[i:i + batch_size], level,
                                      (patch_size, patch_size))

    feats = extract_features(model, chunks(), batch_size=batch_size,
                             resize=resize)
    return np.asarray(score_tiles(jnp.asarray(classifier),
                                  jnp.asarray(feats), scale=scale))


def cascade_detect(
    model,
    slide,
    classifier,
    *,
    patch_size: int = 224,
    coarse_downsample: int = 4,
    margin: float = 0.15,
    threshold: float = 0.5,
    tumor_class: int = 1,
    tissue_fraction: float = 0.25,
    batch_size: int = 256,
    scale: float = 10.0,
    resize: bool = False,
) -> CascadeResult:
    """Two-pass zero-shot detection over a pyramidal slide.

    ``classifier``: [D, C] (the prompt-ensemble matrix). Parents whose
    coarse tumor probability ``p`` satisfies ``|p - threshold| <= margin``
    refine to their level-0 sub-tiles; others stamp ``p`` onto every
    candidate sub-tile. ``margin >= 0.5`` refines everything (== the plain
    sweep); ``margin = 0`` trusts the coarse pass outright.

    The decision rule matches ``wsi.pipelines.zero_shot_detection``
    (softmax·10, overlap=False: no stencil, threshold on ``tumor_class``);
    the candidate grid has unique coords by construction so the
    first-seen dedup is a no-op. ``resize=True`` routes tiles through the
    torch-bicubic-parity resize to the model's input size (required when
    ``patch_size`` != the encoder's img_size, e.g. the CLI's 256px tiles
    on a 224px tower — the same contract as wsi.extract's h5 path).
    """
    from keep_tpu.io.wsi import open_slide

    if not 0.0 <= margin:
        raise ValueError(f"margin must be >= 0, got {margin}")
    opened = isinstance(slide, (str, bytes)) or hasattr(slide, "__fspath__")
    reader = open_slide(slide) if opened else slide
    try:
        level = reader.best_level_for_downsample(coarse_downsample)
        d = int(round(reader.level_downsamples[level]))
        if level == 0 or d < 2:
            raise ValueError(
                f"slide has no coarse level near downsample "
                f"{coarse_downsample} (levels: {reader.level_downsamples}) "
                f"— use the plain sweep")

        fine = _candidate_grid(reader, patch_size, tissue_fraction)
        n_fine_total = len(fine)
        c = classifier.shape[1]
        if n_fine_total == 0:
            return CascadeResult(0.0, np.zeros((0, c), np.float32),
                                 fine, np.zeros(0, bool), 0, 0, 0, level, d)

        # parent index of each candidate on the (d·ps)-aligned coarse grid
        span = d * patch_size
        parent = fine // span                         # [N, 2] (px, py)
        uniq, inverse = np.unique(parent, axis=0, return_inverse=True)
        coarse_locs = uniq * span                     # level-0 coords
        coarse_probs = _encode_probs(model, reader, coarse_locs, level,
                                     patch_size, classifier, batch_size,
                                     scale, resize)

        p_tumor = coarse_probs[:, tumor_class]
        refine_parent = np.abs(p_tumor - threshold) <= margin
        refined = refine_parent[inverse]              # [N] per candidate

        probs = coarse_probs[inverse].copy()          # inherit parent call
        n_fine_encoded = int(refined.sum())
        if n_fine_encoded:
            fine_probs = _encode_probs(model, reader, fine[refined], 0,
                                       patch_size, classifier, batch_size,
                                       scale, resize)
            probs[refined] = fine_probs

        tumor_prob = float((probs[:, tumor_class] > threshold).mean())
        return CascadeResult(tumor_prob, probs, fine, refined,
                             len(uniq), n_fine_encoded, n_fine_total,
                             level, d)
    finally:
        if opened:
            reader.close()
