"""Raw slide image → tissue tiles → features → zero-shot tumor detection.

The loop the reference delegates to external CLAM tooling, end to end:
python examples/extract_and_detect.py /path/to/model slide.png prompts.json
"""

import json
import sys

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from keep_tpu.io.tiles import cut_tiles
from keep_tpu.models.keep import KEEPModel
from keep_tpu.text.tokenizer import WordPieceTokenizer
from keep_tpu.wsi import zero_shot_detection
from keep_tpu.wsi.extract import extract_features
from keep_tpu.zeroshot import build_classifiers_batched, prompt_select


def main(model_path: str, slide_path: str, prompts_path: str):
    # flash kernels only on TPU — on CPU they'd run in the (slow) Pallas
    # interpreter; the XLA path is the right CPU fallback
    model = KEEPModel.from_pretrained(model_path, dtype=jnp.bfloat16,
                                      use_flash=jax.default_backend() == "tpu")
    tokenizer = WordPieceTokenizer.from_pretrained(model_path)

    Image.MAX_IMAGE_PIXELS = None
    slide = np.asarray(Image.open(slide_path).convert("RGB"))
    tiles, coords = cut_tiles(slide, patch_size=256)
    print(f"{len(tiles)} tissue tiles")
    features = extract_features(model, tiles, batch_size=256, resize=True)

    with open(prompts_path) as f:
        prompts = json.load(f)
    encode = lambda ids, m: model.encode_text(jnp.asarray(ids), jnp.asarray(m))
    stack = build_classifiers_batched(
        encode, tokenizer, prompts, {"Normal": 0, "Tumor": 1}, batch_size=512
    )
    ensemble = prompt_select(stack, jnp.asarray(features), topn=50)
    prob = zero_shot_detection(ensemble, jnp.asarray(features), coords,
                               patch_size=256)
    print(f"Tumor probability: {prob:.4f}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
