"""Quick-start inference — the TPU-native mirror of the reference's
quick_start/keep_inference.py: load the released KEEP checkpoint, preprocess
one image, encode both towers, print the similarity row.

Usage: python examples/keep_inference.py /path/to/KEEP_release example.tif
"""

import sys

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from keep_tpu.models.keep import KEEPModel
from keep_tpu.ops.preprocess import preprocess
from keep_tpu.text.tokenizer import WordPieceTokenizer


def main(model_path: str, image_path: str):
    # flash kernels only on TPU — on CPU they'd run in the (slow) Pallas
    # interpreter; the XLA path is the right CPU fallback
    model = KEEPModel.from_pretrained(model_path, dtype=jnp.bfloat16,
                                      use_flash=jax.default_backend() == "tpu")
    tokenizer = WordPieceTokenizer.from_pretrained(model_path)

    example_text = [
        "an H&E image of breast invasive carcinoma.",
        "an H&E image of normal tissue.",
        "an H&E image of lung adenocarcinoma.",
    ]
    img = np.asarray(Image.open(image_path).convert("RGB"))
    pixels = preprocess(img)  # fused resize→crop→normalize on device
    tok = tokenizer(example_text, max_length=256)

    img_feature = model.encode_image(pixels)
    text_feature = model.encode_text(
        jnp.asarray(tok["input_ids"]), jnp.asarray(tok["attention_mask"])
    )
    print(np.asarray(img_feature @ text_feature.T))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
