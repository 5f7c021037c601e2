from keep_tpu.text.tokenizer import WordPieceTokenizer  # noqa: F401
