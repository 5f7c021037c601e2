from keep_tpu.zeroshot.classifier import (  # noqa: F401
    build_classifier,
    build_classifiers_batched,
    encode_texts_bucketed,
    prompt_select,
    random_ensemble,
    rank_cls_scores,
)
