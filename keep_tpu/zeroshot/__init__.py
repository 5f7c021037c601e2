from keep_tpu.zeroshot.classifier import (  # noqa: F401
    build_classifier,
    build_classifiers_batched,
    prompt_select,
    random_ensemble,
    rank_cls_scores,
)
