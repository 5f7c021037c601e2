from keep_tpu.metrics.classification import (  # noqa: F401
    auroc,
    auroc_device,
    balanced_accuracy,
    classification_metrics,
    confusion_binary,
    dice_from_counts,
    roc_best_threshold,
    roc_curve,
    sensitivity_specificity,
    weighted_f1,
)
from keep_tpu.metrics.retrieval import clip_retrieval_metrics, retrieval_precision  # noqa: F401
