from keep_tpu.wsi.cascade import CascadeResult, cascade_detect  # noqa: F401
from keep_tpu.wsi.grid import CoordGrid, heatmap_image, refine_grid  # noqa: F401
from keep_tpu.wsi.pipelines import (  # noqa: F401
    score_tiles,
    subtype_class_map,
    tumor_heatmap,
    zero_shot_detection,
    zero_shot_segment,
    zero_shot_subtyping,
)
from keep_tpu.wsi.sharded import (  # noqa: F401
    prompt_select_sharded,
    refined_probs_sharded,
)
