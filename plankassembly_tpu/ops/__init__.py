from plankassembly_tpu.ops.matching import (
    batched_match_metrics,
    max_bipartite_matching,
    pairwise_iou_3d,
)

__all__ = ["batched_match_metrics", "max_bipartite_matching", "pairwise_iou_3d"]
