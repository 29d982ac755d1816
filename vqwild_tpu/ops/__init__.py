from vqwild_tpu.ops.distance import pairwise_sq_l2, score_matrix
from vqwild_tpu.ops.nms import temporal_nms
from vqwild_tpu.ops.ranking import ranked_retrieval_metrics
from vqwild_tpu.ops.segment_pool import sliding_window_mean, window_mean_from_cumsum

__all__ = [
    "pairwise_sq_l2",
    "score_matrix",
    "temporal_nms",
    "ranked_retrieval_metrics",
    "sliding_window_mean",
    "window_mean_from_cumsum",
]
