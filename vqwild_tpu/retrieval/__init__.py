from vqwild_tpu.retrieval.aggregate import MetricAggregator
from vqwild_tpu.retrieval.clip import ARVRetrievalClip
from vqwild_tpu.retrieval.features import FeatureExtractor, make_fake_feat_fn, make_feat_fn
from vqwild_tpu.retrieval.moment import ARVRetrievalMoment
from vqwild_tpu.retrieval.multiquery import generate_multi_query
from vqwild_tpu.retrieval.trimmed import ARVRetrievalTrimmed

__all__ = [
    "MetricAggregator",
    "ARVRetrievalClip",
    "ARVRetrievalMoment",
    "ARVRetrievalTrimmed",
    "FeatureExtractor",
    "make_feat_fn",
    "make_fake_feat_fn",
    "generate_multi_query",
]
