"""vqwild_tpu — TPU-native framework for few-shot open-set video-to-video
activity retrieval ("Activity Retrieval in the Wild", ARV) on ActivityNet v1.3.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
dongzhuoyao/video-query-in-the-wild (the "reference"): triplet-trained
3D-ResNet18 embedding backbones (baseline / va / vasa), exact-L2 retrieval in
three regimes (trimmed video, untrimmed clip, untrimmed moment with temporal
NMS), and the full mAP / harmonic-mean / R@N metric suite.

Layout
------
core/       typed config, structured logging, run-dir artifact contract
data/       ARV JSON schemas, split registry, frame sampling, loaders
models/     Flax ResNet18-F2F trunk + va/vasa heads + torch ckpt import
ops/        device kernels: fused preprocess, pairwise L2, ranked AP, pooling
parallel/   device mesh + sharding helpers
train/      pjit data-parallel training loop with EMA visual memory state
retrieval/  the evaluation engine (feature extraction, ranking, metrics)
native/     C++ host-side ranking postprocess (temporal NMS + AP merge)
apps/       CLI entry points
"""

__version__ = "0.1.0"
