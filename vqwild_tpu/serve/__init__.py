"""Production serving layer: persistent gallery index + query service.

The reference stops at batch evaluation scripts; serving (an always-on
process answering "which gallery videos match this clip?") is a TPU-native
capability beyond parity: the gallery rides on device (optionally
mesh-sharded over ICI), queries are micro-batched into single MXU
dispatches, and the embedding path is the folded (or int8-quantized)
serving trunk.
"""

from vqwild_tpu.serve.index import GalleryIndex, MomentIndex
from vqwild_tpu.serve.service import QueryService

__all__ = ["GalleryIndex", "MomentIndex", "QueryService"]
