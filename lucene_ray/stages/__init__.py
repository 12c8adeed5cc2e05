"""Stage-class registry: every stateful ``map_batches`` actor stage in one
place (setup in ``__init__`` once per worker, work in ``__call__`` per
batch). Implementations live beside their pipelines; this module is the
discovery surface for users composing their own Dataset plans.
"""

from ..functions.highlight import HighlightStage
from ..pipelines.build import (
    AnalyzerStage,
    DfSampleStage,
    DocMapStage,
    RunWriter,
    SegmentEncoder,
)
from ..pipelines.dedup import MinHashStage, SimHashStage
from ..pipelines.multimodal import ImageDecodeStage
from ..pipelines.search import QueryExecStage

__all__ = [
    "AnalyzerStage",
    "DfSampleStage",
    "DocMapStage",
    "RunWriter",
    "SegmentEncoder",
    "MinHashStage",
    "SimHashStage",
    "ImageDecodeStage",
    "QueryExecStage",
    "HighlightStage",
]
