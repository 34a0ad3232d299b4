from .hll_cascade import HllCascadeStreamingSegmenter
from .stateful import ExactStreamingSegmenter, exact_distinct_membership
from .stream_dedup import StreamingDeduper
from .stream_segment import StreamingSegmenter

__all__ = [
    "ExactStreamingSegmenter",
    "HllCascadeStreamingSegmenter",
    "StreamingDeduper",
    "StreamingSegmenter",
    "exact_distinct_membership",
]
