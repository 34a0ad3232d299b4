from .spec import EventLog, SegmentSpec
from .naive import naive_assignments, serve_segment, serve_membership
from .idempotent import idempotent_assignments
from .micro_batch import MicroBatchSegmenter
from .bucketed_segmenter import BucketedMicroBatchSegmenter
from .event_time import EventTimeSegmenter

__all__ = [
    "EventLog",
    "SegmentSpec",
    "naive_assignments",
    "idempotent_assignments",
    "serve_segment",
    "serve_membership",
    "MicroBatchSegmenter",
    "BucketedMicroBatchSegmenter",
    "EventTimeSegmenter",
]
