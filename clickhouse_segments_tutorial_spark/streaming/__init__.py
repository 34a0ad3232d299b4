from .stream_segment import StreamingSegmenter

__all__ = ["StreamingSegmenter"]
