from .stream import streaming_correct, streaming_metrics

__all__ = ["streaming_correct", "streaming_metrics"]
