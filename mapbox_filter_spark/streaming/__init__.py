from .incremental import incremental_tile_stream, windowed_event_counts

__all__ = ["incremental_tile_stream", "windowed_event_counts"]
