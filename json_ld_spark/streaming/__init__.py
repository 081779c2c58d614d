from .ingest import stream_extract_triples, stream_transcript_source
from .stateful import conversation_stats_stream

__all__ = [
    "conversation_stats_stream",
    "stream_extract_triples",
    "stream_transcript_source",
]
