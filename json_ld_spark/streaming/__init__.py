from .ingest import stream_extract_triples, stream_transcript_source

__all__ = ["stream_extract_triples", "stream_transcript_source"]
