from .ingest import (  # noqa: F401
    dedup_stream,
    extracted_stream,
    run_stream_to_parquet,
    stream_transcripts,
    windowed_turn_counts,
)
