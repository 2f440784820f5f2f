from .transcripts import generate_transcripts, write_transcripts_parquet  # noqa: F401
