from mrmr_spark.sources.transcripts import (  # noqa: F401
    generate_snapshots_pandas,
    generate_transcripts_pandas,
    load_table,
    transcripts_from_events,
    write_transcripts_parquet,
)
