"""Operator families (SURVEY.md §2): relational (D), timeseries (B/C),
llm (E). Streaming-only operators (F) live in catena_spark.streaming;
storage/ingest (A) in catena_spark.sources."""
