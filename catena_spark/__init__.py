"""catena_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Cistern/catena (a Go time-series storage
engine), rebuilt Spark-first.

Blueprint: SURVEY.md. The reference mount (/root/reference) was empty at
survey time (SURVEY.md §0), so reference citations are given as SURVEY.md
section anchors, which carry the provenance notes.

Layout:
  session.py    — tuned SparkSession factory + parity conf
  tables.py     — catalog/loaders for the 10 driver tables + the canonical
                  (source, metric, ts, value) series view
  registry.py   — query registry backing __spark_entry__.py's contract
  operators/    — relational / timeseries / llm operator families
  sources/      — batch+streaming ingest, partitioned sinks, compaction,
                  retention (catena's storage layer recast on Parquet)
  functions/    — column-level helpers (vector math, text analysis, hashing)
  plans/        — plan-inspection utilities (pushdown/broadcast asserts)
  streaming/    — Structured Streaming operators (watermark, windows, state)
"""

__version__ = "0.1.0"
