"""quackflight_spark — a PySpark-native analytics engine.

Re-implements, Spark-first, the query and data-processing capabilities of
the reference system (quackscience/quackflight: a DuckDB-embedded serving
layer exposing a ClickHouse-compatible HTTP API and an Arrow Flight SQL
API — see SURVEY.md). The engine here is Spark SQL / DataFrame + Catalyst;
nothing is delegated to DuckDB (DuckDB appears only as the test oracle).

Layout:
- session.py   — SparkSession factory tuned for OLAP (AQE, Arrow, UTC)
- sources/     — dataset loaders/registration (parquet fixtures, JSON
                 ingest, Arrow interchange)
- operators/   — relational operator suites (scan/filter/join/agg/window/
                 sort/setop) exposed as (spark, sf_dir) -> DataFrame
- functions/   — scalar-function layer incl. ClickHouse-compat (chsql)
                 functions registered at session init
- plans/       — SQL dialect frontend: DuckDB/ClickHouse-isms rewritten to
                 Spark SQL before spark.sql()
- serving/     — protocol layer: ClickHouse HTTP formats, query_id result
                 cache, per-user namespaces, optional Flask/Flight servers
- streaming/   — concurrent append+read parity and Structured Streaming
                 windowed/stateful operators
- pipeline/    — large-scale training-data ops: dedup (exact/minhash-LSH/
                 simhash/ngram-jaccard/embedding), similarity search,
                 multimodal column plumbing, text analysis
"""

__version__ = "0.1.0"

from quackflight_spark.session import get_spark  # noqa: F401
