"""simple_etl_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the
reference news-ETL system (MhdIqbalPratama/simple-etl) as an
idiomatic Spark engine: DataFrame/SQL plans optimized by Catalyst,
Structured Streaming for the message-stream paths, and a library of
composable operators (medallion promotion, keyed merge, text
cleaning/search, entity analytics) plus large-scale training-data
operators (dedup, similarity search, text profiling, multimodal
column plumbing).

Layout:
    engine.py      session builder + table catalog
    schema.py      canonical StructTypes per medallion layer
    functions/     scalar Column-expression libraries (clean/text/dates)
    operators/     relational operators (merge, medallion, analytics, entities)
    llm/           training-data pipeline ops (dedup, similarity, textstats, multimodal)
    sources/       batch/stream source + sink builders (parquet, kafka, json)
    streaming/     structured-streaming medallion topologies
"""

__version__ = "0.1.0"

from simple_etl_spark.engine import get_spark, Catalog  # noqa: F401
