from simple_etl_spark.sources.parquet import load_table  # noqa: F401
