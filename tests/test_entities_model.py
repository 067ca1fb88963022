"""Lazy-init contract of the model-backed NER path: the pipeline
loads once per executor python worker, not once per row or batch."""

from pyspark.sql import functions as F

from simple_etl_spark.engine import Catalog
from simple_etl_spark.operators.articles import silver_articles
from simple_etl_spark.operators.entities import (
    extract_entities,
    model_extractor_factory,
)


def test_model_loads_once_per_worker_not_per_row(spark, sf_dir):
    # defined inline so cloudpickle ships it by value — test modules
    # are not importable on executor python workers
    def _fake_loader():
        import uuid

        tag = uuid.uuid4().hex  # fresh per LOAD, shared by calls after

        def pipe(text):
            return [
                {
                    "word": f"load:{tag}",
                    "entity_group": "ORG",
                    "score": 0.99,
                    "start": 0,
                    "end": len(text),
                }
            ]

        return pipe

    articles = silver_articles(Catalog(spark, sf_dir)).repartition(8)
    n_articles = articles.count()
    assert n_articles >= 100  # the contract is meaningless on a few rows

    extractor = model_extractor_factory(loader=_fake_loader)
    ents = extract_entities(articles, extractor=extractor, text_col="title")
    loads = (
        ents.select(F.col("entity_text").alias("tag")).distinct().count()
    )
    # one row per article came through the pipe...
    assert ents.count() == n_articles
    # ...but the model loaded at most once per worker process (8
    # partitions -> <= 8 workers), nowhere near once per row
    assert 1 <= loads <= 8, f"expected <=8 pipeline loads, saw {loads}"


def test_model_path_truncates_input(spark):
    captured = []

    def loader():
        def pipe(text):
            captured.append(len(text))
            return []

        return pipe

    extractor = model_extractor_factory(loader=loader, max_chars=100)
    extractor("x" * 5000)
    assert captured == [100]
