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


# ---------------------------------------------------------------------------
# Gazetteer tier (VERDICT r8 #7): the zero-dependency production default
# ---------------------------------------------------------------------------

def test_gazetteer_dictionary_matches_any_case():
    from simple_etl_spark.operators.entities import gazetteer_extractor

    # lowercase normalized text still extracts (dictionary tier)
    ents = gazetteer_extractor("rapat dpr di jakarta membahas bank indonesia")
    got = {(e[0].lower(), e[1]) for e in ents}
    assert ("dpr", "ORG") in got
    assert ("jakarta", "LOC") in got
    # longest-first: 'bank indonesia' is ONE ORG, not LOC 'indonesia'
    assert ("bank indonesia", "ORG") in got
    assert ("indonesia", "LOC") not in got


def test_gazetteer_cue_and_title_rules():
    from simple_etl_spark.operators.entities import gazetteer_extractor

    text = ("Presiden Joko Widodo meresmikan Universitas Gadjah Mada "
            "di Kota Semarang")
    ents = gazetteer_extractor(text)
    by_text = {e[0]: e for e in ents}
    # person title stripped, remainder PER
    assert by_text["Joko Widodo"][1] == "PER"
    # ORG cue keeps the cue word
    assert by_text["Universitas Gadjah Mada"][1] == "ORG"
    # gazetteer city wins inside the capitalized run
    assert ("Semarang" in by_text and by_text["Semarang"][1] == "LOC")
    # offsets point at the real span
    e = by_text["Joko Widodo"]
    assert text[e[3]:e[4]] == "Joko Widodo"


def test_gazetteer_bare_capitalized_span_defaults_per():
    from simple_etl_spark.operators.entities import gazetteer_extractor

    ents = gazetteer_extractor("bertemu dengan Sri Mulyani kemarin sore")
    assert [(e[0], e[1]) for e in ents] == [("Sri Mulyani", "PER")]
    # single capitalized word with no cue is skipped (too noisy)
    assert gazetteer_extractor("bertemu Budi kemarin") == []
    # ... but a reporting word licenses it (r11): quote attribution
    # is strong PER evidence in the news register
    assert [(e[0], e[1]) for e in gazetteer_extractor("kata Budi kemarin")] == [
        ("Budi", "PER")
    ]
    # descriptor nouns classify the following name without joining it
    assert [
        (e[0], e[1]) for e in gazetteer_extractor("Stasiun Gambir ramai")
    ] == [("Gambir", "LOC")]
    assert [
        (e[0], e[1]) for e in gazetteer_extractor("Harian Kompas terbit")
    ] == [("Kompas", "ORG")]


def test_gazetteer_is_deterministic_and_sorted():
    from simple_etl_spark.operators.entities import gazetteer_extractor

    text = "Menteri Sri Mulyani dan KPK bertemu di Jakarta"
    a, b = gazetteer_extractor(text), gazetteer_extractor(text)
    assert a == b
    assert [e[3] for e in a] == sorted(e[3] for e in a)


def test_gazetteer_drives_full_entity_pipeline(spark):
    """The production-shaped X2 path end-to-end: extract (default
    extractor = gazetteer) -> confidence filter -> dedupe -> rollup,
    all on Spark, no injected fake anywhere."""
    from simple_etl_spark.operators.entities import (
        dedupe_entities,
        extract_entities,
    )

    articles = spark.createDataFrame(
        [
            ("a1", "Presiden Joko Widodo kunjungi Jakarta"),
            ("a2", "KPK periksa kasus di Jakarta bersama Polri"),
            ("a3", "Universitas Gadjah Mada buka kampus di Kota Semarang"),
            ("a4", None),
        ],
        "id string, title string",
    )
    ents = extract_entities(articles)  # default = gazetteer tier
    rows = {(r["article_id"], r["entity_text"], r["entity_type"])
            for r in ents.collect()}
    assert ("a1", "Joko Widodo", "PER") in rows
    assert ("a1", "Jakarta", "LOC") in rows
    assert ("a2", "KPK", "ORG") in rows
    assert ("a3", "Universitas Gadjah Mada", "ORG") in rows

    deduped = dedupe_entities(ents)
    jk = [r for r in deduped.collect()
          if r["entity_text"].lower() == "jakarta"]
    assert len(jk) == 1  # W4: one survivor across a1/a2

    rollup = (
        ents.groupBy("entity_type")
        .count()
        .orderBy("entity_type")
        .collect()
    )
    assert {r["entity_type"] for r in rollup} <= {"PER", "ORG", "LOC"}
    assert sum(r["count"] for r in rollup) == len(rows)


def test_gazetteer_sentence_final_period():
    """A sentence-final period must not hide the entity (code-review
    r9, reproduced): the token regex swallows trailing dots, so
    tokenization strips them with offsets intact."""
    from simple_etl_spark.operators.entities import gazetteer_extractor

    text = "Presiden berkunjung ke Jakarta."
    ents = gazetteer_extractor(text)
    assert [(e[0], e[1]) for e in ents] == [("Jakarta", "LOC")]
    e = ents[0]
    assert text[e[3]:e[4]] == "Jakarta"  # dot excluded from the span

    ents2 = gazetteer_extractor("rapat di Bank Indonesia.")
    assert [(x[0], x[1], x[2]) for x in ents2] == [
        ("Bank Indonesia", "ORG", 0.95)
    ]
    # interior dots survive (title abbreviations still classify)
    ents3 = gazetteer_extractor("Dr. Sri Mulyani hadir.")
    assert ("Sri Mulyani", "PER") in {(x[0], x[1]) for x in ents3}


def test_gazetteer_trailing_loc_cue_trim_requires_tier1_loc():
    """The trailing-LOC-cue trim keys on WHY the next token was
    consumed (ADVICE r10): a tier-1 gazetteer LOC after the cue means
    the cue belongs to the city and is trimmed from the bare run; a
    follower consumed by anything else (here the gazetteer ORG
    "Bank Indonesia") leaves the cue in the run for the normal tiers
    to classify instead of silently deleting it."""
    from simple_etl_spark.operators.entities import gazetteer_extractor

    # follower is a tier-1 LOC: "Kota" trimmed, "Warga" alone skipped
    ents = gazetteer_extractor("Warga Kota Bandung mengeluh.")
    assert [(e[0], e[1]) for e in ents] == [("Bandung", "LOC")]

    # follower is a tier-1 ORG: the cue is NOT trimmed — the bare
    # tier then sees a two-token capitalized run and classifies it
    ents2 = gazetteer_extractor("Delegasi Provinsi Bank Indonesia hadir.")
    assert [(e[0], e[1]) for e in ents2] == [
        ("Delegasi Provinsi", "PER"),
        ("Bank Indonesia", "ORG"),
    ]


def test_gazetteer_reporting_cue_redispatches_descriptors():
    """A reporting cue can attribute a quote to an ORG or facility,
    not only a person: the remainder after cue-stripping re-dispatches
    through the descriptor rules (code-review r11)."""
    from simple_etl_spark.operators.entities import gazetteer_extractor

    ents = gazetteer_extractor("Menurut Harian Kompas, harga naik.")
    assert [(e[0], e[1]) for e in ents] == [("Kompas", "ORG")]
    # a person after the cue still classifies as PER
    ents2 = gazetteer_extractor("Menurut Budi Santoso, harga naik.")
    assert [(e[0], e[1]) for e in ents2] == [("Budi Santoso", "PER")]
