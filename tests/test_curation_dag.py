"""q150_curation_dag invariants (round-7 verdict #5).

The oracle replays the composed admission decision from `documents`
directly, which is only sound if the WARC -> HTML -> extract stage
recovers text that is TOKEN-identical to the source document — every
downstream signal (fingerprint, shingles, minhash, quality) is
token-based. The first test pins exactly that equivalence; the oracle
value parity itself is covered by the auto-parametrized
tests/test_oracle_parity.py like every registered query.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamprocess_spark.plans import query_map
from tests.conftest import SF_DIR


def test_warc_html_extraction_is_token_exact(spark):
    from streamprocess_spark.io.tables import load_tables
    from streamprocess_spark.io.warc_source import register_warc_source
    from streamprocess_spark.plans.llm_pipeline import (
        _stage_curation_warc,
        html_to_text,
    )

    register_warc_source(spark)
    wdir = _stage_curation_warc(SF_DIR)
    recs = spark.read.format("warc").load(wdir)
    extracted = recs.filter(F.col("warc_type") == "response").select(
        F.regexp_extract("target_uri", r"/(\d+)$", 1)
        .cast("bigint").alias("doc_id"),
        html_to_text(F.decode("body", "UTF-8")).alias("text"),
    )
    docs = load_tables(spark, SF_DIR)["documents"].select(
        "doc_id", F.col("text").alias("src_text")
    )
    joined = docs.join(extracted, "doc_id", "full")
    n_docs = docs.count()
    assert joined.count() == n_docs  # every doc crawled exactly once
    # token-exact: extraction == whitespace-trimmed source, and the
    # token SEQUENCES are equal (what every admission signal consumes)
    bad = joined.filter(
        (F.col("text") != F.trim(F.regexp_replace("src_text", r"\s+", " ")))
        | (
            F.filter(F.split("text", r"\s+"), lambda t: t != "")
            != F.filter(F.split("src_text", r"\s+"), lambda t: t != "")
        )
    )
    assert bad.count() == 0


def test_curation_dag_admitted_subset_and_determinism(spark):
    """The final cells cover only admitted verdicts, split names are
    the 80/10/10 trio, and two runs (fresh txlog stage dirs each) are
    identical — the materialized stages must not leak nondeterminism
    into the decision table."""
    rows1 = {
        (r.verdict, r.split, r.n_docs, r.membership_sum)
        for r in query_map()["q150_curation_dag"](spark, SF_DIR).collect()
    }
    assert rows1
    assert {v for v, _, _, _ in rows1} <= {"keep", "keep_scrubbed"}
    assert {s for _, s, _, _ in rows1} <= {"train", "val", "test"}
    rows2 = {
        (r.verdict, r.split, r.n_docs, r.membership_sum)
        for r in query_map()["q150_curation_dag"](spark, SF_DIR).collect()
    }
    assert rows1 == rows2


def test_fixture_escaping_round_trips_markup_text(spark):
    """Corpus text containing markup characters must survive the
    build-side entity escaping + the production extraction chain
    token-exactly — without escaping, the tag-strip would eat
    '<anything-bracketed>' and entity decode would rewrite '&amp;'
    shapes (the round-8 review finding). Mirrors the exact template
    _stage_curation_warc writes."""
    nasty = [
        'price < 100 & weight > 5 "quoted" it\'s fine',
        "a <b>bold</b> claim with </p> inside & an x<y>z tail",
        "plain text with no markup at all",
    ]
    rows = []
    for i, text in enumerate(nasty):
        esc = (
            text.replace("&", "&amp;")
            .replace("<", "&lt;")
            .replace(">", "&gt;")
            .replace('"', "&quot;")
            .replace("'", "&#39;")
        )
        html = (
            "<html><head><title></title>"
            "<style>p {color: red}</style></head><body>"
            f"<script>var x = {i};</script>"
            f"<p>{esc}</p></body></html>"
        )
        rows.append((i, text, html))
    from streamprocess_spark.plans.llm_pipeline import html_to_text

    df = spark.createDataFrame(rows, "i int, text string, html string")
    got = df.select("i", "text", html_to_text(F.col("html")).alias("out"))
    for r in got.collect():
        # token-exact: the invariant every downstream signal relies on
        assert r["out"].split() == r["text"].split(), (r["i"], r["out"])
