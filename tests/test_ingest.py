"""Ingest (S1/S2) tests: span parse, link extraction, sequence invariant,
Arrow comment parsing, media passthrough."""

from __future__ import annotations

from pyspark.sql import functions as F

from pathways2go_spark.ingest import (
    element_links,
    explode_spans,
    ingest,
    parse_doc_meta,
    parse_elements,
    span_invariant_violations,
)


def test_span_invariant_empty(documents):
    assert span_invariant_violations(documents).count() == 0


def test_elements_parse(documents):
    elements = parse_elements(explode_spans(documents))
    p = elements.filter(
        (F.col("doc_id") == "T1x00000") & (F.col("kind") == "pathway")
    ).collect()
    assert len(p) == 1
    attrs = p[0]["attrs"]
    assert attrs["id"] == "T1x00000-P"
    assert attrs["isDisease"] == "0"
    assert "T1x00000-R1" in attrs["components"]


def test_media_spans_carried_through(documents):
    elements = parse_elements(explode_spans(documents))
    media = elements.filter(F.col("kind") == "media")
    assert media.count() > 0
    assert media.filter((F.col("media_ref") == "") | F.col("media_ref").isNull()).count() == 0
    # media spans keep their raw text and synthesize no attrs
    assert media.filter(F.size("attrs") > 0).count() == 0


def test_links(documents):
    _, links = ingest(documents)
    t1 = links.filter(F.col("doc_id") == "T1x00000")
    comp = {r["dst_id"] for r in t1.filter(F.col("link") == "component").collect()}
    assert comp == {f"T1x00000-R{i}" for i in range(1, 5)}
    left = t1.filter((F.col("link") == "left") & (F.col("src_id") == "T1x00000-R1")).collect()
    assert [r["dst_id"] for r in left] == ["T1x00000-M0"]
    # reaction right list order preserved via posexplode ordinal
    r4 = (
        t1.filter((F.col("link") == "right") & (F.col("src_id") == "T1x00000-R4"))
        .orderBy("ord")
        .collect()
    )
    assert [r["dst_id"] for r in r4] == ["T1x00000-M4", "T1x00000-W"]


def test_complex_component_qualifier(documents):
    _, links = ingest(documents)
    rows = links.filter(
        (F.col("doc_id") == "T3x00000")
        & (F.col("src_id") == "T3x00000-C1")
        & (F.col("link") == "component")
    ).collect()
    assert {(r["dst_id"], r["qual"]) for r in rows} == {
        ("T3x00000-E1", "1"),
        ("T3x00000-E2", "1"),
    }


def test_doc_meta_arrow_parse(documents):
    meta = parse_doc_meta(explode_spans(documents)).collect()
    kinds = {(r["doc_id"], r["meta_kind"], r["value"]) for r in meta}
    assert ("T1x00000", "contributor", "Test Author") in kinds
    assert ("T5x00000", "active_unit", "T5x00000-E1") in kinds
