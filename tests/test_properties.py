"""Property-based checks (hypothesis) — beyond the reference's
golden-fixture-only strategy (SURVEY.md §5): the span-sequence invariant
and pipeline determinism hold for ARBITRARY well-formed documents, not
just the curated topologies."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pathways2go_spark.ingest import (
    explode_spans,
    ingest,
    span_invariant_violations,
)

KINDS = st.sampled_from(
    ["pathway", "reaction", "protein", "small_molecule", "comment", "media"]
)
TEXT = st.text(
    alphabet=st.characters(whitelist_categories=("L", "N"), max_codepoint=0x7F),
    min_size=0,
    max_size=20,
)


@st.composite
def documents(draw):
    n_docs = draw(st.integers(1, 4))
    docs = []
    for d in range(n_docs):
        n_spans = draw(st.integers(0, 12))
        spans, off = [], 0
        for i in draw(st.lists(st.tuples(KINDS, TEXT),
                               min_size=n_spans, max_size=n_spans)):
            kind, text = i
            payload = f"id=X{off};displayName={text}" if kind not in (
                "comment", "media") else text
            spans.append((kind, payload,
                          f"img://d{d}/{off}" if kind == "media" else "", off))
            off += max(1, len(payload))
        docs.append((f"doc{d}", spans))
    return docs


_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=documents())
def test_span_invariant_holds_for_arbitrary_docs(spark, docs):
    df = spark.createDataFrame(docs, _SCHEMA)
    assert span_invariant_violations(df).count() == 0
    # every span survives the explode with its ordinal
    assert explode_spans(df).count() == sum(len(s) for _, s in docs)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=documents())
def test_ingest_is_deterministic(spark, docs):
    df = spark.createDataFrame(docs, _SCHEMA)
    a_e, a_l = ingest(df)
    b_e, b_l = ingest(df)
    assert sorted(map(tuple, a_e.collect())) == sorted(map(tuple, b_e.collect()))
    assert sorted(map(tuple, a_l.collect())) == sorted(map(tuple, b_l.collect()))
