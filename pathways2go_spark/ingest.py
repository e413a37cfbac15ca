"""S1/S2 — document scan + span normalization.

Reference: BioPAX file parse at BioPaxtoGO.java:226-228 (paxtools object
model) and the per-file directory loop at Biopax2GOCmdLine.java:219-234.
Here: one distributed scan of the documents table
(doc_id, spans array<struct<kind,text,media_ref,offset>>) ->
  elements(doc_id, elem_id, kind, ord, offset, attrs map, media_ref, raw_text)
  element_links(doc_id, src_id, link, dst_id, ord, qual)

Everything is native Column expressions (str_to_map / posexplode — JVM
side, whole-stage codegen). The one pandas/Arrow path is the free-text
comment parser (`parse_doc_meta`) — regex over prose spans, vectorized
per Arrow batch, never per-row Python.

Per-row invariant (BASELINE.json input_hint): span-sequence equality
(kind, text, media_ref, order) — `span_invariant_violations` returns the
rows where the posexplode ordinal disagrees with rank-by-offset (must be
empty).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPAN_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_TYPE)),
    ]
)

RECORD_KINDS = [
    "pathway", "reaction", "template_reaction", "degradation", "interaction",
    "step", "control", "protein", "small_molecule", "complex", "entity_set",
    "dna", "rna",
]

# (kind, link name, attrs key, has ':'-qualifier)
LINK_SPECS = [
    ("pathway", "component", "components", False),
    ("pathway", "parent", "parentId", False),
    ("reaction", "left", "left", False),
    ("reaction", "right", "right", False),
    ("degradation", "left", "left", False),
    ("degradation", "right", "right", False),
    ("template_reaction", "product", "products", False),
    ("interaction", "participant", "participants", False),
    ("step", "step_process", "reactionId", False),
    ("step", "next_step", "nextStepIds", False),
    ("control", "controller", "controllerId", False),
    ("control", "controlled", "controlledId", False),
    ("control", "active_unit", "activeUnitRef", False),
    ("complex", "component", "components", True),
    ("entity_set", "member", "members", False),
]


def read_documents(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(DOCUMENTS_SCHEMA).parquet(path)


def explode_spans(documents: DataFrame) -> DataFrame:
    """documents -> one row per span, preserving the array ordinal."""
    return documents.select(
        "doc_id", F.posexplode("spans").alias("ord", "span")
    ).select(
        "doc_id",
        "ord",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def parse_elements(spans: DataFrame) -> DataFrame:
    """Spans -> typed element records. `attrs` parsed JVM-side via
    str_to_map for record kinds; comment/media spans carried through
    untouched (raw_text / media_ref)."""
    is_record = F.col("kind").isin(RECORD_KINDS)
    attrs = F.when(is_record, F.str_to_map(F.col("text"), F.lit(";"), F.lit("="))).otherwise(
        F.create_map().cast("map<string,string>")
    )
    elem_id = F.coalesce(
        F.element_at(attrs, "id"),
        F.concat(F.col("doc_id"), F.lit("#"), F.col("ord").cast("string")),
    )
    return spans.select(
        "doc_id",
        elem_id.alias("elem_id"),
        "kind",
        "ord",
        "offset",
        attrs.alias("attrs"),
        "media_ref",
        F.col("text").alias("raw_text"),
    )


def element_links(elements: DataFrame) -> DataFrame:
    """One narrow pass: per element, emit every (link, dst) pair its kind
    defines. No shuffle — array build + two explodes, all codegen'd."""
    defs = F.array(
        *[
            F.when(
                F.col("kind") == k,
                F.struct(
                    F.lit(link).alias("link"),
                    F.element_at(F.col("attrs"), key).alias("vals"),
                    F.lit(qual).alias("has_qual"),
                ),
            )
            for k, link, key, qual in LINK_SPECS
        ]
    )
    ld = (
        elements.filter(F.col("kind").isin(sorted({k for k, *_ in LINK_SPECS})))
        .select("doc_id", F.col("elem_id").alias("src_id"), F.explode(defs).alias("ld"))
        .filter(F.col("ld.vals").isNotNull() & (F.col("ld.vals") != ""))
    )
    split = ld.select(
        "doc_id",
        "src_id",
        F.col("ld.link").alias("link"),
        F.col("ld.has_qual").alias("has_qual"),
        F.posexplode(F.split(F.col("ld.vals"), ",")).alias("ord", "dst_raw"),
    ).filter(F.col("dst_raw") != "")
    return split.select(
        "doc_id",
        "src_id",
        "link",
        F.when(F.col("has_qual"), F.split_part(F.col("dst_raw"), F.lit(":"), F.lit(1)))
        .otherwise(F.col("dst_raw"))
        .alias("dst_id"),
        "ord",
        F.when(F.col("has_qual") & F.col("dst_raw").contains(":"),
               F.split_part(F.col("dst_raw"), F.lit(":"), F.lit(2)))
        .alias("qual"),
    )


def span_invariant_violations(documents: DataFrame) -> DataFrame:
    """Rows where posexplode ordinal != rank-by-offset (must be empty):
    the ingest preserves span sequence (kind, text, media_ref, order)."""
    spans = explode_spans(documents)
    w = Window.partitionBy("doc_id").orderBy("offset", "ord")
    return (
        spans.withColumn("rank_by_offset", F.row_number().over(w) - 1)
        .filter(F.col("rank_by_offset") != F.col("ord"))
        .select("doc_id", "ord", "rank_by_offset", "kind", "text", "media_ref")
    )


_DOC_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("meta_kind", T.StringType()),
        T.StructField("value", T.StringType()),
    ]
)


def parse_doc_meta(spans: DataFrame) -> DataFrame:
    """Arrow-vectorized free-text comment parsing (contributor lines +
    Reactome 'activeUnit: #X' hack, BioPaxtoGO.java:772-780 / 2111-2133).
    mapInPandas: pandas str ops per Arrow batch, no per-row Python."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            contrib = pdf["text"].str.extract(r"(?:Authored|Reviewed|Edited):\s*(.+?)\.?$")[0]
            hit = contrib.notna()
            if hit.any():
                out.append(
                    pd.DataFrame(
                        {
                            "doc_id": pdf.loc[hit, "doc_id"],
                            "meta_kind": "contributor",
                            "value": contrib[hit],
                        }
                    )
                )
            au = pdf["text"].str.extract(r"activeUnit:\s*#(\S+)")[0]
            hit = au.notna()
            if hit.any():
                out.append(
                    pd.DataFrame(
                        {
                            "doc_id": pdf.loc[hit, "doc_id"],
                            "meta_kind": "active_unit",
                            "value": au[hit],
                        }
                    )
                )
            yield pd.concat(out) if out else pd.DataFrame(
                {"doc_id": [], "meta_kind": [], "value": []}
            )

    return (
        spans.filter(F.col("kind") == "comment")
        .select("doc_id", "text")
        .mapInPandas(batches, schema=_DOC_META_SCHEMA)
    )


def ingest(
    documents: DataFrame, repartition: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """documents -> (elements, element_links).

    `repartition`: spread the span parse over N partitions. A
    mega-document is ONE input row, so without this every downstream
    narrow op (str_to_map over 600k spans) runs in a single task. The
    spans are shuffled as ~4k-span CHUNK rows, not individual spans:
    the bytes moved are the same but per-record serialization overhead
    drops ~4000x, which is what dominates a single-writer shuffle. The
    global span ordinal is reconstructed as chunk_ord*CHUNK + sub_ord.
    Leave None for normal corpora, where file splits already parallelize."""
    if repartition is None:
        elements = parse_elements(explode_spans(documents))
        return elements, element_links(elements)
    chunk = 4096
    n_chunks = F.ceil(F.size("spans") / chunk).cast("int")
    chunks = documents.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
                lambda i: F.slice("spans", i * chunk + 1, chunk),
            )
        ).alias("chunk_ord", "chunk"),
    ).repartition(repartition)
    spans = chunks.select(
        "doc_id",
        "chunk_ord",
        F.posexplode("chunk").alias("sub_ord", "span"),
    ).select(
        "doc_id",
        (F.col("chunk_ord") * chunk + F.col("sub_ord")).alias("ord"),
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )
    elements = parse_elements(spans)
    return elements, element_links(elements)
