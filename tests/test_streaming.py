"""Streaming ingestion == batch pipeline on the same corpus."""

from __future__ import annotations

import os


from pathways2go_spark.dims import load_dims
from pathways2go_spark.pipeline import precision_recall, run_pipeline
from pathways2go_spark.streaming import read_stream_triples, start_kg_stream


def test_stream_matches_batch(spark, documents, fixture_paths, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("stream"))
    docs_dir = os.path.join(base, "docs")
    out_dir = os.path.join(base, "out")
    ck_dir = os.path.join(base, "ck")
    os.makedirs(docs_dir)

    # two arrival waves (micro-batches) of the fixture corpus
    ids = sorted(r.doc_id for r in documents.select("doc_id").collect())
    half = ids[len(ids) // 2]
    documents.filter(documents.doc_id <= half).coalesce(1).write.parquet(
        os.path.join(docs_dir, "wave=a")
    )
    documents.filter(documents.doc_id > half).coalesce(1).write.parquet(
        os.path.join(docs_dir, "wave=b")
    )

    dims = load_dims(spark, os.path.dirname(fixture_paths["documents"]))
    q = start_kg_stream(
        spark, f"{docs_dir}/wave=*", dims, out_dir, ck_dir,
        buckets=4, max_files_per_trigger=1,
    )
    q.awaitTermination(300)

    streamed = read_stream_triples(spark, out_dir)
    batch = run_pipeline(spark, documents, dims).triples
    pr = precision_recall(streamed, batch)
    assert pr["precision"] == 1.0 and pr["recall"] == 1.0, pr


def test_stateful_dedup_stream(spark, tmp_path_factory):
    """applyInPandasWithState cross-batch dedup: a duplicate document
    arriving in a LATER micro-batch is dropped by the keyed state."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pathways2go_spark.datagen import DOCUMENTS_SCHEMA
    from pathways2go_spark.streaming import start_dedup_stream

    base = tmp_path_factory.mktemp("dedup_stream")
    src = base / "docs"
    src.mkdir()

    def doc(doc_id, text):
        return {"doc_id": doc_id,
                "spans": [{"kind": "pathway", "text": text,
                           "media_ref": "", "offset": 0}]}

    # batch file 1: A, B (plus an in-batch duplicate of A under another id)
    pq.write_table(pa.Table.from_pylist(
        [doc("doc-A", "alpha"), doc("doc-A2", "alpha"), doc("doc-B", "beta")],
        schema=DOCUMENTS_SCHEMA), str(src / "b1.parquet"))
    # batch file 2: duplicate of A's content + a new doc C
    pq.write_table(pa.Table.from_pylist(
        [doc("doc-A3", "alpha"), doc("doc-C", "gamma")],
        schema=DOCUMENTS_SCHEMA), str(src / "b2.parquet"))

    q = start_dedup_stream(
        spark, str(src), str(base / "out"), str(base / "ck"),
        max_files_per_trigger=1,  # force one file per micro-batch
    )
    q.awaitTermination(120)

    out = {(r.h, r.doc_id) for r in
           spark.read.parquet(str(base / "out")).collect()}
    kept = {doc_id for _, doc_id in out}
    # one survivor per content; in-batch tie broken to the min doc_id;
    # the later batch's doc-A3 swallowed by state
    assert len(out) == 3
    assert "doc-B" in kept and "doc-C" in kept
    assert "doc-A" in kept and "doc-A2" not in kept and "doc-A3" not in kept

    # restart with the same checkpoint: nothing new to emit (exactly-once)
    q2 = start_dedup_stream(
        spark, str(src), str(base / "out"), str(base / "ck"),
        max_files_per_trigger=1,
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(str(base / "out")).count() == 3


def test_read_stream_triples_missing_or_empty_path(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("nostream"))
    assert read_stream_triples(spark, os.path.join(base, "never_written")) is None
    empty = os.path.join(base, "empty_out")
    os.makedirs(empty)
    assert read_stream_triples(spark, empty) is None
