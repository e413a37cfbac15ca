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
