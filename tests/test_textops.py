

def test_chunk_documents_boundaries(spark):
    from pathways2go_spark.textops import chunk_documents

    df = spark.createDataFrame(
        [("a", "x" * 200), ("b", "y" * 80), ("c", "z" * 81), ("d", "")],
        "doc_id string, text string",
    )
    out = chunk_documents(df, "text", size=120, stride=80).collect()
    got = {(r["doc_id"], r["chunk_ix"]): len(r["chunk"]) for r in out}
    # a: starts 0,80,160 -> lens 120,120,40; b: one exact-stride chunk;
    # c: one char past the stride spills a second (1-char) chunk;
    # d: empty text emits nothing
    assert got == {
        ("a", 0): 120, ("a", 1): 120, ("a", 2): 40,
        ("b", 0): 80,
        ("c", 0): 81, ("c", 1): 1,
    }
    # overlap content: chunk 1 of 'a' starts at offset 80
    rows = {(r["doc_id"], r["chunk_ix"]): r["chunk"] for r in out}
    assert rows[("a", 1)] == "x" * 120


def test_bm25_semantics_and_empty_corpus(spark):
    """BM25 ranks the doc that concentrates the query term above a
    longer doc that mentions it once (length normalization), ignores
    non-query terms, and returns empty (not 0/0) on an empty corpus."""
    from pathways2go_spark.textops import bm25_topk

    rows = [
        (1, "hash hash hash"),                      # concentrated
        (2, "hash scan join merge filter row col"), # diluted
        (3, "scan join filter row col sort agg"),   # no query term
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(df, ["hash"], k=10).collect()
    ids = [r["doc"] for r in out]
    assert ids[0] == 1 and set(ids) == {1, 2}
    assert out[0]["score"] > out[1]["score"] > 0
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert bm25_topk(empty, ["hash"], k=10).count() == 0
