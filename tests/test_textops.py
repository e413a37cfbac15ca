

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
