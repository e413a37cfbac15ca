"""pathways2go_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of
geneontology/pathways2GO (BioPAX -> GO-CAM conversion).

NOT a port: the reference is a single-threaded Java/OWLAPI/Jena rule
engine; this engine re-expresses the same rule semantics as distributed
DataFrame transformations over an interleaved text+media documents table
(doc_id, spans array<struct<kind,text,media_ref,offset>>).

Layout:
  vocab       RO/GO/CHEBI/ECO constants (mirrors GoCAM.java:127-148,335-387)
  session     tuned SparkSession builder
  datagen     deterministic synthetic corpus + golden triples (FIXTURES.md)
  ingest      S1/S2: spans -> elements / element_links
  dims        S3-S9: broadcast dictionary tables + closures
  stage_a     A1-A27: BioPAX-object -> candidate triple extraction
  stage_b     B1-B11: ordered graph-rewrite rules
  pipeline    end-to-end orchestration + checkpoints + lineage
  sinks       partitioned, idempotent, resumable triple sink
  analytics   G1-G8 report aggregations over the triple corpus
  textops     language-ID / quality / tokens / fingerprints (documents)
  dedup       exact / minhash-LSH / simhash / ngram-jaccard / embedding dedup
  similarity  brute-force + LSH-bucketed cosine top-k ANN
  multimodal  binary media column plumbing (decode stubbed)
"""

__version__ = "0.1.0"
