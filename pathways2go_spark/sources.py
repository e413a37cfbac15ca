"""S6/S7 — TSV / GPI / SSSOM file sources for the dictionary tables.

The reference parses these with line-at-a-time Java readers
(SSSOM.java:46-118; Helper.java:164-349). Here each format is one
declarative `spark.read.csv` plan (comment-prefix filter, positional
columns, explode for pipe-multivalued fields) producing the SAME frame
shapes `dims.py` loads from parquet — so a deployment can point at the
raw curated files instead of pre-converted tables. Everything stays
JVM-side (no Python in the parse path).

Formats (reference file:line):
  SSSOM 17-col TSV, '#'-prefixed metadata block        SSSOM.java:46-95
  GPI (gp_information): '!' comments, pipe-multivalued
  accession columns, ComplexPortal/UniProtKB branches  Helper.java:240-294
  MONOMER→SGD via UniProt pivot through the GPI        Helper.java:164-215
  yeast pathway-id→GO (manual map, 'GO:' gate)         Helper.java:296-317
  SGDID→EC with the 1:1-only gate                      Helper.java:319-349
  YeastCyc-id→ChEBI ('CHEBI:' gate)                    Helper.java:216-238
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _tsv(spark: SparkSession, path: str, comment: str | None = None) -> DataFrame:
    r = spark.read.option("sep", "\t")
    if comment:
        r = r.option("comment", comment)
    return r.csv(path)


def read_sssom(spark: SparkSession, path: str) -> DataFrame:
    """SSSOM TSV → (subject_id, object_id, confidence, mapping_tool).
    Positional columns per SSSOM.java:72-90; '#' metadata lines skipped."""
    df = _tsv(spark, path, comment="#")
    return df.select(
        F.col("_c0").alias("subject_id"),
        F.col("_c3").alias("object_id"),
        F.col("_c9").cast("double").alias("confidence"),
        F.col("_c8").alias("mapping_tool"),
    )


def read_gpi(spark: SparkSession, path: str) -> DataFrame:
    """GPI → accession_map rows (source='gpi', acc, target_iri).

    Mirrors Helper.parseGPI: col4 holds pipe-multivalued YeastCyc
    accessions; ComplexPortal rows target an EBI complex IRI from col1,
    other rows target pipe-multivalued SGD ids from col8 with the `SGD:`
    prefix rewritten to the identifiers.org IRI."""
    df = _tsv(spark, path, comment="!")
    accs = df.withColumn("acc", F.explode(F.split(F.col("_c4"), r"\|")))
    cplx = accs.filter(F.col("_c0") == "ComplexPortal").select(
        F.lit("gpi").alias("source"),
        "acc",
        F.concat(F.lit("https://www.ebi.ac.uk/complexportal/complex/"),
                 F.col("_c1")).alias("target_iri"),
    )
    sgd = (
        accs.filter((F.col("_c0") != "ComplexPortal") & F.col("_c8").isNotNull())
        .withColumn("sgd", F.explode(F.split(F.col("_c8"), r"\|")))
        .select(
            F.lit("gpi").alias("source"),
            "acc",
            F.regexp_replace("sgd", "^SGD:",
                             "http://identifiers.org/sgd/").alias("target_iri"),
        )
    )
    return cplx.unionByName(sgd).distinct()


def read_monomer_to_sgd(spark: SparkSession, monomer_path: str,
                        gpi_path: str) -> DataFrame:
    """MONOMER→SGD via the UniProt pivot (Helper.java:164-215):
    GPI UniProtKB rows give uniprot→SGD; the monomer TSV gives
    uniprot→MONOMER (col2 after ':'); join on uniprot."""
    gpi = _tsv(spark, gpi_path, comment="!")
    uni2sgd = (
        gpi.filter((F.col("_c0") == "UniProtKB") & F.col("_c8").isNotNull())
        .withColumn("sgd", F.explode(F.split(F.col("_c8"), r"\|")))
        .select(
            F.col("_c1").alias("uniprot"),
            F.regexp_replace("sgd", "^SGD:",
                             "http://identifiers.org/sgd/").alias("target_iri"),
        )
    )
    mon = _tsv(spark, monomer_path).select(
        F.col("_c0").alias("uniprot"),
        F.split(F.col("_c2"), ":").getItem(1).alias("acc"),
    )
    return mon.join(uni2sgd, "uniprot").select(
        F.lit("monomer2sgd").alias("source"), "acc", "target_iri"
    ).distinct()


def read_pathway_to_go(spark: SparkSession, path: str) -> DataFrame:
    """pathway-id→GO manual map (Helper.java:296-317): keep 'GO:' rows,
    rewrite the CURIE to the class local name used throughout."""
    df = _tsv(spark, path)
    return (
        df.filter(F.col("_c1").startswith("GO:"))
        .select(
            F.lit("pathway2go").alias("source"),
            F.col("_c0").alias("acc"),
            F.regexp_replace("_c1", "^GO:", "GO_").alias("target_iri"),
        )
        .distinct()
    )


def read_sgd_to_ec(spark: SparkSession, path: str) -> DataFrame:
    """SGDID→EC with the 1:1-only gate (Helper.java:319-349): accessions
    mapping to more than one distinct EC are dropped entirely."""
    df = _tsv(spark, path).select(
        F.col("_c1").alias("acc"), F.col("_c5").alias("ec")
    )
    ones = (
        df.groupBy("acc").agg(F.collect_set("ec").alias("ecs"))
        .filter(F.size("ecs") == 1)
        .select("acc", F.element_at("ecs", 1).alias("target_iri"))
    )
    return ones.select(F.lit("sgd2ec").alias("source"), "acc", "target_iri")


def read_yeastcyc_to_chebi(spark: SparkSession, path: str) -> DataFrame:
    """YeastCyc-id→ChEBI (Helper.java:216-238): keep 'CHEBI:' rows only,
    rewritten to the CHEBI_ local name."""
    df = _tsv(spark, path)
    return (
        df.filter(F.upper(F.split(F.col("_c1"), ":").getItem(0)) == "CHEBI")
        .select(
            F.lit("yeastcyc2chebi").alias("source"),
            F.col("_c0").alias("acc"),
            F.concat(F.lit("CHEBI_"),
                     F.split(F.col("_c1"), ":").getItem(1)).alias("target_iri"),
        )
        .distinct()
    )


def build_accession_map(
    spark: SparkSession,
    gpi: str | None = None,
    monomer: str | None = None,
    pathway2go: str | None = None,
    sgd2ec: str | None = None,
    yeastcyc2chebi: str | None = None,
) -> DataFrame:
    """Union every provided lookup file into the accession_map dim frame
    (source, acc, target_iri) — the TSV-backed equivalent of
    dims.load_dims' parquet read."""
    frames: list[DataFrame] = []
    if gpi:
        frames.append(read_gpi(spark, gpi))
    if monomer and gpi:
        frames.append(read_monomer_to_sgd(spark, monomer, gpi))
    if pathway2go:
        frames.append(read_pathway_to_go(spark, pathway2go))
    if sgd2ec:
        frames.append(read_sgd_to_ec(spark, sgd2ec))
    if yeastcyc2chebi:
        frames.append(read_yeastcyc_to_chebi(spark, yeastcyc2chebi))
    if not frames:
        return spark.createDataFrame(
            [], "source string, acc string, target_iri string"
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def read_pro_mapping(spark: SparkSession, path: str,
                     rtype: str | None = None) -> DataFrame:
    """S8 — Reactome→PRO promapping.txt (PRO.readReact2PRO,
    PRO.java:101-135): 3-col TSV `PR:x  Reactome:R-XXX-n  exact|is_a`;
    keep Reactome rows, optionally filtered to one relation type;
    Reactome id loses its prefix, the PRO CURIE becomes a local name."""
    df = _tsv(spark, path).filter(F.col("_c1").contains("Reactome"))
    if rtype is not None:
        df = df.filter(F.col("_c2") == rtype)
    return df.select(
        F.concat(F.lit("pro_"), F.col("_c2")).alias("source"),
        F.split(F.col("_c1"), ":").getItem(1).alias("acc"),
        F.regexp_replace("_c0", ":", "_").alias("target_iri"),
    ).distinct()


# ----------------------------------------------------------------------
# S3 front door — OBO ontology format (the public text serialization of
# GO/CHEBI; the reference consumes the same content as go-lego OWL via
# OWLAPI, BioPaxtoGO.java GOLego init). read_obo produces the SAME
# frame shapes dims.py loads from parquet, so a deployment can point at
# go-basic.obo directly: terms + is_a edges + xrefs, and obo_ancestors
# composes the is_a edges with dims.transitive_closure into the
# (class_iri, ancestor_iri) dictionary every typing ladder broadcasts.
# ----------------------------------------------------------------------

_OBO_TERMS_SCHEMA = (
    "class_iri string, name string, namespace string, is_obsolete boolean"
)
_OBO_EDGES_SCHEMA = "class_iri string, parent_iri string"
_OBO_XREFS_SCHEMA = "xref string, class_iri string"
_OBO_RELS_SCHEMA = "class_iri string, rel string, target_iri string"


def _obo_token(curie: str) -> str:
    """'GO:0003674' -> 'GO_0003674' (the repo's internal token form)."""
    return curie.strip().replace(":", "_", 1)


def parse_obo(text: str) -> tuple[list, list, list, list]:
    """Pure-python OBO stanza parse -> (terms, is_a edges, xrefs,
    relationships). Ontology files are dimension-bounded (the same
    class of data every dims builder collects driver-side), so a
    single-pass parse is right-sized; the DataFrame wrappers below run
    it once inside an Arrow task and everything downstream is
    distributed. Trailing '! label' comments and alt_id/obsolete
    bookkeeping follow the OBO 1.2 spec."""
    terms, edges, xrefs, rels = [], [], [], []
    cur = None

    def flush() -> None:
        if cur and cur.get("id"):
            terms.append((cur["id"], cur.get("name"), cur.get("namespace"),
                          cur.get("obsolete", False)))

    for raw in text.splitlines():
        line = raw.strip()
        if line.startswith("["):
            flush()
            cur = {} if line == "[Term]" else None
            continue
        if cur is None or not line or line.startswith("!"):
            continue
        key, _, val = line.partition(":")
        val = val.split("!")[0].strip()
        if key == "id":
            cur["id"] = _obo_token(val)
        elif key == "name":
            cur["name"] = val
        elif key == "namespace":
            cur["namespace"] = val
        elif key == "is_obsolete":
            cur["obsolete"] = val == "true"
        elif key == "is_a" and cur.get("id"):
            edges.append((cur["id"], _obo_token(val)))
        elif key == "xref" and cur.get("id"):
            xrefs.append((val.split(" ")[0], cur["id"]))
        elif key == "relationship" and cur.get("id"):
            parts = val.split()
            if len(parts) >= 2:
                rels.append((cur["id"], parts[0], _obo_token(parts[1])))
    flush()
    return terms, edges, xrefs, rels


def read_obo(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """OBO file -> (terms, is_a_edges, xrefs, relationships) DataFrames
    (schemas match the parquet dims: xrefs is (xref, class_iri))."""
    text = "\n".join(
        r["value"] for r in spark.read.text(path, wholetext=True).collect()
    )
    terms, edges, xrefs, rels = parse_obo(text)
    return (
        spark.createDataFrame(terms, _OBO_TERMS_SCHEMA),
        spark.createDataFrame(edges, _OBO_EDGES_SCHEMA),
        spark.createDataFrame(xrefs, _OBO_XREFS_SCHEMA),
        spark.createDataFrame(rels, _OBO_RELS_SCHEMA),
    )


def obo_ancestors(spark: SparkSession, path: str) -> DataFrame:
    """OBO file -> (class_iri, ancestor_iri) transitive is_a closure
    INCLUDING self — a drop-in for the onto_ancestors dim (obsolete
    terms keep their self-row but contribute no edges upward, matching
    the deprecated-term reporting the K3 reports do)."""
    from pathways2go_spark.dims import transitive_closure

    terms, edges, _, _ = read_obo(spark, path)
    closure = transitive_closure(
        edges.withColumnRenamed("class_iri", "cls")
        .withColumnRenamed("parent_iri", "anc"),
        "cls", "anc", include_self=False,
    ).select(F.col("cls").alias("class_iri"), F.col("anc").alias("ancestor_iri"))
    selfs = terms.select(
        F.col("class_iri"), F.col("class_iri").alias("ancestor_iri")
    )
    return selfs.unionByName(closure).distinct()


def read_gpad(spark: SparkSession, path: str) -> DataFrame:
    """K4b front door — GPAD 1.2 TSV (the reference diffs against real
    Reactome GPAD files, ReactomeGPAD.java:113-194): '!'-comment
    header, positional columns DB / DB_Object_ID / Qualifier / GO_ID /
    Reference / Evidence / ... . Produces the exact frame
    analytics.gpad_compare consumes as `reference` (db, db_object_id,
    qualifier, go_id, reference), with GO CURIEs reduced to the
    internal token form (GO:0003674 -> GO_0003674). JVM-side parse."""
    df = _tsv(spark, path, comment="!")
    return df.select(
        F.col("_c0").alias("db"),
        F.col("_c1").alias("db_object_id"),
        F.col("_c2").alias("qualifier"),
        F.regexp_replace("_c3", ":", "_").alias("go_id"),
        F.col("_c4").alias("reference"),
    ).distinct()
