"""S6/S7 TSV/GPI/SSSOM source parsers vs the reference's documented
line-reader semantics (SSSOM.java:46-118; Helper.java:164-349)."""

from __future__ import annotations

import pytest

from pathways2go_spark import sources as S


@pytest.fixture(scope="module")
def tsv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tsv")
    (d / "m.sssom.tsv").write_text(
        "#license: CC0\n"
        "#mapping_tool: synthetic\n"
        "P1\tp one\tskos:exactMatch\tGO_0008150\tbp\tLexical\ts\to\ttool\t0.9"
        "\tf1\tf2\tc1\tc2\tms\tmc\tcomment\n"
        "R1\tr one\tskos:exactMatch\tGO_0003674\tmf\tLexical\ts\to\ttool\t0.4"
        "\tf1\tf2\tc1\tc2\tms\tmc\tcomment\n"
    )
    (d / "gp.gpi").write_text(
        "!gpi-version: 1.2\n"
        "UniProtKB\tP001\tGene1\tdesc\tYA-MONOMER|YB-MONOMER\tprotein\ttaxon:559292"
        "\t\tSGD:S000001\tdb:x\n"
        "ComplexPortal\tCPX-1\tcplx\tdesc\tYC-CPLX\tcomplex\ttaxon:559292\t\t\t\n"
    )
    (d / "monomer.tsv").write_text("P001\tgene\tMONOMER:YA-MONOMER\n")
    (d / "p2g.tsv").write_text("PWY-1\tGO:1900001\nPWY-2\tnot_a_go\n")
    (d / "sgd2ec.tsv").write_text(
        "x\tS000001\ta\tb\tc\t1.1.1.1\n"
        "x\tS000002\ta\tb\tc\t2.2.2.2\n"
        "x\tS000002\ta\tb\tc\t3.3.3.3\n"
    )
    (d / "y2c.tsv").write_text("ATP\tCHEBI:15422\nJUNK\tFOO:1\n")
    return d


def test_sssom(spark, tsv_dir):
    rows = {tuple(r) for r in S.read_sssom(spark, str(tsv_dir / "m.sssom.tsv")).collect()}
    assert ("P1", "GO_0008150", 0.9, "tool") in rows
    assert ("R1", "GO_0003674", 0.4, "tool") in rows  # cutoff applied later


def test_gpi(spark, tsv_dir):
    rows = {tuple(r) for r in S.read_gpi(spark, str(tsv_dir / "gp.gpi")).collect()}
    assert ("gpi", "YA-MONOMER", "http://identifiers.org/sgd/S000001") in rows
    assert ("gpi", "YB-MONOMER", "http://identifiers.org/sgd/S000001") in rows
    assert ("gpi", "YC-CPLX",
            "https://www.ebi.ac.uk/complexportal/complex/CPX-1") in rows


def test_monomer_pivot(spark, tsv_dir):
    rows = {tuple(r) for r in S.read_monomer_to_sgd(
        spark, str(tsv_dir / "monomer.tsv"), str(tsv_dir / "gp.gpi")).collect()}
    assert ("monomer2sgd", "YA-MONOMER",
            "http://identifiers.org/sgd/S000001") in rows


def test_pathway_to_go_gate(spark, tsv_dir):
    rows = {tuple(r) for r in S.read_pathway_to_go(
        spark, str(tsv_dir / "p2g.tsv")).collect()}
    assert rows == {("pathway2go", "PWY-1", "GO_1900001")}


def test_sgd2ec_one_to_one_gate(spark, tsv_dir):
    rows = {tuple(r) for r in S.read_sgd_to_ec(
        spark, str(tsv_dir / "sgd2ec.tsv")).collect()}
    assert rows == {("sgd2ec", "S000001", "1.1.1.1")}  # S000002 multi-EC dropped


def test_yeastcyc_to_chebi_gate(spark, tsv_dir):
    rows = {tuple(r) for r in S.read_yeastcyc_to_chebi(
        spark, str(tsv_dir / "y2c.tsv")).collect()}
    assert rows == {("yeastcyc2chebi", "ATP", "CHEBI_15422")}


def test_build_accession_map_union(spark, tsv_dir):
    df = S.build_accession_map(
        spark,
        gpi=str(tsv_dir / "gp.gpi"),
        monomer=str(tsv_dir / "monomer.tsv"),
        pathway2go=str(tsv_dir / "p2g.tsv"),
        sgd2ec=str(tsv_dir / "sgd2ec.tsv"),
        yeastcyc2chebi=str(tsv_dir / "y2c.tsv"),
    )
    srcs = {r.source for r in df.collect()}
    assert srcs == {"gpi", "monomer2sgd", "pathway2go", "sgd2ec", "yeastcyc2chebi"}


def test_pro_mapping(spark, tsv_dir):
    p = tsv_dir / "promapping.txt"
    p.write_text(
        "PR:000000031\tReactome:R-HSA-1027362\tis_a\n"
        "PR:000000032\tReactome:R-HSA-2\texact\n"
        "PR:000000033\tUniProtKB:P1\texact\n"
    )
    rows = {tuple(r) for r in S.read_pro_mapping(spark, str(p)).collect()}
    assert rows == {
        ("pro_is_a", "R-HSA-1027362", "PR_000000031"),
        ("pro_exact", "R-HSA-2", "PR_000000032"),
    }
    exact = {tuple(r) for r in S.read_pro_mapping(spark, str(p), "exact").collect()}
    assert exact == {("pro_exact", "R-HSA-2", "PR_000000032")}


_OBO = """format-version: 1.2
ontology: go

[Term]
id: GO:0003674
name: molecular_function
namespace: molecular_function

[Term]
id: GO:0003824
name: catalytic activity
namespace: molecular_function
xref: EC:1.-.-.-
is_a: GO:0003674 ! molecular_function

[Term]
id: GO:0016616
name: oxidoreductase activity
xref: EC:1.1.1.1
xref: MetaCyc:RXN-123
is_a: GO:0003824 ! catalytic activity

[Term]
id: GO:0000001
name: old term
is_obsolete: true

[Term]
id: GO:0005829
name: cytosol
namespace: cellular_component
relationship: part_of GO:0005737 ! cytoplasm

[Typedef]
id: part_of
name: part of
"""


def test_read_obo_and_closure(spark, tmp_path):
    """OBO front door for the S3 dims: stanza parse, token ids, xref
    multimap, is_a transitive closure incl. self, obsolete flag,
    relationship rows; Typedef stanzas ignored."""
    p = tmp_path / "go-basic.obo"
    p.write_text(_OBO)
    terms, edges, xrefs, rels = S.read_obo(spark, str(p))
    t = {r["class_iri"]: r for r in terms.collect()}
    assert set(t) == {"GO_0003674", "GO_0003824", "GO_0016616",
                      "GO_0000001", "GO_0005829"}
    assert t["GO_0003824"]["namespace"] == "molecular_function"
    assert t["GO_0000001"]["is_obsolete"] is True
    assert {tuple(r) for r in edges.collect()} == {
        ("GO_0003824", "GO_0003674"), ("GO_0016616", "GO_0003824")}
    assert {tuple(r) for r in xrefs.collect()} == {
        ("EC:1.-.-.-", "GO_0003824"), ("EC:1.1.1.1", "GO_0016616"),
        ("MetaCyc:RXN-123", "GO_0016616")}
    assert {tuple(r) for r in rels.collect()} == {
        ("GO_0005829", "part_of", "GO_0005737")}
    anc = {tuple(r) for r in S.obo_ancestors(spark, str(p)).collect()}
    # transitive + self, exactly the onto_ancestors dim shape
    assert ("GO_0016616", "GO_0003674") in anc          # grandparent
    assert ("GO_0016616", "GO_0016616") in anc          # self
    assert ("GO_0000001", "GO_0000001") in anc          # obsolete self-only
    assert not any(a == "GO_0000001" and b != "GO_0000001" for a, b in anc)


def test_obo_ancestors_drive_pipeline(spark, tmp_path):
    """The drop-in claim, proven end to end: serialize the fixture
    ontology's transitive REDUCTION as an OBO file, rebuild the
    onto_ancestors dim through read_obo + the closure job, and the
    full golden suite must still hold P/R == 1.0 — ontology-from-OBO
    is exactly ontology-from-parquet."""
    from dataclasses import replace

    from pathways2go_spark.datagen import ensure_fixture
    from pathways2go_spark.dims import load_dims
    from pathways2go_spark.ingest import read_documents
    from pathways2go_spark.pipeline import precision_recall, run_pipeline
    from tests.conftest import FIXTURE_DIR

    paths = ensure_fixture(FIXTURE_DIR, replicas=1)
    dims = load_dims(spark, FIXTURE_DIR)
    anc = {(r["class_iri"], r["ancestor_iri"])
           for r in dims.onto_ancestors.collect()}
    strict = {(c, a) for c, a in anc if c != a}
    # transitive reduction: drop (c,a) when some b chains c->b->a
    direct = {
        (c, a) for c, a in strict
        if not any((c, b) in strict and (b, a) in strict
                   for b in {x[1] for x in strict if x[0] == c} - {c, a})
    }
    by_cls = {}
    for c, a in direct:
        by_cls.setdefault(c, set()).add(a)
    lines = ["format-version: 1.2", ""]
    for cls in sorted({c for c, _ in anc}):
        lines += ["[Term]", f"id: {cls.replace('_', ':', 1)}",
                  f"name: {cls}"]
        for a in sorted(by_cls.get(cls, ())):
            lines.append(f"is_a: {a.replace('_', ':', 1)}")
        lines.append("")
    p = tmp_path / "fixture.obo"
    p.write_text("\n".join(lines))
    rebuilt = S.obo_ancestors(spark, str(p))
    got = {tuple(r) for r in rebuilt.collect()}
    assert got == anc, (len(got - anc), len(anc - got))
    dims2 = replace(dims, onto_ancestors=rebuilt)
    docs = read_documents(spark, paths["documents"])
    res = run_pipeline(spark, docs, dims2)
    expected = spark.read.parquet(paths["expected_triples"])
    pr = precision_recall(res.triples, expected)
    assert pr["precision"] == 1.0 and pr["recall"] == 1.0, pr


def test_read_gpad_feeds_compare(spark, tmp_path):
    """A real GPAD 1.2 TSV drives the K4b diff directly: comment
    header skipped, GO CURIEs tokenized, shape == gpad_compare's
    reference input."""
    from pathways2go_spark.analytics import gpad_compare

    p = tmp_path / "existing.gpad"
    p.write_text(
        "!gpa-version: 1.2\n"
        "!generated-by: test\n"
        "UniProtKB\tP1\tenables\tGO:0016616\tm1\tECO:0000313\t\t\t20260821\ttest\t\t\n"
        "UniProtKB\tP2\tinvolved_in\tGO:0008150\tm1\tECO:0000313\t\t\t20260821\ttest\t\t\n"
    )
    ref = S.read_gpad(spark, str(p))
    rows = {tuple(r) for r in ref.collect()}
    assert rows == {
        ("UniProtKB", "P1", "enables", "GO_0016616", "m1"),
        ("UniProtKB", "P2", "involved_in", "GO_0008150", "m1"),
    }
    exported = spark.createDataFrame(
        [("UniProtKB", "P1", "enables", "GO_0016616", "m1"),
         ("UniProtKB", "P3", "enables", "GO_0003824", "m1")],
        ["db", "db_object_id", "qualifier", "go_id", "reference"],
    )
    st = {(r["db_object_id"], r["status"])
          for r in gpad_compare(exported, ref).collect()}
    assert st == {("P1", "overlap"), ("P2", "missing"), ("P3", "extra")}
