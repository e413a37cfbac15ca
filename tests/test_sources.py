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
