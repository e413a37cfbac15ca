"""A26 upstream-controller import (OFF by default;
add_upstream_controller_events_from_other_pathways,
BioPaxtoGO.java:1616-1663)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pathways2go_spark import vocab as V
from pathways2go_spark.datagen import Doc, Fixture, write_fixture
from pathways2go_spark.dims import load_dims
from pathways2go_spark.ingest import ingest, read_documents
from pathways2go_spark.stage_a import extract


@pytest.fixture(scope="module")
def two_pathway_corpus(spark, tmp_path_factory):
    """One doc, two pathways: P1's reaction R1 is catalyzed by protein E;
    P2's reaction R0 outputs E (the upstream producer)."""
    fx = Fixture()
    u = fx.prot_cls("U-A26-1")
    c1, c2, c3 = fx.chem("CHEBI_88001"), fx.chem("CHEBI_88002"), fx.chem("CHEBI_88003")
    d = Doc(fx, "A26DOC")
    d.span("pathway", id="A26-P1", displayName="main", isDisease=0, components="A26-R1")
    d.span("pathway", id="A26-P2", displayName="other", isDisease=0, components="A26-R0")
    d.span("protein", id="A26-E", displayName="ctl", uniprot="U-A26-1")
    d.span("small_molecule", id="A26-M1", displayName="m1", chebi=c1)
    d.span("small_molecule", id="A26-M2", displayName="m2", chebi=c2)
    d.span("small_molecule", id="A26-M3", displayName="m3", chebi=c3)
    d.span("reaction", id="A26-R1", displayName="r1", direction="LEFT-TO-RIGHT",
           left="A26-M1", right="A26-M2")
    d.span("reaction", id="A26-R0", displayName="r0", direction="LEFT-TO-RIGHT",
           left="A26-M3", right="A26-E")
    d.span("control", id="A26-C1", type="CATALYSIS", controllerId="A26-E",
           controlledId="A26-R1")
    out = str(tmp_path_factory.mktemp("a26"))
    paths = write_fixture(fx, out)
    _ = u
    return paths, out


def _stage_a(spark, paths, out, flag):
    docs = read_documents(spark, paths["documents"])
    dims = load_dims(spark, out)
    elements, links = ingest(docs)
    sa = extract(elements, links, dims, import_upstream_controllers=flag)
    return {(r.subj, r.pred, r.obj) for r in sa.triples.collect()}


def test_a26_off_by_default(spark, two_pathway_corpus):
    paths, out = two_pathway_corpus
    got = _stage_a(spark, paths, out, False)
    # R0 belongs only to P2; not imported into P1
    assert ("A26-R0", V.PART_OF, "A26-P2") in got
    assert ("A26-R0", V.PART_OF, "A26-P1") not in got


def test_a26_imports_upstream_producer(spark, two_pathway_corpus):
    paths, out = two_pathway_corpus
    got = _stage_a(spark, paths, out, True)
    # the producer reaction is pulled into the controlled reaction's pathway
    assert ("A26-R0", V.PART_OF, "A26-P1") in got
    assert ("A26-R0", V.PART_OF, "A26-P2") in got
    # and its io context is emitted under the import too
    assert ("A26-R0", V.HAS_OUTPUT, "U-A26-1~A26-R0") in got


def test_a3_test_pathway_allowlist(spark, two_pathway_corpus):
    """A3 (`-tp`, BioPaxtoGO.java:249-251): only named pathways convert."""
    paths, out = two_pathway_corpus
    docs = read_documents(spark, paths["documents"])
    dims = load_dims(spark, out)
    elements, links = ingest(docs)
    sa = extract(elements, links, dims, test_pathways=["main"])
    got = {(r.subj, r.pred, r.obj) for r in sa.triples.collect()}
    assert ("A26-R1", V.PART_OF, "A26-P1") in got
    assert not any(s == "A26-R0" for s, _, _ in got)   # P2 not converted
    assert not any(s == "A26-P2" for s, _, _ in got)


def test_a14_set_explosion_optional(spark, fixture_paths):
    """A14 has_substitutable_entity (disabled in the reference,
    BioPaxtoGO.java:1185-1215): set members attach via RO_0019003 when
    the flag is on; never by default."""
    import os

    docs = read_documents(spark, fixture_paths["documents"])
    dims = load_dims(spark, os.path.dirname(fixture_paths["documents"]))
    elements, links = ingest(docs)
    on = extract(elements, links, dims, explode_entity_sets=True).triples
    got = {(r.subj, r.pred, r.obj) for r in on.collect()}
    # T10: set S1 (controller of R1) has protein members E1/E2
    sn = "T10x00000-S1~T10x00000-R1~ctl"
    assert (sn, V.HAS_SUBSTITUTABLE, f"U-T10x00000-1~{sn}~sub") in got
    assert (f"U-T10x00000-1~{sn}~sub", V.TYPE, "UniProtKB_U-T10x00000-1") in got
    off = extract(elements, links, dims).triples
    assert off.filter(off.pred == V.HAS_SUBSTITUTABLE).count() == 0
