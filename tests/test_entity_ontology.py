"""Golden assertions for the REACTO entity-ontology builder (SURVEY.md
§2.6 E1-E12; PhysicalEntityOntologyBuilder.java:259-391)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pathways2go_spark import vocab as V
from pathways2go_spark.dims import load_dims
from pathways2go_spark.entity_ontology import build_reacto
from pathways2go_spark.ingest import ingest

@pytest.fixture(scope="module")
def axioms(spark, documents, fixture_paths):
    import os

    dims = load_dims(spark, os.path.dirname(fixture_paths["documents"]))
    elements, links = ingest(documents)
    return build_reacto(elements, links, dims).cache()


def rows(axioms, **eq):
    df = axioms
    for k, v in eq.items():
        df = df.filter(F.col(k) == v)
    return {tuple(r) for r in df.collect()}


def test_protein_subclass_and_canonical(axioms):
    # E1/E5: UniProt protein class (:562-574)
    cls = "UniProtKB_U-T1x00000-10"
    assert (cls, "subclass_of", V.PROTEIN_ROOT, "") in rows(axioms, class_id=cls)
    assert (cls, "canonical_record", "U-T1x00000-10", "") in rows(axioms, class_id=cls)


def test_located_in_restriction(axioms):
    # E2 (:449-479): cytosol -> GO_0005829
    got = rows(axioms, class_id="UniProtKB_U-T1x00000-10", axiom="located_in")
    assert ("UniProtKB_U-T1x00000-10", "located_in", "GO_0005829", "") in got


def test_features(axioms):
    # E6 modification + E7 fragment features (:576-647)
    cls = "UniProtKB_U-T1x00000-10"
    assert (cls, "has_feature", "MOD_00046", "114-118") in rows(
        axioms, axiom="has_feature"
    )
    cls2 = "UniProtKB_U-T1x00000-20"
    assert (cls2, "has_fragment", "frag", "1-220") in rows(axioms, axiom="has_fragment")


def test_complex_components_stoichiometry(axioms):
    # E4 (:513-534): CX = E1:1, E2:1, MM:1 in T5
    cx = "REACTO_T5x00000-CX"
    got = rows(axioms, class_id=cx, axiom="has_component")
    # E1/E2 share the UniProt class -> one deduped row (E1 memoization)
    assert got == {
        (cx, "has_component", "UniProtKB_U-T5x00000-A", "1"),
        (cx, "has_component", "CHEBI_90051", "1"),
    }
    assert (cx, "subclass_of", V.COMPLEX_GO, "") in rows(axioms, class_id=cx)
    # drug complex in T7b: stoichiometry 2 preserved in qual
    cd = "REACTO_T7x00000b-CD"
    assert (cd, "has_component", "CHEBI_90075", "2") in rows(axioms, class_id=cd)


def test_set_union_and_election(axioms):
    # E3 (:864-989): T10 set of two proteins -> elected root = protein
    s = "REACTO_T10x00000-S1"
    got = rows(axioms, class_id=s)
    assert (s, "union_member", "UniProtKB_U-T10x00000-1", "") in got
    assert (s, "union_member", "UniProtKB_U-T10x00000-2", "") in got
    assert (s, "subclass_of", V.PROTEIN_ROOT, "") in got


def test_small_molecule_roles_gated(axioms):
    # E9 (:788-840): registered role kept, unregistered role dropped
    assert ("CHEBI_90061", "has_role", "CHEBI_23357", "") in rows(
        axioms, axiom="has_role"
    )
    assert rows(axioms, class_id="CHEBI_90063", axiom="has_role") == set()


def test_dna_rna_typing(axioms):
    # E8 (:718-786): ENSEMBL dna class; bare rna falls back to root (no rows)
    d = "ENSEMBL_ENSG-T12x00000-1"
    got = rows(axioms, class_id=d)
    assert (d, "subclass_of", V.DNA_ROOT, "") in got
    assert (d, "canonical_record", "ENSG-T12x00000-1", "") in got
    assert rows(axioms, class_id=V.RNA_ROOT) == set()


def test_taxon(axioms):
    # E12 (:486-500)
    assert ("UniProtKB_U-T1x00000-10", "only_in_taxon", "NCBITaxon_9606", "") in rows(
        axioms, axiom="only_in_taxon"
    )


def test_drug_propagation(axioms):
    # E11 (:879-883): direct IUPHAR on DG's class; inherited on container
    assert ("UniProtKB_U-T7x00000-D", "iuphar", "1234", "") in rows(
        axioms, axiom="iuphar"
    )
    assert ("REACTO_T7x00000b-CD", "iuphar", "inherited", "") in rows(
        axioms, axiom="iuphar"
    )
