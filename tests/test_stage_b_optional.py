"""B12 transport inference (optional rule; disabled in the reference per
issue #345, GoCAM.java:978-979 — tested here against its documented
semantics, GoCAM.java:1075-1167 + query2update_localization.rq)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pathways2go_spark import vocab as V
from pathways2go_spark.dims import Dims
from pathways2go_spark.stage_b import (
    b12_transport_inference,
    b13_enabler_from_upstream,
    b14_regulation_by_sequestration,
)

TRIPLE_SCHEMA = (
    "model_id string, subj string, pred string, obj string, "
    "evidence string, rule string"
)


def _t(spark, rows):
    return spark.createDataFrame(
        [(m, s, p, o, V.ECO_IMPORTED, "A0") for m, s, p, o in rows], TRIPLE_SCHEMA
    )


@pytest.fixture(scope="module")
def dims(spark):
    anc = spark.createDataFrame(
        [
            ("UniProtKB_U1", "UniProtKB_U1"),
            ("UniProtKB_U1", V.PROTEIN_ROOT),
            ("GO_0005829", "GO_0005829"),
            ("GO_0005634", "GO_0005634"),
        ],
        "class_iri string, ancestor_iri string",
    )
    empty2 = spark.createDataFrame([], "xref string, class_iri string")
    return Dims(
        onto_ancestors=anc,
        onto_xrefs=empty2,
        complex_parts=spark.createDataFrame(
            [], "complex_class string, part_class string"
        ),
        sssom=spark.createDataFrame(
            [], "subject_id string, object_id string, confidence double, "
                "mapping_tool string"
        ),
        accession_map=spark.createDataFrame(
            [], "source string, acc string, target_iri string"
        ),
        drug_ids=spark.createDataFrame([], "entity_id string, iuphar_id string"),
    )


def test_b12_protein_transport(spark, dims):
    m = "m1"
    rows = [
        (m, "P", V.TYPE, V.BP_ROOT),
        (m, "R", V.PART_OF, "P"),
        (m, "R", V.TYPE, V.MOLECULAR_EVENT),
        (m, "R", V.HAS_INPUT, "ni"),
        (m, "R", V.HAS_OUTPUT, "no"),
        (m, "ni", V.TYPE, "UniProtKB_U1"),
        (m, "no", V.TYPE, "UniProtKB_U1"),
        (m, "ni", V.EXACT, "E1"),
        (m, "no", V.EXACT, "E1"),
        (m, "ni", V.LOCATED_IN, "l1"),
        (m, "no", V.LOCATED_IN, "l2"),
        (m, "l1", V.TYPE, "GO_0005829"),
        (m, "l2", V.TYPE, "GO_0005634"),
    ]
    out = b12_transport_inference(_t(spark, rows), dims)
    got = {(r.subj, r.pred, r.obj) for r in out.collect()}

    # retyped to protein transporter, molecular_event dropped
    assert ("R", V.TYPE, V.PROTEIN_TRANSPORTER) in got
    assert ("R", V.TYPE, V.MOLECULAR_EVENT) not in got
    # start/end location individuals
    assert ("R", V.HAS_TARGET_START_LOC, "R~tstart~GO_0005829") in got
    assert ("R~tstart~GO_0005829", V.TYPE, "GO_0005829") in got
    assert ("R", V.HAS_TARGET_END_LOC, "R~tend~GO_0005634") in got
    # transported clone with type + provenance
    assert ("R", V.HAS_PRIMARY_INPUT, "ni~transported") in got
    assert ("ni~transported", V.TYPE, "UniProtKB_U1") in got
    assert ("ni~transported", V.EXACT, "E1") in got
    # IO edges and IO nodes fully removed
    assert ("R", V.HAS_INPUT, "ni") not in got
    assert ("R", V.HAS_OUTPUT, "no") not in got
    assert not any(s in ("ni", "no") or o in ("ni", "no") for s, _, o in got)


def test_b12_skips_unmoved_and_differently_named(spark, dims):
    m = "m2"
    rows = [
        (m, "R", V.TYPE, V.MOLECULAR_EVENT),
        (m, "R", V.HAS_INPUT, "ni"),
        (m, "R", V.HAS_OUTPUT, "no"),
        (m, "ni", V.TYPE, "UniProtKB_U1"),
        (m, "no", V.TYPE, "UniProtKB_U1"),
        (m, "ni", V.EXACT, "E1"),
        (m, "no", V.EXACT, "E2"),        # different entity -> no transport
        (m, "ni", V.LOCATED_IN, "l1"),
        (m, "no", V.LOCATED_IN, "l2"),
        (m, "l1", V.TYPE, "GO_0005829"),
        (m, "l2", V.TYPE, "GO_0005634"),
    ]
    before = _t(spark, rows)
    out = b12_transport_inference(before, dims)
    assert out.count() == before.count()
    assert out.filter(F.col("pred") == V.HAS_PRIMARY_INPUT).count() == 0


def test_b12_skips_non_transporter_typed_reaction(spark, dims):
    m = "m3"
    rows = [
        (m, "R", V.TYPE, "GO_0016616"),   # a real MF not in transporter closure
        (m, "R", V.HAS_INPUT, "ni"),
        (m, "R", V.HAS_OUTPUT, "no"),
        (m, "ni", V.TYPE, "UniProtKB_U1"),
        (m, "no", V.TYPE, "UniProtKB_U1"),
        (m, "ni", V.EXACT, "E1"),
        (m, "no", V.EXACT, "E1"),
        (m, "ni", V.LOCATED_IN, "l1"),
        (m, "no", V.LOCATED_IN, "l2"),
        (m, "l1", V.TYPE, "GO_0005829"),
        (m, "l2", V.TYPE, "GO_0005634"),
    ]
    before = _t(spark, rows)
    out = b12_transport_inference(before, dims)
    assert out.count() == before.count()


def test_b13_enabler_from_upstream(spark, dims):
    """B13 (GoCAM.java:1027-1063): molecular_event reaction whose single
    typed input matches an upstream output type -> has_input becomes
    enabled_by; protein/complex closure gate."""
    m = "m13"
    rows = [
        (m, "R2", V.TYPE, V.MOLECULAR_EVENT),
        (m, "R2", V.HAS_INPUT, "i1"),
        (m, "i1", V.TYPE, "UniProtKB_U1"),
        (m, "R1", V.CAUSALLY_UPSTREAM, "R2"),
        (m, "R1", V.HAS_OUTPUT, "o1"),
        (m, "o1", V.TYPE, "UniProtKB_U1"),
    ]
    out = b13_enabler_from_upstream(_t(spark, rows), dims)
    got = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert ("R2", V.ENABLED_BY, "i1") in got
    assert ("R2", V.HAS_INPUT, "i1") not in got

    # two matching inputs -> size==1 gate blocks the rewrite
    m = "m13b"
    rows2 = [
        (m, "R2", V.TYPE, V.MOLECULAR_EVENT),
        (m, "R2", V.HAS_INPUT, "i1"),
        (m, "R2", V.HAS_INPUT, "i2"),
        (m, "i1", V.TYPE, "UniProtKB_U1"),
        (m, "i2", V.TYPE, "UniProtKB_U1"),
        (m, "R1", V.CAUSALLY_UPSTREAM, "R2"),
        (m, "R1", V.HAS_OUTPUT, "o1"),
        (m, "o1", V.TYPE, "UniProtKB_U1"),
    ]
    out2 = b13_enabler_from_upstream(_t(spark, rows2), dims)
    assert out2.filter(F.col("pred") == V.ENABLED_BY).count() == 0


def test_b14_sequestration(spark, dims):
    """B14 (GoCAM.java:1310-1341): R1 binds A+B into an inert complex;
    R2 enabled by A's ref -> R1 directly_negatively_regulates R2."""
    m = "m14"
    base = [
        (m, "R1", V.PART_OF, "P"),
        (m, "R2", V.PART_OF, "P"),
        (m, "R1", V.HAS_INPUT, "a"),
        (m, "R1", V.HAS_INPUT, "b"),
        (m, "R1", V.HAS_OUTPUT, "ab"),
        (m, "a", V.EXACT, "EA"),
        (m, "b", V.EXACT, "EB"),
        (m, "ab", V.EXACT, "EAB"),
        (m, "R2", V.ENABLED_BY, "e"),
        (m, "e", V.EXACT, "EA"),
    ]
    out = b14_regulation_by_sequestration(_t(spark, base))
    got = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert ("R1", V.DIRECTLY_NEG_REGULATES, "R2") in got

    # guard 1: if R1's output feeds another reaction, no inference
    rows_g1 = base + [
        (m, "R3", V.HAS_INPUT, "c"),
        (m, "c", V.EXACT, "EAB"),
    ]
    out_g1 = b14_regulation_by_sequestration(_t(spark, rows_g1))
    assert out_g1.filter(F.col("pred") == V.DIRECTLY_NEG_REGULATES).count() == 0

    # guard 2: active-unit complex contributes_to R2 suppresses the rule
    rows_g2 = base + [
        (m, "CX", V.HAS_PART, "e"),
        (m, "CX", V.CONTRIBUTES_TO, "R2"),
    ]
    out_g2 = b14_regulation_by_sequestration(_t(spark, rows_g2))
    assert out_g2.filter(F.col("pred") == V.DIRECTLY_NEG_REGULATES).count() == 0


def test_b4_salted_equals_unsalted(spark, dims):
    """The salted B4 route (hot-type defense) is output-identical to the
    plain type equijoin: a collector reaction with many upstream causal
    partners sharing one output type — the exact hot-key shape the salt
    spreads — yields the same adds/deletes either way."""
    from pathways2go_spark.stage_b import b4_b5_delta

    m = "mh"
    rows = [(m, "P", V.TYPE, V.BP_ROOT)]
    hot = "UniProtKB_U1"
    # collector RC enabled by an entity of the hot type
    rows += [
        (m, "RC", V.TYPE, V.MOLECULAR_EVENT),
        (m, "RC", V.PART_OF, "P"),
        (m, "RC", V.ENABLED_BY, "ec"),
        (m, "ec", V.TYPE, hot),
    ]
    for i in range(40):
        rows += [
            (m, f"R{i}", V.TYPE, V.MOLECULAR_EVENT),
            (m, f"R{i}", V.PART_OF, "P"),
            (m, f"R{i}", V.HAS_OUTPUT, f"o{i}"),
            (m, f"o{i}", V.TYPE, hot),
            (m, f"R{i}", V.CAUSALLY_UPSTREAM, "RC"),
        ]
    t = _t(spark, rows)

    def canon(delta):
        frames = [
            df.select("model_id", "subj", "pred", "obj")
            for df in delta["adds"] + delta["deletes"]
        ]
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return sorted(map(tuple, out.distinct().collect()))

    plain = canon(b4_b5_delta(t, dims))
    salted = canon(b4_b5_delta(t, dims, salt=8))
    assert plain == salted
    # the hot shape actually fired: all 40 upstream pairs hit B4
    assert sum(1 for r in plain if r[2] == V.DIRECTLY_POS_REGULATES) == 40
