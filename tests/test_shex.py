"""ShEx shape-validation tests: the golden corpus conforms (all-zero
summary), and each check fires on a seeded violation — the positive
control the reference gets from Minerva's violation reports
(scripts/readable_shex_report.py categories)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pathways2go_spark import shex
from pathways2go_spark import vocab as V
from pathways2go_spark.dims import load_dims
from pathways2go_spark.pipeline import run_pipeline
from tests.conftest import FIXTURE_DIR


@pytest.fixture(scope="module")
def dims(spark):
    return load_dims(spark, FIXTURE_DIR)


@pytest.fixture(scope="module")
def triples(spark, documents, dims):
    res = run_pipeline(spark, documents, dims)
    t = res.triples.select("model_id", "subj", "pred", "obj")
    t.cache().count()
    return t


def test_golden_corpus_conforms(triples, dims):
    assert shex.shex_validate(triples, dims.onto_ancestors).count() == 0
    rows = shex.shex_summary(triples, dims.onto_ancestors).collect()
    assert {r["check"] for r in rows} == set(shex.CHECKS)
    assert all(r["n_violations"] == 0 for r in rows)


def _with(spark, triples, extra):
    add = spark.createDataFrame(extra, ["model_id", "subj", "pred", "obj"])
    return triples.unionByName(add)


def _checks_fired(spark, triples, dims, extra):
    v = shex.shex_validate(_with(spark, triples, extra), dims.onto_ancestors)
    return {r["check"] for r in v.collect()}


def test_seeded_double_enabler(spark, triples, dims):
    """Two enablers on one reaction -> enabled_by_max1, with the full
    enabler set in the explanation detail."""
    r = triples.filter(F.col("pred") == V.ENABLED_BY).first()
    extra = [(r["model_id"], r["subj"], V.ENABLED_BY, "seeded~extra~ctl"),
             (r["model_id"], "seeded~extra~ctl", V.TYPE, "UniProtKB_U-seed")]
    t2 = _with(spark, triples, extra)
    v = shex.shex_validate(t2, dims.onto_ancestors)
    hit = v.filter(F.col("check") == "enabled_by_max1").collect()
    assert len(hit) == 1
    assert hit[0]["node"] == r["subj"]
    assert "seeded~extra~ctl" in hit[0]["detail"]
    assert r["obj"] in hit[0]["detail"]


def test_seeded_occurrent_enabler(spark, triples, dims):
    """An MF-typed node as enabler -> enabled_by_physical."""
    r = triples.filter(F.col("pred") == V.ENABLED_BY).first()
    extra = [
        (r["model_id"], "seeded_act", V.TYPE, V.MF_ROOT),
        (r["model_id"], "seeded_rxn", V.TYPE, V.MOLECULAR_EVENT),
        (r["model_id"], "seeded_rxn", V.ENABLED_BY, "seeded_act"),
    ]
    fired = _checks_fired(spark, triples, dims, extra)
    assert "enabled_by_physical" in fired


def test_seeded_bad_location(spark, triples, dims):
    """occurs_in to an MF-typed (non-CC) node -> occurs_in_cc; a second
    occurs_in on the same reaction -> occurs_in_max1."""
    r = triples.filter(F.col("pred") == V.OCCURS_IN).first()
    extra = [
        (r["model_id"], r["subj"], V.OCCURS_IN, "seeded_loc"),
        (r["model_id"], "seeded_loc", V.TYPE, V.MF_ROOT),
    ]
    fired = _checks_fired(spark, triples, dims, extra)
    assert "occurs_in_cc" in fired and "occurs_in_max1" in fired


def test_seeded_untyped_location(spark, triples, dims):
    extra = [("seedm", "seeded_rxn", V.OCCURS_IN, "seeded_untyped_loc")]
    v = shex.shex_validate(_with(spark, triples, extra), dims.onto_ancestors)
    hit = v.filter(
        (F.col("check") == "occurs_in_cc") & (F.col("obj") == "seeded_untyped_loc")
    ).collect()
    assert len(hit) == 1 and "<untyped>" in hit[0]["detail"]


def test_seeded_part_of_physical(spark, triples, dims):
    """part_of to a protein-typed node -> part_of_bp."""
    r = triples.filter(F.col("pred") == V.TYPE).filter(
        F.col("obj").startswith("UniProtKB_")
    ).first()
    extra = [(r["model_id"], "seeded_rxn", V.PART_OF, r["subj"])]
    fired = _checks_fired(spark, triples, dims, extra)
    assert "part_of_bp" in fired


def test_seeded_causal_to_entity(spark, triples, dims):
    """causally_upstream_of to a physical entity -> causal_occurrents
    (object end), with the end named in the detail."""
    ent = triples.filter(F.col("pred") == V.TYPE).filter(
        F.col("obj").startswith("UniProtKB_")
    ).first()
    rxn = triples.filter(F.col("pred") == V.CAUSALLY_UPSTREAM).first()
    extra = [(ent["model_id"], rxn["subj"] if rxn["model_id"] == ent["model_id"]
              else "seeded_rxn", V.CAUSALLY_UPSTREAM, ent["subj"])]
    if extra[0][1] == "seeded_rxn":
        extra.append((ent["model_id"], "seeded_rxn", V.TYPE, V.MOLECULAR_EVENT))
    v = shex.shex_validate(_with(spark, triples, extra), dims.onto_ancestors)
    hit = v.filter(
        (F.col("check") == "causal_occurrents") & (F.col("obj") == ent["subj"])
    ).collect()
    assert hit and "object is not an occurrent" in hit[0]["detail"]


def test_seeded_io_occurrent_and_sm_regulator(spark, triples, dims):
    """has_output to a BP-typed node -> io_physical; a small-molecule
    activator without a chemical type -> sm_regulator_chemical."""
    m = triples.first()["model_id"]
    extra = [
        (m, "seeded_rxn", V.TYPE, V.MOLECULAR_EVENT),
        (m, "seeded_bp", V.TYPE, V.BP_ROOT),
        (m, "seeded_rxn", V.HAS_OUTPUT, "seeded_bp"),
        (m, "seeded_prot", V.TYPE, "UniProtKB_U-seed"),
        (m, "seeded_rxn", V.SM_ACTIVATOR, "seeded_prot"),
        (m, "seeded_rxn2", V.TYPE, V.MOLECULAR_EVENT),
        (m, "seeded_rxn2", V.INTERACTS_WITH, "seeded_prot"),
    ]
    fired = _checks_fired(spark, triples, dims, extra)
    assert {"io_physical", "sm_regulator_chemical",
            "interacts_physical"} <= fired
