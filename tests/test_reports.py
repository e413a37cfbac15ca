"""K4 GPAD export + R2 structural validation over the pipeline output."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pathways2go_spark import vocab as V
from pathways2go_spark.analytics import gpad_export
from pathways2go_spark.dims import load_dims
from pathways2go_spark.pipeline import run_pipeline
from pathways2go_spark.validate import validate


@pytest.fixture(scope="module")
def result(spark, documents, fixture_paths):
    dims = load_dims(spark, os.path.dirname(fixture_paths["documents"]))
    res = run_pipeline(spark, documents, dims)
    return res, dims


def test_gpad_enables_row(result):
    res, dims = result
    rows = gpad_export(res.triples, dims.onto_ancestors)
    # T1: enzyme U-T1x00000-10 enables R2's MF (B1 gave R2 GO_0003674)
    got = {
        (r.db_object_id, r.qualifier, r.go_id)
        for r in rows.filter(F.col("reference") == "T1x00000").collect()
    }
    assert ("U-T1x00000-10", "enables", V.MF_ROOT) in got
    # and involved_in the pathway's BP root type
    assert ("U-T1x00000-10", "involved_in", V.BP_ROOT) in got


def test_gpad_schema_constants(result):
    res, dims = result
    rows = gpad_export(res.triples, dims.onto_ancestors)
    one = rows.limit(1).collect()[0]
    assert one.db == "UniProtKB"
    assert one.evidence == V.ECO_IMPORTED


def test_validation_clean(result):
    res, dims = result
    bad = validate(res.triples, dims.onto_ancestors)
    rows = bad.collect()
    assert rows == [], rows[:20]


def test_gpad_compare_statuses(spark):
    """K4b diff: overlap / missing / extra classification + the
    reference's gene-id-present split for missing rows."""
    from pathways2go_spark.analytics import gpad_compare

    cols = ["db", "db_object_id", "qualifier", "go_id", "reference"]
    exp = spark.createDataFrame(
        [("UniProtKB", "P1", "enables", "GO_1", "m1"),
         ("UniProtKB", "P2", "enables", "GO_2", "m1")], cols)
    ref = spark.createDataFrame(
        [("UniProtKB", "P1", "enables", "GO_1", "m1"),      # overlap
         ("UniProtKB", "P2", "involved_in", "GO_3", "m1"),  # missing, gene known
         ("UniProtKB", "P9", "enables", "GO_4", "m1")], cols)  # missing, unknown
    got = {(r.db_object_id, r.qualifier, r.go_id): (r.status, r.gene_in_export)
           for r in gpad_compare(exp, ref).collect()}
    assert got[("P1", "enables", "GO_1")] == ("overlap", True)
    assert got[("P2", "enables", "GO_2")] == ("extra", True)
    assert got[("P2", "involved_in", "GO_3")] == ("missing", True)
    assert got[("P9", "enables", "GO_4")] == ("missing", False)


def test_gpad_compare_against_fixture(spark, result, fixture_paths):
    """The deterministic reference fixture exercises every status."""
    import os as _os

    from pathways2go_spark.analytics import gpad_compare
    from pathways2go_spark.datagen import ensure_reference_gpad

    res, dims = result
    fdir = _os.path.dirname(fixture_paths["documents"])
    ref = spark.read.parquet(ensure_reference_gpad(fdir))
    d = gpad_compare(gpad_export(res.triples, dims.onto_ancestors), ref)
    statuses = {r["status"] for r in d.select("status").distinct().collect()}
    assert statuses == {"overlap", "missing", "extra"}
