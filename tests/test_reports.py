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
