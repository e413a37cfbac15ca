"""End-to-end pipeline: documents -> ingest -> stage A -> stage B -> triples.

Mirrors BioPaxtoGO.convert + wrapAndWrite (BioPaxtoGO.java:167-343, :549-639)
but set-at-a-time over all models at once: one distributed DAG instead of a
per-file loop with per-rule model rebuilds.

Checkpoint discipline: the triple set is hash-partitioned by model_id once
after stage A (every stage-B rule joins on model_id-prefixed keys, so rule
self-joins co-partition); each rule output is checkpointed to cut lineage
(driver-side loop of staged materializations — the cluster version writes
each stage to a partitioned table via sinks.py for resume)."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dims import Dims
from .ingest import ingest
from .stage_a import extract
from . import stage_b as B


@dataclass
class PipelineResult:
    triples: DataFrame          # model_id, subj, pred, obj, evidence, rule
    audit: DataFrame            # rule, model_id, reaction, detail
    drug_reactions: DataFrame


def run_pipeline(
    spark: SparkSession,
    documents: DataFrame,
    dims: Dims,
    checkpoint: bool = True,
) -> PipelineResult:
    elements, links = ingest(documents)
    sa = extract(elements, links, dims)

    def ck(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=False) if checkpoint else df

    t = sa.triples.repartition("model_id")
    drugs = sa.drug_reactions.localCheckpoint(eager=False)
    t = ck(B.b10_remove_drug_reactions(t, drugs))
    t = ck(B.b1_mf_from_enablers(t))
    t = ck(B.b2_occurs_in(t))
    t = ck(B.b3_regulates_via_output_regulates(t))
    t = ck(B.b4_b5_causal_rewrites(t, dims))
    t, audit = B.b6_small_molecule_regulators(t, dims)
    t = ck(t)
    t = ck(B.b7_delete_complexes_with_active_units(t))
    t = B.b8_delete_disallowed(t)
    t = ck(B.b9_clean_unconnected(t))
    t = B.b11_model_gate(t, dims)
    return PipelineResult(triples=t, audit=audit, drug_reactions=drugs)


def precision_recall(actual: DataFrame, expected: DataFrame) -> dict[str, float]:
    """Set P/R on (model_id, subj, pred, obj) — the driver's headline metric
    (BASELINE.json: P/R >= 0.95 vs the reference regression set)."""
    key = ["model_id", "subj", "pred", "obj"]
    a = actual.select(*key).distinct().cache()
    e = expected.select(*key).distinct().cache()
    n_a, n_e = a.count(), e.count()
    tp = a.join(e, key, "inner").count()
    return {
        "precision": tp / n_a if n_a else 1.0,
        "recall": tp / n_e if n_e else 1.0,
        "actual": float(n_a),
        "expected": float(n_e),
        "tp": float(tp),
    }


def diff_vs_expected(actual: DataFrame, expected: DataFrame) -> DataFrame:
    """(side, model_id, subj, pred, obj): 'spurious' rows only in actual,
    'missing' rows only in expected — the debugging view."""
    key = ["model_id", "subj", "pred", "obj"]
    a = actual.select(*key).distinct()
    e = expected.select(*key).distinct()
    return (
        a.join(e, key, "left_anti").withColumn("side", F.lit("spurious"))
        .unionByName(e.join(a, key, "left_anti").withColumn("side", F.lit("missing")))
        .select("side", *key)
    )
