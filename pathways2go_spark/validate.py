"""R2 — structural validation suite over the emitted triple corpus.

The reference validates each model with an OWL reasoner consistency
check (`GoCAM.validateGoCAM` GoCAM.java:1913-1930; owl:Nothing probe via
consistency_check.rq, explanation rendering BioPaxtoGO.java:605-676).
Without a reasoner, the consumed guarantees reduce to structural
invariants over the flat triple table — each check returns a DataFrame
of violations (empty = valid), so the whole suite is one union of
anti-joins that Catalyst executes in a single pass per check.

Checks:
  dangling_edges       every edge endpoint must be a typed node
                       (abox individuals always carry rdf:type in the
                       reference's write model, GoCAM.java:751-790)
  unknown_predicates   every pred must belong to the declared RO/BFO
                       vocabulary (GoCAM.java:335-387) + pseudo preds
  mf_bp_disjoint       no node typed in both the MF and BP closures
                       (GO disjointness the reasoner would flag)
  orphan_evidence      evidence annotations must reference existing
                       rows (evidence column non-null on every triple)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import vocab as V

_KNOWN_PREDS = set(V.EDGE_PREDS) | {V.TYPE, V.EXACT, V.LABEL}


def _edges(t: DataFrame) -> DataFrame:
    return t.filter(F.col("pred").isin(V.EDGE_PREDS))


def dangling_edges(t: DataFrame) -> DataFrame:
    """Edge endpoints with no rdf:type row in the same model."""
    typed = t.filter(F.col("pred") == V.TYPE).select(
        "model_id", F.col("subj").alias("node")
    ).distinct()
    e = _edges(t)
    ends = (
        e.select("model_id", F.col("subj").alias("node"), "pred")
        .unionByName(e.select("model_id", F.col("obj").alias("node"), "pred"))
    )
    return (
        ends.join(typed, ["model_id", "node"], "left_anti")
        .select("model_id", "node", "pred")
        .distinct()
        .withColumn("check", F.lit("dangling_edge_endpoint"))
    )


def unknown_predicates(t: DataFrame) -> DataFrame:
    return (
        t.filter(~F.col("pred").isin(sorted(_KNOWN_PREDS)))
        .select("model_id", F.col("subj").alias("node"), "pred")
        .distinct()
        .withColumn("check", F.lit("unknown_predicate"))
    )


def mf_bp_overlap(t: DataFrame, ancestors: DataFrame) -> DataFrame:
    """Nodes typed in both the MF and BP closures — the disjointness the
    reference's reasoner consistency check would surface."""
    ty = t.filter(F.col("pred") == V.TYPE).select(
        "model_id", F.col("subj").alias("node"), F.col("obj").alias("cls")
    )

    def closure(root: str) -> DataFrame:
        cl = ancestors.filter(F.col("ancestor_iri") == root).select(
            F.col("class_iri").alias("cls")
        )
        return ty.join(F.broadcast(cl), "cls", "left_semi").select(
            "model_id", "node"
        ).distinct()

    return (
        closure(V.MF_ROOT).join(closure(V.BP_ROOT), ["model_id", "node"], "left_semi")
        .withColumn("pred", F.lit(V.TYPE))
        .select("model_id", "node", "pred")
        .withColumn("check", F.lit("mf_bp_overlap"))
    )


def missing_evidence(t: DataFrame) -> DataFrame:
    return (
        _edges(t).filter(F.col("evidence").isNull() | (F.col("evidence") == ""))
        .select("model_id", F.col("subj").alias("node"), "pred")
        .distinct()
        .withColumn("check", F.lit("missing_evidence"))
    )


def validate(t: DataFrame, ancestors: DataFrame) -> DataFrame:
    """All checks unioned: (check, model_id, node, pred); empty = valid."""
    frames = [
        dangling_edges(t),
        unknown_predicates(t),
        mf_bp_overlap(t, ancestors),
        missing_evidence(t),
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.select("check", "model_id", "node", "pred")
