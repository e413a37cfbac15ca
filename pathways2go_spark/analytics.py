"""G1-G8 — report/analytics aggregations over the emitted triple corpus.

Reference: the SPARQL SELECT workload (get_pathways/get_functions/... .rq,
QRunner.java:173-283; GoCAM.java:390-435; Manuscript.java:53-80) — the
engine's query layer, mapped 1:1 to DataFrame aggregations over the
partitioned triples table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import vocab as V


def _types(t: DataFrame) -> DataFrame:
    return t.filter(F.col("pred") == V.TYPE).select(
        "model_id", F.col("subj").alias("node"), F.col("obj").alias("cls")
    )


def nodes_by_root(t: DataFrame, ancestors: DataFrame, root: str) -> DataFrame:
    """G1/G2: nodes typed by any class in the closure of `root`
    (subClassOf* listing, get_pathways.rq / get_functions.rq)."""
    closure = ancestors.filter(F.col("ancestor_iri") == root).select(
        F.col("class_iri").alias("cls")
    )
    return (
        _types(t).join(F.broadcast(closure), "cls")
        .select("model_id", "node", "cls")
        .distinct()
    )


def relation_counts(t: DataFrame) -> DataFrame:
    """G3: causal/functional edge counts by relation
    (get_function_relations.rq)."""
    return (
        t.filter(F.col("pred").isin(V.EDGE_PREDS))
        .groupBy("pred")
        .agg(F.count("*").alias("n"))
    )


def component_locations(t: DataFrame) -> DataFrame:
    """G4: distinct occurs_in location classes per model (get_components.rq)."""
    occ = t.filter(F.col("pred") == V.OCCURS_IN).select(
        "model_id", F.col("obj").alias("node")
    )
    return (
        occ.join(_types(t), ["model_id", "node"])
        .select("model_id", F.col("cls").alias("location_cls"))
        .distinct()
    )


def xref_map(t: DataFrame) -> DataFrame:
    """G5: node -> exactMatch xref multimap (getThingAnnoMap)."""
    return (
        t.filter(F.col("pred") == V.EXACT)
        .groupBy("model_id", F.col("subj").alias("node"))
        .agg(F.sort_array(F.collect_set("obj")).alias("xrefs"))
    )


def count_unclassified(t: DataFrame, ancestors: DataFrame) -> DataFrame:
    """G6: per model, nodes with no GO/CHEBI-rooted type (GoCAM.java:390-435)."""
    rooted = ancestors.filter(
        F.col("ancestor_iri").isin(V.MF_ROOT, V.BP_ROOT, V.CC_ROOT,
                                   V.CHEMICAL_ROOT, V.PROTEIN_ROOT, V.COMPLEX_GO)
    ).select(F.col("class_iri").alias("cls"))
    ty = _types(t)
    classified = ty.join(F.broadcast(rooted), "cls").select("model_id", "node").distinct()
    return (
        ty.select("model_id", "node").distinct()
        .join(classified, ["model_id", "node"], "left_anti")
        .groupBy("model_id")
        .agg(F.count("*").alias("n_unclassified"))
    )


def untyped_reactions(t: DataFrame) -> DataFrame:
    """G7: molecular_event reactions with their concatenated io
    (query2find_untyped.rq GROUP_CONCAT)."""
    me = _types(t).filter(F.col("cls") == V.MOLECULAR_EVENT).select(
        "model_id", F.col("node").alias("reaction")
    )
    io = t.filter(F.col("pred").isin(V.HAS_INPUT, V.HAS_OUTPUT)).select(
        "model_id", F.col("subj").alias("reaction"), "pred", F.col("obj").alias("e")
    )
    return (
        me.join(io, ["model_id", "reaction"], "left")
        .groupBy("model_id", "reaction")
        .agg(
            F.concat_ws(",", F.sort_array(
                F.collect_set(F.when(F.col("pred") == V.HAS_INPUT, F.col("e"))))
            ).alias("inputs"),
            F.concat_ws(",", F.sort_array(
                F.collect_set(F.when(F.col("pred") == V.HAS_OUTPUT, F.col("e"))))
            ).alias("outputs"),
        )
    )


def corpus_summary(t: DataFrame) -> DataFrame:
    """G8: cross-model rollup (the Manuscript.java whole-journal shape)."""
    return t.groupBy("model_id").agg(
        F.count("*").alias("n_triples"),
        F.countDistinct("subj").alias("n_subjects"),
        F.countDistinct(F.when(F.col("pred") == V.TYPE, F.col("subj"))).alias("n_typed_nodes"),
        F.sum((F.col("pred") == V.CAUSALLY_UPSTREAM).cast("long")).alias("n_causal"),
        F.sum((F.col("pred") == V.PROVIDES_INPUT).cast("long")).alias("n_provides_input"),
        F.sum((F.col("pred") == V.ENABLED_BY).cast("long")).alias("n_enabled_by"),
    )
