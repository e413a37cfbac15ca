"""End-to-end pipeline: documents -> ingest -> stage A -> stage B -> triples.

Mirrors BioPaxtoGO.convert + wrapAndWrite (BioPaxtoGO.java:167-343, :549-639)
but set-at-a-time over all models at once: one distributed DAG instead of a
per-file loop with per-rule model rebuilds.

Stage B runs on one of two physical paths with identical semantics:

  local (default for bounded models)   ONE shuffle: groupBy(model_id)
      .cogroup(drug_reactions).applyInPandas over Arrow batches — the
      reference's per-named-graph rule loop (GoCAM.java:974-999), which is
      embarrassingly parallel across models (stage_b_local.py).
  distributed (mega-model skew path)   each rule as global DataFrame
      self-joins (stage_b.py) — ~25 shuffles, but no per-model memory
      bound; used for models whose stage-A triple count exceeds
      `local_threshold` (stage_b_mode="auto" routes per model).

Checkpoint discipline: the stage-A triple set is hash-partitioned by
model_id and checkpointed once; the distributed rule chain checkpoints per
rule to cut lineage (the cluster version writes each stage to a
partitioned table via sinks.py for resume)."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dims import Dims
from .ingest import ingest
from .stage_a import extract
from . import stage_a_local as AL
from . import stage_b as B
from . import stage_b_local as BL

_TRIPLE_SCHEMA = (
    "model_id string, subj string, pred string, obj string, "
    "evidence string, rule string"
)

_AUDIT_COLS = ["rule", "model_id", "reaction", "detail"]


@dataclass
class PipelineResult:
    triples: DataFrame          # model_id, subj, pred, obj, evidence, rule
    audit: DataFrame            # rule, model_id, reaction, detail
    drug_reactions: DataFrame


def _stage_b_distributed(
    t: DataFrame, drugs: DataFrame, dims: Dims, checkpoint: bool
) -> tuple[DataFrame, DataFrame]:
    def ck(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=False) if checkpoint else df

    # checkpoint only after the join-heavy rules — lineage between the
    # cheap filter/anti-join rules stays shallow enough for Catalyst
    t = B.b10_remove_drug_reactions(t, drugs)
    t = B.b1_mf_from_enablers(t)
    t = ck(B.b2_occurs_in(t))
    t = ck(B.b3_regulates_via_output_regulates(t))
    t = ck(B.b4_b5_causal_rewrites(t, dims))
    t, audit = B.b6_small_molecule_regulators(t, dims)
    t = ck(t)
    t = B.b7_delete_complexes_with_active_units(t)
    t = B.b8_delete_disallowed(t)
    t = ck(B.b9_clean_unconnected(t))
    t = B.b11_model_gate(t, dims)
    return t, audit


def _stage_b_local(
    t: DataFrame, drugs: DataFrame, dims: Dims
) -> tuple[DataFrame, DataFrame]:
    local_dims = BL.build_local_dims(
        dims.onto_ancestors.toPandas(), dims.complex_parts.toPandas()
    )

    def run(left, right):
        if len(left) == 0:
            return left.iloc[0:0]
        return BL.apply_rules_local(left, set(right["reaction"]), local_dims)

    out = (
        t.groupBy("model_id")
        .cogroup(drugs.groupBy("model_id"))
        .applyInPandas(run, schema=_TRIPLE_SCHEMA)
    )
    triples = out.filter(F.col("pred") != BL.AUDIT_PRED)
    audit = out.filter(F.col("pred") == BL.AUDIT_PRED).select(
        F.col("rule"),
        "model_id",
        F.col("subj").alias("reaction"),
        F.col("obj").alias("detail"),
    )
    return triples, audit


def prepare_local_dims(dims: Dims) -> tuple:
    """One-time driver-side build of the plain-python dictionary views the
    fused path ships to workers (the §1.5 bounded ontology dictionaries —
    in production this cost is fixed by ontology size, not corpus size).
    Pass the result to run_pipeline(prepared=...) to amortize it across
    repeated runs in one session (bench / streaming micro-batches)."""
    a_dims = AL.build_stage_a_dims(dims)
    b_dims = BL.build_local_dims(
        dims.onto_ancestors.toPandas(), dims.complex_parts.toPandas()
    )
    return a_dims, b_dims


def _fused(
    documents: DataFrame, dims: Dims, prepared: tuple | None = None
) -> tuple[DataFrame, DataFrame]:
    """Zero-shuffle path: span parse + stage A + stage B fused into one
    mapInPandas over documents (stage_a_local.py)."""
    a_dims, b_dims = prepared if prepared is not None else prepare_local_dims(dims)
    out = documents.mapInPandas(
        AL.fused_pipeline_udf(a_dims, b_dims), schema=_TRIPLE_SCHEMA
    )
    triples = out.filter(F.col("pred") != BL.AUDIT_PRED)
    audit = out.filter(F.col("pred") == BL.AUDIT_PRED).select(
        F.col("rule"),
        "model_id",
        F.col("subj").alias("reaction"),
        F.col("obj").alias("detail"),
    )
    return triples, audit


def run_pipeline(
    spark: SparkSession,
    documents: DataFrame,
    dims: Dims,
    checkpoint: bool = True,
    stage_b_mode: str = "auto",
    local_threshold: int = 500_000,
    stage_a_mode: str = "auto",
    span_threshold: int = 500_000,
    prepared: tuple | None = None,
) -> PipelineResult:
    """stage_a_mode:
      "auto"        fused per-doc path for documents whose span count is
                    within `span_threshold`; bigger docs go through the
                    distributed operators (skew/memory defense).
      "local"       fused path for everything.
      "distributed" distributed stage A + stage_b_mode routing.
    """
    if stage_a_mode == "local":
        tt, audit = _fused(documents, dims, prepared)
        empty_drugs = documents.sparkSession.createDataFrame(
            [], "model_id string, reaction string"
        )
        return PipelineResult(triples=tt, audit=audit, drug_reactions=empty_drugs)
    if stage_a_mode == "auto":
        small = documents.filter(F.size("spans") <= span_threshold)
        big = documents.filter(F.size("spans") > span_threshold)
        ts, audit_s = _fused(small, dims, prepared)
        if big.isEmpty():
            empty_drugs = documents.sparkSession.createDataFrame(
                [], "model_id string, reaction string"
            )
            return PipelineResult(
                triples=ts, audit=audit_s, drug_reactions=empty_drugs
            )
        rb = run_pipeline(
            spark, big, dims, checkpoint=checkpoint,
            stage_b_mode=stage_b_mode, local_threshold=local_threshold,
            stage_a_mode="distributed",
        )
        return PipelineResult(
            triples=ts.unionByName(rb.triples),
            audit=audit_s.unionByName(rb.audit.select(*_AUDIT_COLS)),
            drug_reactions=rb.drug_reactions,
        )

    elements, links = ingest(documents)
    if checkpoint:
        # materialize the span parse ONCE — every stage-A loop iteration and
        # eager checkpoint otherwise re-runs the whole ingest lineage
        elements = elements.localCheckpoint(eager=True)
        links = links.localCheckpoint(eager=True)
    sa = extract(elements, links, dims)

    # NOTE: no repartition("model_id") here — a mega model would collapse
    # into a single partition (the skew we are defending against). The
    # local path's cogroup shuffles by model_id itself; the distributed
    # rules shuffle on their own wider (model_id, node/type) keys.
    t = sa.triples
    drugs = sa.drug_reactions.localCheckpoint(eager=True)

    if stage_b_mode == "distributed":
        tt, audit = _stage_b_distributed(t, drugs, dims, checkpoint)
        return PipelineResult(triples=tt, audit=audit, drug_reactions=drugs)

    if stage_b_mode == "local":
        tt, audit = _stage_b_local(t, drugs, dims)
        return PipelineResult(triples=tt, audit=audit, drug_reactions=drugs)

    # auto: route mega-models (per-model stage-A triple count above the
    # threshold) through the distributed rules — the skew defense — and
    # everything else through the one-shuffle local path.
    t = t.localCheckpoint(eager=True)
    big = (
        t.groupBy("model_id")
        .count()
        .filter(F.col("count") > local_threshold)
        .select("model_id")
        .localCheckpoint(eager=True)
    )
    if big.isEmpty():
        tt, audit = _stage_b_local(t, drugs, dims)
        return PipelineResult(triples=tt, audit=audit, drug_reactions=drugs)

    t_small = t.join(big, "model_id", "left_anti")
    t_big = t.join(big, "model_id", "left_semi")
    d_small = drugs.join(big, "model_id", "left_anti")
    d_big = drugs.join(big, "model_id", "left_semi")
    ts, audit_s = _stage_b_local(t_small, d_small, dims)
    tb, audit_b = _stage_b_distributed(t_big, d_big, dims, checkpoint)
    return PipelineResult(
        triples=ts.unionByName(tb),
        audit=audit_s.unionByName(audit_b.select(*_AUDIT_COLS)),
        drug_reactions=drugs,
    )


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
