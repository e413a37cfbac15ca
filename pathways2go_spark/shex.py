"""ShEx-style shape validation of emitted GO-CAM models.

The reference's release gate runs Minerva's ShEx validator against the
go-cam-shapes schema (`/root/reference/Makefile` `validate:` target:
`minerva-cli --validate-go-cams --shex --shexpath
go-cam-shapes-edited.shex`) and renders the violations with
`scripts/readable_shex_report.py`. Here the same shape constraints are
re-expressed as declarative DataFrame checks over the flat triple
table — each check is one scan of the (broadcast-filtered) triples
plus broadcast ontology-closure semi-joins, so the whole suite is
map-side at any corpus scale (the ontology closure is the only join
state, bounded by ontology size, never by corpus size).

Shapes checked (the go-cam-shapes invariants the emitted models rely
on; names follow the readable report's categories):

  enabled_by_max1        an activity has at most ONE enabler
                         (MolecularFunction shape: enabled_by {0,1})
  enabled_by_physical    enabled_by targets an information
                         biomacromolecule / complex / chemical — a
                         physical continuant, never an MF/BP-typed
                         occurrent
  occurs_in_cc           occurs_in targets a node whose every type is
                         in the cellular-component closure
  occurs_in_max1         at most one occurs_in per activity (the B2
                         single-location rule the reference emits)
  part_of_bp             part_of from an occurrent lands on a
                         BP-typed node (pathway / BP individual)
  causal_occurrents      causal-family edges connect two occurrents
                         (MF/BP/molecular_event-typed), never a
                         physical entity
  io_physical            has_input / has_output / has_part targets
                         are physical continuants (not occurrents)
  sm_regulator_chemical  has_small_molecule_{activator,inhibitor}
                         targets carry a chemical-entity type
  interacts_physical     interacts_with connects physical entities

Not applicable here: the "Missing label" category (rdfs:label lives
in the report layer, not the final triple table — kg_model_report
carries the labels) and the UniProt-isoform / REACTO-mismatch
categories (isoforms and REACTO individuals are resolved to classes
during extraction, so the mismatch cannot be represented).

Violations carry a `detail` column with the offending evidence (the
extra enabler set, the non-CC type, ...) — the explanation surface
`readable_shex_report.py` renders for humans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import vocab as V

CAUSAL_PREDS = [
    V.CAUSALLY_UPSTREAM, V.PROVIDES_INPUT,
    V.DIRECTLY_POS_REGULATES, V.DIRECTLY_NEG_REGULATES,
    V.INV_REG, V.INV_POS_REG, V.INV_NEG_REG,
]
IO_PREDS = [V.HAS_INPUT, V.HAS_OUTPUT, V.HAS_PART]

CHECKS = [
    "enabled_by_max1", "enabled_by_physical", "occurs_in_cc",
    "occurs_in_max1", "part_of_bp", "causal_occurrents",
    "io_physical", "sm_regulator_chemical", "interacts_physical",
]

_COLS = ["check", "model_id", "node", "pred", "obj", "detail"]


def _types(t: DataFrame) -> DataFrame:
    return t.filter(F.col("pred") == V.TYPE).select(
        "model_id", F.col("subj").alias("node"), F.col("obj").alias("cls")
    )


def _closure(ancestors: DataFrame, roots: list[str]) -> DataFrame:
    """Distinct classes under any of `roots` (broadcast-sized)."""
    return (
        ancestors.filter(F.col("ancestor_iri").isin(roots))
        .select(F.col("class_iri").alias("cls"))
        .distinct()
    )


def _occurrent_nodes(
    t: DataFrame, ancestors: DataFrame, _shared: DataFrame | None = None
) -> DataFrame:
    """(model_id, node) with >=1 MF/BP/molecular-event type. `_shared`:
    a precomputed copy (shex_validate materializes this frame ONCE and
    threads it through the five checks that need it — otherwise every
    check re-expands the closure-join subtree into the final plan and
    re-scans the fact table)."""
    if _shared is not None:
        return _shared
    occ_cls = _closure(ancestors, [V.MF_ROOT, V.BP_ROOT])
    ty = _types(t)
    return (
        ty.join(F.broadcast(occ_cls), "cls", "left_semi")
        .unionByName(ty.filter(F.col("cls") == V.MOLECULAR_EVENT).drop("cls"),
                     allowMissingColumns=True)
        .select("model_id", "node")
        .distinct()
    )


def _edges_of(t: DataFrame, preds: list[str]) -> DataFrame:
    return t.filter(F.col("pred").isin(preds)).select(
        "model_id", F.col("subj").alias("node"), "pred", "obj"
    ).distinct()


def _v(df: DataFrame, check: str, detail) -> DataFrame:
    return df.select(
        F.lit(check).alias("check"), "model_id", "node", "pred", "obj",
        detail.alias("detail"),
    )


def enabled_by_max1(t: DataFrame) -> DataFrame:
    """MolecularFunction shape: enabled_by {0,1} — more than one
    distinct enabler on one activity violates (go-cam-shapes)."""
    multi = (
        _edges_of(t, [V.ENABLED_BY])
        .groupBy("model_id", "node")
        .agg(
            F.count("*").alias("n"),
            F.array_sort(F.collect_set("obj")).alias("enablers"),
        )
        .filter(F.col("n") > 1)
    )
    return _v(
        multi.withColumn("pred", F.lit(V.ENABLED_BY)).withColumn(
            "obj", F.element_at("enablers", 1)
        ),
        "enabled_by_max1",
        F.concat(F.lit("enablers: "), F.concat_ws(",", "enablers")),
    )


def _target_is_occurrent(
    t: DataFrame, ancestors: DataFrame, preds: list[str], check: str,
    occ: DataFrame | None = None,
) -> DataFrame:
    """Edges whose OBJECT is an occurrent — the physical-continuant
    shapes (enabled_by / io / interacts) expressed negatively so
    foreign classes absent from the ontology never false-positive."""
    occ = _occurrent_nodes(t, ancestors, occ).withColumnRenamed("node", "obj")
    e = _edges_of(t, preds)
    return _v(
        e.join(occ, ["model_id", "obj"], "left_semi"),
        check,
        F.lit("target is MF/BP-typed (occurrent), expected physical entity"),
    )


def enabled_by_physical(
    t: DataFrame, ancestors: DataFrame, occ: DataFrame | None = None
) -> DataFrame:
    return _target_is_occurrent(
        t, ancestors, [V.ENABLED_BY], "enabled_by_physical", occ
    )


def io_physical(
    t: DataFrame, ancestors: DataFrame, occ: DataFrame | None = None
) -> DataFrame:
    return _target_is_occurrent(t, ancestors, IO_PREDS, "io_physical", occ)


def interacts_physical(
    t: DataFrame, ancestors: DataFrame, occ: DataFrame | None = None
) -> DataFrame:
    occ = _occurrent_nodes(t, ancestors, occ)
    e = _edges_of(t, [V.INTERACTS_WITH])
    both_ends = e.join(occ, ["model_id", "node"], "left_semi").unionByName(
        e.join(occ.withColumnRenamed("node", "obj"), ["model_id", "obj"],
               "left_semi")
    ).distinct()
    return _v(
        both_ends,
        "interacts_physical",
        F.lit("interacts_with endpoint is an occurrent"),
    )


def occurs_in_cc(t: DataFrame, ancestors: DataFrame) -> DataFrame:
    """occurs_in target must be typed ONLY with cellular-component
    classes (AnatomicalEntity shape)."""
    cc = _closure(ancestors, [V.CC_ROOT])
    occ_edges = _edges_of(t, [V.OCCURS_IN])
    loc_nodes = occ_edges.select(
        "model_id", F.col("obj").alias("node")
    ).distinct()
    bad_typed = (
        _types(t)
        .join(loc_nodes, ["model_id", "node"], "left_semi")
        .join(F.broadcast(cc), "cls", "left_anti")
    )
    untyped = loc_nodes.join(
        _types(t).select("model_id", "node").distinct(),
        ["model_id", "node"], "left_anti",
    ).withColumn("cls", F.lit(None).cast("string"))
    bad = bad_typed.unionByName(untyped).withColumnRenamed("node", "obj")
    return _v(
        occ_edges.join(bad, ["model_id", "obj"], "inner")
        .withColumnRenamed("cls", "bad_cls"),
        "occurs_in_cc",
        F.concat(F.lit("location type not under CC root: "),
                 F.coalesce("bad_cls", F.lit("<untyped>"))),
    )


def occurs_in_max1(t: DataFrame) -> DataFrame:
    multi = (
        _edges_of(t, [V.OCCURS_IN])
        .groupBy("model_id", "node")
        .agg(
            F.count("*").alias("n"),
            F.array_sort(F.collect_set("obj")).alias("locs"),
        )
        .filter(F.col("n") > 1)
    )
    return _v(
        multi.withColumn("pred", F.lit(V.OCCURS_IN)).withColumn(
            "obj", F.element_at("locs", 1)
        ),
        "occurs_in_max1",
        F.concat(F.lit("locations: "), F.concat_ws(",", "locs")),
    )


def part_of_bp(t: DataFrame, ancestors: DataFrame) -> DataFrame:
    """part_of must land on a BP-typed node (the pathway / dedicated
    BP-individual shape)."""
    bp = _closure(ancestors, [V.BP_ROOT])
    bp_nodes = (
        _types(t).join(F.broadcast(bp), "cls", "left_semi")
        .select("model_id", F.col("node").alias("obj"))
        .distinct()
    )
    e = _edges_of(t, [V.PART_OF])
    return _v(
        e.join(bp_nodes, ["model_id", "obj"], "left_anti"),
        "part_of_bp",
        F.lit("part_of target carries no biological_process type"),
    )


def causal_occurrents(
    t: DataFrame, ancestors: DataFrame, occ: DataFrame | None = None
) -> DataFrame:
    """Causal-family edges connect occurrents on BOTH ends."""
    occ = _occurrent_nodes(t, ancestors, occ)
    e = _edges_of(t, CAUSAL_PREDS)
    bad_subj = e.join(occ, ["model_id", "node"], "left_anti").withColumn(
        "end", F.lit("subject")
    )
    bad_obj = e.join(
        occ.withColumnRenamed("node", "obj"), ["model_id", "obj"], "left_anti"
    ).withColumn("end", F.lit("object"))
    return _v(
        bad_subj.unionByName(bad_obj).distinct(),
        "causal_occurrents",
        F.concat(F.col("end"), F.lit(" is not an occurrent")),
    )


def sm_regulator_chemical(t: DataFrame, ancestors: DataFrame) -> DataFrame:
    """has_small_molecule_{activator,inhibitor} targets must carry a
    chemical-entity type (the B6 rule's shape)."""
    chem = _closure(ancestors, [V.CHEMICAL_ROOT])
    chem_nodes = (
        _types(t).join(F.broadcast(chem), "cls", "left_semi")
        .select("model_id", F.col("node").alias("obj"))
        .distinct()
    )
    e = _edges_of(t, [V.SM_ACTIVATOR, V.SM_INHIBITOR])
    return _v(
        e.join(chem_nodes, ["model_id", "obj"], "left_anti"),
        "sm_regulator_chemical",
        F.lit("regulator carries no chemical-entity type"),
    )


def shex_validate(t: DataFrame, ancestors: DataFrame) -> DataFrame:
    """All shape checks unioned: (check, model_id, node, pred, obj,
    detail); empty = every model conforms."""
    # the occurrent-node frame feeds five checks; materialize it ONCE
    # (type-row bounded) so the suite costs one closure join, not five
    occ = _occurrent_nodes(t, ancestors).localCheckpoint(eager=True)
    frames = [
        enabled_by_max1(t),
        enabled_by_physical(t, ancestors, occ),
        occurs_in_cc(t, ancestors),
        occurs_in_max1(t),
        part_of_bp(t, ancestors),
        causal_occurrents(t, ancestors, occ),
        io_physical(t, ancestors, occ),
        sm_regulator_chemical(t, ancestors),
        interacts_physical(t, ancestors, occ),
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.select(*_COLS)


def shex_summary(t: DataFrame, ancestors: DataFrame) -> DataFrame:
    """(check, n_violations) for every check — all-zeros on a
    conforming corpus, and every check name provably present."""
    spark = t.sparkSession
    names = spark.createDataFrame([(c,) for c in CHECKS], "check string")
    counts = shex_validate(t, ancestors).groupBy("check").agg(
        F.count("*").alias("n_violations")
    )
    return (
        names.join(counts, "check", "left")
        .select(
            "check",
            F.coalesce("n_violations", F.lit(0)).cast("long").alias("n_violations"),
        )
    )
