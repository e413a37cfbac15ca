"""K3 (full) + G8-deep — per-model mapping/classification reports and
manuscript-grade cross-model analytics.

Reference surface:
  GoCAMReport.java:30-553        content counts, NR mapping report,
                                 asserted/rule/inferred type split,
                                 unclassified / new / deepened counters
  GoMappingReport.java:53-203    report-file family (mapping tables,
                                 chebi usage, deprecated terms,
                                 inconsistent models, reasoner value)
  ReasonerReport.java:13-56      new/deepened classification counts
  Manuscript.java:207-363        runCounts reaction-completeness census
  Manuscript.java:365-436        buildVenn missing-dimension sets
  Manuscript.java:438-547        getCausalComparison per-pathway
                                 causal-format table

Reasoner reduction: the reference reasons each model with Arachne/OWL
and splits a node's types into asserted vs inferred by membership in
the asserted graph (GoCAMReport.wasInferred:556-565). This engine's
consumed inferences are exactly the subclass closures (SURVEY §2.5), so
"inferred types" = strict ancestors (onto_ancestors dim) of the node's
asserted classes that were not themselves asserted and are not roots.
"Rule-assigned" types are recognized by VALUE, exactly like the
reference's own NR report does (GoCAMReport.java:136/179/315 special-
cases the protein_binding / establishment_of_protein_localization
literals): in the default pipeline the only rule-minted class is
GO_0005488 from B3 binding nodes (stage_b.py:264).

Every function is a pure DataFrame program over the (model_id, subj,
pred, obj) triple table plus the broadcastable ancestors dim — at
cluster scale the triple table shuffles at most once per report on
(model_id, node) and every dim join is a broadcast hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import vocab as V

# classes a stage-B rule can assert (recognized by value, see module doc)
RULE_ASSIGNED_CLASSES = [V.BINDING]

# kind roots in NR-report iteration order (pathways, functions,
# complexes — GoCAMReport.makeNRMappingReport:124/167/211); a node typed
# into several closures keeps the first kind, like the report's `ids`
# dedup set
KIND_ROOTS = [("pathway", V.BP_ROOT), ("function", V.MF_ROOT),
              ("complex", V.COMPLEX_GO)]

# the causal relation family of Manuscript.getCausalComparison:479
CAUSAL_FAMILY = [
    V.DIRECTLY_POS_REGULATED_BY, V.DIRECTLY_NEG_REGULATED_BY,
    V.PROVIDES_INPUT, V.CAUSALLY_UPSTREAM,
    V.NEG_REGULATES, V.POS_REGULATES,
    V.DIRECTLY_POS_REGULATES, V.DIRECTLY_NEG_REGULATES,
]

_ROOTS = [V.BP_ROOT, V.MF_ROOT, V.CC_ROOT, V.COMPLEX_GO, V.MOLECULAR_EVENT]


def _types(t: DataFrame) -> DataFrame:
    return t.filter(F.col("pred") == V.TYPE).select(
        "model_id", F.col("subj").alias("node"), F.col("obj").alias("cls")
    )


def _closure(ancestors: DataFrame, root) -> DataFrame:
    """(cls) classes in the subclass closure of `root` (incl. root)."""
    roots = [root] if isinstance(root, str) else list(root)
    return ancestors.filter(F.col("ancestor_iri").isin(roots)).select(
        F.col("class_iri").alias("cls")
    ).distinct()


def node_kinds(t: DataFrame, ancestors: DataFrame) -> DataFrame:
    """(model_id, node, kind) for every node typed into the BP / MF /
    protein-complex closures, kind precedence pathway > function >
    complex (GoCAMReport report iteration order)."""
    memb = None
    for rank, (kind, root) in enumerate(KIND_ROOTS):
        m = _closure(ancestors, root).withColumn("rank", F.lit(rank)).withColumn(
            "kind", F.lit(kind)
        )
        memb = m if memb is None else memb.unionByName(m)
    hit = _types(t).join(F.broadcast(memb), "cls")
    best = hit.groupBy("model_id", "node").agg(
        F.min(F.struct("rank", "kind")).alias("bk")
    )
    return best.select("model_id", "node", F.col("bk.kind").alias("kind"))


def entity_mapping(t: DataFrame, ancestors: DataFrame) -> DataFrame:
    """The per-entity mapping table a curator reads
    (GoCAMReport.makeMappingReportWithOneRowForEachGoCAMEntity:257-391,
    written by GoMappingReport.writeReport:149-175): one row per typed
    BP/MF/complex node with its curator-asserted, rule-assigned and
    closure-inferred classes as comma-joined sorted lists (empty string
    when none).

    Plan: one shuffle keyed (model_id, node); the closure and kind dims
    are broadcast."""
    kinds = node_kinds(t, ancestors)
    ty = _types(t).filter(~F.col("cls").isin(_ROOTS))
    asserted = ty.withColumn(
        "bucket",
        F.when(F.col("cls").isin(RULE_ASSIGNED_CLASSES), F.lit("rule"))
        .otherwise(F.lit("curated")),
    )
    # strict non-root ancestors of every asserted class, minus asserted
    anc = ancestors.filter(
        (F.col("class_iri") != F.col("ancestor_iri"))
        & ~F.col("ancestor_iri").isin(_ROOTS)
    ).select(F.col("class_iri").alias("cls"), F.col("ancestor_iri").alias("sup"))
    inferred = (
        ty.join(F.broadcast(anc), "cls")
        .select("model_id", "node", F.col("sup").alias("cls"))
        .join(ty, ["model_id", "node", "cls"], "left_anti")
        .withColumn("bucket", F.lit("inferred"))
    )
    buckets = asserted.select("model_id", "node", "cls", "bucket").unionByName(
        inferred
    )
    agg = buckets.groupBy("model_id", "node").agg(
        *[
            F.concat_ws(
                ",",
                F.sort_array(
                    F.collect_set(F.when(F.col("bucket") == b, F.col("cls")))
                ),
            ).alias(f"{b}_types")
            for b in ("curated", "rule", "inferred")
        ]
    )
    return kinds.join(agg, ["model_id", "node"], "left").select(
        "model_id", "node", "kind",
        *[F.coalesce(F.col(c), F.lit("")).alias(c)
          for c in ("curated_types", "rule_types", "inferred_types")],
    )


def model_report(t: DataFrame, ancestors: DataFrame) -> DataFrame:
    """Per-model content + classification report: the row a GoCAMReport
    carries (content counts: makeSimpleContentReport:72-75; unclassified
    / rule-classified / deepened per kind: GoCAMReport.java:398-521 and
    ReasonerReport.java:30-42).

    Columns:
      n_pathways n_functions n_complexes    typed-node counts per kind
      n_proteins n_chemicals                distinct entity nodes (the
                                            chemical count excludes the
                                            protein subtree — the
                                            reference queries them
                                            disjointly)
      n_cc_classes                          distinct CC classes used
      n_relations                           distinct edge predicates
      {kind}_unclassified                   no non-root in-closure type
      {kind}_rule_classified                classified only by a rule-
                                            minted class (B3 binding)
      {kind}_deepened                       curated AND closure adds a
                                            strict non-root ancestor
    """
    ty = _types(t)
    em = entity_mapping(t, ancestors)
    plural = {"pathway": "n_pathways", "function": "n_functions",
              "complex": "n_complexes"}
    per_kind = em.groupBy("model_id").agg(
        *[
            F.sum(((F.col("kind") == k)).cast("long")).alias(plural[k])
            for k, _ in KIND_ROOTS
        ],
        *[
            F.sum(
                ((F.col("kind") == k) & (F.col("curated_types") == "")
                 & (F.col("rule_types") == "")).cast("long")
            ).alias(f"{k}_unclassified")
            for k, _ in KIND_ROOTS
        ],
        *[
            F.sum(
                ((F.col("kind") == k) & (F.col("curated_types") == "")
                 & (F.col("rule_types") != "")).cast("long")
            ).alias(f"{k}_rule_classified")
            for k, _ in KIND_ROOTS
        ],
        *[
            F.sum(
                ((F.col("kind") == k) & (F.col("curated_types") != "")
                 & (F.col("inferred_types") != "")).cast("long")
            ).alias(f"{k}_deepened")
            for k, _ in KIND_ROOTS
        ],
    )
    prot = _closure(ancestors, V.PROTEIN_ROOT)
    chem = _closure(ancestors, V.CHEMICAL_ROOT).join(prot, "cls", "left_anti")
    cc = _closure(ancestors, V.CC_ROOT)
    entities = ty.join(F.broadcast(prot), "cls").select(
        "model_id", "node"
    ).distinct().groupBy("model_id").agg(F.count("*").alias("n_proteins")).join(
        ty.join(F.broadcast(chem), "cls").select("model_id", "node")
        .distinct().groupBy("model_id").agg(F.count("*").alias("n_chemicals")),
        "model_id", "full_outer",
    ).join(
        ty.join(F.broadcast(cc), "cls").select("model_id", "cls")
        .distinct().groupBy("model_id").agg(F.count("*").alias("n_cc_classes")),
        "model_id", "full_outer",
    ).join(
        t.filter(F.col("pred").isin(V.EDGE_PREDS)).select("model_id", "pred")
        .distinct().groupBy("model_id").agg(F.count("*").alias("n_relations")),
        "model_id", "full_outer",
    )
    out = per_kind.join(entities, "model_id", "full_outer")
    fill = [c for c in out.columns if c != "model_id"]
    return out.fillna(0, subset=fill).select(
        "model_id",
        *[F.col(c).cast("long").alias(c) for c in fill],
    )


def chebi_usage(t: DataFrame, ancestors: DataFrame) -> DataFrame:
    """Corpus-wide chemical-class usage counts
    (GoMappingReport.chebi_count, written :130-135): one row per
    chemical class with the number of type assertions using it."""
    chem = _closure(ancestors, V.CHEMICAL_ROOT)
    return (
        _types(t).join(F.broadcast(chem), "cls")
        .groupBy("cls").agg(F.count("*").alias("n"))
    )


def deprecated_terms_used(t: DataFrame, deprecated: DataFrame) -> DataFrame:
    """Classes from a deprecated-term dim that the corpus still uses
    (GoMappingReport.deprecated_classes, written :136-141): distinct
    (cls, n_models, n_uses). `deprecated` is any DataFrame with a `cls`
    column (in production: the ontology's owl:deprecated annotations)."""
    return (
        _types(t).join(F.broadcast(deprecated.select("cls").distinct()), "cls")
        .groupBy("cls")
        .agg(
            F.countDistinct("model_id").alias("n_models"),
            F.count("*").alias("n_uses"),
        )
    )


def inconsistent_models(violations: DataFrame) -> DataFrame:
    """Models with at least one validation failure
    (GoMappingReport.inconsistent_models, written :142-147) — fed by
    validate.validate's structural suite, this engine's consistency
    check (SURVEY §2.5 R2 reduction)."""
    return (
        violations.groupBy("model_id")
        .agg(
            F.count("*").alias("n_violations"),
            F.sort_array(F.collect_set("check")).alias("checks"),
        )
    )


def _xreffed_reactions(t: DataFrame, ancestors: DataFrame) -> DataFrame:
    """(model_id, reaction, is_mf, is_me): converted reactions — nodes
    typed molecular_event or into the MF closure, restricted to direct
    conversions. Every Manuscript query guards `?reaction xref: ?xref`
    "to ensure we don't count generated binding nodes - only direct
    conversions" (Manuscript.java:243): in the reference only nodes
    converted from a source reaction carry a Reactome hasDbXref. In this
    engine the converted reaction's node id IS its source id verbatim,
    and every generated node id carries the `~` separator (vocab.py
    node-id scheme: io instances `{e}~{r}`, binding nodes
    `{r}~bind~{n}`, location nodes `{o}~loc~{cc}`), so the equivalent
    guard is `node NOT LIKE '%~%'`."""
    mf = _closure(ancestors, V.MF_ROOT)
    ty = _types(t).withColumnRenamed("node", "reaction").filter(
        ~F.col("reaction").contains("~")
    )
    return ty.join(
        F.broadcast(mf.withColumn("m", F.lit(1))), "cls", "left"
    ).groupBy("model_id", "reaction").agg(
        F.max(F.coalesce(F.col("m"), F.lit(0))).alias("is_mf"),
        F.max((F.col("cls") == V.MOLECULAR_EVENT).cast("int")).alias("is_me"),
    ).filter((F.col("is_mf") == 1) | (F.col("is_me") == 1))


def reaction_venn(t: DataFrame, ancestors: DataFrame) -> DataFrame:
    """Per-reaction completeness flags — the Venn sets of
    Manuscript.buildVenn:365-436 plus the binding/dissociation census of
    runCounts:308-329, as one boolean row per converted reaction:

      has_function   typed with a non-root MF-closure class
      has_enabler    enabled_by edge out
      has_location   occurs_in edge out
      has_causal     causally_upstream_of to/from another xref'd reaction
      has_bp         part_of to a pathway with a non-root BP type
      is_binding     distinct inputs > distinct outputs (runCounts:308)
      is_dissociation distinct inputs < distinct outputs (:319)

    `no_X` report files are filters over this table; runCounts numbers
    are its column sums (see reaction_completeness)."""
    rx = _xreffed_reactions(t, ancestors)
    ty = _types(t).withColumnRenamed("node", "reaction")
    mf_nonroot = _closure(ancestors, V.MF_ROOT).filter(F.col("cls") != V.MF_ROOT)
    has_fn = ty.join(F.broadcast(mf_nonroot), "cls").select(
        "model_id", "reaction"
    ).distinct().withColumn("has_function", F.lit(1))

    def edge(pred: str, name: str) -> DataFrame:
        return t.filter(F.col("pred") == pred).select(
            "model_id", F.col("subj").alias("reaction")
        ).distinct().withColumn(name, F.lit(1))

    # causal requires the OTHER endpoint to be an xref'd reaction too
    # (runCounts:254-263 joins through xref on both ends)
    ups = t.filter(F.col("pred") == V.CAUSALLY_UPSTREAM).select(
        "model_id", F.col("subj").alias("reaction"), F.col("obj").alias("other")
    )
    downs = t.filter(F.col("pred") == V.CAUSALLY_UPSTREAM).select(
        "model_id", F.col("obj").alias("reaction"), F.col("subj").alias("other")
    )
    causal = (
        ups.unionByName(downs)
        .join(rx.select("model_id", F.col("reaction").alias("other")),
              ["model_id", "other"], "left_semi")
        .select("model_id", "reaction").distinct()
        .withColumn("has_causal", F.lit(1))
    )
    # part_of to a pathway carrying a non-root BP-closure type
    bp_nonroot = _closure(ancestors, V.BP_ROOT).filter(F.col("cls") != V.BP_ROOT)
    bp_pw = ty.withColumnRenamed("reaction", "pathway").join(
        F.broadcast(bp_nonroot), "cls"
    ).select("model_id", "pathway").distinct()
    has_bp = (
        t.filter(F.col("pred") == V.PART_OF)
        .select("model_id", F.col("subj").alias("reaction"),
                F.col("obj").alias("pathway"))
        .join(bp_pw, ["model_id", "pathway"], "left_semi")
        .select("model_id", "reaction").distinct()
        .withColumn("has_bp", F.lit(1))
    )
    io = (
        t.filter(F.col("pred").isin(V.HAS_INPUT, V.HAS_OUTPUT))
        .select("model_id", F.col("subj").alias("reaction"), "pred", "obj")
        .groupBy("model_id", "reaction")
        .agg(
            F.countDistinct(
                F.when(F.col("pred") == V.HAS_INPUT, F.col("obj"))
            ).alias("n_in"),
            F.countDistinct(
                F.when(F.col("pred") == V.HAS_OUTPUT, F.col("obj"))
            ).alias("n_out"),
        )
    )
    out = (
        rx.join(has_fn, ["model_id", "reaction"], "left")
        .join(edge(V.ENABLED_BY, "has_enabler"), ["model_id", "reaction"], "left")
        .join(edge(V.OCCURS_IN, "has_location"), ["model_id", "reaction"], "left")
        .join(causal, ["model_id", "reaction"], "left")
        .join(has_bp, ["model_id", "reaction"], "left")
        .join(io, ["model_id", "reaction"], "left")
    )
    flags = ["has_function", "has_enabler", "has_location", "has_causal", "has_bp"]
    return out.select(
        "model_id", "reaction", "is_mf", "is_me",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in flags],
        (F.coalesce("n_in", F.lit(0)) > F.coalesce("n_out", F.lit(0)))
        .cast("int").alias("is_binding"),
        (F.coalesce("n_in", F.lit(0)) < F.coalesce("n_out", F.lit(0)))
        .cast("int").alias("is_dissociation"),
    )


def reaction_completeness(t: DataFrame, ancestors: DataFrame) -> DataFrame:
    """The whole-journal reaction census of Manuscript.runCounts:207-363
    as ONE aggregation over reaction_venn (each reference query was a
    separate SPARQL scan; here the fact table is read once)."""
    v = reaction_venn(t, ancestors)
    return v.agg(
        F.count("*").alias("n_reactions"),
        F.sum("is_mf").cast("long").alias("n_mf_reactions"),
        F.sum(((F.col("is_me") == 1) & (F.col("is_mf") == 0)).cast("long"))
        .alias("n_me_only_reactions"),
        F.sum("has_enabler").cast("long").alias("n_with_enabler"),
        F.sum(1 - F.col("has_enabler")).cast("long").alias("n_no_enabler"),
        F.sum(((F.col("is_mf") == 1) & (F.col("has_enabler") == 0)).cast("long"))
        .alias("n_mf_no_enabler"),
        F.sum("has_bp").cast("long").alias("n_with_bp"),
        F.sum("has_causal").cast("long").alias("n_with_causal"),
        F.sum(1 - F.col("has_causal")).cast("long").alias("n_no_causal"),
        F.sum("has_location").cast("long").alias("n_with_occurs_in"),
        F.sum(1 - F.col("has_location")).cast("long").alias("n_no_occurs_in"),
        F.sum(
            F.col("has_causal") * F.col("has_enabler")
            * F.col("has_location") * F.col("has_bp")
        ).cast("long").alias("n_complete"),
        F.sum("is_binding").cast("long").alias("n_binding"),
        F.sum("is_dissociation").cast("long").alias("n_dissociation"),
    )


def causal_formats(t: DataFrame, ancestors: DataFrame) -> DataFrame:
    """Per-model causal-format table
    (Manuscript.getCausalComparison:438-547): unique upstream->downstream
    reaction pairs over the 8-relation causal family, including the
    binding-node hop (up -provides_input-> b[type GO_0005488]
    -directly_(pos|neg)_regulates-> down, :482-486), counted per
    relation.

    The reference dedupes multi-relation pairs by Java iteration order
    (first relation seen wins, :515); here the tie-break is the MINIMUM
    relation id per pair — deterministic, and the pair count per model
    is identical."""
    rx = _xreffed_reactions(t, ancestors).select("model_id", "reaction")
    direct = t.filter(F.col("pred").isin(CAUSAL_FAMILY)).select(
        "model_id", F.col("subj").alias("up"), "pred", F.col("obj").alias("down")
    )
    binding = _types(t).filter(F.col("cls") == V.BINDING).select(
        "model_id", F.col("node").alias("b")
    )
    hop = (
        t.filter(F.col("pred") == V.PROVIDES_INPUT)
        .select("model_id", F.col("subj").alias("up"), F.col("obj").alias("b"))
        .join(binding, ["model_id", "b"])
        .join(
            t.filter(
                F.col("pred").isin(V.DIRECTLY_POS_REGULATES,
                                   V.DIRECTLY_NEG_REGULATES)
            ).select("model_id", F.col("subj").alias("b"), "pred",
                     F.col("obj").alias("down")),
            ["model_id", "b"],
        )
        .select("model_id", "up", "pred", "down")
    )
    pairs = (
        direct.unionByName(hop)
        .join(rx.withColumnRenamed("reaction", "up"), ["model_id", "up"],
              "left_semi")
        .join(rx.withColumnRenamed("reaction", "down"), ["model_id", "down"],
              "left_semi")
        .groupBy("model_id", "up", "down")
        .agg(F.min("pred").alias("pred"))
    )
    return pairs.groupBy("model_id", "pred").agg(F.count("*").alias("n_pairs"))


def causal_paths(t: DataFrame, max_depth: int = 4) -> DataFrame:
    """Bounded-depth causal reachability: the min-hop closure of the
    8-relation causal family within each model — the "what is upstream
    of what, and how far" table a pathway analyst asks of the finished
    GO-CAM graph (the multi-hop extension of
    Manuscript.getCausalComparison:438-547's single-hop pair census).

    Returns (model_id, src, dst, depth), depth = minimum number of
    causal hops from src to dst, 1 <= depth <= max_depth.

    Scale shape: classic BFS frontier layering over PAIRS — iteration d
    is one shuffle join keyed by (model_id, node) (frontier.dst =
    edges.src) plus a left-anti against the seen set, so a pair is
    discovered exactly once, at its minimum depth, and cycles terminate
    without any cycle check. At most max_depth joins run; the frontier
    AND the accumulated seen set are localCheckpointed each round — the
    frontier to truncate lineage, the seen set so the next round's
    anti-join probes a materialized leaf instead of a growing Union plan
    (a cluster deployment swaps in reliable checkpoint()). The only
    driver traffic is the 1-row empty-frontier probe that exits early.
    Keys carry model_id, so no cross-model hub node ever becomes a
    single shuffle key."""
    edges = (
        t.filter(F.col("pred").isin(CAUSAL_FAMILY))
        .select("model_id", F.col("subj").alias("src"),
                F.col("obj").alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    seen = edges.withColumn("depth", F.lit(1))
    frontier = edges
    for depth in range(2, max_depth + 1):
        step = (
            frontier.alias("f")
            .join(
                edges.alias("e"),
                on=[
                    F.col("f.model_id") == F.col("e.model_id"),
                    F.col("f.dst") == F.col("e.src"),
                ],
            )
            .select(
                F.col("f.model_id").alias("model_id"),
                F.col("f.src").alias("src"),
                F.col("e.dst").alias("dst"),
            )
            .distinct()
            .join(
                seen.select("model_id", "src", "dst"),
                ["model_id", "src", "dst"],
                "left_anti",
            )
            .localCheckpoint(eager=True)
        )
        if not step.head(1):
            break
        seen = seen.unionByName(
            step.withColumn("depth", F.lit(depth))
        ).localCheckpoint(eager=True)
        frontier = step
    return seen


def causal_pagerank(
    t: DataFrame, iters: int = 5, damping: float = 0.85
) -> DataFrame:
    """Per-model PageRank over the causal-edge graph: which reactions
    does the pathway's causal structure concentrate influence on — the
    graph-centrality extension of the single-hop causal census
    (Manuscript.getCausalComparison:438-547), asked of the finished
    GO-CAM graph.

    Simplified (dangling mass dropped) power iteration:
    pr_0 = round6(1/N); pr_{k+1}(v) = round6(round6((1-d)/N) +
    d * round6(sum_{u->v} round6(pr_k(u) / outdeg(u)))) — every float
    step rounded to 6 decimals and the incoming sum computed as a
    SORT-FOLD (F.aggregate over sort_array(collect_list)), so the
    result is bit-identical in any engine regardless of aggregation
    order (same determinism treatment as bigram_lm_score / dsir).

    Scale shape: one iteration = one join keyed by (model_id, src) +
    one groupBy keyed by (model_id, dst) — both carry model_id, so no
    cross-model hub node becomes a single shuffle key; ranks are
    localCheckpointed per iteration to truncate lineage (a cluster
    deployment swaps in reliable checkpoint()). State is bounded by
    the node domain, never the corpus.

    Returns (model_id, node, pr, n_nodes)."""
    edges = (
        t.filter(F.col("pred").isin(CAUSAL_FAMILY))
        .select("model_id", F.col("subj").alias("src"),
                F.col("obj").alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select("model_id", F.col("src").alias("node"))
        .unionByName(edges.select("model_id", F.col("dst").alias("node")))
        .distinct()
    )
    nn = nodes.groupBy("model_id").agg(F.count("*").alias("n"))
    nodes = nodes.join(nn, "model_id").localCheckpoint(eager=True)
    outdeg = edges.groupBy("model_id", "src").agg(
        F.count("*").alias("od")
    )
    ranks = nodes.select(
        "model_id", "node", "n", F.round(F.lit(1.0) / F.col("n"), 6).alias("pr")
    ).localCheckpoint(eager=True)
    # round the numerator itself first: Python's 1.0 - 0.85 is
    # 0.15000000000000002, but the SQL mirror writes the literal 0.15 —
    # round6 lands both on the identical double before the division
    base = F.round(
        F.round(F.lit(1.0 - damping), 6) / F.col("n"), 6
    )
    for _ in range(iters):
        contrib = (
            edges.join(
                ranks.select("model_id", F.col("node").alias("src"), "pr"),
                ["model_id", "src"],
            )
            .join(outdeg, ["model_id", "src"])
            .select(
                "model_id", "dst",
                F.round(F.col("pr") / F.col("od"), 6).alias("c"),
            )
        )
        incoming = contrib.groupBy("model_id", "dst").agg(
            F.round(
                F.aggregate(
                    F.sort_array(F.collect_list("c")),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("s")
        )
        ranks = (
            nodes.join(
                incoming.withColumnRenamed("dst", "node"),
                ["model_id", "node"],
                "left",
            )
            .select(
                "model_id", "node", "n",
                F.round(
                    base
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0)),
                    6,
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(
        "model_id", "node", "pr", F.col("n").alias("n_nodes")
    )


def causal_triangles(t: DataFrame) -> DataFrame:
    """Per-model triangle census + global clustering coefficient over
    the undirected causal graph — the feedback-loop / mutual-regulation
    density analytics a pathway analyst asks of the finished GO-CAM
    corpus (the motif extension of the single-hop causal census,
    Manuscript.getCausalComparison:438-547).

    Edges canonicalize to (a = least, b = greatest) so direction and
    multi-predicate parallel edges collapse, each triangle materializes
    exactly once as a < b < c, and self-loops drop. Triangles are the
    standard distributed two-join enumeration — wedge build then close —
    with every join keyed by (model_id, node), so no cross-model hub
    node ever becomes a single shuffle key; wedge counts come from the
    degree table, not an extra join.

    Returns (model_id, n_edges, n_wedges, n_triangles, clustering) with
    clustering = round(3 * triangles / wedges, 6) (0.0 when wedge-free).
    """
    e = (
        t.filter(F.col("pred").isin(CAUSAL_FAMILY))
        .select(
            "model_id",
            F.least("subj", "obj").alias("a"),
            F.greatest("subj", "obj").alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select("model_id", F.col("a").alias("node"))
        .unionAll(e.select("model_id", F.col("b").alias("node")))
        .groupBy("model_id", "node")
        .agg(F.count("*").alias("d"))
    )
    wedges = deg.groupBy("model_id").agg(
        (F.sum(F.col("d") * (F.col("d") - 1)) / 2).cast("long").alias("n_wedges")
    )
    closing = e.select("model_id", "a", F.col("b").alias("c"))
    tri = (
        e.join(
            e.select("model_id", F.col("a").alias("b"), F.col("b").alias("c")),
            ["model_id", "b"],
        )
        .join(closing, ["model_id", "a", "c"])
        .groupBy("model_id")
        .agg(F.count("*").alias("n_triangles"))
    )
    edges_per = e.groupBy("model_id").agg(F.count("*").alias("n_edges"))
    out = (
        edges_per.join(wedges, "model_id")
        .join(tri, "model_id", "left")
        .withColumn("n_triangles",
                    F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long"))
    )
    return out.select(
        "model_id", "n_edges", "n_wedges", "n_triangles",
        F.round(
            F.when(F.col("n_wedges") > 0,
                   3.0 * F.col("n_triangles") / F.col("n_wedges"))
            .otherwise(F.lit(0.0)), 6,
        ).alias("clustering"),
    )


def kg_components(t: DataFrame) -> DataFrame:
    """Per-model weakly-connected components over the full KG edge set
    (every relation in vocab.EDGE_PREDS) — the graph-health report that
    flags models whose pathway fractured into disconnected islands
    during conversion (the reference's reasoner notices only ontology
    inconsistency, not graph fragmentation).

    Reuses the dedup engine's connected-components core
    (dedup.duplicate_clusters — iterative min-label propagation, one
    (node)-keyed shuffle per round, scalar-only driver traffic); nodes
    are namespaced as model\\x1fnode so components can never leak across
    models while still running as ONE global job over the whole corpus.

    Returns (model_id, n_nodes, n_components, largest_component).
    """
    from pathways2go_spark.dedup import duplicate_clusters
    from pathways2go_spark.vocab import EDGE_PREDS

    sep = "\x1f"
    e = (
        t.filter(F.col("pred").isin(EDGE_PREDS))
        .select(
            F.concat_ws(sep, "model_id", "subj").alias("a"),
            F.concat_ws(sep, "model_id", "obj").alias("b"),
        )
        .distinct()
    )
    comp = duplicate_clusters(e)
    sizes = (
        comp.withColumn("model_id", F.substring_index("doc_id", sep, 1))
        .groupBy("model_id", "cluster_id")
        .agg(F.count("*").alias("sz"))
    )
    return sizes.groupBy("model_id").agg(
        F.sum("sz").cast("long").alias("n_nodes"),
        F.count("*").cast("long").alias("n_components"),
        F.max("sz").cast("long").alias("largest_component"),
    )


def dag_levels(t: DataFrame, max_levels: int = 8) -> DataFrame:
    """Topological layering of each model's causal graph — the
    "execution order" view of a pathway: level 0 = nodes with no
    incoming causal edge (the pathway's entry points), level k = nodes
    whose every upstream regulator is already layered, placed one past
    their deepest predecessor (longest-path layering, Kahn peeling).
    Nodes on or downstream-locked-behind a causal CYCLE (feedback loops
    are real GO-CAM biology) never settle and report level = -1 — the
    analyst's signal that ordering is undefined there.

    Returns (model_id, node, level), covering every causal endpoint.

    Scale shape: each peel round is ONE join keyed by (model_id, dst)
    against the settled set plus a groupBy on the same key — a node
    settles exactly once, rounds are bounded by `max_levels`, and the
    settled set is localCheckpointed per round (reliable checkpoint()
    on a cluster) so round k's anti-join probes a materialized leaf.
    All keys carry model_id: no cross-model hub. The early-exit probe
    is a 1-row head — the only driver traffic."""
    edges = (
        t.filter(F.col("pred").isin(CAUSAL_FAMILY))
        .select("model_id", F.col("subj").alias("src"),
                F.col("obj").alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select("model_id", F.col("src").alias("node"))
        .unionByName(edges.select("model_id", F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    settled = (
        nodes.join(
            edges.select("model_id", F.col("dst").alias("node")).distinct(),
            ["model_id", "node"],
            "left_anti",
        )
        .withColumn("level", F.lit(0))
        .localCheckpoint(eager=True)
    )
    for _ in range(1, max_levels + 1):
        # a node settles when ALL its in-edges originate from settled
        # nodes; its level is 1 + the max of those predecessors
        cand = (
            edges.join(
                settled.select("model_id", "node", "level").withColumnRenamed(
                    "node", "src"
                ).withColumnRenamed("level", "src_level"),
                ["model_id", "src"],
                "left",
            )
            .groupBy("model_id", F.col("dst").alias("node"))
            .agg(
                F.count("*").alias("n_in"),
                F.count("src_level").alias("n_settled"),
                F.max("src_level").alias("max_lvl"),
            )
            .filter(F.col("n_in") == F.col("n_settled"))
            .join(settled.select("model_id", "node"),
                  ["model_id", "node"], "left_anti")
            .select("model_id", "node",
                    (F.col("max_lvl") + 1).alias("level"))
            .localCheckpoint(eager=True)
        )
        if not cand.head(1):
            break
        settled = settled.unionByName(cand).localCheckpoint(eager=True)
    return nodes.join(settled, ["model_id", "node"], "left").select(
        "model_id", "node",
        F.coalesce(F.col("level"), F.lit(-1)).cast("int").alias("level"),
    )


def kcore(
    t: DataFrame,
    k: int = 2,
    max_rounds: int = 8,
    preds: list[str] | None = None,
) -> DataFrame:
    """The k-core of each model's undirected STRUCTURAL graph — the
    maximal subgraph where every node keeps >= k neighbors (Seidman
    1983, public method): iteratively peel nodes of degree < k until a
    fixed point. The 2-core is the pathway's feedback/redundancy
    skeleton — everything outside it is tree-like periphery whose
    causal order the dag-levels view already explains.

    `preds` selects the edge family; default = every predicate except
    'type' (class assertions are node attributes, not structure — a
    popular GO term would otherwise weld unrelated reactions into one
    fake core). Pass CAUSAL_FAMILY for the causal-only skeleton.

    Returns (model_id, node, core_degree) for the surviving nodes,
    core_degree = the node's degree inside the k-core.

    Scale shape: each peel round is one (model_id, node)-keyed degree
    groupBy + one semi-join of edges against surviving endpoints —
    both partial-aggregated, no cross-model key. Rounds are bounded by
    `max_rounds` with a 1-row early-exit probe; the surviving edge set
    shrinks monotonically and is localCheckpointed per round (reliable
    checkpoint() on a cluster)."""
    cond = (
        F.col("pred").isin(preds) if preds is not None
        else (F.col("pred") != "type")
    )
    und = (
        t.filter(cond)
        .select("model_id", F.col("subj").alias("a"),
                F.col("obj").alias("b"))
        .filter(F.col("a") != F.col("b"))
    )
    edges = (
        und.select("model_id", F.least("a", "b").alias("a"),
                   F.greatest("a", "b").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        deg = (
            edges.select("model_id", F.col("a").alias("node"))
            .unionByName(edges.select("model_id", F.col("b").alias("node")))
            .groupBy("model_id", "node")
            .agg(F.count("*").alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("model_id", "node")
        nxt = (
            edges.join(
                keep.withColumnRenamed("node", "a"), ["model_id", "a"],
                "left_semi",
            )
            .join(
                keep.withColumnRenamed("node", "b"), ["model_id", "b"],
                "left_semi",
            )
            .localCheckpoint(eager=True)
        )
        if nxt.count() == edges.count():
            edges = nxt
            break
        edges = nxt
    return (
        edges.select("model_id", F.col("a").alias("node"))
        .unionByName(edges.select("model_id", F.col("b").alias("node")))
        .groupBy("model_id", "node")
        .agg(F.count("*").alias("core_degree"))
        .filter(F.col("core_degree") >= k)
    )


def term_cooccurrence(t: DataFrame, min_support: int = 1) -> DataFrame:
    """Ontology-term co-annotation affinity: for every unordered pair of
    classes typed into the same model, in how many models they co-occur
    — the cross-model "terms that travel together" census behind
    term-similarity and module detection (the pairwise refinement of
    Manuscript.buildVenn's per-dimension sets, Manuscript.java:365-436).

    Returns (term_a, term_b, n_models), term_a < term_b,
    n_models >= min_support.

    Scale shape: one distinct projection to (model_id, term), then a
    self-join keyed by model_id — bounded by the per-model term count
    (tens), the same justification as the triangle census, never a
    corpus-sized key — and one groupBy on the pair. min_support filters
    AFTER the count (it must see all models), but the pair domain is
    term-vocabulary-bounded, not corpus-bounded."""
    terms = (
        t.filter(F.col("pred") == "type")
        .select("model_id", F.col("obj").alias("term"))
        .distinct()
    )
    pairs = (
        terms.alias("x")
        .join(terms.alias("y"), "model_id")
        .filter(F.col("x.term") < F.col("y.term"))
        .select(
            F.col("x.term").alias("term_a"),
            F.col("y.term").alias("term_b"),
            "model_id",
        )
    )
    return (
        pairs.groupBy("term_a", "term_b")
        .agg(F.count_distinct("model_id").alias("n_models"))
        .filter(F.col("n_models") >= min_support)
    )


def term_semsim(
    t: DataFrame, ancestors: DataFrame, min_support: int = 1
) -> DataFrame:
    """Ontology-graph semantic similarity for co-annotated class pairs:
    for every unordered pair of classes typed into the same model
    (term_cooccurrence), the Jaccard similarity of their subclass
    ancestor closures — the standard graph-based GO term-similarity
    measure (Pesquita et al. 2009) over the same closure dim the typing
    ladder consumes (reference consumes these closures via OWL
    reasoning, GoCAM.java subclass queries).

    Returns (term_a, term_b, n_models, n_common, n_union, jaccard);
    closure sets include the class itself (the dim materializes
    reflexive rows), so n_union >= 1 for any ontology term; terms
    absent from the dim get empty sets and jaccard 0.

    Scale shape: the corpus contributes ONLY the distinct
    (model_id, term) projection (one shuffle, map-side combinable);
    everything after — the pair domain, both closure joins, the size
    dim — is bounded by the ontology vocabulary, not the corpus, and
    the closure table broadcasts (GO+RO closures are ~1e6 rows). The
    intersection count is two broadcast hash joins + one pair-keyed
    groupBy, never an ancestor-keyed shuffle, so the ontology roots
    (ancestors of everything) never become hub keys.

    jaccard is fixed-pointed (floor(x*1e6+0.5)/1e6) so the one float
    division is bit-identical across engines."""
    pairs = term_cooccurrence(t, min_support)
    anc = ancestors.select(
        F.col("class_iri").alias("term"), F.col("ancestor_iri").alias("anc")
    )
    sizes = anc.groupBy("term").agg(F.count("*").alias("n_closure"))
    common = (
        pairs.select("term_a", "term_b")
        .join(
            F.broadcast(anc.select(F.col("term").alias("term_a"), "anc")),
            "term_a",
        )
        .join(
            F.broadcast(anc.select(F.col("term").alias("term_b"), "anc")),
            ["term_b", "anc"],
        )
        .groupBy("term_a", "term_b")
        .agg(F.count("*").alias("n_common"))
    )
    n_common = F.coalesce(F.col("n_common"), F.lit(0)).cast("long")
    n_union = (
        F.coalesce(F.col("n_a"), F.lit(0))
        + F.coalesce(F.col("n_b"), F.lit(0))
        - n_common
    ).cast("long")
    jac = F.when(
        n_union > 0,
        F.floor(n_common.cast("double") / n_union * 1e6 + 0.5) / 1e6,
    ).otherwise(F.lit(0.0))
    return (
        pairs.join(common, ["term_a", "term_b"], "left")
        .join(
            F.broadcast(
                sizes.select(
                    F.col("term").alias("term_a"),
                    F.col("n_closure").alias("n_a"),
                )
            ),
            "term_a",
            "left",
        )
        .join(
            F.broadcast(
                sizes.select(
                    F.col("term").alias("term_b"),
                    F.col("n_closure").alias("n_b"),
                )
            ),
            "term_b",
            "left",
        )
        .select(
            "term_a",
            "term_b",
            "n_models",
            n_common.alias("n_common"),
            n_union.alias("n_union"),
            jac.alias("jaccard"),
        )
    )


def motif_census(t: DataFrame) -> DataFrame:
    """2-hop edge-motif census: how often does an edge of pred_a feed an
    edge of pred_b (subj -a-> mid -b-> obj) within a model, across the
    corpus — the structural fingerprint of the rule engine's output
    (e.g. enabled_by feeding causally-upstream = the canonical GO-CAM
    activity chain), and the quickest cross-release regression signal
    for rule changes.

    One self-join keyed on (model_id, mid): fan-out at a mid node is
    in-degree x out-degree WITHIN its model, bounded by model size —
    no corpus-wide hub key. Output (pred_a, pred_b, n_paths, n_models)."""
    e = t.filter(F.col("pred").isin(V.EDGE_PREDS)).select(
        "model_id", "subj", "pred", "obj"
    )
    a = e.select(
        "model_id",
        F.col("pred").alias("pred_a"),
        F.col("obj").alias("mid"),
    )
    b = e.select(
        "model_id",
        F.col("subj").alias("mid"),
        F.col("pred").alias("pred_b"),
    )
    return (
        a.join(b, ["model_id", "mid"])
        .groupBy("pred_a", "pred_b")
        .agg(
            F.count("*").alias("n_paths"),
            F.countDistinct("model_id").alias("n_models"),
        )
    )


def node_clustering(t: DataFrame) -> DataFrame:
    """Per-node LOCAL clustering coefficient over the undirected causal
    graph — which specific molecules sit inside mutual-regulation
    cliques (the node-level drill-down of causal_triangles' global
    coefficient): c(v) = 2 * tri(v) / (d(v) * (d(v) - 1)).

    Same canonical edge set and two-join triangle enumeration as
    causal_triangles, every join keyed by (model_id, node); each closed
    triangle credits its three corners via one posexplode (no second
    enumeration pass). Only nodes with degree >= 2 (wedge-capable)
    surface. Coefficient is fixed-point-rounded from exact integer
    counts. Returns (model_id, node, degree, n_tri, coeff)."""
    e = (
        t.filter(F.col("pred").isin(CAUSAL_FAMILY))
        .select(
            "model_id",
            F.least("subj", "obj").alias("a"),
            F.greatest("subj", "obj").alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select("model_id", F.col("a").alias("node"))
        .unionAll(e.select("model_id", F.col("b").alias("node")))
        .groupBy("model_id", "node")
        .agg(F.count("*").alias("degree"))
    )
    closing = e.select("model_id", "a", F.col("b").alias("c"))
    tri = (
        e.join(
            e.select(
                "model_id", F.col("a").alias("b"), F.col("b").alias("c")
            ),
            ["model_id", "b"],
        )
        .join(closing, ["model_id", "a", "c"])
        .select(
            "model_id",
            F.explode(F.array("a", "b", "c")).alias("node"),
        )
        .groupBy("model_id", "node")
        .agg(F.count("*").alias("n_tri"))
    )
    coeff = F.floor(
        2 * F.col("n_tri")
        / (F.col("degree") * (F.col("degree") - 1))
        * 1e6
        + F.lit(0.5)
    ) / F.lit(1e6)
    return (
        deg.filter(F.col("degree") >= 2)
        .join(tri, ["model_id", "node"], "left")
        .withColumn(
            "n_tri", F.coalesce(F.col("n_tri"), F.lit(0)).cast("long")
        )
        .select(
            "model_id",
            "node",
            "degree",
            "n_tri",
            F.when(F.col("n_tri") > 0, coeff)
            .otherwise(F.lit(0.0))
            .alias("coeff"),
        )
    )


def neighbor_jaccard(
    t: DataFrame,
    hub_cap: int = 64,
    min_common: int = 1,
) -> DataFrame:
    """Structural node-pair similarity: Jaccard of causal neighborhoods
    per model — the classic link-prediction / redundant-regulator
    primitive (two molecules regulated by and regulating the same
    partners are functional analogues even when no edge joins them
    directly).

    Semantics: over the same canonical undirected causal edge set as
    node_clustering / causal_triangles, a node's neighborhood is its
    adjacent nodes whose OWN degree is <= hub_cap ("hub-filtered
    Jaccard"). Dropping hub pivots from BOTH the common count and the
    per-node degrees keeps the measure self-consistent while bounding
    the pair fan-out: a shared neighbor of degree d generates d*(d-1)/2
    candidate pairs, so one corpus-wide hub (a ubiquitous small
    molecule like ATP) would otherwise dominate the join quadratically.
    At 100 TB the (model_id, pivot) equi-join fans out at most
    hub_cap^2 rows per pivot — skew is capped by construction, not by
    salting after the fact.

    jaccard(x, y) = |N(x) & N(y)| / |N(x) | N(y)|
                  = common / (deg(x) + deg(y) - common),
    fixed-point rounded (1e-6) from exact integer counts so the value
    hashes identically across engines.

    Returns (model_id, node_a, node_b, n_common, jaccard) for pairs
    with n_common >= min_common, node_a < node_b.
    """
    e = (
        t.filter(F.col("pred").isin(CAUSAL_FAMILY))
        .select(
            "model_id",
            F.least("subj", "obj").alias("a"),
            F.greatest("subj", "obj").alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    adj = e.select(
        "model_id", F.col("a").alias("node"), F.col("b").alias("nbr")
    ).unionAll(
        e.select(
            "model_id", F.col("b").alias("node"), F.col("a").alias("nbr")
        )
    ).localCheckpoint(eager=True)
    deg = adj.groupBy("model_id", "node").agg(F.count("*").alias("deg"))
    # hub filter on the PIVOT side: drop neighbors whose own degree
    # exceeds hub_cap, then recompute the filtered degrees both the
    # numerator and denominator use
    adj_f = adj.join(
        deg.filter(F.col("deg") <= hub_cap).select(
            "model_id", F.col("node").alias("nbr")
        ),
        ["model_id", "nbr"],
    )
    deg_f = adj_f.groupBy("model_id", "node").agg(
        F.count("*").alias("deg_f")
    )
    pairs = (
        adj_f.select(
            "model_id", F.col("node").alias("node_a"), "nbr"
        )
        .join(
            adj_f.select(
                "model_id", F.col("node").alias("node_b"), "nbr"
            ),
            ["model_id", "nbr"],
        )
        .filter(F.col("node_a") < F.col("node_b"))
        .groupBy("model_id", "node_a", "node_b")
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    jac = F.floor(
        F.col("n_common")
        / (F.col("da") + F.col("db") - F.col("n_common"))
        * 1e6
        + F.lit(0.5)
    ) / F.lit(1e6)
    return (
        pairs.join(
            deg_f.select(
                "model_id",
                F.col("node").alias("node_a"),
                F.col("deg_f").alias("da"),
            ),
            ["model_id", "node_a"],
        )
        .join(
            deg_f.select(
                "model_id",
                F.col("node").alias("node_b"),
                F.col("deg_f").alias("db"),
            ),
            ["model_id", "node_b"],
        )
        .select(
            "model_id",
            "node_a",
            "node_b",
            "n_common",
            jac.alias("jaccard"),
        )
    )


def resource_allocation(
    t: DataFrame,
    hub_cap: int = 64,
    min_common: int = 1,
) -> DataFrame:
    """Resource-allocation link-prediction index (Zhou/Lu/Zhang 2009)
    over the undirected causal graph, per model: for a node pair, the
    sum of 1/deg(w) over shared neighbors w — neighbor_jaccard's
    discriminating cousin (a shared RARE partner is strong evidence of
    functional analogy; a shared near-hub says little, and RA weights
    them accordingly).

    Same hub-capped pivot join as neighbor_jaccard (pivots above
    hub_cap are dropped, bounding the pair fan-out by construction).
    The index is computed in integer MICRO-UNITS — each pivot
    contributes floor(1e6 / deg(w)), with deg(w) the pivot's FULL
    unfiltered degree (the hub cap only bounds which pivots join, not
    the weight they carry), and the pair score is the exact integer
    sum — so the result hashes identically across engines with no
    float-summation order concerns.

    Returns (model_id, node_a, node_b, n_common, ra_micro) for pairs
    with n_common >= min_common, node_a < node_b.
    """
    e = (
        t.filter(F.col("pred").isin(CAUSAL_FAMILY))
        .select(
            "model_id",
            F.least("subj", "obj").alias("a"),
            F.greatest("subj", "obj").alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    adj = e.select(
        "model_id", F.col("a").alias("node"), F.col("b").alias("nbr")
    ).unionAll(
        e.select(
            "model_id", F.col("b").alias("node"), F.col("a").alias("nbr")
        )
    ).localCheckpoint(eager=True)
    deg = adj.groupBy("model_id", "node").agg(F.count("*").alias("deg"))
    # pivot filter keeps the pivot's own (unfiltered) degree: RA weights
    # by how many neighbors the shared partner spreads its "resource"
    # across — that is its full adjacency, capped pivots only bound the
    # join fan-out
    adj_f = adj.join(
        deg.filter(F.col("deg") <= hub_cap).select(
            "model_id",
            F.col("node").alias("nbr"),
            F.col("deg").alias("w_deg"),
        ),
        ["model_id", "nbr"],
    )
    return (
        adj_f.select(
            "model_id", F.col("node").alias("node_a"), "nbr", "w_deg"
        )
        .join(
            adj_f.select(
                "model_id", F.col("node").alias("node_b"), "nbr"
            ),
            ["model_id", "nbr"],
        )
        .filter(F.col("node_a") < F.col("node_b"))
        .groupBy("model_id", "node_a", "node_b")
        .agg(
            F.count("*").alias("n_common"),
            F.sum(F.floor(F.lit(1_000_000) / F.col("w_deg")))
            .cast("long")
            .alias("ra_micro"),
        )
        .filter(F.col("n_common") >= min_common)
    )
