"""REACTO entity-class ontology builder (SURVEY.md §2.6, E1-E12).

Re-expresses the reference's second pipeline —
`PhysicalEntityOntologyBuilder.buildReacto`
(PhysicalEntityOntologyBuilder.java:259-391) and `definePhysicalEntity`
(:395-827) — as one declarative DataFrame job over the normalized
`elements` / `element_links` frames. Instead of a mutable OWLAPI
ontology it emits a flat, deterministic axiom table

    entity_class_axioms(class_id, axiom, value, qual)

which downstream stages broadcast (the reference couples the two
pipelines implicitly through the `reacto.owl#REACTO_{id}` IRI naming
convention, GoCAM.java:118).

Operator map (reference file:line → here):
  E1  entity→class memoization (:395-405, :823-826)    dropDuplicates on
      the resolved class key — dedup across all docs replaces the
      per-reference `id_class_map`.
  E2  located_in restriction from GO CC xref (:449-479) broadcast join on
      the `LOC:` xref dim.
  E3  set → unionOf members + root-type election ladder
      (checkForAndAddSet :864-974; isRootClass :977-989) explode members,
      rank-min aggregate over the broadcast ancestor closure.
  E4  complex stoichiometry → exact-cardinality has_component (:513-534)
      component links carry the coefficient in `qual`.
  E5  protein → UniProt subclass + canonical_record (:562-574).
  E6  modification features → MOD class + has_start/has_end (:576-633).
  E7  fragment features → has_start/has_end (:634-647).
  E8  DNA/RNA typing with ENSEMBL/UniProt fallback (:718-786).
  E9  small molecule → ChEBI canonical_record; role → has_role gated on
      the CHEBI role closure (:788-840).
  E10 root election for bare/underspecified entities (getChebiRoot
      :842-862) — same rank-min helper as E3, INFO_BIOMACRO fallback.
  E11 drug (IUPHAR) annotation propagation through complexes/sets
      (:416-420, :517-521, :879-883) — bounded upward iterative join.
  E12 taxon restriction from BioSource NCBI xref (:486-500).

Everything is native Column expressions (JVM-side, whole-stage codegen);
joins are either co-partitioned on (doc_id, elem_id) or broadcast
against bounded dims — no Python in the hot path.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import vocab as V
from .dims import Dims

ENTITY_KINDS = ["protein", "small_molecule", "complex", "entity_set", "dna", "rna"]

AXIOM_COLUMNS = ["class_id", "axiom", "value", "qual"]

_KIND_ROOT = {
    "protein": V.PROTEIN_ROOT,
    "small_molecule": V.CHEMICAL_ROOT,
    "complex": V.COMPLEX_GO,
    "dna": V.DNA_ROOT,
    "rna": V.RNA_ROOT,
}


def _attr(name: str) -> Column:
    return F.element_at(F.col("attrs"), name)


def _ax(df: DataFrame, cls: Column, axiom: str, value: Column,
        qual: Column | None = None) -> DataFrame:
    q = qual if qual is not None else F.lit("")
    return df.select(
        cls.alias("class_id"),
        F.lit(axiom).alias("axiom"),
        value.alias("value"),
        q.alias("qual"),
    )


def entity_classes(elements: DataFrame, dims: Dims) -> DataFrame:
    """Per entity occurrence: (doc_id, elem_id, kind, cls, ...attrs).

    Class resolution mirrors `definePhysicalEntity`'s per-kind ladders
    (PhysicalEntityOntologyBuilder.java:562-862): UniProt / GPI accession
    for proteins, ChEBI for small molecules, ENSEMBL/UniProt fallback for
    DNA/RNA (:718-786), REACTO-minted classes for complexes and sets.
    """
    ent = elements.filter(F.col("kind").isin(ENTITY_KINDS)).select(
        "doc_id",
        "elem_id",
        "kind",
        _attr("chebi").alias("chebi"),
        _attr("uniprot").alias("uniprot"),
        _attr("accession").alias("accession"),
        _attr("ensembl").alias("ensembl"),
        _attr("location").alias("location"),
        _attr("features").alias("features"),
        _attr("chebiRole").alias("chebi_role"),
        _attr("taxon").alias("taxon"),
        _attr("drugXref").alias("drug_xref"),
    )
    gpi = (
        dims.accession_map.filter(F.col("source") == "gpi")
        .select(F.col("acc").alias("g_acc"), F.col("target_iri").alias("gpi_cls"))
    )
    locx = dims.onto_xrefs.filter(F.col("xref").startswith("LOC:")).select(
        F.col("xref").alias("l_xref"), F.col("class_iri").alias("loc_gocc")
    )
    ent = (
        ent.join(F.broadcast(gpi), ent.accession == gpi.g_acc, "left")
        .join(F.broadcast(locx),
              F.concat(F.lit("LOC:"), F.col("location")) == F.col("l_xref"), "left")
        .drop("g_acc", "l_xref")
    )
    k = F.col("kind")
    acc_cls = F.coalesce(
        F.concat(F.lit("ENSEMBL_"), F.col("ensembl")),
        F.concat(F.lit("UniProtKB_"), F.col("uniprot")),
    )
    cls = (
        F.when(k == "protein",
               F.coalesce(F.concat(F.lit("UniProtKB_"), F.col("uniprot")),
                          F.col("gpi_cls"), F.lit(V.PROTEIN_ROOT)))
        .when(k == "small_molecule", F.coalesce("chebi", F.lit(V.CHEMICAL_ROOT)))
        .when(k == "dna", F.coalesce(acc_cls, F.lit(V.DNA_ROOT)))
        .when(k == "rna", F.coalesce(acc_cls, F.lit(V.RNA_ROOT)))
        .otherwise(F.concat(F.lit("REACTO_"), F.col("elem_id")))
    )
    canonical = (
        F.when(k == "protein", F.col("uniprot"))
        .when(k == "small_molecule", F.col("chebi"))
        .when(k.isin("dna", "rna"), F.coalesce("ensembl", "uniprot"))
        .otherwise(F.lit(None).cast("string"))
    )
    return ent.withColumn("cls", cls).withColumn("canonical", canonical)


def _elect_root(member_cls: DataFrame, dims: Dims) -> DataFrame:
    """(doc_id, owner_id, member cls `mcls`) → (doc_id, owner_id, elected).

    The E3/E10 priority ladder (isRootClass :977-989): highest-priority
    root among the members' ancestors; rank-min aggregate over the
    broadcast closure, INFO_BIOMACRO fallback applied by callers.
    """
    prio = F.array(*[F.lit(x) for x in V.SET_ROOT_PRIORITY])
    return (
        member_cls.join(F.broadcast(dims.onto_ancestors),
                        member_cls.mcls == dims.onto_ancestors.class_iri)
        .withColumn("rank", F.array_position(prio, F.col("ancestor_iri")))
        .filter(F.col("rank") > 0)
        .groupBy("doc_id", "owner_id")
        .agg(F.min("rank").alias("rank"))
        .select("doc_id", "owner_id",
                F.element_at(prio, F.col("rank").cast("int")).alias("elected"))
    )


def build_reacto(elements: DataFrame, links: DataFrame, dims: Dims) -> DataFrame:
    """The full E1-E12 job → distinct entity_class_axioms rows."""
    ent = entity_classes(elements, dims)
    k = F.col("kind")
    frames: list[DataFrame] = []

    # E1 + E5/E8/E9 subclass_of kind-root (skip bare entities whose class
    # IS the root — the reference never asserts C subClassOf C)
    root = F.create_map(
        *[x for kv in _KIND_ROOT.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
    )[k]
    typed = ent.filter(k != "entity_set").filter(F.col("cls") != root)
    frames.append(_ax(typed, F.col("cls"), "subclass_of", root))

    # E5/E8/E9 canonical_record
    frames.append(
        _ax(ent.filter(F.col("canonical").isNotNull()),
            F.col("cls"), "canonical_record", F.col("canonical"))
    )

    # E2 located_in restriction
    frames.append(
        _ax(ent.filter(F.col("loc_gocc").isNotNull()),
            F.col("cls"), "located_in", F.col("loc_gocc"))
    )

    # E4 complex has_component with stoichiometric coefficient in qual
    cls_by_id = ent.select("doc_id", F.col("elem_id").alias("dst_id"),
                           F.col("cls").alias("dst_cls"))
    comp = (
        links.filter(F.col("link") == "component")
        .join(ent.filter(k == "complex")
                 .select("doc_id", F.col("elem_id").alias("src_id"),
                         F.col("cls").alias("src_cls")),
              ["doc_id", "src_id"])
        .join(cls_by_id, ["doc_id", "dst_id"])
    )
    frames.append(
        _ax(comp, F.col("src_cls"), "has_component", F.col("dst_cls"),
            F.coalesce(F.col("qual"), F.lit("1")))
    )

    # E3 set union members + elected root (E10 fallback: INFO_BIOMACRO)
    sets = ent.filter(k == "entity_set").select(
        "doc_id", F.col("elem_id").alias("owner_id"), F.col("cls").alias("set_cls")
    )
    mem = (
        links.filter(F.col("link") == "member")
        .select("doc_id", F.col("src_id").alias("owner_id"), "dst_id")
        .join(sets, ["doc_id", "owner_id"])
        .join(cls_by_id, ["doc_id", "dst_id"])
    )
    frames.append(_ax(mem, F.col("set_cls"), "union_member", F.col("dst_cls")))
    elected = _elect_root(
        mem.select("doc_id", "owner_id", F.col("dst_cls").alias("mcls")), dims
    )
    set_root = (
        sets.join(elected, ["doc_id", "owner_id"], "left")
        .withColumn("elected", F.coalesce("elected", F.lit(V.INFO_BIOMACRO)))
    )
    frames.append(_ax(set_root, F.col("set_cls"), "subclass_of", F.col("elected")))

    # E6/E7 features: "mod:MOD_00046:114:118,frag:1:220"
    feat = (
        ent.filter(F.col("features").isNotNull())
        .select("doc_id", "cls", F.explode(F.split("features", ",")).alias("f"))
        .withColumn("p", F.split("f", ":"))
    )
    mods = feat.filter(F.col("p")[0] == "mod")
    frames.append(
        _ax(mods, F.col("cls"), "has_feature", F.col("p")[1],
            F.concat_ws("-", F.col("p")[2], F.col("p")[3]))
    )
    frags = feat.filter(F.col("p")[0] == "frag")
    frames.append(
        _ax(frags, F.col("cls"), "has_fragment", F.lit("frag"),
            F.concat_ws("-", F.col("p")[1], F.col("p")[2]))
    )

    # E9 has_role, gated on the CHEBI role closure (GOLego role set)
    roles = dims.onto_ancestors.filter(
        F.col("ancestor_iri") == V.ROLE_ROOT
    ).select(F.col("class_iri").alias("role_cls"))
    role_rows = ent.filter(F.col("chebi_role").isNotNull()).join(
        F.broadcast(roles), ent.chebi_role == F.col("role_cls"), "left_semi"
    )
    frames.append(_ax(role_rows, F.col("cls"), "has_role", F.col("chebi_role")))

    # E12 only_in_taxon
    frames.append(
        _ax(ent.filter(F.col("taxon").isNotNull()),
            F.col("cls"), "only_in_taxon", F.col("taxon"))
    )

    # E11 IUPHAR drug annotation, propagated up through containers.
    # Direct: drugXref attr or drug_ids dim; inherited rows are marked
    # so the provenance distinction survives (reference re-annotates the
    # container class, :879-883).
    dim_drugs = dims.drug_ids.select(
        F.col("entity_id").alias("elem_id"), F.col("iuphar_id").alias("dim_iu")
    )
    direct = (
        ent.join(F.broadcast(dim_drugs), ["elem_id"], "left")
        .filter(F.col("drug_xref").isNotNull() | F.col("dim_iu").isNotNull())
        .select(
            "doc_id", "elem_id", "cls",
            F.regexp_replace(F.coalesce("drug_xref", "dim_iu"),
                             "^IUPHAR:", "").alias("iu"),
        )
    )
    frames.append(_ax(direct, F.col("cls"), "iuphar", F.col("iu")))
    containers = links.filter(F.col("link").isin("component", "member")).select(
        "doc_id", F.col("src_id").alias("parent"), F.col("dst_id").alias("child")
    )
    seen = direct.select("doc_id", "elem_id")
    frontier = seen
    # unbounded: loop until the frontier empties (each hop is a bounded
    # broadcast-side join; the oracle's WITH RECURSIVE is also unbounded,
    # so arbitrarily nested complex/set containers stay in agreement)
    while True:
        up = (
            containers.join(frontier.withColumnRenamed("elem_id", "child"),
                            ["doc_id", "child"])
            .select("doc_id", F.col("parent").alias("elem_id"))
            .join(seen, ["doc_id", "elem_id"], "left_anti")
            .distinct()
            .localCheckpoint(eager=True)
        )
        if up.isEmpty():
            break
        inherited = up.join(
            ent.select("doc_id", "elem_id", "cls"), ["doc_id", "elem_id"]
        )
        frames.append(_ax(inherited, F.col("cls"), "iuphar", F.lit("inherited")))
        seen = seen.unionByName(up)
        frontier = up

    out = reduce(lambda a, b: a.unionByName(b), frames)
    return out.dropDuplicates(AXIOM_COLUMNS)
