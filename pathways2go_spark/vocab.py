"""Predicate / class vocabulary for the GO-CAM triple model.

Mirrors the reference's hard-coded RO/BFO/GO/CHEBI/ECO vocabulary
(GoCAM.java:127-148 field declarations, :289-387 IRI bindings,
:121-122 do-not-join constants). We use bare CURIE local names as
strings — the triple table is schema-fixed over a dynamic store,
exactly like the reference.

Node-id scheme (deterministic; replaces the reference's IRI minting +
UUID fallbacks at BioPaxtoGO.java:1437,1496 — content-keyed so that
retries/resume produce byte-identical output):

  pathway individual          {pathway_id}
  reaction individual         {reaction_id}
  reaction io entity instance
     shared small molecule    {entity_id}~{location}      (A18 keyed reuse)
     everything else          {entity_id}~{reaction_id}
  controller instance         {entity_id}~{reaction_id}~ctl
  active-unit instance        {entity_id}~{reaction_id}~au
  complex-part child          {child_id}~{parent_node}~part
  located_in location node    {owner_node}~loc~{go_cc}
  occurs_in location node     {reaction_id}~oc~{go_cc}
  B3 binding node             {upstream_reaction}~bind~{regulator_node}
"""

# -- pseudo-predicates (rdf:type / skos:exactMatch / rdfs:label) --------
TYPE = "type"
EXACT = "exactMatch"
LABEL = "label"

# -- object properties (GoCAM.java:335-387) -----------------------------
PART_OF = "BFO_0000050"
HAS_PART = "BFO_0000051"
OCCURS_IN = "BFO_0000066"
HAS_INPUT = "RO_0002233"
HAS_OUTPUT = "RO_0002234"
ENABLED_BY = "RO_0002333"
CAUSALLY_UPSTREAM = "RO_0002411"
PROVIDES_INPUT = "RO_0002413"
DIRECTLY_POS_REGULATES = "RO_0002629"
DIRECTLY_NEG_REGULATES = "RO_0002630"
INV_REG = "RO_0002428"          # involved_in_regulation_of
INV_POS_REG = "RO_0002429"      # involved_in_positive_regulation_of
INV_NEG_REG = "RO_0002430"      # involved_in_negative_regulation_of
LOCATED_IN = "RO_0001025"
INTERACTS_WITH = "RO_0002434"
FUNCTIONALLY_RELATED = "RO_0002328"
SM_ACTIVATOR = "RO_0012001"     # has_small_molecule_activator
SM_INHIBITOR = "RO_0012002"     # has_small_molecule_inhibitor
# B12 transport inference (disabled in the reference per issue #345,
# GoCAM.java:978-979; kept for the optional rule)
HAS_TARGET_START_LOC = "RO_0002338"
HAS_TARGET_END_LOC = "RO_0002339"
HAS_PRIMARY_INPUT = "RO_0004009"
HAS_SUBSTITUTABLE = "RO_0019003"   # A14 set members (disabled in ref)
# B13/B14 optional rules (GoCAM.java:1027-1063, :1310-1341)
DIRECTLY_POS_REGULATED_BY = "RO_0002024"
DIRECTLY_NEG_REGULATED_BY = "RO_0002023"
NEG_REGULATES = "RO_0002212"
POS_REGULATES = "RO_0002213"
CONTRIBUTES_TO = "RO_0002326"

# every pred that counts as an object-property edge for the
# unconnected-node cleanup (B9; GoCAM.java:1974-2007)
EDGE_PREDS = [
    PART_OF, HAS_PART, OCCURS_IN, HAS_INPUT, HAS_OUTPUT, ENABLED_BY,
    CAUSALLY_UPSTREAM, PROVIDES_INPUT, DIRECTLY_POS_REGULATES,
    DIRECTLY_NEG_REGULATES, INV_REG, INV_POS_REG, INV_NEG_REG,
    LOCATED_IN, INTERACTS_WITH, FUNCTIONALLY_RELATED,
    SM_ACTIVATOR, SM_INHIBITOR,
    HAS_TARGET_START_LOC, HAS_TARGET_END_LOC, HAS_PRIMARY_INPUT,
    DIRECTLY_POS_REGULATED_BY, DIRECTLY_NEG_REGULATED_BY,
    NEG_REGULATES, POS_REGULATES, CONTRIBUTES_TO, HAS_SUBSTITUTABLE,
]

# -- classes (GoCAM.java:289-333) ---------------------------------------
MF_ROOT = "GO_0003674"
BP_ROOT = "GO_0008150"
CC_ROOT = "GO_0005575"
COMPLEX_GO = "GO_0032991"       # protein-containing complex
BINDING = "GO_0005488"
CATALYTIC_ACTIVITY = "GO_0003824"   # GOtoBioPAX catalysis check (:188-192)
TRANSPORTER = "GO_0005215"          # transporter activity
PROTEIN_TRANSPORTER = "GO_0140318"  # protein transporter activity
PROTEIN_ROOT = "CHEBI_36080"
CHEMICAL_ROOT = "CHEBI_24431"
NUCLEIC_ACID = "CHEBI_33696"
INFO_BIOMACRO = "CHEBI_33695"
DNA_ROOT = "CHEBI_16991"
RNA_ROOT = "CHEBI_33697"
ROLE_ROOT = "CHEBI_50906"
MOLECULAR_EVENT = "REACTO_molecular_event"   # GoCAM.java:289

# promiscuous molecules never joined across reactions
# (small_mol_do_not_join_ids, GoCAM.java:121-122)
WATER = "CHEBI_15377"
HYDRON = "CHEBI_15378"
DO_NOT_JOIN = [WATER, HYDRON]

# -- evidence (GoCAM.java:318-323) --------------------------------------
ECO_IMPORTED = "ECO_0000313"    # stage A: imported, automatic assertion
ECO_INFERRED = "ECO_0000363"    # stage B: inferred, automatic assertion

# set-root election priority ladder
# (PhysicalEntityOntologyBuilder.isRootClass :977-989 / checkForAndAddSet)
SET_ROOT_PRIORITY = [
    DNA_ROOT, RNA_ROOT, PROTEIN_ROOT, INFO_BIOMACRO,
    COMPLEX_GO, CHEMICAL_ROOT,
]

TRIPLE_COLUMNS = ["model_id", "subj", "pred", "obj", "evidence", "rule"]
