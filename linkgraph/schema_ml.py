"""SPG schema mark language: the ``.schema`` file format.

Every reference example project ships a ``<project>.schema`` file — the
indentation-based SPG-SchemaML dialect parsed by
/root/reference/python/knext/knext/schema/marklang/schema_ml.py (1415
LoC; there it diffs against and ALTERs the server's project schema over
REST). Here the same format parses into a plain :class:`SchemaModel`
that the engine uses directly:

* ``property_rules(model)`` extracts the EMBEDDED KGDSL ``rule: [[...]]``
  blocks (namespace-qualified), the logic half of a schema — and
  ``apply_rules(model, graph)`` runs them all as one topologically
  ordered kgdsl script (supplychain's cashflowDiff rules consume the
  fundTrans rules' outputs; _toposort orders them).
* ``validate_graph(model, graph)`` checks a PropertyGraph against the
  declared types: missing vertex tables, missing scalar property
  columns, missing relation edge tables.

Grammar covered (all five shipped example files parse —
tests/test_schema_ml.py): ``namespace``; ``Name(中文): EntityType |
ConceptType | EventType | StandardType``; type metas ``desc`` /
``hypernymPredicate``; ``properties:`` / ``relations:`` groups;
predicate lines ``name(中文): Type`` with semantic prefixes
(``IND#belongTo``, ``CAU#leadTo`` … — validated against the semantic
relation inventory, schema_ml.py:74-96); predicate metas ``desc`` /
``constraint`` / ``rule: [[...]]`` / nested sub-``properties:``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from linkgraph import kgdsl
from linkgraph.concept_rules import _qualify

# semantic relation inventory (schema_ml.py:74-96 — the legal
# ``PREFIX#predicate`` combinations)
SEMANTIC_RELATIONS = {
    "SYNANT": {
        "synonym", "antonym", "symbolOf", "distinctFrom", "definedAs",
        "locatedNear", "similarTo", "etymologicallyRelatedTo",
    },
    "CAU": {"leadTo", "causes", "obstructedBy", "createdBy", "causesDesire"},
    "SEQ": {
        "happenedBefore", "hasSubevent", "hasFirstSubevent",
        "hasLastSubevent", "hasPrerequisite",
    },
    "IND": {"belongTo"},
    "INC": {"isPartOf", "hasA", "madeOf", "derivedFrom", "hasContext"},
    "USE": {"usedFor", "capableOf", "receivesAction", "motivatedByGoal"},
}

TYPE_KINDS = {"EntityType", "ConceptType", "EventType", "StandardType"}

# scalar object types that lower to COLUMNS; anything else declared in
# the schema is an object type and lowers to an edge table
SCALAR_TYPES = {"Text", "Integer", "Float", "Long", "Double"}

_NAMESPACE = re.compile(r"^namespace\s+([A-Za-z0-9]+)$")
_TYPE_DECL = re.compile(r"^([A-Za-z0-9._]+)\(([^)]*)\):\s*(\w+)$")
_PRED_DECL = re.compile(
    r"^(?:([A-Z]+)#)?([A-Za-z0-9._]+)\(([^)]*)\):\s*([A-Za-z0-9.,_\s]+?)\s*$"
)


@dataclass
class SchemaPredicate:
    """A property or relation declaration."""

    name: str
    display: str
    object_type: str
    semantic: str | None = None  # IND / CAU / ... prefix
    desc: str | None = None
    constraints: list[str] = field(default_factory=list)
    rule: str | None = None  # embedded KGDSL Define (namespace-qualified)
    sub_properties: dict[str, "SchemaPredicate"] = field(default_factory=dict)

    @property
    def is_scalar(self) -> bool:
        t = self.object_type
        return t in SCALAR_TYPES or t.startswith("STD.")


@dataclass
class SchemaType:
    name: str  # namespace-qualified
    display: str
    kind: str  # EntityType / ConceptType / EventType / StandardType
    desc: str | None = None
    hypernym: str | None = None  # ConceptType hypernymPredicate
    # StandardType metas (reference schema_ml.py:421-438: both are
    # asserted standard-type-only; spreadable must be True/False)
    spreadable: bool | None = None
    regular: str | None = None  # value-constraint regex
    # ConceptType meta (reference schema_ml.py:440-445)
    auto_relate: str | None = None
    properties: dict[str, SchemaPredicate] = field(default_factory=dict)
    relations: dict[str, SchemaPredicate] = field(default_factory=dict)


@dataclass
class SchemaModel:
    namespace: str
    types: dict[str, SchemaType] = field(default_factory=dict)


def parse_schema(text: str) -> SchemaModel:
    """Parse a ``.schema`` file. Indentation levels follow the reference
    parser: each deeper construct indents past its parent, and a
    dedent must return to a previously used column."""
    namespace: str | None = None
    types: dict[str, SchemaType] = {}
    cur_type: SchemaType | None = None
    cur_group: str | None = None  # "properties" | "relations"
    cur_pred: SchemaPredicate | None = None
    in_sub = False  # inside a predicate's nested sub-properties:
    # indent column per level: 0 type, 1 type-meta/group, 2 predicate,
    # 3 predicate-meta/sub-group, 4 sub-predicate
    level_pos: list[int | None] = [0, None, None, None, None]
    level = 0
    in_rule = False
    rule_body: list[str] = []
    rule_target: SchemaPredicate | None = None

    def close_rule() -> None:
        nonlocal in_rule, rule_body, rule_target
        assert rule_target is not None and namespace is not None
        rule_target.rule = _qualify("\n".join(rule_body), namespace)
        in_rule = False
        rule_body = []
        rule_target = None

    for lineno, raw in enumerate(text.splitlines(), 1):
        stripped = raw.strip()
        if in_rule:
            if stripped.endswith("]]"):
                tail = raw.rstrip()[: len(raw.rstrip()) - 2]
                if tail.strip():
                    rule_body.append(tail)
                close_rule()
            else:
                rule_body.append(raw)
            continue
        if not stripped or stripped.startswith("#"):
            continue
        indent = len(raw) - len(raw.lstrip())

        if indent == 0:
            level = 0
        elif level_pos[level] is None or indent > level_pos[level]:
            if level + 1 >= len(level_pos):
                raise ValueError(
                    f"line {lineno}: invalid indentation (too many levels)"
                )
            level += 1
        elif indent < level_pos[level]:
            for lv in range(level - 1, -1, -1):
                if level_pos[lv] == indent:
                    level = lv
                    break
            else:
                raise ValueError(
                    f"line {lineno}: indentation does not align with any "
                    "enclosing definition"
                )
        level_pos[level] = indent
        for lv in range(level + 1, len(level_pos)):
            level_pos[lv] = None

        if level == 0:
            in_sub = False
            cur_pred = None
            cur_group = None
            m = _NAMESPACE.match(stripped)
            if m:
                if namespace is not None:
                    raise ValueError(f"line {lineno}: duplicate namespace")
                namespace = m.group(1)
                continue
            m = _TYPE_DECL.match(stripped)
            if m is None:
                raise ValueError(
                    f"line {lineno}: expected Name(显示名): TypeKind, got "
                    f"{stripped!r}"
                )
            if namespace is None:
                raise ValueError(f"line {lineno}: define namespace first")
            name, display, kind = m.groups()
            if kind not in TYPE_KINDS:
                raise ValueError(f"line {lineno}: unknown type kind {kind!r}")
            qual = name if "." in name else f"{namespace}.{name}"
            cur_type = SchemaType(qual, display, kind)
            types[qual] = cur_type
            continue

        if cur_type is None:
            raise ValueError(f"line {lineno}: indented line before any type")

        if level == 1:
            in_sub = False
            cur_pred = None
            key, sep, val = stripped.partition(":")
            if not sep:
                raise ValueError(f"line {lineno}: expected key: value")
            key, val = key.strip(), val.strip()
            if key in ("properties", "relations"):
                cur_group = key
            elif key == "desc":
                cur_type.desc = val
            elif key == "hypernymPredicate":
                cur_type.hypernym = val
            elif key == "regular":
                if cur_type.kind != "StandardType":
                    raise ValueError(
                        f"line {lineno}: regular is available for "
                        "standard type only"
                    )
                cur_type.regular = val
            elif key == "spreadable":
                if cur_type.kind != "StandardType":
                    raise ValueError(
                        f"line {lineno}: spreadable is available for "
                        "standard type only"
                    )
                if val not in ("True", "False"):
                    raise ValueError(
                        f"line {lineno}: spreadable only accepts True or "
                        f"False, got {val!r}"
                    )
                cur_type.spreadable = val == "True"
            elif key == "autoRelate":
                if cur_type.kind != "ConceptType":
                    raise ValueError(
                        f"line {lineno}: autoRelate is available for "
                        "concept type only"
                    )
                cur_type.auto_relate = val
            else:
                raise ValueError(
                    f"line {lineno}: unknown type meta {key!r}"
                )
            continue

        if level == 2:
            in_sub = False
            if cur_group is None:
                raise ValueError(
                    f"line {lineno}: predicate outside properties:/relations:"
                )
            cur_pred = _parse_predicate(stripped, lineno, namespace)
            getattr(
                cur_type,
                cur_group if cur_group in ("properties", "relations")
                else "properties",
            )[cur_pred.name] = cur_pred
            continue

        if level == 3:
            if cur_pred is None:
                raise ValueError(f"line {lineno}: meta before any predicate")
            key, sep, val = stripped.partition(":")
            key, val = key.strip(), val.strip()
            if key == "rule":
                if not val.startswith("[["):
                    raise ValueError(f"line {lineno}: expected rule: [[")
                rest = val[2:]
                rule_target = cur_pred
                if rest.rstrip().endswith("]]"):
                    rule_body = [rest.rstrip()[:-2]]
                    close_rule()
                else:
                    in_rule = True
                    rule_body = [rest] if rest.strip() else []
            elif key == "constraint":
                cur_pred.constraints = [c.strip() for c in val.split(",")]
            elif key == "desc":
                cur_pred.desc = val
            elif key == "properties":
                in_sub = True
            else:
                raise ValueError(
                    f"line {lineno}: unknown predicate meta {key!r}"
                )
            continue

        # level 4: sub-properties of a relation/property
        if not in_sub:
            raise ValueError(
                f"line {lineno}: sub-predicate outside a properties: block"
            )
        sub = _parse_predicate(stripped, lineno, namespace)
        cur_pred.sub_properties[sub.name] = sub

    if in_rule:
        raise ValueError("unterminated rule block (missing ]])")
    if namespace is None:
        raise ValueError("missing namespace declaration")
    return SchemaModel(namespace, types)


def _parse_predicate(
    stripped: str, lineno: int, namespace: str
) -> SchemaPredicate:
    m = _PRED_DECL.match(stripped)
    if m is None:
        raise ValueError(
            f"line {lineno}: expected name(显示名): Type, got {stripped!r}"
        )
    prefix, name, display, obj = m.groups()
    if prefix is not None:
        if prefix not in SEMANTIC_RELATIONS:
            raise ValueError(
                f"line {lineno}: unknown semantic prefix {prefix!r} "
                f"(one of {sorted(SEMANTIC_RELATIONS)})"
            )
        if name not in SEMANTIC_RELATIONS[prefix]:
            raise ValueError(
                f"line {lineno}: {name!r} is not a {prefix}# predicate "
                f"(legal: {sorted(SEMANTIC_RELATIONS[prefix])})"
            )
    obj = obj.strip()
    if obj not in SCALAR_TYPES and not obj.startswith("STD.") and "." not in obj:
        obj = f"{namespace}.{obj}"
    return SchemaPredicate(name, display, obj, semantic=prefix)


def property_rules(model: SchemaModel) -> list[tuple[str, str]]:
    """Every embedded KGDSL rule, as (``Type.predicate``, qualified DSL),
    in declaration order."""
    out: list[tuple[str, str]] = []
    for t in model.types.values():
        for group in (t.properties, t.relations):
            for p in group.values():
                if p.rule is not None:
                    out.append((f"{t.name}.{p.name}", p.rule))
    return out


def apply_rules(model: SchemaModel, graph, store=None) -> kgdsl.KgdslResult:
    """Run every embedded property/relation rule, dependency-ordered —
    `_toposort` places dependent rules (supplychain's cashflowDiff*
    consume the fundTrans* rules' outputs) regardless of declaration
    order, and also rejects cyclic rule sets up front.

    Statements execute ONE AT A TIME with localCheckpoint lineage
    truncation on every frame a rule changed: supplychain chains 9
    Defines onto one vertex table, and a single un-truncated lineage
    grows the Catalyst plan (not the data) past what the driver can
    analyze — the same per-rule materialization discipline as
    concept_rules.run_rule_file."""
    from linkgraph import gql

    script = "\n\n".join(dsl for _name, dsl in property_rules(model))
    ordered = kgdsl._toposort(kgdsl.parse_script(script))
    g = gql.PropertyGraph(dict(graph.vertices), dict(graph.edges))
    ddl: dict = {}
    for stmt in ordered:
        res = kgdsl.run_script([stmt], g, store=store)
        g = gql.PropertyGraph(
            {
                k: (v if g.vertices.get(k) is v else v.localCheckpoint())
                for k, v in res.graph.vertices.items()
            },
            {
                k: (v if g.edges.get(k) is v else v.localCheckpoint())
                for k, v in res.graph.edges.items()
            },
        )
        ddl.update(res.ddl)
    return kgdsl.KgdslResult(None, g, ddl)


def validate_graph(model: SchemaModel, graph) -> dict[str, list[str]]:
    """Check a PropertyGraph against the schema. Returns
    {missing_vertex_tables, missing_columns, missing_edge_tables} —
    empty lists mean the graph satisfies the declared shape. Concept
    types need no table up front (belongTo rules register members), and
    rule-derived predicates are excluded (they appear after
    apply_rules)."""
    missing_tables: list[str] = []
    missing_columns: list[str] = []
    missing_edges: list[str] = []
    for t in model.types.values():
        if t.kind in ("ConceptType", "StandardType"):
            continue
        if t.name not in graph.vertices:
            missing_tables.append(t.name)
            continue
        cols = set(graph.vertices[t.name].columns)
        for p in t.properties.values():
            if p.rule is not None or p.semantic is not None:
                continue
            if p.is_scalar and p.name not in cols:
                missing_columns.append(f"{t.name}.{p.name}")
        for r in t.relations.values():
            if r.rule is not None or r.semantic is not None:
                continue
            if r.name not in graph.edges:
                missing_edges.append(f"{t.name}.{r.name}")
    return {
        "missing_vertex_tables": missing_tables,
        "missing_columns": missing_columns,
        "missing_edge_tables": missing_edges,
    }
