"""SPG concept-rule mark language: the ``concept.rule`` file format.

The reference ships per-project concept rule files (namespace header +
per-concept ``rule: [[ ... ]]`` entries) and loads them with
``SPGConceptRuleMarkLang``
(/root/reference/python/knext/knext/schema/marklang/concept_rule_ml.py):
it parses the envelope, auto-completes a ``Define`` head when the rule
body has none, qualifies unqualified type names with the namespace, and
submits each completed rule to the server's concept API (dynamic
taxonomy for belongTo, logical causation for leadTo). Here the same
file format parses into completed KGDSL ``Define`` statements and runs
through :func:`linkgraph.kgdsl.run_script`.

Execution is SEQUENTIAL in file order — each rule sees the graph state
its predecessors produced (belongTo rules register concept members,
Action DDL merges created instances), exactly like the reference
loader's one-rule-at-a-time submission. This also sidesteps the
causation cycles a single toposorted script would reject (supplychain's
leadTo chain creates CompanyEvents that an EARLIER belongTo rule
classifies — the reference server re-evaluates taxonomy dynamically;
run to a fixpoint by calling :func:`run_rule_file` with
``fixpoint=True``, which re-runs the file until no rule changes any
frame's row count).

Both shipped reference files parse and run: riskmining and supplychain
``schema/concept.rule`` (see tests/test_concept_rules.py).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from linkgraph import gql, kgdsl


@dataclass
class ConceptRule:
    """One completed rule: the concept it defines and its KGDSL text."""

    src_type: str  # namespace-qualified concept type
    src_name: str  # concept instance name
    dst_type: str | None  # set for leadTo (causation) rules
    dst_name: str | None
    dsl: str  # completed Define statement (parseable by kgdsl)


_NAMESPACE = re.compile(r"^namespace\s+([A-Za-z0-9]+)$")
# `Type`/`name`:  — optionally followed by DstType/`dstname` (leadTo)
_CONCEPT_KEY = re.compile(
    r"^`([A-Za-z0-9.]+)`/`([^`]+)`:"
    r"(?:\s*`?([A-Za-z0-9.]+)`?/`([^`]+)`)?\s*$"
)
_DEFINE_HEAD = re.compile(r"Define\s*\(", re.IGNORECASE)
# (alias:`Type`/`inst`) with an unqualified Type — backquoted concept form
_NODE_CONCEPT = re.compile(r"\(([\w\s]*?:)`([\w\s.]+)`/")
# (alias:Type) with an unqualified plain type
_NODE_PLAIN = re.compile(r"\(([\w\s]*?:)([\w\s.]+)\)")
# createNodeInstance( — the type= entry is qualified by a balanced-paren
# scan (_qualify_ddl_types), not a regex: type= may follow parenthesized
# value entries like value={name=concat(c.name, "x")}
_DDL_OPEN = re.compile(r"createNodeInstance\s*\(", re.IGNORECASE)
_TYPE_ENTRY = re.compile(r"(\btype\s*=\s*)([A-Za-z_][\w.]*)")


def _qualify(rule: str, namespace: str) -> str:
    """Prefix unqualified type names with the namespace — concept labels
    (``(a:`Type`/...``), plain node labels (``(a:Type)``), and Action
    ``createNodeInstance(type=T`` — leaving already-dotted names alone
    (concept_rule_ml.complete_rule's second half)."""

    def concept_sub(m: re.Match) -> str:
        t = m.group(2).strip()
        if "." in t:
            return m.group(0)
        return f"({m.group(1)}`{namespace}.{t}`/"

    def plain_sub(m: re.Match) -> str:
        t = m.group(2).strip()
        if "." in t or t.lower() in kgdsl._PRIMITIVE_TYPES:
            # primitive-typed Define objects ((o:Integer)) are property
            # targets, not entity labels — never namespace them
            return m.group(0)
        return f"({m.group(1)}{namespace}.{t})"

    rule = _NODE_CONCEPT.sub(concept_sub, rule)
    rule = _NODE_PLAIN.sub(plain_sub, rule)
    return _qualify_ddl_types(rule, namespace)


def _qualify_ddl_types(rule: str, namespace: str) -> str:
    """Qualify ``type=T`` inside every createNodeInstance(...) call.

    Scans to the call's MATCHING close paren (the type= entry may follow
    parenthesized value entries, which a non-greedy regex can't cross)."""
    out = []
    pos = 0
    for m in _DDL_OPEN.finditer(rule):
        start = m.end()  # just past the opening paren
        depth = 1
        i = start
        while i < len(rule) and depth:
            if rule[i] == "(":
                depth += 1
            elif rule[i] == ")":
                depth -= 1
            i += 1
        span = rule[start:i]

        def type_sub(tm: re.Match) -> str:
            t = tm.group(2)
            if "." in t:
                return tm.group(0)
            return f"{tm.group(1)}{namespace}.{t}"

        out.append(rule[pos:start])
        out.append(_TYPE_ENTRY.sub(type_sub, span, count=1))
        pos = i
    out.append(rule[pos:])
    return "".join(out)


def _complete(
    rule: str,
    namespace: str,
    src: tuple[str, str],
    dst: tuple[str, str] | None,
    subject_types: dict[str, str] | None,
) -> str:
    """Wrap a headless rule body in the generated Define head
    (concept_rule_ml.complete_rule's first half), then namespace-qualify
    type names. For headless belongTo rules the reference infers the
    subject type from the server schema's ``belongTo_<concept>``
    relations; pass ``subject_types`` ({qualified concept type ->
    subject label}) for the same effect."""
    if not _DEFINE_HEAD.match(rule.strip()):
        if dst is not None:
            head = (
                f"Define (s:`{namespace}.{src[0]}`/`{src[1]}`)"
                f"-[p:leadTo]->"
                f"(o:`{namespace}.{dst[0]}`/`{dst[1]}`) {{\n"
            )
        else:
            concept_type = f"{namespace}.{src[0]}"
            subject = (subject_types or {}).get(concept_type)
            if subject is None:
                raise ValueError(
                    f"rule for `{src[0]}`/`{src[1]}` has no Define head "
                    f"and no subject type is known for {concept_type!r} — "
                    "pass subject_types={...} (the reference infers this "
                    "from the schema's belongTo relations)"
                )
            head = (
                f"Define (s:{subject})-[p:belongTo]->"
                f"(o:`{concept_type}`/`{src[1]}`) {{\n"
            )
        rule = head + rule + "\n}"
    return _qualify(rule, namespace)


def parse_rule_file(
    text: str, subject_types: dict[str, str] | None = None
) -> list[ConceptRule]:
    """Parse a ``concept.rule`` file into completed rules (file order).

    Envelope grammar (concept_rule_ml.load_script): a zero-indent
    ``namespace X`` line, zero-indent concept keys
    ``​`Type`/`name`:`` (a trailing ``DstType/`dstname``` marks a leadTo
    rule), and an indented ``rule: [[ ... ]]`` block per concept; ``#``
    comments and blank lines are skipped.
    """
    namespace: str | None = None
    rules: list[ConceptRule] = []
    src: tuple[str, str] | None = None
    dst: tuple[str, str] | None = None
    in_rule = False
    body: list[str] = []

    def close_rule() -> None:
        nonlocal src, dst, body
        if src is None:
            raise ValueError("rule block without a preceding concept key")
        assert namespace is not None
        dsl = _complete("\n".join(body), namespace, src, dst, subject_types)
        qual = lambda t: t if "." in t else f"{namespace}.{t}"  # noqa: E731
        rules.append(
            ConceptRule(
                qual(src[0]), src[1],
                qual(dst[0]) if dst else None, dst[1] if dst else None,
                dsl,
            )
        )
        src, dst, body = None, None, []

    for lineno, line in enumerate(text.splitlines(), 1):
        stripped = line.strip()
        if in_rule:
            if stripped.endswith("]]"):
                tail = line.rstrip()[: len(line.rstrip()) - 2]
                if tail.strip():
                    body.append(tail)
                in_rule = False
                close_rule()
            else:
                body.append(line)
            continue
        if not stripped or stripped.startswith("#"):
            continue
        indent = len(line) - len(line.lstrip())
        if indent == 0:
            if src is not None:
                # the previous concept key never got its rule block —
                # silently reassigning would drop a rule from the file
                raise ValueError(
                    f"line {lineno}: concept key `{src[0]}`/`{src[1]}` "
                    "has no rule: block"
                )
            m = _NAMESPACE.match(stripped)
            if m:
                if namespace is not None:
                    raise ValueError(
                        f"line {lineno}: duplicate namespace definition"
                    )
                namespace = m.group(1)
                continue
            m = _CONCEPT_KEY.match(stripped)
            if m is None:
                raise ValueError(
                    f"line {lineno}: expected `ConceptType`/`ConceptName`: "
                    f"got {stripped!r}"
                )
            if namespace is None:
                raise ValueError(f"line {lineno}: define namespace first")
            src = (m.group(1), m.group(2))
            dst = (m.group(3), m.group(4)) if m.group(3) else None
        else:
            if not stripped.startswith("rule:"):
                raise ValueError(f"line {lineno}: expected rule:")
            rest = stripped[5:].strip()
            if not rest.startswith("[["):
                raise ValueError(f"line {lineno}: expected rule: [[")
            rest = rest[2:]
            if rest.endswith("]]"):
                body = [rest[:-2]]
                close_rule()
            else:
                in_rule = True
                body = [rest] if rest.strip() else []
    if in_rule:
        raise ValueError("unterminated rule block (missing ]])")
    if src is not None:
        raise ValueError(
            f"concept key `{src[0]}`/`{src[1]}` at end of file has no "
            "rule: block"
        )
    return rules


def run_rule_file(
    text: str,
    graph: gql.PropertyGraph,
    subject_types: dict[str, str] | None = None,
    store=None,
    fixpoint: bool = False,
    max_rounds: int = 10,
) -> kgdsl.KgdslResult:
    """Run every rule of a ``concept.rule`` file against ``graph``,
    sequentially in file order (see module docstring), and return the
    final result: the extended graph plus the union of all DDL deltas.

    ``fixpoint=True`` repeats the whole file until no rule changes any
    produced frame's row count (bounded by ``max_rounds``) — the analog
    of the reference server's dynamic re-evaluation, needed when a later
    leadTo rule CREATES instances an earlier belongTo rule classifies.
    """
    rules = parse_rule_file(text, subject_types)
    # parse each rule ONCE — run_script accepts pre-parsed statements and
    # deep-copies internally, so a fixpoint run re-executes without
    # re-tokenizing every round
    parsed = [kgdsl.parse_script(r.dsl) for r in rules]
    g = gql.PropertyGraph(dict(graph.vertices), dict(graph.edges))
    ddl: dict[str, object] = {}
    converged = not fixpoint
    for round_no in range(max_rounds if fixpoint else 1):
        before = {
            name: frame.count() for name, frame in ddl.items()
        } if fixpoint else {}
        for stmts in parsed:
            res = kgdsl.run_script(stmts, g, store=store)
            # truncate lineage on every frame this rule changed — each
            # rule layers joins/unions on the last, and an un-truncated
            # fixpoint run grows the Catalyst plan (not the data!) past
            # what the driver can analyze. localCheckpoint materializes
            # once per changed table per rule, the per-rule analog of
            # the reference server persisting each submitted rule.
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
            for name, frame in res.ddl.items():
                prev = ddl.get(name)
                # several rules (or fixpoint rounds) produce deltas for
                # one type — accumulate, full-row dedup (deterministic
                # rule outputs make re-produced deltas byte-identical)
                ddl[name] = (
                    frame
                    if prev is None
                    else prev.unionByName(
                        frame, allowMissingColumns=True
                    ).dropDuplicates()
                ).localCheckpoint()
        if fixpoint:
            after = {name: frame.count() for name, frame in ddl.items()}
            if after == before:
                converged = True
                break
    if not converged:
        import warnings

        warnings.warn(
            f"run_rule_file: fixpoint did not converge within "
            f"max_rounds={max_rounds} — the returned graph may be "
            "incomplete (the delta-count check is also insensitive to "
            "row-content churn at constant counts); raise max_rounds",
            stacklevel=2,
        )
    return kgdsl.KgdslResult(None, g, ddl)
