"""KGDSL native dialect: ``GraphStructure{} Rule{} Action{}`` statements
and ``Define (s:T)-[p:pred]->(o:Type) { ... }`` derived-predicate
definitions, compiled onto the same DataFrame lowering as gql.py.

Reference parity (the other half of the reference grammar, which gql.py's
MATCH/RETURN form does not cover):
  grammar    /root/reference/reasoner/kgdsl-parser/src/main/antlr4/com/antgroup/openspg/reasoner/KGDSL.g4:38
             (``base_rule_define : the_graph_structure the_rule? create_action?``)
             and :47 (``base_predicated_define`` = Define blocks)
  parser     OpenSPGDslParser.scala:86-116 (parseMultipleStatement);
             rule exprs are QLExpress strings (RuleRunner.java:47-53)
  examples   the shipped .dsl / test DSLs, e.g.
             runner/local-runner/src/test/java/.../LocalRunnerTest.java:44-55,
             KgReasonerZijinLocalTest.java:106-156 (Define chains),
             KgReasonerLeadToTest.java:115-133 (createNodeInstance/
             createEdgeInstance Action DDL)
  DAG        multi-statement scripts run in dependency order
             (lube-logical/.../validate/Validator.scala:29-45, Dag.scala)

Surface (each piece mirrored from a reference test/example):

    Define (s:Account)-[p:cur_month_num]->(o:Int) {
        GraphStructure { (u:Account)-[t:accountFundContact]-(s) }
        Rule {
            R1("recent"): t.transDate >= 20240101
            o = group(s).count(t.transDate)
        }
    }
    GraphStructure {
        (s:Account)
    }
    Rule { R0: s.cur_month_num > 10 }
    Action { get(s.id, s.cur_month_num) }

* Rule lines are newline-separated: named filters ``R1: expr`` /
  ``R1("desc"): expr``, let-bindings ``x = expr`` (inlined into later
  expressions, QLExpress variable semantics), aggregations
  ``x = group(a,b).fn(arg)``, and property assignments ``p.x = expr``.
* Rule operators ``==  !=  &&  ||  !  in  like  rlike  null`` normalize
  onto the gql expression AST (``== null`` means IS NULL, as QLExpress).
* Define with a primitive object type (Int/Float/Boolean/Text/...) is
  AddProperty: a new property ``pred`` on the subject label's vertex
  table. With an entity object type it is AddPredicate: a new derived
  edge table ``pred`` with properties from ``p.x = ...`` assignments.
  (ResultBlock.scala:75-112.)
* Action ``get(...)`` yields the result table; ``createNodeInstance`` /
  ``createEdgeInstance`` yield DDL delta frames (AddVertex/AddPredicate)
  applied to the working graph and optionally upserted to a TableStore.

Scale note: everything lowers to the gql planner's join pipeline —
no collect()s, no per-row Python; Define property-writes are one
aggregate + one left join per definition.
"""

from __future__ import annotations

import dataclasses
import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linkgraph import gql

# object types that make a Define an AddProperty (vs AddPredicate);
# KgType.scala:26-34 primitive set as spelled in the shipped DSLs
_PRIMITIVE_TYPES = {
    "int", "integer", "long", "float", "double", "boolean", "bool",
    "text", "string", "char", "character", "date", "number",
}

_TOKEN_RE = re.compile(
    r"""[ \t\r]*(?:
      (?P<esql>>>>.*?<<<)
    | (?P<comment>//[^\n]*)
    | (?P<nl>\n)
    | (?P<num>\d+(?:\.\d+)?)
    | (?P<dstr>"[^"]*")
    | (?P<sstr>'[^']*')
    | (?P<bq>(?:`[^`]*`)+)
    | (?P<param>\$[^\W\d]\w*)
    | (?P<name>[^\W\d]\w*(?:\.[^\W\d]\w*)*)
    | (?P<op><->|=>|<-|->|==|!=|<=|>=|&&|\|\||\.\.|[{}()\[\],:\-.*<>=+/%|!])
    )""",
    re.X | re.S,
)


def _tokenize(text: str) -> list[tuple[str, str]]:
    """KGDSL tokens, normalized onto gql's kinds: ``==`` stays distinct
    (assignment vs comparison — _ExprParser folds it to ``=``),
    ``!=``->``<>``, ``&&``/``||``/``!`` -> and/or/not keywords, both
    quote styles -> str, backquoted names -> name. Newlines are kept as
    ('nl','') — they terminate rule/action statements."""
    out: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == pos:
            if text[pos:].strip():
                raise SyntaxError(f"cannot tokenize at: {text[pos:pos + 30]!r}")
            break
        pos = m.end()
        kind = m.lastgroup
        if kind == "comment":
            continue
        if kind == "esql":  # >>> embedded sql <<< (EMBEDDED_SQL_ACTION)
            out.append(("sql", m.group("esql")[3:-3].strip()))
        elif kind == "nl":
            out.append(("nl", ""))
        elif kind == "num":
            out.append(("num", m.group("num")))
        elif kind in ("dstr", "sstr"):
            out.append(("str", m.group(kind)[1:-1]))
        elif kind == "bq":
            # doubled backquote = literal backquote (as gql._tokenize)
            out.append(
                ("name", "`".join(re.findall(r"`([^`]*)`", m.group("bq"))))
            )
        elif kind == "param":
            out.append(("param", m.group("param")[1:]))
        elif kind == "name":
            name = m.group("name")
            low = name.lower()
            if low in ("in", "like", "rlike", "and", "or", "not"):
                out.append(("kw", low))
            else:
                out.append(("name", name))
        else:
            op = m.group("op")
            if op == "==":
                # kept distinct from '=': the grammar separates assignment
                # (project_rule_expression, KGDSL.g4:241) from comparison —
                # `u.amount == 100` must never classify as a property
                # assignment. _ExprParser normalizes '==' -> '=' inside
                # expression bodies.
                out.append(("op", "=="))
            elif op == "!=":
                out.append(("op", "<>"))
            elif op == "&&":
                out.append(("kw", "and"))
            elif op == "||":
                out.append(("kw", "or"))
            elif op == "!":
                out.append(("kw", "not"))
            else:
                out.append(("op", op))
    out.append(("eof", ""))
    return out


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass
class DefineHead:
    """``Define (s:SubjLabel)-[p:pred]->(o:ObjType)``"""

    subj: str
    subj_label: str
    pred_alias: str
    pred: str
    obj: str
    obj_type: str
    concept: bool = False  # [o:Concept/`inst`] — string-valued (KTConcept)
    concept_instance: str | None = None  # the `inst`; default o value
    # `Define (s:`Type`/`inst`)-[p:leadTo]->...` (supplychain
    # concept.rule leadTo rules): the subject ranges over the concept's
    # MEMBERS — same lowering as a body node's /`concept` qualifier
    subj_concept: str | None = None

    @property
    def is_property(self) -> bool:
        # KTConcept lowers to StringType (SURVEY §1.2), so a concept-
        # qualified target is an AddProperty, not a derived edge
        return self.concept or self.obj_type.lower() in _PRIMITIVE_TYPES


@dataclass
class NodeInstance:
    """Action ``createNodeInstance(type=T, value={...})`` (AddVertex)."""

    var: str | None  # assignment target, referenceable by createEdgeInstance
    type: str
    value: list[tuple[str, tuple]]  # (prop, expr AST)


@dataclass
class EdgeInstance:
    """Action ``createEdgeInstance(src=, dst=, type=, value={})``
    (AddPredicate)."""

    src: str  # pattern alias or NodeInstance var
    dst: str
    type: str
    value: list[tuple[str, tuple]]


@dataclass
class Statement:
    define: DefineHead | None = None
    root: str | None = None  # __start__='true' alias (START_ALIAS analog)
    query: gql.Query = field(default_factory=gql.Query)
    filters: list = field(default_factory=list)  # expr ASTs (conjuncts)
    # conjuncts referencing a group() aggregate let — HAVING semantics,
    # applied AFTER the Define's groupBy (riskmining.schema developed:
    # `deviceNum = group(s,o).count(d); R1: deviceNum > 5`)
    having: list = field(default_factory=list)
    lets: dict = field(default_factory=dict)  # name -> expr AST (inlined)
    aggs: dict = field(default_factory=dict)  # name -> (group_aliases, fn, arg ASTs)
    propsets: list = field(default_factory=list)  # (alias, prop, expr AST)
    path_names: set = field(default_factory=set)  # named paths (path1: (s)-...)
    body_aliases: set = field(default_factory=set)  # aliases the body mentions
    # optional pattern edges (__optional__='true' edge attr /
    # `OPTIONAL path1: ...` — TransitiveOptionalTest.java:150-154,
    # path_condition KGDSL.g4:184): left-joined AFTER the mandatory
    # traversal, in declaration order
    optional_edges: list = field(default_factory=list)
    # node-line declaration constraints (props / concept qualifiers) as
    # (alias, expr): PATTERN constraints — for an optional-only alias
    # they apply inside the left join's right side, never as a post-join
    # WHERE (which would silently make the edge mandatory)
    node_constraints: list = field(default_factory=list)
    # per-group row filters (OrderAndSliceBlock / keep_*_path rules):
    # ("topk", aliases, [(expr, asc)], limit) |
    # ("keep_path", aliases, edge_alias, "longest"|"shortest")
    group_filters: list = field(default_factory=list)
    gets: list | None = None  # Action get(...) items: (expr AST, alias|None)
    view_name: str | None = None  # get(...).as(name(cols)) view name
    view_cols: list[str] | None = None  # positional output renames
    embedded_sql: str | None = None  # get(...).sql(>>> ... <<<)
    node_instances: list[NodeInstance] = field(default_factory=list)
    edge_instances: list[EdgeInstance] = field(default_factory=list)

    @property
    def produced(self) -> set[str]:
        out = set()
        if self.define is not None:
            out.add(self.define.pred)
            if self.define.concept and self.define.pred == "belongTo":
                # a belongTo Define registers concept members, so a
                # later pattern over the concept-type label depends on it
                out.add(self.define.obj_type)
        for ni in self.node_instances:
            out.add(ni.type)
        for ei in self.edge_instances:
            out.add(ei.type)
        return out

    @property
    def consumed(self) -> set[str]:
        out: set[str] = set()
        for e in list(self.query.edges) + list(self.optional_edges):
            if isinstance(e.rel, tuple):
                out |= set(e.rel)
            elif e.rel is not None:
                out.add(e.rel)
        for n in self.query.nodes.values():
            if n.label is not None:
                out.add(n.label)
        # property references: alias.prop consumes prop (a Define's output)
        refs: set[str] = set()
        for f2 in list(self.filters) + list(self.having):
            gql._expr_refs(f2, refs)
        for _a, ex in self.node_constraints:
            gql._expr_refs(ex, refs)
        for ex in self.lets.values():
            gql._expr_refs(ex, refs)
        for gf in self.group_filters:
            if gf[0] == "topk":
                for ex, _asc in gf[2]:
                    gql._expr_refs(ex, refs)
        for _, _, ex in self.propsets:
            gql._expr_refs(ex, refs)
        for _, (_, _, args) in self.aggs.items():
            for a in args:
                gql._expr_refs(a, refs)
        if self.gets:
            for ex, _alias in self.gets:
                gql._expr_refs(ex, refs)
        for ni in self.node_instances:
            for _, ex in ni.value:
                gql._expr_refs(ex, refs)
        for ei in self.edge_instances:
            for _, ex in ei.value:
                gql._expr_refs(ex, refs)
        for r in refs:
            _, _, prop = r.partition("__")
            if prop and prop != "vid":
                out.add(prop)
        return out


# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------


class _ExprParser(gql._Parser):
    """gql expression grammar over pre-normalized KGDSL tokens; extends
    _primary with null/true/false literals and dotted alias.prop names
    (one token here, alias '.' prop in gql)."""

    def __init__(self, toks: list[tuple[str, str]]):
        # '==' is kept distinct by the tokenizer so rule-line
        # classification can tell comparison from assignment; inside an
        # expression body both mean equality (gql AST uses '=')
        self.toks = [("op", "=") if t == ("op", "==") else t for t in toks]
        self.i = 0

    def _primary(self):
        t = self.peek()
        if t[0] == "name":
            low = t[1].lower()
            if low == "null":
                self.next()
                return ("lit", None)
            if low == "true":
                self.next()
                return ("lit", True)
            if low == "false":
                self.next()
                return ("lit", False)
            if "." in t[1]:
                self.next()
                alias, _, prop = t[1].partition(".")
                if self.peek() == ("op", "("):
                    # alias.method(...) — KGDSL 2.0 path methods:
                    # edge1.edges() yields the accumulated PathEdge array
                    # (PathEdge.java:31-42); chained .constraint/.reduce
                    # desugar onto the repeat_* registry functions
                    return self._postfix(self._method(("ref", alias, None), prop))
                return self._postfix(("ref", alias, prop))
        e = super()._primary()
        return self._postfix(e)

    def _postfix(self, obj):
        while (
            self.peek() == ("op", ".")
            and self.toks[self.i + 1][0] == "name"
        ):
            if self.toks[self.i + 2] == ("op", "("):
                self.next()  # .
                name = self.next()[1]
                obj = self._method(obj, name)
                continue
            if obj[0] == "func":
                # struct-field access on a computed value, e.g.
                # e.edges().get(0).src (GetField, Expr.scala:317)
                self.next()
                obj = ("getfield", obj, self.next()[1])
                continue
            break
        return obj

    def _method(self, obj, name: str):
        self.expect("op", "(")
        args = []
        if self.peek() != ("op", ")"):
            args.append(self._lambda_or_expr())
            while self.accept("op", ","):
                args.append(self._lambda_or_expr())
        self.expect("op", ")")
        low = name.lower()
        if obj[0] in ("func", "groupop") and (
            obj[0] == "groupop" or obj[1] == "group"
        ):
            # group(aliases).asc/desc(expr)*.limit(k) — per-group top-k
            # rule (OrderAndSliceBlock, KgReasonerTopKFilmTest.java:85);
            # group(A).keep_longest_path(e) keeps max-length paths
            if obj[0] == "func":
                aliases = []
                for a in obj[2]:
                    if a[0] != "ref" or a[2] is not None:
                        raise SyntaxError("group() takes bare aliases")
                    aliases.append(a[1])
                obj = ("groupop", aliases, [], None)
            _, aliases, sorts, limit = obj
            if low in ("asc", "desc"):
                if len(args) != 1:
                    raise SyntaxError(f"{low}() takes one sort expression")
                return ("groupop", aliases, sorts + [(args[0], low == "asc")], limit)
            if low == "limit":
                if len(args) != 1 or args[0][0] != "lit":
                    raise SyntaxError("limit() takes one integer literal")
                return ("topk", aliases, sorts, int(args[0][1]))
            if low in ("keep_longest_path", "keep_shortest_path"):
                if len(args) != 1 or args[0][0] != "ref" or args[0][2] is not None:
                    raise SyntaxError(f"{low}() takes a var-len edge alias")
                return (
                    "keep_path", aliases, args[0][1],
                    "longest" if low == "keep_longest_path" else "shortest",
                )
            raise SyntaxError(f"unknown group() method .{name}()")
        if low == "edges":
            if args or obj[0] != "ref" or obj[2] is not None:
                raise SyntaxError("edges() takes no args and applies to an alias")
            return ("ref", obj[1], "path")
        if low == "constraint":
            if len(args) != 1 or args[0][0] != "lambda":
                raise SyntaxError("constraint() takes one (pre, cur) => expr lambda")
            return ("func", "repeat_constraint", [obj, args[0]])
        if low == "reduce":
            if len(args) != 2 or args[1][0] != "lambda":
                raise SyntaxError("reduce() takes (init, (acc, cur) => expr)")
            return ("func", "repeat_reduce", [obj, args[0], args[1]])
        if low == "length":
            if args:
                raise SyntaxError("length() takes no args")
            return ("func", "repeat_edge_length", [obj])
        # list ops (ListOpExpr, RuleExprParser.scala:516-650) — chainable
        # on any list value (.edges(), .nodes(), a slice, ...)
        def _int_lit(a):
            # integerLiteral_full: minus_sign? int — a leading '-'
            # parses as unary minus in our expression grammar
            if a[0] == "lit" and isinstance(a[1], (int, float)):
                return int(a[1])
            if (
                a[0] == "bin"
                and a[1] == "-"
                and a[2] == ("lit", 0)
                and a[3][0] == "lit"
            ):
                return -int(a[3][1])
            return None

        if low == "nodes":
            if args or obj[0] != "ref" or obj[2] is not None:
                raise SyntaxError("nodes() takes no args and applies to an alias")
            return ("func", "repeat_nodes", [("ref", obj[1], "path")])
        if low == "get":
            if len(args) != 1 or _int_lit(args[0]) is None:
                raise SyntaxError("get() takes one integer literal index")
            return ("func", "list_get", [obj, ("lit", _int_lit(args[0]))])
        if low == "head":  # head(k) == Get(k), default 0 (the first)
            if len(args) > 1 or (args and _int_lit(args[0]) is None):
                raise SyntaxError("head() takes at most one integer literal")
            k = _int_lit(args[0]) if args else 0
            return ("func", "list_get", [obj, ("lit", k)])
        if low == "tail":
            # tail() -> Get(-1) (last); tail(k) -> Get(k-1) — the
            # REFERENCE's own mapping (RuleExprParser.scala:554
            # parseListTailEleOp subtracts 1 from the literal), kept
            # verbatim for parity even though tail(1) therefore reads
            # the FIRST element; use get(-k) for k-th-from-end
            if len(args) > 1 or (args and _int_lit(args[0]) is None):
                raise SyntaxError("tail() takes at most one integer literal")
            k = _int_lit(args[0]) if args else 0
            return ("func", "list_get", [obj, ("lit", k - 1)])
        if low == "slice":
            ix = [_int_lit(a) for a in args]
            if len(args) != 2 or any(i is None or i < 0 for i in ix):
                raise SyntaxError(
                    "slice() takes two non-negative integer literals"
                )
            return ("func", "list_slice", [obj, ("lit", ix[0]), ("lit", ix[1])])
        if low == "accumulate":
            if len(args) != 1 or args[0][0] != "lit" or args[0][1] not in ("+", "*"):
                raise SyntaxError("accumulate() takes '+' or '*'")
            return ("func", "list_accumulate", [obj, args[0]])
        if low == "str_join":
            # the reference PARSER rejects str_join on lists
            # (RuleExprParser.scala:641 UnsupportedOperationException);
            # we lower it to array_join instead — strictly more capable
            if len(args) != 1 or args[0][0] != "lit":
                raise SyntaxError("str_join() takes one string literal")
            return ("func", "list_str_join", [obj, args[0]])
        raise SyntaxError(f"unknown path method .{name}()")

    def _lambda_or_expr(self):
        """Lookahead for ``(p1, p2) => body`` lambdas inside call args."""
        if self.peek() == ("op", "("):
            j = self.i + 1
            params = []
            while self.toks[j][0] == "name" and self.toks[j + 1] in (
                ("op", ","), ("op", ")"),
            ):
                params.append(self.toks[j][1])
                if self.toks[j + 1] == ("op", ")"):
                    j += 2
                    break
                j += 2
            else:
                return self._expr()
            if params and self.toks[j] == ("op", "=>"):
                self.i = j + 1
                return ("lambda", params, self._expr())
        return self._expr()


def _parse_expr(toks: list[tuple[str, str]]) -> tuple:
    p = _ExprParser(list(toks) + [("eof", "")])
    e = p._expr()
    if p.peek()[0] != "eof":
        raise SyntaxError(f"trailing tokens in expression: {p.peek()}")
    return e


class _PatternParser(gql._Parser):
    """gql pattern grammar over KGDSL tokens; labels may be dotted
    (one token) and concept-qualified: ``(s:Type/`concept`)`` adds an
    equality conjunct on the vertex's ``concept`` property (the
    instance-of constraint the reference resolves via belongTo)."""

    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0
        self.concept_filters: list = []
        self.seen_aliases: set[str] = set()

    def _node(self, q: gql.Query) -> str:
        self.expect("op", "(")
        alias = self.expect("name")[1]
        self.seen_aliases.add(alias)
        label = None
        if self.accept("op", ":"):
            labels = [self.expect("name")[1]]
            while self.accept("op", "|"):  # label alternation, as gql
                labels.append(self.expect("name")[1])
            label = labels[0] if len(labels) == 1 else tuple(labels)
            if self.accept("op", "/"):
                concept = self.expect("name")[1]
                self.concept_filters.append(
                    ("bin", "=", ("ref", alias, "concept"), ("lit", concept))
                )
        self.expect("op", ")")
        if any(ep.alias == alias for ep in q.edges):
            raise SyntaxError(f"node alias {alias!r} collides with an edge alias")
        prev = q.nodes.get(alias)
        if prev is not None and label is not None and prev.label not in (None, label):
            raise SyntaxError(f"alias {alias} bound to two labels")
        if prev is None or (prev.label is None and label is not None):
            q.nodes[alias] = gql.NodePat(alias, label)
        return alias


def _contains_groupop(e) -> bool:
    """True when a group() top-k/keep-path node is nested inside a larger
    expression — not compilable as a row predicate, must be its own rule."""
    if not isinstance(e, tuple):
        return False
    if e[0] in ("topk", "keep_path", "groupop"):
        return True
    if e[0] == "bin":
        return _contains_groupop(e[2]) or _contains_groupop(e[3])
    if e[0] == "not":
        return _contains_groupop(e[1])
    if e[0] == "func":
        return any(_contains_groupop(a) for a in e[2])
    if e[0] == "getfield":
        return _contains_groupop(e[1])
    if e[0] == "in" and isinstance(e[2], list):
        return _contains_groupop(e[1]) or any(_contains_groupop(a) for a in e[2])
    if e[0] == "in":
        return _contains_groupop(e[1])
    if e[0] == "lambda":
        return _contains_groupop(e[2])
    return False


def _type_name(expr, what: str) -> str:
    """Extract a (possibly dotted/namespaced) type name from a parsed
    kwarg expression: ``type=Influence`` parses as a bare ref,
    ``type=HengSheng.CompanyInfluence`` (KgReasonerLeadToTest.java:116)
    as a ref with a prop — both are type names here."""
    if expr is None or expr[0] != "ref":
        raise SyntaxError(f"{what} needs a type name")
    return f"{expr[1]}.{expr[2]}" if expr[2] else expr[1]


def _split_lines(toks: list[tuple[str, str]]) -> list[list[tuple[str, str]]]:
    """Split a block's tokens into statements on newlines at paren/
    bracket depth 0 (a multi-line createNodeInstance(...) call stays one
    statement)."""
    lines: list[list[tuple[str, str]]] = [[]]
    depth = 0
    for t in toks:
        if t[0] == "op" and t[1] in "([{":
            depth += 1
        elif t[0] == "op" and t[1] in ")]}":
            depth -= 1
        if t == ("nl", "") and depth == 0:
            # a trailing comma continues the statement on the next line
            # (path_pattern_list: comma-separated Structure paths split
            # across lines — supplychain concept.rule leadTo rules)
            if lines[-1] and lines[-1][-1] != ("op", ","):
                lines.append([])
            continue
        if t != ("nl", ""):
            # a line beginning with '.' continues the previous statement
            # (get(...)\n  .as(...)\n  .sql(...) postfix chains)
            if (
                not lines[-1]
                and t == ("op", ".")
                and len(lines) > 1
                and lines[-2]
            ):
                lines.pop()
            lines[-1].append(t)
    return [ln for ln in lines if ln]


class _ScriptParser:
    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0

    def _peek(self, skip_nl: bool = True):
        j = self.i
        while skip_nl and self.toks[j] == ("nl", ""):
            j += 1
        return self.toks[j]

    def _next(self, skip_nl: bool = True):
        while skip_nl and self.toks[self.i] == ("nl", ""):
            self.i += 1
        t = self.toks[self.i]
        self.i += 1
        return t

    def _expect(self, kind, val=None):
        t = self._next()
        if t[0] != kind or (val is not None and t[1] != val):
            raise SyntaxError(f"expected {val or kind}, got {t}")
        return t

    def _block(self) -> list[tuple[str, str]]:
        """Consume a brace-balanced { ... } and return its inner tokens."""
        self._expect("op", "{")
        depth = 1
        out: list[tuple[str, str]] = []
        while True:
            t = self.toks[self.i]
            self.i += 1
            if t[0] == "eof":
                raise SyntaxError("unterminated { block")
            if t == ("op", "{"):
                depth += 1
            elif t == ("op", "}"):
                depth -= 1
                if depth == 0:
                    return out
            out.append(t)

    def parse(self) -> list[Statement]:
        stmts: list[Statement] = []
        while self._peek()[0] != "eof":
            t = self._peek()
            if t == ("name", "Define"):
                stmts.append(self._define())
            elif t == ("name", "GraphStructure") or self._is_block_head(
                t, "GraphStructure", "Structure"
            ):
                stmts.append(self._base_rule(None))
            else:
                raise SyntaxError(f"expected Define or GraphStructure, got {t}")
        return stmts

    def _define(self) -> Statement:
        self._expect("name", "Define")
        self._expect("op", "(")
        subj = self._expect("name")[1]
        self._expect("op", ":")
        subj_label = self._expect("name")[1]
        subj_concept = None
        if self._peek() == ("op", "/"):
            self._next()
            subj_concept = self._expect("name")[1]
        self._expect("op", ")")
        self._expect("op", "-")
        self._expect("op", "[")
        pred_alias = self._expect("name")[1]
        self._expect("op", ":")
        pred = self._expect("name")[1]
        self._expect("op", "]")
        self._expect("op", "->")
        # object may be parenthesized `(o:Type)` or bracketed
        # `[o:Concept/`inst`]` (KGDSL.g4:47 comment form); a /concept
        # qualifier marks a concept-typed target (string-valued property)
        opener = self._next()
        if opener == ("op", "("):
            closer = ")"
        elif opener == ("op", "["):
            closer = "]"
        else:
            raise SyntaxError(f"Define object needs (o:Type) or [o:Type], got {opener}")
        obj = self._expect("name")[1]
        self._expect("op", ":")
        obj_type = self._expect("name")[1]
        concept = False
        instance = None
        if self._peek() == ("op", "/"):
            self._next()
            instance = self._expect("name")[1]  # belongTo-style instance
            concept = True
        self._expect("op", closer)
        head = DefineHead(
            subj, subj_label, pred_alias, pred, obj, obj_type, concept, instance,
            subj_concept,
        )
        self._expect("op", "{")
        stmt = self._base_rule(head)
        self._expect("op", "}")
        return stmt

    def _is_block_head(self, token, canonical: str, synonym: str) -> bool:
        """KGDSL.g4:491-495: ``Structure`` / ``Constraint`` are legal
        spellings of the GraphStructure / Rule block heads — capital
        first letter, rest case-insensitive (STRUCTURE/CONSTRAINT
        lexer rules)."""
        kind, val = token
        if kind != "name":
            return False
        if val == canonical:
            return True
        return val[:1] == synonym[:1] and val.lower() == synonym.lower()

    def _base_rule(self, head: DefineHead | None) -> Statement:
        t = self._next()
        if not (t == ("name", "GraphStructure") or self._is_block_head(t, "GraphStructure", "Structure")):
            raise SyntaxError(f"expected GraphStructure, got {t}")
        stmt = Statement(define=head)
        if head is not None:
            # the Define head binds the subject's label for the body —
            # and the object's, when the target is an entity type
            # (`->(o:FilmStar)` types the body's bare `(o)`)
            stmt.query.nodes[head.subj] = gql.NodePat(head.subj, head.subj_label)
            if head.subj_concept is not None:
                stmt.node_constraints.append((
                    head.subj,
                    ("bin", "=", ("ref", head.subj, "concept"),
                     ("lit", head.subj_concept)),
                ))
            if not head.is_property:
                stmt.query.nodes[head.obj] = gql.NodePat(head.obj, head.obj_type)
        self._parse_graph_structure(stmt, self._block())
        if self._peek() == ("name", "Rule") or self._is_block_head(
            self._peek(), "Rule", "Constraint"
        ):
            self._next()
            self._parse_rule(stmt, self._block())
        if self._peek() == ("name", "Action"):
            self._next()
            self._parse_action(stmt, self._block())
        _fix_varlen_refs(stmt)
        # a conjunct referencing a group() aggregate let is a HAVING
        # condition — it can only bind after the Define's groupBy
        if stmt.aggs:
            having, pre = [], []
            for f2 in stmt.filters:
                (having if _refs_agg_let(f2, stmt.aggs) else pre).append(f2)
            stmt.filters = pre
            stmt.having = having
        return stmt

    def _parse_graph_structure(self, stmt: Statement, toks) -> None:
        for line in _split_lines(toks):
            optional_chain = False
            if (
                len(line) > 1
                and line[0][0] == "name"
                and line[0][1].upper() == "OPTIONAL"
                and (line[1][0] == "name" or line[1] == ("op", "("))
            ):
                # `OPTIONAL [path1:] (s)-[e]->(o)` (path_condition,
                # KGDSL.g4:184): the whole chain left-joins
                optional_chain = True
                line = line[1:]
            # named path declaration (KGDSL 1.0 compat, KGDSL.g4:30
            # comment: `path1: (s)-[p1:x]->(end:y)`): record the name,
            # parse the chain; a Rule line that is just the bare name is
            # an existence assertion, already implied by the inner join
            if (
                len(line) > 2
                and line[0][0] == "name"
                and "." not in line[0][1]
                and line[1] == ("op", ":")
                and line[2] == ("op", "(")
            ):
                stmt.path_names.add(line[0][1])
                line = line[2:]
            if line[0] == ("op", "("):
                # GQL-path chain form: (a:T)-[e:r]->(b)
                # comma-chained patterns may share a line; _pattern_chain
                # consumes one chain, commas continue it (gql behavior)
                p = _PatternParser(list(line) + [("eof", "")])
                target = gql.Query() if optional_chain else stmt.query
                p._pattern_chain(target)
                while p.accept("op", ","):
                    p._pattern_chain(target)
                if p.peek()[0] != "eof":
                    raise SyntaxError(f"trailing tokens in pattern: {p.peek()}")
                if optional_chain:
                    stmt.optional_edges.extend(target.edges)
                    for a, n in target.nodes.items():
                        prev = stmt.query.nodes.get(a)
                        if prev is None or (
                            prev.label is None and n.label is not None
                        ):
                            stmt.query.nodes[a] = n
                # concept qualifiers are PATTERN constraints on their
                # alias (matters for optional-only aliases)
                for c in p.concept_filters:
                    stmt.node_constraints.append((c[2][1], c))
                stmt.body_aliases |= p.seen_aliases
            else:
                # arrow-DSL form (KGDSL.g4:118 one_edge_pattern; FinBench
                # trc1, FinBenchTest.java:86-92):
                #   alias [Label, prop='v', __start__='true']
                #   a -> b [type1, type2] repeat(1,3) as e   (also <->)
                self._parse_arrow_line(stmt, line, optional=optional_chain)

    def _parse_bracket_list(self, p):
        """``[Label[, Label2...][, key=value...]]`` (label_property_list,
        KGDSL.g4:158-161): leading names are labels/types until the
        first ``key=value`` pair. Returns (labels, [(key, lit_value)])."""
        labels: list[str] = []
        props: list[tuple] = []
        first = True
        while first or p.accept("op", ","):
            first = False
            name = p.expect("name")[1]
            if p.accept("op", "="):
                val = p._primary()
                if val[0] != "lit":
                    raise SyntaxError(
                        f"property constraint {name} needs a literal"
                    )
                props.append((name, val[1]))
            elif props:
                raise SyntaxError(
                    f"label {name!r} after a key=value pair "
                    "(labels come first in a [...] list)"
                )
            else:
                labels.append(name)
        p.expect("op", "]")
        return labels, props

    def _parse_arrow_line(
        self, stmt: Statement, line, optional: bool = False
    ) -> None:
        p = _ExprParser(list(line) + [("eof", "")])
        left = p.expect("name")[1]
        if "." in left:
            raise SyntaxError(f"bad pattern alias {left!r}")
        stmt.body_aliases.add(left)
        t = p.peek()
        if t in (("op", "["), ("op", ",")) or t[0] == "eof":
            # (multi-)vertex declaration: `a [Label, k=v]` /
            # `a, b [Label]` (define_multiple_vertex, KGDSL.g4:147-151)
            aliases = [left]
            while p.accept("op", ","):
                a = p.expect("name")[1]
                if "." in a:
                    raise SyntaxError(f"bad pattern alias {a!r}")
                stmt.body_aliases.add(a)
                aliases.append(a)
            label = None
            props: list[tuple] = []
            if p.accept("op", "["):
                labels, props = self._parse_bracket_list(p)
                if len(labels) == 1:
                    label = labels[0]
                elif labels:  # label alternation, same lowering as (a:A|B)
                    label = tuple(labels)
            if len(aliases) > 1 and any(k == "__start__" for k, _ in props):
                raise SyntaxError(
                    "__start__ marks ONE traversal root — declare it on a "
                    "single-alias line, not a multi-vertex declaration"
                )
            for alias in aliases:
                for key, val in props:
                    if key == "__start__":
                        if str(val).lower() == "true":
                            stmt.root = alias  # START_ALIAS analog
                    else:
                        stmt.node_constraints.append(
                            (alias, ("bin", "=", ("ref", alias, key), ("lit", val)))
                        )
                prev = stmt.query.nodes.get(alias)
                if prev is None or (prev.label is None and label is not None):
                    stmt.query.nodes[alias] = gql.NodePat(alias, label)
            if p.peek()[0] != "eof":
                raise SyntaxError(f"trailing tokens in node line: {p.peek()}")
            return
        # edge line: a -> b / a <-> b (undirected) / a <- b (reversed)
        arrow = p.next()
        if arrow not in (("op", "->"), ("op", "<->"), ("op", "<-")):
            raise SyntaxError(f"expected -> / <-> / <- after {left!r}, got {arrow}")
        right = p.expect("name")[1]
        stmt.body_aliases.add(right)
        rel = None
        eprops: tuple = ()
        if p.accept("op", "["):
            # `[type1, type2, key=value...]` — types then inline edge
            # property constraints (define_one_edge, KGDSL.g4:117-119);
            # __optional__='true' marks the edge optional
            # (TransitiveOptionalTest.java:150-154)
            rels, props = self._parse_bracket_list(p)
            if not rels:
                raise SyntaxError("edge [...] list needs at least one type")
            rel = rels[0] if len(rels) == 1 else tuple(rels)
            kept = []
            for k, v in props:
                if k == "__optional__":
                    optional = optional or str(v).lower() == "true"
                else:
                    kept.append((k, v))
            eprops = tuple(kept)
        lower = upper = None
        if p.peek() == ("name", "repeat"):
            p.next()
            p.expect("op", "(")
            lower = int(p.expect("num")[1])
            p.expect("op", ",")
            upper = int(p.expect("num")[1])
            p.expect("op", ")")
        alias = None
        if p.peek() == ("name", "as"):
            p.next()
            alias = p.expect("name")[1]
        if p.peek()[0] != "eof":
            raise SyntaxError(f"trailing tokens in edge line: {p.peek()}")
        undirected = arrow == ("op", "<->")
        src, dst = (right, left) if arrow == ("op", "<-") else (left, right)
        for a in (src, dst):
            stmt.query.nodes.setdefault(a, gql.NodePat(a, None))
        ep = gql.EdgePat(
            src, dst, alias, rel, lower, upper, undirected, props=eprops
        )
        if optional:
            stmt.optional_edges.append(ep)
        else:
            stmt.query.edges.append(ep)

    def _parse_rule(self, stmt: Statement, toks) -> None:
        for line in _split_lines(toks):
            # R1: expr   |   R1("desc"): expr
            if (
                line[0][0] == "name"
                and "." not in line[0][1]
                and len(line) > 1
                and (
                    line[1] == ("op", ":")
                    or (
                        line[1] == ("op", "(")
                        and len(line) > 4
                        and line[2][0] == "str"
                        and line[3] == ("op", ")")
                        and line[4] == ("op", ":")
                    )
                )
            ):
                body = line[2:] if line[1] == ("op", ":") else line[5:]
                ex = _parse_expr(body)
                # `R1('d'): path1` — existence of a named path: implied
                # by the pattern's inner join, so the conjunct is a no-op
                if ex[0] == "ref" and ex[2] is None and ex[1] in stmt.path_names:
                    continue
                if ex[0] in ("topk", "keep_path"):
                    stmt.group_filters.append(ex)
                    continue
                if ex[0] == "groupop":
                    raise SyntaxError(
                        "group().asc/desc(...) rule needs a trailing .limit(k)"
                    )
                if _contains_groupop(ex):
                    raise SyntaxError(
                        "a group() top-k/keep-path rule must be the whole "
                        "rule body — split `R: group(...)... && cond` into "
                        "two named rules"
                    )
                stmt.filters.append(ex)
                continue
            # name = ... | alias.prop = ... | name("desc") = ...
            # (described assignment — project_rule_expression allows the
            # explanation parens on lets too: supplychain.schema
            # `otherTransSum("总共转入金额") = group(s).sum(...)`)
            if (
                len(line) > 4
                and line[0][0] == "name"
                and line[1] == ("op", "(")
                and line[2][0] == "str"
                and line[3] == ("op", ")")
                and line[4] == ("op", "=")
            ):
                line = [line[0], ("op", "=")] + line[5:]
            if len(line) > 1 and line[0][0] == "name" and line[1] == ("op", "="):
                target, body = line[0][1], line[2:]
                if self._is_group_call(body):
                    agg = self._parse_group_call(body)
                    if "." in target:
                        alias, _, prop = target.partition(".")
                        stmt.aggs[f"{alias}.{prop}"] = agg
                        stmt.propsets.append(
                            (alias, prop, ("ref", "__agg__", f"{alias}.{prop}"))
                        )
                    else:
                        stmt.aggs[target] = agg
                    continue
                ex = _parse_expr(body)
                if "." in target:
                    alias, _, prop = target.partition(".")
                    stmt.propsets.append((alias, prop, ex))
                else:
                    stmt.lets[target] = ex
                continue
            if any(t == ("op", "==") for t in line):
                raise SyntaxError(
                    "a comparison rule line must be named — write "
                    f"`R1: {' '.join(t[1] for t in line)}` "
                    "(logic_rule_expression, KGDSL.g4:243)"
                )
            raise SyntaxError(f"cannot parse rule line: {line}")

    @staticmethod
    def _is_group_call(toks) -> bool:
        return bool(toks) and toks[0] == ("name", "group")

    @staticmethod
    def _parse_group_call(toks):
        """``group(a[,b...]).fn(args)`` -> (aliases, fn, arg ASTs)."""
        p = _ExprParser(list(toks) + [("eof", "")])
        p.expect("name", "group")
        p.expect("op", "(")
        aliases = [p.expect("name")[1]]
        while p.accept("op", ","):
            aliases.append(p.expect("name")[1])
        p.expect("op", ")")
        p.expect("op", ".")
        fn = p.expect("name")[1].lower()
        p.expect("op", "(")
        args = []
        if p.peek() != ("op", ")"):
            args.append(p._expr())
            while p.accept("op", ","):
                args.append(p._expr())
        p.expect("op", ")")
        if p.peek()[0] != "eof":
            raise SyntaxError(f"trailing tokens after group call: {p.peek()}")
        return (aliases, fn, args)

    def _parse_action(self, stmt: Statement, toks) -> None:
        for line in _split_lines(toks):
            if line[0] == ("name", "get"):
                p = _ExprParser(list(line) + [("eof", "")])
                p.expect("name", "get")
                p.expect("op", "(")
                items = [self._get_item(p)]
                while p.accept("op", ","):
                    items.append(self._get_item(p))
                p.expect("op", ")")
                # postfix .as(view(cols)) / .as(cols) / .sql(>>>...<<<)
                while p.accept("op", "."):
                    kw = p.expect("name")[1].lower()
                    p.expect("op", "(")
                    if kw == "as":
                        first = p.expect("name")[1]
                        if p.accept("op", "("):  # named view form
                            stmt.view_name = first
                            cols = [p.expect("name")[1]]
                            self._skip_comment(p)
                            while p.accept("op", ","):
                                cols.append(p.expect("name")[1])
                                self._skip_comment(p)
                            p.expect("op", ")")
                        else:
                            cols = [first]
                            self._skip_comment(p)
                            while p.accept("op", ","):
                                cols.append(p.expect("name")[1])
                                self._skip_comment(p)
                        stmt.view_cols = cols
                    elif kw == "sql":
                        t = p.next()
                        if t[0] != "sql":
                            raise SyntaxError(
                                "sql() needs a >>> ... <<< embedded block"
                            )
                        stmt.embedded_sql = t[1]
                    else:
                        raise SyntaxError(f"unknown get() postfix .{kw}()")
                    p.expect("op", ")")
                stmt.gets = items
                continue
            var = None
            rest = line
            if (
                len(line) > 1
                and line[0][0] == "name"
                and line[1] == ("op", "=")
                and line[2][0] == "name"
                and line[2][1] in ("createNodeInstance", "createEdgeInstance")
            ):
                var = line[0][1]
                rest = line[2:]
            if rest[0] == ("name", "createNodeInstance"):
                kw = self._parse_kwargs(rest[1:])
                typ = _type_name(kw.get("type"), "createNodeInstance type=")
                stmt.node_instances.append(
                    NodeInstance(var, typ, kw.get("value", []))
                )
                continue
            if rest[0] == ("name", "createEdgeInstance"):
                kw = self._parse_kwargs(rest[1:])
                for k in ("src", "dst"):
                    v = kw.get(k)
                    if v is None or v[0] != "ref" or v[2] is not None:
                        raise SyntaxError(f"createEdgeInstance needs {k}=<alias>")
                typ = _type_name(kw.get("type"), "createEdgeInstance type=")
                stmt.edge_instances.append(
                    EdgeInstance(
                        kw["src"][1], kw["dst"][1], typ, kw.get("value", []),
                    )
                )
                continue
            raise SyntaxError(f"cannot parse action line: {line}")

    @staticmethod
    def _get_item(p: "_ExprParser"):
        """one_element_in_get: expr [as name] [COMMENT 'str']."""
        ex = p._expr()
        alias = None
        if p.peek() == ("name", "as"):
            p.next()
            alias = p.expect("name")[1]
        _ScriptParser._skip_comment(p)
        return (ex, alias)

    @staticmethod
    def _skip_comment(p: "_ExprParser") -> None:
        if p.peek() == ("name", "COMMENT"):
            p.next()
            p.expect("str")

    @staticmethod
    def _parse_kwargs(toks):
        """``(k=v, ..., value={p = expr ...})`` -> dict; value parses to a
        list of (prop, expr AST)."""
        p = _ExprParser(list(toks) + [("eof", "")])
        p.expect("op", "(")
        out: dict = {}
        while p.peek() != ("op", ")"):
            key = p.expect("name")[1]
            p.expect("op", "=")
            if key == "value":
                p.expect("op", "{")
                entries: list[tuple[str, tuple]] = []
                while p.peek() != ("op", "}"):
                    prop = p.expect("name")[1]
                    p.expect("op", "=")
                    entries.append((prop, p._expr()))
                    p.accept("op", ",")
                p.expect("op", "}")
                out["value"] = entries
            else:
                out[key] = p._expr()
            p.accept("op", ",")
        p.expect("op", ")")
        return out


def _fix_varlen_refs(stmt: Statement) -> None:
    """A bare reference to a var-len edge alias (``repeat_edge_length(
    edge1)``) means its accumulated path array — rewrite to the
    ``edge1.path`` binding column. Bare edge aliases have no other valid
    meaning (edges carry no vid)."""
    vl = {e.alias for e in stmt.query.edges if e.is_varlen and e.alias}
    if not vl:
        return

    def fix(e):
        if not isinstance(e, tuple):
            return e
        if e[0] == "ref" and e[2] is None and e[1] in vl:
            return ("ref", e[1], "path")
        if e[0] == "bin":
            return ("bin", e[1], fix(e[2]), fix(e[3]))
        if e[0] == "not":
            return ("not", fix(e[1]))
        if e[0] == "func":
            return ("func", e[1], [fix(a) for a in e[2]])
        if e[0] == "lambda":
            return ("lambda", e[1], fix(e[2]))
        if e[0] == "in" and isinstance(e[2], list):
            return ("in", fix(e[1]), [fix(a) for a in e[2]])
        if e[0] == "in":
            return ("in", fix(e[1]), e[2])
        if e[0] == "getfield":
            return ("getfield", fix(e[1]), e[2])
        return e

    stmt.filters = [fix(f2) for f2 in stmt.filters]
    stmt.lets = {k: fix(v) for k, v in stmt.lets.items()}
    stmt.aggs = {
        k: (al, fn, [fix(a) for a in args])
        for k, (al, fn, args) in stmt.aggs.items()
    }
    stmt.propsets = [(a, pr, fix(ex)) for a, pr, ex in stmt.propsets]
    stmt.group_filters = [
        ("topk", gf[1], [(fix(ex), asc) for ex, asc in gf[2]], gf[3])
        if gf[0] == "topk"
        else gf
        for gf in stmt.group_filters
    ]
    if stmt.gets:
        stmt.gets = [(fix(g), al) for g, al in stmt.gets]


def parse_script(text: str) -> list[Statement]:
    """Parse a KGDSL script (one or more Define / GraphStructure
    statements) into Statement ASTs — the parser-golden surface
    mirroring OpenSPGDslParserTest's KGDSL cases."""
    return _ScriptParser(text).parse()


# ---------------------------------------------------------------------------
# lowering / execution
# ---------------------------------------------------------------------------


def _inline_lets(e, lets: dict):
    """QLExpress let semantics: a bare name bound by ``x = expr`` is the
    expression, inlined (recursively — lets may reference earlier lets)."""
    if not isinstance(e, tuple):
        return e
    if e[0] == "ref" and e[2] is None and e[1] in lets:
        return lets[e[1]]
    if e[0] == "bin":
        return ("bin", e[1], _inline_lets(e[2], lets), _inline_lets(e[3], lets))
    if e[0] == "not":
        return ("not", _inline_lets(e[1], lets))
    if e[0] == "func":
        return ("func", e[1], [_inline_lets(a, lets) for a in e[2]])
    if e[0] == "lambda":  # lambda params shadow same-named lets
        inner = {k: v for k, v in lets.items() if k not in e[1]}
        return ("lambda", e[1], _inline_lets(e[2], inner))
    if e[0] == "in" and isinstance(e[2], list):
        return ("in", _inline_lets(e[1], lets), [_inline_lets(a, lets) for a in e[2]])
    if e[0] == "in":
        return ("in", _inline_lets(e[1], lets), e[2])
    if e[0] == "getfield":
        return ("getfield", _inline_lets(e[1], lets), e[2])
    return e


def _resolve_lets(stmt: Statement) -> dict:
    """Fixed-point inline so ``b = a + 1`` after ``a = 2`` fully expands."""
    lets: dict = {}
    for name, ex in stmt.lets.items():
        lets[name] = _inline_lets(ex, lets)
    return lets


def _agg_column(fn: str, args, cols) -> Column:
    from linkgraph.functions import AGGREGATES

    if fn == "count" and len(args) == 1 and args[0] == ("star",):
        return F.count(F.lit(1))
    agg = AGGREGATES.get(fn)
    if agg is None:
        raise ValueError(f"unknown aggregate function {fn!r} in group().{fn}()")
    compiled = [
        a[1] if a[0] == "lit" else gql._compile_expr(a, cols) for a in args
    ]
    return agg(*compiled)


@dataclass
class KgdslResult:
    """run_script output: the final get() table (None for pure-DDL
    scripts), the working graph with every Define/DDL applied, and the
    delta frames per created type."""

    table: DataFrame | None
    graph: gql.PropertyGraph
    ddl: dict[str, DataFrame]


def _toposort(stmts: list[Statement]) -> list[Statement]:
    """Dependency order (Validator/Dag analog): a statement consuming a
    name another statement produces runs after it; ties keep script
    order. Cycles raise."""
    produced: dict[str, list[int]] = {}
    for i, s in enumerate(stmts):
        for p in s.produced:
            produced.setdefault(p, []).append(i)
    for p, idxs in produced.items():
        if len(idxs) > 1 and not all(
            stmts[i].define is not None and stmts[i].define.concept
            for i in idxs
        ):
            # two producers of one type would silently order against
            # the first — fail loudly instead. Concept Defines are the
            # exception: several rules legitimately populate one concept
            # type (one per instance — dynamic taxonomy), and consumers
            # simply depend on ALL of them.
            raise ValueError(
                f"two statements produce {p!r} (statements "
                f"{idxs[0] + 1} and {idxs[1] + 1}); each edge/property "
                "type may have exactly one Define/DDL producer"
            )
    deps: dict[int, set[int]] = {
        i: {
            j
            for c in s.consumed
            for j in produced.get(c, [])
            if j != i
        }
        for i, s in enumerate(stmts)
    }
    done: list[int] = []
    seen: set[int] = set()
    mark: set[int] = set()

    def visit(i: int) -> None:
        if i in seen:
            return
        if i in mark:
            raise ValueError("cyclic dependency between KGDSL statements")
        mark.add(i)
        for d in sorted(deps[i]):
            visit(d)
        mark.discard(i)
        seen.add(i)
        done.append(i)

    for i in range(len(stmts)):
        visit(i)
    return [stmts[i] for i in done]


def _bind_stmt_params(stmt: Statement, params: dict | None) -> Statement:
    """Bind $params in EVERY expression position (filters, lets, agg
    args, propsets, get items, instance values). Operates on the deep
    copy run_script makes, never the caller's parsed Statements — a
    parsed script must be reusable with different params."""
    p = params or {}
    stmt.filters = [gql.bind_params(f2, p) for f2 in stmt.filters]
    stmt.having = [gql.bind_params(h, p) for h in stmt.having]
    stmt.node_constraints = [
        (a, gql.bind_params(ex, p)) for a, ex in stmt.node_constraints
    ]
    stmt.lets = {k: gql.bind_params(v, p) for k, v in stmt.lets.items()}
    stmt.aggs = {
        k: (aliases, fn, [gql.bind_params(a, p) for a in args])
        for k, (aliases, fn, args) in stmt.aggs.items()
    }
    stmt.propsets = [
        (alias, prop, gql.bind_params(ex, p)) for alias, prop, ex in stmt.propsets
    ]
    if stmt.gets:
        stmt.gets = [(gql.bind_params(g, p), al) for g, al in stmt.gets]
    stmt.group_filters = [
        ("topk", gf[1], [(gql.bind_params(ex, p), asc) for ex, asc in gf[2]], gf[3])
        if gf[0] == "topk"
        else gf
        for gf in stmt.group_filters
    ]
    for ni in stmt.node_instances:
        ni.value = [(k, gql.bind_params(ex, p)) for k, ex in ni.value]
    for ei in stmt.edge_instances:
        ei.value = [(k, gql.bind_params(ex, p)) for k, ex in ei.value]
    return stmt


def _collect_refs(ex, out: set) -> None:
    """Every ("ref", alias, prop) pair inside an expression AST."""
    if isinstance(ex, tuple) and ex and ex[0] == "ref":
        out.add((ex[1], ex[2]))
        return
    items = ex if isinstance(ex, list) else (
        ex[1:] if isinstance(ex, tuple) else ()
    )
    for a in items:
        if isinstance(a, (tuple, list)):
            _collect_refs(a, out)


def _having_cols(stmt: Statement, lets, cols: set, group_keys: list):
    """Aggregate columns a HAVING pass needs beyond the Define's own
    outputs: the referenced group() lets (aliased ``<name>__vid`` so the
    plain ref compiles against the post-agg frame) and any per-group
    property refs (carried via F.min — constant within a group for
    subject/object properties)."""
    if not stmt.having:
        return []
    refs: set = set()
    for h in stmt.having:
        _collect_refs(_inline_lets(h, lets), refs)
    extra = []
    for alias, prop in sorted(refs, key=str):
        if prop is None and alias in stmt.aggs:
            _aliases, fn, args = stmt.aggs[alias]
            args = [_inline_lets(a, lets) for a in args]
            extra.append(_agg_column(fn, args, cols).alias(f"{alias}__vid"))
            continue
        col = f"{alias}__{prop}" if prop else f"{alias}__vid"
        if col in cols and col not in group_keys:
            extra.append(F.min(col).alias(col))
    return extra


def _apply_having(stmt: Statement, lets, out: DataFrame) -> DataFrame:
    if not stmt.having:
        return out
    ocols = set(out.columns)
    for h in stmt.having:
        out = out.where(gql._compile_expr(_inline_lets(h, lets), ocols))
    return out


def _refs_agg_let(ex, aggs: dict) -> bool:
    """True when the expression references a bare name bound by a
    ``group()`` aggregation (``("ref", name, None)`` with name in aggs)."""
    if isinstance(ex, (list,)):
        return any(_refs_agg_let(a, aggs) for a in ex)
    if not isinstance(ex, tuple):
        return False
    if ex[0] == "ref" and ex[2] is None and ex[1] in aggs:
        return True
    return any(
        _refs_agg_let(a, aggs) for a in ex[1:] if isinstance(a, (tuple, list))
    )


def _matched(stmt: Statement, graph: gql.PropertyGraph) -> DataFrame:
    """Traverse the GraphStructure pattern with Rule filters placed as
    early as their columns bind (the gql planner does the placement);
    optional edges left-join afterwards in declaration order, and
    conjuncts touching optional aliases apply after those joins (SQL
    3-valued: a NULL comparison is false — exists()/exist() make the
    presence test explicit, TransitiveOptionalTest.java:1161)."""
    lets = _resolve_lets(stmt)
    q = stmt.query
    q.where = None
    conj = [_inline_lets(f2, lets) for f2 in stmt.filters]
    node_cons = [
        (a, _inline_lets(ex, lets)) for a, ex in stmt.node_constraints
    ]
    post: list = []
    opt_cons: dict[str, list] = {}
    all_nodes = dict(q.nodes)
    if stmt.optional_edges:
        # an alias whose only pattern connections are optional edges
        # binds through the left joins; the root always scans mandatory
        mand = {a for e in q.edges for a in (e.src, e.dst)}
        if stmt.root is not None:
            mand.add(stmt.root)
        opt_only = {
            a
            for e in stmt.optional_edges
            for a in (e.src, e.dst)
            if a not in mand
        }
        q.nodes = {a: n for a, n in q.nodes.items() if a not in opt_only}
        if not q.nodes:
            raise ValueError(
                "every pattern edge is optional and no __start__ root is "
                "set — mark one alias __start__='true' or make an edge "
                "mandatory"
            )
        # Rule conjuncts touching optional aliases (node OR edge) apply
        # after the left joins, with SQL 3-valued semantics (write
        # `not exist(B) or ...` for the maybe-absent case)
        opt_names = opt_only | {
            e.alias for e in stmt.optional_edges if e.alias
        }
        keep = []
        for c in conj:
            refs = {
                r.split("__", 1)[0] for r in gql._expr_refs(c, set())
            }
            (post if refs & opt_names else keep).append(c)
        conj = keep
        # declaration constraints on an optional-only alias are PATTERN
        # constraints: they filter the left join's right side, so an
        # unmatched row keeps its NULLs instead of being dropped
        remaining_cons = []
        for a, ex in node_cons:
            if a in opt_only:
                opt_cons.setdefault(a, []).append(ex)
            else:
                remaining_cons.append((a, ex))
        node_cons = remaining_cons
    conj = conj + [ex for _a, ex in node_cons]
    for c in conj:
        q.where = c if q.where is None else ("bin", "and", q.where, c)
    df = gql._traverse(q, graph, root=stmt.root)
    for e in stmt.optional_edges:
        df = _optional_join(df, e, all_nodes, graph, opt_cons)
    # a BARE optional-edge-alias ref (exist(e1)) reads the edge's src
    # marker column — NULL exactly when the left join found no match
    opt_edge_aliases = {e.alias for e in stmt.optional_edges if e.alias}

    def _fix_bare_edge(c):
        if not isinstance(c, tuple):
            return c
        if c[0] == "ref" and c[2] is None and c[1] in opt_edge_aliases:
            return ("ref", c[1], "src")
        return tuple(
            _fix_bare_edge(x) if isinstance(x, tuple) else (
                [_fix_bare_edge(y) for y in x] if isinstance(x, list) else x
            )
            for x in c
        )

    for c in post:
        df = df.where(gql._compile_expr(_fix_bare_edge(c), set(df.columns)))
    for gf in stmt.group_filters:
        df = _apply_group_filter(df, gf, lets)
    return df


def _optional_join(
    df: DataFrame,
    e: gql.EdgePat,
    nodes: dict,
    graph: gql.PropertyGraph,
    opt_cons: dict | None = None,
) -> DataFrame:
    """Left-join one optional edge (plus its unbound endpoint's vertex
    table) onto the binding table — the Optional operator as an outer
    join; an unmatched row keeps NULLs for the edge/endpoint columns."""
    if e.is_varlen:
        raise SyntaxError(
            "optional var-len edges are not supported — make the hop "
            "mandatory or bound"
        )
    edf = gql.edge_frame(e, graph)
    srcc, dstc = "__os__", "__od__"
    sel = [F.col("src").alias(srcc), F.col("dst").alias(dstc)]
    if e.alias:
        # src/dst ride along under the alias so exist(e1) has a NULL
        # marker even for property-less edge tables
        sel += [
            F.col(c).alias(f"{e.alias}__{c}") for c in edf.columns
        ]
    right = edf.select(*sel)
    have_src = f"{e.src}__vid" in df.columns
    have_dst = f"{e.dst}__vid" in df.columns
    if not have_src and not have_dst:
        raise ValueError(
            f"optional edge {e.src}->{e.dst} has no bound endpoint — "
            "declare optional edges so each chains off a bound alias"
        )
    # bind the free endpoint's vertex table INTO the right side first,
    # so one left join brings edge + vertex (or all-NULL together)
    for alias, col in ((e.src, srcc), (e.dst, dstc)):
        if f"{alias}__vid" in df.columns:
            continue
        label = nodes[alias].label if alias in nodes else None
        vt = graph.vertex_table(label)
        renamed = vt.select(
            *[F.col(c).alias(f"{alias}__{c}") for c in vt.columns]
        )
        # the alias's declaration constraints filter the RIGHT side
        for ex in (opt_cons or {}).get(alias, ()):
            renamed = renamed.where(
                gql._compile_expr(ex, set(renamed.columns))
            )
        right = right.join(
            renamed, F.col(col) == F.col(f"{alias}__vid")
        )
    cond = None
    if have_src:
        cond = F.col(f"{e.src}__vid") == F.col(srcc)
    if have_dst:
        c2 = F.col(f"{e.dst}__vid") == F.col(dstc)
        cond = c2 if cond is None else (cond & c2)
    return df.join(right, cond, "left").drop(srcc, dstc)


def _apply_group_filter(df: DataFrame, gf, lets: dict) -> DataFrame:
    """Per-group row filters from group() rules: top-k by sort exprs
    (OrderAndSliceBlock analog — row_number window) or keep longest/
    shortest var-len paths (keep_*_path UDAF semantics — min/max window
    on path length). Window, not groupBy: the surviving rows keep every
    bound column."""
    from pyspark.sql import Window

    cols = set(df.columns)
    keys = [f"{a}__vid" for a in gf[1]]
    for k in keys:
        if k not in cols:
            raise ValueError(f"group() alias {k.split('__')[0]!r} is not bound")
    if gf[0] == "topk":
        _, _aliases, sorts, limit = gf
        order = []
        for ex, asc in sorts:
            c = gql._compile_expr(_inline_lets(ex, lets), cols)
            order.append(c.asc() if asc else c.desc())
        # deterministic tie-break: the other vid columns + var-len hop
        # counts, ascending (rows identical on every vid can still differ
        # by path length)
        ties = [
            F.col(c).asc()
            for c in sorted(cols)
            if (c.endswith("__vid") and c not in keys) or c.endswith("__hops")
        ]
        if not order and not ties:
            raise ValueError(
                "group().limit(k) needs at least one asc()/desc() sort "
                "expression (or a non-key alias) to order rows "
                "deterministically"
            )
        w = Window.partitionBy(*keys).orderBy(*order, *ties)
        return (
            df.withColumn("__rn__", F.row_number().over(w))
            .where(F.col("__rn__") <= limit)
            .drop("__rn__")
        )
    _, _aliases, edge_alias, which = gf
    path_col = f"{edge_alias}__path"
    if path_col not in cols:
        raise ValueError(
            f"keep_{which}_path: {edge_alias!r} is not a bound var-len edge"
        )
    ln = F.size(F.col(path_col))
    w = Window.partitionBy(*keys)
    target = F.max(ln).over(w) if which == "longest" else F.min(ln).over(w)
    return df.withColumn("__m__", target).where(ln == F.col("__m__")).drop("__m__")


def _run_define(
    stmt: Statement, graph: gql.PropertyGraph, df: DataFrame
) -> tuple[str, DataFrame]:
    head = stmt.define
    assert head is not None
    lets = _resolve_lets(stmt)
    cols = set(df.columns)
    skey = f"{head.subj}__vid"

    if head.is_property:
        # AddProperty: one value per subject. Target value comes from the
        # ``o = ...`` rule line — a group() aggregation (directly, or
        # through a let: `num = group(s).count(d); o = num`, the
        # KgReasonerLeadToTest addVertexTest1 shape) or an expression.
        agg_name = head.obj if head.obj in stmt.aggs else None
        if agg_name is None and head.obj in stmt.lets:
            tgt = stmt.lets[head.obj]
            if tgt[0] == "ref" and tgt[2] is None and tgt[1] in stmt.aggs:
                agg_name = tgt[1]
        if agg_name is not None:
            aliases, fn, args = stmt.aggs[agg_name]
            bad = [a for a in aliases if a != head.subj]
            if bad:
                raise ValueError(
                    f"Define {head.pred}: AddProperty must group by the "
                    f"subject alias {head.subj!r} only, got group"
                    f"({', '.join(aliases)}) — extra keys would produce "
                    "several values per vertex (use an entity object type "
                    "for per-pair results)"
                )
            args = [_inline_lets(a, lets) for a in args]
            out = df.groupBy(skey).agg(
                _agg_column(fn, args, cols).alias(head.pred),
                *_having_cols(stmt, lets, cols, [skey]),
            )
            out = _apply_having(stmt, lets, out)
            return head.pred, out.select(F.col(skey).alias("vid"), head.pred)
        if head.obj in lets:
            val = gql._compile_expr(lets[head.obj], cols)
        else:
            target = next(
                (ex for a, p2, ex in stmt.propsets if a == head.obj), None
            )
            if target is None:
                if head.concept_instance is not None:
                    # belongTo-style Define with no `o = ...` line: every
                    # matching subject gets the concept instance itself
                    val = F.lit(head.concept_instance)
                else:
                    raise ValueError(
                        f"Define {head.pred}: no `{head.obj} = ...` rule line"
                    )
            else:
                val = gql._compile_expr(_inline_lets(target, lets), cols)
        out = df.select(F.col(skey).alias("vid"), val.alias(head.pred))
        # deterministic collapse if the pattern fans out (single-node
        # patterns — the common case — are 1 row per subject already)
        return head.pred, out.groupBy("vid").agg(
            F.min(head.pred).alias(head.pred)
        )

    # AddPredicate: derived edge (subject)-[pred]->(object alias); edge
    # properties from ``p.x = ...`` lines (aggregated per (s,o) pair).
    okey = f"{head.obj}__vid"
    if okey not in cols or head.obj not in stmt.body_aliases:
        raise ValueError(
            f"Define {head.pred}: object alias {head.obj!r} must appear in "
            f"the GraphStructure pattern (pre-binding from the head alone "
            f"does not place it; declare ({head.obj}) or connect it with "
            f"an edge)"
        )
    group_keys = [skey, okey]
    agg_cols = []
    keep_props: list[str] = []
    plain_sets = []
    for alias, prop, ex in stmt.propsets:
        if alias != head.pred_alias:
            continue
        if ex[0] == "ref" and ex[1] == "__agg__":
            aliases, fn, args = stmt.aggs[ex[2]]
            args = [_inline_lets(a, lets) for a in args]
            agg_cols.append(_agg_column(fn, args, cols).alias(prop))
            keep_props.append(prop)
        else:
            plain_sets.append((prop, _inline_lets(ex, lets)))
    # let-only aggs assigned via `x = group(...)...; p.y = x`
    for prop, ex in list(plain_sets):
        if ex[0] == "ref" and ex[2] is None and ex[1] in stmt.aggs:
            aliases, fn, args = stmt.aggs[ex[1]]
            args = [_inline_lets(a, lets) for a in args]
            agg_cols.append(_agg_column(fn, args, cols).alias(prop))
            keep_props.append(prop)
            plain_sets.remove((prop, ex))
    if plain_sets:
        # non-aggregated props: compute per row, take per-pair min for a
        # deterministic value when the pattern fans out
        exprs = [
            gql._compile_expr(ex, cols).alias(prop) for prop, ex in plain_sets
        ]
        df = df.select(*df.columns, *exprs)
        cols = set(df.columns)
        agg_cols.extend(F.min(prop).alias(prop) for prop, _ in plain_sets)
        keep_props.extend(prop for prop, _ in plain_sets)
    extra = _having_cols(stmt, lets, cols, group_keys)
    out = (
        df.groupBy(*group_keys).agg(*agg_cols, *extra)
        if (agg_cols or extra)
        else df.select(*group_keys).dropDuplicates()
    )
    out = _apply_having(stmt, lets, out)
    out = out.select(
        F.col(skey).alias("src"),
        F.col(okey).alias("dst"),
        *[c for c in out.columns if c in keep_props],
    )
    return head.pred, out


def _collapse_key(df: DataFrame, keys: list[str]) -> DataFrame:
    """One row per key with deterministic property values (F.min), the
    same collapse rule _run_define uses — dropDuplicates would pick an
    arbitrary row's values when a value= expression depends on other
    pattern aliases, making graph/TableStore contents nondeterministic."""
    props = [c for c in df.columns if c not in keys]
    if not props:
        return df.distinct()
    return df.groupBy(*keys).agg(*[F.min(p).alias(p) for p in props])


def _run_action_ddl(
    stmt: Statement, df: DataFrame, graph: gql.PropertyGraph
) -> dict[str, tuple[str, DataFrame]]:
    """createNodeInstance / createEdgeInstance over the matched rows
    (AddVertex / AddPredicate, ResultBlock.scala:97-112). New vertices
    get ``vid = xxhash64(id)`` — the reference's hash64 biz-id scheme
    (IVertexId, common/graph/vertex/impl/VertexId.java:30-32)."""
    cols = set(df.columns)
    ddl: dict[str, tuple[str, DataFrame]] = {}  # type -> ("vertex"|"edge", df)
    var_vid: dict[str, Column] = {}
    # value= expressions may reference Rule/Constraint-block lets
    # (supplychain concept.rule: `eventName = concat(...)` then
    # `name=eventName` in createNodeInstance)
    lets = _resolve_lets(stmt)
    stmt = dataclasses.replace(
        stmt,
        node_instances=[
            dataclasses.replace(
                ni, value=[(p, _inline_lets(ex, lets)) for p, ex in ni.value]
            )
            for ni in stmt.node_instances
        ],
        edge_instances=[
            dataclasses.replace(
                ei, value=[(p, _inline_lets(ex, lets)) for p, ex in ei.value]
            )
            for ei in stmt.edge_instances
        ],
    )
    for ni in stmt.node_instances:
        exprs = [gql._compile_expr(ex, cols).alias(p) for p, ex in ni.value]
        id_expr = next(
            (gql._compile_expr(ex, cols) for p, ex in ni.value if p == "id"),
            None,
        )
        if id_expr is None:
            if not ni.value:
                raise ValueError(
                    f"createNodeInstance(type={ni.type}) needs an id= "
                    "entry or at least one value= property"
                )
            # no id= (supplychain concept.rule event instances): identity
            # is a deterministic content hash over type + every property
            # — same properties, same vertex, so re-running the rule
            # upserts instead of duplicating (the reference server
            # assigns event instance ids internally). to_json gives a
            # canonical null-safe encoding: separators are escaped and
            # null fields stay distinguishable (concat_ws would drop
            # nulls and let ('a|b','c') collide with ('a','b|c')).
            id_expr = F.to_json(
                F.struct(
                    F.lit(ni.type).alias("__type__"),
                    *[
                        gql._compile_expr(ex, cols).cast("string").alias(p)
                        for p, ex in sorted(ni.value, key=lambda pv: pv[0])
                    ],
                ),
                {"ignoreNullFields": "false"},  # keep nulls distinguishable
            )
            exprs = [id_expr.alias("id"), *exprs]
        vid = F.xxhash64(id_expr.cast("string"))
        nd = _collapse_key(df.select(vid.alias("vid"), *exprs), ["vid"])
        ddl[ni.type] = ("vertex", nd)
        if ni.type in graph.vertices:
            # vid-keyed UPSERT (TableStore convention): re-running the
            # rule — e.g. a concept_rules fixpoint round — replaces the
            # instance instead of duplicating it. Column-wise MERGE, not
            # row replace: an enrichment delta that sets only some
            # properties must not null out the row's other properties.
            base = graph.vertices[ni.type]
            delta = nd
            shared = [c for c in delta.columns if c in base.columns and c != "vid"]
            new_only = [c for c in delta.columns if c not in base.columns]
            delta = delta.select(
                "vid",
                *[F.col(c).alias(f"__new_{c}__") for c in shared],
                *new_only,
            )
            merged = base.join(delta, "vid", "full").select(
                "vid",
                *[
                    F.coalesce(f"__new_{c}__", c).alias(c)
                    if c in shared
                    else F.col(c)
                    for c in base.columns
                    if c != "vid"
                ],
                *new_only,
            )
            nd = merged
        graph.vertices[ni.type] = nd
        if ni.var:
            var_vid[ni.var] = vid
    for ei in stmt.edge_instances:
        def endpoint(name: str) -> Column:
            if name in var_vid:
                return var_vid[name]
            col = f"{name}__vid"
            if col not in cols:
                raise ValueError(
                    f"createEdgeInstance: {name!r} is neither a pattern "
                    "alias nor a created node variable"
                )
            return F.col(col)

        exprs = [gql._compile_expr(ex, cols).alias(p) for p, ex in ei.value]
        ed = _collapse_key(
            df.select(
                endpoint(ei.src).alias("src"),
                endpoint(ei.dst).alias("dst"),
                *exprs,
            ),
            ["src", "dst"],
        )
        ddl[ei.type] = ("edge", ed)
        if ei.type in graph.edges:
            # (src, dst)-keyed upsert matching the TableStore edge_key —
            # column-wise merge like the vertex path
            base = graph.edges[ei.type]
            shared = [
                c for c in ed.columns
                if c in base.columns and c not in ("src", "dst")
            ]
            new_only = [c for c in ed.columns if c not in base.columns]
            delta = ed.select(
                "src", "dst",
                *[F.col(c).alias(f"__new_{c}__") for c in shared],
                *new_only,
            )
            ed = base.join(delta, ["src", "dst"], "full").select(
                "src", "dst",
                *[
                    F.coalesce(f"__new_{c}__", c).alias(c)
                    if c in shared
                    else F.col(c)
                    for c in base.columns
                    if c not in ("src", "dst")
                ],
                *new_only,
            )
        graph.edges[ei.type] = ed
    return ddl


def run_script(
    text: str | list[Statement],
    graph: gql.PropertyGraph,
    params: dict | None = None,
    store=None,
) -> KgdslResult:
    """Execute a KGDSL script: Defines (in dependency order) extend the
    working graph with derived properties/edges; the final
    GraphStructure/Rule/Action statement's ``get`` produces the result
    table; create*Instance DDL applies to the graph and, when a
    ``linkgraph.tables.TableStore`` is passed, upserts each delta
    (vertices keyed on vid; edges on an xxhash64(src,dst) edge_key)."""
    import copy

    stmts = parse_script(text) if isinstance(text, str) else text
    # deep copy before binding: the ASTs hold only tuples/dataclasses (no
    # DataFrames), and a parsed script must stay reusable with other params
    stmts = [copy.deepcopy(s) for s in stmts]
    stmts = _toposort([_bind_stmt_params(s, params) for s in stmts])
    g = gql.PropertyGraph(dict(graph.vertices), dict(graph.edges))
    table: DataFrame | None = None
    ddl: dict[str, DataFrame] = {}

    def persist_ddl(new: dict[str, tuple[str, DataFrame]]) -> None:
        for typ, (kind, frame) in new.items():
            ddl[typ] = frame
            if store is None:
                continue
            if kind == "edge":
                keyed = frame.withColumn(
                    "edge_key",
                    F.xxhash64(
                        F.col("src").cast("string"), F.col("dst").cast("string")
                    ),
                )
                store.upsert(f"edges_{typ}", keyed, "edge_key")
            else:
                store.upsert(f"vertices_{typ}", frame, "vid")

    for stmt in stmts:
        if stmt.define is None and (stmt.aggs or stmt.propsets):
            # an unnamed `x.y == v` line normalizes to `x.y = v` and would
            # otherwise be silently dropped as a propset — refuse loudly
            raise ValueError(
                "property assignments / group() aggregations are only "
                "meaningful inside a Define block; for a filter write a "
                "named rule, e.g. `R0: t.amount == 100`"
            )
        df = _matched(stmt, g)
        if stmt.define is not None:
            name, out = _run_define(stmt, g, df)
            head = stmt.define
            if head.is_property:
                if head.subj_label not in g.vertices:
                    raise ValueError(
                        f"Define {name}: unknown vertex label {head.subj_label!r}"
                    )
                base = g.vertices[head.subj_label]
                if name in base.columns:
                    if head.concept:
                        # several concept Defines share one pred (e.g.
                        # belongTo, one per instance): merge — this
                        # rule's value where it matched, the earlier
                        # rules' classifications preserved elsewhere
                        prev = base.select(
                            "vid", F.col(name).alias("__prev__")
                        )
                        out = (
                            out.join(prev, "vid", "full")
                            .select(
                                "vid",
                                F.coalesce(name, "__prev__").alias(name),
                            )
                        )
                    base = base.drop(name)  # non-concept re-Define = overwrite
                g.vertices[head.subj_label] = base.join(out, "vid", "left")
                if head.concept and name in ddl:
                    ddl[name] = ddl[name].unionByName(
                        out, allowMissingColumns=True
                    ).dropDuplicates()
                else:
                    ddl[name] = out
                if head.concept and head.pred == "belongTo" and (
                    head.concept_instance is not None
                ):
                    # dynamic taxonomy (DefineDynamicTaxonomyRequest,
                    # concept_rule_ml.py:200-210): a belongTo Define ALSO
                    # registers the matching subjects as members of the
                    # concept type, so a later statement's concept-
                    # qualified pattern ((x:`Type`/`inst`)) binds them
                    members = g.vertices[head.subj_label].join(
                        out.where(
                            F.col(name) == head.concept_instance
                        ).select("vid"),
                        "vid",
                    )
                    if "concept" in members.columns:
                        members = members.drop("concept")
                    members = members.withColumn(
                        "concept", F.lit(head.concept_instance)
                    )
                    existing = g.vertices.get(head.obj_type)
                    if existing is not None:
                        # re-registration upserts: drop the stale rows for
                        # these (vid, concept) pairs so a fixpoint re-run
                        # never duplicates members
                        existing = existing.join(
                            members.select("vid", "concept"),
                            ["vid", "concept"],
                            "left_anti",
                        )
                        members = existing.unionByName(
                            members, allowMissingColumns=True
                        )
                    g.vertices[head.obj_type] = members
            else:
                g.edges[name] = out
                ddl[name] = out
        if stmt.node_instances or stmt.edge_instances:
            # Action DDL applies in Define blocks too
            # (KgReasonerLeadToTest addVertexTest1 shape)
            persist_ddl(_run_action_ddl(stmt, df, g))
        if stmt.gets:
            lets = _resolve_lets(stmt)
            cols = set(df.columns)
            sel = []
            for ex, alias in stmt.gets:
                # name BEFORE inlining so get(x) of a let `x = ...` keeps
                # the let's name as the output column
                if alias is not None:
                    nm = alias
                elif ex[0] == "ref" and ex[2] is None and ex[1] in lets:
                    nm = ex[1]
                elif ex[0] == "ref":
                    nm = f"{ex[1]}_{ex[2]}" if ex[2] else ex[1]
                else:
                    nm = f"col{len(sel)}"
                ex = _inline_lets(ex, lets)
                sel.append(gql._compile_expr(ex, cols).alias(nm))
            table = df.select(*sel)
            if stmt.view_cols is not None:
                if len(stmt.view_cols) != len(sel):
                    raise ValueError(
                        f".as() names {len(stmt.view_cols)} columns but "
                        f"get() has {len(sel)} items"
                    )
                table = table.toDF(*stmt.view_cols)
            if stmt.embedded_sql is not None:
                # get(...).sql(>>> ... <<<): the result registers as a
                # temp view (named by .as(name(...)), default 'view') and
                # the embedded SQL — Catalyst-native — becomes the result
                view = stmt.view_name or "view"
                table.createOrReplaceTempView(view)
                table = table.sparkSession.sql(stmt.embedded_sql)
            elif stmt.view_name is not None:
                table.createOrReplaceTempView(stmt.view_name)
    return KgdslResult(table=table, graph=g, ddl=ddl)
