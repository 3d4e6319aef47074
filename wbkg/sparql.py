"""SPARQL basic-graph-pattern queries compiled to DataFrame plans.

The reference talks SPARQL in two places: outbound lookups against the
public Wikidata endpoint (ref src/linker.py:184-199 — a network boundary
this engine replaces with the dictionary join, SURVEY §2.3) and sanitizing
entity text so it is SPARQL/Turtle-safe (ref src/utils.py:4-40, ported as
P3). The graph it *builds* is an rdflib Graph, and rdflib's own query
surface is SPARQL — so a user coming from the reference expects to ask the
finished KG SPARQL questions. This module gives the edges table that
surface, Spark-first: a SELECT over a basic graph pattern is parsed into
triple patterns and compiled to scans + equi-joins that Catalyst/AQE then
reorder and broadcast like any other relational plan.

Supported grammar (the BGP core that covers rdflib-demo-style queries):

    PREFIX pfx: <iri>
    SELECT [DISTINCT] ?a ?b | * | (COUNT([DISTINCT] ?v|*) AS ?c)
           | (MIN/MAX/SUM/AVG(?v) AS ?m)
    WHERE { s p o . s2 p2 o2 . ...
            OPTIONAL { s3 p3 o3 . ... } }   # `a` == rdf:type
    WHERE { { ... } UNION { ... } }         # top-level alternation
    WHERE { ... VALUES ?v { "a" <iri:b> } }  # inline bindings
    ASK [WHERE] { ... }                      # sparql_ask -> bool
    WHERE { ... FILTER [NOT] EXISTS { ... } }  # semi/anti join gate
    WHERE { ... MINUS { ... } }             # anti join; disjoint = identity
    GROUP BY ?a [?b ...]
    ORDER BY ?a [ASC(?b)|DESC(?b) ...]
    LIMIT n

Terms: ?var, <iri>, pfx:local, "literal". OPTIONAL groups compile to left
joins on the shared variables; top-level UNION branches compile
independently and unionByName on the variable union (unbound -> null,
bag semantics). FILTER(...) supports comparisons
(= != < <= > >=, lexical string order — this graph stores strings),
REGEX(?v, "pat"), BOUND(?v), CONTAINS/STRSTARTS/STRENDS(?v, "s")
and && || ! ( ), compiled to Column
predicates applied over the joined pattern block — Catalyst then pushes
the sargable ones down into the scans on its own. sparql_construct gives
the CONSTRUCT verb (template-projected triple set). No property paths —
those are the DataFrame API's job (wbkg/query.py's BFS); the point here
is parity for the common "pattern-match the graph" ask, not a SPARQL
engine.

Plan shape at 100 TB: each triple pattern becomes one scan of the edges
table with its constant terms pushed down as filters — a constant predicate
prunes whole partitions under the --partition-edges-by-pred layout
(wbkg/job.py) — and shared variables become join keys. Catalyst sees an
ordinary star/chain join over one physical table: AQE picks
broadcast-vs-shuffle per pattern from runtime sizes, so a selective pattern
(rare predicate) broadcasts into the big ones. Variables repeated inside a
single pattern compile to an intra-scan equality filter, not a join.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE_IRI = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_TOKEN = re.compile(
    r"""\?[A-Za-z_][\w]*   # variable
      | <[^>\s]*>          # iri
      | "(?:[^"\\]|\\.)*"  # literal
      | [A-Za-z_][\w-]*:[A-Za-z_][\w.-]*   # prefixed name
      | \ba\b              # rdf:type shorthand
      | [.{}/+^]""",
    re.X,
)


@dataclass
class _Term:
    kind: str  # "var" | "const"
    value: str


@dataclass
class _PathUnit:
    inverse: bool   # ^iri — swap subject/object
    iri: str        # constant predicate (property paths are IRI-only)
    plus: bool      # iri+ — one-or-more (transitive closure)


@dataclass
class _Path:
    """Predicate position holding a property path: units joined by '/'."""

    units: list

    # duck-type as a non-var term for code that only checks .kind
    kind = "path"
    value = None


class SparqlError(ValueError):
    pass


def _parse_term(tok: str, prefixes: dict[str, str]) -> _Term:
    if tok.startswith("?"):
        return _Term("var", tok[1:])
    if tok.startswith("<") and tok.endswith(">"):
        return _Term("const", tok[1:-1])
    if tok.startswith('"'):
        body = tok[1:-1]
        return _Term("const", re.sub(r'\\(["\\])', r"\1", body))
    if tok == "a":
        return _Term("const", RDF_TYPE_IRI)
    if ":" in tok:
        pfx, local = tok.split(":", 1)
        if pfx not in prefixes:
            raise SparqlError(f"undeclared prefix '{pfx}:' in {tok}")
        return _Term("const", prefixes[pfx] + local)
    raise SparqlError(f"cannot parse term: {tok}")


_FILTER_TOKEN = re.compile(
    r"""\?[A-Za-z_][\w]*
      | <[^>\s]*>
      | "(?:[^"\\]|\\.)*"
      | [A-Za-z_][\w-]*:[A-Za-z_][\w.-]*
      | (?i:REGEX|BOUND|CONTAINS|STRSTARTS|STRENDS)\b
      | !=|<=|>=|&&|\|\||[=<>!()]""",
    re.X,
)


class _FilterParser:
    """Recursive-descent parser for FILTER expressions -> pyspark Column.
    Grammar: or := and (|| and)* ; and := not (&& not)* ;
    not := '!' not | prim ; prim := '(' or ')' | REGEX(?v,"p") | BOUND(?v)
    | term cmp term."""

    def __init__(self, text: str, prefixes: dict[str, str], bound: set[str]):
        self.toks = _FILTER_TOKEN.findall(text)
        self.i = 0
        self.prefixes = prefixes
        self.bound = bound

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self):
        tok = self._peek()
        if tok is None:
            raise SparqlError("unexpected end of FILTER expression")
        self.i += 1
        return tok

    def _expect(self, tok: str):
        got = self._next()
        if got != tok:
            raise SparqlError(f"expected {tok!r} in FILTER, got {got!r}")

    def parse(self):
        col = self._or()
        if self._peek() is not None:
            raise SparqlError(f"trailing tokens in FILTER: {self.toks[self.i:]}")
        return col

    def _or(self):
        col = self._and()
        while self._peek() == "||":
            self._next()
            col = col | self._and()
        return col

    def _and(self):
        col = self._not()
        while self._peek() == "&&":
            self._next()
            col = col & self._not()
        return col

    def _not(self):
        if self._peek() == "!":
            self._next()
            return ~self._not()
        return self._prim()

    def _term_col(self, tok: str):
        t = _parse_term(tok, self.prefixes)
        if t.kind == "var":
            if t.value not in self.bound:
                raise SparqlError(f"unbound variable ?{t.value} in FILTER")
            return F.col(t.value)
        return F.lit(t.value)

    def _prim(self):
        tok = self._next()
        if tok == "(":
            col = self._or()
            self._expect(")")
            return col
        if tok.upper() == "REGEX":
            self._expect("(")
            target = self._term_col(self._next())
            pat_tok = self._next()
            if not pat_tok.startswith('"'):
                raise SparqlError("REGEX pattern must be a string literal")
            pat = _parse_term(pat_tok, self.prefixes).value
            self._expect(")")
            return target.rlike(pat)
        if tok.upper() in ("CONTAINS", "STRSTARTS", "STRENDS"):
            fn = tok.upper()
            self._expect("(")
            target = self._term_col(self._next())
            arg_tok = self._next()
            if not arg_tok.startswith('"'):
                raise SparqlError(f"{fn} needs a string literal second argument")
            arg = _parse_term(arg_tok, self.prefixes).value
            self._expect(")")
            if fn == "CONTAINS":
                return target.contains(arg)
            if fn == "STRSTARTS":
                return target.startswith(arg)
            return target.endswith(arg)
        if tok.upper() == "BOUND":
            self._expect("(")
            var = self._next()
            if not var.startswith("?"):
                raise SparqlError("BOUND takes a variable")
            col = self._term_col(var)
            self._expect(")")
            return col.isNotNull()
        left = self._term_col(tok)
        op = self._next()
        right = self._term_col(self._next())
        ops = {
            "=": lambda a, b: a == b,
            "!=": lambda a, b: a != b,
            "<": lambda a, b: a < b,
            "<=": lambda a, b: a <= b,
            ">": lambda a, b: a > b,
            ">=": lambda a, b: a >= b,
        }
        if op not in ops:
            raise SparqlError(f"unsupported FILTER operator {op!r}")
        return ops[op](left, right)


def _parse_patterns(block: str, prefixes: dict[str, str]):
    """Tokenize a braces-free pattern block and split on '.' TOKENS —
    splitting the raw string on '.' would cut IRIs like
    <http://schema.org/mentions> apart. The predicate position may be a
    property path (iri/iri sequence, iri+ closure, ^iri inverse)."""
    patterns, group = [], []
    for tok in _TOKEN.findall(block):
        if tok == ".":
            if group:
                patterns.append(group)
                group = []
        else:
            group.append(tok)
    if group:
        patterns.append(group)
    out = []
    for g in patterns:
        if len(g) < 3:
            raise SparqlError(f"triple pattern must have 3 terms: {g!r}")
        if len(g) == 3 and not any(t in "/+^" for t in g):
            out.append(tuple(_parse_term(t, prefixes) for t in g))
            continue
        out.append(
            (
                _parse_term(g[0], prefixes),
                _parse_path(g[1:-1], prefixes),
                _parse_term(g[-1], prefixes),
            )
        )
    return out


def _parse_path(mid: list, prefixes: dict[str, str]) -> _Path:
    """['^'] iri ['+'] ('/' ['^'] iri ['+'])* -> _Path. Property paths are
    IRI-only (SPARQL 1.1 §9); a variable inside a path is an error."""
    units, i = [], 0
    while i < len(mid):
        inv = False
        if mid[i] == "^":
            inv = True
            i += 1
        if i >= len(mid) or mid[i] in "/+^":
            raise SparqlError(f"malformed property path: {mid!r}")
        t = _parse_term(mid[i], prefixes)
        if t.kind != "const":
            raise SparqlError("property-path elements must be IRIs, not variables")
        i += 1
        plus = False
        if i < len(mid) and mid[i] == "+":
            plus = True
            i += 1
        units.append(_PathUnit(inv, t.value, plus))
        if i < len(mid):
            if mid[i] != "/" or i + 1 >= len(mid):
                raise SparqlError(f"malformed property path: {mid!r}")
            i += 1
    if not units:
        raise SparqlError(f"empty property path: {mid!r}")
    return _Path(units)


def _extract_filters(where: str):
    """Lift FILTER(...) blocks (balanced parens, string-literal aware) out
    of a pattern block. -> (residual_text, [filter_expr_text, ...])."""
    filters = []
    pat = re.compile(r"(?i)\bFILTER\s*\(")
    while True:
        m = pat.search(where)
        if not m:
            return where, filters
        depth, j, in_str, esc = 1, m.end(), False, False
        while j < len(where) and depth:
            c = where[j]
            if in_str:
                if esc:
                    esc = False
                elif c == "\\":
                    esc = True
                elif c == '"':
                    in_str = False
            else:
                if c == '"':
                    in_str = True
                elif c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
            j += 1
        if depth:
            raise SparqlError("unbalanced parentheses in FILTER")
        filters.append(where[m.end():j - 1])
        where = where[:m.start()] + " " + where[j:]


def _parse_group(text: str, prefixes: dict[str, str]):
    """One conjunctive group: lift OPTIONALs, VALUES and FILTERs, parse the
    rest as triple patterns. -> (patterns, optionals, filters, values).
    values: list of (var, [constants]) inline-binding restrictions."""
    optionals = []  # (patterns, filter_texts)

    def _lift(mo):
        body, opt_filters = _extract_filters(mo.group(1))
        optionals.append((_parse_patterns(body, prefixes), opt_filters))
        return " "

    required = re.sub(r"(?is)OPTIONAL\s*\{([^{}]*)\}", _lift, text)

    values = []

    def _lift_values(mo):
        var = mo.group(1)
        consts = []
        for tok in _TOKEN.findall(mo.group(2)):
            t = _parse_term(tok, prefixes)
            if t.kind != "const":
                raise SparqlError(f"VALUES for ?{var} must list constants, got {tok!r}")
            consts.append(t.value)
        if not consts:
            raise SparqlError(f"empty VALUES block for ?{var}")
        values.append((var, consts))
        return " "

    required = re.sub(r"(?is)VALUES\s+\?([\w]+)\s*\{([^{}]*)\}", _lift_values, required)

    exists_groups = []  # (mode: "exists"|"not_exists"|"minus", patterns)

    def _lift_exists(mo):
        mode = "not_exists" if mo.group(1) else "exists"
        inner = _parse_patterns(mo.group(2), prefixes)
        if not inner:
            raise SparqlError("empty EXISTS block")
        exists_groups.append((mode, inner))
        return " "

    required = re.sub(
        r"(?is)FILTER\s+(NOT\s+)?EXISTS\s*\{([^{}]*)\}", _lift_exists, required
    )

    def _lift_minus(mo):
        inner = _parse_patterns(mo.group(1), prefixes)
        if not inner:
            raise SparqlError("empty MINUS block")
        exists_groups.append(("minus", inner))
        return " "

    required = re.sub(r"(?is)\bMINUS\s*\{([^{}]*)\}", _lift_minus, required)
    if re.search(r"[{}]", required):
        raise SparqlError("unbalanced braces / nested groups not supported")
    required, filters = _extract_filters(required)
    patterns = _parse_patterns(required, prefixes)
    if not patterns:
        raise SparqlError("empty WHERE block")
    if any(not pats for pats, _f in optionals):
        raise SparqlError("empty OPTIONAL block")
    return patterns, optionals, filters, values, exists_groups


def _split_union(where: str):
    """Top-level `{ ... } UNION { ... }` bodies -> list of branch texts;
    None when the body is a plain (braceless-at-top-level) group. String-
    literal aware so quoted braces don't confuse the depth count."""
    s = where.strip()
    if not s.startswith("{"):
        return None
    branches, depth, start = [], 0, None
    in_str = esc = False
    pos, n = 0, len(s)
    while pos < n:
        c = s[pos]
        if in_str:
            if esc:
                esc = False
            elif c == "\\":
                esc = True
            elif c == '"':
                in_str = False
        elif c == '"':
            in_str = True
        elif c == "{":
            if depth == 0:
                start = pos + 1
            depth += 1
        elif c == "}":
            depth -= 1
            if depth < 0:
                raise SparqlError("unbalanced braces in WHERE")
            if depth == 0:
                branches.append(s[start:pos])
                start = None
        elif depth == 0 and not c.isspace():
            if s[pos:pos + 5].upper() == "UNION":
                pos += 5
                continue
            raise SparqlError(f"unexpected text between UNION branches: {s[pos:pos+20]!r}")
        pos += 1
    if depth:
        raise SparqlError("unbalanced braces in WHERE")
    if len(branches) < 2:
        raise SparqlError("UNION body needs at least two { } branches")
    return branches


def parse_sparql(query: str):
    """-> (select_vars | None for *, distinct, groups, prefixes,
    aggregates, group_vars, order_vars, limit). groups: one
    (patterns, optionals, filters, values, exists_groups) tuple per UNION
    branch (a plain WHERE body is one group); patterns: (subj, pred, obj)
    _Term triples; filters: raw FILTER expression strings (compiled against
    the bound variables in sparql_select); exists_groups: (negated,
    patterns) for FILTER [NOT] EXISTS; order_vars: (var, ascending)."""
    prefixes: dict[str, str] = {}
    for pfx, iri in re.findall(r"(?i)PREFIX\s+([A-Za-z_][\w-]*):\s*<([^>]*)>", query):
        prefixes[pfx] = iri
    body = re.sub(r"(?i)PREFIX\s+[A-Za-z_][\w-]*:\s*<[^>]*>", " ", query)

    m = re.search(
        r"(?is)SELECT\s+(DISTINCT\s+)?(.*?)\s*WHERE\s*\{(.*)\}\s*"
        r"(?:GROUP\s+BY\s+((?:\?[\w]+\s*)+))?\s*"
        r"(?:ORDER\s+BY\s+((?:(?:ASC|DESC)\s*\(\s*\?[\w]+\s*\)\s*|\?[\w]+\s*)+))?"
        r"\s*(?:LIMIT\s+(\d+))?\s*$",
        body.strip(),
    )
    if not m:
        raise SparqlError(
            "expected SELECT ... WHERE { ... } [GROUP BY ...] [ORDER BY ...] [LIMIT n]"
        )
    distinct = bool(m.group(1))
    sel_raw, where, group_raw, order_raw, limit = (
        m.group(2), m.group(3), m.group(4), m.group(5), m.group(6),
    )
    group_vars = [v[1:] for v in re.findall(r"\?[\w]+", group_raw or "")]

    # SELECT items: plain ?var or
    # (COUNT|MIN|MAX|SUM|AVG([DISTINCT] ?v|*) AS ?alias)
    _AGG = re.compile(
        r"(?is)\(\s*(COUNT|MIN|MAX|SUM|AVG)\s*\(\s*(DISTINCT\s+)?(\?[\w]+|\*)\s*\)\s+AS\s+\?([\w]+)\s*\)"
        r"|(\?[\w]+)"
    )
    if sel_raw.strip() == "*":
        select_vars = None
        aggregates = []
    else:
        select_vars, aggregates = [], []
        for am in _AGG.finditer(sel_raw):
            if am.group(5):
                select_vars.append(am.group(5)[1:])
            else:
                func, dist, target, alias = (
                    am.group(1).upper(), bool(am.group(2)), am.group(3), am.group(4),
                )
                if func != "COUNT" and target == "*":
                    raise SparqlError(f"{func}(*) is not valid SPARQL")
                aggregates.append(
                    (func, dist, None if target == "*" else target[1:], alias)
                )
        if not select_vars and not aggregates:
            raise SparqlError(f"empty SELECT clause: {sel_raw!r}")
    if aggregates and select_vars is not None:
        extra = [v for v in select_vars if v not in group_vars]
        if extra:
            raise SparqlError(
                f"non-aggregated SELECT variable(s) {extra} must appear in GROUP BY"
            )

    branch_texts = _split_union(where)
    groups = [_parse_group(t, prefixes) for t in (branch_texts or [where])]

    # ORDER BY items: ?v (ascending), ASC(?v), DESC(?v) -> (var, ascending)
    order_vars = [
        (am.group(2) or am.group(3), (am.group(1) or "ASC").upper() != "DESC")
        for am in re.finditer(
            r"(?is)(?:(ASC|DESC)\s*\(\s*\?([\w]+)\s*\))|\?([\w]+)", order_raw or ""
        )
    ]
    return (
        select_vars,
        distinct,
        groups,
        prefixes,
        aggregates,
        group_vars,
        order_vars,
        (int(limit) if limit else None),
    )


PATH_MAX_ITERS = 16


def _path_closure(step: DataFrame, max_iters: int = PATH_MAX_ITERS) -> DataFrame:
    """One-or-more transitive closure of a (a, b) edge set. Semi-naive with
    path DOUBLING: each round joins the new pairs against the accumulated
    closure, so reachable path length grows as 2^round — max_iters=16
    covers diameters past 65k, and a graph that still hasn't converged
    warns instead of silently truncating (same contract as
    connected_components). localCheckpoint per round truncates lineage;
    property-path graphs are vocabulary-bounded here (edges over a filtered
    predicate), not corpus-bounded."""
    base = step.distinct().localCheckpoint()
    total, frontier = base, base
    converged = False
    for _ in range(max_iters):
        # nonlinear seminaive: path(a,b) :- path(a,m), path(m,b) needs BOTH
        # delta-first and delta-second compositions for completeness
        nxt = (
            frontier.withColumnRenamed("b", "_m")
            .join(total.withColumnRenamed("a", "_m"), "_m")
            .select("a", "b")
            .unionByName(
                total.withColumnRenamed("b", "_m")
                .join(frontier.withColumnRenamed("a", "_m"), "_m")
                .select("a", "b")
            )
            .distinct()
        )
        new = nxt.join(total, ["a", "b"], "left_anti").localCheckpoint()
        if not new.take(1):
            converged = True
            break
        total = total.unionByName(new).localCheckpoint()
        frontier = new
    if not converged:
        import warnings

        warnings.warn(
            f"property-path closure did not converge within {max_iters} "
            "doubling rounds; results may be incomplete — raise "
            "PATH_MAX_ITERS for graphs of diameter beyond 2^16",
            RuntimeWarning,
            stacklevel=2,
        )
    return total


def _compile_path(edges: DataFrame, path: _Path) -> DataFrame:
    """Property path -> (a, b) pair DataFrame: each unit is a filtered scan
    of the edges table (constant predicate pushed down), '^' swaps the
    columns, '+' takes the transitive closure, '/' chains by equi-join."""
    pair = None
    for u in path.units:
        unit = edges.filter(F.col("pred") == u.iri).select(
            F.col("obj" if u.inverse else "subj").alias("a"),
            F.col("subj" if u.inverse else "obj").alias("b"),
        )
        if u.plus:
            unit = _path_closure(unit)
        if pair is None:
            pair = unit
        else:
            pair = (
                pair.withColumnRenamed("b", "_m")
                .join(unit.withColumnRenamed("a", "_m"), "_m")
                .select("a", "b")
            )
    return pair


def _compile_bgp(edges: DataFrame, patterns, tag: str):
    """Compile one conjunctive pattern group to (plan, bound_vars)."""
    bound: set[str] = set()
    plan: DataFrame | None = None
    gate_cols: list[str] = []
    for i, (s, p, o) in enumerate(patterns):
        if isinstance(p, _Path):
            scan = _compile_path(edges, p)
            pos_terms = (("a", s), ("b", o))
        else:
            scan = edges.select("subj", "pred", "obj")
            pos_terms = (("subj", s), ("pred", p), ("obj", o))
        cols, rename = [], {}
        for col, term in pos_terms:
            if term.kind == "const":
                scan = scan.filter(F.col(col) == term.value)
            else:
                if term.value in rename:  # repeated var inside one pattern
                    scan = scan.filter(F.col(col) == F.col(rename[term.value]))
                else:
                    rename[term.value] = col
                    cols.append(F.col(col).alias(term.value))
        # a fully-constant pattern is an existence gate, not a multiplier
        if not cols:
            gate = f"__wbkg_gate_{tag}{i}"
            gate_cols.append(gate)
            scan = scan.select(F.lit(1).alias(gate)).limit(1)
        else:
            scan = scan.select(*cols)
        if plan is None:
            plan, bound = scan, set(rename)
        else:
            keys = sorted(bound & set(rename))
            plan = plan.join(scan, keys) if keys else plan.crossJoin(scan)
            bound |= set(rename)
    # drop ONLY the gate markers we generated — '?_m0' is a legal SPARQL
    # variable a prefix-based drop would silently destroy
    plan = plan.drop(*gate_cols)
    return plan, bound


def sparql_select(edges: DataFrame, query: str) -> DataFrame:
    """Run a SPARQL BGP SELECT against an edges table with (subj, pred, obj)
    string columns. Returns one column per selected variable; variables bound
    only in an unmatched OPTIONAL group come back null, as in SPARQL."""
    (
        select_vars,
        distinct,
        groups,
        prefixes,
        aggregates,
        group_vars,
        order_vars,
        limit,
    ) = parse_sparql(query)

    def compile_group(gidx, patterns, optionals, filters, values, exists_groups):
        plan, bound = _compile_bgp(edges, patterns, f"u{gidx}r")
        for gi, (opt_patterns, opt_filters) in enumerate(optionals):
            opt_plan, opt_bound = _compile_bgp(edges, opt_patterns, f"u{gidx}o{gi}")
            # a FILTER inside OPTIONAL scopes to the optional group: it
            # applies BEFORE the left join (SPARQL 1.1 §8 leftjoin with
            # expression), so a failing filter nulls the optional columns
            # instead of dropping the outer row. Only inner-bound variables
            # are visible — the outer-var corner of the left-join scope
            # debate is rejected loudly, not silently misevaluated.
            for f_text in opt_filters:
                opt_plan = opt_plan.filter(
                    _FilterParser(f_text, prefixes, opt_bound).parse()
                )
            keys = sorted(bound & opt_bound)
            if not keys:
                raise SparqlError("OPTIONAL group shares no variable with the required patterns")
            plan = plan.join(opt_plan, keys, "left")
            bound |= opt_bound
        for gi, (mode, ex_patterns) in enumerate(exists_groups):
            # FILTER [NOT] EXISTS { ... } = semi/anti join on the shared
            # variables (rdflib/SPARQL 1.1 semantics: keep a binding iff
            # the inner group does/doesn't match under it). Semi/anti joins
            # never multiply rows, and Spark broadcasts the inner side when
            # it's small — the plan you'd want for a selective gate at scale.
            # MINUS differs from NOT EXISTS exactly when the groups share no
            # variable: MINUS then removes NOTHING (SPARQL 1.1 §8.3), while
            # NOT EXISTS without shared variables is rejected loudly.
            ex_plan, ex_bound = _compile_bgp(edges, ex_patterns, f"u{gidx}e{gi}")
            keys = sorted(bound & ex_bound)
            if not keys:
                if mode == "minus":
                    continue  # disjoint-domain MINUS is the identity
                raise SparqlError(
                    "FILTER EXISTS group shares no variable with the outer patterns"
                )
            plan = plan.join(
                ex_plan.select(*keys),
                keys,
                "left_semi" if mode == "exists" else "left_anti",
            )
        for var, consts in values:
            # inline bindings restrict an already-bound variable; isin is an
            # In predicate Catalyst pushes into the scans
            if var not in bound:
                raise SparqlError(f"VALUES variable ?{var} is not bound by the patterns")
            plan = plan.filter(F.col(var).isin(consts))
        for f_text in filters:
            # compiled AFTER the joins (group scope); Catalyst pushes
            # sargable predicates back down into the scans on its own
            plan = plan.filter(_FilterParser(f_text, prefixes, bound).parse())
        return plan, bound

    compiled = [compile_group(i, *g) for i, g in enumerate(groups)]
    bound = set().union(*(b for _p, b in compiled))
    # UNION branches align on the union of variables; a variable unbound in
    # a branch comes back null there (SPARQL bag-union semantics — no
    # implicit DISTINCT)
    all_vars = sorted(bound)
    aligned = [
        p.select(*[F.col(v) if v in b else F.lit(None).cast("string").alias(v) for v in all_vars])
        for p, b in compiled
    ]
    plan = aligned[0]
    for nxt in aligned[1:]:
        plan = plan.unionByName(nxt)

    if aggregates or group_vars:
        # grouped/aggregated query: Spark's partial-aggregation (map-side
        # combine before the group exchange) is exactly what a 100 TB
        # COUNT-per-group wants
        if select_vars is None:
            raise SparqlError("SELECT * cannot be combined with GROUP BY / aggregates")
        missing = [v for v in group_vars + [ov for ov, _a in order_vars]
                   if v not in bound and v not in [a[3] for a in aggregates]]
        missing += [t for _f, _d, t, _a in aggregates if t is not None and t not in bound]
        if missing:
            raise SparqlError(f"unbound variable(s) in GROUP BY/ORDER BY/aggregate: {missing}")
        agg_cols = []
        for func, dist, target, alias in aggregates:
            if func == "COUNT" and target is None:
                c = F.count(F.lit(1))
            elif func == "COUNT" and dist:
                c = F.count_distinct(F.col(target))
            elif func == "COUNT":
                c = F.count(F.col(target))
            elif func == "MIN":
                c = F.min(F.col(target))
            elif func == "MAX":
                c = F.max(F.col(target))
            elif func == "SUM":
                # the graph stores strings; numeric literals aggregate as
                # doubles (rdflib promotes the same way for mixed input)
                c = F.sum(F.col(target).cast("double"))
            else:
                c = F.avg(F.col(target).cast("double"))
            agg_cols.append(c.alias(alias))
        if agg_cols:
            out = plan.groupBy(*group_vars).agg(*agg_cols).select(
                *(select_vars + [a[3] for a in aggregates])
            )
        else:
            # GROUP BY with no aggregates = distinct group rows
            out = plan.select(*group_vars).dropDuplicates(group_vars).select(*select_vars)
        if distinct:
            out = out.distinct()
        if order_vars:
            out = out.orderBy(*_order_cols(order_vars))
        if limit is not None:
            out = out.limit(limit)
        return out

    if select_vars is None:
        select_vars = sorted(bound)
    missing = [v for v in select_vars + [ov for ov, _a in order_vars] if v not in bound]
    if missing:
        raise SparqlError(f"unbound variable(s) in SELECT/ORDER BY: {missing}")
    out = plan.select(*select_vars)
    if distinct:
        out = out.distinct()
    if order_vars:
        out = out.orderBy(*_order_cols(order_vars))
    if limit is not None:
        out = out.limit(limit)
    return out


def _order_cols(order_vars):
    """[(var, ascending)] -> orderBy columns (nulls first either way, like
    rdflib: unbound sorts lowest ascending — Spark's asc() default — and we
    pin desc() to nulls_last for the mirror image)."""
    return [
        F.col(v).asc() if asc else F.col(v).desc_nulls_last() for v, asc in order_vars
    ]


def sparql_construct(edges: DataFrame, query: str) -> DataFrame:
    """CONSTRUCT { template triples } WHERE { ... } -> an edges-shaped
    (subj, pred, obj) DataFrame: the rule-based materialization verb (e.g.
    derive inverse or shortcut edges from matched patterns). Template
    variables must be bound by the WHERE block; constants are allowed in
    any position. SPARQL graph semantics: the result is a triple SET
    (distinct), ready to union into the edges table.

    Compiles to: WHERE block via the SELECT machinery, one projection per
    template triple, unionByName, dropDuplicates — the same
    partial-aggregated dedup shuffle union_distinct uses at scale."""
    m = re.search(r"(?is)^(\s*(?:PREFIX[^\n]*\n?\s*)*)CONSTRUCT\s*\{(.*?)\}\s*(WHERE\s*\{.*)$", query.strip())
    if not m:
        raise SparqlError("expected CONSTRUCT { template } WHERE { ... }")
    prefixes = {
        pfx: iri
        for pfx, iri in re.findall(r"(?i)PREFIX\s+([A-Za-z_][\w-]*):\s*<([^>]*)>", m.group(1))
    }
    template = _parse_patterns(m.group(2), prefixes)
    if not template:
        raise SparqlError("empty CONSTRUCT template")
    if any(isinstance(t, _Path) for pat in template for t in pat):
        raise SparqlError("property paths are not allowed in a CONSTRUCT template")
    tmpl_vars = sorted(
        {t.value for pat in template for t in pat if t.kind == "var"}
    )
    inner = f"{m.group(1)} SELECT {' '.join('?' + v for v in tmpl_vars)} {m.group(3)}"
    bindings = sparql_select(edges, inner)

    frames = []
    for s, p, o in template:
        cols = [
            (F.col(t.value) if t.kind == "var" else F.lit(t.value)).alias(name)
            for name, t in (("subj", s), ("pred", p), ("obj", o))
        ]
        frames.append(bindings.select(*cols))
    out = frames[0]
    for nxt in frames[1:]:
        out = out.unionByName(nxt)
    return out.dropDuplicates(["subj", "pred", "obj"])


def sparql_ask(edges: DataFrame, query: str) -> bool:
    """ASK { patterns } / ASK WHERE { patterns } -> does any binding exist?
    Compiles to the SELECT machinery with LIMIT 1 — the scan stops at the
    first match (Spark's limit is pushed into the job as a take(1))."""
    m = re.search(r"(?is)^(\s*(?:PREFIX[^\n]*\n?\s*)*)ASK\s*(?:WHERE\s*)?(\{.*\})\s*$", query.strip())
    if not m:
        raise SparqlError("expected ASK [WHERE] { ... }")
    inner = f"{m.group(1)} SELECT * WHERE {m.group(2)} LIMIT 1"
    return len(sparql_select(edges, inner).take(1)) > 0
