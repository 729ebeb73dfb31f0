"""OTTL statement parser — the reference's transformation-language TEXT
surface compiled to Column operations.

Grammar per ``docs/processing.md:96-214`` (the OTTL design the collector's
transform processor implements): one function call per statement with an
optional ``where <boolean expression>`` clause; field paths navigate the
flattened signal (``attributes["k"]``, ``resource.attributes["k"]``,
``status.message``, ``name``); functions are the processing verbs
(``set``, ``delete``, ``keep_keys``, ``replace_match``,
``replace_all_matches``, ``truncate_all``, ``limit``, ``drop``).

Spark-first compilation: a statement list becomes a chain of narrow
Column projections — ``where`` clauses compile to boolean Columns and
mutations become per-row ``WHEN cond THEN new ELSE old`` so matching and
non-matching records flow through ONE plan (no split/union); ``drop()
where`` is a plain filter.  Everything stays inside whole-stage codegen;
no UDFs.

Examples (the doc's own)::

    delete(attributes["http.request.header.authorization"])
    keep_keys(attributes, "http.method", "http.status_code")
    replace_match(attributes["http.target"], "/user/*/list/*",
                  "/user/{userId}/list/{listId}")
    drop() where attributes["http.target"] = "/health"
    set(attributes["k8s_pod"], resource.attributes["k8s.pod.name"])
    set(severity_number, 17) where event_type == "error"
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .ottl import (_attr_struct, _parse_path, get_path, keep_keys,
                   limit_attributes, map_delete, map_put)


class OttlSyntaxError(ValueError):
    """Unparseable OTTL statement."""


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_TOKEN = re.compile(r"""
    (?P<ws>\s+)
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<number>-?\d+(?:\.\d+)?)
  | (?P<path>[A-Za-z_][A-Za-z0-9_.]*(?:\["(?:[^"\\]|\\.)*"\])?)
  | (?P<op>==|!=|>=|<=|=|>|<)
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<comma>,)
""", re.VERBOSE)


@dataclass
class _Tok:
    kind: str
    text: str


def _tokenize(s: str) -> list[_Tok]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m:
            raise OttlSyntaxError(f"bad OTTL syntax at {s[pos:pos + 20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append(_Tok(kind, m.group()))
    return out


def _unquote(text: str) -> str:
    return re.sub(r"\\(.)", r"\1", text[1:-1])


# ---------------------------------------------------------------------------
# where-expression compiler (recursive descent over the token list)
# ---------------------------------------------------------------------------

class _P:
    def __init__(self, toks: list[_Tok]):
        self.toks, self.i = toks, 0

    def peek(self) -> _Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> _Tok:
        t = self.peek()
        if t is None:
            raise OttlSyntaxError("unexpected end of OTTL expression")
        self.i += 1
        return t

    def expect(self, kind: str) -> _Tok:
        t = self.next()
        if t.kind != kind:
            raise OttlSyntaxError(f"expected {kind}, got {t.text!r}")
        return t

    # expr := and_expr ('or' and_expr)*
    def expr(self) -> Column:
        left = self.and_expr()
        while (t := self.peek()) and t.kind == "path" and t.text == "or":
            self.next()
            left = left | self.and_expr()
        return left

    def and_expr(self) -> Column:
        left = self.not_expr()
        while (t := self.peek()) and t.kind == "path" and t.text == "and":
            self.next()
            left = left & self.not_expr()
        return left

    def not_expr(self) -> Column:
        t = self.peek()
        if t and t.kind == "path" and t.text == "not":
            self.next()
            return ~self.not_expr()
        if t and t.kind == "lparen":
            self.next()
            e = self.expr()
            self.expect("rparen")
            return e
        return self.comparison()

    def comparison(self) -> Column:
        left = self.operand()
        t = self.peek()
        if t and t.kind == "op":
            self.next()
            right = self.operand()
            op = t.text
            if op in ("==", "="):
                return left == right
            if op == "!=":
                return left != right
            if op == ">":
                return left > right
            if op == "<":
                return left < right
            if op == ">=":
                return left >= right
            return left <= right
        return left.cast("boolean")

    def operand(self) -> Column:
        t = self.next()
        if t.kind == "string":
            return F.lit(_unquote(t.text))
        if t.kind == "number":
            return F.lit(float(t.text) if "." in t.text else int(t.text))
        if t.kind == "path":
            if t.text == "nil":
                return F.lit(None)
            if t.text in ("true", "false"):
                return F.lit(t.text == "true")
            # converter call in a condition: Name( args )
            nxt = self.peek()
            if nxt is not None and nxt.kind == "lparen" \
                    and t.text[:1].isupper():
                depth, parts = 0, [t.text]
                while True:
                    tok = self.next()
                    parts.append(tok.text)
                    if tok.kind == "lparen":
                        depth += 1
                    elif tok.kind == "rparen":
                        depth -= 1
                        if depth == 0:
                            break
                    elif tok.kind == "comma":
                        parts[-1] = ", "
                return _arg_value(_parse_arg("".join(parts)))
            return get_path(t.text)
        raise OttlSyntaxError(f"unexpected token {t.text!r} in expression")


def compile_condition(text: str) -> Column:
    """Compile a ``where`` boolean expression to a Column predicate."""
    p = _P(_tokenize(text))
    col = p.expr()
    if p.peek() is not None:
        raise OttlSyntaxError(f"trailing tokens after {p.peek().text!r}")
    return col


# ---------------------------------------------------------------------------
# statement parse + apply
# ---------------------------------------------------------------------------

@dataclass
class Statement:
    func: str
    args: list            # raw arg tokens: ("path", text) / ("str", s) / ("num", n)
    where: str | None     # raw condition text (compiled per-apply)


_WHERE_SPLIT = re.compile(r"\)\s+where\s+", re.DOTALL)

#: Every editor spelling the engine implements — the reference's own
#: statement surface (docs/processing.md:150-266) plus the upstream
#: ottlfuncs spellings with identical semantics (the delete_key lesson
#: generalized).  parse_statement rejects anything else AT VALIDATE
#: TIME, so a typo'd config fails `validate`, not a later compile.
ACCEPTED_FUNCTIONS = frozenset({
    "drop", "set", "delete", "delete_key", "delete_matching_keys",
    "keep_keys", "keep_matching_keys", "truncate_all", "limit",
    "replace_match", "replace_all_matches", "replace_pattern",
    "replace_all_patterns", "replace_wildcards",
    "group_by", "create_gauge",
})


def parse_statement(text: str) -> Statement:
    """``func(arg, ...) [where cond]`` -> Statement."""
    text = text.strip()
    m = re.match(r"^([A-Za-z_][A-Za-z0-9_]*)\s*\(", text)
    if not m:
        raise OttlSyntaxError(f"statement must be a function call: {text!r}")
    func = m.group(1)
    if func not in ACCEPTED_FUNCTIONS:
        raise OttlSyntaxError(
            f"unknown OTTL function {func!r} (accepted: "
            f"{', '.join(sorted(ACCEPTED_FUNCTIONS))})")
    # find the matching close paren of the call (strings may contain parens)
    depth, i, in_str = 0, m.end() - 1, False
    while i < len(text):
        c = text[i]
        if in_str:
            if c == "\\":
                i += 1
            elif c == '"':
                in_str = False
        elif c == '"':
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                break
        i += 1
    if depth != 0:
        raise OttlSyntaxError(f"unbalanced parens in {text!r}")
    argtext = text[m.end():i]
    rest = text[i + 1:].strip()
    where = None
    if rest:
        wm = re.match(r"^where\s+(.*)$", rest, re.DOTALL)
        if not wm:
            raise OttlSyntaxError(f"unexpected trailing text {rest!r}")
        where = wm.group(1).strip()
    args = [_parse_arg(tok) for tok in _split_args(argtext)]
    bounds = _ARITY.get(func)
    if bounds and not (bounds[0] <= len(args) <= bounds[1]):
        want = (str(bounds[0]) if bounds[0] == bounds[1]
                else f"{bounds[0]}-{bounds[1]}")
        raise OttlSyntaxError(
            f"{func}() takes {want} arguments, got {len(args)}: {text!r}")
    return Statement(func, args, where)


#: parse-time arity fences — everything the apply branches index into
#: must be rejected by ``validate`` (which only parses), not crash at
#: compile with a bare IndexError (the delete_key lesson generalized)
_ARITY = {
    "replace_pattern": (3, 3),
    "replace_all_patterns": (3, 4),
    "replace_wildcards": (3, 3),
    "replace_match": (3, 3),
    "replace_all_matches": (3, 3),
}


def _parse_arg(tok: str):
    """One argument -> a tagged tuple: literal ("str"/"num"), field
    ("path"), duration ("dur"), id factory (folds to "str"), metric
    expression ("expr"), or converter call ("call", name, [sub-args])
    — converter calls nest."""
    fm = _FACTORY.match(tok)
    if fm:                           # SpanID(0x..)/TraceID(0x..) factories
        want = 16 if fm.group(1) == "SpanID" else 32
        hexid = fm.group(2).lower()
        if len(hexid) != want:
            raise OttlSyntaxError(
                f"{fm.group(1)} needs {want} hex digits, "
                f"got {len(hexid)}: {tok!r}")
        return ("str", hexid)
    dm = _DURATION.match(tok)
    if dm:                           # 2m / 30s / 500ms admission windows
        return ("dur", int(dm.group(1))
                * {"ms": 1, "s": 1000, "m": 60_000,
                   "h": 3_600_000}[dm.group(2)])
    if "read_gauge" in tok:          # metric-expression argument
        return ("expr", tok)
    cm = _CALL.match(tok)
    if cm:                           # converter call, possibly nested
        return ("call", cm.group(1),
                [_parse_arg(t) for t in _split_args(cm.group(2))])
    toks = _tokenize(tok)
    if len(toks) != 1:
        raise OttlSyntaxError(f"bad argument {tok!r}")
    t = toks[0]
    if t.kind == "string":
        return ("str", _unquote(t.text))
    if t.kind == "number":
        return ("num", float(t.text) if "." in t.text else int(t.text))
    if t.kind == "path":
        return ("path", t.text)
    raise OttlSyntaxError(f"bad argument {tok!r}")


_FACTORY = re.compile(r"^(SpanID|TraceID)\(0x([0-9a-fA-F]+)\)$")
_CALL = re.compile(r"^([A-Z][A-Za-z0-9_]*)\((.*)\)$", re.DOTALL)
_DURATION = re.compile(r"^(\d+)(ms|s|m|h)$")
_GAUGE_EXPR = re.compile(
    r'^read_gauge\("([^"]+)"\)\s*(?:([+\-*/])\s*'
    r'(?:read_gauge\("([^"]+)"\)|(-?\d+(?:\.\d+)?)))?$')


def _split_args(argtext: str) -> list[str]:
    out, cur, in_str, depth = [], [], False, 0
    for idx, c in enumerate(argtext):
        if in_str:
            cur.append(c)
            if c == "\\":
                cur.append("")
            elif c == '"' and argtext[idx - 1] != "\\":
                in_str = False
            continue
        if c == '"':
            in_str = True
        elif c == "," and depth == 0:
            out.append("".join(cur))
            cur = []
            continue
        elif c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        cur.append(c)
    if cur and "".join(cur).strip():
        out.append("".join(cur))
    return [a.strip() for a in out if a.strip()]


def _arg_value(arg) -> Column:
    if arg[0] == "path":
        return get_path(arg[1])
    if arg[0] == "call":
        return _call_converter(arg[1], arg[2])
    return F.lit(arg[1])


def _call_converter(name: str, args: list) -> Column:
    """OTTL converter functions compiled to built-in Column expressions
    (the transform language's pure value converters — UpperCamelCase per
    the factory naming rule, processing.md:315).  All JVM-side; no UDF."""
    vals = [_arg_value(a) for a in args]

    def lit(i, want=str):
        if args[i][0] not in ("str", "num") or not isinstance(
                args[i][1], want if want is not str else str):
            raise OttlSyntaxError(
                f"{name}() argument {i} must be a {want.__name__} literal")
        return args[i][1]

    if name == "Concat":             # Concat(sep, v1, v2, ...)
        return F.concat_ws(lit(0), *vals[1:])
    if name == "SHA256":
        return F.sha2(vals[0].cast("string"), 256)
    if name == "SHA1":
        return F.sha1(vals[0].cast("string"))
    if name == "MD5":
        return F.md5(vals[0].cast("string"))
    if name == "Substring":          # Substring(v, start, len) 0-based
        return F.substring(vals[0].cast("string"),
                           int(lit(1, int)) + 1, int(lit(2, int)))
    if name == "ConvertCase":        # upper/lower/snake
        mode = lit(1)
        if mode == "upper":
            return F.upper(vals[0])
        if mode == "lower":
            return F.lower(vals[0])
        if mode == "snake":          # camelCase/PascalCase -> snake_case
            return F.lower(F.regexp_replace(
                vals[0], r"([a-z0-9])([A-Z])", r"$1_$2"))
        raise OttlSyntaxError(f"ConvertCase mode {mode!r}")
    if name == "Len":
        return F.length(vals[0].cast("string"))
    if name == "Trim":
        return F.trim(vals[0].cast("string"))
    if name == "Int":
        return F.floor(vals[0].cast("double")).cast("long")
    if name == "Double":
        return vals[0].cast("double")
    if name == "String":
        return vals[0].cast("string")
    raise OttlSyntaxError(f"unknown OTTL converter {name!r}")


def _glob_to_regex(pattern: str) -> str:
    """OTTL replace_match patterns use filepath.Match globs: ``*`` spans
    any run of characters."""
    return "^" + ".*".join(re.escape(p) for p in pattern.split("*")) + "$"


def _map_col(arg) -> str:
    """An argument that must be an attribute-map path; returns column."""
    k, v = arg
    if k != "path":
        raise OttlSyntaxError(f"expected a map path, got {v!r}")
    if v == "attributes":
        return "attributes"
    if v == "resource.attributes":
        return "resource_attributes"
    raise OttlSyntaxError(f"{v!r} is not an attribute map path")


def _conditional(df: DataFrame, col: str, new: Column,
                 cond: Column | None) -> DataFrame:
    if cond is None:
        return df.withColumn(col, new)
    # conditional set of a NEW column: non-matching rows get NULL
    prev = F.col(col) if col in df.columns else F.lit(None)
    return df.withColumn(col, F.when(cond, new).otherwise(prev))


def apply_statement(df: DataFrame, stmt: Statement | str) -> DataFrame:
    """Apply one parsed statement (conditional mutations stay one plan)."""
    if isinstance(stmt, str):
        stmt = parse_statement(stmt)
    cond = compile_condition(stmt.where) if stmt.where else None
    fn = stmt.func

    if fn == "drop":
        if stmt.args:
            raise OttlSyntaxError("drop() takes no arguments")
        return df.filter(~cond) if cond is not None else df.limit(0)

    if fn == "set":
        (k, path), val = stmt.args[0], _arg_value(stmt.args[1])
        if k != "path":
            raise OttlSyntaxError("set() target must be a field path")
        kind, col, key = _parse_path(path)
        if kind == "column":
            return _conditional(df, col, val, cond)
        new = map_put(F.col(col), key, _attr_struct(val))
        return _conditional(df, col, new, cond)

    if fn == "delete_key":
        # the upstream OTTL spelling (ottlfuncs README: delete_key(map,
        # "key")) — same semantics as the engine's delete(map["key"])
        if len(stmt.args) != 2 or stmt.args[1][0] != "str":
            raise OttlSyntaxError(
                "delete_key() wants (map_path, \"key\")")
        col = _map_col(stmt.args[0])
        new = map_delete(F.col(col), stmt.args[1][1])
        return _conditional(df, col, new, cond)

    if fn == "delete":
        k, path = stmt.args[0]
        kind, col, key = _parse_path(path)
        if kind == "column":
            return df.drop(col) if cond is None else _conditional(
                df, col, F.lit(None).cast(df.schema[col].dataType), cond)
        new = map_delete(F.col(col), key)
        return _conditional(df, col, new, cond)

    if fn == "keep_keys":
        col = _map_col(stmt.args[0])
        keys = [v for k, v in stmt.args[1:] if k == "str"]
        return _conditional(df, col, keep_keys(F.col(col), *keys), cond)

    if fn in ("delete_matching_keys", "keep_matching_keys"):
        # upstream ottlfuncs spellings: filter a map by key regex —
        # delete_matching_keys(map, pattern) drops matching keys,
        # keep_matching_keys keeps only them
        if len(stmt.args) != 2 or stmt.args[1][0] != "str":
            raise OttlSyntaxError(f"{fn}() wants (map_path, \"pattern\")")
        col, pat = _map_col(stmt.args[0]), stmt.args[1][1]
        keep = ((lambda k, v: ~k.rlike(pat))
                if fn == "delete_matching_keys"
                else (lambda k, v: k.rlike(pat)))
        return _conditional(df, col, F.map_filter(F.col(col), keep), cond)

    if fn == "replace_pattern":
        # upstream spelling: replace_pattern(target, regex, replacement)
        # — replace_match with a real regex instead of a glob
        (k, path) = stmt.args[0]
        pat, repl = stmt.args[1][1], stmt.args[2][1]
        kind, col, key = _parse_path(path)
        if kind == "column":
            return _conditional(df, col,
                                F.regexp_replace(F.col(col), pat, repl),
                                cond)
        cur = F.col(col)[key]["s"]
        upd = map_put(F.col(col), key,
                      _attr_struct(F.regexp_replace(cur, pat, repl)))
        # guard on the STRING arm, not mere key presence: an int/bool/
        # double-armed attribute must pass through untouched (upstream
        # replace_pattern is a no-op on non-string targets), not be
        # overwritten with an all-null struct
        keep_cond = cur.isNotNull()
        keep_cond = keep_cond if cond is None else (keep_cond & cond)
        return df.withColumn(col, F.when(keep_cond, upd)
                             .otherwise(F.col(col)))

    if fn == "replace_all_patterns":
        # upstream spelling: replace_all_patterns(map, mode, regex,
        # replacement) with mode "key"|"value"; the 3-arg legacy form
        # means value mode
        col = _map_col(stmt.args[0])
        if len(stmt.args) == 4:
            mode, pat, repl = (stmt.args[1][1], stmt.args[2][1],
                               stmt.args[3][1])
        else:
            mode, pat, repl = "value", stmt.args[1][1], stmt.args[2][1]
        if mode not in ("key", "value"):
            raise OttlSyntaxError(
                f"replace_all_patterns() mode must be key|value, "
                f"got {mode!r}")
        if mode == "key":
            # transform_keys alone dies under mapKeyDedupPolicy=EXCEPTION
            # when the regex collapses two keys to one name; rebuild from
            # entries keeping the LAST occurrence per renamed key (a
            # deterministic pick where upstream's Go map insert order is
            # not).  Attribute maps are small, so the per-entry lookahead
            # scan is bounded.
            renamed = F.transform(
                F.map_entries(F.col(col)),
                lambda e: F.struct(
                    F.regexp_replace(e["key"], pat, repl).alias("key"),
                    e["value"].alias("value")))
            new = F.map_from_entries(F.filter(
                renamed,
                lambda e, i: ~F.exists(
                    F.slice(renamed, i + F.lit(2), F.size(renamed)),
                    lambda x: x["key"] == e["key"])))
        else:
            # typed attr model: the regex applies to the string arm
            new = F.transform_values(
                F.col(col),
                lambda k, v: F.when(
                    v["s"].isNotNull(),
                    _attr_struct(F.regexp_replace(v["s"], pat, repl))
                ).otherwise(v))
        return _conditional(df, col, new, cond)

    if fn == "replace_wildcards":
        # the reference's own example spelling (docs/processing.md:258:
        # replace_wildcards(pattern, replacement, target)) — pattern
        # first; identical semantics to replace_match(target, pat, repl)
        stmt = Statement("replace_match",
                         [stmt.args[2], stmt.args[0], stmt.args[1]],
                         stmt.where)
        return apply_statement(df, stmt)

    if fn == "replace_match":
        (k, path) = stmt.args[0]
        pat = _glob_to_regex(stmt.args[1][1])
        repl = stmt.args[2][1]
        kind, col, key = _parse_path(path)
        if kind == "column":
            new = F.when(F.col(col).rlike(pat), F.lit(repl)) \
                .otherwise(F.col(col))
            return _conditional(df, col, new, cond)
        cur = F.col(col)[key]["s"]
        new_val = F.when(cur.rlike(pat), F.lit(repl)).otherwise(cur)
        upd = map_put(F.col(col), key, _attr_struct(new_val))
        # guard on the STRING arm (the replace_pattern discipline): an
        # int/bool/double-armed attribute passes through untouched
        keep_cond = cur.isNotNull()
        keep_cond = keep_cond if cond is None else (keep_cond & cond)
        return df.withColumn(col, F.when(keep_cond, upd)
                             .otherwise(F.col(col)))

    if fn == "replace_all_matches":
        col = _map_col(stmt.args[0])
        pat = _glob_to_regex(stmt.args[1][1])
        repl = stmt.args[2][1]
        new = F.expr(
            f"transform_values({col}, (k, v) -> IF(v.s IS NOT NULL AND "
            f"v.s RLIKE '{pat}', named_struct('s', '{repl}', "
            f"'i', CAST(NULL AS BIGINT), 'd', CAST(NULL AS DOUBLE), "
            f"'b', CAST(NULL AS BOOLEAN), 'json', CAST(NULL AS STRING)), v))")
        return _conditional(df, col, new, cond)

    if fn == "truncate_all":
        col = _map_col(stmt.args[0])
        n = int(stmt.args[1][1])
        # typed attr model: truncate the string arm, other arms unchanged
        new = F.expr(
            f"transform_values({col}, (k, v) -> named_struct("
            f"'s', substring(v.s, 1, {n}), 'i', v.i, 'd', v.d, "
            f"'b', v.b, 'json', v.json))")
        return _conditional(df, col, new, cond)

    if fn == "limit":
        col = _map_col(stmt.args[0])
        n = int(stmt.args[1][1])
        keep = tuple(v for k, v in stmt.args[2:] if k == "str")
        return _conditional(df, col,
                            limit_attributes(F.col(col), n, keep), cond)

    if fn == "group_by":
        # docs/processing.md:222-225 ``group_by(trace_id, 2m)`` — the
        # groupbytrace processor: co-locate all rows of a trace.  In the
        # Spark model that is a hash repartition + in-partition sort (the
        # admission-window duration is advisory: a batch DataFrame is
        # already complete; streaming gets the same effect from a
        # watermark on the ingest source).
        if cond is not None:
            raise OttlSyntaxError("group_by() takes no where clause")
        (k, path) = stmt.args[0]
        if k != "path":
            raise OttlSyntaxError("group_by() key must be a field path")
        kind, col, _key = _parse_path(path)
        if kind != "column":
            raise OttlSyntaxError("group_by() key must be a plain column")
        return df.repartition(F.col(col)).sortWithinPartitions(col)

    if fn == "create_gauge":
        # docs/processing.md:232-239 — derive a new gauge from existing
        # metrics: ``create_gauge("name", read_gauge("a") / read_gauge("b"))``.
        # read_gauge(x) = the gauge's value per timestamp (datapoints
        # sharing a timestamp sum — the aggregation that makes the
        # cross-metric join well-defined); the combined rows are UNIONED
        # onto the input as metric_type=1 datapoints.
        if cond is not None:
            raise OttlSyntaxError("create_gauge() takes no where clause")
        name = stmt.args[0][1]
        ek, etext = stmt.args[1]
        if ek != "expr":
            raise OttlSyntaxError("create_gauge() needs a read_gauge expr")
        m = _GAUGE_EXPR.match(etext)
        if not m:
            raise OttlSyntaxError(f"bad metric expression {etext!r}")
        ma, op, mb, scalar = m.groups()

        def read_gauge(metric: str, alias: str):
            val = F.coalesce(F.col("value_double"),
                             F.col("value_int").cast("double"))
            return (df.filter((F.col("metric_name") == metric)
                              & (F.col("metric_type") == 1))
                      .groupBy("time_unix_nano")
                      .agg(F.sum(val).alias(alias)))

        j = read_gauge(ma, "__a")
        if op is None:
            val = F.col("__a")
        else:
            rhs = F.lit(float(scalar)) if mb is None else F.col("__b")
            if mb is not None:
                j = j.join(read_gauge(mb, "__b"), "time_unix_nano")
            val = {"+": F.col("__a") + rhs, "-": F.col("__a") - rhs,
                   "*": F.col("__a") * rhs, "/": F.col("__a") / rhs}[op]
        defaults = {"metric_name": F.lit(name), "metric_type": F.lit(1),
                    "description": F.lit(""), "unit": F.lit("1"),
                    "value_double": val, "flags": F.lit(0)}
        cols = [(defaults.get(f.name, F.col(f.name)
                 if f.name == "time_unix_nano" else F.lit(None)))
                .cast(f.dataType).alias(f.name) for f in df.schema.fields]
        return df.unionByName(j.select(*cols))

    raise OttlSyntaxError(f"unknown OTTL function {fn!r}")


def apply_statements(df: DataFrame, statements: list[str]) -> DataFrame:
    """Apply an OTTL statement list in order (the transform processor's
    per-signal statement block)."""
    for s in statements:
        df = apply_statement(df, s)
    return df
