"""OGR SQL dialect front-end → DataFrame plans.

A thin recursive-descent parser for the reference's OGR SQL dialect
(grammar ogr/swq_parser.y; semantics doc/source/user/ogr_sql_dialect
.rst; conformance corpus autotest/ogr/ogr_sql_test.py) mapped onto the
engine's DataFrame operators. The dialect is deliberately tiny
(SURVEY.md §2.2-2.8), and its quirks are the point of this layer:

* ``LIKE`` is case-INsensitive by default (swq_op_general.cpp:41 on
  UTF-8 layers) → compat.ogr_like.
* Aggregates cannot mix with plain columns and imply a single summary
  row — OGR SQL has NO GROUP BY (SWQM_SUMMARY_RECORD,
  ogr/swq_parser.y:831-838).
* ``SELECT DISTINCT col`` is its own query mode (SWQM_DISTINCT_LIST).
* ``JOIN``/``LEFT JOIN`` returns exactly ONE row per primary row —
  the FIRST match (ogr_gensql.cpp:1497-1526) → first_match_left_join.
* Joined fields may not appear in WHERE or ORDER BY (dialect rule).
* ``CAST`` types: character/integer/bigint/float/numeric/date/
  timestamp (swq_parser.y:742-815).

Scalar surface: + - * / %, CONCAT, SUBSTR (1-based), HSTORE_GET_VALUE,
CAST; aggregates MIN/MAX/COUNT/SUM/AVG (+ COUNT(DISTINCT)). Everything
compiles to Column expressions — the parser never touches rows, so
Catalyst sees an ordinary declarative plan (pushdown/pruning intact).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.compat import first_match_left_join, hstore_get_value, ogr_like

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<num>\d+\.\d+|\.\d+|\d+)
      | (?P<str>'(?:[^']|'')*')
      | (?P<ident>[A-Za-z_][A-Za-z_0-9]*)
      | (?P<op><=|>=|<>|!=|=|<|>|\(|\)|,|\*|/|\+|-|%|\.)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {
    "select", "distinct", "from", "where", "and", "or", "not", "in",
    "between", "like", "ilike", "is", "null", "order", "by", "asc",
    "desc", "limit", "offset", "join", "left", "on", "as", "union",
    "all", "cast", "escape",
}

_AGGS = {"min", "max", "count", "sum", "avg"}

_CAST_TYPES = {
    "character": "string", "integer": "int", "int": "int",
    "bigint": "long", "smallint": "short", "float": "double",
    "numeric": "double", "real": "double", "date": "date",
    "timestamp": "timestamp", "time": "string", "boolean": "boolean",
}


def _tokenize(sql: str) -> list[tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m:
            if sql[pos:].strip():
                raise ValueError(f"OGR SQL: bad token at {sql[pos:pos+20]!r}")
            break
        pos = m.end()
        if m.lastgroup == "num":
            out.append(("num", m.group("num")))
        elif m.lastgroup == "str":
            out.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.lastgroup == "ident":
            t = m.group("ident")
            out.append(
                ("kw", t.lower()) if t.lower() in _KEYWORDS
                else ("ident", t)
            )
        else:
            out.append(("op", m.group("op")))
    out.append(("end", ""))
    return out


@dataclass
class _Sel:
    columns: list          # (expr_ast, alias | None)
    distinct: bool
    table: str
    join: tuple | None     # (sec_table, on_ast)
    where: tuple | None
    order: list            # (name_or_ast, asc)
    limit: int | None
    offset: int
    union: "._Sel | None"


class _Parser:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self, k=0):
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, kind, val=None):
        t = self.peek()
        if t[0] == kind and (val is None or t[1] == val):
            self.i += 1
            return t
        return None

    def expect(self, kind, val=None):
        t = self.accept(kind, val)
        if t is None:
            raise ValueError(
                f"OGR SQL: expected {val or kind}, got {self.peek()}"
            )
        return t

    # --- statements ------------------------------------------------
    def parse_select(self) -> _Sel:
        self.expect("kw", "select")
        distinct = bool(self.accept("kw", "distinct"))
        cols = [self.select_item()]
        while self.accept("op", ","):
            cols.append(self.select_item())
        self.expect("kw", "from")
        table = self.expect("ident")[1]
        self.accept("ident")  # optional table alias (ignored: single use)
        join = None
        if self.accept("kw", "left"):
            self.expect("kw", "join")
            join = self.join_tail()
        elif self.accept("kw", "join"):
            join = self.join_tail()
        where = None
        if self.accept("kw", "where"):
            where = self.expr()
        order: list = []
        if self.accept("kw", "order"):
            self.expect("kw", "by")
            order.append(self.order_item())
            while self.accept("op", ","):
                order.append(self.order_item())
        limit = None
        offset = 0
        if self.accept("kw", "limit"):
            limit = int(self.expect("num")[1])
        if self.accept("kw", "offset"):
            offset = int(self.expect("num")[1])
        union = None
        if self.accept("kw", "union"):
            self.expect("kw", "all")
            union = self.parse_select()
        return _Sel(cols, distinct, table, join, where, order,
                    limit, offset, union)

    def join_tail(self):
        sec = self.expect("ident")[1]
        self.accept("ident")
        self.expect("kw", "on")
        return (sec, self.expr())

    def select_item(self):
        if self.accept("op", "*"):
            # OGR's `* EXCEPT (a, b)` column exclusion
            # (swq PushExcludeField, ogr/ogr_swq.h:470-476)
            if self.peek()[0] == "ident" and self.peek()[1].upper() in (
                "EXCEPT", "EXCLUDE"
            ):
                self.next()
                self.expect("op", "(")
                drop = [self.expect("ident")[1]]
                while self.accept("op", ","):
                    drop.append(self.expect("ident")[1])
                self.expect("op", ")")
                return (("star_except", drop), None)
            return (("star",), None)
        e = self.expr()
        alias = None
        if self.accept("kw", "as"):
            alias = self.expect("ident")[1]
        elif self.peek()[0] == "ident" and self.peek(1)[1] in (
            ",", "from"
        ) or (self.peek()[0] == "ident"
              and self.peek(1)[0] == "kw" and self.peek(1)[1] == "from"):
            alias = self.next()[1]
        return (e, alias)

    def order_item(self):
        e = self.expr()
        asc = True
        if self.accept("kw", "desc"):
            asc = False
        else:
            self.accept("kw", "asc")
        return (e, asc)

    # --- expressions (precedence climbing) -------------------------
    def expr(self):
        return self.or_expr()

    def or_expr(self):
        e = self.and_expr()
        while self.accept("kw", "or"):
            e = ("or", e, self.and_expr())
        return e

    def and_expr(self):
        e = self.not_expr()
        while self.accept("kw", "and"):
            e = ("and", e, self.not_expr())
        return e

    def not_expr(self):
        if self.accept("kw", "not"):
            return ("not", self.not_expr())
        return self.predicate()

    def predicate(self):
        e = self.add_expr()
        neg = bool(self.accept("kw", "not"))
        if self.accept("kw", "in"):
            self.expect("op", "(")
            items = [self.add_expr()]
            while self.accept("op", ","):
                items.append(self.add_expr())
            self.expect("op", ")")
            out = ("in", e, items)
        elif self.accept("kw", "between"):
            lo = self.add_expr()
            self.expect("kw", "and")
            hi = self.add_expr()
            out = ("between", e, lo, hi)
        elif self.accept("kw", "like") or self.accept("kw", "ilike"):
            pat = self.add_expr()
            esc = None
            if self.accept("kw", "escape"):
                esc = self.add_expr()
            out = ("like", e, pat, esc)
        elif self.accept("kw", "is"):
            n = bool(self.accept("kw", "not"))
            self.expect("kw", "null")
            out = ("isnull", e)
            neg = neg != n
        else:
            t = self.peek()
            if t[0] == "op" and t[1] in ("=", "<>", "!=", "<", "<=", ">", ">="):
                self.next()
                out = ("cmp", t[1], e, self.add_expr())
            else:
                return ("not", e) if neg else e
        return ("not", out) if neg else out

    def add_expr(self):
        e = self.mul_expr()
        while True:
            if self.accept("op", "+"):
                e = ("bin", "+", e, self.mul_expr())
            elif self.accept("op", "-"):
                e = ("bin", "-", e, self.mul_expr())
            else:
                return e

    def mul_expr(self):
        e = self.unary()
        while True:
            t = self.peek()
            if t[0] == "op" and t[1] in ("*", "/", "%"):
                self.next()
                e = ("bin", t[1], e, self.unary())
            else:
                return e

    def unary(self):
        if self.accept("op", "-"):
            return ("neg", self.unary())
        return self.primary()

    def primary(self):
        t = self.peek()
        if t == ("op", "("):
            self.next()
            e = self.expr()
            self.expect("op", ")")
            return e
        if t[0] == "num":
            self.next()
            return ("lit", float(t[1]) if "." in t[1] else int(t[1]))
        if t[0] == "str":
            self.next()
            return ("lit", t[1])
        if t[0] == "kw" and t[1] == "null":
            self.next()
            return ("lit", None)
        if t[0] == "kw" and t[1] == "cast":
            self.next()
            self.expect("op", "(")
            e = self.expr()
            self.expect("kw", "as")
            ty = self.expect("ident")[1].lower()
            if self.accept("op", "("):  # character(n) width — ignored
                self.expect("num")
                self.expect("op", ")")
            self.expect("op", ")")
            if ty not in _CAST_TYPES:
                raise ValueError(f"OGR SQL: unsupported CAST type {ty}")
            return ("cast", e, _CAST_TYPES[ty])
        if t[0] == "ident":
            name = self.next()[1]
            if name.upper() == "OGR_GEOM_AREA":
                return ("geom_area",)
            if self.peek() == ("op", "("):  # function or aggregate
                self.next()
                fn = name.lower()
                if fn == "count" and self.accept("op", "*"):
                    self.expect("op", ")")
                    return ("agg", "count_star", None)
                distinct = bool(self.accept("kw", "distinct"))
                args = []
                if not self.accept("op", ")"):
                    args.append(self.expr())
                    while self.accept("op", ","):
                        args.append(self.expr())
                    self.expect("op", ")")
                if fn in _AGGS:
                    if distinct:
                        if fn != "count":
                            raise ValueError(
                                "OGR SQL: DISTINCT only with COUNT"
                            )
                        return ("agg", "count_distinct", args[0])
                    return ("agg", fn, args[0])
                return ("func", fn, args)
            if self.peek() == ("op", "."):  # table.field
                self.next()
                field = self.expect("ident")[1]
                return ("col", field, name)
            return ("col", name, None)
        raise ValueError(f"OGR SQL: unexpected token {t}")


def _compile(ast, strict_fields: set | None = None):
    kind = ast[0]
    if kind == "lit":
        return F.lit(ast[1])
    if kind == "col":
        if strict_fields is not None and ast[1] not in strict_fields:
            raise ValueError(
                f"OGR SQL: field {ast[1]!r} not allowed here "
                "(joined fields may not appear in WHERE/ORDER BY)"
            )
        # backticks: "table.field" output names are literal, not paths
        return F.col(f"`{ast[1]}`" if "." in ast[1] else ast[1])
    if kind == "geom_area":
        from .operators.compat import geom_area

        return geom_area(F.col("geom_wkb"))
    if kind == "neg":
        return -_compile(ast[1], strict_fields)
    if kind == "bin":
        a = _compile(ast[2], strict_fields)
        b = _compile(ast[3], strict_fields)
        return {
            "+": a + b, "-": a - b, "*": a * b, "/": a / b, "%": a % b,
        }[ast[1]]
    if kind == "cmp":
        a = _compile(ast[2], strict_fields)
        b = _compile(ast[3], strict_fields)
        return {
            "=": a == b, "<>": a != b, "!=": a != b,
            "<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b,
        }[ast[1]]
    if kind == "and":
        return _compile(ast[1], strict_fields) & _compile(ast[2], strict_fields)
    if kind == "or":
        return _compile(ast[1], strict_fields) | _compile(ast[2], strict_fields)
    if kind == "not":
        return ~_compile(ast[1], strict_fields)
    if kind == "in":
        # compile every list element — column refs / arithmetic in the
        # IN list are legal expressions, not bare literals
        return _compile(ast[1], strict_fields).isin(
            *[_compile(a, strict_fields) for a in ast[2]]
        )
    if kind == "between":
        e = _compile(ast[1], strict_fields)
        return e.between(
            _compile(ast[2], strict_fields), _compile(ast[3], strict_fields)
        )
    if kind == "like":
        # OGR LIKE is case-insensitive on UTF-8 layers
        return ogr_like(
            _compile(ast[1], strict_fields),
            ast[2][1],
            escape=(ast[3][1] if ast[3] is not None else None),
        )
    if kind == "isnull":
        return _compile(ast[1], strict_fields).isNull()
    if kind == "cast":
        return _compile(ast[1], strict_fields).cast(ast[2])
    if kind == "func":
        fn, args = ast[1], ast[2]
        cargs = [_compile(a, strict_fields) for a in args]
        if fn == "concat":
            return F.concat(*cargs)
        if fn == "substr":
            start = args[1][1]
            if len(args) == 3:
                return F.substring(cargs[0], int(start), int(args[2][1]))
            return F.substring(
                cargs[0], int(start), 2147483647
            )
        if fn == "hstore_get_value":
            return hstore_get_value(cargs[0], args[1][1])
        if fn in ("upper", "lower", "length", "abs"):
            return getattr(F, fn)(cargs[0])
        if fn.startswith("st_"):
            # spatial functions resolve to the UDFs installed by
            # gdal_spark.stsql.register_st_functions — the SQLite
            # dialect registry analog (ogrsqlitesqlfunctions.cpp:876)
            return F.call_udf(fn, *cargs)
        raise ValueError(f"OGR SQL: unknown function {fn}")
    if kind == "agg":
        fn, arg = ast[1], ast[2]
        if fn == "count_star":
            return F.count(F.lit(1))
        c = _compile(arg)
        return {
            "min": F.min(c), "max": F.max(c), "count": F.count(c),
            "count_distinct": F.countDistinct(c),
            "sum": F.sum(c), "avg": F.avg(c),
        }[fn]
    raise ValueError(f"OGR SQL: cannot compile {ast}")


def _has_agg(ast) -> bool:
    if not isinstance(ast, tuple):
        return False
    if ast[0] == "agg":
        return True
    return any(
        _has_agg(x)
        for x in ast[1:]
        if isinstance(x, (tuple, list))
        for x in ([x] if isinstance(x, tuple) else x)
    )


def _default_name(ast, idx: int) -> str:
    if ast[0] == "col":
        return ast[1]
    if ast[0] == "agg":
        return f"{ast[1]}_{ast[2][1] if ast[2] else 'star'}".lower()
    return f"field_{idx + 1}"


def execute(
    spark_or_tables, sql: str, tables: dict[str, DataFrame] | None = None
) -> DataFrame:
    """Run an OGR SQL dialect statement against named DataFrames —
    the ExecuteSQL(dialect="OGRSQL") analog (gcore/gdaldataset.cpp
    :6870 → OGRGenSQLResultsLayer)."""
    if tables is None:
        tables = spark_or_tables  # allow execute(tables, sql)
    sel = _Parser(_tokenize(sql)).parse_select()
    out = _run_select(sel, tables)
    # walk the whole UNION ALL chain (swq_parser.y:840 allows repeats)
    while sel.union is not None:
        sel = sel.union
        out = out.unionByName(_run_select(sel, tables),
                              allowMissingColumns=False)
    return out


def _rename_ast(ast, mapper):
    """Rewrite ('col', field, table) refs through ``mapper(field,
    table)`` → unqualified output column names."""
    if not isinstance(ast, tuple):
        return ast
    if ast[0] == "col":
        return ("col", mapper(ast[1], ast[2]), None)
    if ast[0] == "geom_area":
        return ast
    out = [ast[0]]
    for a in ast[1:]:
        if isinstance(a, tuple):
            out.append(_rename_ast(a, mapper))
        elif isinstance(a, list):
            out.append([_rename_ast(x, mapper) for x in a])
        else:
            out.append(a)
    return tuple(out)


def _run_select(sel: _Sel, tables: dict[str, DataFrame]) -> DataFrame:
    if sel.table not in tables:
        raise ValueError(f"OGR SQL: unknown table {sel.table}")
    df = tables[sel.table]
    primary_fields = set(df.columns)
    fid_col = df.columns[0]

    def base_mapper(f, t, _fid=fid_col):
        # OGR special fields (ogr/ogrfeaturequery.cpp:37, ogr_p.h:168):
        # FID resolves to the table's row-id column
        if f.upper() == "FID":
            return _fid
        return f

    mapper = base_mapper

    if sel.join is not None:
        sec_name, on_ast = sel.join
        sec = tables[sec_name]
        # OGR names conflicting secondary fields "table.field"
        # (OGRGenSQLResultsLayer output schema)
        ren = {
            c: (c if c not in primary_fields else f"{sec_name}.{c}")
            for c in sec.columns
        }
        sec2 = sec
        for old, new in ren.items():
            if new != old:
                sec2 = sec2.withColumnRenamed(old, new)

        def mapper(f, t, _ren=ren, _sec=sec_name):  # noqa: E731
            f = base_mapper(f, t)
            if t == _sec:
                return _ren.get(f, f)
            if t is None and f not in primary_fields and f in _ren:
                return _ren[f]
            return f

        on = _compile(_rename_ast(on_ast, mapper))
        df = first_match_left_join(
            df, sec2,
            on,
            secondary_fid=sec2.columns[0],
            primary_fid=df.columns[0],
        )

    if sel.where is not None:
        # dialect rule: WHERE sees only the primary table's fields
        df = df.filter(
            _compile(
                _rename_ast(sel.where, base_mapper),
                strict_fields=primary_fields,
            )
        )

    agg_mode = any(
        c[0] != ("star",) and _has_agg(c[0]) for c in sel.columns
    )
    names: list[str] = []
    if agg_mode:
        # SUMMARY mode: one row, aggregates only (swq SUMMARY_RECORD)
        aggs = []
        for i, (ast, alias) in enumerate(sel.columns):
            if not _has_agg(ast):
                raise ValueError(
                    "OGR SQL: cannot mix fields with aggregates"
                )
            name = alias or _default_name(ast, i)
            aggs.append(_compile(_rename_ast(ast, mapper)).alias(name))
            names.append(name)
        df = df.agg(*aggs)
    else:
        cols = []
        for i, (ast, alias) in enumerate(sel.columns):
            if ast == ("star",) or ast[0] == "star_except":
                drop = set(ast[1]) if ast[0] == "star_except" else set()
                kept = [c for c in df.columns if c not in drop]
                cols.extend(
                    F.col(f"`{c}`" if "." in c else c) for c in kept
                )
                names.extend(kept)
                continue
            name = alias or _default_name(ast, i)
            cols.append(_compile(_rename_ast(ast, mapper)).alias(name))
            names.append(name)
        df = df.select(*cols)
        if sel.distinct:
            df = df.distinct()

    if sel.order:
        primary_or_output = primary_fields | set(names)
        sort_cols = []
        for ast, asc in sel.order:
            if ast[0] == "col" and ast[1] in names:
                c = F.col(ast[1])
            else:
                c = _compile(ast, strict_fields=primary_or_output)
            sort_cols.append(c.asc() if asc else c.desc())
        df = df.orderBy(*sort_cols)

    if sel.offset:
        if not sel.order:
            raise ValueError("OGR SQL: OFFSET needs ORDER BY")
        # DataFrame.offset (Spark >= 3.4) plans GlobalLimit/Offset over
        # the existing sort — no single-partition row_number window
        df = df.offset(sel.offset)
    if sel.limit is not None:
        df = df.limit(sel.limit)
    return df
