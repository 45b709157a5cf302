"""SQL veneer: the reference's SQL surface on top of the Python engine.

PySpark cannot inject Catalyst parsers/rules, so the statements the
reference adds via its ANTLR extension grammar
(`spark-extensions/src/main/antlr/.../IcebergSqlExtensions.g4:65-212`),
its stored procedures (`spark/.../procedures/SparkProcedures.java:42-62`)
and its DSv2 row-level commands are parsed here and dispatched to the
engine's Python API; everything else (SELECT/joins/aggregates/...) is
delegated to `spark.sql` after resolving catalog table / view / metadata
table / time-travel references into temp views (the ResolveViews.scala
analog). See SURVEY §2.M / §2.N.

Supported statement classes:
  - CALL [cat.]system.<procedure>(...)   -- 18 procedures
  - ALTER TABLE ... ADD/DROP/REPLACE PARTITION FIELD, SET IDENTIFIER
    FIELDS, WRITE ORDERED BY / DISTRIBUTED BY PARTITION,
    CREATE/REPLACE BRANCH|TAG, DROP BRANCH|TAG, SET TBLPROPERTIES,
    ADD/DROP/RENAME COLUMN, ALTER COLUMN ... TYPE
  - MERGE INTO / UPDATE / DELETE FROM    -- row-level ops (CoW or MoR per
    table properties)
  - INSERT INTO / INSERT OVERWRITE
  - CREATE [OR REPLACE] TABLE [AS SELECT] / DROP TABLE (RTAS keeps
    table identity: uuid, history, refs; one schema+data commit)
  - CREATE [OR REPLACE] VIEW / DROP VIEW / SHOW VIEWS
  - CREATE [OR REPLACE] FUNCTION / DROP FUNCTION / SHOW FUNCTIONS
  - SELECT ... with  t VERSION AS OF <id|'ref'>,  t TIMESTAMP AS OF <ts>,
    metadata tables (t.snapshots, t.files, ...) and stored views/functions
"""

from __future__ import annotations

import datetime as _dt
import re
from typing import Optional

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import types as T

from . import expressions as E
from .expressions import col, transform_col
from .metadata_tables import METADATA_TABLES
from . import views as V

_TRANSFORM_FNS = {"years", "year", "months", "month", "days", "day",
                  "hours", "hour", "bucket", "truncate"}


# ---------------------------------------------------------------------------
# literal / predicate parsing (WHERE clauses -> expression algebra)
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<string>'(?:[^']|'')*')
      | (?P<number>-?\d+\.\d+(?:[eE][+-]?\d+)?|-?\d+)
      | (?P<ident>[A-Za-z_][A-Za-z_0-9]*(?:\.[A-Za-z_][A-Za-z_0-9]*)*)
      | (?P<op><=|>=|<>|!=|=|<|>|\(|\)|,)
    )""",
    re.VERBOSE,
)


def _tokenize(s: str) -> list:
    out, i = [], 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if not m:
            if s[i].isspace():
                i += 1
                continue
            raise ValueError(f"cannot tokenize predicate at: {s[i:i+20]!r}")
        i = m.end()
        kind = m.lastgroup
        text = m.group(kind)
        out.append((kind, text))
    return out


class _PredicateParser:
    """Recursive-descent WHERE-clause parser producing `E.Expr`.

    Grammar: disjunctions of conjunctions of [NOT] predicates; predicates
    are comparisons, IS [NOT] NULL, [NOT] IN, BETWEEN, [NOT] LIKE
    'prefix%', TRUE/FALSE; terms are columns or partition-transform calls
    (years/months/days/hours/bucket/truncate) matching the reference's
    system functions (spark/.../functions/, SURVEY §2.I).
    """

    def __init__(self, s: str):
        self.toks = _tokenize(s)
        self.i = 0

    def peek(self, k=0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, text):
        kind, tok = self.next()
        if tok is None or tok.upper() != text.upper():
            raise ValueError(f"expected {text}, got {tok!r}")
        return tok

    def kw(self, text) -> bool:
        kind, tok = self.peek()
        if kind == "ident" and tok.upper() == text.upper():
            self.i += 1
            return True
        return False

    def parse(self) -> E.Expr:
        e = self.expr()
        if self.peek()[0] is not None:
            raise ValueError(f"trailing tokens: {self.toks[self.i:]}")
        return e

    def expr(self) -> E.Expr:
        left = self.conj()
        while self.kw("OR"):
            left = E.Or(left, self.conj())
        return left

    def conj(self) -> E.Expr:
        left = self.unary()
        while self.kw("AND"):
            left = E.And(left, self.unary())
        return left

    def unary(self) -> E.Expr:
        if self.kw("NOT"):
            return E.Not(self.unary())
        return self.primary()

    def primary(self) -> E.Expr:
        kind, tok = self.peek()
        if tok == "(":
            self.next()
            e = self.expr()
            self.expect(")")
            return e
        return self.predicate()

    def term(self):
        kind, tok = self.next()
        if kind != "ident":
            raise ValueError(f"expected column, got {tok!r}")
        up = tok.upper()
        if up in ("TRUE", "FALSE"):
            return ("const", up == "TRUE")
        if tok.lower() in _TRANSFORM_FNS and self.peek()[1] == "(":
            fn = tok.lower()
            self.next()  # (
            if fn in ("bucket", "truncate"):
                k, n = self.next()
                if k != "number":
                    raise ValueError(f"{fn} needs a numeric first arg")
                self.expect(",")
                _, colname = self.next()
                self.expect(")")
                return ("col", transform_col(f"{fn}[{int(n)}]", colname))
            _, colname = self.next()
            self.expect(")")
            canon = {"years": "year", "months": "month", "days": "day",
                     "hours": "hour"}.get(fn, fn)
            return ("col", transform_col(canon, colname))
        return ("col", col(tok))

    def literal(self):
        kind, tok = self.next()
        if kind == "string":
            return tok[1:-1].replace("''", "'")
        if kind == "number":
            return float(tok) if ("." in tok or "e" in tok.lower()) else int(tok)
        if kind == "ident":
            up = tok.upper()
            if up == "NULL":
                return None
            if up in ("TRUE", "FALSE"):
                return up == "TRUE"
            if up in ("DATE", "TIMESTAMP"):
                k2, t2 = self.next()
                if k2 != "string":
                    raise ValueError(f"{up} literal needs a string")
                raw = t2[1:-1]
                if up == "DATE":
                    return _dt.date.fromisoformat(raw)
                return _dt.datetime.fromisoformat(raw)
        raise ValueError(f"expected literal, got {tok!r}")

    def predicate(self) -> E.Expr:
        kind, ref = self.term()
        if kind == "const":
            return E.ALWAYS_TRUE if ref else E.ALWAYS_FALSE
        c = ref
        k, tok = self.peek()
        up = (tok or "").upper()
        if k == "op" and tok in ("<", "<=", ">", ">=", "=", "<>", "!="):
            self.next()
            v = self.literal()
            return {"<": c.__lt__, "<=": c.__le__, ">": c.__gt__,
                    ">=": c.__ge__, "=": c.__eq__}.get(tok, c.__ne__)(v)
        if up == "IS":
            self.next()
            if self.kw("NOT"):
                self.expect("NULL")
                return c.not_null()
            self.expect("NULL")
            return c.is_null()
        neg = False
        if up == "NOT":
            self.next()
            neg = True
            up = (self.peek()[1] or "").upper()
        if up == "IN":
            self.next()
            self.expect("(")
            vals = [self.literal()]
            while self.peek()[1] == ",":
                self.next()
                vals.append(self.literal())
            self.expect(")")
            return c.not_in(vals) if neg else c.isin(vals)
        if up == "BETWEEN":
            self.next()
            lo = self.literal()
            self.expect("AND")
            hi = self.literal()
            e = E.And(c >= lo, c <= hi)
            return E.Not(e) if neg else e
        if up == "LIKE":
            self.next()
            pat = self.literal()
            if not isinstance(pat, str) or "%" in pat[:-1] or "_" in pat:
                raise ValueError("only prefix LIKE 'x%' is supported")
            e = c.startswith(pat[:-1]) if pat.endswith("%") else (c == pat)
            return E.Not(e) if neg else e
        raise ValueError(f"expected operator after column, got {tok!r}")


def parse_predicate(s: str) -> E.Expr:
    return _PredicateParser(s).parse()


# ---------------------------------------------------------------------------
# statement router
# ---------------------------------------------------------------------------

_STRING_RE = re.compile(r"'(?:[^']|'')*'")

def _shift_ts_literals(expr: E.Expr, tz_name: str, schema=None) -> E.Expr:
    """Re-interpret naive datetime literals (parsed from TIMESTAMP '...')
    as session-timezone wall time and shift them to UTC-naive, matching the
    domain of the engine's file stats — but ONLY on timestamptz columns:
    Spark compares a timestamp_ntz column against the literal as wall time,
    so its stats domain is the UNSHIFTED literal, and shifting would
    misprune. Columns whose type can't be determined make the whole
    pushdown unsafe under a non-UTC zone (return None: full scan, no
    pruning, correctness kept)."""
    if tz_name in ("UTC", "Etc/UTC", "GMT", "Z", "+00:00"):
        return expr
    try:
        from zoneinfo import ZoneInfo
        tz = ZoneInfo(tz_name)
    except Exception:
        return None  # unknown zone: skip pruning, keep correctness

    def col_type(term):
        try:
            return schema.find_field(term.name).type
        except Exception:
            return None

    unsafe = []

    def shift(v, ftype):
        if isinstance(v, _dt.datetime) and v.tzinfo is None:
            if ftype == "timestamp_ntz":
                return v  # wall-time comparison on both sides
            if ftype != "timestamp":
                unsafe.append(True)
                return v
            return v.replace(tzinfo=tz).astimezone(
                _dt.timezone.utc).replace(tzinfo=None)
        return v

    def walk(e):
        if isinstance(e, E.And):
            return E.And(walk(e.left), walk(e.right))
        if isinstance(e, E.Or):
            return E.Or(walk(e.left), walk(e.right))
        if isinstance(e, E.Not):
            return E.Not(walk(e.child))
        if isinstance(e, E.Predicate):
            ftype = col_type(e.term)
            return E.Predicate(e.op, e.term,
                               tuple(shift(v, ftype) for v in e.literals))
        return e

    out = walk(expr)
    return None if unsafe else out


# tokens that can follow a FROM/JOIN relation but are not an alias
_NOT_ALIAS = {
    "WHERE", "GROUP", "ORDER", "LIMIT", "HAVING", "UNION", "EXCEPT",
    "INTERSECT", "JOIN", "LEFT", "RIGHT", "FULL", "INNER", "CROSS",
    "NATURAL", "ON", "USING", "SET", "WINDOW", "QUALIFY", "TABLESAMPLE",
    "VERSION", "TIMESTAMP", "FOR", "SYSTEM_VERSION", "SYSTEM_TIME",
    "ANTI", "SEMI", "LATERAL", "AS",
}


def _strip_comments(stmt: str) -> str:
    return re.sub(r"--[^\n]*", " ", stmt).strip().rstrip(";").strip()


class SqlEngine:
    """`engine.sql(statement)` — parse/route/execute, returning a DataFrame
    (possibly empty) like Spark's own `sql`."""

    def __init__(self, spark: SparkSession, catalog):
        self.spark = spark
        self.catalog = catalog
        self._seq = 0

    # -- public --------------------------------------------------------------
    def sql(self, statement: str) -> DataFrame:
        s = _strip_comments(statement)
        head = s.split(None, 2)
        kw = (head[0].upper() if head else "")
        two = f"{kw} {head[1].upper()}" if len(head) > 1 else kw
        if kw == "CALL":
            return self._call(s)
        if kw == "ALTER":
            return self._alter(s)
        if kw == "MERGE":
            return self._merge(s)
        if two == "DELETE FROM":
            return self._delete(s)
        if kw == "UPDATE":
            return self._update(s)
        if kw == "INSERT":
            return self._insert(s)
        if m := re.match(r"TRUNCATE\s+TABLE\s+([\w.]+)\s*$", s, re.I):
            # metadata-only: every live data file drops in one commit (the
            # DeleteFromTable-with-true-predicate fast path); history and
            # identity survive, time travel still reaches old rows
            from . import expressions as _E

            t = self.catalog.load_table(m.group(1))
            t.delete_where(_E.ALWAYS_TRUE)
            return self._empty()
        if re.match(r"CREATE\s+(OR\s+REPLACE\s+)?VIEW", s, re.I):
            return self._create_view(s)
        if re.match(r"DROP\s+VIEW", s, re.I):
            return self._drop_view(s)
        if re.match(r"SHOW\s+VIEWS", s, re.I):
            return self._rows([Row(name=v) for v in V.list_views(self.catalog)],
                              "name string")
        if re.match(r"CREATE\s+(OR\s+REPLACE\s+)?FUNCTION", s, re.I):
            return self._create_function(s)
        if re.match(r"DROP\s+FUNCTION", s, re.I):
            m = re.match(r"DROP\s+FUNCTION\s+(?:IF\s+EXISTS\s+)?([\w.]+)", s, re.I)
            V.drop_function(self.catalog, m.group(1))
            return self._empty()
        if re.match(r"SHOW\s+FUNCTIONS", s, re.I):
            return self._rows([Row(name=f) for f in V.list_functions(self.catalog)],
                              "name string")
        if re.match(r"SHOW\s+TABLES", s, re.I):
            m = re.match(r"SHOW\s+TABLES(?:\s+IN\s+([\w.]+))?", s, re.I)
            ns = m.group(1) or ""
            return self._rows([Row(namespace=".".join(t.split(".")[:-1]),
                                   tableName=t.split(".")[-1])
                               for t in self.catalog.list_tables(ns)],
                              "namespace string, tableName string")
        if re.match(r"CREATE\s+(NAMESPACE|DATABASE|SCHEMA)", s, re.I):
            m = re.match(r"CREATE\s+(?:NAMESPACE|DATABASE|SCHEMA)\s+"
                         r"(?:IF\s+NOT\s+EXISTS\s+)?([\w.]+)", s, re.I)
            self.catalog.create_namespace(
                m.group(1), exists_ok=bool(re.search(r"IF\s+NOT\s+EXISTS", s, re.I)))
            return self._empty()
        if re.match(r"DROP\s+(NAMESPACE|DATABASE|SCHEMA)", s, re.I):
            m = re.match(r"DROP\s+(?:NAMESPACE|DATABASE|SCHEMA)\s+"
                         r"(?:IF\s+EXISTS\s+)?([\w.]+)", s, re.I)
            self.catalog.drop_namespace(m.group(1))
            return self._empty()
        if re.match(r"SHOW\s+(NAMESPACES|DATABASES|SCHEMAS)", s, re.I):
            return self._rows([Row(namespace=n)
                               for n in self.catalog.list_namespaces()],
                              "namespace string")
        # introspection statements: intercept only CATALOG tables — temp
        # views / non-catalog relations keep the spark.sql passthrough
        if m := re.match(r"DESCRIBE\s+(?:TABLE\s+)?"
                         r"(EXTENDED\s+|FORMATTED\s+)?([\w.]+)\s*$", s, re.I):
            if self.catalog.table_exists(m.group(2)):
                return self._describe(m.group(2), extended=bool(m.group(1)))
        if m := re.match(r"SHOW\s+TBLPROPERTIES\s+([\w.]+)"
                         r"(?:\s*\(\s*'([^']+)'\s*\))?\s*$", s, re.I):
            if self.catalog.table_exists(m.group(1)):
                t = self._load(m.group(1))
                props = dict(t.metadata.properties or {})
                if m.group(2) is not None:  # single-key form
                    k = m.group(2)
                    if k not in props:
                        # match Spark: an unset key yields a message value,
                        # distinguishable from a property literally "None"
                        return self._rows(
                            [Row(key=k, value=(
                                f"Table {m.group(1)} does not have property: "
                                f"{k}"))],
                            "key string, value string")
                    return self._rows(
                        [Row(key=k, value=str(props[k]))],
                        "key string, value string")
                return self._rows(
                    [Row(key=k, value=str(v)) for k, v in sorted(props.items())],
                    "key string, value string")
        if m := re.match(r"SHOW\s+PARTITIONS\s+([\w.]+)(\s+PARTITION\b.*)?\s*$",
                         s, re.I):
            if self.catalog.table_exists(m.group(1)):
                if m.group(2):
                    raise NotImplementedError(
                        "SHOW PARTITIONS ... PARTITION (spec) filters are "
                        "not supported; filter the result instead")
                t = self._load(m.group(1))
                if not t.spec.fields:
                    raise ValueError(
                        f"SHOW PARTITIONS: table {m.group(1)} is not partitioned")
                return (t.metadata_table("partitions")
                        .select("partition", "spec_id", "record_count",
                                "file_count")
                        .orderBy("partition"))
        if m := re.match(r"SHOW\s+CREATE\s+TABLE\s+([\w.]+)\s*$", s, re.I):
            if self.catalog.table_exists(m.group(1)):
                return self._rows(
                    [Row(createtab_stmt=self._create_stmt(m.group(1)))],
                    "createtab_stmt string")
        if re.match(r"CREATE\s+(?:OR\s+REPLACE\s+)?TABLE", s, re.I):
            return self._create_table(s)
        if m := re.match(r"REPLACE\s+TABLE\s+([\w.]+)", s, re.I):
            # Spark's REPLACE TABLE ... AS SELECT: like OR REPLACE but the
            # table must already exist
            if not self.catalog.table_exists(m.group(1)):
                raise ValueError(
                    f"REPLACE TABLE: no such table: {m.group(1)}")
            return self._create_table("CREATE OR " + s)
        if re.match(r"DROP\s+TABLE", s, re.I):
            m = re.match(r"DROP\s+TABLE\s+(IF\s+EXISTS\s+)?([\w.]+)"
                         r"(\s+PURGE)?\s*$", s, re.I)
            if not m:
                raise ValueError(f"cannot parse DROP TABLE: {s[:60]!r}")
            dropped = self.catalog.drop_table(
                m.group(2), purge=bool(m.group(3)))
            if not dropped and not m.group(1):
                raise ValueError(f"no such table: {m.group(2)}")
            return self._empty()
        # SELECT / WITH / EXPLAIN / SHOW ... -> delegate after resolution
        return self.spark.sql(self._resolve(s))

    # -- helpers -------------------------------------------------------------
    def _describe(self, ident: str, extended: bool = False) -> DataFrame:
        """DESCRIBE [EXTENDED] — Spark DSv2 describe output shape:
        columns, then # Partitioning, then (extended) table metadata."""
        from .schema import type_to_spark

        def _sql_type(ty):
            return ty if isinstance(ty, str) else type_to_spark(ty).simpleString()

        t = self._load(ident)
        rows = [Row(col_name=f.name, data_type=_sql_type(f.type),
                    comment=f.doc or "")
                for f in t.schema.fields]
        if t.spec.fields:
            rows.append(Row(col_name="# Partitioning", data_type="", comment=""))
            for i, pf in enumerate(t.spec.fields):
                rows.append(Row(col_name=f"Part {i}",
                                data_type=pf.transform.to_str()
                                + f"({pf.source_name})", comment=""))
        if extended:
            m = t.metadata
            snap = m.current_snapshot()
            rows += [
                Row(col_name="# Metadata", data_type="", comment=""),
                Row(col_name="Location", data_type=m.location, comment=""),
                Row(col_name="Table UUID", data_type=str(m.table_uuid), comment=""),
                # kwargs map POSITIONALLY onto the result schema — keep
                # the (col_name, data_type, comment) order
                Row(col_name="Current Snapshot",
                    data_type=str(snap.snapshot_id) if snap else "",
                    comment=""),
                Row(col_name="Schema ID", data_type=str(m.schema.schema_id),
                    comment=""),
                Row(col_name="Spec ID", data_type=str(m.spec.spec_id), comment=""),
            ]
        return self._rows(rows, "col_name string, data_type string, comment string")

    def _create_stmt(self, ident: str) -> str:
        from .schema import type_to_spark

        t = self._load(ident)
        cols = ",\n  ".join(
            f"{f.name} "
            + (f.type if isinstance(f.type, str)
               else type_to_spark(f.type).simpleString())
            for f in t.schema.fields)
        stmt = f"CREATE TABLE {ident} (\n  {cols})"
        if t.spec.fields:
            parts = ", ".join(
                f.source_name if f.transform.to_str() == "identity"
                else f"{f.transform.to_str()}({f.source_name})"
                for f in t.spec.fields)
            stmt += f"\nPARTITIONED BY ({parts})"
        props = dict(t.metadata.properties or {})
        if props:
            kv = ", ".join(f"'{k}' = '{v}'" for k, v in sorted(props.items()))
            stmt += f"\nTBLPROPERTIES ({kv})"
        return stmt

    def _empty(self) -> DataFrame:
        return self.spark.createDataFrame([], "result string")

    def _rows(self, rows, schema) -> DataFrame:
        return self.spark.createDataFrame(rows, schema)

    def _tmp(self, prefix="isq") -> str:
        self._seq += 1
        return f"__{prefix}_{self._seq}"

    def _load(self, ident: str):
        return self.catalog.load_table(ident)

    def _table_df(self, ident: str, snapshot_id=None, as_of=None, ref=None):
        t = self._load(ident)
        return t.scan(snapshot_id=snapshot_id, as_of_timestamp_ms=as_of,
                      ref=ref).df()

    def _pushable_filter(self, s: str, ident: str):
        """Best-effort metadata-pruning pushdown for delegated SELECTs: when
        the statement is a single-table `... FROM <ident> [alias] WHERE
        <pred> ...` and the predicate parses into the expression algebra,
        return it so the scan plans with file pruning. The full WHERE still
        runs in Spark (residual re-application), so a parse miss only costs
        pruning, never correctness. Naive TIMESTAMP literals are shifted
        from spark.sql.session.timeZone to the engine's UTC stats domain so
        pruning never disagrees with Spark's literal semantics (ADVICE r1)."""
        m = re.search(
            rf"FROM\s+{re.escape(ident)}(?:\s+(?:AS\s+)?\w+)?\s+WHERE\s+(.*?)"
            r"(?:\s+GROUP\s+BY|\s+ORDER\s+BY|\s+LIMIT\s|\s*$)",
            s, re.I | re.S)
        if not m:
            return None
        if re.search(r"\bJOIN\b", s, re.I):
            return None
        try:
            expr = parse_predicate(m.group(1).strip())
        except Exception:
            return None
        tz = self.spark.conf.get("spark.sql.session.timeZone", "UTC")
        if tz in ("UTC", "Etc/UTC", "GMT", "Z", "+00:00"):
            return expr  # no shift needed; skip the schema load entirely
        try:
            schema = self._load(ident).schema
        except Exception:
            schema = None
        return _shift_ts_literals(expr, tz, schema)

    @staticmethod
    def _sub_relations(body: str, rel_sub) -> str:
        """Rewrite relation identifiers only where a relation can appear:
        directly after FROM/JOIN, and through comma-separated FROM lists
        (`FROM db.a, db.b alias, db.c`). Substituted relations with no user
        alias are re-aliased with the identifier's terminal name so
        table-qualified column references (`SELECT orders.o_orderkey FROM
        ns.orders`) keep resolving. A '(' in relation position (subquery /
        parenthesized join) is left in place — the scan continues inside it
        and inner FROM/JOINs are rewritten on their own."""
        ident_re = re.compile(r"[A-Za-z_][\w.]*")
        alias_re = re.compile(r"\s+(?:AS\s+)?([A-Za-z_]\w*)", re.I)
        out, pos, n = [], 0, len(body)
        for kw in re.finditer(r"(?i)\b(FROM|JOIN)\b", body):
            if kw.start() < pos:
                continue
            out.append(body[pos:kw.end()])
            pos = kw.end()
            is_from = kw.group(1).upper() == "FROM"
            while True:
                i = pos
                while i < n and body[i].isspace():
                    i += 1
                rm = ident_re.match(body, i)
                if not rm:
                    break  # subquery / VALUES / end — leave for inner pass
                ident = rm.group(0)
                rep = rel_sub(ident)
                am = alias_re.match(body, rm.end())
                alias = am.group(1) if am and \
                    am.group(1).upper() not in _NOT_ALIAS else None
                end = am.end() if alias else rm.end()
                if rep is None:
                    out.append(body[pos:end])
                elif alias:
                    # user alias wins; qualified refs use it already
                    out.append(body[pos:rm.start()] + rep + body[rm.end():end])
                else:
                    out.append(body[pos:rm.start()] + rep
                               + " AS " + ident.split(".")[-1])
                pos = end
                if not is_from:
                    break
                j = pos
                while j < n and body[j].isspace():
                    j += 1
                if j < n and body[j] == ",":
                    out.append(body[pos:j + 1])
                    pos = j + 1
                else:
                    break
        out.append(body[pos:])
        return "".join(out)

    # -- resolution (ResolveViews / time travel / metadata tables) -----------
    def _resolve(self, s: str, _depth: int = 0) -> str:
        if _depth > 10:
            raise ValueError("view expansion too deep (cycle?)")
        # protect string literals from identifier rewriting
        strings: list = []

        def protect(m):
            strings.append(m.group(0))
            return f"\x00{len(strings) - 1}\x00"

        body = _STRING_RE.sub(protect, s)

        def unprotect(text):
            return re.sub(r"\x00(\d+)\x00", lambda m: strings[int(m.group(1))], text)

        # time travel:  <ident> VERSION AS OF <n|'ref'> | TIMESTAMP AS OF <ts>
        def tt(m):
            ident, mode, raw = m.group(1), m.group(2).upper(), unprotect(m.group(3))
            if not self.catalog.table_exists(ident):
                return m.group(0)
            name = self._tmp("tt")
            if mode.startswith("VERSION") or mode.startswith("SYSTEM_VERSION"):
                if raw.startswith("'"):
                    df = self._table_df(ident, ref=raw.strip("'"))
                else:
                    df = self._table_df(ident, snapshot_id=int(raw))
            else:
                raw = raw.strip("'")
                try:
                    ts = int(raw)
                except ValueError:
                    dt = _dt.datetime.fromisoformat(raw)
                    if dt.tzinfo is None:
                        dt = dt.replace(tzinfo=_dt.timezone.utc)
                    ts = int(dt.timestamp() * 1000)
                df = self._table_df(ident, as_of=ts)
            df.createOrReplaceTempView(name)
            return f" {name} "

        body = re.sub(
            r"([\w.]+)\s+(?:FOR\s+)?(VERSION|SYSTEM_VERSION|TIMESTAMP|SYSTEM_TIME)\s+AS\s+OF\s+(\x00\d+\x00|\S+)",
            tt, body, flags=re.I)

        # relation identifiers (tables / views / metadata tables) are only
        # rewritten in FROM/JOIN positions — rewriting every identifier
        # turned colliding bare names and table-qualified column references
        # (SELECT orders.o_orderkey FROM ns.orders) into UNRESOLVED_COLUMN
        def rel_sub(ident):
            if self.catalog.table_exists(ident):
                name = self._tmp("tbl")
                df = None
                flt = self._pushable_filter(s, ident)
                if flt is not None:
                    try:
                        df = self._load(ident).scan(filter=flt).df()
                    except Exception:
                        df = None  # unbindable predicate -> full scan
                if df is None:
                    df = self._table_df(ident)
                df.createOrReplaceTempView(name)
                return name
            parts = ident.rsplit(".", 1)
            if len(parts) == 2 and parts[1].lower() in METADATA_TABLES \
                    and self.catalog.table_exists(parts[0]):
                name = self._tmp("meta")
                self._load(parts[0]).metadata_table(parts[1].lower()) \
                    .createOrReplaceTempView(name)
                return name
            vm = V.load_view(self.catalog, ident)
            if vm is not None:
                return f"({self._resolve(vm.sql, _depth + 1)})"
            return None

        body = self._sub_relations(body, rel_sub)

        # stored SQL UDF / UDTF call sites: identifier directly before '('
        def fn_sub(m):
            ident = m.group(1)
            fm = V.load_function(self.catalog, ident)
            if fm is None and "." not in ident:
                # bare name -> unique stored function with that final part
                hits = [f for f in V.list_functions(self.catalog)
                        if f.split(".")[-1] == ident]
                if len(hits) == 1:
                    fm = V.load_function(self.catalog, hits[0])
            if fm is not None:
                return V.materialize_function(
                    self.spark, fm,
                    resolver=lambda b: self._resolve(b, _depth + 1)
                ) + m.group(2)
            return m.group(0)

        body = re.sub(r"([A-Za-z_][\w.]*)(\s*\()", fn_sub, body)
        return unprotect(body)

    # -- CALL ----------------------------------------------------------------
    def _call(self, s: str) -> DataFrame:
        m = re.match(r"CALL\s+([\w.]+)\s*\((.*)\)\s*$", s, re.I | re.S)
        if not m:
            raise ValueError(f"cannot parse CALL: {s}")
        proc = m.group(1).split(".")[-1].lower()
        args = self._parse_call_args(m.group(2))
        fn = getattr(self, f"_proc_{proc}", None)
        if fn is None:
            raise ValueError(f"unknown procedure: {proc}")
        return fn(args)

    def _parse_call_args(self, raw: str):
        pos, named = [], {}
        for part in self._split_args(raw):
            part = part.strip()
            if not part:
                continue
            m = re.match(r"(\w+)\s*=>\s*(.*)$", part, re.S)
            if m:
                named[m.group(1).lower()] = self._call_value(m.group(2).strip())
            else:
                pos.append(self._call_value(part))
        return {"pos": pos, "named": named}

    @staticmethod
    def _split_args(raw: str) -> list:
        out, depth, cur, in_str = [], 0, [], False
        for ch in raw:
            if in_str:
                cur.append(ch)
                if ch == "'":
                    in_str = False
                continue
            if ch == "'":
                in_str = True
                cur.append(ch)
            elif ch == "(":
                depth += 1
                cur.append(ch)
            elif ch == ")":
                depth -= 1
                cur.append(ch)
            elif ch == "," and depth == 0:
                out.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        if cur:
            out.append("".join(cur))
        return out

    @staticmethod
    def _call_value(v: str):
        if v.startswith("'") and v.endswith("'"):
            return v[1:-1].replace("''", "'")
        low = v.lower()
        if low in ("true", "false"):
            return low == "true"
        if low == "null":
            return None
        m = re.match(r"(?:TIMESTAMP|DATE)\s+'([^']+)'", v, re.I)
        if m:
            return m.group(1)
        m = re.match(r"(?:ARRAY|array)\s*\((.*)\)$", v, re.S)
        if m:
            return [SqlEngine._call_value(x.strip())
                    for x in SqlEngine._split_args(m.group(1))]
        m = re.match(r"(?:MAP|map)\s*\((.*)\)$", v, re.S)
        if m:
            items = [SqlEngine._call_value(x.strip())
                     for x in SqlEngine._split_args(m.group(1))]
            return dict(zip(items[0::2], items[1::2]))
        try:
            return int(v)
        except ValueError:
            pass
        try:
            return float(v)
        except ValueError:
            pass
        return v

    @staticmethod
    def _arg(args, name, idx, default=None):
        if name in args["named"]:
            return args["named"][name]
        if idx is not None and idx < len(args["pos"]):
            return args["pos"][idx]
        return default

    def _ts_ms(self, v) -> int:
        if isinstance(v, (int, float)):
            return int(v if v > 10_000_000_000 else v * 1000)
        dt = _dt.datetime.fromisoformat(str(v))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=_dt.timezone.utc)
        return int(dt.timestamp() * 1000)

    # procedures (SparkProcedures.java:42-62) --------------------------------
    def _proc_rollback_to_snapshot(self, a):
        t = self._load(self._arg(a, "table", 0))
        prev = t.current_snapshot().snapshot_id
        sid = int(self._arg(a, "snapshot_id", 1))
        t.manage_snapshots().rollback_to(sid)
        return self._rows([Row(previous_snapshot_id=prev, current_snapshot_id=sid)],
                          "previous_snapshot_id long, current_snapshot_id long")

    def _proc_rollback_to_timestamp(self, a):
        t = self._load(self._arg(a, "table", 0))
        prev = t.current_snapshot().snapshot_id
        ts = self._ts_ms(self._arg(a, "timestamp", 1))
        t.manage_snapshots().rollback_to_timestamp(ts)
        return self._rows(
            [Row(previous_snapshot_id=prev,
                 current_snapshot_id=t.current_snapshot().snapshot_id)],
            "previous_snapshot_id long, current_snapshot_id long")

    def _proc_set_current_snapshot(self, a):
        t = self._load(self._arg(a, "table", 0))
        prev = t.current_snapshot().snapshot_id
        sid = int(self._arg(a, "snapshot_id", 1))
        t.manage_snapshots().set_current_snapshot(sid)
        return self._rows([Row(previous_snapshot_id=prev, current_snapshot_id=sid)],
                          "previous_snapshot_id long, current_snapshot_id long")

    def _proc_cherrypick_snapshot(self, a):
        t = self._load(self._arg(a, "table", 0))
        sid = int(self._arg(a, "snapshot_id", 1))
        t.manage_snapshots().cherrypick(sid)
        return self._rows(
            [Row(source_snapshot_id=sid,
                 current_snapshot_id=t.current_snapshot().snapshot_id)],
            "source_snapshot_id long, current_snapshot_id long")

    def _proc_publish_changes(self, a):
        """Cherry-pick the staged snapshot carrying the given WAP id."""
        t = self._load(self._arg(a, "table", 0))
        wap = str(self._arg(a, "wap_id", 1))
        snap = next((s for s in t.snapshots()
                     if s.summary.get("wap.id") == wap), None)
        if snap is None:
            raise ValueError(f"no snapshot with wap.id={wap}")
        t.manage_snapshots().cherrypick(snap.snapshot_id)
        return self._rows(
            [Row(source_snapshot_id=snap.snapshot_id,
                 current_snapshot_id=t.current_snapshot().snapshot_id)],
            "source_snapshot_id long, current_snapshot_id long")

    def _proc_fast_forward(self, a):
        t = self._load(self._arg(a, "table", 0))
        branch = self._arg(a, "branch", 1)
        to = self._arg(a, "to", 2)
        prev = t.refs().get(branch)
        t.manage_snapshots().fast_forward(branch, to)
        return self._rows(
            [Row(branch_updated=branch,
                 previous_ref=prev.snapshot_id if prev else None,
                 updated_ref=t.refs()[branch].snapshot_id)],
            "branch_updated string, previous_ref long, updated_ref long")

    def _proc_ancestors_of(self, a):
        t = self._load(self._arg(a, "table", 0))
        sid = self._arg(a, "snapshot_id", 1)
        sid = int(sid) if sid is not None else t.metadata.current_snapshot_id
        rows = [Row(snapshot_id=s.snapshot_id, timestamp=s.timestamp_ms)
                for s in t.metadata.ancestors_of(sid)]
        return self._rows(rows, "snapshot_id long, timestamp long")

    def _proc_expire_snapshots(self, a):
        t = self._load(self._arg(a, "table", 0))
        sids = self._arg(a, "snapshot_ids", 4)
        res = t.expire_snapshots(
            older_than_ms=(self._ts_ms(self._arg(a, "older_than", 1))
                           if self._arg(a, "older_than", 1) is not None else None),
            retain_last=int(self._arg(a, "retain_last", 2, 1)),
            clean_expired_metadata=bool(
                self._arg(a, "clean_expired_metadata", 3, False)),
            expire_snapshot_ids=([int(s) for s in sids]
                                 if sids is not None else None))
        return self._rows([Row(deleted_data_files_count=res.get("deleted_data_files", 0),
                               deleted_manifest_files_count=res.get("deleted_manifests", 0),
                               expired_snapshots_count=res.get("expired_snapshots", 0),
                               removed_partition_specs_count=res.get(
                                   "removed_partition_specs", 0),
                               removed_schemas_count=res.get("removed_schemas", 0))],
                          "deleted_data_files_count long, "
                          "deleted_manifest_files_count long, "
                          "expired_snapshots_count long, "
                          "removed_partition_specs_count long, "
                          "removed_schemas_count long")

    def _proc_remove_orphan_files(self, a):
        t = self._load(self._arg(a, "table", 0))
        older = self._arg(a, "older_than", 1)
        removed = t.remove_orphan_files(
            older_than_ms=self._ts_ms(older) if older is not None else None,
            dry_run=bool(self._arg(a, "dry_run", 2, False)),
            prefix_mismatch_mode=str(
                self._arg(a, "prefix_mismatch_mode", 3, "error")).lower())
        return self._rows([Row(orphan_file_location=p) for p in removed],
                          "orphan_file_location string")

    def _proc_rewrite_data_files(self, a):
        t = self._load(self._arg(a, "table", 0))
        strategy = self._arg(a, "strategy", 1, "binpack")
        sort_order = self._arg(a, "sort_order", 2)
        kw = {}
        if sort_order:
            if strategy == "binpack":
                strategy = "sort"
            kw["sort_by"] = [x.strip().split()[0] for x in str(sort_order).split(",")]
        where = self._arg(a, "where", None)
        if where:
            kw["filter"] = parse_predicate(where)
        # reference option names (RewriteDataFilesProcedure options map)
        opts = self._arg(a, "options", None, {}) or {}
        if "delete-file-threshold" in opts:
            kw["delete_file_threshold"] = int(opts["delete-file-threshold"])
        if str(opts.get("partial-progress.enabled", "")).lower() == "true":
            kw["partial_progress"] = True
        if "partial-progress.max-commits" in opts:
            kw["partial_progress_max_commits"] = int(
                opts["partial-progress.max-commits"])
        if "min-input-files" in opts:
            kw["min_input_files"] = int(opts["min-input-files"])
        if "target-file-size-bytes" in opts:
            kw["target_file_size"] = int(opts["target-file-size-bytes"])
        res = t.rewrite_data_files(strategy=strategy, **kw)
        return self._rows(
            [Row(rewritten_data_files_count=res.get("rewritten_data_files", 0),
                 added_data_files_count=res.get("added_data_files", 0),
                 rewritten_bytes_count=res.get("rewritten_bytes", 0))],
            "rewritten_data_files_count long, added_data_files_count long, "
            "rewritten_bytes_count long")

    def _proc_rewrite_manifests(self, a):
        t = self._load(self._arg(a, "table", 0))
        res = t.rewrite_manifests()
        return self._rows(
            [Row(rewritten_manifests_count=res.get("rewritten_manifests", 0),
                 added_manifests_count=res.get("new_manifests", 0))],
            "rewritten_manifests_count long, added_manifests_count long")

    def _proc_rewrite_position_delete_files(self, a):
        from .maintenance import rewrite_position_delete_files

        t = self._load(self._arg(a, "table", 0))
        res = rewrite_position_delete_files(
            t, to_dvs=bool(self._arg(a, "to_dvs", 1, False)))
        return self._rows(
            [Row(rewritten_delete_files_count=res.get("rewritten_delete_files", 0),
                 added_delete_files_count=res.get("added_delete_files", 0))],
            "rewritten_delete_files_count long, added_delete_files_count long")

    def _proc_rewrite_table_path(self, a):
        from .maintenance import rewrite_table_path

        t = self._load(self._arg(a, "table", 0))
        res = rewrite_table_path(
            t, self._arg(a, "source_prefix", 1),
            self._arg(a, "target_prefix", 2),
            staging_dir=self._arg(a, "staging_location", 3))
        return self._rows(
            [Row(latest_version=res["staging_location"],
                 file_list_location=str(len(res["data_files_to_copy"])))],
            "latest_version string, file_list_location string")

    def _proc_compute_table_stats(self, a):
        t = self._load(self._arg(a, "table", 0))
        cols = self._arg(a, "columns", 1)
        res = t.compute_table_stats(columns=cols)
        return self._rows([Row(statistics_file=str(res))], "statistics_file string")

    def _proc_compute_partition_stats(self, a):
        from .maintenance import compute_partition_stats

        t = self._load(self._arg(a, "table", 0))
        path = compute_partition_stats(t)
        return self._rows([Row(statistics_file=path)], "statistics_file string")

    def _proc_analyze_variant_shredding(self, a):
        # sample a variant column, derive + persist the shredding spec
        # (reference VariantShreddingAnalyzer analog; maintenance.py)
        from .maintenance import analyze_variant_shredding

        t = self._load(self._arg(a, "table", 0))
        col_name = self._arg(a, "column", 1)
        spec = analyze_variant_shredding(t, col_name)
        return self._rows([Row(shred_spec=spec)], "shred_spec string")

    def _proc_add_files(self, a):
        t = self._load(self._arg(a, "table", 0))
        src = self._arg(a, "source_table", 1)
        if isinstance(src, str) and src.startswith("`"):
            src = src.strip("`")
        path = re.sub(r"^parquet\.", "", str(src))
        before = t.current_snapshot()
        snap = t.add_files(path)
        added = int(snap.summary.get("added-data-files", "0"))
        return self._rows(
            [Row(added_files_count=added, changed_partition_count=None)],
            "added_files_count long, changed_partition_count long")

    def _proc_register_table(self, a):
        ident = self._arg(a, "table", 0)
        metadata_file = self._arg(a, "metadata_file", 1)
        import os as _os
        import json as _json

        # a REFERENCE-layout metadata JSON (Avro manifest lists) routes to
        # the full-history Iceberg importer; engine-layout tables (parquet
        # manifest lists) keep the direct registration below
        from . import io as _fio

        try:
            mj = _json.loads(_fio.read_text(metadata_file))
            mls = [s.get("manifest-list", "") for s in mj.get("snapshots", [])]
        except (OSError, ValueError):
            mls = []
        if mls and all(m.endswith(".avro") for m in mls):
            from .sources.iceberg import register_iceberg_table

            t, n_snaps, n_data = register_iceberg_table(
                self.catalog, metadata_file, ident)
            cur = t.current_snapshot()
            return self._rows(
                [Row(current_snapshot_id=cur.snapshot_id if cur else None,
                     total_records_count=None,
                     total_data_files_count=n_data)],
                "current_snapshot_id long, total_records_count long, "
                "total_data_files_count long")

        loc = self.catalog._location(ident)
        src_table_dir = _os.path.dirname(_os.path.dirname(metadata_file))
        if not self.catalog.io.is_dir(loc):
            _fio.copy_tree(src_table_dir, loc)
        t = self._load(ident)
        cur = t.current_snapshot()
        return self._rows(
            [Row(current_snapshot_id=cur.snapshot_id if cur else None,
                 total_records_count=int(cur.summary.get("total-records", "0")) if cur else 0,
                 total_data_files_count=None)],
            "current_snapshot_id long, total_records_count long, "
            "total_data_files_count long")

    def _proc_snapshot(self, a):
        """Create an engine table over an existing parquet location without
        moving files (SnapshotTableSparkAction.java:249 analog)."""
        src = self._arg(a, "source_table", 0)
        dest = self._arg(a, "table", 1)
        path = re.sub(r"^parquet\.", "", str(src)).strip("`")
        df = self.spark.read.parquet(path)
        # by-reference snapshot: the source still owns the files, so
        # file-deleting maintenance must refuse (SnapshotTableSparkAction
        # sets gc.enabled=false the same way)
        t = self.catalog.create_table(dest, df.schema,
                                      properties={"gc.enabled": "false"})
        t.add_files(path)
        return self._rows([Row(imported_files_count=None)],
                          "imported_files_count long")

    def _proc_migrate(self, a):
        """Like snapshot, then the source identifier points at the engine
        table (MigrateTableSparkAction.java:274 analog — here: same as
        snapshot with dest defaulting to the source name)."""
        src = self._arg(a, "table", 0)
        path = re.sub(r"^parquet\.", "", str(src)).strip("`")
        ident = re.sub(r"[^\w.]", "_", path.strip("/").replace("/", "_"))[-64:]
        df = self.spark.read.parquet(path)
        t = self.catalog.create_table(ident, df.schema, exists_ok=True)
        t.add_files(path)
        cnt = int(t.current_snapshot().summary.get("added-data-files", "0"))
        return self._rows([Row(migrated_files_count=cnt)],
                          "migrated_files_count long")

    def _proc_snapshot_delta_lake_table(self, a):
        """Snapshot a Delta Lake table into the engine by replaying its
        _delta_log (delta-lake/.../BaseSnapshotDeltaLakeTableAction.java:75
        analog): both unpartitioned and partitioned sources import by
        file reference — no data copied (see sources/delta.py)."""
        from .sources.delta import snapshot_delta_table

        src = self._arg(a, "source_table", 0)
        dest = self._arg(a, "table", 1)
        loc = re.sub(r"^delta\.", "", str(src)).strip("`")
        _t, n, rewritten = snapshot_delta_table(self.catalog, loc, dest)
        return self._rows(
            [Row(imported_files_count=n, rewritten=rewritten)],
            "imported_files_count long, rewritten boolean")

    def _proc_snapshot_iceberg_table(self, a):
        """Snapshot a GENUINE apache/iceberg table (metadata JSON + Avro
        manifest list/manifests, TableMetadataParser.java shape) into the
        engine by reference — the migration door for users coming from the
        reference implementation (see sources/iceberg.py)."""
        from .sources.iceberg import snapshot_iceberg_table

        src = self._arg(a, "source_table", 0)
        dest = self._arg(a, "table", 1)
        _t, n_data, n_del = snapshot_iceberg_table(
            self.catalog, str(src).strip("`"), dest)
        return self._rows(
            [Row(imported_data_files_count=n_data,
                 imported_delete_files_count=n_del)],
            "imported_data_files_count long, "
            "imported_delete_files_count long")

    def _proc_export_iceberg_metadata(self, a):
        """Write a reference-layout metadata tree (metadata JSON + Avro
        manifest list/manifests) for the table's current snapshot — or,
        with full_history => true, its whole main-branch history — so a
        genuine apache/iceberg reader can open it (sources/iceberg.py
        export_reference_metadata)."""
        from .sources.iceberg import export_reference_metadata

        t = self._load(self._arg(a, "table", 0))
        dest = self._arg(a, "location", 1)
        full = bool(self._arg(a, "full_history", None, False))
        path = export_reference_metadata(t, str(dest).strip("`"),
                                         full_history=full)
        return self._rows([Row(metadata_json=path)], "metadata_json string")

    def _proc_create_changelog_view(self, a):
        t = self._load(self._arg(a, "table", 0))
        opts = self._arg(a, "options", None, {}) or {}
        ident_cols = self._arg(a, "identifier_columns", None)
        compute_updates = bool(self._arg(a, "compute_updates", None, bool(ident_cols)))
        df = t.changes(
            from_snapshot_id=(int(opts["start-snapshot-id"])
                              if "start-snapshot-id" in opts else None),
            to_snapshot_id=(int(opts["end-snapshot-id"])
                            if "end-snapshot-id" in opts else None),
            compute_updates=compute_updates,
            identifier_columns=list(ident_cols) if ident_cols else None)
        name = self._arg(a, "changelog_view", None) \
            or f"{self._arg(a, 'table', 0).split('.')[-1]}_changes"
        df.createOrReplaceTempView(name)
        return self._rows([Row(changelog_view=name)], "changelog_view string")

    # -- ALTER TABLE ---------------------------------------------------------
    def _alter(self, s: str) -> DataFrame:
        m = re.match(r"ALTER\s+TABLE\s+([\w.]+)\s+(.*)$", s, re.I | re.S)
        if not m:
            raise ValueError(f"cannot parse: {s}")
        ident, rest = m.group(1), m.group(2).strip()
        t = self._load(ident)
        up = rest.upper()

        if up.startswith("ADD PARTITION FIELD"):
            body = rest[len("ADD PARTITION FIELD"):].strip()
            mm = re.match(r"(\w+)(?:\s*\(\s*(?:(\d+)\s*,\s*)?(\w+)\s*\))?"
                          r"(?:\s+AS\s+(\w+))?$", body, re.I)
            fn, n, colname, alias = mm.groups()
            u = t.update_spec()
            if colname is None:
                u.add_field(fn, "identity", alias)
            else:
                tr = f"{fn.lower()}[{n}]" if n else fn.lower()
                u.add_field(colname, tr, alias)
            u.commit()
            return self._empty()
        if up.startswith("DROP PARTITION FIELD"):
            body = rest[len("DROP PARTITION FIELD"):].strip()
            u = t.update_spec()
            # accept either the partition-field name or transform(col) form;
            # builder default names are <col> (identity) / <col>_<transform>
            mm = re.match(r"(\w+)\s*\(\s*(?:(\d+)\s*,\s*)?(\w+)\s*\)$", body)
            if mm:
                fn, n, colname = mm.groups()
                canon = {"years": "year", "months": "month", "days": "day",
                         "hours": "hour"}.get(fn.lower(), fn.lower())
                for cand in ({f"{colname}_{canon}_{n}"} if n
                             else {f"{colname}_{canon}", colname}):
                    u.remove_field(cand)
            else:
                u.remove_field(body)
            u.commit()
            return self._empty()
        if up.startswith("REPLACE PARTITION FIELD"):
            mm = re.match(r"REPLACE\s+PARTITION\s+FIELD\s+(\w+)\s+WITH\s+(.*)$",
                          rest, re.I | re.S)
            old, new = mm.group(1), mm.group(2).strip()
            u = t.update_spec().remove_field(old)
            mm2 = re.match(r"(\w+)(?:\s*\(\s*(?:(\d+)\s*,\s*)?(\w+)\s*\))?"
                           r"(?:\s+AS\s+(\w+))?$", new, re.I)
            fn, n, colname, alias = mm2.groups()
            if colname is None:
                u.add_field(fn, "identity", alias)
            else:
                u.add_field(colname, f"{fn.lower()}[{n}]" if n else fn.lower(), alias)
            u.commit()
            return self._empty()
        if up.startswith("SET IDENTIFIER FIELDS"):
            names = [x.strip() for x in rest[len("SET IDENTIFIER FIELDS"):].split(",")]
            t.set_identifier_fields(names)
            return self._empty()
        if up.startswith("DROP IDENTIFIER FIELDS"):
            t.set_identifier_fields([])
            return self._empty()
        mm = re.match(r"(?:CREATE|REPLACE|CREATE\s+OR\s+REPLACE)\s+(BRANCH|TAG)"
                      r"\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)"
                      r"(?:\s+AS\s+OF\s+VERSION\s+(\d+))?", rest, re.I)
        if mm:
            kind, name, ver = mm.groups()
            ms = t.manage_snapshots()
            if name in t.refs():
                ms.remove_ref(name)
            sid = int(ver) if ver else None
            if kind.upper() == "BRANCH":
                ms.create_branch(name, sid)
            else:
                ms.create_tag(name, sid)
            return self._empty()
        mm = re.match(r"DROP\s+(BRANCH|TAG)\s+(?:IF\s+EXISTS\s+)?(\w+)", rest, re.I)
        if mm:
            t.manage_snapshots().remove_ref(mm.group(2))
            return self._empty()
        if up.startswith("WRITE ORDERED BY"):
            body = rest[len("WRITE ORDERED BY"):].strip()
            fields = []
            for part in body.split(","):
                toks = part.split()
                direction = "desc" if len(toks) > 1 and toks[1].upper() == "DESC" else "asc"
                fields.append((toks[0], direction))
            t.replace_sort_order(*fields)
            return self._empty()
        if up.startswith("WRITE DISTRIBUTED BY PARTITION"):
            t.set_properties(**{"write.distribution-mode": "hash"})
            return self._empty()
        if up.startswith("WRITE UNORDERED"):
            t.set_properties(**{"write.distribution-mode": "none"})
            return self._empty()
        mm = re.match(r"SET\s+TBLPROPERTIES\s*\((.*)\)\s*$", rest, re.I | re.S)
        if mm:
            props = {}
            for part in self._split_args(mm.group(1)):
                k, v = part.split("=", 1)
                props[self._call_value(k.strip())] = self._call_value(v.strip())
            t.set_properties(**props)
            return self._empty()
        mm = re.match(r"ADD\s+COLUMNS?\s*\(?\s*(.*?)\)?\s*$", rest, re.I | re.S)
        if mm:
            u = t.update_schema()
            for part in self._split_args(mm.group(1)):
                toks = part.strip().split(None, 1)
                u.add_column(toks[0], toks[1].lower())
            u.commit()
            return self._empty()
        mm = re.match(r"DROP\s+COLUMNS?\s+(.*)$", rest, re.I)
        if mm:
            u = t.update_schema()
            for name in mm.group(1).split(","):
                u.drop_column(name.strip())
            u.commit()
            return self._empty()
        mm = re.match(r"RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)", rest, re.I)
        if mm:
            t.update_schema().rename_column(mm.group(1), mm.group(2)).commit()
            return self._empty()
        mm = re.match(r"ALTER\s+COLUMN\s+(\w+)\s+TYPE\s+(\w+)", rest, re.I)
        if mm:
            t.update_schema().update_column(mm.group(1), mm.group(2).lower()).commit()
            return self._empty()
        mm = re.match(r"ALTER\s+COLUMN\s+(\w+)\s+DROP\s+NOT\s+NULL", rest, re.I)
        if mm:
            t.update_schema().make_column_optional(mm.group(1)).commit()
            return self._empty()
        if re.match(r"ALTER\s+COLUMN\s+\w+\s+SET\s+NOT\s+NULL", rest, re.I):
            # reference Spark DDL rejects this too (SparkAlterTable):
            # requiring an optional column risks breaking existing rows
            raise ValueError(
                "SET NOT NULL is not supported: existing rows may hold "
                "nulls; use UpdateSchema.require_column("
                "allow_incompatible_changes=True) to force it")
        raise ValueError(f"unsupported ALTER TABLE clause: {rest}")

    # -- row-level -----------------------------------------------------------
    def _delete(self, s: str) -> DataFrame:
        m = re.match(r"DELETE\s+FROM\s+([\w.]+)(?:\s+WHERE\s+(.*))?$", s, re.I | re.S)
        t = self._load(m.group(1))
        expr = parse_predicate(m.group(2)) if m.group(2) else E.ALWAYS_TRUE
        t.delete_where(expr)
        return self._empty()

    def _update(self, s: str) -> DataFrame:
        m = re.match(r"UPDATE\s+([\w.]+)\s+SET\s+(.*?)(?:\s+WHERE\s+(.*))?$",
                     s, re.I | re.S)
        t = self._load(m.group(1))
        assignments = {}
        for part in self._split_args(m.group(2)):
            k, v = part.split("=", 1)
            assignments[k.strip()] = v.strip()
        cond = parse_predicate(m.group(3)) if m.group(3) else E.ALWAYS_TRUE
        t.update(cond, assignments)
        return self._empty()

    def _merge(self, s: str) -> DataFrame:
        m = re.match(
            r"MERGE\s+INTO\s+([\w.]+)(?:\s+(?:AS\s+)?(\w+))?"
            r"\s+USING\s+(\([^)]*\)|[\w.]+)(?:\s+(?:AS\s+)?(\w+))?"
            r"\s+ON\s+(.*?)\s+(WHEN\s+.*)$",
            s, re.I | re.S)
        if not m:
            raise ValueError(f"cannot parse MERGE: {s}")
        tgt, tgt_alias, src, src_alias, on, clauses = m.groups()
        t = self._load(tgt)
        if src.startswith("("):
            source = self.spark.sql(self._resolve(src[1:-1]))
        elif self.catalog.table_exists(src):
            source = self._table_df(src)
        else:
            source = self.spark.table(src)
        tgt_alias = tgt_alias or tgt.split(".")[-1]
        src_alias = src_alias or (src.split(".")[-1] if not src.startswith("(") else "s")

        def realias(sqltext: Optional[str]) -> Optional[str]:
            if sqltext is None:
                return None
            out = re.sub(rf"\b{re.escape(tgt_alias)}\.", "t.", sqltext)
            return re.sub(rf"\b{re.escape(src_alias)}\.", "s.", out)

        b = t.merge(source, realias(on.strip()))
        clause_re = re.compile(
            r"WHEN\s+(MATCHED|NOT\s+MATCHED\s+BY\s+SOURCE|NOT\s+MATCHED(?:\s+BY\s+TARGET)?)"
            r"(?:\s+AND\s+(.*?))?\s+THEN\s+"
            r"(UPDATE\s+SET\s+.*?|DELETE|INSERT\s*\*|INSERT\s*\([^)]*\)\s*VALUES\s*\([^)]*\))"
            r"\s*(?=WHEN\s|$)", re.I | re.S)
        for cm in clause_re.finditer(clauses):
            kind = re.sub(r"\s+", " ", cm.group(1).upper())
            cond = realias(cm.group(2).strip()) if cm.group(2) else None
            action = cm.group(3).strip()
            aup = action.upper()
            if aup.startswith("UPDATE"):
                setters = {}
                for part in self._split_args(action[action.upper().index("SET") + 3:]):
                    k, v = part.split("=", 1)
                    k = re.sub(rf"^{re.escape(tgt_alias)}\.", "", k.strip())
                    setters[k.strip()] = realias(v.strip())
                if kind == "MATCHED":
                    b.when_matched_update(set=setters, condition=cond)
                else:
                    b.when_not_matched_by_source_update(set=setters, condition=cond)
            elif aup == "DELETE":
                if kind == "MATCHED":
                    b.when_matched_delete(condition=cond)
                else:
                    b.when_not_matched_by_source_delete(condition=cond)
            elif aup.startswith("INSERT *"):
                b.when_not_matched_insert(condition=cond)
            else:
                mm = re.match(r"INSERT\s*\(([^)]*)\)\s*VALUES\s*\(([^)]*)\)",
                              action, re.I | re.S)
                cols = [c.strip() for c in mm.group(1).split(",")]
                vals = [realias(v.strip()) for v in self._split_args(mm.group(2))]
                b.when_not_matched_insert(values=dict(zip(cols, vals)), condition=cond)
        b.execute()
        return self._empty()

    # -- INSERT / CREATE -----------------------------------------------------
    def _insert(self, s: str) -> DataFrame:
        m = re.match(r"INSERT\s+(INTO|OVERWRITE)\s+(?:TABLE\s+)?([\w.]+)"
                     r"(?:\s*\(([^)]*)\))?\s+(.*)$", s, re.I | re.S)
        mode, ident, cols, query = m.groups()
        t = self._load(ident)
        df = self.spark.sql(self._resolve(query))
        if cols:
            names = [c.strip() for c in cols.split(",")]
            df = df.toDF(*names)
        target_cols = t.schema.column_names
        have = set(df.columns)
        if set(target_cols) <= have:
            df = df.select(*target_cols)
        else:
            df = df.toDF(*target_cols)
        if mode.upper() == "OVERWRITE":
            if t.spec.is_partitioned:
                t.dynamic_partition_overwrite(df)
            else:
                t.overwrite(df)
        else:
            t.append(df)
        return self._empty()

    @staticmethod
    def _balanced(s: str, i: int):
        """s[i] must be '('; return (inner_text, index_after_close) honoring
        nesting and quoted strings."""
        depth, in_str, j = 0, False, i
        while j < len(s):
            ch = s[j]
            if in_str:
                if ch == "'":
                    in_str = False
            elif ch == "'":
                in_str = True
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    return s[i + 1:j], j + 1
            j += 1
        raise ValueError(f"unbalanced parentheses: {s[i:i+40]!r}")

    @staticmethod
    def _parse_part_col(p: str):
        """'col' / 'days(ts)' / 'bucket(4, id)' -> (col, canonical
        transform string) for comparing against PartitionField fields."""
        from .transforms import parse_transform

        m = re.match(r"^(\w+)\(\s*(?:(\d+)\s*,\s*)?(\w+)\s*\)$", p.strip())
        if not m:
            return p.strip(), "identity"
        fn, arg, col = m.groups()
        tr = f"{fn}[{arg}]" if arg else fn
        return col, parse_transform(tr).to_str()

    def _create_table(self, s: str) -> DataFrame:
        # hand-scanned (not one regex): coldefs / PARTITIONED BY / TBLPROPERTIES
        # all allow nested parens like days(ts) or decimal(10,2)
        replace = bool(re.match(r"CREATE\s+OR\s+REPLACE\s+TABLE", s, re.I))
        m = re.match(r"CREATE\s+(?:OR\s+REPLACE\s+)?TABLE\s+"
                     r"(?:IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*", s, re.I)
        ident = m.group(1)
        rest = s[m.end():].strip()
        coldefs = partby = props = select = None
        if rest.startswith("("):
            coldefs, j = self._balanced(rest, 0)
            rest = rest[j:].strip()
        while rest:
            mu = re.match(r"USING\s+\w+\s*", rest, re.I)
            if mu:
                rest = rest[mu.end():].strip()
                continue
            mp = re.match(r"PARTITIONED\s+BY\s*", rest, re.I)
            if mp:
                partby, j = self._balanced(rest, rest.index("(", mp.end() - 1))
                rest = rest[j:].strip()
                continue
            mt = re.match(r"TBLPROPERTIES\s*", rest, re.I)
            if mt:
                props, j = self._balanced(rest, rest.index("(", mt.end() - 1))
                rest = rest[j:].strip()
                continue
            ma = re.match(r"AS\s+", rest, re.I)
            if ma:
                select = rest[ma.end():]
                rest = ""
                continue
            raise ValueError(f"cannot parse CREATE TABLE near: {rest[:40]!r}")
        exists_ok = bool(re.search(r"IF\s+NOT\s+EXISTS", s, re.I))
        partition_by = ([p.strip() for p in self._split_args(partby)]
                        if partby else None)
        properties = {}
        if props:
            for part in self._split_args(props):
                k, v = part.split("=", 1)
                properties[self._call_value(k.strip())] = self._call_value(v.strip())
        if select:
            df = self.spark.sql(self._resolve(select))
            if replace and self.catalog.table_exists(ident):
                # RTAS (ReplaceTableAsSelect / createOrReplace): the table
                # keeps its identity — uuid, snapshot history, refs — and
                # gains ONE commit that swaps schema + spec + properties +
                # data together: union-by-name evolution in (new/widened
                # columns), columns absent from the SELECT dropped, the
                # PARTITIONED BY clause becomes the default spec, and
                # TBLPROPERTIES REPLACE the old set (not merge).
                t = self.catalog.load_table(ident)
                new_names = set(df.schema.names)
                stale = [f.name for f in t.schema.fields
                         if f.name not in new_names]

                def build(us):
                    us.union_by_name(df.schema)
                    for name in stale:
                        us.drop_column(name)
                    return us

                tx = t.transaction()
                tx.update_schema_with(build)
                want = [self._parse_part_col(p) for p in partition_by or []]
                have = [(f.source_name, f.transform.to_str())
                        for f in t.spec.fields]
                if want != have:
                    def build_spec(us, want=want):
                        for f in list(us.t.spec.fields):
                            us.remove_field(f.name)
                        for col, tr in want:
                            us.add_field(col, tr)
                        return us
                    tx.update_spec_with(build_spec)
                tx.overwrite(df)
                tx.replace_properties(properties)
                tx.commit_transaction()
                return self._empty()
            t = self.catalog.create_table(ident, df.schema,
                                          partition_by=partition_by,
                                          properties=properties or None,
                                          exists_ok=exists_ok)
            t.append(df)
            return self._empty()
        if replace and self.catalog.table_exists(ident):
            raise ValueError(
                "CREATE OR REPLACE TABLE on an existing table requires "
                "AS SELECT (schema-only replace is not supported)")
        if not coldefs:
            raise ValueError("CREATE TABLE needs column defs or AS SELECT")
        fields = []
        for part in self._split_args(coldefs):
            toks = part.strip().split(None, 1)
            typ = re.sub(r"\s+(NOT\s+NULL|COMMENT\s+.*)$", "", toks[1], flags=re.I)
            fields.append(f"{toks[0]} {typ}")
        spark_schema = T._parse_datatype_string(", ".join(fields))
        self.catalog.create_table(ident, spark_schema, partition_by=partition_by,
                                  properties=properties or None, exists_ok=exists_ok)
        return self._empty()

    # -- views / functions ---------------------------------------------------
    def _create_view(self, s: str) -> DataFrame:
        m = re.match(r"CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+([\w.]+)\s+AS\s+(.*)$",
                     s, re.I | re.S)
        replace_, ident, body = m.groups()
        self.spark.sql(self._resolve(body)).schema  # validate eagerly
        V.create_view(self.catalog, ident, body.strip(), replace=bool(replace_))
        return self._empty()

    def _drop_view(self, s: str) -> DataFrame:
        m = re.match(r"DROP\s+VIEW\s+(?:IF\s+EXISTS\s+)?([\w.]+)", s, re.I)
        V.drop_view(self.catalog, m.group(1))
        return self._empty()

    def _create_function(self, s: str) -> DataFrame:
        m = re.match(
            r"CREATE\s+(OR\s+REPLACE\s+)?FUNCTION\s+([\w.]+)\s*\(([^)]*)\)\s*"
            r"RETURNS\s+(.+?)\s+RETURN\s+(.*)$",
            s, re.I | re.S)
        if not m:
            raise ValueError(f"cannot parse CREATE FUNCTION: {s}")
        replace_, ident, params_raw, ret, body = m.groups()
        params = []
        for p in self._split_args(params_raw):
            if p.strip():
                n, t = p.strip().split(None, 1)
                params.append((n, t))
        meta = V.create_function(self.catalog, ident, params, ret.strip(),
                                 body.strip(), replace=bool(replace_))
        V.materialize_function(self.spark, meta,
                               resolver=lambda b: self._resolve(b))
        return self._empty()
