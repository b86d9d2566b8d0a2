"""Logical plan → SQL text (ref python/datafusion/unparser.py:27-80,
datafusion-sql unparser).

The reference unparses a DataFusion logical plan back to SQL in several
dialects. The Spark-native equivalent walks the Catalyst ANALYZED plan
(stable accessors, resolved attributes) and leans on Catalyst's own
``Expression.sql`` — every resolved expression node renders itself,
including aliases, casts, aggregate and window calls — so this module
only has to compose the relational shell: each operator becomes a
nested ``SELECT … FROM (child) AS t_n`` layer, which is dialect-neutral
ANSI apart from identifier quoting.

Supported relational core (the reference test surface): Project, Filter,
Aggregate (+HAVING as an outer filter), Sort, Global/LocalLimit, Offset,
Join (all types incl. cross/semi/anti), Union/Except/Intersect (ALL and
DISTINCT), Distinct/Deduplicate, Window, SubqueryAlias, Range,
OneRowRelation (FROM-less selects), and leaf relations (catalog tables
by name; file-scan relations as ``parquet.`path```). Anything else
raises NotImplementedError naming the node, never emitting wrong SQL.

Dialects map to identifier quoting: default/mysql keep Spark's
backticks; postgres/duckdb/sqlite rewrite them to double quotes.
"""

from __future__ import annotations

import re


def _seq(s) -> list:
    return [s.apply(i) for i in range(s.size())]


class _Unparse:
    def __init__(self, spark=None) -> None:
        self.n = 0
        self.spark = spark  # needed only to materialize LocalRelation rows

    def fresh(self) -> str:
        self.n += 1
        return f"__t{self.n}"

    # -- node dispatch ----------------------------------------------------
    def plan(self, p) -> str:
        name = p.getClass().getSimpleName()
        # strip Scala's trailing $ on case objects
        name = name.rstrip("$")
        fn = getattr(self, f"_{name.lower()}", None)
        if fn is None:
            raise NotImplementedError(
                f"unparse: unsupported plan node {name}; supported: project/"
                "filter/aggregate/sort/limit/offset/join/union/distinct/"
                "deduplicate/window/subqueryalias/range/relation leaves"
            )
        return fn(p)

    def _from(self, child) -> str:
        # Attribute SQL can render QUALIFIED (`t_sub`.`x`) when the child
        # is a named relation — the emitted FROM alias must match that
        # qualifier or the SQL re-parses with an unresolved column. Keep
        # the relation's own name visible instead of a fresh __tN.
        name = child.getClass().getSimpleName().rstrip("$")
        if name == "SubqueryAlias":
            return f"({self.plan(child.child())}) AS `{child.alias()}`"
        if name == "View":
            return child.desc().identifier().quotedString()
        if name == "LogicalRelation":
            ct = child.catalogTable()
            if ct.isDefined():
                return ct.get().identifier().quotedString()
        if name == "Join":
            # inline the join as a FROM fragment so both sides keep their
            # relation names — attribute SQL qualifies by those names
            return self._join_from(child)
        return f"({self.plan(child)}) AS {self.fresh()}"

    # -- leaves -----------------------------------------------------------
    def _logicalrelation(self, p) -> str:
        ct = p.catalogTable()
        if ct.isDefined():
            ident = ct.get().identifier()
            return f"SELECT * FROM {ident.quotedString()}"
        rel = p.relation()
        try:
            fmt = rel.fileFormat().toString().lower()
            paths = rel.location().rootPaths()
            path = paths.apply(0).toString()
        except Exception as e:  # non-file relation with no catalog entry
            raise NotImplementedError(
                f"unparse: nameless non-file relation {rel.toString()[:80]}"
            ) from e
        if "parquet" in fmt:
            fmt = "parquet"
        elif "csv" in fmt:
            fmt = "csv"
        elif "json" in fmt:
            fmt = "json"
        elif "orc" in fmt:
            fmt = "orc"
        return f"SELECT * FROM {fmt}.`{path}`"

    def _hivetablerelation(self, p) -> str:
        return f"SELECT * FROM {p.tableMeta().identifier().quotedString()}"

    def _view(self, p) -> str:
        return f"SELECT * FROM {p.desc().identifier().quotedString()}"

    def _range(self, p) -> str:
        return (
            f"SELECT id FROM range({p.start()}, {p.end()}, {p.step()})"
        )

    def _subqueryalias(self, p) -> str:
        alias = p.alias()
        return f"SELECT * FROM ({self.plan(p.child())}) AS `{alias}`"

    # -- unary relational nodes -------------------------------------------
    def _psql(self, e) -> str:
        # Catalyst aliases literal projections to their own text
        # (`1 AS `1``); strip the redundant alias so SELECT 1 unparses
        # as the reference's tests expect.
        if e.getClass().getSimpleName().rstrip("$") == "Alias":
            child_sql = e.child().sql()
            if child_sql == e.name():
                return child_sql
        return e.sql()

    def _project(self, p) -> str:
        cols = ", ".join(self._psql(e) for e in _seq(p.projectList()))
        child = p.child()
        if child.getClass().getSimpleName().rstrip("$") == "OneRowRelation":
            return f"SELECT {cols}"
        return f"SELECT {cols} FROM {self._from(child)}"

    def _filter(self, p) -> str:
        cond = p.condition().sql()
        return f"SELECT * FROM {self._from(p.child())} WHERE {cond}"

    def _aggregate(self, p) -> str:
        aggs = ", ".join(e.sql() for e in _seq(p.aggregateExpressions()))
        groups = [e.sql() for e in _seq(p.groupingExpressions())]
        sql = f"SELECT {aggs} FROM {self._from(p.child())}"
        if groups:
            sql += " GROUP BY " + ", ".join(groups)
        return sql

    def _window(self, p) -> str:
        base = [a.sql() for a in _seq(p.child().output())]
        wins = [e.sql() for e in _seq(p.windowExpressions())]
        cols = ", ".join(base + wins)
        return f"SELECT {cols} FROM {self._from(p.child())}"

    def _sort(self, p) -> str:
        order = ", ".join(o.sql() for o in _seq(p.order()))
        return f"SELECT * FROM {self._from(p.child())} ORDER BY {order}"

    def _globallimit(self, p) -> str:
        child = p.child()
        n = p.limitExpr().sql()
        if child.getClass().getSimpleName().rstrip("$") == "LocalLimit":
            child = child.child()
        return f"SELECT * FROM {self._from(child)} LIMIT {n}"

    def _locallimit(self, p) -> str:
        return f"SELECT * FROM {self._from(p.child())} LIMIT {p.limitExpr().sql()}"

    def _offset(self, p) -> str:
        return (
            f"SELECT * FROM {self._from(p.child())} OFFSET {p.offsetExpr().sql()}"
        )

    def _repartition(self, p) -> str:
        # physical layout only — no effect on the relational result
        return self.plan(p.child())

    def _repartitionbyexpression(self, p) -> str:
        return self.plan(p.child())

    def _distinct(self, p) -> str:
        return f"SELECT DISTINCT * FROM {self._from(p.child())}"

    def _deduplicate(self, p) -> str:
        keys = {a.name() for a in _seq(p.keys())}
        out = [a.name() for a in _seq(p.child().output())]
        if keys == set(out):
            return f"SELECT DISTINCT * FROM {self._from(p.child())}"
        raise NotImplementedError(
            "unparse: dropDuplicates on a key subset has no single-query "
            "ANSI form (needs row_number); deduplicate on all columns works"
        )

    def _resolvedhint(self, p) -> str:
        # join-strategy hints (broadcast/merge/…) are physical advice with
        # no semantic content — unparse the child; the receiving planner
        # re-derives its own strategy
        return self.plan(p.child())

    def _withcte(self, p) -> str:
        # analyzed CTEs are already inlined into the main plan
        return self.plan(p.plan())

    # -- binary / n-ary ----------------------------------------------------
    def _join_from(self, p) -> str:
        jt = p.joinType().sql()  # INNER / LEFT OUTER / LEFT SEMI / CROSS / ...
        left = self._from(p.left())
        right = self._from(p.right())
        cond = p.condition()
        on = f" ON {cond.get().sql()}" if cond.isDefined() else ""
        if not on and jt == "INNER":
            jt = "CROSS"
        return f"{left} {jt} JOIN {right}{on}"

    def _join(self, p) -> str:
        return f"SELECT * FROM {self._join_from(p)}"

    def _union(self, p) -> str:
        parts = [f"SELECT * FROM {self._from(c)}" for c in _seq(p.children())]
        return " UNION ALL ".join(parts)

    # -- local data: unparse as VALUES ------------------------------------
    def _sql_literal(self, v) -> str:
        import datetime

        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, (int, float)):
            return repr(v)
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        if isinstance(v, datetime.datetime):
            return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
        if isinstance(v, datetime.date):
            return f"DATE '{v.isoformat()}'"
        raise NotImplementedError(
            f"unparse: VALUES literal for type {type(v).__name__}"
        )

    def _localrelation(self, p) -> str:
        """In-memory data (from_pydict / createDataFrame) → VALUES form.
        LocalRelation rows are driver-resident by definition, so
        collecting them here is bounded."""
        if self.spark is None:
            raise NotImplementedError(
                "unparse: LocalRelation needs a SparkSession to render VALUES"
            )
        from pyspark.sql import DataFrame as SparkDF

        jdf = self.spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            self.spark._jsparkSession, p
        )
        pdf = SparkDF(jdf, self.spark)
        cols = ", ".join(f"`{c}`" for c in pdf.columns)
        rows = pdf.collect()
        alias = self.fresh()
        if not rows:  # typed empty relation
            attrs = _seq(p.output())
            nulls = ", ".join(
                f"CAST(NULL AS {a.dataType().sql()}) AS `{a.name()}`" for a in attrs
            )
            return f"SELECT {nulls} WHERE 1 = 0"
        vals = ", ".join(
            "(" + ", ".join(self._sql_literal(v) for v in row) + ")" for row in rows
        )
        return f"SELECT * FROM VALUES {vals} AS {alias}({cols})"

    def _except(self, p) -> str:
        op = "EXCEPT ALL" if p.isAll() else "EXCEPT"
        return (
            f"SELECT * FROM {self._from(p.left())} {op} "
            f"SELECT * FROM {self._from(p.right())}"
        )

    def _intersect(self, p) -> str:
        op = "INTERSECT ALL" if p.isAll() else "INTERSECT"
        return (
            f"SELECT * FROM {self._from(p.left())} {op} "
            f"SELECT * FROM {self._from(p.right())}"
        )


_QUOTE_DIALECTS = {"postgres", "duckdb", "sqlite"}


def plan_to_sql(plan, dialect: str = "default", pretty: bool = False) -> str:
    """Unparse a logical plan (our LogicalPlan / DataFrame wrappers or a
    pyspark DataFrame) to executable SQL text."""
    df = getattr(plan, "_df", plan)
    sdf = getattr(df, "df", df)
    jplan = sdf._jdf.queryExecution().analyzed()
    sql = _Unparse(spark=sdf.sparkSession).plan(jplan)
    if dialect in _QUOTE_DIALECTS:
        sql = re.sub(r"`([^`]*)`", r'"\1"', sql)
    if pretty:
        sql = sql.replace(" FROM ", "\nFROM ").replace(" WHERE ", "\nWHERE ")
        sql = sql.replace(" GROUP BY ", "\nGROUP BY ").replace(
            " ORDER BY ", "\nORDER BY "
        )
    return sql
