"""DataFusion-style plan rendering over Catalyst trees.

The reference displays plans in DataFusion's text formats — e.g.
``Projection: test.c1, sum(test.c2)`` / ``Aggregate: groupBy=[[...]],
aggr=[[...]]`` / ``TableScan: test projection=[c1, c2]`` for logical
plans and ``AggregateExec: mode=FinalPartitioned, ...`` for physical
ones (ref python/datafusion/plan.py display/display_indent and the
expected strings in tests/test_dataframe.py::test_logical_plan). This
module re-renders Spark's analyzed/optimized/executed Catalyst trees in
those shapes: the PLAN is Catalyst's (this engine's), only the display
grammar is DataFusion's.

Catalyst-vs-DataFusion shape notes encoded here:
- Catalyst collapses the internal read pipeline (casts, renames) into
  the scan; a ``SubqueryAlias``/``View`` boundary becomes
  ``TableScan: <name>`` and its subtree is not displayed.
- In optimized trees the alias nodes are gone; scan names resolve
  through expr_nodes.build_plan_env (exprId → base relation).
- Casts Catalyst inserts for type widening are rendered transparently
  inside expressions (DataFusion's displays show the coerced column).
"""

from __future__ import annotations

import re
from typing import Any

_INDENT = "  "


def _seq(s):
    return [s.apply(i) for i in range(s.size())]


def _simple(n) -> str:
    return str(n.getClass().getSimpleName())


def _strip_ticks(s: str) -> str:
    return s.replace("`", "")


class _Renderer:
    def __init__(self, jplan, env: dict | None = None) -> None:
        self.env = env or {}
        self.default_qualifier = self._find_qualifier(jplan)

    # -- qualifiers -----------------------------------------------------
    def _find_qualifier(self, jplan) -> str | None:
        """Single-scan plans qualify bare columns with the scan name."""
        names: list[str] = []

        def walk(p):
            nm = _simple(p)
            if nm == "SubqueryAlias":
                try:
                    names.append(str(p.alias()))
                    return  # the subtree below is the same relation
                except Exception:
                    pass
            if nm in ("View", "LogicalRelation", "HiveTableRelation"):
                base = self.env.get("base_by_exprid", {})
                if base:
                    try:
                        for a in _seq(p.output()):
                            n = base.get(a.exprId().id())
                            if n:
                                names.append(n)
                                return
                    except Exception:
                        pass
                return
            for c in _seq(p.children()):
                walk(c)

        try:
            walk(jplan)
        except Exception:
            pass
        uniq = sorted(set(names))
        return uniq[0] if len(uniq) == 1 else None

    def _dequalify(self, s: str) -> str:
        if self.default_qualifier:
            return s.replace(f"{self.default_qualifier}.", "")
        return s

    def qualify(self, name: str) -> str:
        if (
            self.default_qualifier is None
            or not re.fullmatch(r"\w+", name)
        ):
            return name  # already qualified, or not identifier-shaped
        return f"{self.default_qualifier}.{name}"

    # -- expressions ----------------------------------------------------
    def lit(self, jexpr) -> str:
        try:
            v = jexpr.value()
            t = str(jexpr.dataType().typeName())
        except Exception:
            return _strip_ticks(str(jexpr.sql()))
        arrow = {
            "integer": "Int32", "long": "Int64", "short": "Int16",
            "byte": "Int8", "double": "Float64", "float": "Float32",
            "string": "Utf8", "boolean": "Boolean",
        }.get(t)
        if v is None:
            return f"{arrow or t}(NULL)"
        if arrow == "Utf8":
            return f'Utf8("{v}")'
        if arrow:
            return f"{arrow}({v})"
        return str(v)

    def expr(self, jexpr) -> str:
        nm = _simple(jexpr)
        if nm in ("AttributeReference", "UnresolvedAttribute"):
            return self.qualify(_strip_ticks(str(jexpr.sql())))
        if nm == "Literal":
            return self.lit(jexpr)
        if nm == "Alias":
            child = jexpr.child()
            cnm = _simple(child)
            name = _strip_ticks(str(jexpr.name()))
            if cnm == "Literal":
                rendered = self.lit(child)
                return rendered if name == str(child.value()) else f"{rendered} AS {name}"
            rendered = self.expr(child)
            # coercion/qualification aliases Catalyst inserts are not
            # user aliases — compare qualifier-insensitively and keep
            # the qualified spelling
            if self._dequalify(name) == self._dequalify(rendered):
                return name if "." in name and "." not in rendered else rendered
            return f"{rendered} AS {name}"
        if nm == "Cast" or nm == "AnsiCast":
            return self.expr(jexpr.child())  # coercion casts stay silent
        if nm == "AggregateExpression":
            try:
                return self.expr(jexpr.aggregateFunction())
            except Exception:
                pass
        # function-ish nodes: name(child, ...)
        try:
            kids = _seq(jexpr.children())
        except Exception:
            kids = []
        sql = None
        try:
            sql = _strip_ticks(str(jexpr.sql()))
        except Exception:
            pass
        binops = {
            "Add": "+", "Subtract": "-", "Multiply": "*", "Divide": "/",
            "Remainder": "%", "EqualTo": "=", "LessThan": "<",
            "LessThanOrEqual": "<=", "GreaterThan": ">",
            "GreaterThanOrEqual": ">=", "And": "AND", "Or": "OR",
        }
        if nm in binops and len(kids) == 2:
            return f"{self.expr(kids[0])} {binops[nm]} {self.expr(kids[1])}"
        if kids:
            fn = nm.lower()
            m = re.match(r"(\w+)\s*\(", sql or "")
            if m:
                fn = m.group(1)
            return f"{fn}({', '.join(self.expr(k) for k in kids)})"
        return sql if sql is not None else nm

    # -- logical nodes --------------------------------------------------
    def node_line(self, p) -> tuple[str, list]:
        """(display line, children to recurse into)."""
        nm = _simple(p)
        kids = _seq(p.children())
        if nm == "Project":
            items = ", ".join(self.expr(e) for e in _seq(p.projectList()))
            return f"Projection: {items}", kids
        if nm == "Filter":
            return f"Filter: {self.expr(p.condition())}", kids
        if nm == "Aggregate":
            groups = [self.expr(e) for e in _seq(p.groupingExpressions())]
            aggs = []
            for e in _seq(p.aggregateExpressions()):
                r = self.expr(e)
                if r not in groups:
                    aggs.append(r)
            return (
                f"Aggregate: groupBy=[[{', '.join(groups)}]], "
                f"aggr=[[{', '.join(aggs)}]]"
            ), kids
        if nm == "Sort":
            keys = []
            for so in _seq(p.order()):
                d = "ASC" if "Ascending" in str(so.direction()) else "DESC"
                nf = (
                    "NULLS FIRST"
                    if "First" in str(so.nullOrdering())
                    else "NULLS LAST"
                )
                keys.append(f"{self.expr(so.child())} {d} {nf}")
            return f"Sort: {', '.join(keys)}", kids
        if nm in ("GlobalLimit", "LocalLimit", "Limit"):
            try:
                n = str(p.limitExpr().value())
            except Exception:
                n = "?"
            if nm == "LocalLimit":
                return None, kids  # DataFusion has a single Limit node
            return f"Limit: skip=0, fetch={n}", kids
        if nm == "Join":
            how = str(p.joinType()).strip()
            cond = ""
            try:
                c = p.condition()
                if c.isDefined():
                    cond = f" Filter: {self.expr(c.get())}"
            except Exception:
                pass
            return f"{how} Join:{cond}", kids
        if nm == "SubqueryAlias":
            try:
                name = str(p.alias())
            except Exception:
                name = "?"
            return f"TableScan: {name}", []  # collapse the read pipeline
        if nm in ("View", "LogicalRelation", "HiveTableRelation", "LocalRelation"):
            return f"TableScan: {self._scan_name(p)}", []
        if nm == "Distinct":
            return "Distinct:", kids
        if nm == "Union":
            return "Union", kids
        if nm == "OneRowRelation":
            return "EmptyRelation", []
        # unknown node: keep Catalyst's name so the tree stays readable
        return f"{nm}", kids

    def _scan_name(self, p) -> str:
        base = self.env.get("base_by_exprid", {})
        try:
            for a in _seq(p.output()):
                n = base.get(a.exprId().id())
                if n:
                    return n
        except Exception:
            pass
        return self.default_qualifier or "?"

    def _collapse_scan(self, p):
        """Project/Filter chains directly over a leaf relation render as
        DataFusion's pruned scan: ``TableScan: name projection=[...]``."""
        nm = _simple(p)
        if nm != "Project":
            return None
        kids = _seq(p.children())
        if len(kids) != 1 or _simple(kids[0]) not in (
            "LogicalRelation", "HiveTableRelation", "LocalRelation"
        ):
            return None
        cols: list[str] = []
        for e in _seq(p.projectList()):
            refs = self._base_refs(e)
            for r in refs:
                if r not in cols:
                    cols.append(r)
        return f"TableScan: {self._scan_name(kids[0])} projection=[{', '.join(cols)}]"

    def _base_refs(self, jexpr) -> list[str]:
        nm = _simple(jexpr)
        if nm == "AttributeReference":
            return [_strip_ticks(str(jexpr.name()))]
        try:
            out: list[str] = []
            for k in _seq(jexpr.children()):
                out.extend(self._base_refs(k))
            return out
        except Exception:
            return []

    def lines(self, p, depth: int = 0, parent_line: str | None = None) -> list[str]:
        collapsed = self._collapse_scan(p)
        if collapsed is not None:
            return [_INDENT * depth + collapsed]
        line, kids = self.node_line(p)
        out = []
        next_depth = depth
        next_parent = parent_line
        if line is not None:
            if line == parent_line and line.startswith("Projection:"):
                # wrapper-inserted identity projections (view/round-trip
                # shells) — same output, no semantic node
                line = None
            else:
                out.append(_INDENT * depth + line)
                next_depth = depth + 1
                next_parent = line
        for k in kids:
            out.extend(self.lines(k, next_depth, next_parent))
        return out


def render_logical(jplan, env: dict | None = None) -> tuple[str, str]:
    """(display, display_indent) for a Catalyst logical plan."""
    r = _Renderer(jplan, env)
    lines = r.lines(jplan)
    if not lines:
        return "", ""
    return lines[0].strip(), "\n".join(lines)


# -- physical -----------------------------------------------------------


def render_physical(jexec, logical_env: dict | None = None, qualifier: str | None = None) -> tuple[str, str]:
    """(display, display_indent) in DataFusion's ExecutionPlan grammar,
    derived from Spark's executed plan. display() is the root line plus
    a trailing newline (matching the reference's display())."""
    r = _Renderer(jexec, logical_env)
    if qualifier:
        r.default_qualifier = qualifier

    def phys_line(p) -> tuple[str | None, list]:
        nm = _simple(p)
        kids = _seq(p.children())
        if nm in ("AdaptiveSparkPlanExec", "AdaptiveSparkPlan"):
            try:
                kids = [p.executedPlan()]
            except Exception:
                try:
                    kids = [p.initialPlan()]
                except Exception:
                    pass
            return None, kids
        if nm.endswith("QueryStageExec"):
            # AQE stage wrappers hold their subtree in plan(), not
            # children()
            try:
                kids = [p.plan()]
            except Exception:
                pass
            return None, kids
        if nm in ("WholeStageCodegenExec", "InputAdapter",
                  "CollectMetricsExec", "ReusedExchangeExec"):
            return None, kids
        if nm.startswith("HashAggregate") or nm.startswith("SortAggregate") or nm.startswith("ObjectHashAggregate"):
            mode = "FinalPartitioned"
            try:
                aexprs = _seq(p.aggregateExpressions())
                if aexprs and "Partial" in str(aexprs[0].mode()):
                    mode = "Partial"
            except Exception:
                pass
            gby = []
            try:
                for i, g in enumerate(_seq(p.groupingExpressions())):
                    n = _strip_ticks(str(g.name())) if hasattr(g, "name") else r.expr(g)
                    gby.append(f"{n}@{i} as {n}")
            except Exception:
                pass
            aggs = []
            try:
                for e in _seq(p.aggregateExpressions()):
                    aggs.append(r.expr(e))
            except Exception:
                pass
            return (
                f"AggregateExec: mode={mode}, gby=[{', '.join(gby)}], "
                f"aggr=[{', '.join(aggs)}]"
            ), kids
        if nm.startswith("ShuffleExchange") or nm.startswith("Exchange"):
            part = "Hash"
            try:
                part = str(p.outputPartitioning().toString())
            except Exception:
                pass
            return f"RepartitionExec: partitioning={part}", kids
        if nm.startswith("CoalesceExec") or nm == "CoalesceExec":
            return "CoalescePartitionsExec", kids
        if nm.startswith("Project"):
            items = ", ".join(
                _phys_proj_item(r, e) for e in _seq(p.projectList())
            )
            return f"ProjectionExec: expr=[{items}]", kids
        if nm.startswith("Filter"):
            try:
                return f"FilterExec: {r.expr(p.condition())}", kids
            except Exception:
                return "FilterExec", kids
        if nm.startswith("Sort") and hasattr(p, "sortOrder"):
            return "SortExec", kids
        if nm.startswith("FileSourceScan") or nm.startswith("FileScan"):
            fmt = "parquet"
            try:
                s = str(p.toString())
                m = re.search(r"Format: (\w+)", s)
                if m:
                    fmt = m.group(1).lower()
                cols = re.search(r"\[([^\]]*)\]", s)
                proj = ", ".join(
                    c.split("#")[0] for c in (cols.group(1).split(",") if cols else [])
                )
            except Exception:
                proj = ""
            return (
                f"DataSourceExec: file_groups={{1 group}}, "
                f"projection=[{proj}], file_type={fmt}"
            ), kids
        if nm.startswith("LocalTableScan") or nm.startswith("RDDScan"):
            return "DataSourceExec: partitions=1, partition_sizes=[1]", kids
        if nm.startswith("BatchScan"):
            return "DataSourceExec: pushdown-capable scan", kids
        return nm.replace("Exec", "") + "Exec", kids

    def walk(p, depth):
        line, kids = phys_line(p)
        out = []
        nd = depth
        if line is not None:
            out.append(_INDENT * depth + line)
            nd = depth + 1
        for k in kids:
            out.extend(walk(k, nd))
        return out

    lines = walk(jexec, 0)
    if not lines:
        return "", ""
    return lines[0].strip() + "\n", "\n".join(lines)


def _phys_proj_item(r: _Renderer, e) -> str:
    """Physical projection item: DataFusion's ``expr as name`` form."""
    nm = _simple(e)
    if nm == "Alias":
        child = e.child()
        name = _strip_ticks(str(e.name()))
        if _simple(child) == "Literal":
            v = child.value()
            if name == str(v):
                # DataFusion names a bare literal column Int64(v): its
                # SQL integer literals are Int64 regardless of width
                t = str(child.dataType().typeName())
                arrow = {
                    "integer": "Int64", "long": "Int64", "short": "Int64",
                    "double": "Float64", "float": "Float32",
                    "string": "Utf8",
                }.get(t, "Int64")
                return f"{v} as {arrow}({v})"
            return f"{v} as {name}"
        return f"{r.expr(child)} as {name}"
    if nm == "AttributeReference":
        n = _strip_ticks(str(e.name()))
        return f"{n} as {n}"
    return r.expr(e)
