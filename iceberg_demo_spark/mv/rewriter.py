"""Automatic MV query rewriting: exact → join → aggregate/roll-up cascade
with predicate compensation — behavior-parity with the reference plugin
(MaterializedViewOptimizationRule.scala:55-78 cascade,
AggregateRewriter.scala:105-262, JoinRewriter.scala:35-217).

Non-standard semantics preserved on purpose (SURVEY.md §7 risks):
- COUNT rolls up via SUM of the stored count column.
- AVG derives as SUM(sum_col)/SUM(count_col) when the MV stores both.
- An MV *more restrictive* than the query (extra predicates) never rewrites.
- Compensating predicates must be expressible over the MV's output columns.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from iceberg_demo_spark.mv.catalog import MaterializedView, MVCatalog
from iceberg_demo_spark.mv.parser import ParseError, QueryInfo, parse_select

#: roll-up function map (AggregateRewriter.scala:242-262): how a query agg
#: re-aggregates over the MV's stored partial column.
_ROLLUP = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


@dataclass
class RewriteResult:
    df: DataFrame
    mv_name: str
    kind: str  # exact | project | aggregate | rollup


class Rewriter:
    def __init__(self, spark, mv_catalog: MVCatalog, backing_df_fn):
        """backing_df_fn(mv) -> DataFrame over the MV's backing table."""
        self.spark = spark
        self.mv_catalog = mv_catalog
        self.backing_df_fn = backing_df_fn
        self._disabled = 0  # re-entrancy guard (refresh runs the MV query)

    # guard: MaterializedViewOptimizationRule.scala:86-90
    def disable(self):
        self._disabled += 1

    def enable(self):
        self._disabled = max(0, self._disabled - 1)

    def try_rewrite(self, sql: str) -> RewriteResult | None:
        if self._disabled or not self.mv_catalog.list_all():
            return None
        try:
            qinfo = parse_select(sql)
        except ParseError:
            qinfo = None
        for mv in self.mv_catalog.list_all():
            # 1. exact canonical match (plan-level, Catalyst sameResult)
            if self._exact_match(sql, mv):
                return RewriteResult(self.backing_df_fn(mv), mv.name, "exact")
            if qinfo is None:
                continue
            try:
                mv_info = parse_select(mv.query)
            except ParseError:
                continue
            res = self._structural_rewrite(qinfo, mv, mv_info)
            if res is not None:
                return res
        return None

    # -- exact -------------------------------------------------------------

    def _exact_match(self, sql: str, mv: MaterializedView) -> bool:
        """Catalyst-analyzed sameResult comparison — the Python analog of
        `plan.canonicalized == mvPlan.canonicalized`
        (MaterializedViewOptimizationRule.scala:55-69)."""
        try:
            p1 = self.spark.sql(sql)._jdf.queryExecution().analyzed()
            p2 = self.spark.sql(mv.query)._jdf.queryExecution().analyzed()
            return bool(p1.sameResult(p2))
        except Exception:
            # fall back to normalized-text equality
            n = lambda s: re.sub(r"\s+", " ", s.strip().rstrip(";").lower())
            return n(sql) == n(mv.query)

    # -- structural (join + aggregate + roll-up + projection) --------------

    def _structural_rewrite(self, q: QueryInfo, mv: MaterializedView,
                            m: QueryInfo) -> RewriteResult | None:
        # Same base relations and join structure (JoinRewriter.scala:227-254:
        # type + condition + base tables, recursively — here: ordered table
        # list + per-join type/condition equality).
        if q.base_tables != m.base_tables:
            return None
        if len(q.joins) != len(m.joins):
            return None
        for jq, jm in zip(q.joins, m.joins):
            if (jq["type"], jq["right_table"], jq["condition"]) != (
                jm["type"], jm["right_table"], jm["condition"]
            ):
                return None
        # Predicate compensation (AggregateRewriter.scala:356-368): MV preds
        # must be a subset; query extras are applied above the backing scan.
        q_preds, m_preds = set(q.where), set(m.where)
        if not m_preds <= q_preds:
            return None  # MV more restrictive than query ⇒ refuse
        extra = sorted(q_preds - m_preds)

        # Map: normalized MV select expr -> backing column name.
        backing_cols = self._backing_columns(mv, m)
        if backing_cols is None:
            return None

        m_groups = set(m.group_by)
        m_has_agg = any(fn for fn, _a, _al in m.agg_items())
        q_has_agg = any(fn for fn, _a, _al in q.agg_items())

        if not q_has_agg and not q.group_by:
            if m_has_agg or m_groups:
                return None  # agg MV cannot answer a row-level query
            return self._project_rewrite(q, mv, m, backing_cols, extra)
        if not m_has_agg:
            # MV is a plain projection/join: re-aggregate over it only if
            # every needed input column is stored.
            return self._agg_over_plain_mv(q, mv, m, backing_cols, extra)
        if not set(q.group_by) <= m_groups:
            return None
        exact_groups = set(q.group_by) == m_groups and not extra
        if exact_groups:
            return self._exact_agg_rewrite(q, mv, m, backing_cols)
        return self._rollup_rewrite(q, mv, m, backing_cols, extra)

    def _backing_columns(self, mv: MaterializedView, m: QueryInfo) -> dict | None:
        df = self.backing_df_fn(mv)
        cols = df.columns
        if len(cols) != len(m.select):
            return None
        return {expr: cols[i] for i, (expr, _alias) in enumerate(m.select)}

    def _compensate(self, df: DataFrame, extra: list[str],
                    backing_cols: dict) -> DataFrame | None:
        """Apply compensating predicates, rewritten to backing columns
        (AggregateRewriter.scala:373-383). Unresolvable ⇒ no rewrite."""
        for pred in extra:
            rewritten = _substitute(pred, backing_cols)
            try:
                df = df.filter(F.expr(rewritten))
            except AnalysisException:
                return None
        return df

    def _finish(self, df: DataFrame, q: QueryInfo) -> DataFrame:
        if q.order_by:
            try:
                df = df.orderBy(F.expr(re.sub(r"\bdesc\b", "", q.order_by).strip())
                                .desc() if q.order_by.endswith(" desc")
                                else F.expr(q.order_by))
            except AnalysisException:
                pass
        if q.limit is not None:
            df = df.limit(q.limit)
        return df

    def _out_name(self, expr: str, alias: str | None) -> str:
        return alias or _sanitize(expr)

    def _project_rewrite(self, q, mv, m, backing_cols, extra):
        df = self._compensate(self.backing_df_fn(mv), extra, backing_cols)
        if df is None:
            return None
        cols = []
        for expr, alias in q.select:
            if expr in backing_cols:
                cols.append(F.col(backing_cols[expr]).alias(self._out_name(expr, alias)))
            else:
                rewritten = _substitute(expr, backing_cols)
                try:
                    cols.append(F.expr(rewritten).alias(self._out_name(expr, alias)))
                except AnalysisException:
                    return None
        try:
            return RewriteResult(self._finish(df.select(cols), q), mv.name, "project")
        except AnalysisException:
            return None

    def _agg_over_plain_mv(self, q, mv, m, backing_cols, extra):
        df = self._compensate(self.backing_df_fn(mv), extra, backing_cols)
        if df is None:
            return None
        group_cols, aggs, out_order = [], [], []
        for g in q.group_by:
            if g not in backing_cols:
                return None
        for expr, alias in q.select:
            m_agg = re.match(r"^(\w+)\((distinct\s+)?(.+)\)$", expr)
            name = self._out_name(expr, alias)
            if expr in q.group_by or (not m_agg and expr in backing_cols):
                group_cols.append(F.col(backing_cols[expr]).alias(name))
                out_order.append(name)
            elif m_agg:
                fn, distinct, arg = m_agg.group(1), m_agg.group(2), m_agg.group(3)
                if fn not in ("sum", "count", "min", "max", "avg"):
                    return None
                if arg == "*":
                    inner = F.lit(1)
                elif arg in backing_cols:
                    inner = F.col(backing_cols[arg])
                else:
                    try:
                        inner = F.expr(_substitute(arg, backing_cols))
                    except AnalysisException:
                        return None
                col = getattr(F, "count" if fn == "count" else fn)(
                    inner if not distinct else F.col(backing_cols[arg])
                )
                if distinct:
                    col = F.countDistinct(F.col(backing_cols[arg]))
                aggs.append(col.alias(name))
                out_order.append(name)
            else:
                return None
        gb = [F.col(backing_cols[g]) for g in q.group_by]
        try:
            out = df.groupBy(gb).agg(*aggs) if aggs else df.select(group_cols)
            out = out.select([F.col(n) if n in out.columns else F.col(n) for n in out_order]) \
                if q.group_by else out
            # rename group columns to query aliases
            sel = []
            for expr, alias in q.select:
                name = self._out_name(expr, alias)
                src = backing_cols.get(expr, name) if expr in q.group_by else name
                sel.append(F.col(src).alias(name))
            return RewriteResult(self._finish(out.select(sel), q), mv.name, "aggregate")
        except AnalysisException:
            return None

    def _exact_agg_rewrite(self, q, mv, m, backing_cols):
        """Query GROUP BY == MV GROUP BY, no extra predicates: answer by
        projection from the backing table (AggregateRewriter.scala:105-149),
        deriving AVG from stored SUM/COUNT when needed."""
        df = self.backing_df_fn(mv)
        cols = []
        for expr, alias in q.select:
            name = self._out_name(expr, alias)
            if expr in backing_cols:
                cols.append(F.col(backing_cols[expr]).alias(name))
                continue
            mm = re.match(r"^avg\((.+)\)$", expr)
            if mm:
                arg = mm.group(1)
                s, c = backing_cols.get(f"sum({arg})"), (
                    backing_cols.get(f"count({arg})") or backing_cols.get("count(*)")
                )
                if s and c:
                    cols.append((F.col(s) / F.col(c)).alias(name))
                    continue
            return None
        return RewriteResult(self._finish(df.select(cols), q), mv.name, "aggregate")

    def _rollup_rewrite(self, q, mv, m, backing_cols, extra):
        """Query GROUP BY ⊂ MV GROUP BY (or compensated predicates):
        re-aggregate the backing table (AggregateRewriter.scala:155-236)."""
        df = self._compensate(self.backing_df_fn(mv), extra, backing_cols)
        if df is None:
            return None
        sel = []
        for expr, alias in q.select:
            name = self._out_name(expr, alias)
            fnm = re.match(r"^(\w+)\((distinct\s+)?(.+)\)$", expr)
            if not fnm or expr in q.group_by:
                # non-aggregate select item must be one of the group cols
                if expr not in q.group_by or expr not in backing_cols:
                    return None
                sel.append(F.col(backing_cols[expr]).alias(name))
                continue
            fn, distinct, arg = fnm.group(1).lower(), fnm.group(2), fnm.group(3)
            if distinct:
                return None  # COUNT(DISTINCT) does not roll up
            if fn == "avg":
                s = backing_cols.get(f"sum({arg})")
                c = backing_cols.get(f"count({arg})") or backing_cols.get("count(*)")
                if not (s and c):
                    return None
                sel.append((F.sum(F.col(s)) / F.sum(F.col(c))).alias(name))
                continue
            if fn not in _ROLLUP:
                return None
            stored = backing_cols.get(expr)
            if stored is None:
                return None
            sel.append(getattr(F, _ROLLUP[fn])(F.col(stored)).alias(name))
        group_cols = []
        for g in q.group_by:
            if g not in backing_cols:
                return None
            group_cols.append(F.col(backing_cols[g]))
        try:
            out = df.groupBy(group_cols).agg(
                *[c for c in sel if _is_agg_col(c)]
            ) if group_cols else df.agg(*[c for c in sel if _is_agg_col(c)])
            # re-project to query output order/aliases
            names = [self._out_name(e, a) for e, a in q.select]
            proj = []
            for (expr, alias), name in zip(q.select, names):
                if expr in q.group_by:
                    proj.append(F.col(backing_cols[expr]).alias(name))
                else:
                    proj.append(F.col(name))
            return RewriteResult(self._finish(out.select(proj), q), mv.name, "rollup")
        except AnalysisException:
            return None


def _is_agg_col(col) -> bool:
    return bool(re.search(r"\b(sum|count|min|max|avg)\(", col._jc.toString().lower()))


def _substitute(expr: str, backing_cols: dict) -> str:
    """Replace normalized MV output expressions inside ``expr`` with backing
    column names, longest expression first."""
    out = expr
    for key in sorted(backing_cols, key=len, reverse=True):
        out = out.replace(key, backing_cols[key])
    return out


def _sanitize(expr: str) -> str:
    s = re.sub(r"\W+", "_", expr).strip("_")
    return s or "col"
