"""MINC-variant (JSQLParser-path) AST-grade SQL fragment extraction.

Closes the declared depth gap of the regex front end (sqlencode.py /
sqlfragments.py): the reference's MINC pipeline walks full JSQLParser
ASTs (enc/SQLParser.java:145-933), and this module re-expresses that
walk over the same tokenizer/recursive-descent expression parser the
APM path uses (functions/apmencode.py) — paren-depth-aware throughout,
so nested subqueries, join lists and CTE-free complex predicates are
handled structurally instead of by clause-span regexes.

Reference semantics implemented (each verified by reading the cited
code, not assumed):

  FROM items     consumeFromItem (:176-205): tables consumed with
                 alias registration; a FROM SUBSELECT recurses via
                 executeSelectWithAlias (:861-875), which pushes the
                 OUTER alias down onto the subselect's from item — so
                 ``FROM (SELECT .. FROM inner_t) x`` registers alias
                 x → inner_t and the inner statement's fragments
                 ACCUMULATE into the same sets (unlike the CH path,
                 which aborts on FROM subqueries).
  JOIN list      parseJoinListOpsWithSelPredConstants (:462-496):
                 each right item consumed, ON expressions classified
                 exactly like WHERE conjuncts; USING columns become
                 self-pair join predicates [col, col] (:433-460).
  select items   executePlainSelect (:728-797): top-level aggregate
                 functions {max, maxornull, min, sum, avg, count}
                 captured into their sets AND projection; count(*) /
                 agg(*) expands to ``t.*`` per current-level table
                 (addColumnToAggrProj :677-693); select-item
                 SUBSELECTS recurse; bare ``*`` expands per
                 current-level table; aliases registered per table
                 (addToColSet :640-674).
  WHERE          parseWhereOpsWithConstants (:412-421): ``correct()``
                 first — the traversal that ALSO rewrites
                 ``x [NOT] IN (SELECT c FROM t)`` into an
                 [not]equals join predicate (parseInAsJoinExp
                 :579-607, only when the subselect's projection item
                 has NO alias), expands ``x IN (list)`` into
                 per-constant equality selection predicates
                 (parseInAsSelExp :609-625), recurses into EXISTS
                 bodies and WHERE subselects (correct() :558-573 —
                 their fragments accumulate), and resolves aliases.
                 Then conjunct splitting (processSelectWithConstants
                 :358-410): parentheses unwrapped, BETWEEN yields its
                 left column (NO op/const capture), arithmetic
                 (+,-,*,/) recurses into both sides, ``col OP
                 col-or-literal`` kept whole; classification
                 (parseSelJoinPredsWithConstants :320-356 +
                 addSelectionPredicate/addSelJoinPredicate :254-318):
                 col-vs-no-column-side → selection predicate with
                 op/const capture (LIKE takes the last token of the
                 right side; IS [NOT] NULL maps to =/<> with constant
                 NULL); col-vs-col → join pair unless the right side
                 is LIKE/IS NULL-ish, in which case selection only.
  GROUP/ORDER/   parseGroupBy (:207-232), order-by and having blocks
  HAVING/LIMIT   of executePlainSelect (:809-846): all referenced
                 columns, aggregates unwrapped; LIMIT presence is a
                 single flag (:848-852).
  UNION          executeSelect (:877-886): every branch's fragments
                 accumulate.
  WITH           createQueryVector (:892-897): every WithItem's select
                 body is walked BEFORE the main body, fragments
                 accumulating into the same state; the CTE name is not
                 registered as an alias (the reference never does), so
                 ``FROM cte_name`` contributes no table bit.
  DML            statement-type gate select/update/insert/delete with
                 UPDATE <t> SET ... WHERE / DELETE FROM <t> WHERE /
                 INSERT INTO <t> target consumption (the regex layer's
                 behavior, kept identical).

Documented divergences from the reference (deliberate, consistent
with the engine's existing green MINC conventions):
  * bare-column resolution defaults to the single-FROM-table fast
    path then schema-owner first-wins (resolve_idents semantics) — the
    reference's addToColSet adds the column once per EVERY
    current-level table containing the name (:652-668), which can set
    multiple bits for ambiguous names; the opt-in ``ambiguous_multi``
    parity mode (parse_minc_query/encode_minc_ast) reproduces that
    multi-bit walk exactly for SELECT-item columns, which is the only
    place the reference applies it;
  * the reference's post-``correct`` classification may re-visit an
    InExpression through the column visitor (double-count); we rewrite
    each IN exactly once.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqlfeatureextraction_spark.functions.apmencode import (
    _Cursor,
    _parse_expr,
    _skip_parens,
    _split_clauses,
    _split_top_commas,
    _split_unions,
    _tokenize,
)
from sqlfeatureextraction_spark.functions.sqlencode import (
    QUERY_TYPES,
    SqlSchemaVocab,
    _bin_index,
)
from sqlfeatureextraction_spark.functions.sqlfragments import SEL_PRED_OPS
from sqlfeatureextraction_spark.layout import VectorLayout

_AGG_CAPTURE = {
    "max": "max",
    "maxornull": "max",
    "min": "min",
    "sum": "sum",
    "avg": "avg",
    "count": "count",
}

_JOIN_KWS = {"join", "left", "right", "inner", "outer", "cross", "full"}

_CMP_TO_OP = {
    "equals": "=",
    "notequals": "<>",
    "lessorequals": "<=",
    "greaterorequals": ">=",
    "less": "<",
    "greater": ">",
    "like": "like",
    "notlike": "like",
}

_ARITH = {"plus", "minus", "multiply", "divide"}


@dataclass
class MincState:
    tables: list = field(default_factory=list)  # consumption order
    alias_map: dict = field(default_factory=dict)  # alias -> table
    projection: set = field(default_factory=set)
    selection: set = field(default_factory=set)
    groupby: set = field(default_factory=set)
    orderby: set = field(default_factory=set)
    having: set = field(default_factory=set)
    aggs: dict = field(
        default_factory=lambda: {
            "avg": set(), "min": set(), "max": set(), "sum": set(),
            "count": set(),
        }
    )
    join_pairs: list = field(default_factory=list)  # (left, right) raw
    sel_preds: list = field(default_factory=list)  # (col, op, const)
    limit: bool = False
    qtype: int = -1
    depth: int = 0
    # parity mode (reference addToColSet, enc/SQLParser.java:640-674):
    # callable (bare_name, cur_level_tables) -> [qualified names] used
    # for SELECT-item columns only; None = first-wins resolution
    multi_resolver: object = None


def _expr_columns(node) -> list:
    """Column references in an expression (Util.processExpression's
    ColumnExpressionVisitor): identifiers anywhere, including inside
    function arguments; literals/stars/subqueries contribute none."""
    out = []

    def rec(n, d=0):
        if n is None or d > 40:
            return
        k = n[0]
        if k == "id":
            out.append(n[1])
        elif k == "fn" and n[2]:
            for a in n[2]:
                rec(a, d + 1)

    rec(node)
    return out


def _is_col_or_val(node) -> bool:
    """Util.isColValInstance: a bare column or a literal."""
    return node is not None and node[0] in ("id", "lit")


def _split_conjuncts(node, out: list, depth: int = 0) -> None:
    """processSelectWithConstants (SQLParser's own copy :358-410):
    and/or and arithmetic recurse; ``col OP col-or-val`` kept whole;
    BETWEEN yields its left column node; everything else kept whole."""
    if node is None or depth > 40:
        return
    k = node[0]
    if k == "fn":
        name, args = node[1], node[2]
        if name in ("and", "or") and args and len(args) == 2:
            _split_conjuncts(args[0], out, depth + 1)
            _split_conjuncts(args[1], out, depth + 1)
            return
        if name == "between" and args:
            if args[0][0] == "id":
                out.append(args[0])
            return
        if name in _CMP_TO_OP and args and len(args) == 2:
            if args[0][0] == "id" and _is_col_or_val(args[1]):
                out.append(node)
                return
            _split_conjuncts(args[0], out, depth + 1)
            _split_conjuncts(args[1], out, depth + 1)
            return
        if name in _ARITH and args and len(args) == 2:
            _split_conjuncts(args[0], out, depth + 1)
            _split_conjuncts(args[1], out, depth + 1)
            return
    out.append(node)


def _classify_conjunct(node, st: MincState) -> None:
    """parseSelJoinPredsWithConstants + addSelectionPredicate /
    addSelJoinPredicate."""
    if node is None:
        return
    k = node[0]
    if k == "fn" and node[1] in _CMP_TO_OP and node[2] and len(node[2]) == 2:
        left, right = node[2]
        lcols = _expr_columns(left)
        rcols = _expr_columns(right)
        op = _CMP_TO_OP[node[1]]
        if lcols and not rcols:
            # selection predicate with op/const capture
            col = lcols[0]
            st.selection.add(col)
            const = right[1] if right[0] == "lit" else None
            if const is not None:
                st.sel_preds.append((col, op, str(const).lower()))
            return
        if lcols and rcols:
            st.join_pairs.append((lcols[0], rcols[0]))
            return
        return
    if k == "fn" and node[1] == "isnull" and node[2]:
        cols = _expr_columns(node[2][0])
        if cols:
            st.selection.add(cols[0])
            st.sel_preds.append((cols[0], "=", "null"))
        return
    for c in _expr_columns(node):
        st.selection.add(c)


def _rewrite_in(node, st: MincState, out_conjuncts: list) -> bool:
    """correct()'s InExpression branch: subquery form becomes an
    [not]equals join conjunct (only when the subselect projection item
    has no alias; owner defaults to the subquery's FROM table);
    list form expands to per-constant equality predicates.  Returns
    True when the node was consumed."""
    if node[0] != "fn" or node[1] not in ("in", "notin"):
        return False
    args = node[2] or []
    if len(args) != 2:
        return True
    left, right = args
    eq = "notequals" if node[1] == "notin" else "equals"
    if right[0] == "sub":
        sub_toks = right[1]
        clauses = dict()
        for name, span in _split_clauses(sub_toks):
            clauses.setdefault(name, span)
        items = _split_top_commas(clauses.get("select", []))
        frm = clauses.get("from", [])
        tab = next((v for kk, v in frm if kk == "id"), None)
        if items and tab:
            c = _Cursor(items[0])
            proj = _parse_expr(c)
            has_alias = c.peek()[0] == "id" or (
                c.peek() == ("id", "as")
            )
            if not has_alias and proj[0] == "id":
                name = proj[1]
                if "." not in name:
                    name = f"{tab}.{name}"
                out_conjuncts.append(("fn", eq, [left, ("id", name)]))
        # the subselect body's own fragments accumulate (correct() →
        # SubSelect → executeSelect, :566-573)
        _execute_statement(sub_toks, st)
        return True
    # list form: x IN (a, b, c) → per-constant equality
    consts = []
    if right[0] == "lit":
        consts = [right[1]]
    elif right[0] == "fn" and right[2]:
        consts = [a[1] for a in right[2] if a[0] == "lit"]
    for cv in consts:
        out_conjuncts.append(("fn", eq, [left, ("lit", cv)]))
    if not consts:
        out_conjuncts.append(("fn", eq, [left, ("lit", "")]))
    return True


def _collect_where(node, st: MincState, rewritten: list, depth: int = 0):
    """correct()-phase traversal: IN rewrites, EXISTS/subselect
    recursion; returns the expression with IN nodes removed (they are
    re-added as rewritten conjuncts)."""
    if node is None or depth > 40:
        return None
    if node[0] == "sub":
        _execute_statement(node[1], st)
        return None
    if node[0] == "fn":
        name, args = node[1], node[2]
        if name in ("in", "notin"):
            _rewrite_in(node, st, rewritten)
            return None
        if name in ("exists", "not") and args:
            kept = [
                _collect_where(a, st, rewritten, depth + 1) for a in args
            ]
            kept = [a for a in kept if a is not None]
            return ("fn", name, kept) if kept else None
        if args:
            kept = [
                _collect_where(a, st, rewritten, depth + 1) for a in args
            ]
            if any(a is None for a in kept):
                kept = [a for a in kept if a is not None]
                if name in ("and", "or"):
                    if not kept:
                        return None
                    if len(kept) == 1:
                        return kept[0]
                return ("fn", name, kept) if kept else None
            return ("fn", name, kept)
    return node


def _split_with_prefix(toks: list) -> tuple[list, list]:
    """WITH-clause splitter: ([CTE body token lists], main statement
    tokens).  Reference: ``createQueryVector`` walks each WithItem's
    select body BEFORE the main body (enc/SQLParser.java:892-897) — the
    CTE bodies' fragments ACCUMULATE into the same state.  The CTE
    NAME is deliberately NOT registered as an alias: the reference
    performs no such registration, so a later ``FROM cte_name``
    resolves like any unknown table and contributes no table bit."""
    if not toks or toks[0] != ("id", "with"):
        return [], toks
    c = _Cursor(toks)
    c.next()
    bodies = []
    while c.peek()[0] == "id":
        c.next()  # CTE name
        if c.peek() == ("op", "("):  # optional column list
            c.next()
            _skip_parens(c)
        if c.peek() == ("id", "as"):
            c.next()
        if c.peek() != ("op", "("):
            break
        c.next()
        start = c.i
        _skip_parens(c)
        bodies.append(toks[start : c.i - 1])
        if c.peek() == ("op", ","):
            c.next()
            continue
        break
    return bodies, toks[c.i :]


def _parse_from_clause(toks: list, st: MincState) -> list:
    """FROM item list + JOIN list → current-level tables; registers
    aliases; classifies ON expressions; expands USING columns."""
    cur_level: list = []
    # split at depth-0 commas first (implicit join list)
    segments = _split_top_commas(toks)
    # further split each segment at depth-0 JOIN keywords
    items = []
    for seg in segments:
        depth, start, i = 0, 0, 0
        while i < len(seg):
            kk, vv = seg[i]
            if (kk, vv) == ("op", "("):
                depth += 1
            elif (kk, vv) == ("op", ")"):
                depth -= 1
            elif depth == 0 and kk == "id" and vv == "join":
                j = start
                # strip join-type keywords preceding 'join'
                items.append(seg[j:i])
                start = i + 1
            i += 1
        items.append(seg[start:])
    for item in items:
        # drop leading join-type keywords
        while item and item[0][0] == "id" and item[0][1] in _JOIN_KWS:
            item = item[1:]
        if not item:
            continue
        # split off ON / USING
        on_toks, using_toks, depth = None, None, 0
        for i, (kk, vv) in enumerate(item):
            if (kk, vv) == ("op", "("):
                depth += 1
            elif (kk, vv) == ("op", ")"):
                depth -= 1
            elif depth == 0 and (kk, vv) == ("id", "on"):
                on_toks = item[i + 1 :]
                item = item[:i]
                break
            elif depth == 0 and (kk, vv) == ("id", "using"):
                using_toks = item[i + 1 :]
                item = item[:i]
                break
        # the from item itself: table [AS alias] or (subquery) [AS a]
        if item and item[0] == ("op", "("):
            c = _Cursor(item)
            c.next()
            if c.peek() == ("id", "select"):
                start = c.i
                from sqlfeatureextraction_spark.functions.apmencode import (
                    _skip_parens,
                )

                _skip_parens(c)
                sub_toks = c.toks[start : c.i - 1]
                alias = None
                if c.peek() == ("id", "as"):
                    c.next()
                if c.peek()[0] == "id":
                    alias = c.peek()[1]
                inner_tables = _execute_statement(sub_toks, st)
                if alias and inner_tables:
                    # executeSelectWithAlias pushes the outer alias
                    # down onto the subselect's from item (:861-867)
                    st.alias_map.setdefault(alias, inner_tables[0])
                cur_level.extend(inner_tables)
        else:
            ids = [vv for kk, vv in item if kk == "id" and vv != "as"]
            if not ids:
                continue
            # dotted db.table arrives as one dotted ident token list —
            # the tokenizer splits on '.', so rebuild: table is the
            # ident before an optional alias
            c = _Cursor(item)
            node = _parse_expr(c)
            tab = None
            if node[0] == "id":
                tab = node[1].split(".")[-1].replace("`", "")
            alias = None
            if c.peek() == ("id", "as"):
                c.next()
            if c.peek()[0] == "id":
                alias = c.peek()[1]
            if tab:
                if tab not in st.tables:
                    st.tables.append(tab)
                cur_level.append(tab)
                if alias:
                    st.alias_map.setdefault(alias, tab)
        if on_toks:
            rewritten: list = []
            expr = _collect_where(
                _parse_expr(_Cursor(on_toks)), st, rewritten
            )
            conjuncts: list = []
            _split_conjuncts(expr, conjuncts)
            for cj in conjuncts + rewritten:
                _classify_conjunct(cj, st)
        if using_toks:
            for utoks in _split_top_commas(
                [t for t in using_toks if t not in (("op", "("), ("op", ")"))]
            ):
                cols = [vv for kk, vv in utoks if kk == "id"]
                for cname in cols:
                    st.join_pairs.append((cname, cname))
    return cur_level


def _execute_statement(toks: list, st: MincState) -> list:
    """executeSelect over one statement's tokens (union branches split
    by the caller); returns the statement's current-level tables."""
    st.depth += 1
    if st.depth > 16:
        st.depth -= 1
        return []
    cur_level_all: list = []
    for stmt in _split_unions(toks):
        clauses = dict()
        for name, span in _split_clauses(stmt):
            clauses.setdefault(name, span)
        cur_level = _parse_from_clause(clauses.get("from", []), st)
        cur_level_all.extend(cur_level)
        # select items
        for item in _split_top_commas(clauses.get("select", [])):
            if item and item[0] == ("id", "distinct"):
                item = item[1:]
            if not item:
                continue
            c = _Cursor(item)
            expr = _parse_expr(c)
            alias = None
            if c.peek() == ("id", "as") and c.peek(1)[0] == "id":
                alias = c.peek(1)[1]
            elif c.peek()[0] == "id":
                alias = c.peek()[1]
            if expr[0] == "sub":
                _execute_statement(expr[1], st)
                continue
            if expr[0] == "star":
                for t in cur_level:
                    st.projection.add(f"{t}.*")
                continue
            if expr[0] == "qstar":
                q = st.alias_map.get(expr[1], expr[1])
                st.projection.add(f"{q}.*")
                continue
            # reference addToColSet (:640-674): bare SELECT-item columns
            # expand per current-level table in parity mode (the
            # multi_resolver); qualified names always add directly
            def item_cols(e):
                out = []
                for cname in _expr_columns(e):
                    if st.multi_resolver is not None and "." not in cname:
                        out.extend(st.multi_resolver(cname, cur_level))
                    else:
                        out.append(cname)
                return out

            if expr[0] == "fn" and expr[1] in _AGG_CAPTURE:
                target = st.aggs[_AGG_CAPTURE[expr[1]]]
                args = expr[2] or []
                if args and args[0][0] == "star":
                    for t in cur_level:
                        target.add(f"{t}.*")
                        st.projection.add(f"{t}.*")
                    continue
                for cname in item_cols(expr):
                    target.add(cname)
            for cname in item_cols(expr):
                st.projection.add(cname)
            # select-item subselects nested inside expressions
            def subrec(n, d=0):
                if n is None or d > 40:
                    return
                if n[0] == "sub":
                    _execute_statement(n[1], st)
                elif n[0] == "fn" and n[2]:
                    for a in n[2]:
                        subrec(a, d + 1)

            subrec(expr)
            _ = alias  # aliases resolve via resolution, not re-walk
        # where
        if "where" in clauses:
            rewritten: list = []
            expr = _collect_where(
                _parse_expr(_Cursor(clauses["where"])), st, rewritten
            )
            conjuncts: list = []
            _split_conjuncts(expr, conjuncts)
            for cj in conjuncts + rewritten:
                _classify_conjunct(cj, st)
        for cl, target in (
            ("group by", st.groupby),
            ("order by", st.orderby),
            ("having", st.having),
        ):
            for item in _split_top_commas(clauses.get(cl, [])):
                toks_i = [
                    t
                    for t in item
                    if t not in (("id", "asc"), ("id", "desc"))
                ]
                if not toks_i:
                    continue
                for cname in _expr_columns(
                    _parse_expr(_Cursor(toks_i))
                ):
                    target.add(cname)
        if "limit" in clauses and clauses["limit"]:
            st.limit = True
    st.depth -= 1
    return cur_level_all


def parse_minc_query(
    sql: str,
    vocab: SqlSchemaVocab | None = None,
    ambiguous_multi: bool = False,
) -> MincState:
    """Full MINC statement parse → fragment state (best-effort: the
    reference swallows parse failures and keeps partial state).

    ambiguous_multi=True (requires ``vocab``) enables the reference's
    ``addToColSet`` parity semantics for bare SELECT-item columns: the
    column is added once per EVERY current-level table whose schema
    contains the name (enc/SQLParser.java:652-668 — multiple bits for
    ambiguous names; ZERO bits when no current-level table has it).
    Default (False) keeps the engine's documented first-wins owner
    resolution.  WHERE/group/order/having columns are unaffected in
    both modes — the reference adds those raw (ExtendedColumn) with
    downstream owner resolution."""
    st = MincState()
    if ambiguous_multi:
        if vocab is None:
            raise ValueError("ambiguous_multi requires a schema vocab")
        vcols = {t: set(cs) for t, cs in vocab.columns.items()}

        def multi_resolver(cname: str, cur_level: list) -> list:
            return [
                f"{t}.{cname}"
                for t in dict.fromkeys(cur_level)
                if cname in vcols.get(t, ())
            ]

        st.multi_resolver = multi_resolver
    low = sql.strip().lower()
    first = low.split(None, 1)[0] if low else ""
    if first not in QUERY_TYPES and first != "with":
        return st
    toks = _tokenize(low.replace("`", ""))
    with_bodies: list = []
    if first == "with":
        # JSQLParser parses a WITH-prefixed query as a Select statement
        # whose WithItemsList is walked first (createQueryVector,
        # enc/SQLParser.java:892-897); the main body follows.
        with_bodies, toks = _split_with_prefix(toks)
        first = toks[0][1] if toks and toks[0][0] == "id" else ""
        if first != "select":
            return st
    st.qtype = QUERY_TYPES.index(first)
    try:
        if first == "select":
            for body in with_bodies:
                _execute_statement(body, st)
            _execute_statement(toks, st)
        elif first in ("update", "delete"):
            # UPDATE <t> SET ... [WHERE ...] / DELETE FROM <t> [WHERE]
            tab = None
            where_at = None
            set_at = None
            for i, (kk, vv) in enumerate(toks):
                if kk == "id" and vv in ("update",):
                    if i + 1 < len(toks) and toks[i + 1][0] == "id":
                        tab = toks[i + 1][1].split(".")[-1]
                elif kk == "id" and vv == "from":
                    if i + 1 < len(toks) and toks[i + 1][0] == "id":
                        tab = toks[i + 1][1].split(".")[-1]
                elif kk == "id" and vv == "set" and set_at is None:
                    set_at = i + 1
                elif kk == "id" and vv == "where":
                    where_at = i + 1
                    break
            if tab:
                st.tables.append(tab)
            if set_at is not None:
                # SET assignments contribute their op/const predicate
                # but NOT a selection column (parity with the regex
                # front end, whose predicate extraction runs on raw
                # text while clause idents come from WHERE spans only)
                end = (where_at - 1) if where_at is not None else len(toks)
                for atoks in _split_top_commas(toks[set_at:end]):
                    node = _parse_expr(_Cursor(atoks))
                    if (
                        node[0] == "fn"
                        and node[1] == "equals"
                        and node[2]
                        and len(node[2]) == 2
                        and node[2][0][0] == "id"
                        and node[2][1][0] == "lit"
                    ):
                        st.sel_preds.append(
                            (
                                node[2][0][1],
                                "=",
                                str(node[2][1][1]).lower(),
                            )
                        )
            if where_at is not None:
                rewritten: list = []
                expr = _collect_where(
                    _parse_expr(_Cursor(toks[where_at:])), st, rewritten
                )
                conjuncts: list = []
                _split_conjuncts(expr, conjuncts)
                for cj in conjuncts + rewritten:
                    _classify_conjunct(cj, st)
        elif first == "insert":
            for i, (kk, vv) in enumerate(toks):
                if kk == "id" and vv == "into":
                    if i + 1 < len(toks) and toks[i + 1][0] == "id":
                        st.tables.append(toks[i + 1][1].split(".")[-1])
                    break
            sel_at = next(
                (
                    i
                    for i, t in enumerate(toks)
                    if t == ("id", "select")
                ),
                None,
            )
            if sel_at is not None:
                _execute_statement(toks[sel_at:], st)
    except RecursionError:  # pragma: no cover - defensive
        pass
    return st


# ------------------------------------------------------------- encoding


def _resolve(name: str, st: MincState, vocab: SqlSchemaVocab) -> str | None:
    """resolve_idents semantics (P13), python-side: qualified via real
    table name else alias; bare via single-FROM fast path else schema
    owner first-wins."""
    name = name.replace("`", "").lower()
    if name.endswith(".*"):
        q = name[:-2].split(".")[-1]
        q = q if q in vocab.tables else st.alias_map.get(q, q)
        return f"{q}.*"
    if "." in name:
        parts = name.split(".")
        qual, col = parts[-2], parts[-1]
        tab = (
            qual
            if qual in vocab.tables
            else st.alias_map.get(qual, qual)
        )
        return f"{tab}.{col}"
    known = [t for t in st.tables if t in vocab.tables]
    if len(known) == 1:
        return f"{known[0]}.{name}"
    owner = vocab.owner.get(name)
    return f"{owner}.{name}" if owner else None


def minc_state_vector(
    st: MincState, vocab: SqlSchemaVocab
) -> np.ndarray:
    """Scatter a parsed state into the MINC layout (identical layout
    and bit conventions to sqlencode.encode_minc)."""
    layout = vocab.layout()
    vec = np.zeros(layout.width, dtype=np.float64)
    if 0 <= st.qtype < len(QUERY_TYPES):
        vec[layout.seg("qtype").offset + st.qtype] = 1.0
    t_seg = layout.seg("tables").offset
    t_idx = {t: i for i, t in enumerate(vocab.tables)}
    for t in st.tables:
        i = t_idx.get(t)
        if i is not None:
            vec[t_seg + i] = 1.0
    col_bit = vocab.col_bit

    def setcols(names: set, seg_name: str) -> None:
        off = layout.seg(seg_name).offset
        for n in names:
            fc = _resolve(n, st, vocab)
            if fc is None:
                continue
            if fc.endswith(".*"):
                t = fc[:-2]
                for c in vocab.columns.get(t, ()):
                    b = col_bit.get(f"{t}.{c}")
                    if b is not None:
                        vec[off + b] = 1.0
                continue
            b = col_bit.get(fc)
            if b is not None:
                vec[off + b] = 1.0

    setcols(st.projection, "projection")
    for agg in ("avg", "min", "max", "sum", "count"):
        setcols(st.aggs[agg], agg)
    setcols(st.selection, "selection")
    setcols(st.groupby, "groupby")
    setcols(st.orderby, "orderby")
    setcols(st.having, "having")
    if st.limit:
        vec[layout.seg("limit").offset] = 1.0
    # join pairs: canonicalize by schema table order
    j_off = layout.seg("join").offset
    join_bit = vocab.join_bit
    for l_raw, r_raw in st.join_pairs:
        lf = _resolve(l_raw, st, vocab)
        rf = _resolve(r_raw, st, vocab)
        if not lf or not rf or "." not in lf or "." not in rf:
            continue
        lt, lc = lf.rsplit(".", 1)
        rt, rc = rf.rsplit(".", 1)
        li, ri = t_idx.get(lt), t_idx.get(rt)
        if li is None or ri is None:
            continue
        if li <= ri:
            key = f"{lt},{rt}|{lc},{rc}"
        else:
            key = f"{rt},{lt}|{rc},{lc}"
        b = join_bit.get(key)
        if b is not None:
            vec[j_off + b] = 1.0
    # selection-predicate ops + range bins
    ops_off = layout.seg("selops").offset
    bins_off = layout.seg("rangebins").offset
    n_ops = len(SEL_PRED_OPS)
    bin_offs = vocab.bin_offsets
    for col, op, const in st.sel_preds:
        fc = _resolve(col, st, vocab)
        if fc is None:
            continue
        b = col_bit.get(fc)
        if b is None:
            continue
        try:
            op_idx = SEL_PRED_OPS.index(op)
        except ValueError:
            continue
        vec[ops_off + b * n_ops + op_idx] = 1.0
        if fc in bin_offs:
            const_s = str(const).strip("'")
            bi = _bin_index(vocab, fc, const_s)
            if bi >= 0:
                vec[bins_off + bin_offs[fc][0] + bi] = 1.0
    return vec


def encode_minc_ast(
    df: DataFrame,
    sql_col: str,
    vocab: SqlSchemaVocab,
    ambiguous_multi: bool = False,
) -> tuple[DataFrame, VectorLayout]:
    """AST-grade alternative front end for the MINC encoding: parse +
    scatter inside ONE Arrow pandas UDF (the same declared Python
    exception as the APM path), emitting the identical
    ``minc_features`` layout as sqlencode.encode_minc.
    ``ambiguous_multi`` selects the reference addToColSet parity mode
    for bare SELECT-item columns (see parse_minc_query)."""
    layout = vocab.layout()

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def enc(sql: pd.Series) -> pd.Series:
        out = []
        for s in sql.to_numpy(dtype=object):
            if s is None:
                out.append(None)
                continue
            out.append(
                minc_state_vector(
                    parse_minc_query(
                        s, vocab=vocab, ambiguous_multi=ambiguous_multi
                    ),
                    vocab,
                )
            )
        return pd.Series(out)

    return df.withColumn("minc_features", enc(F.col(sql_col))), layout
