"""MINC-variant SQL intent encoding — the reference's deep segments.

Covers the SURVEY §2 items the regex fragment layer (sqlfragments.py)
alone does not:

  P13  alias / column-owner resolution  — reference
       enc/APMFragmentIntent.java:480-532 (``retrieveTabColName`` /
       ``replaceColAliases``) and enc/SQLParser.java:498-577
       (``correct``): every ``alias.col`` or bare ``col`` becomes
       ``table.col`` against the schema vocabulary before one-hot.
  P12  selection-predicate constant range-binning — reference
       enc/APMFragmentIntent.java:534-695 (int-vs-string compare +
       ``%x%`` substring match against per-column [lo,hi] bins; bin
       vocab loading ch/SchemaParser.java:195-242).
  J2   join-predicate encoding — enc/MINCFragmentIntent.java:525-580:
       ``t1.c1 = t2.c2`` canonicalized by schema table order into
       (tablePair → colPair) bits.
  J3   IN-subquery → equality-join rewrite — enc/SQLParser.java:579-607
       (``parseInAsJoinExp``): ``x IN (SELECT c FROM t)`` contributes
       the join pair (x, t.c).
  MINC vector layout — enc/MINCFragmentIntent.java:833-867
       (``createFragmentVectors``): queryType(4) ‖ tables ‖ projection
       ‖ avg ‖ min ‖ max ‖ sum ‖ count ‖ selection ‖ groupBy ‖ orderBy
       ‖ having ‖ limit(1) ‖ joinPreds ‖ selPredOps ‖ selPredRangeBins.
  F6   integer-parse check — enc/APMFragmentIntent.java:546-559.
  F12  granularity-seconds → ISO period ladder —
       tools/QueryTemplateConverter.java:599-615.

Spark-first split of work: ALL extraction + resolution is JVM column
expressions (regexp + array/map ops, codegen'd); only the final
fixed-width scatter is one Arrow pandas UDF whose body is numpy /
pandas vectorized ops over the (small) per-row fragment sets — the
same division as operators/vectorize.py.  The regex front-end accepts
less SQL than the reference's two parser stacks (declared, SURVEY
§4.1); unresolvable identifiers simply stay OOV and leave bits unset
(the reference swallows lookup misses the same way,
enc/APMFragmentIntent.java:303-305).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqlfeatureextraction_spark.functions.sqlfragments import (
    IDENT,
    SEL_PRED_OPS,
    _clause_each,
    _idents,
    _merge_branch_sets,
    extract_agg_columns,
    strip_literals_and_comments,
)


def _clause_idents(sql: Column, start_kw: str, end_kws: list[str]) -> Column:
    """Identifier set for a clause, accumulated across union branches
    (D8, enc/SQLParser.java:868-886)."""
    return _merge_branch_sets(
        F.transform(_clause_each(sql, start_kw, end_kws), _idents)
    )
from sqlfeatureextraction_spark.layout import Segment, VectorLayout

BARE = r"[a-z_][a-z0-9_]*"
CONST = r"(?:'[^']*'|[0-9]+(?:\.[0-9]+)?)"

# reference queryType order (MINCFragmentIntent.parseQueryAndCreate
# FragmentVectors, :869-887)
QUERY_TYPES = ["select", "update", "insert", "delete"]

AGG_FNS = ("avg", "min", "max", "sum", "count")

_ALIAS_STOP = {
    "where", "join", "on", "using", "group", "order", "limit", "having",
    "left", "right", "inner", "outer", "cross", "full", "union",
    "select", "set", "values", "as", "by",
}


# ------------------------------------------------------------ F6 / F12


def is_integer_str(col: Column) -> Column:
    """F6: Java ``Integer.parseInt``-style check
    (enc/APMFragmentIntent.java:546-559)."""
    return col.rlike(r"^[+-]?[0-9]+$")


def granularity_to_iso_period(col: Column) -> Column:
    """F12: seconds → ISO-8601 period ladder
    (tools/QueryTemplateConverter.java:599-615): null → P1D,
    ≥604800 → P7D, ≥86400 → P1D, ≥3600 → PT1H, else PT1M."""
    digits = F.regexp_replace(col.cast("string"), r"[^0-9]", "")
    v = F.when(digits != "", digits.cast("long"))
    return (
        F.when(col.isNull(), F.lit("P1D"))
        .when(v >= 604800, F.lit("P7D"))
        .when(v >= 86400, F.lit("P1D"))
        .when(v >= 3600, F.lit("PT1H"))
        .otherwise(F.lit("PT1M"))
    )


# -------------------------------------------------------- schema vocab


@dataclass(frozen=True)
class SqlSchemaVocab:
    """Fitted schema dictionaries (the reference's SchemaParser file
    set, ch/SchemaParser.java:143-259, fit programmatically).

    tables      fit order (lexicographic) — defines table bit order and
                the join-pair canonical order
    columns     table → column tuple in SCHEMA order — full-column bit
                order is (table order, then column order)
    col_types   "table.col" → lowercase type string (int-ness for P12)
    join_pairs  "t1,t2" (t1 before t2 in table order) → tuple of
                "c1,c2" colpairs; bit per (tablePair, colPair)
    range_bins  "table.col" → tuple of (lo, hi) STRING pairs in bin
                order (P12 vocab; sorted by full column name)
    """

    tables: tuple
    columns: dict
    col_types: dict
    join_pairs: dict
    range_bins: dict

    @property
    def full_cols(self) -> list[str]:
        return [f"{t}.{c}" for t in self.tables for c in self.columns[t]]

    @property
    def col_bit(self) -> dict:
        return {fc: i for i, fc in enumerate(self.full_cols)}

    @property
    def owner(self) -> dict:
        """bare column → owning table (first declaring table wins —
        reference searchColDictForTableName)."""
        own: dict = {}
        for t in self.tables:
            for c in self.columns[t]:
                own.setdefault(c, t)
        return own

    @property
    def join_bit(self) -> dict:
        """'t1,t2|c1,c2' → bit within the join segment."""
        bits, i = {}, 0
        for tp in sorted(self.join_pairs):
            for cp in self.join_pairs[tp]:
                bits[f"{tp}|{cp}"] = i
                i += 1
        return bits

    @property
    def bin_offsets(self) -> dict:
        """full col → (offset, n_bins) within the range-bin segment."""
        offs, i = {}, 0
        for fc in sorted(self.range_bins):
            offs[fc] = (i, len(self.range_bins[fc]))
            i += len(self.range_bins[fc])
        return offs

    def layout(self) -> VectorLayout:
        """MINC segment order (enc/MINCFragmentIntent.java:833-867).

        Deliberate divergence from the reference binary format: the
        reference's createFragmentVectors has the
        ``createBitVectorForJoin()`` call commented OUT
        (enc/MINCFragmentIntent.java:860), so reference vectors carry
        no join segment.  We keep the join segment enabled — J2/J3 are
        inventory items and the information is strictly additive — so
        our vector is wider than the reference's by ``len(join_bit)``
        bits and all downstream offsets shift accordingly.  Callers
        needing byte-compatible reference layout can pass
        ``join_pairs={}`` at fit time (zero-width segment)."""
        n_cols = len(self.full_cols)
        widths = [
            ("qtype", len(QUERY_TYPES)),
            ("tables", len(self.tables)),
            ("projection", n_cols),
            ("avg", n_cols),
            ("min", n_cols),
            ("max", n_cols),
            ("sum", n_cols),
            ("count", n_cols),
            ("selection", n_cols),
            ("groupby", n_cols),
            ("orderby", n_cols),
            ("having", n_cols),
            ("limit", 1),
            ("join", len(self.join_bit)),
            ("selops", n_cols * len(SEL_PRED_OPS)),
            ("rangebins", sum(len(v) for v in self.range_bins.values())),
        ]
        segs, off = [], 0
        for name, w in widths:
            segs.append(Segment(name, off, w))
            off += w
        return VectorLayout(tuple(segs))


def fit_range_bins(
    df: DataFrame, col: str, n_bins: int, numeric: bool
) -> tuple:
    """P12 bin vocabulary: distinct values, ordered (numerically for
    int-typed columns, lexicographically otherwise), split into n_bins
    contiguous ntile chunks; each bin is (min, max) AS STRINGS — the
    reference stores bins as strings and re-parses per compare
    (ch/SchemaParser.java:195-242, enc/APMFragmentIntent.java:560-618).

    Scale-safe EXACT ntile: instead of a global single-task
    ``Window.orderBy`` (every distinct value through one task — the
    round-2 weak spot), the global rank is computed as
    range-repartition → per-partition local rank → partition-count
    offsets (range partitions are contiguous in the total order, so
    offset+local = global rank), then the standard ntile bucket
    formula (first N%n buckets one value larger).  Output is
    bit-identical to SQL ntile(n) — which the DuckDB oracle
    cross-checks at sf0.01 — and deterministic: ranks depend only on
    the value order, not on partition boundaries."""
    vals = (
        df.select(F.col(col).alias("v")).where(F.col("v").isNotNull()).distinct()
    )
    order = F.col("v").cast("double") if numeric else F.col("v")
    n_part = max(
        2, int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    )
    ranged = (
        vals.withColumn("_o", order)
        .repartitionByRange(n_part, F.col("_o"), F.col("v"))
        .sortWithinPartitions("_o", "v")
        .withColumn("_p", F.spark_partition_id())
    )
    local = ranged.withColumn(
        "_r",
        F.row_number().over(Window.partitionBy("_p").orderBy("_o", "v")) - 1,
    )
    # PERSIST before the two collects: the counts collect and the final
    # bucket collect are separate jobs, and repartitionByRange samples
    # its boundaries from nondeterministically-ordered shuffle output —
    # re-executing the lineage could place values in different
    # partitions between jobs, desynchronizing the collected offsets
    # from the ranks they are added to.  Pinning the materialized
    # partitioning makes offset+local_rank a single consistent total
    # order across both jobs.
    local = local.persist()
    try:
        counts = {
            r["_p"]: r["n"]
            for r in local.groupBy("_p").agg(F.count("*").alias("n")).collect()
        }
        if not counts:
            return ()
        offsets, acc = {}, 0
        for p in sorted(counts):
            offsets[p] = acc
            acc += counts[p]
        n_total = acc
        base, rem = divmod(n_total, n_bins)
        off_expr = F.element_at(
            F.create_map(
                *[F.lit(x) for p, o in offsets.items() for x in (p, o)]
            ),
            F.col("_p"),
        )
        rank = (off_expr + F.col("_r")).cast("long")
        if base == 0:
            bucket = rank + 1  # fewer values than bins: one value per bucket
        else:
            bucket = (
                F.when(rank < rem * (base + 1), rank / (base + 1))
                .otherwise(rem + (rank - rem * (base + 1)) / base)
                .cast("long")
                + 1
            )
        rows = (
            local.withColumn("b", bucket)
            .groupBy("b")
            .agg(
                F.lower(F.min("v").cast("string")).alias("lo"),
                F.lower(F.max("v").cast("string")).alias("hi"),
            )
            .orderBy("b")
            .collect()
        )
        return tuple((r["lo"], r["hi"]) for r in rows)
    finally:
        local.unpersist()


def fit_sql_schema_vocab(
    spark: SparkSession,
    sf_dir: str,
    table_names: tuple = ("customer", "lineitem", "orders"),
    join_pairs: dict | None = None,
    bin_specs: dict | None = None,
) -> SqlSchemaVocab:
    """Fit the schema vocabulary from the parquet tables themselves
    (the reference reads the same information from pre-generated
    schema files)."""
    tables = tuple(sorted(table_names))
    columns, col_types = {}, {}
    dfs = {}
    for t in tables:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        dfs[t] = df
        columns[t] = tuple(f.name for f in df.schema.fields)
        for f in df.schema.fields:
            col_types[f"{t}.{f.name}"] = f.dataType.simpleString().lower()
    if join_pairs is None:
        join_pairs = {
            "customer,orders": ("c_custkey,o_custkey",),
            "lineitem,orders": ("l_orderkey,o_orderkey",),
        }
    # each bin fit is an independent multi-job chain (distinct →
    # range-repartition rank → two collects); submit them from driver
    # threads so one fit's small jobs backfill another's tail
    # (guide §2.6) instead of serializing
    bins = {}
    specs = list((bin_specs or {}).items())
    if specs:
        from concurrent.futures import ThreadPoolExecutor

        def _fit(item):
            fc, n_bins = item
            t, c = fc.split(".")
            numeric = "int" in col_types[fc]
            return fc, fit_range_bins(dfs[t], c, n_bins, numeric)

        with ThreadPoolExecutor(max_workers=min(4, len(specs))) as pool:
            bins = dict(pool.map(_fit, specs))
    return SqlSchemaVocab(
        tables=tables,
        columns=columns,
        col_types=col_types,
        join_pairs=join_pairs,
        range_bins=bins,
    )


# ------------------------------------------------- extraction (JVM side)


def extract_query_type(sql: Column) -> Column:
    """4-way statement-type index; -1 for anything else."""
    kw = F.regexp_extract(F.lower(sql), r"^\s*(select|update|insert|delete)", 1)
    return (F.array_position(F.lit(QUERY_TYPES), kw) - 1).cast("int")


def extract_tables_ext(sql: Column) -> Column:
    """Tables from FROM/JOIN plus UPDATE <t> / INSERT INTO <t>
    (the JSQLParser path handles DML table targets,
    enc/SQLParser.java:145-220).  Runs on literal/comment-stripped
    text so a string constant containing ``from x`` cannot inject
    phantom tables (which would also flip resolve_idents' 1-table
    bare-column fast path)."""
    low = F.lower(strip_literals_and_comments(sql))
    names = F.concat(
        F.regexp_extract_all(low, F.lit(rf"(?:from|join)\s+({IDENT})"), 1),
        F.regexp_extract_all(low, F.lit(rf"update\s+({IDENT})"), 1),
        F.regexp_extract_all(low, F.lit(rf"insert\s+into\s+({IDENT})"), 1),
    )
    return F.array_sort(F.array_distinct(names))


def extract_alias_map(sql: Column) -> Column:
    """alias → table map from FROM/JOIN clauses (``FROM t a`` /
    ``FROM t AS a``); keywords after the table name are not aliases."""
    frags = F.regexp_extract_all(
        F.lower(strip_literals_and_comments(sql)),
        F.lit(rf"(?:from|join)\s+{IDENT}(?:\s+(?:as\s+)?{BARE})?"),
        0,
    )

    def entry(fr):
        tab = F.regexp_extract(fr, rf"(?:from|join)\s+({IDENT})", 1)
        al = F.regexp_extract(
            fr, rf"(?:from|join)\s+{IDENT}\s+(?:as\s+)?({BARE})$", 1
        )
        al = F.when(al.isin(*_ALIAS_STOP) | (al == ""), tab).otherwise(al)
        return F.struct(al.alias("key"), tab.alias("value"))

    entries = F.array_distinct(F.transform(frags, entry))
    # the same alias may bind two DIFFERENT tables (alias reuse across
    # UNION branches / subqueries); map_from_entries would then throw
    # DUPLICATED_MAP_KEY and abort the whole job — keep the FIRST
    # binding per alias so ambiguous aliases degrade to one table (or
    # OOV downstream) instead of crashing
    first_per_key = F.filter(
        entries,
        lambda e, i: ~F.exists(
            F.slice(entries, F.lit(1), i), lambda p: p["key"] == e["key"]
        ),
    )
    return F.map_from_entries(first_per_key)


def _idents_no_agg(col: Column) -> Column:
    return F.filter(_idents(col), lambda t: ~t.isin(*AGG_FNS))


def extract_having_columns(sql: Column) -> Column:
    return _merge_branch_sets(
        F.transform(
            _clause_each(sql, "having", ["order by", "limit"]),
            _idents_no_agg,
        )
    )


def extract_count_columns(sql: Column) -> Column:
    return extract_agg_columns(sql, "count")


def extract_limit_flag(sql: Column) -> Column:
    """1-bit LIMIT presence (reference limitList,
    enc/MINCFragmentIntent.java:470-478)."""
    return F.when(F.lower(sql).rlike(r"\blimit\s+\d+"), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )


def extract_join_pred_pairs(sql: Column) -> Column:
    """J2 raw pairs: ``q1 = q2`` with BOTH sides dot-qualified
    identifiers (unqualified join predicates resolve through P13 the
    same way, but requiring qualification keeps literals out)."""
    frags = F.regexp_extract_all(
        F.lower(strip_literals_and_comments(sql)),
        F.lit(rf"{IDENT}\.{BARE}\s*=\s*{IDENT}\.{BARE}"),
        0,
    )

    def parse(fr):
        return F.struct(
            F.regexp_extract(fr, rf"^({IDENT})", 1).alias("l"),
            F.regexp_extract(fr, rf"=\s*({IDENT})$", 1).alias("r"),
        )

    return F.transform(frags, parse)


def extract_in_subquery_pairs(sql: Column) -> Column:
    """J3: ``x [NOT] IN (SELECT c FROM t [a])`` → join pair (x, c′)
    with c′ owner-defaulted to the subquery table when unqualified
    (enc/SQLParser.java:579-607)."""
    frags = F.regexp_extract_all(
        F.lower(strip_literals_and_comments(sql)),
        F.lit(
            rf"{IDENT}\s+(?:not\s+)?in\s*\(\s*select\s+{IDENT}"
            rf"\s+from\s+{IDENT}"
        ),
        0,
    )

    def parse(fr):
        left = F.regexp_extract(fr, rf"^({IDENT})", 1)
        proj = F.regexp_extract(fr, rf"select\s+({IDENT})", 1)
        tab = F.regexp_extract(fr, rf"from\s+({IDENT})", 1)
        right = F.when(proj.contains("."), proj).otherwise(
            F.concat_ws(".", tab, proj)
        )
        return F.struct(left.alias("l"), right.alias("r"))

    return F.transform(frags, parse)


def extract_sel_pred_consts(sql: Column) -> Column:
    """P11+P12 raw triples: (col, op index, constant) for
    ``col OP literal`` predicates; quotes stripped from the constant
    (reference strips them the same way,
    enc/APMFragmentIntent.java:570)."""
    frags = F.regexp_extract_all(
        F.lower(sql),
        F.lit(rf"{IDENT}\s*(?:<=|>=|<>|!=|=|<|>|like)\s*{CONST}"),
        0,
    )

    def parse(fr):
        col = F.regexp_extract(fr, rf"^({IDENT})", 1)
        op = F.regexp_extract(fr, r"(<=|>=|<>|!=|=|\blike\b|<|>)", 1)
        op = F.when(op == "!=", F.lit("<>")).otherwise(op)
        op_idx = (F.array_position(F.lit(SEL_PRED_OPS), op) - 1).cast("int")
        c = F.regexp_extract(fr, rf"({CONST})\s*$", 1)
        c = F.regexp_replace(c, r"^'|'$", "")
        return F.struct(col.alias("col"), op_idx.alias("op"), c.alias("const"))

    return F.transform(frags, parse)


def resolve_idents(
    ids: Column, alias_map: Column, tables_in: Column, vocab: SqlSchemaVocab
) -> Column:
    """P13: resolve each identifier to ``table.col``.

    Qualified ``q.col``: q is a real table name, else an alias, else
    kept as-is (→ OOV).  Bare ``col``: the single FROM table when there
    is exactly one (reference branch), else the schema owner map; no
    owner → dropped.  Mirrors retrieveTabColName
    (enc/APMFragmentIntent.java:501-532)."""
    owner_map = F.create_map(
        *[F.lit(x) for kv in vocab.owner.items() for x in kv]
    )

    def res(c):
        has_dot = c.contains(".")
        col = F.substring_index(c, ".", -1)
        qual = F.substring_index(
            F.substring_index(c, ".", -2), ".", 1
        )  # tokens[-2] (reference takes the second-to-last token)
        tab_q = F.when(qual.isin(*vocab.tables), qual).otherwise(
            F.coalesce(F.element_at(alias_map, qual), qual)
        )
        tab_b = F.when(
            F.size(tables_in) == 1, F.element_at(tables_in, 1)
        ).otherwise(F.element_at(owner_map, c))
        tab = F.when(has_dot, tab_q).otherwise(tab_b)
        return F.when(tab.isNotNull(), F.concat_ws(".", tab, col))

    out = F.transform(ids, res)
    return F.array_sort(
        F.array_distinct(F.filter(out, lambda x: x.isNotNull()))
    )


def canonical_join_keys(
    pairs: Column, alias_map: Column, tables_in: Column, vocab: SqlSchemaVocab
) -> Column:
    """Resolve both sides of raw join pairs and canonicalize to
    't1,t2|c1,c2' ordered by schema table index
    (enc/MINCFragmentIntent.java:540-556)."""
    t_idx = F.create_map(
        *[
            F.lit(x)
            for t, i in ((t, i) for i, t in enumerate(vocab.tables))
            for x in (t, str(i))
        ]
    )

    def canon(p):
        l = F.element_at(
            resolve_idents(F.array(p["l"]), alias_map, tables_in, vocab), 1
        )
        r = F.element_at(
            resolve_idents(F.array(p["r"]), alias_map, tables_in, vocab), 1
        )
        lt = F.substring_index(l, ".", 1)
        lc = F.substring_index(l, ".", -1)
        rt = F.substring_index(r, ".", 1)
        rc = F.substring_index(r, ".", -1)
        li = F.element_at(t_idx, lt).cast("int")
        ri = F.element_at(t_idx, rt).cast("int")
        fwd = F.concat_ws("|", F.concat_ws(",", lt, rt), F.concat_ws(",", lc, rc))
        rev = F.concat_ws("|", F.concat_ws(",", rt, lt), F.concat_ws(",", rc, lc))
        return F.when(
            l.isNotNull() & r.isNotNull() & li.isNotNull() & ri.isNotNull(),
            F.when(li <= ri, fwd).otherwise(rev),
        )

    out = F.transform(pairs, canon)
    return F.array_sort(
        F.array_distinct(F.filter(out, lambda x: x.isNotNull()))
    )


# ------------------------------------------------------------ encoding


def _bin_match(bins, col_type: str, const: str) -> int:
    """P12 bin match for one (bins, column type, constant) — exact
    reference semantics (enc/APMFragmentIntent.java:560-695): integer
    compare when the column type is int AND the constant parses as int
    (F6); otherwise string compareTo between [lo, hi], with a leading-%
    constant matched by substring against lo/hi; first matching bin
    wins; null/null bins match anything; -1 when nothing matches.
    (Shared by the MINC encoders and the flag-on APM layout.)"""
    if bins is None:
        return -1
    is_int = False
    try:
        int(const)
        is_int = "int" in (col_type or "")
    except ValueError:
        pass
    for i, (lo, hi) in enumerate(bins):
        if lo == "null" and hi == "null":
            return i
        if is_int:
            if int(lo) <= int(const) <= int(hi):
                return i
        elif const.startswith("%"):
            sub = const.replace("%", "")
            if sub in lo or sub in hi:
                return i
        elif lo <= const <= hi:
            return i
    return -1


def _bin_index(vocab: SqlSchemaVocab, full_col: str, const: str) -> int:
    return _bin_match(
        vocab.range_bins.get(full_col),
        vocab.col_types.get(full_col, ""),
        const,
    )


def _scatter_udf(vocab: SqlSchemaVocab):
    layout = vocab.layout()
    width = layout.width
    col_bit = vocab.col_bit
    join_bit = vocab.join_bit
    bin_offs = vocab.bin_offsets
    n_ops = len(SEL_PRED_OPS)
    offs = {s.name: s.offset for s in layout.segments}
    col_segs = [
        "projection", "avg", "min", "max", "sum", "count",
        "selection", "groupby", "orderby", "having",
    ]

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def scatter(
        qtype: pd.Series,
        limit: pd.Series,
        col_sets: pd.DataFrame,  # struct → DataFrame of fullname arrays
        join_keys: pd.Series,
        preds: pd.Series,  # array<struct<col(resolved full), op, const>>
    ) -> pd.Series:
        n = len(qtype)
        mat = np.zeros((n, width), dtype=np.float64)
        rows = np.arange(n)
        q = qtype.to_numpy(dtype=np.float64, na_value=-1).astype(np.int64)
        ok = (q >= 0) & (q < len(QUERY_TYPES))
        mat[rows[ok], offs["qtype"] + q[ok]] = 1.0
        mat[:, offs["limit"]] = limit.to_numpy(dtype=np.float64)

        def scat(series_of_lists, seg_off, bitmap):
            ex = series_of_lists.explode()
            ex = ex[ex.notna()]
            if not len(ex):
                return
            pos = ex.map(bitmap)
            keep = pos.notna()
            if keep.any():
                ridx = ex.index.to_numpy()[keep.to_numpy()]
                cidx = pos[keep].to_numpy(dtype=np.int64) + seg_off
                mat[ridx, cidx] = 1.0

        for seg in col_segs:
            scat(col_sets[seg], offs[seg], col_bit)
        # tables segment: index in fit order
        scat(
            col_sets["tables"],
            offs["tables"],
            {t: i for i, t in enumerate(vocab.tables)},
        )
        scat(join_keys, offs["join"], join_bit)

        # selPredOps + selPredRangeBins (P11 positions + P12 bins)
        ex = preds.explode()
        ex = ex[ex.notna()]
        if len(ex):
            cols = ex.map(lambda p: p["col"])
            opix = ex.map(lambda p: p["op"])
            consts = ex.map(lambda p: p["const"])
            cbit = cols.map(col_bit)
            keep = cbit.notna() & opix.notna() & (opix >= 0)
            if keep.any():
                ridx = ex.index.to_numpy()[keep.to_numpy()]
                cidx = (
                    cbit[keep].to_numpy(dtype=np.int64) * n_ops
                    + opix[keep].to_numpy(dtype=np.int64)
                    + offs["selops"]
                )
                mat[ridx, cidx] = 1.0
            # bins: computed per UNIQUE (col, const) — vocabulary-sized
            # work, not per-row
            key = pd.Series(
                list(zip(cols, consts)), index=ex.index, dtype=object
            )
            uniq = {}
            for c, cv in set(key):
                bi = _bin_index(vocab, c, cv) if c in bin_offs else -1
                uniq[(c, cv)] = bin_offs[c][0] + bi if bi >= 0 else None
            bpos = key.map(uniq)
            bkeep = bpos.notna()
            if bkeep.any():
                ridx = ex.index.to_numpy()[bkeep.to_numpy()]
                cidx = bpos[bkeep].to_numpy(dtype=np.int64) + offs["rangebins"]
                mat[ridx, cidx] = 1.0
        return pd.Series(list(mat))

    return scatter, layout


def encode_minc(
    df: DataFrame, sql_col: str, vocab: SqlSchemaVocab
) -> tuple[DataFrame, VectorLayout]:
    """Append ``minc_features`` (fixed-width MINC intent vector) for
    each SQL text.  Extraction + resolution are JVM expressions; the
    scatter is one Arrow UDF."""
    sql = F.col(sql_col)
    amap = extract_alias_map(sql)
    tabs = extract_tables_ext(sql)

    def rs(ids):
        return resolve_idents(ids, F.col("_amap"), F.col("_tabs"), vocab)

    work = df.withColumn("_amap", amap).withColumn("_tabs", tabs)
    tables_known = F.filter(
        F.col("_tabs"), lambda t: t.isin(*vocab.tables)
    )
    col_sets = F.struct(
        tables_known.alias("tables"),
        rs(_clause_idents(sql, "select", ["from"])).alias("projection"),
        *[
            rs(extract_agg_columns(sql, fn)).alias(fn)
            for fn in ("avg", "min", "max", "sum")
        ],
        rs(extract_count_columns(sql)).alias("count"),
        rs(
            _clause_idents(
                sql, "where", ["group by", "order by", "limit", "having"]
            )
        ).alias("selection"),
        rs(
            _clause_idents(sql, "group by", ["order by", "limit", "having"])
        ).alias("groupby"),
        rs(_clause_idents(sql, "order by", ["limit"])).alias("orderby"),
        rs(extract_having_columns(sql)).alias("having"),
    )
    join_keys = F.array_distinct(
        F.concat(
            canonical_join_keys(
                extract_join_pred_pairs(sql), F.col("_amap"), F.col("_tabs"), vocab
            ),
            canonical_join_keys(
                extract_in_subquery_pairs(sql),
                F.col("_amap"),
                F.col("_tabs"),
                vocab,
            ),
        )
    )

    # resolve predicate columns JVM-side, keep (resolved col, op, const)
    def rpred(p):
        rc = F.element_at(
            resolve_idents(
                F.array(p["col"]), F.col("_amap"), F.col("_tabs"), vocab
            ),
            1,
        )
        return F.struct(
            rc.alias("col"), p["op"].alias("op"), p["const"].alias("const")
        )

    preds = F.filter(
        F.transform(extract_sel_pred_consts(sql), rpred),
        lambda p: p["col"].isNotNull(),
    )

    scatter, layout = _scatter_udf(vocab)
    out = work.withColumn(
        "minc_features",
        scatter(
            extract_query_type(sql),
            extract_limit_flag(sql),
            col_sets,
            join_keys,
            preds,
        ),
    ).drop("_amap", "_tabs")
    return out, layout


def minc_segment_stats(
    df: DataFrame, layout: VectorLayout, vec_col: str = "minc_features"
) -> DataFrame:
    """Per-segment (set-bit count, set-bit position sum) — a compact,
    position-sensitive scalar projection of the MINC vector that an
    independent oracle can recompute."""
    cols = [F.size(vec_col).cast("int").alias("width")]
    for s in layout.segments:
        if s.width == 0:
            # zero-width segment (e.g. join_pairs={} / no bin specs):
            # sequence(0,-1) would yield [0,-1] and zip_with null-pads,
            # making the aggregate NULL — short-circuit to literal 0
            cols.append(F.lit(0).cast("long").alias(f"{s.name}_n"))
            cols.append(F.lit(0).cast("long").alias(f"{s.name}_ps"))
            continue
        sl = F.slice(vec_col, s.offset + 1, s.width)
        cnt = F.aggregate(sl, F.lit(0.0), lambda a, v: a + v)
        pos = F.aggregate(
            F.zip_with(
                sl,
                F.sequence(F.lit(0), F.lit(s.width - 1)),
                lambda v, i: v * i,
            ),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        cols.append(cnt.cast("long").alias(f"{s.name}_n"))
        cols.append(pos.cast("long").alias(f"{s.name}_ps"))
    return df.select(*[c for c in df.columns if c != vec_col], *cols)
