"""Point-in-time (per-event, trailing) window features — SLIDING mode.

Reference analog: ``processPerQueryWindows``
(enc/APMWindowFragmentIntent.java:266-304): for each event, the window
``(ts − W, ts]`` — right-closed, membership test at :340-347 — then
group members by entity (:92), dedupe intent-equal members summing cost
(:306-337), take top-K entities by cost (:369-374) and top-N members
per entity (:376-386), and concatenate member vectors with zero-padding
(:422-493).  The reference re-filters the WHOLE event list per window —
O(W·N) — and re-parses every SQL per window; this plan is a single
sort-based pass that reuses the per-turn vector computed once.

Spark-first formulation (this module = the pure built-in path; the
salted ``applyInPandas`` sort-merge path lives in asof_merge.py):

  1. member lists via ``collect_list().over(rangeBetween(-(W-1), 0))``
     — Spark's sort-based window exec: one shuffle on conv_id, one
     sorted pass per partition; the right-closed ``(ts−W, ts]`` bound
     is ``rangeBetween(-(W−1), 0)`` on integral epoch seconds (Spark's
     own ``F.window`` is left-closed and cannot express this).
     **Member structs are NARROW** — (ts_sec, turn_idx, tool, cost,
     vec_hash), NOT the feature array: carrying the ~2KB vector through
     the window materialization and the dedupe shuffle multiplies
     shuffle bytes by the mean window size (measured: the dominant cost
     at 3M rows, and catastrophic for dense windows).
  2. one anchor row per distinct (conv_id, ts) — the reference skips
     windows with an end-ts equal to the previous one (:280-284);
     with ties all peer rows carry identical member lists (RANGE frame
     includes peers), so any representative is exact.
  3. dedupe/top-K/top-N as groupBy + window functions on the
     (conv_id, ts) key family — dense_rank instead of a top-tools
     self-join (a join would recompute the whole upstream twice).
  4. the ≤ top_k×top_n SELECTED members join their feature vectors
     back by (conv_id, turn_idx) — the full-width vector is shuffled
     exactly once, on the vec side of this join.  `vec` should be
     cached/materialized by the caller (FeaturePipeline does) since
     it feeds both this join and the turn-feature output.
  5. final fixed-width assembly: one Arrow pandas UDF, numpy scatter.

Tie-breaking is a DEFINED total order (the reference's is JVM-HashMap
order, SURVEY §4.4.4): entities by (cost desc, tool asc); members by
(cost desc, ts asc, turn_idx asc); dedupe representative = earliest
(ts, turn_idx) member of the intent-equal group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqlfeatureextraction_spark.config import FeatureConfig
from sqlfeatureextraction_spark.layout import VectorLayout, window_vector_width
from sqlfeatureextraction_spark.vocab import Vocabulary

MEMBER_STRUCT = "struct(ts_sec, turn_idx, tool, cost, vec_hash)"

# scalar projection fields emitted by scalars_only assembly: the fixed
# width, the tool-intent segment sum, PER-SEGMENT sums of the slotted
# turn vectors (time/role/tool/bow/lag — each independently
# oracle-checkable), and the whole-vector sum
SCALAR_FIELDS = (
    "width",
    "tool_bits",
    "time_sum",
    "role_sum",
    "tool_sum",
    "bow_sum",
    "lag_sum",
    "feat_sum",
)


def pit_member_pairs(vec: DataFrame, cfg: FeatureConfig) -> DataFrame:
    """(anchor conv_id, ts, ts_sec) × exploded NARROW members with
    ts' ∈ (ts−W, ts]."""
    w = (
        Window.partitionBy("conv_id")
        .orderBy("ts_sec")
        .rangeBetween(-(cfg.window_size_s - 1), 0)
    )
    # anchor representative at each distinct (conv_id, ts_sec) = the
    # MIN-turn_idx row (its full-precision ts becomes the output ts) —
    # the same convention as the merge path and the pandas oracle, so
    # sub-second timestamps cannot make the two paths disagree
    tie = Window.partitionBy("conv_id", "ts_sec").orderBy(F.asc("turn_idx"))
    anchors = (
        vec.select(
            "conv_id",
            "ts",
            "ts_sec",
            "turn_idx",
            F.collect_list(F.expr(MEMBER_STRUCT)).over(w).alias("members"),
        )
        .withColumn("_rn", F.row_number().over(tie))
        .where(F.col("_rn") == 1)
        .drop("_rn", "turn_idx")
    )
    m = F.explode("members").alias("m")
    return anchors.select("conv_id", "ts", "ts_sec", m).select(
        "conv_id",
        "ts",
        "ts_sec",
        F.col("m.ts_sec").alias("m_ts_sec"),
        F.col("m.turn_idx").alias("m_turn_idx"),
        F.coalesce(F.col("m.tool"), F.lit("")).alias("m_tool"),
        F.col("m.cost").alias("m_cost"),
        F.col("m.vec_hash").alias("m_vec_hash"),
    )


def _assemble_udf(
    vocab: Vocabulary,
    cfg: FeatureConfig,
    layout: VectorLayout,
    scalars_only: bool = False,
):
    """W8 fixed-width assembler.

    scalars_only=True runs the IDENTICAL matrix scatter but reduces the
    assembled rows to SCALAR_FIELDS inside the same Arrow pass — for
    consumers (driver correctness rows, bench) that only check scalar
    projections, the ~out_w×8B per-row array never crosses back to the
    JVM.  The per-turn-segment sums (time/role/tool/bow/lag) are taken
    over the slot region reshaped to (rows, k·n, turn_w), so each of
    the turn layout's segments is verified independently instead of
    one whole-vector sum.
    """
    turn_w = layout.width
    tool_bits = dict(vocab.tools)
    n_tools = layout.seg("tool").width
    k, n = cfg.top_k_entities, cfg.top_n_members
    out_w = window_vector_width(layout, k, n)

    def _fill(slots: pd.Series) -> np.ndarray:
        """tool_intent(|T|) ‖ slot-major, member-minor turn vectors,
        zero-padded (layout formula enc/APMWindowFragmentIntent.java:487-490).
        """
        n_rows = len(slots)
        # float32 like the turn vectors (exact for 0/1 bits + small counts)
        mat = np.zeros((n_rows, out_w), dtype=np.float32)
        for i, members in enumerate(slots.to_numpy()):
            for mrec in members:  # ≤ k*n small structs per anchor
                si = mrec["slot_idx"]
                mi = mrec["member_idx"]
                bit = tool_bits.get(mrec["tool"])
                if bit is not None:
                    mat[i, bit] = 1.0
                start = n_tools + (si * n + mi) * turn_w
                f = mrec["features"]
                if isinstance(f, dict):
                    # sparse struct<idx,val> turn vector: densify here,
                    # at the only place the fixed-width form is needed
                    mat[
                        i, start + np.asarray(f["idx"], dtype=np.int64)
                    ] = f["val"]
                else:
                    mat[i, start : start + turn_w] = f
        return mat

    if scalars_only:
        seg_slices = {
            s.name: (s.offset, s.offset + s.width) for s in layout.segments
        }

        @F.pandas_udf(
            "struct<width:int, tool_bits:bigint, time_sum:bigint,"
            " role_sum:bigint, tool_sum:bigint, bow_sum:bigint,"
            " lag_sum:bigint, feat_sum:bigint>"
        )
        def assemble_scalars(slots: pd.Series) -> pd.DataFrame:
            mat = _fill(slots)
            body = mat[:, n_tools:].reshape(len(slots), k * n, turn_w)
            cols = {
                "width": np.full(len(slots), out_w, dtype=np.int32),
                "tool_bits": mat[:, :n_tools].sum(axis=1).astype(np.int64),
            }
            for name, (lo, hi) in seg_slices.items():
                cols[f"{name}_sum"] = (
                    body[:, :, lo:hi].sum(axis=(1, 2)).astype(np.int64)
                )
            cols["feat_sum"] = mat.sum(axis=1).astype(np.int64)
            return pd.DataFrame(cols)

        return assemble_scalars, out_w

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def assemble(slots: pd.Series) -> pd.Series:
        return pd.Series(list(_fill(slots)))

    return assemble, out_w


def window_features_builtin(
    vec: DataFrame,
    vocab: Vocabulary,
    cfg: FeatureConfig,
    layout: VectorLayout,
    scalars_only: bool = False,
) -> DataFrame:
    """(conv_id, ts) → window_features:array<double> via pure DataFrame ops.

    scalars_only=True emits (width, tool_bits, feat_sum) instead of the
    array — same pipeline and same matrix scatter, reduced in-UDF."""
    pairs = pit_member_pairs(vec, cfg)

    # A2: dedupe intent-equal members within the window, summing cost;
    # representative = earliest (ts, turn_idx) member.
    dedup = pairs.groupBy("conv_id", "ts", "ts_sec", "m_tool", "m_vec_hash").agg(
        F.sum("m_cost").alias("g_cost"),
        F.min(F.struct("m_ts_sec", "m_turn_idx")).alias("g_ord"),
    )

    # W6 + W7 as window functions over ONE pipeline — a join of
    # top-tools back onto dedup would make Catalyst compute the whole
    # upstream (scan + Arrow vectorizer) twice; dense_rank over the
    # same (conv_id, ts_sec) partitioning keeps it single-pass and
    # reuses the groupBy's hash partitioning (no extra shuffle).
    tool_cost_w = Window.partitionBy("conv_id", "ts_sec", "m_tool")
    slot_w = Window.partitionBy("conv_id", "ts_sec").orderBy(
        F.desc("tool_cost"), F.asc("m_tool")
    )
    mem_w = Window.partitionBy("conv_id", "ts_sec", "m_tool").orderBy(
        F.desc("g_cost"), F.asc("g_ord")
    )
    members = (
        dedup.withColumn("tool_cost", F.sum("g_cost").over(tool_cost_w))
        .withColumn("slot_idx", F.dense_rank().over(slot_w) - 1)
        .where(F.col("slot_idx") < cfg.top_k_entities)
        .withColumn("member_idx", F.row_number().over(mem_w) - 1)
        .where(F.col("member_idx") < cfg.top_n_members)
    )

    # join the representative's feature vector back — the wide array is
    # shuffled once (vec side); `members` is ≤ k·n rows per anchor
    feats = vec.select(
        "conv_id",
        F.col("turn_idx").alias("rep_turn_idx"),
        F.col("features").alias("g_features"),
    )
    members = members.withColumn(
        "rep_turn_idx", F.col("g_ord").getField("m_turn_idx")
    ).join(feats, ["conv_id", "rep_turn_idx"])

    # W8: fixed-width assembly.  ts_sec rides along (1:1 with ts per
    # conv — the anchor key family) so downstream joins can normalize
    # on the epoch key even with sub-second timestamps.
    assemble, out_w = _assemble_udf(vocab, cfg, layout, scalars_only)
    slots = members.groupBy("conv_id", "ts_sec", "ts").agg(
        F.collect_list(
            F.struct(
                F.col("slot_idx"),
                F.col("member_idx"),
                F.col("m_tool").alias("tool"),
                F.col("g_features").alias("features"),
            )
        ).alias("slots")
    )
    if scalars_only:
        return slots.select(
            "conv_id",
            "ts_sec",
            "ts",
            assemble(F.col("slots")).alias("s"),
        ).select(
            "conv_id", "ts_sec", "ts", *[f"s.{f}" for f in SCALAR_FIELDS]
        )
    return slots.select(
        "conv_id",
        "ts_sec",
        "ts",
        assemble(F.col("slots")).alias("window_features"),
    )


def window_feature_scalars(
    vec_s: DataFrame,
    vocab: Vocabulary,
    cfg: FeatureConfig,
    layout: VectorLayout,
) -> DataFrame:
    """Flagship SCALAR projection via narrow per-turn sums — the same
    output as ``window_features_builtin(..., scalars_only=True)``
    (pinned by tests), with the payload path removed (guide §2.3/§8):

      * input is ``with_turn_scalars`` output — per-turn segment sums
        ride IN the member struct (5 extra int32s), so the
        feature-join back onto ``vec`` disappears, and with it the
        caching / broadcast of the wide vector column;
      * the fixed-width matrix scatter is replaced by exact integer
        arithmetic on the JVM: segment sums of the assembled window
        matrix = Σ over selected members of their per-turn segment
        sums (slots never overlap: (slot_idx, member_idx) is unique
        per anchor), and the tool-intent popcount = the number of
        distinct in-vocabulary tools among selected members — so the
        second ArrowEvalPython node disappears too.

    Whole pipeline: exactly two hash exchanges on conv_id (the second
    only because the Python-eval node cannot advertise that it
    preserves its child's partitioning); every groupBy/window after it
    is keyed on a superset of conv_id and reuses the one exchange.
    Sort placement is deliberate: the anchor-tie row_number orders by
    turn_idx so ONE (conv_id, ts_sec, turn_idx) sort serves both it
    and the range-frame member window; the member-rank window runs
    BEFORE the slot-rank window so its filter shrinks the rows the
    second sort sees."""
    w = (
        Window.partitionBy("conv_id")
        .orderBy("ts_sec")
        .rangeBetween(-(cfg.window_size_s - 1), 0)
    )
    tie = Window.partitionBy("conv_id", "ts_sec").orderBy(F.asc("turn_idx"))
    member = F.struct(
        "ts_sec",
        "turn_idx",
        "tool",
        "cost",
        "vec_hash",
        "s_time",
        "s_role",
        "s_tool",
        "s_bow",
        "s_lag",
    )
    # explicit conv_id repartition: the Python eval node upstream
    # cannot advertise partitioning, so without this the planner
    # satisfies the tie window with a (conv_id, ts_sec) exchange and
    # then needs a SECOND exchange back to conv_id for the range
    # window; pinning conv_id here lets one exchange serve the entire
    # downstream chain (every partition spec is a conv_id superset)
    vec_s = vec_s.repartition("conv_id")
    # _rn FIRST: its (conv_id, ts_sec, turn_idx) sort also satisfies
    # the (conv_id, ts_sec)-sorted range-frame member window, so the
    # planner emits ONE sort for both (members computed over ALL rows
    # — the _rn filter only selects which row keeps the list, and a
    # filter on a window output never pushes below the other window)
    anchors = (
        vec_s.withColumn("_rn", F.row_number().over(tie))
        .select(
            "conv_id",
            "ts_sec",
            "_rn",
            F.collect_list(member).over(w).alias("members"),
        )
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    m = F.explode("members").alias("m")
    pairs = anchors.select("conv_id", "ts_sec", m).select(
        "conv_id",
        "ts_sec",
        F.col("m.ts_sec").alias("m_ts_sec"),
        F.col("m.turn_idx").alias("m_turn_idx"),
        F.coalesce(F.col("m.tool"), F.lit("")).alias("m_tool"),
        F.col("m.cost").alias("m_cost"),
        F.col("m.vec_hash").alias("m_vec_hash"),
        F.col("m.s_time").alias("m_s_time"),
        F.col("m.s_role").alias("m_s_role"),
        F.col("m.s_tool").alias("m_s_tool"),
        F.col("m.s_bow").alias("m_s_bow"),
        F.col("m.s_lag").alias("m_s_lag"),
    )

    # A2 dedupe — identical grouping to window_features_builtin, kept
    # HASH-aggregable (all-primitive keys and buffers; min(struct)
    # would force a SortAggregate + an extra 5-key sort):
    #   * the per-segment sums are functionally dependent on
    #     m_vec_hash (equal hash ⇒ equal vector ⇒ equal sums), so
    #     adding them to the GROUP KEY cannot split any group;
    #   * the (m_ts_sec, m_turn_idx) representative order packs into
    #     one BIGINT — ts_sec < 2^32 until year 2106 and turn_idx is a
    #     non-negative int32, so (ts_sec << 31) + turn_idx stays below
    #     2^63 and preserves the lexicographic order exactly.
    g_ord_packed = (
        F.shiftleft(F.col("m_ts_sec"), 31) + F.col("m_turn_idx")
    ).cast("long")
    dedup = pairs.groupBy(
        "conv_id",
        "ts_sec",
        "m_tool",
        "m_vec_hash",
        "m_s_time",
        "m_s_role",
        "m_s_tool",
        "m_s_bow",
        "m_s_lag",
    ).agg(
        F.sum("m_cost").alias("g_cost"),
        F.min(g_ord_packed).alias("g_ord"),
    )

    # member rank FIRST (its sort also satisfies the order-free
    # tool_cost window: same partition-key prefix), filter to <= top_n
    # per tool, THEN rank tools — the slot sort runs on the filtered
    # rows
    tool_cost_w = Window.partitionBy("conv_id", "ts_sec", "m_tool")
    mem_w = Window.partitionBy("conv_id", "ts_sec", "m_tool").orderBy(
        F.desc("g_cost"), F.asc("g_ord")
    )
    slot_w = Window.partitionBy("conv_id", "ts_sec").orderBy(
        F.desc("tool_cost"), F.asc("m_tool")
    )
    members = (
        dedup.withColumn("member_idx", F.row_number().over(mem_w) - 1)
        .withColumn("tool_cost", F.sum("g_cost").over(tool_cost_w))
        .where(F.col("member_idx") < cfg.top_n_members)
        .withColumn("slot_idx", F.dense_rank().over(slot_w) - 1)
        .where(F.col("slot_idx") < cfg.top_k_entities)
    )

    out_w = window_vector_width(
        layout, cfg.top_k_entities, cfg.top_n_members
    )
    in_vocab_tools = sorted(vocab.tools)
    seg_sum = [
        F.sum(F.col(f"m_s_{s}")).cast("long").alias(f"{s}_sum")
        for s in ("time", "role", "tool", "bow", "lag")
    ]
    agg = members.groupBy("conv_id", "ts_sec").agg(
        F.size(
            F.collect_set(
                F.when(
                    F.col("m_tool").isin(in_vocab_tools), F.col("m_tool")
                )
            )
        )
        .cast("bigint")
        .alias("tool_bits"),
        *seg_sum,
    )
    return agg.select(
        "conv_id",
        "ts_sec",
        F.lit(out_w).cast("int").alias("width"),
        "tool_bits",
        "time_sum",
        "role_sum",
        "tool_sum",
        "bow_sum",
        "lag_sum",
        (
            F.col("tool_bits")
            + F.col("time_sum")
            + F.col("role_sum")
            + F.col("tool_sum")
            + F.col("bow_sum")
            + F.col("lag_sum")
        )
        .cast("bigint")
        .alias("feat_sum"),
    )


def ewma_time_decay(
    df: DataFrame,
    half_life_s: float,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple = (),
    round_dp: int = 6,
    quantize_dp: int | None = None,
) -> DataFrame:
    """Time-decayed running sum over irregular event times — the
    classic point-in-time recency feature: at each row,
    ``ewma = Σ_{j ≤ i} v_j · 2^{-(t_i − t_j)/half_life}`` (each past
    observation halves in weight every ``half_life_s`` seconds;
    strictly causal, uses only rows with t' ≤ t).

    Spark-first, NO per-row loop: the linear recurrence folds into a
    prefix sum via rescaling — with λ = ln2/half_life and t0 = the
    entity's first timestamp (a window min),
    ``ewma_i = exp(−λ(t_i−t0)) · Σ_{j≤i} v_j·exp(λ(t_j−t0))`` —
    one conversation-key window computing the cumsum, whole-stage
    codegen, identical arithmetic order in any SQL engine (so the
    oracle matches to rounding).

    Range constraint (documented, asserted): the rescaled exponent
    λ·(t_max−t0) must stay under ~700 or exp overflows double — at
    half-life h the window span must be ≲ 1000·h.  For longer spans
    segment the timeline and carry the boundary value (the streaming
    path's state-passing does exactly that); this operator targets
    the windowed-feature regime where spans are session/window
    sized.

    ``quantize_dp`` makes the prefix sum cross-engine exact: each
    rescaled term v_j*exp(lam*(t_j-t0)) is rounded to that many
    decimal places and accumulated as a scaled int64 (associative —
    partition-merge order and window-frame association cannot change
    a bit), so the only remaining float steps are the per-row exp()
    and one multiply+round, whose ulp noise does not accumulate.
    Without it a 10k-row running double sum drifts by ulps into
    ROUND boundaries and two engines can disagree on the 6th
    decimal.  Term magnitudes must satisfy |term|*10^dp*rows <
    2^63 — trivially true in the windowed-feature regime.

    Output: df's columns + ewma (rounded).
    """
    import math

    lam = math.log(2.0) / float(half_life_s)
    w_all = Window.partitionBy(entity_col)
    w_ord = Window.partitionBy(entity_col).orderBy(
        ts_col, *[F.asc(c) for c in order_cols]
    )
    t = F.col(ts_col).cast("timestamp").cast("long")
    t0 = F.min(t).over(w_all)
    scaled = F.col(value_col) * F.exp(F.lit(lam) * (t - t0))
    if quantize_dp is not None:
        s = 10 ** quantize_dp
        term = F.round(scaled * s).cast("long")
        run = F.sum(term).over(
            w_ord.rowsBetween(Window.unboundedPreceding, 0)
        )
        return df.withColumn(
            "ewma",
            F.round(
                F.exp(-F.lit(lam) * (t - t0))
                * (run.cast("double") / F.lit(float(s))),
                round_dp,
            ),
        )
    run = F.sum(scaled).over(
        w_ord.rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(
        "ewma", F.round(F.exp(-F.lit(lam) * (t - t0)) * run, round_dp)
    )
