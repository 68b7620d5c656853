"""Structured Streaming variants of the windowed feature aggregation.

The reference is pure batch, but its semantics are event-time streaming
semantics (SURVEY §2.9): sorted input replaces a watermark; FIXED
windows are tumbling/sliding event-time windows; sessions are gap
windows.  These are the streaming formulations for when transcripts
arrive as a stream:

  * windowed_counts: watermarked sliding window aggregation
    (reference W1 — note Spark's window() is LEFT-closed; the batch
    engine's right-closed bounds are kept there, and the divergence is
    documented here rather than hidden)
  * session_windows: F.session_window gap-based sessionization
  * stateful_turn_counter: applyInPandasWithState running per-entity
    counters (the reference's prevSessionID/queryID counters,
    enc/IntentCreatorMultiThread.java:73-78)

Batch parity of aggregation values is pinned by tests using the
file-source → memory-sink pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _col_ddl(df: DataFrame, col: str) -> str:
    """DDL type string of an input column, so applyInPandasWithState
    output schemas track the caller's actual entity type instead of
    hardcoding string."""
    return df.schema[col].dataType.simpleString()


def windowed_counts(
    stream: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
    entity_col: str = "tool",
    cost_col: str = "duration_ms",
) -> DataFrame:
    win = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), F.col(entity_col))
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(cost_col).alias("total_cost"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            entity_col,
            "n_turns",
            "total_cost",
        )
    )


def session_windows(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    entity_col: str = "conv_id",
) -> DataFrame:
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), F.col(entity_col))
        .agg(F.count("*").alias("n_turns"))
        .select(
            entity_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_turns",
        )
    )


def stateful_turn_counter(
    stream: DataFrame,
    entity_col: str = "conv_id",
    gap_s: int = 1800,
):
    """Custom stateful operator: running turn counter + monotonic
    session_id per conversation, kept in GroupState across micro-batches
    (``applyInPandasWithState``).  The streaming analog of the
    reference's prevSessionID/queryID counters
    (enc/IntentCreatorMultiThread.java:73-78).

    State: (n_turns_so_far, last_ts_sec, session_id).
    Output per input row: conv_id, ts, turn_no (1-based, stable across
    batches), session_id.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        f"{entity_col} {_col_ddl(stream, entity_col)}, ts timestamp, "
        "turn_no long, session_id long"
    )
    state_schema = "n long, last_ts long, sess long"

    import numpy as np

    def fn(key, pdfs, state):
        # vectorized within each micro-batch: gap flags → cumsum; only
        # the scalar (n, last_ts, sess) carries across batches.
        # pdfs is an iterator of positional Arrow chunks in ARBITRARY
        # row order — the batch is one atomic set, so concat + ONE sort
        # (a per-chunk pass mis-orders any group larger than one chunk)
        n, last_ts, sess = state.get if state.exists else (0, None, 0)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts", "turn_idx"], kind="mergesort"
            )
            ts_sec = (
                pdf["ts"].astype("datetime64[s]").astype("int64").to_numpy()
            )
            prev = np.empty_like(ts_sec)
            prev[1:] = ts_sec[:-1]
            prev[0] = last_ts if last_ts is not None else ts_sec[0]
            flags = (ts_sec - prev > gap_s).astype(np.int64)
            sess_ids = sess + np.cumsum(flags)
            turn_no = n + np.arange(1, len(ts_sec) + 1, dtype=np.int64)
            n += len(ts_sec)
            last_ts = int(ts_sec[-1])
            sess = int(sess_ids[-1])
            state.update((n, last_ts, sess))
            yield pd.DataFrame(
                {
                    entity_col: key[0],
                    "ts": pdf["ts"].to_numpy(),
                    "turn_no": turn_no,
                    "session_id": sess_ids,
                }
            )
        else:
            state.update((n, last_ts, sess))

    return stream.groupBy(entity_col).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def stateful_pit_window(
    stream: DataFrame,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    window_s: int = 300,
    idle_timeout_s: int | None = None,
):
    """Streaming point-in-time rolling window (the W2/W3 flagship
    semantics, incrementally): per entity, emit the right-closed
    ``(ts − window_s, ts]`` trailing sum/count for every arriving row,
    with the trailing window's (ts, value) arrays kept in GroupState
    across micro-batches.

    Matches the batch formulation exactly (``Window.partitionBy(entity)
    .orderBy(ts_sec).rangeBetween(-(window_s-1), 0)``) INCLUDING the
    RANGE-frame tie semantics: rows sharing one ts_sec all see the same
    window, which contains every equal-ts row — so within a batch the
    emit is computed per distinct ts over the full batch+state timeline
    (vectorized: one sort + cumsum + two searchsorted calls per group,
    no per-row Python).

    Cross-batch contract: micro-batches must arrive in event-time order
    per entity (an append-only time-ordered log — the same contract the
    reference's sequential reader has, enc/APMFragmentIntent.java's
    line-ordered session logs) and equal-ts ties must not straddle a
    batch boundary; the pytest pins multi-batch equality to the batch
    engine under that contract (tests/test_stateful_stream.py).  A
    violation (a batch row OLDER than already-consumed state) would
    make the searchsorted timeline unsorted and corrupt results
    silently, so it raises instead — fail loudly, never emit wrong
    windows.

    Per-key state is bounded by the window span; TOTAL state is
    bounded only if idle keys are evicted — pass ``idle_timeout_s`` on
    unbounded high-cardinality streams to remove a key's state after
    that much processing-time inactivity (an evicted key that later
    reappears is treated as fresh, correct whenever the key was idle
    longer than window_s of EVENT time too).  None keeps state forever
    (bounded replays, tests).

    Operational caveat: with ProcessingTimeTimeout the micro-batch
    engine always has a pending timeout-evaluation batch, so
    ``query.processAllAvailable()`` never quiesces — drive timed
    queries with a processing-time trigger and poll the sink/progress
    instead (see tests/test_stateful_stream.py's eviction test).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        f"{entity_col} {_col_ddl(stream, entity_col)}, {id_col} long, "
        "ts_sec long, w_sum double, w_cnt long"
    )
    state_schema = "ts array<long>, val array<double>"
    lo_lag = window_s - 1  # right-closed: keep ts' >= ts - (W-1)
    timeout_mode = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_s is not None
        else GroupStateTimeout.NoTimeout
    )

    def fn(key, pdfs, state):
        if idle_timeout_s is not None and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            s_ts, s_val = state.get
            s_ts = np.asarray(s_ts, dtype=np.int64)
            s_val = np.asarray(s_val, dtype=np.float64)
        else:
            s_ts = np.empty(0, dtype=np.int64)
            s_val = np.empty(0, dtype=np.float64)
        # pdfs is an iterator of ARROW CHUNKS of one group's micro-batch
        # (positional ~10k-row splits, NOT time-ordered): the batch is
        # one atomic set, so concat + one sort, never per-chunk windows
        # — a per-chunk pass would mis-window any group larger than one
        # chunk whose later chunk holds earlier timestamps
        frames = [pdf for pdf in pdfs if len(pdf)]
        if frames:
            pdf = pd.concat(frames, ignore_index=True).sort_values(
                [ts_col, id_col], kind="mergesort"
            )
            b_ts = (
                pdf[ts_col].astype("datetime64[s]").astype("int64").to_numpy()
            )
            if len(s_ts) and b_ts[0] <= s_ts[-1]:
                # ordering-contract violation.  Strictly older: the
                # timeline would be unsorted.  EQUAL: a tie straddling
                # the batch boundary — the tied row already emitted in
                # the earlier batch can never see this one, so its
                # window silently diverges from the batch RANGE frame.
                # Both corrupt results from here on; fail loudly.
                raise ValueError(
                    f"stateful_pit_window: batch for key {key[0]!r} "
                    f"contains ts {b_ts[0]} not strictly newer than "
                    f"already-consumed state max {s_ts[-1]}; "
                    "micro-batches must arrive in per-entity event-time "
                    "order and equal-ts ties must not straddle a batch "
                    "boundary"
                )
            b_val = pdf[val_col].to_numpy(dtype=np.float64)
            ts_all = np.concatenate([s_ts, b_ts])
            val_all = np.concatenate([s_val, b_val])
            csum = np.concatenate([[0.0], np.cumsum(val_all)])
            # per batch row: window = rows with ts in [ts_i - (W-1), ts_i]
            lo = np.searchsorted(ts_all, b_ts - lo_lag, side="left")
            hi = np.searchsorted(ts_all, b_ts, side="right")
            yield pd.DataFrame(
                {
                    entity_col: key[0],
                    id_col: pdf[id_col].to_numpy(dtype=np.int64),
                    "ts_sec": b_ts,
                    "w_sum": csum[hi] - csum[lo],
                    "w_cnt": (hi - lo).astype(np.int64),
                }
            )
            # carry only what any future (ts >= max_ts) window can reach
            keep = ts_all >= ts_all[-1] - lo_lag
            s_ts, s_val = ts_all[keep], val_all[keep]
            state.update((s_ts.tolist(), s_val.tolist()))
            if idle_timeout_s is not None:
                state.setTimeoutDuration(idle_timeout_s * 1000)

    return stream.groupBy(entity_col).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        timeout_mode,
    )


def exact_dedup_stream(
    stream: DataFrame,
    key_cols: list[str],
    watermark: tuple[str, str] | None = None,
    within_watermark: bool = False,
) -> DataFrame:
    """Streaming exact deduplication on `key_cols`: the first arrival
    of a key emits, repeats are suppressed — the streaming counterpart
    of the batch exact-dedup (D7 analog; dedup.py exact path).

    Two state regimes, both built-in (no custom state code):

    * default (`within_watermark=False`): ``dropDuplicates`` — exact
      global dedup; key state is kept forever, so this is correct for
      key spaces that fit state (e.g. daily-bounded ingest with
      restarts between days).  No watermark is applied in this regime
      even if one is passed: a watermarked event-time column would
      make the dedup operator FILTER late rows before the key lookup,
      so a first-seen key arriving later than the delay would be
      silently lost — data loss, not dedup — while buying nothing
      (state on non-event-time keys is never evicted anyway).
    * `within_watermark=True`: ``dropDuplicatesWithinWatermark`` —
      state for a key is dropped once the watermark passes it, so
      state is bounded by the watermark horizon (the unbounded-stream
      posture); a duplicate arriving later than the watermark delay
      re-emits.  That trade is Spark's documented semantics, and the
      right one at 10^12 rows/day: exactness within the lateness bound
      the pipeline already assumes.

    `watermark` = (event-time column, delay); required for (and only
    used by) the bounded regime.
    """
    if within_watermark:
        if watermark is None:
            raise ValueError(
                "within_watermark=True requires a watermark"
            )
        return stream.withWatermark(
            *watermark
        ).dropDuplicatesWithinWatermark(key_cols)
    return stream.dropDuplicates(key_cols)


def run_stream_to_memory(
    agg: DataFrame, name: str, output_mode: str = "complete"
):
    """Drive a bounded file-backed stream to completion synchronously;
    results land in the in-memory table `name`.  output_mode:
    "complete" for full-result aggregations, "append" for stateful
    per-row operators."""
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q


def stateful_cusum(
    stream: DataFrame,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    mu: float = 0.0,
    sigma: float = 1.0,
    h: float = 4.0,
    round_dp: int = 6,
    quantize_dp: int | None = None,
):
    """Streaming Page CUSUM level-shift monitor — the incremental twin
    of operators/stats.cusum_changepoint, against a FIXED reference
    (mu, sigma) as live monitoring does (the batch op estimates them
    from the group; a monitor pins them from a calibration window).

    ``quantize_dp`` mirrors the batch operator's integer-exact path:
    values and mu are scaled to 10^dp integers and the two state
    scalars accumulate in int64, so the emitted statistic is
    bit-identical to any batch/SQL replay regardless of micro-batch
    boundaries or summation association — float cumsums drift by
    ulps over long histories and can flip a ROUND boundary.  Use it
    when the input has fixed decimal granularity.

    The closed prefix-sum form is what makes the statistic
    incremental: S_i = P_i - min(0, min_{j<=i} P_j) needs only TWO
    scalars of state per entity — the running prefix P and its
    running min M (seeded at 0 = the empty prefix) — regardless of
    how much history flowed by.  Per micro-batch the update is one
    vectorized cumsum + minimum.accumulate, no per-row Python; each
    emitted row carries the exact same statistic the batch operator
    would compute over the full history.  Same per-entity event-time
    ordering contract as stateful_pit_window (append-only log);
    violations raise rather than emit wrong statistics.

    Output per row: entity, id, ts_sec, cusum (rounded), is_shift
    (cusum > h * sigma).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        f"{entity_col} {_col_ddl(stream, entity_col)}, {id_col} long, "
        "ts_sec long, cusum double, is_shift boolean"
    )
    state_schema = "p double, m double, last_ts long"

    def fn(key, pdfs, state):
        p, m, last_ts = (
            state.get if state.exists else (0.0, 0.0, None)
        )
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            state.update((p, m, last_ts))
            return
        pdf = pd.concat(frames, ignore_index=True)
        # order by TRUNCATED seconds then id — the batch operator and
        # its oracle order by (ts_sec, event_id), so sorting on the
        # raw microsecond ts would process same-second rows whose
        # sub-second order inverts their id order differently and
        # silently diverge the running prefix
        pdf["_ts_sec"] = (
            pdf[ts_col].astype("datetime64[s]").astype("int64")
        )
        pdf = pdf.sort_values(["_ts_sec", id_col], kind="mergesort")
        b_ts = pdf["_ts_sec"].to_numpy()
        if last_ts is not None and len(b_ts) and b_ts[0] <= last_ts:
            # EQUAL is rejected too (same contract as
            # stateful_pit_window): rows sharing a ts order by id_col,
            # so a tie straddling a batch boundary could replay in a
            # different order than the batch closed form and silently
            # shift every subsequent prefix.
            raise ValueError(
                f"stateful_cusum: batch for key {key[0]!r} contains "
                f"ts {b_ts[0]} not strictly newer than already-"
                f"consumed {last_ts}; micro-batches must arrive in "
                "per-entity event-time order and equal-ts ties must "
                "not straddle a batch boundary"
            )
        v = pdf[val_col].to_numpy(dtype=np.float64)
        if quantize_dp is not None:
            # integer-exact: scaled int64 accumulation (associative,
            # batch-boundary- and engine-independent); the state
            # doubles hold exact integer values (< 2^53)
            s = 10 ** quantize_dp
            v_int = np.rint(v * s).astype(np.int64)
            mu_int = int(np.rint(float(mu) * s))
            p_arr = np.int64(p) + np.cumsum(v_int - mu_int)
            m_arr = np.minimum(
                np.minimum.accumulate(p_arr), np.int64(m)
            )
            cusum = np.round((p_arr - m_arr) / float(s), round_dp)
        else:
            p_arr = p + np.cumsum(v - float(mu))
            m_arr = np.minimum(np.minimum.accumulate(p_arr), m)
            cusum = np.round(p_arr - m_arr, round_dp)
        state.update(
            (float(p_arr[-1]), float(m_arr[-1]), int(b_ts[-1]))
        )
        yield pd.DataFrame(
            {
                entity_col: key[0],
                id_col: pdf[id_col].to_numpy(dtype=np.int64),
                "ts_sec": b_ts,
                "cusum": cusum,
                "is_shift": cusum > float(h) * float(sigma),
            }
        )

    return stream.groupBy(entity_col).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )
