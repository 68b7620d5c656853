"""Single-node pandas/NumPy reference implementation (the test oracle).

Implements the SAME semantics as the Spark engine, written
independently in the most literal way possible (per-window loops, like
the reference's row-at-a-time Java at
SQLFeatureExtraction enc/APMWindowFragmentIntent.java), so agreement is
meaningful.  Never used by the engine; only by pytest via
``numpy.allclose`` at every (conv_id, ts).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

TOKEN_SPLIT_RE = re.compile(r"[^a-z0-9]+")


def tokenize(text) -> list[str]:
    if text is None or (isinstance(text, float) and np.isnan(text)):
        return []
    return [t for t in TOKEN_SPLIT_RE.split(str(text).lower()) if t]


def fit_vocab(pdf: pd.DataFrame, min_count: int = 1, max_tokens=None):
    counts: dict[str, int] = {}
    for txt in pdf["text"]:
        for t in tokenize(txt):
            counts[t] = counts.get(t, 0) + 1
    items = [(t, c) for t, c in counts.items() if c >= min_count]
    if max_tokens is not None:
        items.sort(key=lambda tc: (-tc[1], tc[0]))
        items = items[:max_tokens]
    tokens = sorted(t for t, _ in items)
    roles = sorted(pdf["role"].dropna().unique())
    tools = sorted(pdf["tool"].fillna("").unique())
    return (
        {t: i for i, t in enumerate(tokens)},
        {r: i for i, r in enumerate(roles)},
        {t: i for i, t in enumerate(tools)},
    )


def turn_vectors(
    pdf: pd.DataFrame,
    tokens: dict,
    roles: dict,
    tools: dict,
    grans=(60, 300, 1800, 3600, 86400, 604800, 2592000, 7776000, 31536000),
    binary_bow: bool = True,
) -> pd.DataFrame:
    """Rows sorted (conv_id, ts, turn_idx); adds ts_sec, lag_sec, vector."""
    df = pdf.sort_values(["conv_id", "ts", "turn_idx"]).reset_index(drop=True)
    df["ts_sec"] = (df["ts"].astype("datetime64[s]").astype("int64")).astype(
        np.int64
    )
    df["lag_sec"] = df.groupby("conv_id")["ts_sec"].diff()

    width = 31 + len(roles) + len(tools) + len(tokens) + len(grans)
    r_off = 31
    o_off = r_off + len(roles)
    b_off = o_off + len(tools)
    l_off = b_off + len(tokens)

    vecs = []
    for _, row in df.iterrows():
        v = np.zeros(width)
        ts = pd.Timestamp(row["ts"])
        # ISO day-of-week, Monday=bit 0 (reference getDayOfWeek().getValue()-1,
        # enc/APMFragmentIntent.java:752-777; Spark side uses F.weekday)
        v[ts.dayofweek] = 1.0
        v[7 + ts.hour] = 1.0
        if row["role"] in roles:
            v[r_off + roles[row["role"]]] = 1.0
        tool = row["tool"] if pd.notna(row["tool"]) else ""
        if tool in tools:
            v[o_off + tools[tool]] = 1.0
        for t in tokenize(row["text"]):
            if t in tokens:
                if binary_bow:
                    v[b_off + tokens[t]] = 1.0
                else:
                    v[b_off + tokens[t]] += 1.0
        lag = row["lag_sec"]
        for i, g in enumerate(grans):
            v[l_off + i] = 1.0 if (pd.isna(lag) or lag >= g) else 0.0
        vecs.append(v)
    df["vector"] = vecs
    df["cost"] = df["duration_ms"].fillna(1).astype(np.int64)
    return df


def window_features(
    tv: pd.DataFrame,
    tools: dict,
    window_s: int = 300,
    top_k: int = 1,
    top_n: int = 2,
) -> pd.DataFrame:
    """Per distinct (conv_id, ts): trailing (ts−W, ts] window vector."""
    turn_w = len(tv["vector"].iloc[0])
    out_w = len(tools) + top_k * top_n * turn_w
    out_rows = []
    for conv_id, g in tv.groupby("conv_id", sort=True):
        g = g.sort_values(["ts_sec", "turn_idx"]).reset_index(drop=True)
        for ts_end in sorted(g["ts_sec"].unique()):
            mem = g[(g["ts_sec"] > ts_end - window_s) & (g["ts_sec"] <= ts_end)]
            # dedupe by (tool, vector-bytes): cost sum, earliest rep
            groups: dict = {}
            for _, r in mem.iterrows():
                tool = r["tool"] if pd.notna(r["tool"]) else ""
                key = (tool, r["vector"].tobytes())
                if key not in groups:
                    groups[key] = {
                        "tool": tool,
                        "cost": 0,
                        "ord": (r["ts_sec"], r["turn_idx"]),
                        "vector": r["vector"],
                    }
                grp = groups[key]
                grp["cost"] += r["cost"]
                if (r["ts_sec"], r["turn_idx"]) < grp["ord"]:
                    grp["ord"] = (r["ts_sec"], r["turn_idx"])
                    grp["vector"] = r["vector"]
            # top-K tools by summed cost (cost desc, tool asc)
            tool_cost: dict = {}
            for grp in groups.values():
                tool_cost[grp["tool"]] = tool_cost.get(grp["tool"], 0) + grp["cost"]
            top_tools = sorted(tool_cost.items(), key=lambda kv: (-kv[1], kv[0]))[
                :top_k
            ]
            vec = np.zeros(out_w)
            for slot_idx, (tool, _) in enumerate(top_tools):
                if tool in tools:
                    vec[tools[tool]] = 1.0
                mems = sorted(
                    (grp for grp in groups.values() if grp["tool"] == tool),
                    key=lambda grp: (-grp["cost"], grp["ord"]),
                )[:top_n]
                for mi, grp in enumerate(mems):
                    start = len(tools) + (slot_idx * top_n + mi) * turn_w
                    vec[start : start + turn_w] = grp["vector"]
            ts = mem["ts"].iloc[0] if len(mem) else None
            # anchor ts: the timestamp value whose epoch == ts_end
            ts = g.loc[g["ts_sec"] == ts_end, "ts"].iloc[0]
            out_rows.append(
                {"conv_id": conv_id, "ts": ts, "window_features": vec}
            )
    return pd.DataFrame(out_rows)


def sessionize(pdf: pd.DataFrame, gap_s: int = 1800) -> pd.DataFrame:
    """Monotonic session_id per conv: cumsum of (lag > gap) flags."""
    df = pdf.sort_values(["conv_id", "ts", "turn_idx"]).reset_index(drop=True)
    df["ts_sec"] = df["ts"].astype("datetime64[s]").astype("int64")
    lag = df.groupby("conv_id")["ts_sec"].diff()
    flag = ((lag > gap_s) & lag.notna()).astype("int64")
    df["session_id"] = flag.groupby(df["conv_id"]).cumsum()
    return df
