"""Graph centrality as iterative joins: weighted PageRank power
iteration and TextRank keyword extraction (Mihalcea & Tarau, EMNLP
2004) over the token co-occurrence graph.

The same design rule as fit.logreg_irls: a fixed number of iterations,
each expressed as ONE join + groupBy over VOCABULARY-sized tables (the
rank vector and the edge list — type counts, never corpus rows), so
the DuckDB oracle can replay every iteration as a CTE chain and the
final ranks hash-match.  The corpus-sized work happens once, up
front, in the map-side-combinable edge-count aggregate.

PageRank semantics (weighted, per the TextRank paper's eq. 2):

    r(v) = (1 - d)/N + d * sum_{u -> v} r(u) * w(u,v) / outdeg(u)

with NO dangling-mass redistribution (the paper's formulation;
isolated tokens settle at (1-d)/N).  Co-occurrence edges are
adjacent-token pairs, symmetrized, self-loops dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "textrank_keywords", "textrank_sql_oracle"]


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank over an edge DataFrame (u, v, w) — ``n_iter``
    power-iteration steps from the uniform vector.  Node set = every
    endpoint; each step is one (edges x ranks) equi-join on u + one
    groupBy on v + a left join back onto the node table (nodes with no
    in-edges keep the teleport mass).  All frames are node/edge-sized.

    Returns (node, rank) UNROUNDED; callers round for presentation.
    """
    d = float(damping)
    nodes = (
        edges.select(F.col("u").alias("node"))
        .union(edges.select(F.col("v").alias("node")))
        .distinct()
    )
    deg = edges.groupBy("u").agg(F.sum("w").alias("_deg"))
    # normalized edge weight w(u,v)/outdeg(u), fixed across iterations
    norm = edges.join(deg, "u").select(
        "u", "v", (F.col("w") / F.col("_deg")).alias("_nw")
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(int(n_iter)):
        contrib = (
            norm.join(ranks.withColumnRenamed("node", "u"), "u")
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("_nw")).alias("_in"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - d) / n)
                    + F.lit(d) * F.coalesce("_in", F.lit(0.0))
                ).alias("rank"),
            )
        )
        # truncate the growing iterative plan (same pattern as
        # reorganize's hop joins); vocab-sized frame
        ranks = ranks.localCheckpoint(eager=False)
    return ranks


def _cooc_edges(df: DataFrame, text_col: str):
    """Symmetrized adjacent-token co-occurrence edge counts (u, v, w),
    self-loops dropped — per-row zip, map-side-combinable count."""
    from .curation import adjacent_pairs_col, tokens_col

    toks = df.select(tokens_col(F.col(text_col)).alias("_l"))
    pairs = (
        toks.select(
            F.explode(adjacent_pairs_col(F.col("_l"))).alias("_pr")
        )
        .select(F.col("_pr.a").alias("a"), F.col("_pr.b").alias("b"))
        .where(F.col("a") != F.col("b"))
    )
    sym = pairs.select(
        F.col("a").alias("u"), F.col("b").alias("v")
    ).union(pairs.select(F.col("b").alias("u"), F.col("a").alias("v")))
    return sym.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("double").alias("w")
    )


def textrank_keywords(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 20,
    n_iter: int = 10,
    damping: float = 0.85,
    round_dp: int = 6,
) -> DataFrame:
    """TextRank keywords: PageRank over the symmetrized adjacent-token
    co-occurrence graph, top-``top_k`` tokens by rank — the
    graph-centrality member of the keyword family (tfidf_topk scores
    per-document salience, llr_keywords scores slice association;
    TextRank scores global connectivity, surfacing hub terms that
    bridge many contexts).  Deterministic: fixed iteration count,
    uniform init, 6dp-ROUNDED rank + token tie-break as the order key
    (cross-engine ulp drift over 10 iterations is ~1e-12 relative,
    far under the rounding).

    Output: (token, rank) — top_k rows, rank-desc.
    """
    ranks = pagerank(
        _cooc_edges(df, text_col), n_iter=n_iter, damping=damping
    )
    return (
        ranks.select(
            F.col("node").alias("token"),
            F.round("rank", round_dp).alias("rank"),
        )
        .orderBy(F.desc("rank"), F.asc("token"))
        .limit(int(top_k))
    )


def textrank_sql_oracle(
    tok_expr: str,
    table: str = "documents",
    top_k: int = 20,
    n_iter: int = 10,
    damping: float = 0.85,
    round_dp: int = 6,
) -> str:
    """DuckDB replay of textrank_keywords: the same edge construction
    (list_zip shift, self-loops dropped, symmetrized) and the same
    ``n_iter`` power-iteration CTEs."""
    d = float(damping)
    parts = [
        f"""t AS (SELECT {tok_expr} AS l FROM {table})""",
        """pr AS (
          SELECT pr[1] AS a, pr[2] AS b
          FROM (SELECT unnest(list_zip(l, l[2:])) AS pr
                FROM t WHERE len(l) >= 2)
          WHERE pr[2] IS NOT NULL AND pr[1] <> pr[2]
        )""",
        """edges AS (
          SELECT u, v, CAST(COUNT(*) AS DOUBLE) AS w
          FROM (SELECT a AS u, b AS v FROM pr
                UNION ALL SELECT b, a FROM pr)
          GROUP BY u, v
        )""",
        """nodes AS (
          SELECT DISTINCT node
          FROM (SELECT u AS node FROM edges
                UNION SELECT v FROM edges)
        )""",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
        """deg AS (SELECT u, SUM(w) AS dg FROM edges GROUP BY u)""",
        """norm AS (
          SELECT e.u, e.v, e.w / deg.dg AS nw
          FROM edges e JOIN deg ON deg.u = e.u
        )""",
        "r0 AS (SELECT node, 1.0 / n AS rank FROM nodes CROSS JOIN nn)",
    ]
    for k in range(1, int(n_iter) + 1):
        parts.append(
            f"""r{k} AS (
              SELECT nodes.node,
                     (1.0 - {d}) / nn.n + {d} * COALESCE(c.s, 0.0)
                       AS rank
              FROM nodes CROSS JOIN nn
              LEFT JOIN (
                SELECT norm.v AS node, SUM(r.rank * norm.nw) AS s
                FROM norm JOIN r{k - 1} r ON r.node = norm.u
                GROUP BY norm.v
              ) c ON c.node = nodes.node
            )"""
        )
    chain = ",\n".join(parts)
    return f"""
        WITH {chain}
        SELECT node AS token, ROUND(rank, {round_dp}) AS rank
        FROM r{int(n_iter)}
        ORDER BY rank DESC, token ASC
        LIMIT {int(top_k)}
    """
