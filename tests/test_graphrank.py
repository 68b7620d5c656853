"""PageRank power iteration + TextRank keywords (graphrank.py)."""

import duckdb


def _python_pagerank(edges, n_iter=10, d=0.85):
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    n = len(nodes)
    deg = {}
    for u, _, w in edges:
        deg[u] = deg.get(u, 0.0) + w
    r = dict.fromkeys(nodes, 1.0 / n)
    for _ in range(n_iter):
        nxt = dict.fromkeys(nodes, (1.0 - d) / n)
        for u, v, w in edges:
            nxt[v] += d * r[u] * w / deg[u]
        r = nxt
    return r


def test_pagerank_matches_python_power_iteration(spark):
    from sqlfeatureextraction_spark.operators.graphrank import pagerank

    edges = [
        ("a", "b", 2.0), ("b", "a", 2.0),
        ("b", "c", 1.0), ("c", "b", 1.0),
        ("a", "c", 1.0), ("c", "a", 1.0),
        ("d", "a", 1.0),  # d has out-edges only; a gains, d keeps teleport
    ]
    df = spark.createDataFrame(edges, "u string, v string, w double")
    got = {r.node: r.rank for r in pagerank(df, n_iter=10).collect()}
    exp = _python_pagerank(edges)
    assert set(got) == set(exp)
    for k in exp:
        assert abs(got[k] - exp[k]) < 1e-9, (k, got[k], exp[k])
    # hub 'a' outranks the feeder-only 'd'
    assert got["a"] > got["d"]


def test_textrank_matches_sql_oracle(spark):
    from sqlfeatureextraction_spark.operators.graphrank import (
        textrank_keywords,
        textrank_sql_oracle,
    )

    docs = [
        ("the quick fox jumps over the lazy dog",),
        ("the quick brown fox likes the quick dog",),
        ("a lazy dog and a quick fox",),
        ("solo",),  # single-token doc: no edges, never ranked
    ]
    df = spark.createDataFrame(docs, "text string")
    got = [
        (r.token, r.rank)
        for r in textrank_keywords(df, top_k=8, n_iter=10).collect()
    ]

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?)", [(t,) for (t,) in docs]
    )
    tok = (
        "list_filter(string_split(lower(coalesce(text, '')), ' '),"
        " x -> x <> '')"
    )
    exp = con.execute(
        textrank_sql_oracle(tok, top_k=8, n_iter=10)
    ).fetchall()
    assert got == exp
    toks = {t for t, _ in got}
    assert "the" in toks and "quick" in toks  # high-connectivity hubs
    assert "solo" not in toks
