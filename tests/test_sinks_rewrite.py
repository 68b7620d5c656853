"""S8 (JDBC/HTTP eval sinks), F7 (longest common substrings), and
F11 (ClickHouse -> Druid rewrite) — the final three SURVEY §2 rows.

F11 pins trace the reference's ordered rule chain
(tools/SQLConverter.java:14-216 + tools/SqlGroupByReplacer.java:11-98)
on rows of the reference's own input/testQuerys.tsv corpus; F7 pins
mirror enc/MINCFragmentIntent.java:667-690; S8 exercises the real
Derby-embedded JDBC round-trip and the partitioned/batched HTTP sink
with a file-capture transport.
"""

import glob
import json
import os
import uuid

import pytest

from sqlfeatureextraction_spark.functions.sqlclean import (
    longest_common_substrings,
)
from sqlfeatureextraction_spark.functions.sqlrewrite import (
    convert_clickhouse_to_druid,
    extract_select_aliases,
    replace_group_by_with_position,
)

# ------------------------------------------------------------------ F11


def test_druid_rewrite_corpus_row0():
    """testQuerys.tsv row 0 end-to-end: _cluster strip, ts->__time,
    millis emitted as text (999 and 0 — parseInt drops leading zeros),
    INTERVAL-with-tz TIME_FLOOR, count()->sum("count"), GROUP BY alias
    replaced by its 1-based select position."""
    sql = (
        "SELECT count() AS total_RESP, toStartOfInterval(ts, INTERVAL 1"
        " day, 'Asia/Shanghai') AS ts_RESP FROM dwm_request_cluster WHERE"
        " (appid = 'app-member-activity-xc') AND (ts <="
        " toDateTime64(1684479899.999, 3)) AND (ts >="
        " toDateTime64(1683529440.000, 3)) GROUP BY ts_RESP ORDER BY"
        " ts_RESP ASC"
    )
    out = convert_clickhouse_to_druid(sql)
    assert out == (
        'SELECT sum("count") AS total_RESP, TIME_FLOOR(__time, \'P1D\')'
        " AS ts_RESP FROM dwm_request WHERE (appid ="
        " 'app-member-activity-xc') AND (__time <="
        " MILLIS_TO_TIMESTAMP(1684479899 * 1000 + 999)) AND (__time >="
        " MILLIS_TO_TIMESTAMP(1683529440 * 1000 + 0)) GROUP BY 2 ORDER BY"
        " ts_RESP ASC"
    )


def test_druid_rewrite_corpus_row2_avg_chain():
    """Rule ORDER is load-bearing: avg(dur) -> sum(dur)/sum("count")
    BEFORE the measure-suffix rule, so the net is sum(dur_sum)/
    sum("count"); lowercase `group` is quoted while uppercase GROUP BY
    survives (case-sensitive patterns); a trailing-dot toDateTime64
    literal takes the no-millis branch; LIMIT 0, 8 -> LIMIT 8; the
    quoted "group" field never matches a select alias so GROUP BY keeps
    it verbatim."""
    sql = (
        "SELECT avg(dur) AS avg_dur_RESP, group FROM"
        " pmone_0d5de51f17.dwm_request WHERE (appid ="
        " 'app-member-activity-xc') AND (ts <="
        " toDateTime64(1684425599.999, 3)) AND (ts >="
        " toDateTime64(1684339200., 3)) GROUP BY group ORDER BY"
        " avg_dur_RESP DESC LIMIT 0, 8"
    )
    out = convert_clickhouse_to_druid(sql)
    assert out == (
        'SELECT sum(dur_sum)/sum("count") AS avg_dur_RESP, "group" FROM'
        " dwm_request WHERE (appid = 'app-member-activity-xc') AND"
        " (__time <= MILLIS_TO_TIMESTAMP(1684425599 * 1000 + 999)) AND"
        ' (__time >= MILLIS_TO_TIMESTAMP(1684339200 * 1000)) GROUP BY'
        ' "group" ORDER BY avg_dur_RESP DESC LIMIT 8'
    )


def test_druid_rewrite_scalar_rules():
    assert convert_clickhouse_to_druid("select maxOrNull from t") == (
        'select "max" from t'
    )
    assert convert_clickhouse_to_druid(
        "select method from t where is_model = true"
    ) == 'select "method" from t where is_model = \'1\''
    assert convert_clickhouse_to_druid("x where is_model = false") == (
        "x where is_model = '0'"
    )
    # sum-suffix applies to min/max too
    assert convert_clickhouse_to_druid("select min(dur), max(dur) from t") == (
        "select min(dur_min), max(dur_max) from t"
    )
    # leading-zero millis: parseInt("045") == 45
    assert convert_clickhouse_to_druid(
        "ts <= toDateTime64(1684.0451, 3)"
    ) == "__time <= MILLIS_TO_TIMESTAMP(1684 * 1000 + 45)"
    # a 1-2 digit fraction throws in the Java (substring(0,3)) — mirror
    with pytest.raises(ValueError):
        convert_clickhouse_to_druid("toDateTime64(1684.99, 3)")
    # toIntervalDay / toIntervalHour function forms
    assert convert_clickhouse_to_druid(
        "toStartOfInterval(ts, toIntervalDay(1), 'Asia/Shanghai')"
    ) == "TIME_FLOOR(__time, 'P1D')"
    assert convert_clickhouse_to_druid(
        "toStartOfInterval(ts, toIntervalHour(6))"
    ) == "TIME_FLOOR(__time, 'PT6H')"
    assert convert_clickhouse_to_druid(
        "toStartOfInterval(ts, INTERVAL 30 minute)"
    ) == "TIME_FLOOR(__time, 'PT30M')"


def test_group_by_position_pass():
    """SqlGroupByReplacer semantics in isolation: only AS-aliased
    select items number positions (the bare-column else branch is
    commented out in the reference, :68-71); non-alias fields are kept;
    the lookahead stops at ORDER BY/LIMIT/HAVING."""
    sql = (
        "SELECT a AS x, b, c AS y FROM t GROUP BY x, b, y ORDER BY x"
    )
    assert extract_select_aliases(sql) == ["x", "y"]
    assert replace_group_by_with_position(sql) == (
        "SELECT a AS x, b, c AS y FROM t GROUP BY 1, b, 2 ORDER BY x"
    )
    # no aliases -> unchanged
    assert replace_group_by_with_position(
        "SELECT a FROM t GROUP BY a"
    ) == "SELECT a FROM t GROUP BY a"


# ------------------------------------------------------------------ F7


def test_lcs_reference_semantics():
    """enc/MINCFragmentIntent.java:667-690: ALL tie substrings are
    returned; result resets when a longer one appears."""
    assert longest_common_substrings("abcdef", "zabcq") == {"abc"}
    # tie: two distinct length-2 substrings
    assert longest_common_substrings("abxcd", "abycd") == {"ab", "cd"}
    # repeated occurrences collapse in the set
    assert longest_common_substrings("aaa", "aa") == {"aa"}
    assert longest_common_substrings("", "x") == set()
    assert longest_common_substrings("", "") == set()
    # "select " and " from t" are both length-7 maximals — a tie
    assert longest_common_substrings(
        "select a from t", "select b from t"
    ) == {"select ", " from t"}


# ------------------------------------------------------------------ S8


def test_jdbc_sink_derby_roundtrip(spark, tmp_path):
    """Real JDBC write + read-back through the Derby embedded driver
    shipped in Spark's jars (reference: Avatica JDBC eval sink,
    snd/DruidQueryJDBCExecutor.java:291-324)."""
    from sqlfeatureextraction_spark.sources.sinks import (
        jdbc_eval_sink,
        jdbc_eval_source,
    )

    db = str(tmp_path / f"evaldb_{uuid.uuid4().hex[:8]}")
    url = f"jdbc:derby:{db};create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    df = spark.createDataFrame(
        [(i, f"tpl_{i}", float(i) * 1.5) for i in range(20)],
        ["id", "template", "cost"],
    )
    jdbc_eval_sink(df, url, "eval_metrics", mode="overwrite",
                   properties=props, num_writers=2)
    back = jdbc_eval_source(spark.read, url, "eval_metrics",
                            properties=props)
    got = sorted((r["id"], r["template"], r["cost"])
                 for r in back.collect())
    assert got == [(i, f"tpl_{i}", i * 1.5) for i in range(20)]


def test_http_post_sink_batches(spark, tmp_path):
    """The partition/batch/payload plumbing with a file-capture
    transport: every row delivered exactly once, every payload at most
    batch_size rows, payloads are valid JSON bodies."""
    from sqlfeatureextraction_spark.sources.sinks import http_post_sink

    cap_dir = str(tmp_path / "captured")
    os.makedirs(cap_dir, exist_ok=True)

    def capture(url, payload, headers):
        assert url == "http://eval.local/sql"
        assert headers == {"x-test": "1"}
        name = os.path.join(cap_dir, f"{uuid.uuid4().hex}.json")
        with open(name, "w") as f:
            f.write(payload)
        return 200

    df = spark.createDataFrame(
        [(i, f"q{i}") for i in range(57)], ["id", "q"]
    ).repartition(4)
    http_post_sink(df, "http://eval.local/sql", batch_size=10,
                   transport=capture, headers={"x-test": "1"})
    seen = []
    for path in glob.glob(os.path.join(cap_dir, "*.json")):
        body = json.loads(open(path).read())
        assert 1 <= len(body["rows"]) <= 10
        seen.extend(r["id"] for r in body["rows"])
    assert sorted(seen) == list(range(57))


def test_predict_body_shape():
    """PredictionClient request parity at batch_size=1
    (snd/PredictionClient.java:51-54)."""
    from sqlfeatureextraction_spark.sources.sinks import predict_body

    class R(dict):
        get = dict.get

    assert predict_body([R(window_vector_str="0101")]) == {"input": "0101"}
    assert predict_body(
        [R(window_vector_str="01"), R(window_vector_str="10")]
    ) == {"inputs": ["01", "10"]}


def test_rewrite_and_lcs_udfs(spark):
    """Arrow-batched UDF surfaces of F7/F11 over a DataFrame."""
    from pyspark.sql import functions as F

    from sqlfeatureextraction_spark.functions.sqlclean import lcs_pairs_udf
    from sqlfeatureextraction_spark.functions.sqlrewrite import (
        druid_rewrite_udf,
    )

    # NB: the _cluster rule is case-sensitive on FROM, like the Java
    df = spark.createDataFrame(
        [("select count() FROM dwm_request_cluster", "abxcd", "abycd")],
        ["q", "a", "b"],
    )
    row = df.select(
        druid_rewrite_udf()(F.col("q")).alias("druid"),
        lcs_pairs_udf()(F.col("a"), F.col("b")).alias("lcs"),
    ).collect()[0]
    assert row["druid"] == 'select sum("count") FROM dwm_request'
    assert row["lcs"] == ["ab", "cd"]
