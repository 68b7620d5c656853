"""Vector → template decode round-trip (layout-registry
self-validation).

``decode_apm_vector`` inverts ``apm_query_vector`` over the
valid-encoding subspace — the analog of the reference's
vector→Druid-template converter (tools/QueryTemplateConverter.java:
421-452), whose Query input is exactly the decoded fragment-set form.
The fixpoint property (decode → re-encode → identical bits) checks
every segment's offsets, the column bit order, the time/bucket
encodings and the granularity ladder in one assertion, including on
the reference's OWN golden corpus vectors.
"""

import os

import numpy as np
import pytest

from sqlfeatureextraction_spark.functions.apmencode import (
    ApmVocab,
    apm_query_vector,
    decode_apm_vector,
    golden_vocab,
    parse_ch_query,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "golden", "apm_golden.json")


def _roundtrip(vec, vocab, ignore_tables=True):
    sql, ts = decode_apm_vector(vec, vocab, ignore_tables)
    re_vec = apm_query_vector(
        parse_ch_query(sql), ts, vocab, ignore_tables
    )
    assert re_vec is not None, sql
    assert np.array_equal(
        np.asarray(vec, dtype=np.float32), re_vec
    ), sql
    return sql


TEMPLATES = [
    # the sql_apm_encode driver templates with fixed params
    "SELECT count() AS total_RESP, toStartOfInterval(ts, INTERVAL 1 day,"
    " 'Asia/Shanghai') AS ts_RESP FROM dwm_request_cluster WHERE (appid ="
    " 'app-41') AND (ts <= toDateTime64(1684479899.999, 3)) AND (ts >="
    " toDateTime64(1683529440.000, 3)) GROUP BY ts_RESP ORDER BY ts_RESP"
    " ASC",
    "SELECT avg(dur) AS m_RESP, group FROM pmone_0d5de51f17.dwm_request"
    " WHERE (appid = 'x-82') AND (err > 0) AND (ts <="
    " toDateTime64(1684649258.999, 3)) GROUP BY group ORDER BY m_RESP"
    " DESC LIMIT 0, 8",
    "SELECT sum(fail) AS s, max(dur) AS mx, toStartOfInterval(ts,"
    " toIntervalHour(1)) AS b FROM dwm_request WHERE (province = 'p123')"
    " OR (city <> 'c') GROUP BY b",
    "SELECT min(err_4xx), user_id FROM dwm_request WHERE status > 55"
    " ORDER BY user_id",
    "SELECT dur9 FROM dwm_request_view WHERE httperr >= 3",
]


@pytest.fixture(scope="module")
def fx():
    return golden_vocab(FIXTURE)


def test_roundtrip_offset_over_one_year(fx):
    """A ts<= bound >= 1 year before event time sets ALL NINE
    timeoffset bits — the same pattern as a null offset — while a
    finite ts range still sets range bits.  That vector is in the
    valid-encoding subspace and must round-trip, not be rejected as
    'timerange bits without a ts<= bound' (decode picks the minimal
    >= 1-year offset as the canonical pre-image)."""
    vocab, _ = fx
    ts_end = 1600000000
    ts_sec = ts_end + 31536000  # exactly one year after the bound
    sql = (
        "SELECT dur FROM dwm_request WHERE (ts <= toDateTime64("
        f"{ts_end}.999, 3)) AND (ts >= toDateTime64({ts_end - 600}.000,"
        " 3))"
    )
    vec = apm_query_vector(parse_ch_query(sql), ts_sec, vocab)
    assert vec is not None
    seg = vocab.query_layout(True).seg("timeoffset")
    assert vec[seg.offset : seg.offset + 9].sum() == 9  # all-ones
    _roundtrip(vec, vocab)


@pytest.mark.parametrize("idx", range(len(TEMPLATES)))
def test_roundtrip_synthesized_templates(fx, idx):
    vocab, _ = fx
    ts = 1684508420 + idx * 3600
    vec = apm_query_vector(parse_ch_query(TEMPLATES[idx]), ts, vocab)
    assert vec is not None
    _roundtrip(vec, vocab)


def test_roundtrip_golden_corpus_slots(fx):
    """Decode the reference's OWN encoded query intents (every
    non-zero 818-bit slot of every well-formed golden window line) and
    re-encode to identical bits."""
    vocab, lines = fx
    qlen = vocab.query_layout().width
    n_checked = 0
    for line in lines:
        bits = line["bits"] if isinstance(line, dict) else line
        arr = np.array([float(b) for b in bits], dtype=np.float32)
        if len(arr) != vocab.window_width():
            continue  # the corpus's truncated line
        n_t = len(vocab.candidate_tables)
        for s in range(n_t * vocab.top_query_n):
            q = arr[n_t + s * qlen : n_t + (s + 1) * qlen]
            if q.sum() == 0:
                continue
            if q[:31].sum() != 2:
                continue  # defective artifact line (no/partial time)
            _roundtrip(q, vocab)
            n_checked += 1
    assert n_checked >= 3  # lines 2/3/4 each carry a populated slot


def test_roundtrip_with_tables_segment():
    vocab = ApmVocab(
        candidate_tables=("t1", "t2"),
        schema_columns={"t1": ("a", "b", "ts"), "t2": ("c",)},
        top_query_n=2,
    )
    sql = "SELECT a, max(b) FROM t1 WHERE b > 5 GROUP BY a ORDER BY a"
    vec = apm_query_vector(
        parse_ch_query(sql), 1684508420, vocab, ignore_tables=False
    )
    _roundtrip(vec, vocab, ignore_tables=False)


def test_decode_rejects_unreachable_patterns(fx):
    vocab, _ = fx
    lay = vocab.query_layout()
    vec = np.zeros(lay.width, dtype=np.float32)
    with pytest.raises(ValueError):
        decode_apm_vector(vec, vocab)  # no dow/hour bit
    vec[0] = vec[7] = 1.0
    g = lay.seg("granularity").offset
    vec2 = vec.copy()
    vec2[g + 1] = 1.0  # 300 s bucket: no CH ladder branch reaches it
    with pytest.raises(ValueError):
        decode_apm_vector(vec2, vocab)
    vec3 = vec.copy()
    to = lay.seg("timeoffset").offset
    vec3[to + 2] = 1.0  # non-prefix bucket pattern
    with pytest.raises(ValueError):
        decode_apm_vector(vec3, vocab)
