"""Corpus-curation operators vs brute-force Python oracles:
decontamination, duplicated-substring fraction, deterministic
domain-mix sampling, exact-ntile shard assignment, PII scrubbing,
intra-doc repetition."""

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from sqlfeatureextraction_spark.operators import curation


def _shingles(text, n):
    toks = [t for t in (text or "").lower().split(" ") if t]
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


DOCS = [
    # (doc_id, text, source)
    (0, "the quick brown fox jumps over the lazy dog", "src0"),
    (1, "a completely different sentence with no overlap at all", "src1"),
    (2, "the quick brown fox jumps over the sleeping cat", "src2"),
    (3, "short", "src0"),
    (4, "", "src1"),
    (5, "loop loop loop loop loop loop loop loop", "src9"),
    (6, "the quick brown fox jumps over the lazy dog again today", "src9"),
    (7, "tail words the quick brown fox jumps over it", "src4"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(i, t, s) for i, t, s in DOCS], "doc_id long, text string, source string"
    ).cache()


def test_decontaminate_vs_bruteforce(spark, docs_df):
    # eval set = doc 0; train = the rest
    n = 5
    ev = docs_df.where(F.col("doc_id") == 0)
    tr = docs_df.where(F.col("doc_id") != 0)
    got = {
        r["doc_id"]: (r["n_shared"], r["contaminated"])
        for r in curation.decontaminate(tr, ev, n=n).collect()
    }
    ev_sh = set(_shingles(DOCS[0][1], n))
    for i, text, _ in DOCS[1:]:
        shared = set(_shingles(text, n)) & ev_sh
        assert got[i] == (len(shared), len(shared) > 0), (i, shared)
    # doc 6 repeats the full eval prefix -> contaminated; doc 1 clean;
    # doc 3/4 too short for any 5-gram -> present with 0
    assert got[6][1] and not got[1][1]
    assert got[3] == (0, False) and got[4] == (0, False)


def test_dup_substring_fraction_vs_bruteforce(spark, docs_df):
    n = 4
    per_doc_sh = {i: set(_shingles(t, n)) for i, t, _ in DOCS}
    count = {}
    for i, shs in per_doc_sh.items():
        for sh in shs:
            count[sh] = count.get(sh, 0) + 1
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_dup"], r["dup_frac"])
        for r in curation.dup_substring_fraction(docs_df, n=n).collect()
    }
    for i, shs in per_doc_sh.items():
        ndup = sum(1 for sh in shs if count[sh] > 1)
        want_frac = round(ndup / max(len(shs), 1), 6)
        assert got[i][0] == len(shs) and got[i][1] == ndup
        assert math.isclose(got[i][2], want_frac, abs_tol=1e-9), i
    # hashed transport path: identical result
    got_h = {
        r["doc_id"]: (r["n_shingles"], r["n_dup"], r["dup_frac"])
        for r in curation.dup_substring_fraction(
            docs_df, n=n, hashed=True
        ).collect()
    }
    assert got_h == got


def _remove_dup_spans_oracle(docs, n):
    """Pure-python oracle: duplicated = shingle in >1 distinct doc;
    every occurrence of a duplicated shingle covers its n positions."""
    per_doc_toks = {
        i: [t for t in (txt or "").lower().split(" ") if t] for i, txt, _ in docs
    }
    doc_count = {}
    for i, tk in per_doc_toks.items():
        for sh in {
            " ".join(tk[j : j + n]) for j in range(len(tk) - n + 1)
        }:
            doc_count[sh] = doc_count.get(sh, 0) + 1
    out = {}
    for i, tk in per_doc_toks.items():
        covered = set()
        for j in range(len(tk) - n + 1):
            if doc_count.get(" ".join(tk[j : j + n]), 0) > 1:
                covered.update(range(j, j + n))
        kept = [t for j, t in enumerate(tk) if j not in covered]
        out[i] = (len(tk), len(kept), len(tk) - len(kept), " ".join(kept))
    return out


def test_remove_duplicate_spans_vs_bruteforce(spark, docs_df):
    n = 4
    want = _remove_dup_spans_oracle(DOCS, n)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_kept"], r["n_removed"], r["clean_text"])
        for r in curation.remove_duplicate_spans(docs_df, n=n).collect()
    }
    assert got == want
    # structural pins on the hand corpus: docs 0/2/6/7 share "the quick
    # brown fox" 4-grams -> spans removed; doc 5's within-doc repeats
    # alone do NOT count as duplicated (distinct-doc rule); doc 1 is
    # untouched; short/empty docs pass through whole.
    assert got[0][2] > 0 and got[2][2] > 0 and got[6][2] > 0 and got[7][2] > 0
    assert got[5] == (8, 8, 0, DOCS[5][1])
    assert got[1][2] == 0 and got[1][3] == DOCS[1][1].lower()
    assert got[3] == (1, 1, 0, "short") and got[4] == (0, 0, 0, "")
    # overlapping duplicated spans merge: doc 0 loses exactly the
    # tokens covered by some duplicated 4-gram, never more
    tk0 = DOCS[0][1].split(" ")
    assert got[0][1] + got[0][2] == len(tk0)
    # hashed shingle-key transport path: identical result
    got_h = {
        r["doc_id"]: (r["n_tokens"], r["n_kept"], r["n_removed"], r["clean_text"])
        for r in curation.remove_duplicate_spans(
            docs_df, n=n, hashed=True
        ).collect()
    }
    assert got_h == got
    # antijoin mode (constant work per row, for pathologically long
    # docs): identical result to the default compact mode
    got_a = {
        r["doc_id"]: (r["n_tokens"], r["n_kept"], r["n_removed"], r["clean_text"])
        for r in curation.remove_duplicate_spans(
            docs_df, n=n, mode="antijoin"
        ).collect()
    }
    assert got_a == got


def _mix_keep(doc_id, rate, salt="mix"):
    h = hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()[:8]
    return "0" + h < curation.mix_threshold_hex(rate)


def test_domain_mix_sample_deterministic(spark, docs_df):
    rates = {"src0": 1.0, "src1": 0.0, "src2": 0.5}
    got = {
        r["doc_id"]
        for r in curation.domain_mix_sample(
            docs_df, rates=rates, default_rate=0.3
        ).collect()
    }
    want = set()
    for i, _, s in DOCS:
        if _mix_keep(i, rates.get(s, 0.3)):
            want.add(i)
    assert got == want
    # boundary rates are EXACT: src0 all kept, src1 none kept
    assert {i for i, _, s in DOCS if s == "src0"} <= got
    assert not ({i for i, _, s in DOCS if s == "src1"} & got)
    # rerun -> identical (no RNG state)
    got2 = {
        r["doc_id"]
        for r in curation.domain_mix_sample(
            docs_df, rates=rates, default_rate=0.3
        ).collect()
    }
    assert got2 == got


def test_mix_threshold_validation():
    with pytest.raises(ValueError):
        curation.mix_threshold_hex(1.5)
    assert curation.mix_threshold_hex(1.0) == "100000000"
    assert curation.mix_threshold_hex(0.0) == "000000000"


def test_shard_assign_matches_sql_ntile(spark):
    n_docs, n_shards = 103, 7
    df = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    got = {
        r["doc_id"]: r["shard"]
        for r in curation.shard_assign(df, n_shards).collect()
    }
    # oracle: python ntile over the md5 order
    order = sorted(
        range(n_docs),
        key=lambda i: (hashlib.md5(f"shard:{i}".encode()).hexdigest(), i),
    )
    base, rem = divmod(n_docs, n_shards)
    want, pos = {}, 0
    for b in range(1, n_shards + 1):
        size = base + (1 if b <= rem else 0)
        for i in order[pos : pos + size]:
            want[i] = b
        pos += size
    assert got == want
    # shard sizes are equal +-1
    sizes = {}
    for b in got.values():
        sizes[b] = sizes.get(b, 0) + 1
    assert max(sizes.values()) - min(sizes.values()) <= 1
    assert set(sizes) == set(range(1, n_shards + 1))


def test_exact_ntile_fewer_rows_than_buckets(spark):
    df = spark.range(3).withColumnRenamed("id", "doc_id")
    got = {
        r["doc_id"]: r["bucket"]
        for r in curation.exact_ntile(df, ["doc_id"], 10).collect()
    }
    assert got == {0: 1, 1: 2, 2: 3}


def test_scrub_pii_pinned(spark):
    rows = [
        (0, "write to bob.smith+x@corp.example.org or ann@a.io now"),
        (1, "server 10.0.255.3 talked to 192.168.1.1"),
        (2, "call +1 555-010-1234 about 1.2.3.4"),
        (3, "nothing to see here"),
        (4, None),
        (5, "mail root@10.0.0.1.example.com from host 8.8.8.8"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_email"],
            r["n_ip"],
            r["n_phone"],
            r["text_redacted"],
        )
        for r in curation.scrub_pii(df).collect()
    }
    assert got[0] == (2, 0, 0, "write to <EMAIL> or <EMAIL> now")
    assert got[1] == (0, 2, 0, "server <IP> talked to <IP>")
    assert got[2] == (0, 1, 1, "call <PHONE> about <IP>")
    assert got[3] == (0, 0, 0, "nothing to see here")
    assert got[4] == (0, 0, 0, "")
    # rule ORDER: the email rule consumes the embedded dotted-quad
    # before the IP rule can see it
    assert got[5] == (1, 1, 0, "mail <EMAIL> from host <IP>")
    # python re agrees on every redaction (same rules, same order)
    for i, text in rows:
        cur = text or ""
        for name, pat, repl in curation.PII_RULES:
            cur = re.sub(pat, repl, cur)
        assert got[i][3] == cur, i


def test_pack_sequences_vs_bruteforce(spark):
    n_docs, n_shards, L = 57, 4, 10
    rows = [(i, " ".join(["w"] * (i % 13))) for i in range(n_docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["shard"],
            r["n_tok"],
            r["tok_offset"],
            r["first_seq"],
            r["last_seq"],
        )
        for r in curation.pack_sequences(df, L, n_shards).collect()
    }
    # oracle: ntile over md5 order, then per-shard cumsum
    order = sorted(
        range(n_docs),
        key=lambda i: (hashlib.md5(f"shard:{i}".encode()).hexdigest(), i),
    )
    base, rem = divmod(n_docs, n_shards)
    pos, want = 0, {}
    for b in range(1, n_shards + 1):
        size = base + (1 if b <= rem else 0)
        off = 0
        for i in order[pos : pos + size]:
            n_tok = i % 13
            first = off // L
            last = (off + max(n_tok, 1) - 1) // L
            want[i] = (b, n_tok, off, first, last)
            off += n_tok
        pos += size
    assert got == want
    # offsets are contiguous within a shard: sum of n_tok = max offset+n_tok
    for b in range(1, n_shards + 1):
        tot = sum(v[1] for v in got.values() if v[0] == b)
        assert max(v[2] + v[1] for v in got.values() if v[0] == b) == tot
    # empty docs span exactly their boundary sequence
    empty = [v for v in got.values() if v[1] == 0]
    assert empty and all(v[3] == v[4] for v in empty)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_curation_random_corpus_differential(spark, seed):
    """Differential sweep on a seeded random corpus: every curation
    operator vs its brute-force Python oracle in one pass — breadth
    beyond the hand-written corpora above (random duplication
    structure, empty docs, token counts straddling the shingle sizes)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(80):
        k = int(rng.randint(0, 12))
        words = [vocab[j] for j in rng.randint(0, len(vocab), size=k)]
        if i > 0 and rng.rand() < 0.25:  # duplicate an earlier doc
            words = rows[int(rng.randint(0, i))][1].split(" ")
            words = [w for w in words if w]
        rows.append((i, " ".join(words), f"src{int(rng.randint(0, 4))}"))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).cache()

    n_dec, n_dup, n_rep = 5, 4, 3
    per_sh = {i: _shingles(t, n_dup) for i, t, _ in rows}
    # decontaminate (eval = doc_id % 9 == 0)
    ev_sh = set().union(
        *[set(_shingles(t, n_dec)) for i, t, _ in rows if i % 9 == 0]
    )
    ev = df.where(F.col("doc_id") % 9 == 0)
    tr = df.where(F.col("doc_id") % 9 != 0)
    got = {
        r["doc_id"]: r["n_shared"]
        for r in curation.decontaminate(tr, ev, n=n_dec).collect()
    }
    assert got == {
        i: len(set(_shingles(t, n_dec)) & ev_sh)
        for i, t, _ in rows
        if i % 9 != 0
    }
    # dup_substring_fraction
    cnt = {}
    for i, shs in per_sh.items():
        for sh in set(shs):
            cnt[sh] = cnt.get(sh, 0) + 1
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_dup"])
        for r in curation.dup_substring_fraction(df, n=n_dup).collect()
    }
    assert got == {
        i: (
            len(set(shs)),
            sum(1 for sh in set(shs) if cnt[sh] > 1),
        )
        for i, shs in per_sh.items()
    }
    # remove_duplicate_spans (same shingle width as dup fraction),
    # both modes
    want_rm = _remove_dup_spans_oracle(rows, n_dup)
    for mode in ("compact", "antijoin"):
        got = {
            r["doc_id"]: (
                r["n_tokens"], r["n_kept"], r["n_removed"], r["clean_text"]
            )
            for r in curation.remove_duplicate_spans(
                df, n=n_dup, mode=mode
            ).collect()
        }
        assert got == want_rm, mode
    # repetition stats
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_distinct"])
        for r in curation.with_repetition_stats(df, n=n_rep).collect()
    }
    assert got == {
        i: (len(_shingles(t, n_rep)), len(set(_shingles(t, n_rep))))
        for i, t, _ in rows
    }
    # mix -> shard -> pack composition
    kept = curation.domain_mix_sample(df, rates={"src0": 0.8}, default_rate=0.4)
    kept_ids = sorted(
        i for i, _, s in rows if _mix_keep(i, 0.8 if s == "src0" else 0.4)
    )
    packed = {
        r["doc_id"]: (r["shard"], r["n_tok"], r["tok_offset"])
        for r in curation.pack_sequences(kept, 16, 3).collect()
    }
    assert sorted(packed) == kept_ids
    order = sorted(
        kept_ids,
        key=lambda i: (hashlib.md5(f"shard:{i}".encode()).hexdigest(), i),
    )
    base, rem = divmod(len(kept_ids), 3)
    pos = 0
    for b in range(1, 4):
        size = base + (1 if b <= rem else 0)
        off = 0
        for i in order[pos : pos + size]:
            n_tok = len([w for w in rows[i][1].split(" ") if w])
            assert packed[i] == (b, n_tok, off), i
            off += n_tok
        pos += size
    df.unpersist()


def test_repetition_stats_vs_bruteforce(spark, docs_df):
    n = 3
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_distinct"], r["rep_ratio"])
        for r in curation.with_repetition_stats(docs_df, n=n).collect()
    }
    for i, text, _ in DOCS:
        shs = _shingles(text, n)
        want = round(
            (len(shs) - len(set(shs))) / max(len(shs), 1), 6
        )
        assert got[i][0] == len(shs) and got[i][1] == len(set(shs))
        assert math.isclose(got[i][2], want, abs_tol=1e-9), i
    # the looped doc is flagged hard, normal prose is not
    assert got[5][2] > 0.8 and got[0][2] == 0.0


def test_chunk_documents_reconstruction_and_resync(spark):
    """(1) Concatenating a doc's chunks in chunk order reproduces its
    token stream exactly; chunk ids are dense from 0.  (2) Edit
    resilience: inserting one token near the front of a doc changes
    chunk ids, but the multiset of chunk TEXTS from the first
    boundary after the edit onward is unchanged — the CDC property
    that makes sub-document dedup robust to edits."""
    import hashlib

    from sqlfeatureextraction_spark.operators.curation import (
        chunk_documents,
    )

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lam mu nu xi omicron pi rho sigma tau upsilon phi chi psi "
        "omega one two three four five six seven eight nine ten"
    )
    edited = "INSERTED " + base
    df = spark.createDataFrame(
        [(0, base), (1, edited), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    rows = chunk_documents(df).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 2 not in by_doc and 3 not in by_doc  # empty docs: no rows

    for d, txt in ((0, base), (1, edited.lower())):
        chunks = sorted(by_doc[d], key=lambda r: r["chunk_id"])
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
        rebuilt = " ".join(c["chunk_text"] for c in chunks)
        assert rebuilt == txt.lower()
        assert all(
            c["n_tok"] == len(c["chunk_text"].split(" ")) for c in chunks
        )

    # resync: drop each version's first chunk (the only one the edit
    # can touch, since 'inserted' prepends before the first boundary);
    # the remaining chunk-text multisets must be identical
    tail0 = sorted(
        c["chunk_text"]
        for c in by_doc[0]
        if c["chunk_id"] > 0
    )
    tail1 = sorted(
        c["chunk_text"]
        for c in by_doc[1]
        if c["chunk_id"] > 0
    )
    assert tail0 == tail1 and len(tail0) > 1
    # sanity: the helper boundary rate assumption holds for this text
    assert any(
        hashlib.md5(t.encode()).hexdigest().startswith("0")
        for t in base.split(" ")
    )


def test_chunk_dup_fraction_hand_case(spark):
    """Two identical docs: every chunk duplicated (frac 1.0); a
    unique doc: 0.0; a doc sharing one passage with the twins: its
    shared chunks (aligned by CDC boundaries despite a changed
    prefix) count as duplicated."""
    from sqlfeatureextraction_spark.operators.curation import (
        chunk_documents,
        chunk_dup_fraction,
    )

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lam mu nu xi omicron pi rho sigma tau upsilon phi chi psi "
        "omega one two three four five six seven eight nine ten"
    )
    df = spark.createDataFrame(
        [
            (0, base),
            (1, base),                     # exact twin
            (2, "totally different words unique here"),
            (3, "CHANGED PREFIX " + base),  # shares the tail passage
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_dup_chunks"], r["dup_frac"])
        for r in chunk_dup_fraction(df).collect()
    }
    assert got[0][2] == 1.0 and got[1][2] == 1.0
    assert got[2] == (1, 0, 0.0) or got[2][1] == 0
    # doc 3 re-synchronizes after its first boundary: all later
    # chunks match the twins' chunks
    n3, d3, f3 = got[3]
    assert d3 == n3 - 1 and n3 > 2
    # cross-check n_chunks against chunk_documents directly
    per_doc = (
        chunk_documents(df).groupBy("doc_id").count().collect()
    )
    assert {r["doc_id"]: r["count"] for r in per_doc} == {
        d: v[0] for d, v in got.items()
    }


def test_chunk_dup_fraction_hashed_equals_text(spark):
    from sqlfeatureextraction_spark.operators.curation import (
        chunk_dup_fraction,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    a = sorted(map(tuple, chunk_dup_fraction(docs).collect()))
    b = sorted(
        map(tuple, chunk_dup_fraction(docs, hashed=True).collect())
    )
    assert a == b
