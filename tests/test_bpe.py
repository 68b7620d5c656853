"""BPE merge learning (bpe.py): reference-algorithm replay + exact
DuckDB oracle equality."""

from collections import Counter

import duckdb


def _python_bpe(words, n_merges):
    """Sennrich reference: word-type dict, overlapping pair counts,
    (count desc, pair asc) argmax, left-to-right non-overlap merge."""
    vocab = {
        tuple(list(w) + ["</w>"]): c for w, c in Counter(words).items()
    }
    merges = []
    for k in range(n_merges):
        pairs = Counter()
        for sym, c in vocab.items():
            for pr in zip(sym, sym[1:]):
                pairs[pr] += c
        if not pairs:
            break
        # deterministic tie-break: count desc, then (a, b) ASC
        bc = max(pairs.values())
        cands = sorted(p for p, c in pairs.items() if c == bc)
        a, b = cands[0]
        merges.append((k + 1, a, b, a + b, bc))
        new_vocab = {}
        for sym, c in vocab.items():
            out = []
            for s in sym:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_bpe_matches_reference_algorithm(spark):
    from sqlfeatureextraction_spark.operators.bpe import bpe_learn

    docs = [
        ("low low low lower lowest",),
        ("new newer newest low",),
        ("wide wider widest newer",),
    ]
    words = " ".join(t for (t,) in docs).split()
    df = spark.createDataFrame(docs, "text string")
    got = [
        (r.merge_idx, r.left, r.right, r.merged, r.pair_count)
        for r in bpe_learn(df, n_merges=8).collect()
    ]
    assert got == _python_bpe(words, 8)
    # 'lo' must be an early merge ('low' x 4 + lower/lowest)
    assert ("l", "o") in {(g[1], g[2]) for g in got[:3]}


def test_bpe_oracle_sql_replays_identically(spark):
    from sqlfeatureextraction_spark.operators.bpe import (
        bpe_learn,
        bpe_sql_oracle,
    )

    docs = [
        ("aaa aab abab bb aaa aaa",),
        ("ab ba aab abab abab",),
    ]
    df = spark.createDataFrame(docs, "text string")
    got = [
        tuple(r)
        for r in bpe_learn(df, n_merges=6).collect()
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
    exp = con.execute(bpe_sql_oracle(tok, n_merges=6)).fetchall()
    assert got == exp


def test_bpe_encode_fertility_matches_oracle(spark):
    from sqlfeatureextraction_spark.operators.bpe import (
        bpe_encode_fertility,
        bpe_encode_sql_oracle,
    )

    docs = [
        (1, "low low low lower lowest"),
        (2, "new newer newest low"),
        (3, "wide wider widest newer"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = sorted(
        tuple(r)
        for r in bpe_encode_fertility(df, n_merges=6).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    tok = (
        "list_filter(string_split(lower(coalesce(text, '')), ' '),"
        " x -> x <> '')"
    )
    exp = sorted(
        con.execute(bpe_encode_sql_oracle(tok, n_merges=6)).fetchall()
    )
    assert got == exp
    # more merges can only reduce (or keep) every doc's subtoken count
    few = {
        r.doc_id: r.n_subtokens
        for r in bpe_encode_fertility(df, n_merges=2).collect()
    }
    many = dict((r.doc_id, r.n_subtokens) for r in
                bpe_encode_fertility(df, n_merges=6).collect())
    assert all(many[k] <= few[k] for k in few)


def test_bpe_replace_semantics_on_immediate_repeats(spark):
    """Pin the documented divergence from Sennrich's lookaround
    re.sub: replace() consumes the shared separator, so in 'abab'
    only the FIRST (a,b) occurrence merges in the application that
    learns the pair; reference BPE would merge both."""
    from sqlfeatureextraction_spark.operators.bpe import bpe_learn

    df = spark.createDataFrame([("abab abab abab",)], "text string")
    got = [
        (r.merge_idx, r.left, r.right, r.pair_count)
        for r in bpe_learn(df, n_merges=2).collect()
    ]
    # merge 1: (a, b) appears twice per word occurrence = 6 total
    assert got[0][1:] == ("a", "b", 6)
    # after the consuming replace, each word is 'ab a b </w>' (the
    # SECOND occurrence survived unmerged) -> (ab, a) count 3 ties
    # with (a, b) count 3; (a, b) wins the lexicographic tie-break.
    # Sennrich would have produced 'ab ab </w>' and learned (ab, ab).
    assert got[1][1:] == ("a", "b", 3)
