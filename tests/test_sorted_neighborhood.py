"""Sorted-neighborhood candidate pairs (dedup.py)."""


def _brute(rows, window=5, key_len=16, thr=0.6):
    import re

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[-1]

    keyed = []
    for did, text in rows:
        k = re.sub(r"[^a-z0-9]", "", (text or "").lower())[:key_len]
        if k:
            keyed.append((k, did))
    keyed.sort()
    out = set()
    for i in range(len(keyed)):
        for j in range(i + 1, min(i + 1 + window, len(keyed))):
            ka, ida = keyed[i]
            kb, idb = keyed[j]
            sim = 1.0 - lev(ka, kb) / max(len(ka), len(kb))
            if round(sim, 6) >= thr:
                out.add((ida, idb, round(sim, 6)))
    return out


def test_sorted_neighborhood_matches_brute_force(spark):
    from sqlfeatureextraction_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    rows = [
        (1, "the quick brown fox"),
        (2, "the quick brown fox!"),   # same normalized key
        (3, "the quick brawn fox"),    # one-char diff
        (4, "zebra stripes forever"),
        (5, "zebra stripes 4ever"),
        (6, "completely different text here"),
        (7, "the quick brown foxes jumped"),  # longer, same prefix-ish
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r.id_a, r.id_b, r.sim)
        for r in sorted_neighborhood_pairs(
            df, window=3, key_len=16, sim_threshold=0.6
        ).collect()
    }
    exp = _brute(rows, window=3)
    assert got == exp
    pair_ids = {(a, b) for a, b, _ in got}
    assert (1, 2) in pair_ids or (2, 1) in pair_ids
    # the thin-spread near-dup (one char mid-key) is caught
    assert any({a, b} == {1, 3} or {a, b} == {2, 3} for a, b in pair_ids)
