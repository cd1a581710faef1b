"""Near-dup clustering: distributed min-label propagation over the
verified-pair graph must equal a union-find ground truth, including
multi-hop chains (A~B, B~C, A!~C) that need >1 propagation round."""

import pandas as pd

from iresearch_spark.textops import dedup, sampling


def _union_find(n_ids, pairs):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-label semantics: representative = min doc_id in component
    comp = {}
    for i in n_ids:
        comp.setdefault(find(i), []).append(i)
    out = {}
    for members in comp.values():
        m = min(members)
        for i in members:
            out[i] = m
    return out


def test_neardup_clusters_match_union_find(spark):
    # chain docs over a 24-word base: doc i replaces the first i words
    # with drift tokens, so adjacent docs share most 3-shingles
    # (J ~ 0.73+) while docs >= 2 apart drop below the 0.65 threshold —
    # the component only closes through multi-hop label propagation
    words = [f"base{j:02d}" for j in range(24)]
    texts = []
    for i in range(6):
        w = list(words)
        for j in range(i):
            w[j] = f"drift{j}"
        texts.append(" ".join(w))
    # two unrelated singletons + one exact pair
    texts += ["zulu yankee xray whiskey victor uniform", "one two three", "one two three"]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    sdf = spark.createDataFrame(pdf)
    kw = dict(threshold=0.65, n_hashes=16, n_bands=8)
    got = {
        r["doc_id"]: (r["cluster"], r["keep"])
        for r in dedup.neardup_clusters(sdf, **kw).collect()
    }
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in dedup.lsh_verified_pairs(sdf, **kw).collect()
    ]
    assert pairs, "fixture must produce verified pairs"
    ids = sorted({d for p in pairs for d in p})
    want = _union_find(ids, pairs)
    assert {k: v[0] for k, v in got.items()} == want
    assert all((k == v[0]) == v[1] for k, v in got.items())
    # at least one component must span a multi-hop chain
    sizes = pd.Series(list(want.values())).value_counts()
    assert sizes.max() >= 3, dict(sizes)


def test_hash_sample_stable_and_nested(spark):
    pdf = pd.DataFrame({"doc_id": range(500)})
    sdf = spark.createDataFrame(pdf)
    s100 = {r["doc_id"] for r in sampling.hash_sample(sdf, 100).collect()}
    s300 = {r["doc_id"] for r in sampling.hash_sample(sdf, 300).collect()}
    again = {r["doc_id"] for r in sampling.hash_sample(sdf, 100).collect()}
    assert s100 == again  # deterministic
    assert s100 <= s300  # nested by rate
    assert 0 < len(s100) < len(s300) < 500


def test_token_shards_budget_packing(spark):
    import pandas as pd

    texts = [f"tok{i} " * (10 + i % 7) for i in range(200)]
    pdf = pd.DataFrame({"doc_id": range(200), "text": [t.strip() for t in texts]})
    sdf = spark.createDataFrame(pdf)
    rows = sampling.token_shards(sdf, budget=100).collect()
    assert [r["doc_id"] for r in rows] == list(range(200))
    # shard ids are non-decreasing in doc order and derived from the
    # exclusive prefix sum
    pre = 0
    for r in rows:
        assert r["shard"] == pre // 100
        pre += r["n_tokens"]
    shards = [r["shard"] for r in rows]
    assert shards == sorted(shards)
    assert shards[-1] > 0
    # cumulative mass through the end of each closed shard s covers its
    # budget window: >= (s+1)*budget (individual shards may run short
    # only by a predecessor's overshoot, never by under-packing)
    tot = {}
    for r in rows:
        tot[r["shard"]] = tot.get(r["shard"], 0) + r["n_tokens"]
    cum = 0
    for s in sorted(tot):
        cum += tot[s]
        if s != max(tot):
            assert cum >= (s + 1) * 100


def test_keep_list_composition(spark):
    import pandas as pd

    texts = (
        ["alpha bravo charlie delta echo foxtrot golf hotel india juliet"] * 4
        + ["x!"] * 3  # fails quality floor
        + [f"w{i} unique doc body with plenty of content tokens here now ok{i}" for i in range(20)]
    )
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    sdf = spark.createDataFrame(pdf)
    rows = {r["doc_id"]: r["keep"] for r in sampling.keep_list(sdf, rate_permille=1000).collect()}
    assert len(rows) == len(texts)
    # exact duplicates: only the min doc_id of the clique keeps
    assert rows[0] is True
    assert rows[1] is False and rows[2] is False and rows[3] is False
    # quality failures never keep
    assert rows[4] is False and rows[5] is False and rows[6] is False
