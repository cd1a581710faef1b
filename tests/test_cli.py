"""CLI utilities (the reference's index-put / index-search surface):
query-syntax parser units + an end-to-end build/search/stats/delete/
consolidate round trip over a small synthetic corpus."""

import json

import pytest

from iresearch_spark import cli
from iresearch_spark.query import filters as qf


# ------------------------------------------------------------ parse_query


def test_parse_term_and_field():
    assert cli.parse_query("w3") == qf.Term("w3")
    assert cli.parse_query("srcid:src7") == qf.Term("src7", field="srcid")


def test_parse_or_and_all():
    q = cli.parse_query("w3 w7")
    assert q == qf.Or(qf.Term("w3"), qf.Term("w7"))
    q = cli.parse_query("w3 w7", require_all=True)
    assert q == qf.And(qf.Term("w3"), qf.Term("w7"))


def test_parse_phrase_with_prefix_part():
    q = cli.parse_query('"w0 w1*"')
    assert q == qf.Phrase(["w0", qf.Prefix("w1")])


def test_parse_prefix_wildcard():
    assert cli.parse_query("pre*") == qf.Prefix("pre")
    q = cli.parse_query("w?ld*")
    assert q == qf.Wildcard("w_ld%")


def test_parse_regexp():
    assert cli.parse_query("/w1[0-9]/") == qf.Regexp("w1[0-9]")
    q = cli.parse_query("srcid:/s.c[0-9]+/")
    assert q == qf.Regexp("s.c[0-9]+", field="srcid")


def test_parse_fuzzy():
    assert cli.parse_query("tble~1") == qf.Fuzzy("tble", max_distance=1)
    assert cli.parse_query("tble~2t") == qf.Fuzzy(
        "tble", max_distance=2, with_transpositions=True
    )


def test_parse_range():
    q = cli.parse_query("[query TO sort]")
    assert q == qf.TermRange("query", "sort")


def test_parse_exclude_and_boost():
    q = cli.parse_query("w3 -w999")
    assert q == qf.Not(qf.Term("w3"), qf.Term("w999"))
    q = cli.parse_query("w3^2.5")
    assert q == qf.Boost(qf.Term("w3"), 2.5)


def test_parse_empty_and_garbage():
    with pytest.raises(ValueError):
        cli.parse_query("   ")
    # a lone exclusion still parses (match-all minus excluded)
    q = cli.parse_query("-w999")
    assert q == qf.Not(qf.AllDocs(), qf.Term("w999"))


# ------------------------------------------------------------ end-to-end


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    from iresearch_spark.fixtures.corpus import gen_corpus_spark

    p = str(tmp_path_factory.mktemp("cli") / "corpus.parquet")
    gen_corpus_spark(spark, 600).write.parquet(p)
    return p


def _out_lines(capsys):
    return [
        json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ]


def test_cli_round_trip(spark, corpus_path, tmp_path, capsys):
    store = str(tmp_path / "idx")
    rc = cli.main(
        ["build", "--input", corpus_path, "--store", store, "--segments", "2"],
        spark=spark,
    )
    assert rc == 0
    built = _out_lines(capsys)[-1]
    assert built["n_docs"] == 600 and built["n_segments"] == 2

    rc = cli.main(["search", "--store", store, "w3 w7", "-k", "5"], spark=spark)
    assert rc == 0
    hits = _out_lines(capsys)
    assert 0 < len(hits) <= 5
    assert [h["rank"] for h in hits] == list(range(1, len(hits) + 1))
    assert all(hits[i]["score"] >= hits[i + 1]["score"] for i in range(len(hits) - 1))

    # --cols: stored-column retrieval rides the same hit rows
    rc = cli.main(
        ["search", "--store", store, "w3 w7", "-k", "5", "--cols", "lang"],
        spark=spark,
    )
    assert rc == 0
    chits = _out_lines(capsys)
    assert [h["url"] for h in chits] == [h["url"] for h in hits]
    assert all(h["lang"] for h in chits)

    # --sorted: first-k matches in index (url) order, scoring-free
    rc = cli.main(
        ["search", "--store", store, "w3", "-k", "5", "--sorted"], spark=spark
    )
    assert rc == 0
    sorted_hits = _out_lines(capsys)
    assert sorted_hits and "score" not in sorted_hits[0]
    urls = [h["url"] for h in sorted_hits]
    assert urls == sorted(urls)

    # /regex/ multiterm search: full-match dictionary expansion
    rc = cli.main(
        ["search", "--store", store, "/w3[0-9]?/", "-k", "5"], spark=spark
    )
    assert rc == 0
    rhits = _out_lines(capsys)
    assert rhits and all(h["score"] > 0 for h in rhits)

    # suggest: df-ranked prefix completions from the term dictionary
    rc = cli.main(["suggest", "--store", store, "w1", "-k", "5"], spark=spark)
    assert rc == 0
    sugg = _out_lines(capsys)
    assert 0 < len(sugg) <= 5
    assert all(s["term"].startswith("w1") for s in sugg)
    assert all(
        sugg[i]["df"] >= sugg[i + 1]["df"] for i in range(len(sugg) - 1)
    )

    rc = cli.main(["stats", "--store", store], spark=spark)
    assert rc == 0
    stats = _out_lines(capsys)[-1]
    assert stats["stats"]["n_docs"] == 600 and stats["n_segments"] == 2

    rc = cli.main(["delete", "--store", store, "w3"], spark=spark)
    assert rc == 0
    deleted = _out_lines(capsys)[-1]
    assert deleted["masked_segments"]  # at least one segment gained a mask

    rc = cli.main(
        ["consolidate", "--store", store, "--policy", "count",
         "--opt", "max_segments=1"],
        spark=spark,
    )
    assert rc == 0
    cons = _out_lines(capsys)[-1]
    assert cons["merge_rounds"] >= 1

    # deleted docs are gone after compaction; the term no longer matches
    rc = cli.main(["search", "--store", store, "w3", "-k", "5"], spark=spark)
    assert rc == 0
    assert _out_lines(capsys) == []

    # search-batch: a query file through one amortized batch, hits agree
    # with the solo search path
    qfile = str(tmp_path / "queries.txt")
    with open(qfile, "w") as f:
        f.write("# comment\nw7 w40\n\nw41~1\n")
    rc = cli.main(["search", "--store", store, "w7 w40", "-k", "3"], spark=spark)
    assert rc == 0
    solo = _out_lines(capsys)
    rc = cli.main(
        ["search-batch", "--store", store, "--queries", qfile, "-k", "3"],
        spark=spark,
    )
    assert rc == 0
    out = _out_lines(capsys)
    assert out[-1]["n_queries"] == 2 and out[-1]["qps"] > 0
    assert out[0]["query"] == "w7 w40" and out[0]["hits"] == solo
    assert out[1]["query"] == "w41~1"


def test_cli_unlock(tmp_path, capsys):
    """unlock: refuses a live same-host holder without --force, removes
    dead or forced locks, and never needs a Spark session."""
    import os
    import socket

    from iresearch_spark.store import SnapshotStore

    root = str(tmp_path / "idx")
    st = SnapshotStore(root)
    assert cli.main(["unlock", "--store", root]) == 0  # not locked

    lk = st.write_lock(owner="live-writer").acquire()
    try:
        assert cli.main(["unlock", "--store", root]) == 1
        assert cli.main(["unlock", "--store", root, "--force"]) == 0
        assert not os.path.exists(os.path.join(st.root, "write.lock"))
    finally:
        lk.release()  # no-op on the already-removed file (token-checked)

    with open(os.path.join(st.root, "write.lock"), "w") as f:
        json.dump(
            {"owner": "crashed", "host": socket.gethostname(),
             "pid": 2**22 + 1, "ts": 0, "token": "x"}, f,
        )
    assert cli.main(["unlock", "--store", root]) == 0
    out = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
    assert [o["removed"] for o in out] == [False, False, True, True]


def test_parse_open_bound_range():
    assert cli.parse_query("[* TO sort]") == qf.TermRange(None, "sort")
    assert cli.parse_query("[query TO *]") == qf.TermRange("query", None)


def test_resolve_numeric_ranges_unit():
    an = {"n": "numeric:8", "text": "text"}
    got = cli.resolve_numeric_ranges(
        qf.Or(
            qf.TermRange("100", "200", field="n"),
            qf.Boost(qf.TermRange(None, "50", field="n"), 2.0),
            qf.TermRange("a", "b"),  # text field: untouched
        ),
        an,
    )
    assert got == qf.Or(
        qf.GranularRange(100, 200, step=8, field="n"),
        qf.Boost(qf.GranularRange(None, 50, step=8, field="n"), 2.0),
        qf.TermRange("a", "b"),
    )
    with pytest.raises(ValueError, match="must be numbers"):
        cli.resolve_numeric_ranges(qf.TermRange("x", "y", field="n"), an)


def test_cli_numeric_range_search(spark, corpus_path, tmp_path, capsys):
    """End-to-end F5 through the CLI: a numeric:8 field over a derived
    doc-length column, queried with plain range syntax — the searcher
    resolves it to GranularRange via the manifest's frozen analyzer."""
    from pyspark.sql import functions as F

    num_corpus = str(tmp_path / "numcorpus.parquet")
    spark.read.parquet(corpus_path).withColumn(
        "nch", F.length("text").cast("string")
    ).write.parquet(num_corpus)
    store = str(tmp_path / "numidx")
    rc = cli.main(
        ["build", "--input", num_corpus, "--store", store, "--segments", "2",
         "--field", "text,__text__,text", "--field", "n,nch,numeric:8"],
        spark=spark,
    )
    assert rc == 0
    _out_lines(capsys)

    rc = cli.main(
        ["search", "--store", store, "n:[100 TO 200]", "-k", "8"], spark=spark
    )
    assert rc == 0
    hits = _out_lines(capsys)
    assert hits and [h["rank"] for h in hits] == list(range(1, len(hits) + 1))

    # open bound + verify the match set against the raw column
    rc = cli.main(
        ["search", "--store", store, "n:[400 TO *]", "-k", "700"], spark=spark
    )
    assert rc == 0
    got = {h["url"] for h in _out_lines(capsys)}
    want = {
        r["url"]
        for r in spark.read.parquet(num_corpus)
        .filter(F.col("nch").cast("long") >= 400)
        .collect()
    }
    assert got == want and want

    # non-integer bounds over the numeric field fail with a clear error
    with pytest.raises(ValueError, match="must be numbers"):
        cli.main(["search", "--store", store, "n:[aa TO bb]"], spark=spark)


def test_cli_encrypted_round_trip(spark, corpus_path, tmp_path, capsys):
    """S9 via the CLI: --key builds an AES-GCM-encrypted store; searching
    with the key matches a plaintext build, without it fails fast."""
    plain = str(tmp_path / "idx_p")
    enc = str(tmp_path / "idx_e")
    for argv in (
        ["build", "--input", corpus_path, "--store", plain, "--segments", "2"],
        ["build", "--input", corpus_path, "--store", enc, "--segments", "2",
         "--key", "s3cret"],
    ):
        assert cli.main(argv, spark=spark) == 0
    capsys.readouterr()

    assert cli.main(["search", "--store", plain, "w3 w7", "-k", "5"],
                    spark=spark) == 0
    p_hits = _out_lines(capsys)
    assert cli.main(["search", "--store", enc, "w3 w7", "-k", "5",
                     "--key", "s3cret"], spark=spark) == 0
    e_hits = _out_lines(capsys)
    assert p_hits == e_hits and len(p_hits) == 5

    with pytest.raises(ValueError, match="encrypted"):
        cli.main(["search", "--store", enc, "w3", "-k", "5"], spark=spark)
    with pytest.raises(ValueError, match="wrong key"):
        cli.main(["search", "--store", enc, "w3", "-k", "5",
                  "--key", "wrong"], spark=spark)


def test_cli_snapshots_rollback(spark, corpus_path, tmp_path, capsys):
    store = str(tmp_path / "idx_rb")
    assert cli.main(
        ["build", "--input", corpus_path, "--store", store, "--segments", "2"],
        spark=spark,
    ) == 0
    capsys.readouterr()
    assert cli.main(["search", "--store", store, "w3", "-k", "5"], spark=spark) == 0
    golden = _out_lines(capsys)
    assert cli.main(["delete", "--store", store, "w3"], spark=spark) == 0
    capsys.readouterr()

    assert cli.main(["snapshots", "--store", store], spark=spark) == 0
    gens = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [g["snapshot_id"] for g in gens] == [1, 2]
    assert gens[-1]["operation"] == "delete" and gens[-1]["current"]

    assert cli.main(["rollback", "--store", store, "--to", "1"], spark=spark) == 0
    rb = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rb == {"snapshot_id": 3, "restored": 1}

    assert cli.main(["search", "--store", store, "w3", "-k", "5"], spark=spark) == 0
    assert _out_lines(capsys) == golden

    assert cli.main(["abort-staged", "--store", store], spark=spark) == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1]) == {
        "discarded": False
    }


def test_cli_stored_snippet_facet(spark, corpus_path, tmp_path, capsys):
    """--stored persists user columns at build; --snippet highlights from
    a stored column; --facet aggregates the full match set."""
    store = str(tmp_path / "idx_stored")
    rc = cli.main(
        ["build", "--input", corpus_path, "--store", store, "--segments", "2",
         "--field", "text,__text__,text,offsets", "--stored", "text"],
        spark=spark,
    )
    assert rc == 0
    _out_lines(capsys)

    rc = cli.main(
        ["search", "--store", store, "w3", "-k", "3", "--snippet", "text"],
        spark=spark,
    )
    assert rc == 0
    hits = _out_lines(capsys)
    assert hits
    for h in hits:
        assert h["n_matches"] >= 1 and h["spans"]
        st, ln = h["spans"][0]
        assert "w3" in h["snippet"]
        assert ln == 2


    rc = cli.main(
        ["search", "--store", store, "w3", "-k", "5", "--collapse", "lang"],
        spark=spark,
    )
    assert rc == 0
    coll = _out_lines(capsys)
    assert coll
    langs = [h["lang"] for h in coll]
    assert len(langs) == len(set(langs))  # at most one hit per lang
    assert [h["rank"] for h in coll] == list(range(1, len(coll) + 1))

    rc = cli.main(
        ["search", "--store", store, "w3", "--facet", "lang"], spark=spark
    )
    assert rc == 0
    facets = _out_lines(capsys)
    assert facets and all(f["n_docs"] > 0 for f in facets)
    vals = [f["lang"] for f in facets]
    assert vals == sorted(vals)


def test_cli_sortby_explain_mlt(spark, corpus_path, tmp_path, capsys):
    """--sort-by orders matches by a stored column; --explain emits
    per-term breakdown rows; mlt finds similar docs to a seed url."""
    store = str(tmp_path / "idx_sortx")
    rc = cli.main(
        ["build", "--input", corpus_path, "--store", store, "--segments", "2",
         "--stored", "text"],
        spark=spark,
    )
    assert rc == 0
    _out_lines(capsys)

    rc = cli.main(
        ["search", "--store", store, "w3", "-k", "4",
         "--sort-by", "warc_ts:desc"],
        spark=spark,
    )
    assert rc == 0
    hits = _out_lines(capsys)
    assert hits and [h["rank"] for h in hits] == list(range(1, len(hits) + 1))
    stamps = [h["warc_ts"] for h in hits]
    assert stamps == sorted(stamps, reverse=True)

    rc = cli.main(
        ["search", "--store", store, "w3 w7", "-k", "3", "--explain"],
        spark=spark,
    )
    assert rc == 0
    rows = _out_lines(capsys)
    assert rows and {r["term"] for r in rows} <= {"w3", "w7"}
    by_rank: dict = {}
    for r in rows:
        by_rank.setdefault(r["rank"], [0.0, r["score"]])
        by_rank[r["rank"]][0] += r["contribution"]
    for total, score in by_rank.values():
        assert abs(total - score) < 5e-5

    seed = hits[0]["url"]
    rc = cli.main(
        ["mlt", "--store", store, seed, "-k", "5"], spark=spark
    )
    assert rc == 0
    sim = _out_lines(capsys)
    assert sim and all(h["url"] != seed for h in sim)
    assert [h["rank"] for h in sim] == list(range(1, len(sim) + 1))

    # cursor pagination: page 2 from page 1's last hit
    rc = cli.main(["search", "--store", store, "w3", "-k", "5"], spark=spark)
    assert rc == 0
    p1 = _out_lines(capsys)
    cursor = f"{p1[-1]['score']},{p1[-1]['url']}"
    rc = cli.main(
        ["search", "--store", store, "w3", "-k", "5", "--after", cursor],
        spark=spark,
    )
    assert rc == 0
    p2 = _out_lines(capsys)
    assert p2 and not ({h["url"] for h in p1} & {h["url"] for h in p2})
    assert max(h["score"] for h in p2) <= min(h["score"] for h in p1)


def test_cli_search_mode_flags_mutually_exclusive(spark, tmp_path):
    """Combining two output-mode flags must fail loudly instead of
    silently ignoring whichever dispatches later (first-match-wins).
    NOTE: pass the shared session — with spark=None, cli.main's
    getOrCreate would RETURN the session-scoped fixture and its finally
    would stop it for the whole rest of the suite."""
    import pytest as _pytest

    from iresearch_spark import cli

    with _pytest.raises(SystemExit, match="at most one output mode"):
        cli.main(
            [
                "search", "--store", str(tmp_path / "nope"), "w1",
                "--explain", "--after", "1.5,u",
            ],
            spark=spark,
        )
