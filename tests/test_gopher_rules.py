"""gopher_rules: each rule flips on a crafted row, NULL propagates, and the
crafted matrix agrees with the DuckDB oracle run over the same rows (the
multiline/bullet/ellipsis regexes never fire at sf0.01, so the engine-parity
of those branches is pinned here)."""

from __future__ import annotations

import duckdb

from logstash_filter_geoip_spark.operators.text_ops import (
    GOPHER_STOPWORDS, gopher_rules, gopher_rules_oracle)

GOOD = ("the quick brown fox jumps over the lazy dog and that other dog "
        "walked to town with all of its friends to have a look at the "
        "harbour lights while the band played on and everyone was glad "
        "that the evening would be long and warm with plenty of time")

DOCS = [
    (0, GOOD),                                    # passes every rule
    (1, "the of and short"),                      # fails word-count floor
    (2, GOOD + " " + "a " * 70),                  # mean word length < 3
    (3, GOOD + " " + "# " * 12),                  # symbol ratio > 0.1
    (4, "\n".join(["- " + GOOD] * 10)),           # all lines bulleted
    (5, "\n".join([GOOD + " ..."] * 10)),         # all lines end ellipsis
    (6, GOOD + " " + "42 " * 60),                 # alpha-word ratio < 80%
    (7, "tok " * 60),                             # no stop words at all
    (8, None),                                    # NULL text
]


def _spark_rows(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in gopher_rules(df).collect()}


def test_each_rule_flips_on_its_crafted_row(spark):
    got = _spark_rows(spark)
    assert got[0]["keep_gopher"] == 1
    assert all(v == 1 for k, v in got[0].items() if k.startswith("r_"))
    failing = {1: "r_word_count", 2: "r_mean_word_len", 3: "r_symbol_ratio",
               4: "r_bullet_lines", 5: "r_ellipsis_lines",
               6: "r_alpha_words", 7: "r_stop_words"}
    for doc, rule in failing.items():
        assert got[doc][rule] == 0, (doc, rule, got[doc])
        assert got[doc]["keep_gopher"] == 0
    # rows 4/5 must fail ONLY their line-screen rule (the multiline regexes
    # must not leak into other counts)
    for doc in (4, 5):
        others = [k for k in got[doc]
                  if k.startswith("r_") and k != failing[doc]]
        assert all(got[doc][k] == 1 for k in others), got[doc]


def test_null_text_propagates_null(spark):
    got = _spark_rows(spark)
    assert got[8]["keep_gopher"] is None
    assert got[8]["n_words"] is None


def test_crafted_matrix_matches_duckdb(spark):
    got = _spark_rows(spark)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    res = con.execute(gopher_rules_oracle())
    cols = [d[0] for d in res.description]
    duck = {r[0]: dict(zip(cols, r)) for r in res.fetchall()}
    assert got == duck


def test_stopword_list_is_gopher():
    assert GOPHER_STOPWORDS == ["the", "be", "to", "of", "and", "that",
                                "have", "with"]


def test_normalize_text_rules(spark):
    """Case/punct/whitespace canonicalization; NULL and unchanged rows."""
    import duckdb
    from logstash_filter_geoip_spark.operators.text_ops import normalize_text
    rows = [(0, "Hello,   World!!"), (1, "already clean"), (2, ""),
            (3, None), (4, "Tabs\tand\nnewlines  here"), (5, "a.b,c;d")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.norm_text, r.changed)
           for r in normalize_text(df).collect()}
    assert got == {
        0: ("hello world", 1),
        1: ("already clean", 0),
        2: ("", 0),
        3: (None, 0),
        4: ("tabs and newlines here", 1),
        5: ("abcd", 1),
    }
    # DuckDB computes the identical normalization on the same rows (the
    # oracle's regexes carry the 'g' flag — first-match-only otherwise)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    duck = {r[0]: (r[1], r[2]) for r in con.execute(r"""
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')) AS n,
               CAST(NOT (trim(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))
                    IS NOT DISTINCT FROM text) AS INT)
        FROM t""").fetchall()}
    assert duck == got
