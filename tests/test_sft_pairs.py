"""SFT prompt/response pair extraction (operators/conversation.sft_pairs):
crafted grouping/concat edge semantics, DuckDB equality on the same crafted
rows, and the one-Exchange plan contract. Oracle parity at sf0.01 is
covered by test_oracle_parity."""

from __future__ import annotations

from datetime import datetime

from logstash_filter_geoip_spark.operators import conversation
from logstash_filter_geoip_spark.plans import checks

_TS = datetime(2024, 1, 1)

# conv A: leading system turn (pair 0 -> dropped), then
#   user u1 -> assistant a1, tool x, assistant a2   (response "a1\na2")
#   user u2 -> (no assistant)                       (dropped)
# conv B: user only, never answered                  (dropped)
# conv C: assistant before any user                  (pair 0 -> dropped)
ROWS = [
    ("A", 0, "system", "sys boot", None, _TS),
    ("A", 1, "user", "u1", None, _TS),
    ("A", 2, "assistant", "a1", None, _TS),
    ("A", 3, "tool", "x", "search", _TS),
    ("A", 4, "assistant", "a2", None, _TS),
    ("A", 5, "user", "u2", None, _TS),
    ("B", 0, "user", "lonely", None, _TS),
    ("C", 0, "assistant", "orphan", None, _TS),
]
SCHEMA = ("conv_id string, turn_idx int, role string, text string, "
          "tool string, ts timestamp")


def _t(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_sft_pairs_crafted(spark):
    rows = conversation.sft_pairs(_t(spark)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["conv_id"], r["pair_idx"]) == ("A", 1)
    assert r["prompt"] == "u1" and r["response"] == "a1\na2"
    assert r["n_assistant"] == 2 and r["n_other"] == 1


def test_sft_pairs_match_duckdb_on_crafted_rows(spark):
    import duckdb
    got = sorted(tuple(r) for r in
                 conversation.sft_pairs(_t(spark)).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE transcripts (conv_id VARCHAR, turn_idx INT, "
                "role VARCHAR, text VARCHAR, tool VARCHAR, ts TIMESTAMP)")
    con.executemany("INSERT INTO transcripts VALUES (?, ?, ?, ?, ?, ?)",
                    ROWS)
    want = sorted(con.execute(
        "WITH placeholder AS (SELECT 1)"
        + conversation.sft_pairs_oracle_sql()).fetchall())
    assert got == [tuple(w) for w in want]


def test_sft_pairs_single_exchange(spark):
    """The rollup groups on (conv_id, pair_idx) — a superset of the window
    key — so the whole operator is ONE Exchange (the sessionize rule)."""
    t = spark.createDataFrame(ROWS, SCHEMA)
    plan = checks.simple_plan(conversation.sft_pairs(t))
    assert plan.count("Exchange") == 1, plan[:3000]
    assert "Join" not in plan and "Python" not in plan, plan[:3000]


def test_render_chat_crafted_and_duckdb(spark):
    """Role tags, turn order, NULL text as '', and the single-Exchange
    plan — checked against DuckDB on the same crafted rows."""
    import duckdb
    rows = [("A", 1, "user", "hi", None, _TS),
            ("A", 0, "system", None, None, _TS),
            ("A", 2, "assistant", "yo", None, _TS),
            ("B", 0, "user", "solo", None, _TS)]
    t = spark.createDataFrame(rows, SCHEMA)
    got = {r["conv_id"]: (r["n_turns"], r["chat_text"])
           for r in conversation.render_chat(t).collect()}
    assert got["A"] == (3, "<|system|>\n<|user|>hi\n<|assistant|>yo")
    assert got["B"] == (1, "<|user|>solo")
    con = duckdb.connect()
    con.execute("CREATE TABLE transcripts (conv_id VARCHAR, turn_idx INT, "
                "role VARCHAR, text VARCHAR, tool VARCHAR, ts TIMESTAMP)")
    con.executemany("INSERT INTO transcripts VALUES (?, ?, ?, ?, ?, ?)",
                    rows)
    want = dict((c, (n, s)) for c, n, s in con.execute(
        "WITH placeholder AS (SELECT 1)"
        + conversation.render_chat_oracle_sql()).fetchall())
    assert got == want
    plan = checks.simple_plan(conversation.render_chat(t))
    assert plan.count("Exchange") == 1 and "Join" not in plan, plan[:3000]


def test_loss_mask_spans(spark):
    """Spans are contiguous per conversation (each turn starts where the
    previous ended, starting at 0), the trainable flag marks exactly the
    assistant turns, span widths equal the rendered turn's \\S+ token
    count (tag glues to the first word; NULL text -> tag-only 1 token),
    and reassembling widths matches render_chat's total tokens."""
    from pyspark.sql import functions as F
    rows = [("A", 0, "system", None, None, _TS),          # "<|system|>" = 1
            ("A", 1, "user", "hi there", None, _TS),      # "<|user|>hi there" = 2
            ("A", 2, "assistant", "a b c", None, _TS)]    # 3 tokens
    t = spark.createDataFrame(rows, SCHEMA)
    got = {r["turn_idx"]: r for r in
           conversation.loss_mask_spans(t).collect()}
    assert (got[0]["tok_start"], got[0]["tok_end"]) == (0, 1)
    assert (got[1]["tok_start"], got[1]["tok_end"]) == (1, 3)
    assert (got[2]["tok_start"], got[2]["tok_end"]) == (3, 6)
    assert [got[i]["trainable"] for i in (0, 1, 2)] == [0, 0, 1]
    # total width == token count of the rendered document
    doc = conversation.render_chat(t).collect()[0]["chat_text"]
    assert got[2]["tok_end"] == len(doc.split())
    plan = checks.simple_plan(conversation.loss_mask_spans(t))
    assert plan.count("Exchange") == 1 and "Join" not in plan, plan[:3000]


# ---------------------------------------------------------------------------
# Markov transition matrix (conversation.transition_counts)
# ---------------------------------------------------------------------------


def _trans(spark, rows):
    from logstash_filter_geoip_spark.operators.conversation import \
        transition_counts
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, "
                                     "role string")
    return {(r.from_state, r.to_state): (r.n_transitions, r.share_ppm)
            for r in transition_counts(df).collect()}


def test_transitions_crafted(spark):
    """Two conversations: a→b→a and a single-turn c. Sentinels bracket
    each conversation; a NULL state passes through VERBATIM (only the
    absence of a neighbouring ROW maps to <start>/<end>)."""
    got = _trans(spark, [
        ("c1", 0, "a"), ("c1", 1, "b"), ("c1", 2, "a"),
        ("c2", 0, "c"),
        ("c3", 0, "a"), ("c3", 1, None),
    ])
    n = {k: v[0] for k, v in got.items()}
    assert n == {("<start>", "a"): 2, ("a", "b"): 1, ("b", "a"): 1,
                 ("a", "<end>"): 1, ("<start>", "c"): 1, ("c", "<end>"): 1,
                 ("a", None): 1, (None, "<end>"): 1}
    total = sum(n.values())
    assert total == 9  # turns + n_convs = 6 + 3 (each conv adds turns+1)
    for (f, t), (c, ppm) in got.items():
        assert ppm == c * 1000000 // total


def test_transitions_flow_conservation(spark):
    """Flow reconciliation over the real corpus: <start> out-flow ==
    number of conversations == <end> in-flow, and every non-sentinel
    state's in-flow equals its out-flow (each occurrence has exactly one
    predecessor and one successor once sentinels close the ends)."""
    from collections import defaultdict
    from logstash_filter_geoip_spark.operators.conversation import \
        transition_counts
    from logstash_filter_geoip_spark.sources.transcripts import \
        load_transcripts
    t = load_transcripts(spark, "/root/testdata/sf0.001")
    n_convs = t.select("conv_id").distinct().count()
    n_turns = t.count()
    rows = transition_counts(t).collect()
    inflow, outflow = defaultdict(int), defaultdict(int)
    for r in rows:
        outflow[r.from_state] += r.n_transitions
        inflow[r.to_state] += r.n_transitions
    assert outflow["<start>"] == n_convs == inflow["<end>"]
    assert sum(r.n_transitions for r in rows) == n_turns + n_convs
    for s in set(inflow) | set(outflow):
        if s in ("<start>", "<end>"):
            continue
        assert inflow[s] == outflow[s], s


def test_transitions_plan(spark):
    """The lag/lead window REUSES the transcripts derivation's conv_id
    exchange (same partitioning — no extra conv_id shuffle); the total is
    a single-partition window over the aggregated (tiny) relation, never
    a join-back that re-derives the pipeline; no Python, no joins."""
    from logstash_filter_geoip_spark.operators.conversation import \
        transition_counts
    from logstash_filter_geoip_spark.sources.transcripts import \
        load_transcripts
    df = transition_counts(load_transcripts(spark, "/root/testdata/sf0.001"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("hashpartitioning(conv_id") == 1, plan[:3000]
    assert "Join" not in plan, plan[:3000]
    assert "Python" not in plan, plan[:3000]
