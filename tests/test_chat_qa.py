"""Chat-format validation and canned-reply detection: planted-violation
conversations, flag totality on NULL roles, canned-flag branches, the
merge-hint plan pin on the corpus-derived join, and ppm arithmetic.
(Driver queries are oracle-checked by test_oracle_parity.)"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from logstash_filter_geoip_spark.operators import conversation as conv

TS = dt.datetime(2024, 1, 1)


def _t(spark, rows):
    # rows: (conv_id, turn_idx, role, text)
    return spark.createDataFrame(
        [(c, i, r, x, None, TS) for (c, i, r, x) in rows],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp_ntz")


def test_valid_conversation(spark):
    rows = [("c1", 0, "system", "be helpful"),
            ("c1", 1, "user", "hi"),
            ("c1", 2, "assistant", "hello"),
            ("c1", 3, "tool", "result"),
            ("c1", 4, "assistant", "done")]
    r = conv.chat_format_checks(_t(spark, rows)).collect()[0]
    assert r["n_turns"] == 5 and r["valid"] == 1
    assert (r["n_empty"], r["n_repeat_speaker"], r["n_orphan_tool"],
            r["n_misplaced_system"]) == (0, 0, 0, 0)
    assert r["starts_ok"] == 1 and r["ends_with_assistant"] == 1


def test_each_violation_detected(spark):
    rows = [  # repeated user, empty text, orphan tool, late system, bad ends
        ("c2", 0, "user", "a"),
        ("c2", 1, "user", "b"),          # repeat speaker
        ("c2", 2, "assistant", ""),      # empty text
        ("c2", 3, "system", "late"),     # misplaced system
        ("c2", 4, "tool", "r"),          # orphan (follows system)
        ("c2", 5, "user", "end")]        # not assistant-final
    r = conv.chat_format_checks(_t(spark, rows)).collect()[0]
    assert r["n_repeat_speaker"] == 1
    assert r["n_empty"] == 1
    assert r["n_misplaced_system"] == 1
    assert r["n_orphan_tool"] == 1
    assert r["ends_with_assistant"] == 0 and r["valid"] == 0
    # tool opener: orphan AND bad start
    r2 = conv.chat_format_checks(
        _t(spark, [("c3", 0, "tool", "x")])).collect()[0]
    assert r2["n_orphan_tool"] == 1 and r2["starts_ok"] == 0


def test_null_role_is_totality_not_null(spark):
    rows = [("c4", 0, None, "x"), ("c4", 1, "assistant", "y")]
    r = conv.chat_format_checks(_t(spark, rows)).collect()[0]
    # NULL role: no violation counts go NULL; opener flag is 0 (not ok)
    assert r["n_repeat_speaker"] == 0 and r["n_orphan_tool"] == 0
    assert r["starts_ok"] == 0 and r["valid"] == 0
    assert r["ends_with_assistant"] == 1


def test_canned_replies_branches(spark):
    rows = ([(f"c{i}", 0, "assistant", "  The SAME  ") for i in range(3)]
            + [("c9", 0, "assistant", "unique"),
               ("c9", 1, "assistant", "THE same"),  # 4th use, 4th conv
               ("c0", 5, "assistant", ""),          # excluded: empty
               ("c0", 6, "user", "the same")])      # excluded: not assistant
    out = {r["reply"]: r.asDict()
           for r in conv.canned_replies(_t(spark, rows), 3).collect()}
    assert set(out) == {"the same", "unique"}
    assert out["the same"]["n_uses"] == 4
    assert out["the same"]["n_convs"] == 4
    assert out["the same"]["canned"] == 1
    assert out["unique"]["canned"] == 0
    with pytest.raises(ValueError):
        conv.canned_replies(_t(spark, rows), 0)


def test_canned_share_ppm_and_plan(spark):
    rows = [("a", 0, "assistant", "dup"), ("a", 1, "assistant", "only-a"),
            ("a", 2, "assistant", "also-a"),
            ("b", 0, "assistant", "dup"), ("c", 0, "assistant", "dup")]
    out = conv.canned_share(_t(spark, rows), min_convs=3)
    got = {r["conv_id"]: r.asDict() for r in out.collect()}
    assert got["a"]["n_assistant"] == 3 and got["a"]["n_canned"] == 1
    assert got["a"]["canned_ppm"] == 333_333
    assert got["b"]["canned_ppm"] == 1_000_000
    # corpus-derived inventory must NOT broadcast (session-10 rule)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_truncate_context_suffix_rule(spark):
    # token counts: "<|user|>hi there" -> 2 ("<|user|>hi", "there")
    rows = [("c1", 0, "user", "one two three"),        # 3 tokens
            ("c1", 1, "assistant", "four five"),       # 2 tokens
            ("c1", 2, "user", "six"),                  # 1 token
            ("c1", 3, "assistant", "seven eight")]     # 2 tokens
    out = conv.truncate_context(_t(spark, rows), max_tokens=5)
    got = {r["turn_idx"]: r.asDict() for r in out.collect()}
    # from the end: t3=2, t2=3, t1=5, t0=8 -> keep t1..t3
    assert set(got) == {1, 2, 3}
    assert got[3]["tokens_from_end"] == 2
    assert got[1]["tokens_from_end"] == 5
    # a single over-budget turn drops its conversation entirely
    out2 = conv.truncate_context(
        _t(spark, [("c2", 0, "user", "a b c d e f")]), max_tokens=3)
    assert out2.count() == 0
    # NULL text renders as tag-only single token
    out3 = conv.truncate_context(
        _t(spark, [("c3", 0, "user", None)]), max_tokens=1)
    assert out3.collect()[0]["n_tok"] == 1
    with pytest.raises(ValueError):
        conv.truncate_context(_t(spark, rows), 0)


def test_truncate_token_rule_matches_loss_mask(spark):
    rows = [("c1", 0, "user", "alpha beta"), ("c1", 1, "assistant", "x")]
    t = _t(spark, rows)
    trunc = {r["turn_idx"]: r["n_tok"]
             for r in conv.truncate_context(t, 1000).collect()}
    mask = {r["turn_idx"]: r["tok_end"] - r["tok_start"]
            for r in conv.loss_mask_spans(t).collect()}
    assert trunc == mask


def test_tool_chains_order_and_counts(spark):
    rows = [("c1", 0, "user", "q", "search"), ("c1", 2, "tool", "r", "bash"),
            ("c1", 1, "assistant", "a", None),   # NULL tool: not a link
            ("c2", 0, "user", "q", "search"), ("c2", 1, "tool", "r", "bash"),
            ("c3", 0, "user", "q", "bash"),
            ("c4", 0, "user", "no tools", None)]
    t = spark.createDataFrame(
        [(c, i, r, x, tl, TS) for (c, i, r, x, tl) in rows],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp_ntz")
    got = {r["chain"]: (r["chain_len"], r["n_convs"])
           for r in conv.tool_chains(t).collect()}
    # order by turn_idx, NULL-tool turn skipped; c4 absent
    assert got == {"search>bash": (2, 2), "bash": (1, 1)}


def test_error_runs_islands(spark):
    rows = [("c1", 0, "user", "ok"),
            ("c1", 1, "assistant", "E403 fail"),   # run 1 (len 2)
            ("c1", 2, "tool", "E500 again"),
            ("c1", 3, "user", "fine"),
            ("c1", 4, "assistant", "E404"),        # run 2 (len 1)
            ("c2", 0, "user", "clean"),            # no errors: absent
            ("c3", 0, "user", None),               # NULL text: no error
            ("c3", 1, "tool", "E999")]
    r = {x["conv_id"]: x.asDict()
         for x in conv.error_runs(_t(spark, rows)).collect()}
    assert set(r) == {"c1", "c3"}
    assert r["c1"]["max_error_run"] == 2
    assert r["c1"]["n_error_runs"] == 2
    assert r["c1"]["n_error_turns"] == 3
    assert r["c3"]["max_error_run"] == 1 and r["c3"]["n_error_runs"] == 1


def test_chat_qa_three_engine_fuzz(spark, tmp_path):
    """Seeded random conversations through all three engines: Spark ==
    DuckDB == a pure-Python recompute of every chat-QA rule (NULL roles,
    whitespace-only/NULL texts, single-turn and long conversations)."""
    import random
    import re

    rnd = random.Random(4242)
    roles = ["user", "assistant", "tool", "system", None]
    texts = ["hi there", "", "   ", None, "E403 bad", "ok E500", "x",
             "  The SAME  ", "the same"]
    rows = []
    for c in range(80):
        for i in range(rnd.randint(1, 6)):
            rows.append((f"c{c}", i, rnd.choice(roles), rnd.choice(texts)))
    t = _t(spark, rows)

    convs = {}
    for c, i, r, x in rows:
        convs.setdefault(c, []).append((i, r, x))
    for v in convs.values():
        v.sort()

    # --- chat_format_checks: python recompute ---
    def is_empty(x):
        return x is None or x.strip(" ") == ""

    expected = {}
    for c, turns in convs.items():
        n = len(turns)
        n_empty = sum(1 for _, _, x in turns if is_empty(x))
        rep = orph = msys = 0
        for k, (_, r, _) in enumerate(turns):
            prev = turns[k - 1][1] if k else None
            first = k == 0
            if r in ("user", "assistant") and prev == r and prev is not None:
                rep += 1
            if r == "tool" and (first or (prev is not None and
                                          prev not in ("assistant", "tool"))):
                orph += 1
            if r == "system" and not first:
                msys += 1
        starts = int(turns[0][1] in ("system", "user"))
        ends = int(turns[-1][1] == "assistant")
        valid = int(not n_empty and not rep and not orph and not msys
                    and starts and ends)
        expected[c] = (n, n_empty, rep, orph, msys, starts, ends, valid)
    got = {r["conv_id"]: (r["n_turns"], r["n_empty"], r["n_repeat_speaker"],
                          r["n_orphan_tool"], r["n_misplaced_system"],
                          r["starts_ok"], r["ends_with_assistant"],
                          r["valid"])
           for r in conv.chat_format_checks(t).collect()}
    assert got == expected

    # --- error_runs: python recompute ---
    eexp = {}
    for c, turns in convs.items():
        flags = [x is not None and re.search("E[0-9][0-9][0-9]", x)
                 is not None for _, _, x in turns]
        runs, cur = [], 0
        for f in flags:
            if f:
                cur += 1
            elif cur:
                runs.append(cur)
                cur = 0
        if cur:
            runs.append(cur)
        if runs:
            eexp[c] = (max(runs), len(runs), sum(runs))
    egot = {r["conv_id"]: (r["max_error_run"], r["n_error_runs"],
                           r["n_error_turns"])
            for r in conv.error_runs(t).collect()}
    assert egot == eexp

    # --- truncate_context: python recompute (budget 4) ---
    texp = set()
    for c, turns in convs.items():
        acc = 0
        for i, r, x in reversed(turns):
            acc += len(re.findall(r"\S+", f"<|{r or ''}|>{x or ''}"))
            if acc <= 4:
                texp.add((c, i))
    tgot = {(r["conv_id"], r["turn_idx"])
            for r in conv.truncate_context(t, 4).collect()}
    assert tgot == texp

    # --- DuckDB third engine over identical parquet rows ---
    p = str(tmp_path / "qa.parquet")
    t.coalesce(1).write.parquet(p)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW qa_t AS SELECT * FROM read_parquet('{p}/*.parquet')")
    prefix = "WITH transcripts AS (SELECT * FROM qa_t)"
    for op, cont in [
        (conv.chat_format_checks(t), conv.chat_format_checks_oracle_sql()),
        (conv.error_runs(t), conv.error_runs_oracle_sql()),
        (conv.truncate_context(t, 4), conv.truncate_context_oracle_sql(4)),
        (conv.canned_replies(t), conv.canned_replies_oracle_sql()),
        (conv.canned_share(t), conv.canned_share_oracle_sql()),
        (conv.tool_chains(t), conv.tool_chains_oracle_sql()),
    ]:
        s = sorted(tuple(str(v) for v in r) for r in op.collect())
        d = sorted(tuple(str(v) for v in r)
                   for r in con.execute(prefix + cont).fetchall())
        assert s == d


def test_tool_latency_gap_rule(spark):
    base = TS
    rows = [("c1", 0, "user", "q", "search", base),
            ("c1", 1, "tool", "r", "search",
             base + dt.timedelta(microseconds=1500)),
            ("c1", 2, "assistant", "a", None,
             base + dt.timedelta(microseconds=4500)),
            ("c2", 0, "user", "q", "bash", base)]  # last turn: drops out
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp_ntz")
    got = {r["tool"]: (r["q50"], r["q95"], r["n_values"])
           for r in conv.tool_latency_stats(t).collect()}
    # both 'search' turns have a next turn: gaps 1500 and 3000 micros
    assert got["search"][2] == 2
    assert got["search"][0] == 2250.0   # type-7 median of {1500, 3000}
    assert "bash" not in got            # no next turn -> no latency


def test_new_conv_operator_plan_shapes(spark):
    """Scale-shape pins: the docstring Exchange claims hold in the
    physical plans (conv_id-keyed windows/aggregates share one Exchange;
    no Python, no joins except canned_share's pinned SMJ)."""
    rows = [("c1", 0, "user", "a b", "search"),
            ("c1", 1, "assistant", "E403 c", None),
            ("c2", 0, "user", "d", "bash")]
    t = spark.createDataFrame(
        [(c, i, r, x, tl, TS) for (c, i, r, x, tl) in rows],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp_ntz")

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    for df, n_exch in [
        (conv.chat_format_checks(t), 1),   # one window + same-key agg
        (conv.truncate_context(t, 8), 1),  # one desc window + filter
        (conv.error_runs(t), 1),           # windows+aggs all on conv_id
        (conv.tool_chains(t), 2),          # conv agg -> chain agg
        (conv.tool_latency_stats(t), 2),   # conv window -> tool agg
    ]:
        p = plan(df)
        assert "Join" not in p
        assert "EvalPython" not in p
        assert p.count("Exchange") == n_exch, (n_exch, p[:2000])
