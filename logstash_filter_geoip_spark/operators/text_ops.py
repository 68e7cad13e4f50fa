"""Text-analysis operators over the `documents` table: token counting,
quality scoring, n-gram language ID, and document fingerprinting.

These are the training-data-pipeline extensions (task mandate) — first-class
operators alongside the geoip pipeline. Every operator is expressed with
built-in JVM functions AND has a DuckDB oracle; the fingerprint's driver
query runs the engine-neutral md5 hash family (functions/hashing.py) so the
fold itself is oracle-checked, while the faster xxhash64+crc32 basis stays
the production default (value-locked in tests).

At 100 TB these are embarrassingly parallel scans: no shuffle, full
whole-stage codegen, columns pruned to `doc_id, text` at the parquet reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_filter_geoip_spark.functions.hashing import (md5_hash60,
                                                           md5_hash60_sql)

TOKEN_RE = r"\S+"
WORD_RE = "[a-z0-9]+"

# language → stopword alternation (tiny n-gram-ish heuristic; parity-safe
# regex subset for Java regex + RE2)
LANG_STOPWORDS: list[tuple[str, str]] = [
    ("en", r"\b(the|and|of|to|in|is|a)\b"),
    ("es", r"\b(el|la|de|que|y|en|los)\b"),
    ("fr", r"\b(le|la|de|et|les|des|un)\b"),
    ("de", r"\b(der|die|und|das|ist|von|ein)\b"),
]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish subword proxy (runs of letters,
    digits, or single punctuation — a cheap upper bound on BPE token count).
    """
    t = F.col(text_col)
    return df.select(
        "doc_id",
        F.length(t).alias("n_chars"),
        F.size(F.regexp_extract_all(t, F.lit(TOKEN_RE), 0)).alias("n_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))
         .alias("n_subtokens"),
    )


def quality_cols(text_col: str = "text") -> dict:
    """Output-name → Column map for the quality features — the single
    source shared by quality_scores and composed pipelines
    (curation.clean_corpus computes these in one projection instead of
    joining a separate quality pass)."""
    t = F.col(text_col)
    n_tokens = F.size(F.regexp_extract_all(t, F.lit(TOKEN_RE), 0))
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[.,;:!?]"), 0))
    n_digit = F.size(F.regexp_extract_all(t, F.lit(r"[0-9]"), 0))
    n_stop = F.size(F.regexp_extract_all(F.lower(t),
                                         F.lit(LANG_STOPWORDS[0][1]), 0))
    n_chars = F.length(t)
    keep = ((n_tokens >= 5) & (n_chars >= 30) & (n_digit * 4 <= n_chars)
            & (n_stop * 50 >= n_tokens))
    return {"n_chars_q": n_chars, "n_tokens": n_tokens, "n_punct": n_punct,
            "n_digits": n_digit, "n_stopwords": n_stop,
            "keep": keep.cast("int")}


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Integer-based quality features (ints so the oracle hash is exact):
    char/token/punct/digit/stopword counts and a binary keep flag. The
    stopword leg (task mandate: length/punct/STOPWORD ratios) uses the
    English stopword alternation shared with lang_id; the ratio enters the
    keep rule in cross-multiplied integer form (n_stop * 50 >= n_tokens ≈
    stopword ratio ≥ 2%, a standard natural-text floor) so no float ever
    reaches the oracle hash."""
    return df.select("doc_id", *[c.alias(name) for name, c in
                                 quality_cols(text_col).items()])


def lang_cols(text_col: str = "text") -> dict:
    """Output-name → Column map for language ID (shared with composed
    pipelines, same contract as quality_cols)."""
    low = F.lower(F.col(text_col))
    scores = {lang: F.size(F.regexp_extract_all(low, F.lit(pat), 0))
              for lang, pat in LANG_STOPWORDS}
    langs = [lang for lang, _ in LANG_STOPWORDS]
    pred = F.lit("unknown")
    # build the argmax CASE from the last language backwards
    for i in range(len(langs) - 1, -1, -1):
        lang = langs[i]
        cond = scores[lang] > 0
        for later in langs[i + 1:]:
            cond = cond & (scores[lang] >= scores[later])
        for earlier in langs[:i]:
            cond = cond & (scores[lang] > scores[earlier])
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    out = {f"s_{lang}": scores[lang] for lang in langs}
    out["lang_pred"] = pred
    return out


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language ID with deterministic argmax tie-break (declared
    order). Rows with zero hits in every language → 'unknown'."""
    return df.select("doc_id", *[c.alias(name) for name, c in
                                 lang_cols(text_col).items()])


def fingerprints(df: DataFrame, text_col: str = "text",
                 hash_basis: str = "native") -> DataFrame:
    """Deterministic document fingerprint: a whole-text hash plus a rolling
    token-fold hash (F.aggregate over a per-token hash — an order-sensitive
    polynomial fold, the set-oriented analogue of a rolling hash).

    hash_basis selects the hash family:
      * "native" (default) — xxhash64 whole-text + crc32 token fold,
        engine-internal and fastest (value-locked by an independent Python
        re-fold in tests).
      * "md5" — the 60-bit md5 family (functions/hashing.py) all three
        engines compute bit-identically, making the whole operator
        oracle-checkable; columns (doc_id, doc_fp60, rolling_fp).
    """
    t = F.col(text_col)
    toks = F.regexp_extract_all(F.lower(t), F.lit(WORD_RE), 0)
    if hash_basis == "md5":
        tok_hash = md5_hash60
        whole = md5_hash60(t).alias("doc_fp60")
    elif hash_basis == "native":
        tok_hash = lambda x: F.crc32(x.cast("binary"))  # noqa: E731
        whole = F.xxhash64(t).alias("xx64")
    else:
        raise ValueError(f"unknown hash_basis {hash_basis!r}")
    # polynomial fold mod a Mersenne prime keeps the accumulator < 2^31 so
    # acc * 1000003 + hash(tok) never overflows long (hash < 2^60, so the
    # sum stays < 2^61 — ANSI-safe, no wraparound in either engine)
    rolling = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc * F.lit(1000003) + tok_hash(x),
                              F.lit(2147483647)),
    )
    return df.select("doc_id", whole, rolling.alias("rolling_fp"))


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------


def queries():
    return {
        "text_token_counts": lambda s, d: token_counts(_docs(s, d)),
        "text_quality": lambda s, d: quality_scores(_docs(s, d)),
        "text_lang_id": lambda s, d: lang_id(_docs(s, d)),
        # driver query runs the md5 family (oracle-checkable end to end);
        # the native xxhash64+crc32 default stays the production path
        "text_fingerprint": lambda s, d: fingerprints(_docs(s, d),
                                                      hash_basis="md5"),
    }


def oracles() -> dict[str, str]:
    lang_scores = ",\n       ".join(
        f"len(regexp_extract_all(lower(text), '{pat}')) AS s_{lang}"
        for lang, pat in LANG_STOPWORDS)
    langs = [lang for lang, _ in LANG_STOPWORDS]
    argmax = "CASE "
    for i, lang in enumerate(langs):
        conds = [f"s_{lang} > 0"]
        conds += [f"s_{lang} >= s_{later}" for later in langs[i + 1:]]
        conds += [f"s_{lang} > s_{earlier}" for earlier in langs[:i]]
        argmax += f"WHEN {' AND '.join(conds)} THEN '{lang}' "
    argmax += "ELSE 'unknown' END"
    return {
        "text_token_counts": r"""
SELECT doc_id, length(text) AS n_chars,
       len(regexp_extract_all(text, '\S+')) AS n_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_subtokens
FROM documents
""",
        "text_quality": r"""
SELECT doc_id, length(text) AS n_chars_q,
       len(regexp_extract_all(text, '\S+')) AS n_tokens,
       len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
       len(regexp_extract_all(text, '[0-9]')) AS n_digits,
       len(regexp_extract_all(lower(text), '""" + LANG_STOPWORDS[0][1] + r"""')) AS n_stopwords,
       CAST(len(regexp_extract_all(text, '\S+')) >= 5
            AND length(text) >= 30
            AND len(regexp_extract_all(text, '[0-9]')) * 4 <= length(text)
            AND len(regexp_extract_all(lower(text), '""" + LANG_STOPWORDS[0][1] + r"""')) * 50
                >= len(regexp_extract_all(text, '\S+'))
            AS INT) AS keep
FROM documents
""",
        "text_lang_id": f"""
SELECT doc_id, {lang_scores},
       {argmax} AS lang_pred
FROM documents
""",
        # mirrors fingerprints(hash_basis="md5") exactly: same tokenizer,
        # same 60-bit md5 hash (hashing.md5_hash60_sql), same polynomial
        # fold mod 2^31-1 via list_reduce (0 prepended as the init value)
        "text_fingerprint": f"""
SELECT doc_id,
       {md5_hash60_sql('text')} AS doc_fp60,
       list_reduce(
         list_prepend(0::BIGINT,
           list_transform(regexp_extract_all(lower(text), '{WORD_RE}'),
                          t -> {md5_hash60_sql('t')})),
         (a, b) -> (a * 1000003 + b) % 2147483647) AS rolling_fp
FROM documents
""",
    }
