"""Text analytics operators: tokenization, quality signals, language ID,
fingerprints — all built-in Spark column expressions (JVM-side, codegen'd).

These are the corpus-profiling operations a training-data pipeline runs after
extraction (C4/Gopher-style quality filtering, language routing, token
budgeting). Each builder returns Columns usable on any DataFrame with a text
column (the extracted table, the driver's ``documents`` table, …).

Portability note: the arithmetic shapes here (regex-split token counts,
replace-length stopword counting) are chosen so an independent ANSI-SQL
oracle computes bit-identical values — see webextract.queries for the
DuckDB-checked forms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# ---------------------------------------------------------------------------
# tokenization
# ---------------------------------------------------------------------------


def token_count(col: Column | str) -> Column:
    """Whitespace-run token count; 0 for empty/blank text."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def stopword_hits(col: Column | str, word: str) -> Column:
    """Occurrences of ``word`` as a space-delimited token (lowercased).

    replace-length arithmetic: leftmost non-overlapping, exact integers.
    """
    c = F.col(col) if isinstance(col, str) else col
    pad = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    pat = f" {word} "
    return ((F.length(pad) - F.length(F.replace(pad, F.lit(pat), F.lit(""))))
            / F.lit(len(pat))).cast("long")


def stopword_hits_any(col: Column | str, words: list[str]) -> Column:
    out = stopword_hits(col, words[0])
    for w in words[1:]:
        out = out + stopword_hits(col, w)
    return out


# ---------------------------------------------------------------------------
# quality signals
# ---------------------------------------------------------------------------

EN_STOPWORDS = ["the", "and", "of", "to", "in"]


def quality_columns(text_col: str = "text",
                    stopwords: list[str] | None = None) -> list[Column]:
    """The standard quality-signal projection for a text table."""
    sw = stopwords or EN_STOPWORDS
    ntok = token_count(text_col)
    hits = stopword_hits_any(text_col, sw)
    c = F.col(text_col)
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    return [
        F.length(c).alias("n_chars_measured"),
        ntok.alias("n_tokens"),
        hits.alias("stopword_hits"),
        F.round(F.when(ntok == 0, F.lit(0.0)).otherwise(hits / ntok.cast("double")), 6)
            .cast("double").alias("stopword_ratio"),
        F.round(F.when(F.length(c) == 0, F.lit(0.0))
                 .otherwise(alpha / F.length(c).cast("double")), 6)
            .cast("double").alias("alpha_ratio"),
        F.round(F.when(ntok == 0, F.lit(0.0))
                 .otherwise(F.length(c).cast("double") / ntok.cast("double")), 6)
            .cast("double").alias("mean_token_len"),
    ]


def quality_df(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    return df.select(id_col, *quality_columns(text_col))


# ---------------------------------------------------------------------------
# language identification (stopword-profile heuristic)
# ---------------------------------------------------------------------------

LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "les", "des", "est", "une"],
}


def langid_columns(text_col: str = "text") -> tuple[list[Column], Column]:
    """(per-language hit columns, predicted-language column).

    Deterministic argmax with fixed tie-break order en > es > de > fr.
    """
    hit_cols = [
        stopword_hits_any(text_col, ws).alias(f"hits_{lg}")
        for lg, ws in LANG_STOPWORDS.items()
    ]
    h = {lg: F.col(f"hits_{lg}") for lg in LANG_STOPWORDS}
    pred = (
        F.when(h["en"] + h["es"] + h["de"] + h["fr"] == 0, F.lit("unknown"))
        .when((h["en"] >= h["es"]) & (h["en"] >= h["de"]) & (h["en"] >= h["fr"]), F.lit("en"))
        .when((h["es"] >= h["de"]) & (h["es"] >= h["fr"]), F.lit("es"))
        .when(h["de"] >= h["fr"], F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return hit_cols, pred


def langid_df(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    hit_cols, pred = langid_columns(text_col)
    return df.select(id_col, *hit_cols).withColumn("predicted_lang", pred) \
             .select(id_col, "predicted_lang")


# ---------------------------------------------------------------------------
# tokenization, BPE-ish
# ---------------------------------------------------------------------------

# GPT-2-style coarse token classes: letter runs, digit runs, single
# punctuation marks. Deliberately regex-engine-portable (no \w, no unicode
# classes) so Java regex (Spark) and RE2-ish (DuckDB) agree byte-for-byte.
BPEISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]"


def bpeish_token_count(col: Column | str = "text") -> Column:
    """Sub-word-ish token count: the unit LLM token budgeting actually wants
    (whitespace tokens undercount punctuation-heavy / code-like text)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPEISH_PATTERN), F.lit(0)))


# ---------------------------------------------------------------------------
# fingerprinting
# ---------------------------------------------------------------------------


def fingerprint(col: Column | str = "text") -> Column:
    """64-bit content fingerprint of whitespace-normalized lowercased text.

    The exact-dedup key at scale: group/join on this instead of shuffling
    full documents.
    """
    c = F.col(col) if isinstance(col, str) else col
    norm = F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))
    return F.xxhash64(norm)


def winnow_fingerprints(df: DataFrame, *, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 3,
                        window: int = 4,
                        hash_fn: str = "xxhash64") -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm): hash every token k-gram, slide a window of ``window``
    consecutive hashes, keep each window's minimum, dedupe.

    Guarantees: any shared run of ``window + k - 1`` tokens between two docs
    yields at least one shared fingerprint — a position-robust partial-
    overlap detector (plagiarism/quote/mirror detection), complementing
    MinHash's whole-document similarity. (The classical presentation rolls a
    Karp-Rabin hash for CPU reasons; hashing each k-gram directly is
    fingerprint-equivalent, and here the hash is a single codegen'd
    expression — there is no per-character Python loop to optimize away.)

    Entirely JVM-side: one projection with nested array expressions, one
    explode; output (id, fp) pairs ready for a self-join on fp.
    ``hash_fn="md5_60"`` gives the DuckDB-reproducible variant (see
    webextract.dedup.HASH_FNS).
    """
    from .dedup import HASH_FNS

    if hash_fn == "xxhash64":
        hash_tpl = "xxhash64({G})"
    elif hash_fn == "md5_60":
        hash_tpl = "CAST(conv(substring(md5({G}), 1, 15), 16, 10) AS BIGINT)"
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}; have {list(HASH_FNS)}")
    parts = ", ".join(f"t[i + {j}]" for j in range(k))
    gram_hash = hash_tpl.format(G=f"concat_ws(chr(95), {parts})")
    grams_h = f"transform(sequence(0, size(t) - {k}), i -> {gram_hash})"
    fps = (f"array_distinct(transform(sequence(0, size(h) - {window}), "
           f"j -> array_min(slice(h, j + 1, {window}))))")
    toks = (
        df.filter(F.length(F.trim(text_col)) > 0)
        .select(F.col(id_col), F.split(F.trim(text_col), r"\s+").alias("t"))
        .filter(F.size("t") >= k + window - 1)
    )
    return (
        toks.select(id_col, F.expr(grams_h).alias("h"))
        .select(id_col, F.explode(F.expr(fps)).alias("fp"))
    )


# ---------------------------------------------------------------------------
# Gopher/C4-style quality FILTER (the decision, not just the signals)
# ---------------------------------------------------------------------------


def quality_filter_columns(text_col: str = "text", *,
                           min_tokens: int = 5, max_tokens: int = 100_000,
                           min_mwl: int = 2, max_mwl: int = 12,
                           stop_ratio_denom: int = 50,
                           stopwords: list[str] | None = None
                           ) -> tuple[Column, Column, Column, Column]:
    """(n_tokens, n_nonspace_chars, stopword_hits, keep) — the Gopher-rule
    document filter a training-data pipeline applies after extraction:

    - token count within [min_tokens, max_tokens];
    - mean word length (non-space chars / tokens) within [min_mwl, max_mwl];
    - stopword ratio >= 1/stop_ratio_denom (gibberish/listing guard).

    Every threshold is evaluated with INTEGER cross-multiplication
    (``min_mwl * n_tokens <= n_nonspace`` etc.), so the keep decision is
    exact — no float boundary can flip between engines or partial-agg
    orders. All codegen'd column arithmetic; zero Python.
    """
    sw = stopwords or EN_STOPWORDS
    ntok = token_count(text_col).cast("long")
    nchar = F.length(F.regexp_replace(F.col(text_col), r"\s+", "")).cast("long")
    hits = stopword_hits_any(F.col(text_col), sw)
    keep = (
        (ntok >= min_tokens) & (ntok <= max_tokens)
        & (F.lit(min_mwl) * ntok <= nchar) & (nchar <= F.lit(max_mwl) * ntok)
        & (hits * stop_ratio_denom >= ntok)
    )
    return ntok, nchar, hits, keep.cast("int")
