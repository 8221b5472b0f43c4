"""Text-analysis functions for transcript/document corpora.

All hot-path expressions are built-in Spark SQL (JVM, whole-stage codegen)
— no Python UDFs.  Each builder has a DuckDB-SQL twin (``*_SQL``) used by
the driver-contract oracles, kept adjacent so the two dialects stay in
lockstep.  Portable hashing uses md5 (identical hex in Spark and DuckDB);
see functions/hashing.py.

Operators covered: language-ID (stopword-hit heuristic), quality scoring
(length/punct/stopword ratios), token counting (whitespace + BPE-ish
regex), document fingerprinting (normalized md5 + prefix fingerprint).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- language

LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por", "con", "para"],
    "fr": ["le", "les", "des", "une", "est", "dans", "pour", "qui", "sur", "avec"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"],
}
CJK_RANGE = "[一-鿿]"


def _stopword_pattern(lang: str) -> str:
    return r"\b(" + "|".join(LANG_STOPWORDS[lang]) + r")\b"


def lang_hit_counts(text: Column) -> dict[str, Column]:
    low = F.lower(text)
    out = {
        lang: F.size(F.regexp_extract_all(low, F.lit(_stopword_pattern(lang)), 0))
        for lang in LANG_STOPWORDS
    }
    out["zh"] = F.size(F.regexp_extract_all(low, F.lit(CJK_RANGE), 0))
    return out


def predicted_lang(text: Column) -> Column:
    """argmax of stopword hits, ties broken in fixed order en>es>fr>de>zh,
    'und' (undetermined) when nothing hits."""
    c = lang_hit_counts(text)
    best = F.greatest(*c.values())
    expr = F.lit("und")
    for lang in ["zh", "de", "fr", "es", "en"]:  # reverse priority
        expr = F.when((c[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def predicted_lang_sql(col: str = "text") -> str:
    """DuckDB twin of predicted_lang."""
    hits = {
        lang: f"len(regexp_extract_all(lower({col}), '{_stopword_pattern(lang)}'))"
        for lang in LANG_STOPWORDS
    }
    hits["zh"] = f"len(regexp_extract_all(lower({col}), '{CJK_RANGE}'))"
    best = "greatest(" + ", ".join(hits.values()) + ")"
    expr = "'und'"
    for lang in ["zh", "de", "fr", "es", "en"]:
        expr = (
            f"CASE WHEN {hits[lang]} = {best} AND {best} > 0 "
            f"THEN '{lang}' ELSE {expr} END"
        )
    return expr


# ----------------------------------------------------------------- quality

WS = r"\s+"
PUNCT = r"[^\w\s]"
BPE_ISH = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def ws_token_count(text: Column) -> Column:
    return F.size(F.split(F.trim(text), WS))


def bpe_ish_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_ISH), 0))


def quality_features(text: Column) -> dict[str, Column]:
    n_chars = F.length(text)
    n_words = ws_token_count(text)
    n_punct = F.size(F.regexp_extract_all(text, F.lit(PUNCT), 0))
    n_stop = F.size(
        F.regexp_extract_all(F.lower(text), F.lit(_stopword_pattern("en")), 0)
    )
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(n_stop / F.greatest(n_words, F.lit(1)), 6)
    score = F.round(
        0.4 * F.least(F.lit(1.0), n_words / F.lit(100.0))
        + 0.3 * (1.0 - punct_ratio)
        + 0.3 * F.least(F.lit(1.0), 4.0 * stop_ratio),
        4,
    )
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "n_punct": n_punct,
        "n_stopwords": n_stop,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "quality_score": score,
    }


def quality_features_sql(col: str = "text") -> dict[str, str]:
    n_chars = f"length({col})"
    n_words = f"len(regexp_split_to_array(trim({col}), '{WS}'))"
    n_punct = f"len(regexp_extract_all({col}, '{PUNCT}'))"
    n_stop = (
        f"len(regexp_extract_all(lower({col}), '{_stopword_pattern('en')}'))"
    )
    punct_ratio = f"round({n_punct} / greatest({n_chars}, 1), 6)"
    stop_ratio = f"round({n_stop} / greatest({n_words}, 1), 6)"
    score = (
        f"round(0.4 * least(1.0, {n_words} / 100.0)"
        f" + 0.3 * (1.0 - {punct_ratio})"
        f" + 0.3 * least(1.0, 4.0 * {stop_ratio}), 4)"
    )
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "n_punct": n_punct,
        "n_stopwords": n_stop,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "quality_score": score,
    }


# ------------------------------------------------------------- fingerprint

def normalized_text(text: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(text), WS, " "))


def fingerprint(text: Column) -> Column:
    return F.md5(normalized_text(text))


def prefix_fingerprint(text: Column, n: int = 64) -> Column:
    return F.md5(F.substring(normalized_text(text), 1, n))


NORMALIZED_SQL = "trim(regexp_replace(lower({col}), '\\s+', ' ', 'g'))"


def fingerprint_sql(col: str = "text") -> str:
    return f"md5({NORMALIZED_SQL.format(col=col)})"


def prefix_fingerprint_sql(col: str = "text", n: int = 64) -> str:
    return f"md5(substr({NORMALIZED_SQL.format(col=col)}, 1, {n}))"


# --------------------------------------------------------------------- PII

# deliberately simple, auditable patterns (the production point is the
# Spark shape: JVM regex, no UDF; swap patterns per policy)
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+?\d[\d -]{7,}\d"
PII_IPV4 = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"


def pii_features(text: Column) -> dict[str, Column]:
    """PII detection counts + a redacted text column (emails, phone-like
    digit runs, IPv4) — the pre-training scrub pass.  All JVM regex.

    Each pattern is counted on the PROGRESSIVELY-redacted text, in the
    same order the replacements run (EMAIL → IP → PHONE), so every count
    equals the number of replacements actually made — a long digit run
    inside an already-redacted email no longer double-counts as a phone
    (ADVICE round-4).  NULL text is treated as '' so the counts are 0,
    never -1/NULL, in both engines."""
    t0 = F.coalesce(text, F.lit(""))
    n_email = F.size(F.regexp_extract_all(t0, F.lit(PII_EMAIL), 0))
    red1 = F.regexp_replace(t0, PII_EMAIL, "<EMAIL>")
    n_ip = F.size(F.regexp_extract_all(red1, F.lit(PII_IPV4), 0))
    red2 = F.regexp_replace(red1, PII_IPV4, "<IP>")
    n_phone = F.size(F.regexp_extract_all(red2, F.lit(PII_PHONE), 0))
    red3 = F.regexp_replace(red2, PII_PHONE, "<PHONE>")
    return {
        "n_emails": n_email,
        "n_phones": n_phone,
        "n_ips": n_ip,
        "redacted_text": red3,
    }


def pii_features_sql(col: str = "text") -> dict[str, str]:
    """DuckDB twins of ``pii_features`` — same progressive-redaction
    counting order (EMAIL → IP → PHONE) and NULL-as-'' coalesce."""
    t0 = f"coalesce({col}, '')"
    red1 = f"regexp_replace({t0}, '{PII_EMAIL}', '<EMAIL>', 'g')"
    red2 = f"regexp_replace({red1}, '{PII_IPV4}', '<IP>', 'g')"
    red3 = f"regexp_replace({red2}, '{PII_PHONE}', '<PHONE>', 'g')"
    return {
        "n_emails": f"len(regexp_extract_all({t0}, '{PII_EMAIL}'))",
        "n_phones": f"len(regexp_extract_all({red2}, '{PII_PHONE}'))",
        "n_ips": f"len(regexp_extract_all({red1}, '{PII_IPV4}'))",
        "redacted_text": red3,
    }


# ---------------------------------------------------------------- shingles

def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (JVM-side).

    Built with ``zip_with`` over shifted slices of the word array so the
    per-element lambdas never reference the split array itself.  The old
    form (``transform(sequence(...), i -> slice(w, i, n))``) evaluated
    ``w`` INSIDE the lambda: after Catalyst collapses projections, the
    full ``split(lower(trim(text)))`` re-ran per shingle — O(words²)
    per document, ~40µs/shingle measured vs ~0.2µs for this shape (the
    round-4 dedup bench numbers were masking it behind a leaked cache).
    Here the word array appears only as a HOF *argument*, evaluated once
    per row, and ``concat`` propagates the zip's tail NULLs so the final
    ``filter`` trims incomplete shingles."""
    w = F.split(F.lower(F.trim(text)), WS)
    z = w
    for j in range(1, n):
        z = F.zip_with(
            z,
            F.slice(w, j + 1, F.size(w)),
            lambda x, y: F.concat(x, F.lit(" "), y),
        )
    full = F.array_distinct(F.filter(z, lambda s: s.isNotNull()))
    return F.when(F.size(w) >= n, full).otherwise(
        F.array_distinct(F.array(F.concat_ws(" ", w)))
    )


def repetition_stats(text: Column, n: int = 3) -> dict[str, Column]:
    """Within-document repetition signals (the Gopher-family quality
    rule "fraction of duplicated n-grams"): total word n-gram slots vs
    distinct n-grams; a low distinct/total ratio marks boilerplate /
    looping text.  All JVM builtins."""
    w = F.split(F.lower(F.trim(text)), WS)
    total = F.greatest(F.lit(1), F.size(w) - F.lit(n - 1))
    distinct = F.size(word_shingles(text, n))
    return {
        "ngrams_total": total.cast("int"),
        "ngrams_distinct": distinct.cast("int"),
        "dup_ngram_frac": F.round(
            F.lit(1.0) - distinct.cast("double") / total.cast("double"), 6
        ),
    }


def repetition_stats_sql(col: str = "text", n: int = 3) -> dict[str, str]:
    """DuckDB twins of ``repetition_stats``."""
    w = f"regexp_split_to_array(lower(trim({col})), '{WS}')"
    total = f"greatest(1, len({w}) - {n - 1})"
    distinct = f"len({word_shingles_sql(col, n)})"
    return {
        "ngrams_total": f"CAST({total} AS INTEGER)",
        "ngrams_distinct": f"CAST({distinct} AS INTEGER)",
        "dup_ngram_frac": (
            f"round(1.0 - CAST({distinct} AS DOUBLE) / {total}, 6)"
        ),
    }


def word_shingles_sql(col: str = "text", n: int = 3) -> str:
    """DuckDB twin (1-based end-inclusive list slicing)."""
    w = f"regexp_split_to_array(lower(trim({col})), '{WS}')"
    return (
        f"CASE WHEN len({w}) >= {n} THEN "
        f"list_distinct(list_transform(generate_series(1, len({w}) - {n - 1}), "
        f"i -> array_to_string(({w})[i:i+{n - 1}], ' '))) "
        f"ELSE list_distinct([array_to_string({w}, ' ')]) END"
    )


# ------------------------------------------------------------ char-level BPE
#
# A REAL BPE tokenizer (round 6): fixed public-style merge table applied
# in rank order over a character sequence — the actual iterative-merge
# algorithm (Sennrich et al. 2016 / the GPT-2 byte-level scheme with a
# Ġ space marker), not a regex approximation.  Whitespace token counts
# misprice code/CJK by 2-5×; BPE counts are the currency token-budget
# packing actually needs.
#
# Execution shape: everything stays JVM-side / whole-stage-codegen — the
# char split is ONE global regexp_replace and each merge is ONE literal
# `replace`.  Literal replace is non-overlapping left-to-right in Spark,
# DuckDB, and Python alike, which is exactly BPE's greedy
# leftmost-first application of a single merge rule, so the DuckDB
# oracle replays the identical algorithm with the identical builtins.
#
# Token rendering: every token is wrapped in U+241F delimiters and
# neighbours abut — "␟a␟␟b␟␟c␟".  A merge (a, b) is the literal replace
# "␟a␟␟b␟" → "␟ab␟", which anchors BOTH operands to full-token
# boundaries: `a` must be preceded by "␟" (no suffix-of-longer-token
# match) and `b` must be followed by "␟" (no prefix-of-longer-token
# match — a space-prefixed rendering gets this wrong: " Ġ in" matches
# inside " Ġ ing" and fuses Ġ+ing, which classic BPE never does).  The
# replacement re-emits one leading and one trailing "␟", so the
# double-delimiter structure is preserved and consecutive pair
# occurrences ([a,b,a,b]) all merge in one pass.  Final count = #␟ / 2.
#
# Merge-table invariants (checked by ``_bpe_merges_checked`` + tests):
# each operand is a single character or the output of an EARLIER merge,
# and merge outputs are pairwise distinct.  Together these make
# "apply rules in rank order, each to fixpoint" equivalent to classic
# lowest-rank-pair-first BPE: a rule's replacement can never create an
# operand of an earlier rule (that operand would have to be the output
# of two different rules), so earlier rules never regain work.  One
# replace pass per rule reaches that rule's fixpoint because replacing
# (a, b) consumes both operands and only mints token "ab" ≠ a, b.
# A hypothesis test cross-checks the rendering against an independent
# classic BPE (iterate: merge the lowest-rank adjacent pair).

SPACE_MARK = "Ġ"  # GPT-2's space marker: survives the char split as one char
TOK_DELIM = "␟"  # ␟ — wraps every token; stripped from input first

BPE_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("i", "n"), ("e", "r"), ("a", "n"), ("r", "e"),
    ("o", "n"), ("e", "n"), ("a", "t"), ("o", "r"), ("e", "s"),
    ("s", "t"), ("a", "r"), ("o", "u"), ("n", "d"), ("i", "t"),
    ("a", "l"), ("l", "e"), ("i", "s"), ("th", "e"), ("in", "g"),
    ("Ġ", "t"), ("Ġ", "a"), ("Ġ", "s"), ("Ġ", "w"), ("Ġ", "o"),
    ("Ġ", "b"), ("Ġ", "c"), ("Ġ", "f"), ("Ġ", "m"), ("Ġ", "p"),
    ("Ġ", "d"), ("Ġ", "h"), ("Ġ", "the"), ("e", "d"), ("e", "a"),
    ("t", "o"), ("i", "c"), ("Ġa", "nd"), ("Ġt", "o"), ("Ġ", "in"),
    ("er", "s"), ("ou", "t"), ("0", "0"), ("1", "0"), ("2", "0"),
    ("es", "t"), ("i", "on"), ("at", "ion"), ("a", "s"), ("Ġw", "as"),
]


def _bpe_merges_checked() -> list[tuple[str, str]]:
    """Validate the merge-table invariants once (tests call this too)."""
    made: set[str] = set()
    for a, b in BPE_MERGES:
        for op in (a, b):
            if len(op) > 1 and op not in made:
                raise ValueError(
                    f"merge operand {op!r} is neither a char nor a "
                    "previous merge output"
                )
        if a + b in made:
            raise ValueError(f"duplicate merge output {a + b!r}")
        made.add(a + b)
    return BPE_MERGES


_MERGE_ORDER_OK = bool(_bpe_merges_checked())


def bpe_tokens_rendered(text: Column) -> Column:
    """The ␟-wrapped token rendering after all merges (JVM-only)."""
    d = TOK_DELIM
    s = F.replace(F.lower(text), F.lit(d), F.lit(""))
    s = F.replace(s, F.lit(" "), F.lit(SPACE_MARK))
    s = F.regexp_replace(s, "(?s)(.)", f"{d}$1{d}")
    for a, b in BPE_MERGES:
        s = F.replace(s, F.lit(f"{d}{a}{d}{d}{b}{d}"), F.lit(f"{d}{a}{b}{d}"))
    return s


def bpe_token_count(text: Column) -> Column:
    """Exact BPE token count: every token carries exactly two ␟."""
    d = TOK_DELIM
    s = bpe_tokens_rendered(text)
    n_delim = F.length(s) - F.length(F.replace(s, F.lit(d), F.lit("")))
    return (n_delim / 2).cast("int")


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def bpe_token_count_sql(col: str = "text") -> str:
    """DuckDB twin: the same char split + merge replays, same builtins."""
    d = TOK_DELIM
    s = f"replace(lower({col}), {_sql_quote(d)}, '')"
    s = f"replace({s}, ' ', {_sql_quote(SPACE_MARK)})"
    s = f"regexp_replace({s}, '(.)', {_sql_quote(d + chr(92) + '1' + d)}, 'gs')"
    for a, b in BPE_MERGES:
        s = (
            f"replace({s}, {_sql_quote(f'{d}{a}{d}{d}{b}{d}')}, "
            f"{_sql_quote(f'{d}{a}{b}{d}')})"
        )
    return (
        f"CAST((length({s}) - length(replace({s}, {_sql_quote(d)}, ''))) "
        f"/ 2 AS INTEGER)"
    )


# ------------------------------------------------------- quality verdict

# Gopher-style document-level repetition/shape thresholds (public rules:
# Rae et al. 2021 table A1 family), applied to the signals already
# computed above.  The operator is the actual FILTER a pipeline runs —
# a per-document boolean with per-rule flags for auditability.
QUALITY_RULES = {
    "min_words": 5,
    "max_words": 100_000,
    "min_mean_word_len": 2.0,
    "max_mean_word_len": 12.0,
    "max_punct_ratio": 0.30,
    "max_dup_ngram_frac": 0.50,
}


def quality_verdict(text: Column) -> dict[str, Column]:
    """Per-rule pass flags + overall verdict (all JVM builtins)."""
    r = QUALITY_RULES
    w = F.split(F.lower(F.trim(text)), WS)
    n_words = F.size(w)
    sum_len = F.aggregate(
        F.transform(w, F.length), F.lit(0), lambda a, x: a + x
    )
    mean_wl = F.round(
        sum_len.cast("double") / F.greatest(n_words, F.lit(1)), 6
    )
    n_punct = F.size(F.regexp_extract_all(text, F.lit(PUNCT), 0))
    punct_ratio = F.round(
        n_punct / F.greatest(F.length(text), F.lit(1)), 6
    )
    dup_frac = repetition_stats(text)["dup_ngram_frac"]
    ok_words = (n_words >= r["min_words"]) & (n_words <= r["max_words"])
    ok_wl = (mean_wl >= r["min_mean_word_len"]) & (
        mean_wl <= r["max_mean_word_len"]
    )
    ok_punct = punct_ratio <= r["max_punct_ratio"]
    ok_rep = dup_frac <= r["max_dup_ngram_frac"]
    return {
        "n_words": n_words.cast("int"),
        "mean_word_len": mean_wl,
        "punct_ratio": punct_ratio,
        "dup_ngram_frac": dup_frac,
        "ok_words": ok_words,
        "ok_word_len": ok_wl,
        "ok_punct": ok_punct,
        "ok_repetition": ok_rep,
        "passes": ok_words & ok_wl & ok_punct & ok_rep,
    }


def quality_verdict_sql(col: str = "text") -> dict[str, str]:
    """DuckDB twins of ``quality_verdict``."""
    r = QUALITY_RULES
    w = f"regexp_split_to_array(lower(trim({col})), '{WS}')"
    n_words = f"len({w})"
    sum_len = f"list_sum(list_transform({w}, x -> length(x)))"
    mean_wl = (
        f"round(CAST({sum_len} AS DOUBLE) / greatest({n_words}, 1), 6)"
    )
    n_punct = f"len(regexp_extract_all({col}, '{PUNCT}'))"
    punct_ratio = f"round({n_punct} / greatest(length({col}), 1), 6)"
    dup_frac = repetition_stats_sql(col)["dup_ngram_frac"]
    ok_words = (
        f"({n_words} >= {r['min_words']} AND {n_words} <= {r['max_words']})"
    )
    ok_wl = (
        f"({mean_wl} >= {r['min_mean_word_len']} "
        f"AND {mean_wl} <= {r['max_mean_word_len']})"
    )
    ok_punct = f"({punct_ratio} <= {r['max_punct_ratio']})"
    ok_rep = f"({dup_frac} <= {r['max_dup_ngram_frac']})"
    return {
        "n_words": f"CAST({n_words} AS INTEGER)",
        "mean_word_len": mean_wl,
        "punct_ratio": punct_ratio,
        "dup_ngram_frac": dup_frac,
        "ok_words": ok_words,
        "ok_word_len": ok_wl,
        "ok_punct": ok_punct,
        "ok_repetition": ok_rep,
        "passes": f"({ok_words} AND {ok_wl} AND {ok_punct} AND {ok_rep})",
    }
