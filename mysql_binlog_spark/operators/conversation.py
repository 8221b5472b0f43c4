"""Conversation-level analytics over the applied transcript state.

The CDC pipeline's output is a (conv_id, turn_idx)-keyed transcripts
table (the north rule's final table state); these operators answer the
questions a transcript consumer actually asks of it: render each
conversation back into ordered text, summarize tool-invocation chains,
and measure inter-turn latency.

100 TB shape: every operator here is ONE conversation-key exchange with
map-side partial aggregation — `collect_list` partials merge per
partition before the shuffle, and per-group state is bounded by turns
per conversation (≤ dozens), never corpus size.  Ordering is
reconstructed with `array_sort` over (turn_idx, …) structs AFTER the
collapse rather than a global sort: sorting inside a group is O(turns
log turns) per conversation and embarrassingly parallel, a global
orderBy would be a range-partitioned full shuffle.  Latency math stays
in exact integer microseconds (`unix_micros`) until one final division,
so partial-aggregation order can never perturb the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def render_conversations(
    fs: DataFrame,
    sep: str = "\n",
    id_col: str = "conv_id",
    turn_col: str = "turn_idx",
) -> DataFrame:
    """One row per conversation: ``n_turns``, total payload ``n_chars``,
    and the turn-ordered ``role: text`` rendering — the per-turn text
    equality surface under stable turn ordering, reassembled.

    Reference parity: userqq/mysql-binlog emits one JSON line per row
    event (EventsIterator.php) and leaves reassembly to the consumer;
    here it is a first-class engine operator.
    """
    turns = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(turn_col),
                F.col("role"),
                F.coalesce(F.col("text"), F.lit("")).alias("text"),
            )
        )
    )
    return fs.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_turns"),
        F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias("n_chars"),
        F.array_join(
            F.transform(turns, lambda t: F.concat(t["role"], F.lit(": "), t["text"])),
            sep,
        ).alias("rendered"),
    )


def render_conversations_sql(rel: str = "fs", sep_expr: str = "chr(10)") -> str:
    """DuckDB twin: ordered string_agg over the same final state."""
    return f"""
    SELECT conv_id,
           COUNT(*) AS n_turns,
           CAST(SUM(LENGTH(COALESCE(text, ''))) AS BIGINT) AS n_chars,
           string_agg(role || ': ' || COALESCE(text, ''), {sep_expr}
                      ORDER BY turn_idx) AS rendered
    FROM {rel} GROUP BY conv_id
    """


def tool_chains(
    fs: DataFrame, id_col: str = "conv_id", turn_col: str = "turn_idx"
) -> DataFrame:
    """(chain, n_convs): the turn-ordered sequence of tool invocations
    per conversation (non-tool turns skipped), collapsed to a
    ``a>b>c`` signature, counted across conversations.

    Two aggregations, both bounded: the first shuffles only tool turns
    on the conversation key; the second shuffles one signature row per
    tool-using conversation.
    """
    per_conv = (
        fs.filter(F.col("tool").isNotNull())
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col(turn_col), F.col("tool")))
                    ),
                    lambda t: t["tool"],
                ),
                ">",
            ).alias("chain")
        )
    )
    return per_conv.groupBy("chain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_convs")
    )


def tool_chains_sql(rel: str = "fs") -> str:
    return f"""
    SELECT chain, COUNT(*) AS n_convs FROM (
      SELECT conv_id, string_agg(tool, '>' ORDER BY turn_idx) AS chain
      FROM {rel} WHERE tool IS NOT NULL GROUP BY conv_id
    ) GROUP BY chain
    """


def turn_latency(
    fs: DataFrame, id_col: str = "conv_id", turn_col: str = "turn_idx"
) -> DataFrame:
    """Per-role inter-turn latency: for each turn after the first, the
    gap to the previous turn's timestamp, attributed to the RESPONDING
    turn's role; aggregated as (role, n_gaps, avg_gap_s, max_gap_s).

    Exactness contract: gaps are bigint microseconds (`unix_micros`),
    summed exactly; the only floating-point ops are the final divisions
    + round(6), so the result is invariant to partial-agg merge order —
    the property a 1000-executor rerun must preserve.
    """
    w = Window.partitionBy(id_col).orderBy(turn_col)
    # ts arrives TIMESTAMP_NTZ; unix_micros needs TIMESTAMP.  The cast
    # maps wall-clock to epoch in the session zone (UTC, matching
    # DuckDB's epoch_us on naive timestamps) — and any fixed offset
    # cancels in the difference regardless.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    g = fs.select("role", gap.alias("gap_us")).filter(F.col("gap_us").isNotNull())
    return g.groupBy("role").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.round(F.sum("gap_us") / F.count(F.lit(1)) / F.lit(1000000.0), 6).alias(
            "avg_gap_s"
        ),
        F.round(F.max("gap_us") / F.lit(1000000.0), 6).alias("max_gap_s"),
    )


def turn_latency_sql(rel: str = "fs") -> str:
    """DuckDB twin: identical integer-microsecond gaps and one final
    division (epoch_us == unix_micros)."""
    return f"""
    SELECT role,
           COUNT(*) AS n_gaps,
           round(SUM(gap_us) / COUNT(*) / 1000000.0, 6) AS avg_gap_s,
           round(MAX(gap_us) / 1000000.0, 6) AS max_gap_s
    FROM (
      SELECT role,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY conv_id ORDER BY turn_idx) AS gap_us
      FROM {rel}
    ) WHERE gap_us IS NOT NULL GROUP BY role
    """


def corpus_bridge(fs: DataFrame) -> DataFrame:
    """CDC → training-corpus bridge: one candidate training document per
    conversation from the APPLIED table state — rendered text collapsed
    to the columns the curation pipeline keys on (token count, quality
    score, dedup fingerprint).  The composition the whole engine exists
    for: change stream in, curated corpus rows out.

    100 TB shape: render_conversations' single conv-key exchange, then a
    narrow projection (all JVM text builtins over the rendered column —
    no second shuffle)."""
    from ..functions.text import fingerprint, quality_features, ws_token_count

    r = render_conversations(fs)
    feats = quality_features(F.col("rendered"))
    return r.select(
        "conv_id",
        "n_turns",
        "n_chars",
        ws_token_count(F.col("rendered")).alias("n_tokens"),
        feats["quality_score"].alias("quality_score"),
        fingerprint(F.col("rendered")).alias("fp"),
    )


def corpus_bridge_sql(rel: str = "fs") -> str:
    """DuckDB twin: render twin wrapped as a derived table, identical
    token/quality/fingerprint expressions over the rendered column."""
    from ..functions.text import fingerprint_sql, quality_features_sql, WS

    render = render_conversations_sql(rel=rel)
    toks = f"len(regexp_split_to_array(trim(rendered), '{WS}'))"
    score = quality_features_sql("rendered")["quality_score"]
    return f"""
    SELECT conv_id, n_turns, n_chars,
           {toks} AS n_tokens,
           {score} AS quality_score,
           {fingerprint_sql('rendered')} AS fp
    FROM ({render}) r
    """
