"""Corpus-statistics operators: TF-IDF keywords and corpus n-gram stats.

Round-6 additions to the training-data pipeline family — the two
corpus-level operations a curation pipeline runs between quality
filtering and sampling:

* **TF-IDF top-k keywords per document** — the classic two-stage
  distributed shape: per-(doc, term) counts (one shuffle on the term
  within doc), document frequencies over the corpus (one shuffle on
  term), then a BROADCAST join of the tiny IDF vocabulary back onto the
  doc-term counts and a per-document window for top-k.  At 100 TB the
  vocabulary (distinct terms) is orders of magnitude smaller than the
  corpus, so the join never shuffles the big side.
* **Corpus top n-grams by document frequency** — explode distinct
  per-doc shingles, count, global top-k via ORDER BY + LIMIT (Spark
  plans TakeOrderedAndProject: per-partition heaps + a driver merge,
  not a global sort shuffle).

Determinism across engines: scores are rounded to 6 decimals BEFORE
ranking and ties break on the term text, so Spark and the DuckDB oracle
produce identical rank assignments even though ln() may differ in the
last ULP.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import WS, word_shingles, word_shingles_sql


def tfidf_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document.

    score = tf × (ln((N + 1) / (df + 1)) + 1), rounded to 6 decimals;
    rank by (score DESC, term ASC) within each document.  ``N`` is read
    with one bounded driver-side count (a scalar, like the Lloyd sums in
    similarity.py) so the IDF expression is a literal in the plan.
    """
    n_docs = df.count()  # bounded control read: one scalar
    words = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), WS)).alias(
            "term"
        ),
    ).filter(F.col("term") != "")
    tf = words.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    idf = (
        tf.groupBy("term")
        .agg(F.count("*").alias("df"))
        .select(
            "term",
            (F.log((n_docs + 1.0) / (F.col("df") + 1.0)) + 1.0).alias(
                "idf"
            ),
        )
    )
    scored = tf.join(F.broadcast(idf), "term").select(
        F.col(id_col),
        "term",
        "tf",
        F.round(F.col("tf") * F.col("idf"), 6).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tf", "score")
    )


def tfidf_topk_sql(k: int = 5, rel: str = "documents") -> str:
    """DuckDB twin: same smoothing, same rounding-before-ranking."""
    return f"""
    WITH words AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(lower(trim(text)), '{WS}')) AS term
      FROM {rel}
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM words
      WHERE term <> '' GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ), n AS (SELECT COUNT(*) AS n FROM {rel}),
    scored AS (
      SELECT t.doc_id, t.term, t.tf,
             round(t.tf * (ln((n.n + 1.0) / (d.df + 1.0)) + 1.0), 6)
               AS score
      FROM tf t JOIN dfreq d USING (term) CROSS JOIN n
    )
    SELECT doc_id, rank, term, tf, score FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY score DESC, term) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


def corpus_top_ngrams(
    df: DataFrame,
    n: int = 2,
    top: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Top ``top`` word n-grams by DOCUMENT frequency (each document
    contributes its distinct shingles once — the dedup-relevant count).
    Deterministic order: (df DESC, ngram ASC)."""
    grams = df.select(
        F.explode(word_shingles(F.col(text_col), n)).alias("ngram")
    )
    return (
        grams.groupBy("ngram")
        .agg(F.count("*").alias("df"))
        .orderBy(F.col("df").desc(), F.col("ngram"))
        .limit(top)
    )


def corpus_top_ngrams_sql(
    n: int = 2, top: int = 50, rel: str = "documents"
) -> str:
    return f"""
    WITH grams AS (
      SELECT unnest({word_shingles_sql('text', n)}) AS ngram FROM {rel}
    )
    SELECT ngram, COUNT(*) AS df FROM grams
    GROUP BY ngram ORDER BY df DESC, ngram LIMIT {top}
    """
