"""Sparse TF-IDF cosine similarity join — the inverted-index pairwise
similarity pattern (Elsayed et al., "Pairwise Document Similarity in
Large Collections with MapReduce", ACL 2008; the prefix/df-filter
family of Bayardo et al. WWW'07).

The reference engine exposes set-similarity (MinHash/Jaccard) only;
this adds the weighted-vector analog a training-data pipeline uses for
fuzzy dedup and template detection: documents as TF-IDF vectors over
word bigrams, pairs above a cosine threshold found WITHOUT an
all-pairs pass by joining the posting lists term-by-term.

100 TB shape:
  * ONE token explode feeds tf; df and the corpus size re-aggregate it
    (no second scan of the corpus).
  * The pair generator is a self-join of the postings table keyed by
    TERM — both sides shuffle once on the term key and each term
    contributes df² candidate products, so the df cap (``df·max_df_den
    <= N·max_df_num``) is the scalability contract: stop-terms (the
    quadratic blowup AND the least informative signal) never enter the
    join.  This is the standard df-cut of the MapReduce similarity
    literature.
  * The shuffle carries (term, id, weight) — 8-byte ids and one double,
    never texts (the ids-only contract of the LSH joins).
  * dot products aggregate map-side on (id_a, id_b); norms re-attach
    by id afterwards.

Cross-engine determinism (the repo contract): per-term weights and
products are 6dp-rounded then DECIMAL(28,6)-summed — exact decimal
addition is order-independent, so Spark's shuffle order and DuckDB's
scan order cannot diverge (the zipf_fit_stats idiom); ln() last-ulp
noise is absorbed by rounding the weight itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(28,6)"


def tfidf_cosine_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    threshold: float = 0.3,
    max_df_num: int = 1,
    max_df_den: int = 20,
) -> DataFrame:
    """Pairs (id_a < id_b, cosine) with TF-IDF-bigram cosine >=
    ``threshold``; terms with ``df·max_df_den > N·max_df_num`` are
    pruned from the vectors (integer-exact df cut).

    Weight = round(n_t · ln(N/df), 6); every downstream sum is the
    6dp-quantize → DECIMAL(28,6) fold, so the result is bit-stable
    under any execution order."""
    from .training_ops import _words, exploded_word_bigrams

    toks = docs.select(
        F.col(id_col).alias("__id"),
        _words(F.lower(F.col(text_col))).alias("__t"))
    grams = exploded_word_bigrams(
        toks, F.col("__t"), keep=("__id",)).select(
        "__id", F.col("__g").alias("__term"))
    tf = grams.groupBy("__id", "__term").agg(
        F.count(F.lit(1)).alias("__n_t"))
    df_t = tf.groupBy("__term").agg(F.count(F.lit(1)).alias("__df"))
    # corpus size stays INSIDE the job (broadcast 1-row aggregate) — a
    # driver-side count would re-scan the fact table to build the plan
    n_docs = F.broadcast(docs.agg(F.count(F.lit(1)).alias("__n_docs")))
    postings = (
        tf.join(df_t, on="__term")
        .crossJoin(n_docs)
        .where(F.col("__df") * F.lit(int(max_df_den))
               <= F.col("__n_docs") * F.lit(int(max_df_num)))
        .select(
            "__id", "__term",
            F.round(
                F.col("__n_t").cast("double")
                * F.log(F.col("__n_docs").cast("double")
                        / F.col("__df").cast("double")),
                6,
            ).alias("__w"),
        )
    )
    norms = postings.groupBy("__id").agg(
        F.sqrt(
            F.sum(F.round(F.col("__w") * F.col("__w"), 6).cast(_DEC))
            .cast("double")
        ).alias("__norm"))
    a, b = postings.alias("a"), postings.alias("b")
    dots = (
        a.join(b, on="__term")
        .where(F.col("a.__id") < F.col("b.__id"))
        .groupBy(
            F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .agg(
            F.sum(
                F.round(F.col("a.__w") * F.col("b.__w"), 6).cast(_DEC)
            ).cast("double").alias("__dot"))
    )
    den = F.col("na.__norm") * F.col("nb.__norm")
    return (
        dots.join(norms.alias("na"),
                  F.col("id_a") == F.col("na.__id"))
        .join(norms.alias("nb"), F.col("id_b") == F.col("nb.__id"))
        # den > 0 whenever a pair exists (a shared posting has w > 0 for
        # any df cut below N); the guard keeps ANSI mode from raising on
        # degenerate parameterizations — CASE twin in the oracle
        .withColumn(
            "cosine",
            F.when(den != 0, F.round(F.col("__dot") / den, 6)))
        .where(F.col("cosine") >= F.lit(float(threshold)))
        .select("id_a", "id_b", "cosine")
    )


def tfidf_cosine_oracle_sql(
    threshold: float = 0.3,
    max_df_num: int = 1,
    max_df_den: int = 20,
    source: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin: same tokenizer (string_split_regex + empty filter,
    the repo contract), same bigram grid, same df cut, same 6dp →
    DECIMAL(28,6) folds, same literal cosine op order."""
    return f"""
WITH toks AS (
  SELECT {id_col} AS id,
         list_filter(string_split_regex(lower({text_col}),
                                        '[ \t\n\x0b\f\r]+'),
                     t -> t != '') AS w
  FROM {source}
),
bg AS (
  SELECT id, unnest(generate_series(1, len(w) - 1)) AS i, w FROM toks
),
grams AS (SELECT id, w[i] || ' ' || w[i + 1] AS term FROM bg),
tf AS (SELECT id, term, count(*)::BIGINT AS n_t FROM grams GROUP BY 1, 2),
df_t AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
n AS (SELECT count(*)::BIGINT AS n_docs FROM {source}),
p AS (
  SELECT tf.id, tf.term,
         round(CAST(tf.n_t AS DOUBLE)
               * ln(CAST((SELECT n_docs FROM n) AS DOUBLE)
                    / CAST(df_t.df AS DOUBLE)), 6) AS w
  FROM tf JOIN df_t USING (term)
  WHERE df_t.df * {int(max_df_den)}
        <= (SELECT n_docs FROM n) * {int(max_df_num)}
),
nrm AS (
  SELECT id,
         sqrt(CAST(sum(CAST(round(w * w, 6) AS DECIMAL(28,6)))
                   AS DOUBLE)) AS nn
  FROM p GROUP BY 1
),
dots AS (
  SELECT a.id AS id_a, b.id AS id_b,
         CAST(sum(CAST(round(a.w * b.w, 6) AS DECIMAL(28,6)))
              AS DOUBLE) AS dot
  FROM p a JOIN p b USING (term)
  WHERE a.id < b.id
  GROUP BY 1, 2
),
cs AS (
  SELECT id_a, id_b,
         CASE WHEN na.nn * nb.nn != 0
              THEN round(dot / (na.nn * nb.nn), 6) END AS cosine
  FROM dots
  JOIN nrm na ON na.id = dots.id_a
  JOIN nrm nb ON nb.id = dots.id_b
)
SELECT id_a, id_b, cosine FROM cs WHERE cosine >= {float(threshold)}
"""
