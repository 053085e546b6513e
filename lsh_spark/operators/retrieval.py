"""BM25 full-text retrieval — the lexical ranking stage of a RAG /
eval-retrieval pipeline (Robertson-Sparck-Jones BM25 with the Lucene
``ln(1 + (N-df+0.5)/(df+0.5))`` idf, so scores are always positive).

Engine-parity rules (the repo contract): tf/df/dl/N are exact integer
aggregates; every double expression is written in one literal op order
mirrored by the DuckDB oracle; the per-document score folds
left-to-right over the document's matched query terms SORTED by term
(``F.aggregate`` / ``list_reduce`` — the ``unigram_logprob_scores``
recipe), and the terminal 6-dp round happens BEFORE ranking with ties
broken on ids.

100 TB design: one explode feeds the postings aggregate (the shuffle
carries (doc_id, term) pairs, never text); postings are pruned to the
query vocabulary FIRST via a broadcast of the by-construction-tiny
query-term set, so df, the score join and the fold all run over the
matched subset only; corpus stats (N, total length) are one
map-side-combined aggregate broadcast as a single row.  A standing
deployment would persist the postings + doc-length tables once
(bucketed by term / id) and reuse them across query batches — the
on-the-fly form here keeps the gate oracle exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.cache import track
from .training_ops import _words


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k BM25 documents per query: (query_id, doc_id, score, rank).

    ``score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·((1-b) + b·dl/avgdl))``
    over the query's DISTINCT terms present in the doc, folded in term
    order; ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``."""
    from pyspark import StorageLevel

    toks = (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.explode(_words(F.col(text_col))).alias("__term"))
        .groupBy("doc_id", "__term")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    dl = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(_words(F.col(text_col))).cast("long").alias("__dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("__n_docs"),
                   F.sum("__dl").alias("__total"))
    qt = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.array_distinct(_words(F.col(query_text_col))))
        .alias("__term"))
    # postings pruned to the query vocabulary; persisted because two
    # branches (the df aggregate and the scoring join) consume it and
    # the explode+agg lineage is the expensive part
    post = track(
        toks.join(F.broadcast(qt.select("__term").distinct()), "__term")
        .persist(StorageLevel.MEMORY_AND_DISK))
    dfreq = post.groupBy("__term").agg(F.count(F.lit(1)).alias("__df"))
    avgdl = F.col("__total").cast("double") / F.col("__n_docs").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n_docs").cast("double") - F.col("__df").cast("double")
           + F.lit(0.5))
        / (F.col("__df").cast("double") + F.lit(0.5)))
    tfn = (
        F.col("__tf").cast("double") * F.lit(k1 + 1.0)
    ) / (
        F.col("__tf").cast("double")
        + F.lit(k1) * (F.lit(1.0 - b)
                       + F.lit(b) * (F.col("__dl").cast("double") / avgdl))
    )
    terms = (
        post.join(F.broadcast(qt), "__term")
        .join(F.broadcast(dfreq), "__term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("query_id", "doc_id",
                F.struct(F.col("__term"), (idf * tfn).alias("__s"))
                .alias("__ts"))
    )
    scored = (
        terms.groupBy("query_id", "doc_id")
        .agg(F.sort_array(F.collect_list("__ts")).alias("__arr"))
        .select(
            "query_id", "doc_id",
            F.round(F.aggregate(F.col("__arr"), F.lit(0.0),
                                lambda a, x: a + x["__s"]), 6)
            .alias("score"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def bm25_oracle_sql(queries_values: str, *, k: int = 10, k1: float = 1.2,
                    b: float = 0.75, source: str = "documents") -> str:
    """DuckDB replay of ``bm25_topk`` over ``source``;
    ``queries_values`` is a SQL VALUES list ``(id, 'text'), ...``."""
    return rf"""
WITH q AS (SELECT * FROM (VALUES {queries_values}) q(query_id, query_text)),
qt AS (
  SELECT query_id,
         unnest(list_distinct(list_filter(
             string_split_regex(query_text, '[ \t\n\x0b\f\r]+'),
             t -> t != ''))) AS term
  FROM q
),
toks AS (
  SELECT doc_id, t AS term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id,
               unnest(list_filter(string_split_regex(text,
                                  '[ \t\n\x0b\f\r]+'),
                      t -> t != '')) AS t
        FROM {source})
  GROUP BY doc_id, t
),
dl AS (
  SELECT doc_id,
         len(coalesce(list_filter(string_split_regex(text,
                                  '[ \t\n\x0b\f\r]+'),
                 t -> t != ''), []))::BIGINT AS dl
  FROM {source}
),
stats AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS total
          FROM dl),
post AS (
  SELECT t.doc_id, t.term, t.tf FROM toks t
  JOIN (SELECT DISTINCT term FROM qt) v USING (term)
),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM post GROUP BY term),
terms AS (
  SELECT qt.query_id, p.doc_id, p.term,
         ln(1.0 + (s.n_docs::DOUBLE - f.df::DOUBLE + 0.5)
                  / (f.df::DOUBLE + 0.5))
         * ((p.tf::DOUBLE * {k1 + 1.0})
            / (p.tf::DOUBLE
               + {k1} * ({1.0 - b}
                         + {b} * (d.dl::DOUBLE
                                  / (s.total::DOUBLE
                                     / s.n_docs::DOUBLE))))) AS contrib
  FROM post p
  JOIN qt ON qt.term = p.term
  JOIN dfreq f ON f.term = p.term
  JOIN dl d ON d.doc_id = p.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT query_id, doc_id,
         round(list_reduce(list_prepend(0.0::DOUBLE,
                                        list(contrib ORDER BY term)),
                           (a, x) -> a + x), 6) AS score
  FROM terms GROUP BY query_id, doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT query_id, doc_id, score, rank FROM ranked WHERE rank <= {k}
"""
