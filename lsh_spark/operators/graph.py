"""Iterative graph computation on DataFrames: fixed-iteration PageRank
with a cross-engine-exact arithmetic contract.

The repo's other iterative operator (``operators/cc.py``, min-label
connected components) converges to a fixed point where float order
never matters; PageRank's per-iteration SUM of neighbor contributions
is order-sensitive, so this implementation rides the repo's
quantize-then-decimal-sum idiom (zipf_fit_stats, tfidf_cosine_pairs):
each contribution is 6dp-rounded then DECIMAL(28,6)-summed — exact
decimal addition is order-independent, so Spark's shuffle order and
DuckDB's scan order produce identical bits, and the oracle can replay
the whole iteration as unrolled CTEs.

100 TB shape per iteration: ranks is a node-sized frame joined to the
edge table on src (the edge table partitions once on src and every
iteration reuses that layout; ranks re-shuffles, being the small side —
Catalyst broadcasts it under the threshold), contributions aggregate
map-side on dst.  For long chains the ranks frame localCheckpoints
every few iterations — the cc.py lesson: nesting one InMemoryRelation
per round makes the AQE explainString quadratic and eventually OOMs
the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(28,6)"


def pagerank_undirected(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """PageRank over an undirected graph given as DISTINCT directed
    edge rows covering both orientations (an undirected graph has no
    dangling nodes, so no leaked-mass correction is needed — the
    bipartite builder below emits both directions).

    rank₀ = round(1/N, 6); each iteration:
      contrib(e) = round(rank(src)/deg(src), 6)         — one literal div
      rank'(v)  = round((1−d)/N + d·Σ_dec contrib, 6)   — Σ in DECIMAL
    Returns (node, rank) after ``iters`` rounds."""
    # pin the edge frame ONCE: every iteration's contribs join (and the
    # degree aggregate) re-reads it, and without the leaf each reference
    # recomputes the whole upstream lineage — for the events-derived
    # graph that is a full scan + json parse + distinct PER ITERATION
    # (the hits_scores _norm lesson applied to the input side)
    e = (edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"))
         .localCheckpoint(eager=True))
    deg = e.groupBy("__src").agg(F.count(F.lit(1)).alias("__deg"))
    n_nodes = F.broadcast(deg.agg(F.count(F.lit(1)).alias("__n")))
    ranks = (
        deg.crossJoin(n_nodes)
        .select(
            F.col("__src").alias("__node"),
            F.round(F.lit(1.0) / F.col("__n").cast("double"), 6)
            .alias("rank"))
    )
    d = float(damping)
    for i in range(int(iters)):
        contribs = (
            e.join(ranks.withColumnRenamed("__node", "__src"), on="__src")
            .join(deg, on="__src")
            .select(
                F.col("__dst").alias("__node"),
                F.round(F.col("rank") / F.col("__deg").cast("double"), 6)
                .cast(_DEC).alias("__c"))
            .groupBy("__node")
            .agg(F.sum("__c").alias("__s"))
        )
        ranks = (
            contribs.crossJoin(n_nodes)
            .select(
                "__node",
                F.round(
                    F.lit(1.0 - d) / F.col("__n").cast("double")
                    + F.lit(d) * F.col("__s").cast("double"),
                    6,
                ).alias("rank"))
        )
        if checkpoint_every and (i + 1) % int(checkpoint_every) == 0 \
                and (i + 1) < int(iters):
            # cut the lineage before it nests (the cc.py contract)
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(F.col("__node").alias("node"), "rank")


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Personalized PageRank: the restart mass ``(1−d)`` concentrates
    on the SEED set instead of teleporting uniformly — the
    similar-to-these recommendation / neighborhood-expansion primitive
    (seed a few items, rank the graph by proximity to them).

    Exactness contract — INTEGER MICRO-UNITS (the events_hourly_spikes
    philosophy: no float anywhere in the iteration): ranks live as
    BIGINT micro-ranks (units of 1e-6) and every quantization is the
    half-up integer division ``(2a + b) DIV (2b)``, identical in both
    engines by construction (the per-term ``round(double, 6)`` chain of
    ``pagerank_undirected`` is correct there, but probe-measured to hit
    .5-at-6dp boundaries on PPR's sparser rank distribution, where
    Spark's exact-BigDecimal and DuckDB's scaled-double roundings can
    disagree):
      rank₀(v)  = halfup(10⁶ / |S|) for seeds, 0 otherwise
      contrib(e) = halfup(rank(src) / deg(src))
      rank'(v)  = halfup((1−d)·10⁶ / |S|)·[v ∈ S] + halfup(d·Σ contrib)
    with d = dnum/dden rational (0.85 = 17/20).  The reported ``rank``
    is ONE terminal division of exact integers by 10⁶ — bit-stable.
    ``seeds`` is a one-column (``node``) frame; it broadcasts (a seed
    set is small by definition).  The node set is
    ``distinct(src) ∪ distinct(dst)`` — on a directed graph a node may
    appear only as a destination (it receives contributions and, if
    seeded, restart mass) or only as a source (it keeps its restart
    mass but receives nothing); both are real graph nodes, so both
    count toward ``|S|`` and both keep a rank row every iteration
    (r13 advice: keying ``|S|`` off out-degree alone over-counted
    total mass when a dst-only seed drew restart through the contribs
    join).  Seeds absent from the node set are EXCLUDED from ``|S|``
    (they contribute no rank row, so counting them would silently leak
    their restart share — total mass would fall below 1).  Ranks are
    keyed off the node set every iteration — unreachable nodes report
    rank 0.0, not absence."""
    dnum, dden = _damping_rational(damping)
    # pin the edge frame ONCE (the pagerank_undirected note): deg, the
    # node set, and every iteration's contribs join all re-read it
    e = (edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"))
         .localCheckpoint(eager=True))
    deg = e.groupBy("__src").agg(F.count(F.lit(1)).alias("__deg"))
    nodes = (e.select(F.col("__src").alias("__node"))
             .union(e.select(F.col("__dst").alias("__node")))
             .distinct()
             # the node frame joins into EVERY iteration's rank frame
             # (total-rank contract) — pin it too, it is node-set sized
             .localCheckpoint(eager=True))
    sd = F.broadcast(
        seeds.select(F.col("node").alias("__node")).distinct()
        .withColumn("__seed", F.lit(True)))
    # |S| counts only seeds PRESENT in the node set (src ∪ dst): an
    # out-of-graph seed contributes no rank row — if it still counted
    # toward |S| its restart share would silently vanish and total
    # mass drop below 1.  Broadcast-semi against the seed set: nodes
    # shuffles nothing beyond its own distinct.
    n_seeds = F.broadcast(
        nodes.join(sd.select("__node"), on="__node", how="left_semi")
        .agg(F.count(F.lit(1)).alias("__ns")))
    scale = 1_000_000
    # halfup((dden-dnum) * scale / (dden*ns)) — the seed restart mass
    restart = (
        F.when(F.col("__seed"),
               F.expr(f"(2 * {(dden - dnum) * scale}L + {dden}L * __ns) "
                      f"DIV (2 * {dden}L * __ns)"))
        .otherwise(F.lit(0).cast("long"))
    )
    ranks = (
        nodes
        .join(sd, on="__node", how="left")
        .crossJoin(n_seeds)
        .select(
            "__node",
            F.when(F.col("__seed"),
                   F.expr(f"(2 * {scale}L + __ns) DIV (2 * __ns)"))
            .otherwise(F.lit(0)).cast("long").alias("__r"))
    )
    for i in range(int(iters)):
        contribs = (
            e.join(ranks.withColumnRenamed("__node", "__src"), on="__src")
            .join(deg, on="__src")
            .select(
                F.col("__dst").alias("__node"),
                F.expr("(2 * __r + __deg) DIV (2 * __deg)").alias("__c"))
            .groupBy("__node")
            .agg(F.sum("__c").cast("long").alias("__s"))
        )
        # total over the node set: a node with no in-edges (or whose
        # in-neighbors all rank 0 AND contribute no row) keeps its row
        # — a src-only seed must keep drawing restart mass.
        ranks = (
            nodes.join(contribs, on="__node", how="left")
            .join(sd, on="__node", how="left")
            .crossJoin(n_seeds)
            .select(
                "__node",
                (restart
                 + F.expr(f"(2 * {dnum}L * coalesce(__s, 0L) + {dden}L) "
                          f"DIV (2 * {dden}L)"))
                .cast("long").alias("__r"))
        )
        if checkpoint_every and (i + 1) % int(checkpoint_every) == 0 \
                and (i + 1) < int(iters):
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(
        F.col("__node").alias("node"),
        (F.col("__r").cast("double") / F.lit(float(scale)))
        .alias("rank"))


def _damping_rational(damping: float) -> tuple[int, int]:
    """Damping as an exact small rational (micro-unit contract)."""
    from fractions import Fraction

    fr = Fraction(damping).limit_denominator(10_000)
    if float(fr) != float(damping):
        raise ValueError(
            f"personalized_pagerank damping {damping!r} is not an exact "
            "small rational; the integer micro-unit contract needs one "
            "(e.g. 0.85 = 17/20)")
    return fr.numerator, fr.denominator


def ppr_oracle_sql(iters: int = 3, damping: float = 0.85,
                   seed_pred: str = "node % 2 = 1 AND (node // 2) % 17 = 0",
                   source: str = "events") -> str:
    """DuckDB twin of :func:`personalized_pagerank` over the
    user↔item bipartite graph with seeds derived from the node table by
    ``seed_pred`` — the identical integer micro-unit chain (half-up
    integer divisions, BIGINT sums), unrolled; the only float is the
    terminal exact-integer division by 1e6."""
    dnum, dden = _damping_rational(damping)
    scale = 1_000_000
    rst = (dden - dnum) * scale
    ctes = [f"""e0 AS (
  SELECT DISTINCT user_id * 2 AS u,
         json_extract(props, '$.k')::BIGINT * 2 + 1 AS i
  FROM {source}
  WHERE json_extract(props, '$.k') IS NOT NULL
)""", """edges AS (
  SELECT u AS src, i AS dst FROM e0
  UNION ALL
  SELECT i AS src, u AS dst FROM e0
)""", """deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1)""",
            f"""seeds AS (
  SELECT src AS node FROM deg WHERE {seed_pred.replace('node', 'src')}
)""", """ns AS (SELECT count(*)::BIGINT AS n_seeds FROM seeds)""",
            f"""r0 AS (
  SELECT deg.src AS node,
         CASE WHEN s.node IS NOT NULL
              THEN (2 * {scale} + (SELECT n_seeds FROM ns))
                   // (2 * (SELECT n_seeds FROM ns))
              ELSE 0 END::BIGINT AS r
  FROM deg LEFT JOIN seeds s ON s.node = deg.src
)"""]
    for k in range(1, int(iters) + 1):
        ctes.append(f"""c{k} AS (
  SELECT e.dst AS node,
         sum((2 * r.r + deg.d) // (2 * deg.d))::BIGINT AS s
  FROM edges e
  JOIN r{k - 1} r ON r.node = e.src
  JOIN deg ON deg.src = e.src
  GROUP BY 1
)""")
        ctes.append(f"""r{k} AS (
  SELECT c.node,
         (CASE WHEN sd.node IS NOT NULL
               THEN (2 * {rst} + {dden} * (SELECT n_seeds FROM ns))
                    // (2 * {dden} * (SELECT n_seeds FROM ns))
               ELSE 0 END
          + (2 * {dnum} * c.s + {dden}) // (2 * {dden}))::BIGINT AS r
  FROM c{k} c LEFT JOIN seeds sd ON sd.node = c.node
)""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT CASE WHEN node % 2 = 0 THEN 'user' ELSE 'item' END AS kind,
       node // 2 AS id,
       CAST(r AS DOUBLE) / 1e6 AS rank
FROM r{int(iters)}
""")


def hits_scores(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
) -> DataFrame:
    """HITS hubs/authorities (Kleinberg) — the third of the classic
    link-analysis trio next to PageRank and personalized PageRank:
    authority(v) = Σ hub(in-neighbors), hub(v) = Σ authority
    (out-neighbors), each renormalized per half-step.

    Integer micro-unit contract (the :func:`personalized_pagerank`
    idiom — no float in the iteration): scores are BIGINT micro-units,
    hub₀ = 10⁶ everywhere, and each half-step renormalizes by the MAX
    (order-independent, unlike an L2 norm — no sqrt exists bit-stably
    cross-engine): score'(v) = halfup(raw(v)·10⁶ / max(raw)) with
    halfup(a/b) = (2a + b) DIV (2b).  The reported doubles are ONE
    terminal exact-integer division each.  Returns (node, hub,
    authority)."""
    if int(iters) < 1:
        raise ValueError(
            f"hits_scores iters must be >= 1, got {iters!r} (with no "
            "half-step there is no authority frame to report)")
    scale = 1_000_000
    # pin the edge frame ONCE (the pagerank_undirected note): both
    # half-step joins of every iteration re-read it
    e = (edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"))
         .localCheckpoint(eager=True))
    deg_nodes = e.select(F.col("__src").alias("__node")).distinct()
    hub = deg_nodes.select(
        "__node", F.lit(scale).cast("long").alias("__h"))

    def _norm(raw: DataFrame, col: str) -> DataFrame:
        # pin the raw half-step ONCE: it is referenced twice (the max
        # aggregate and the renormalized projection), and without the
        # checkpoint each reference recomputes the whole upstream
        # chain — doubling work per half-step, 2^(2·iters) overall
        # (measured 55 s at sf0.001; pinned, 3 s).  Also the cc.py
        # lineage lesson for long chains.
        raw = raw.localCheckpoint(eager=True)
        mx = F.broadcast(raw.agg(F.max(col).alias("__mx")))
        return (
            raw.crossJoin(mx)
            .select("__node",
                    F.expr(f"(2 * {col} * {scale}L + __mx) DIV (2 * __mx)")
                    .cast("long").alias(col))
        )

    auth = None
    for i in range(int(iters)):
        a_raw = (
            e.join(hub.withColumnRenamed("__node", "__src"), on="__src")
            .groupBy(F.col("__dst").alias("__node"))
            .agg(F.sum("__h").cast("long").alias("__a"))
        )
        auth = _norm(a_raw, "__a")
        h_raw = (
            e.join(auth.withColumnRenamed("__node", "__dst"), on="__dst")
            .groupBy(F.col("__src").alias("__node"))
            .agg(F.sum("__a").cast("long").alias("__h"))
        )
        hub = _norm(h_raw, "__h")
    return (
        hub.join(auth, on="__node")
        .select(
            F.col("__node").alias("node"),
            (F.col("__h").cast("double") / F.lit(float(scale)))
            .alias("hub"),
            (F.col("__a").cast("double") / F.lit(float(scale)))
            .alias("authority"))
    )


def hits_oracle_sql(iters: int = 3, source: str = "events") -> str:
    """DuckDB twin of :func:`hits_scores` over the user↔item bipartite
    graph — identical integer micro-unit half-steps, unrolled."""
    scale = 1_000_000
    ctes = [f"""e0 AS (
  SELECT DISTINCT user_id * 2 AS u,
         json_extract(props, '$.k')::BIGINT * 2 + 1 AS i
  FROM {source}
  WHERE json_extract(props, '$.k') IS NOT NULL
)""", """edges AS (
  SELECT u AS src, i AS dst FROM e0
  UNION ALL
  SELECT i AS src, u AS dst FROM e0
)""", f"""h0 AS (
  SELECT DISTINCT src AS node, {scale}::BIGINT AS h FROM edges
)"""]
    for k in range(1, int(iters) + 1):
        ctes.append(f"""ar{k} AS MATERIALIZED (
  SELECT e.dst AS node, sum(p.h)::BIGINT AS a
  FROM edges e JOIN h{k - 1} p ON p.node = e.src
  GROUP BY 1
)""")
        ctes.append(f"""a{k} AS MATERIALIZED (
  SELECT node,
         ((2 * a * {scale} + (SELECT max(a) FROM ar{k}))
          // (2 * (SELECT max(a) FROM ar{k})))::BIGINT AS a
  FROM ar{k}
)""")
        ctes.append(f"""hr{k} AS MATERIALIZED (
  SELECT e.src AS node, sum(p.a)::BIGINT AS h
  FROM edges e JOIN a{k} p ON p.node = e.dst
  GROUP BY 1
)""")
        ctes.append(f"""h{k} AS MATERIALIZED (
  SELECT node,
         ((2 * h * {scale} + (SELECT max(h) FROM hr{k}))
          // (2 * (SELECT max(h) FROM hr{k})))::BIGINT AS h
  FROM hr{k}
)""")
    n = int(iters)
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT CASE WHEN h.node % 2 = 0 THEN 'user' ELSE 'item' END AS kind,
       h.node // 2 AS id,
       CAST(h.h AS DOUBLE) / 1e6 AS hub,
       CAST(a.a AS DOUBLE) / 1e6 AS authority
FROM h{n} h JOIN a{n} a ON a.node = h.node
""")


def lpa_communities(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iters: int = 4,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Synchronous label propagation (LPA) — community detection
    beyond connectivity: every node starts as its own label and each
    fixed iteration adopts the MOST FREQUENT neighbor label, ties to
    the smallest label.  All-integer and fully deterministic (the
    argmax is the min-over-(−count, label)-structs idiom — map-side
    combinable, no per-node sort), so the oracle replays it exactly;
    fixed iterations are the spec (synchronous LPA can oscillate on
    bipartite structure — a caller wanting convergence composes more
    iterations).

    100 TB shape per iteration: one edge⋈labels join keyed src, one
    (dst, label) count aggregate, one per-dst argmax aggregate — bare
    (long, long[, long]) rows on every exchange; labels localCheckpoint
    every ``checkpoint_every`` rounds (the cc.py lineage lesson)."""
    # pin the edge frame ONCE (the pagerank_undirected note): the label
    # init and every iteration's vote join re-read it
    e = (edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"))
         .localCheckpoint(eager=True))
    labels = (e.select(F.col("__src").alias("__node")).distinct()
              .select("__node", F.col("__node").alias("__lbl")))
    for i in range(int(iters)):
        votes = (
            e.join(labels.withColumnRenamed("__node", "__src"), on="__src")
            .groupBy(F.col("__dst").alias("__node"), "__lbl")
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        labels = (
            votes.groupBy("__node")
            .agg(F.min(F.struct((-F.col("__c")).alias("__neg"),
                                F.col("__lbl").alias("__l"))).alias("__b"))
            .select("__node", F.col("__b.__l").alias("__lbl"))
        )
        if checkpoint_every and (i + 1) % int(checkpoint_every) == 0 \
                and (i + 1) < int(iters):
            labels = labels.localCheckpoint(eager=True)
    return labels.select(F.col("__node").alias("node"),
                         F.col("__lbl").alias("community"))


def lpa_oracle_sql(iters: int = 4, source: str = "events") -> str:
    """DuckDB twin of :func:`lpa_communities` over the user↔item
    bipartite graph — identical vote/argmax integer chain, unrolled."""
    ctes = [f"""e0 AS (
  SELECT DISTINCT user_id * 2 AS u,
         json_extract(props, '$.k')::BIGINT * 2 + 1 AS i
  FROM {source}
  WHERE json_extract(props, '$.k') IS NOT NULL
)""", """edges AS (
  SELECT u AS src, i AS dst FROM e0
  UNION ALL
  SELECT i AS src, u AS dst FROM e0
)""", """l0 AS (
  SELECT DISTINCT src AS node, src AS lbl FROM edges
)"""]
    for k in range(1, int(iters) + 1):
        ctes.append(f"""v{k} AS (
  SELECT e.dst AS node, l.lbl, count(*) AS c
  FROM edges e JOIN l{k - 1} l ON l.node = e.src
  GROUP BY 1, 2
)""")
        ctes.append(f"""l{k} AS (
  SELECT node, lbl FROM (
    SELECT node, lbl,
           row_number() OVER (PARTITION BY node
                              ORDER BY c DESC, lbl ASC) AS rk
    FROM v{k})
  WHERE rk = 1
)""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT CASE WHEN node % 2 = 0 THEN 'user' ELSE 'item' END AS kind,
       node // 2 AS id,
       lbl AS community
FROM l{int(iters)}
""")


def user_item_edges(events: DataFrame) -> DataFrame:
    """Bipartite user↔item edges from the events stream: one distinct
    (user, props.k) pair per co-occurrence, both directions, nodes
    integer-encoded (users even = user_id·2, items odd = k·2+1) so the
    iteration shuffles longs, never strings."""
    base = (
        events.select(
            (F.col("user_id") * 2).alias("u"),
            (F.from_json("props", "k BIGINT")["k"] * 2 + 1).alias("i"))
        .where(F.col("i").isNotNull())
        .distinct()
    )
    return (
        base.select(F.col("u").alias("src"), F.col("i").alias("dst"))
        .unionAll(base.select(F.col("i").alias("src"),
                              F.col("u").alias("dst")))
    )


def pagerank_oracle_sql(iters: int = 3, damping: float = 0.85,
                        source: str = "events") -> str:
    """DuckDB twin: the same edge encoding and the same per-iteration
    quantize → DECIMAL-sum → literal recombination, unrolled."""
    d = float(damping)
    ctes = [f"""e0 AS (
  SELECT DISTINCT user_id * 2 AS u,
         json_extract(props, '$.k')::BIGINT * 2 + 1 AS i
  FROM {source}
  WHERE json_extract(props, '$.k') IS NOT NULL
)""", """edges AS (
  SELECT u AS src, i AS dst FROM e0
  UNION ALL
  SELECT i AS src, u AS dst FROM e0
)""", """deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1)""",
            """n AS (SELECT count(*) AS n_nodes FROM deg)""",
            """r0 AS (
  SELECT src AS node,
         round(CAST(1.0 AS DOUBLE)
               / CAST((SELECT n_nodes FROM n) AS DOUBLE), 6) AS rank
  FROM deg
)"""]
    for k in range(1, int(iters) + 1):
        ctes.append(f"""c{k} AS (
  SELECT e.dst AS node,
         sum(CAST(round(r.rank / CAST(deg.d AS DOUBLE), 6)
                  AS DECIMAL(28,6))) AS s
  FROM edges e
  JOIN r{k - 1} r ON r.node = e.src
  JOIN deg ON deg.src = e.src
  GROUP BY 1
)""")
        ctes.append(f"""r{k} AS (
  SELECT node,
         round(CAST({1.0 - d!r} AS DOUBLE)
               / CAST((SELECT n_nodes FROM n) AS DOUBLE)
               + CAST({d!r} AS DOUBLE) * CAST(s AS DOUBLE), 6) AS rank
  FROM c{k}
)""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT CASE WHEN node % 2 = 0 THEN 'user' ELSE 'item' END AS kind,
       node // 2 AS id, rank
FROM r{int(iters)}
""")


def item_cooccurrence_pairs(
    events: DataFrame,
    *,
    min_support_num: int = 1,
    min_support_den: int = 4,
    max_items_per_user: int = 1000,
) -> DataFrame:
    """Market-basket co-occurrence: item pairs whose shared-user count
    reaches ``min_support_num/min_support_den`` of the user population
    (integer-exact compare — a relative threshold stays meaningful as
    the corpus grows).  Returns (item_a, item_b, n_users), item_a <
    item_b.

    100 TB shape: the self-join keys on user_id, so each user
    contributes |items(u)|² candidate rows — the classic co-visitation
    skew, controlled by dropping users above ``max_items_per_user``
    (the standard mitigation: a user touching everything contributes
    quadratic volume and no signal).  The shuffle carries (user, item)
    longs; counts aggregate map-side on the item pair."""
    ui = (
        events.select(
            "user_id",
            F.from_json("props", "k BIGINT")["k"].alias("item"))
        .where(F.col("item").isNotNull())
        .distinct()
    )
    heavy = (ui.groupBy("user_id").agg(F.count(F.lit(1)).alias("__n"))
             .where(F.col("__n") > int(max_items_per_user))
             .select("user_id"))
    ui = ui.join(F.broadcast(heavy), on="user_id", how="left_anti")
    n_users = F.broadcast(ui.agg(
        F.countDistinct("user_id").alias("__nu")))
    a = ui.select("user_id", F.col("item").alias("item_a"))
    b = ui.select("user_id", F.col("item").alias("item_b"))
    return (
        a.join(b, on="user_id")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .crossJoin(n_users)
        .where(F.col("n_users") * F.lit(int(min_support_den))
               >= F.col("__nu") * F.lit(int(min_support_num)))
        .select("item_a", "item_b", "n_users")
    )


def item_cooccurrence_oracle_sql(
    min_support_num: int = 1,
    min_support_den: int = 4,
    max_items_per_user: int = 1000,
    source: str = "events",
) -> str:
    """DuckDB twin of :func:`item_cooccurrence_pairs` — same dedup,
    same heavy-user cap, same integer-exact relative threshold."""
    return f"""
WITH ui0 AS (
  SELECT DISTINCT user_id, json_extract(props, '$.k')::BIGINT AS item
  FROM {source}
  WHERE json_extract(props, '$.k') IS NOT NULL
),
heavy AS (
  SELECT user_id FROM ui0 GROUP BY 1
  HAVING count(*) > {int(max_items_per_user)}
),
ui AS (
  -- NOT EXISTS, not NOT IN: a NULL user_id in heavy would empty a
  -- NOT IN result wholesale, while Spark's left_anti keeps all
  -- non-matching rows (round-10 ADVICE item)
  SELECT ui0.* FROM ui0
  WHERE NOT EXISTS (SELECT 1 FROM heavy h WHERE h.user_id = ui0.user_id)
),
nu AS (SELECT count(DISTINCT user_id) AS n FROM ui),
p AS (
  SELECT a.item AS item_a, b.item AS item_b, count(*)::BIGINT AS n_users
  FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item < b.item
  GROUP BY 1, 2
)
SELECT item_a, item_b, n_users FROM p
WHERE n_users * {int(min_support_den)}
      >= (SELECT n FROM nu) * {int(min_support_num)}
"""


def user_item_components(events: DataFrame, *,
                         max_iter: int = 12) -> DataFrame:
    """Connected components of the user↔item interaction graph — the
    community/account-linking primitive (shared items connect users;
    shared users connect items).  Rides the SAME min-label CC core as
    the dedup cluster operators (``operators/cc.py``): each distinct
    (user, item) edge becomes a 2-member bucket keyed by the packed
    edge id, nodes integer-encoded (users even, items odd — the
    ``user_item_edges`` contract), and the component label is the min
    encoded node id.  Returns (kind, id, component,
    is_representative).

    100 TB shape: inherited from the CC core — singleton-bucket prune,
    per-round label joins keyed on the long node id, localCheckpoint
    per fixed-point probe (the lineage contract); bipartite interaction
    graphs have small diameter, so the min-label iteration converges in
    a handful of rounds."""
    from .cc import min_label_components

    base = (
        events.select(
            (F.col("user_id") * 2).alias("__u"),
            (F.from_json("props", "k BIGINT")["k"] * 2 + 1).alias("__i"))
        .where(F.col("__i").isNotNull())
        .distinct()
    )
    edge_id = (F.shiftleft(F.col("__u"), 32)
               .bitwiseOR(F.col("__i"))).alias("band_hash")
    blocks = (
        base.select(F.col("__u").alias("__id"),
                    F.lit(0).cast("int").alias("band_idx"), edge_id)
        .unionAll(
            base.select(F.col("__i").alias("__id"),
                        F.lit(0).cast("int").alias("band_idx"), edge_id))
        # the CC core reads blocks three times before its own persist
        # (all_ids, bucket sizes, edge join) — pin the events-derived
        # lineage once, per the min_label_components caller contract
        .localCheckpoint(eager=True)
    )
    labels = min_label_components(blocks, max_iter=max_iter)
    return labels.select(
        F.when(F.col("__id") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("item")).alias("kind"),
        F.expr("__id DIV 2").alias("id"),
        F.col("__label").alias("component"),
        (F.col("__id") == F.col("__label")).alias("is_representative"),
    )


def user_item_components_oracle_sql(source: str = "events") -> str:
    """DuckDB twin: true connected components via a recursive
    reachability CTE over the same encoded bipartite edges; component
    label = min reachable encoded node (the min-label fixed point)."""
    return f"""
WITH RECURSIVE e0 AS (
  SELECT DISTINCT user_id * 2 AS u,
         json_extract(props, '$.k')::BIGINT * 2 + 1 AS i
  FROM {source}
  WHERE json_extract(props, '$.k') IS NOT NULL
),
nodes AS (
  SELECT DISTINCT u AS nd FROM e0
  UNION
  SELECT DISTINCT i AS nd FROM e0
),
edges AS (
  SELECT u AS src, i AS dst FROM e0
  UNION ALL
  SELECT i AS src, u AS dst FROM e0
),
reach(nd, r) AS (
  SELECT nd, nd FROM nodes
  UNION
  SELECT e.src, w.r FROM edges e JOIN reach w ON w.nd = e.dst
)
SELECT CASE WHEN nd % 2 = 0 THEN 'user' ELSE 'item' END AS kind,
       nd // 2 AS id,
       min(r) AS component,
       (nd = min(r)) AS is_representative
FROM reach
GROUP BY nd
"""


def triangle_counts(
    events: DataFrame,
    *,
    min_cooccur: int = 2,
    max_items_per_user: int = 1000,
) -> DataFrame:
    """Per-item triangle participation over the item co-occurrence
    graph (edge = two items shared by ≥ ``min_cooccur`` users, the
    same dedup + heavy-user cap as :func:`item_cooccurrence_pairs`).
    Returns ``(item, n_triangles)`` for items in ≥ 1 triangle.

    100 TB shape — degree-ordered orientation (the standard bound):
    every edge is directed from its lower-(degree, id) endpoint to the
    higher, so wedges enumerate only at the LOW-rank vertex and each
    triangle is generated exactly once; total wedge volume is
    O(m^{3/2}) regardless of degree skew (a star's hub has out-degree
    0 after orientation).  The oracle replays the naive id-ordered
    3-join — a different enumeration of provably the same triangle
    set, so the per-item counts are engine-identical.  All joins carry
    (long, long) edge rows; degrees attach map-side from a groupBy the
    size of the item vocabulary."""
    ui = (
        events.select(
            "user_id",
            F.from_json("props", "k BIGINT")["k"].alias("item"))
        .where(F.col("item").isNotNull())
        .distinct()
    )
    heavy = (ui.groupBy("user_id").agg(F.count(F.lit(1)).alias("__n"))
             .where(F.col("__n") > int(max_items_per_user))
             .select("user_id"))
    ui = ui.join(F.broadcast(heavy), on="user_id", how="left_anti")
    a = ui.select("user_id", F.col("item").alias("item_a"))
    b = ui.select("user_id", F.col("item").alias("item_b"))
    edges = (
        a.join(b, on="user_id")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") >= int(min_cooccur))
        .select("item_a", "item_b")
    )
    deg = (
        edges.select(F.col("item_a").alias("item"))
        .unionAll(edges.select(F.col("item_b").alias("item")))
        .groupBy("item").agg(F.count(F.lit(1)).alias("__deg"))
    )
    # orient: src = lower (deg, id), dst = higher; carry dst's rank so
    # the wedge join can order its two high endpoints without a re-join
    da = deg.select(F.col("item").alias("item_a"),
                    F.col("__deg").alias("__dega"))
    db = deg.select(F.col("item").alias("item_b"),
                    F.col("__deg").alias("__degb"))
    ed = edges.join(da, on="item_a").join(db, on="item_b")
    a_first = (F.col("__dega") < F.col("__degb")) | (
        (F.col("__dega") == F.col("__degb"))
        & (F.col("item_a") < F.col("item_b")))
    oriented = ed.select(
        F.when(a_first, F.col("item_a")).otherwise(F.col("item_b"))
        .alias("src"),
        F.when(a_first, F.col("item_b")).otherwise(F.col("item_a"))
        .alias("dst"),
        F.when(a_first, F.col("__degb")).otherwise(F.col("__dega"))
        .alias("__rdst"),
    )
    o1 = oriented.select(F.col("src"), F.col("dst").alias("v"),
                         F.col("__rdst").alias("__rv"))
    o2 = oriented.select(F.col("src"), F.col("dst").alias("w"),
                         F.col("__rdst").alias("__rw"))
    wedges = (
        o1.join(o2, on="src")
        .where((F.col("__rv") < F.col("__rw"))
               | ((F.col("__rv") == F.col("__rw"))
                  & (F.col("v") < F.col("w"))))
        .select("src", "v", "w")
    )
    closing = oriented.select(F.col("src").alias("v"),
                              F.col("dst").alias("w"))
    tris = wedges.join(closing, on=["v", "w"])
    return (
        tris.select(F.explode(F.array("src", "v", "w")).alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )


def triangle_counts_oracle_sql(
    min_cooccur: int = 2,
    max_items_per_user: int = 1000,
    source: str = "events",
) -> str:
    """DuckDB twin of :func:`triangle_counts` — the naive id-ordered
    triangle enumeration (a < b < c, all three edges present), which
    lists exactly the same triangles the degree orientation does, so
    the per-item counts hash-match."""
    return f"""
WITH ui0 AS (
  SELECT DISTINCT user_id, json_extract(props, '$.k')::BIGINT AS item
  FROM {source}
  WHERE json_extract(props, '$.k') IS NOT NULL
),
heavy AS (
  SELECT user_id FROM ui0 GROUP BY 1
  HAVING count(*) > {int(max_items_per_user)}
),
ui AS (
  SELECT ui0.* FROM ui0
  WHERE NOT EXISTS (SELECT 1 FROM heavy h WHERE h.user_id = ui0.user_id)
),
e AS (
  SELECT a.item AS ia, b.item AS ib
  FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item < b.item
  GROUP BY 1, 2
  HAVING count(*) >= {int(min_cooccur)}
),
tri AS (
  SELECT e1.ia AS x, e1.ib AS y, e2.ib AS z
  FROM e e1
  JOIN e e2 ON e2.ia = e1.ia AND e2.ib > e1.ib
  JOIN e e3 ON e3.ia = e1.ib AND e3.ib = e2.ib
),
m AS (
  SELECT x AS item FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT item, count(*)::BIGINT AS n_triangles
FROM m GROUP BY item
"""
