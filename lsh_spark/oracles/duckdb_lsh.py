"""Exact DuckDB SQL oracles for the engine's FxHash/LSH kernel family.

The reference's DuckDB ``lsh`` extension is not installable here (no
network), but none of its outputs are random at query time: every hash is
deterministic FxHash arithmetic (``src/minhash/shingleset.rs:37-47``,
``src/minhash/minhasher.rs:22-45``) over constants drawn once from a
seeded RNG (``src/minhash.rs:72``).  So the driver's DuckDB side can
reproduce the Spark output EXACTLY:

  * the RNG-derived per-seed constants come from the same ``_core`` tables
    the Spark UDFs use and are inlined into the SQL as literals;
  * the wrapping-u64 FxHash steps run in HUGEINT arithmetic mod 2**64
    (DuckDB integer ops don't wrap — HUGEINT holds the 128-bit product of
    a u64 by the 63-bit FxHash constant);
  * ``rotl(s, 5)`` is ``(s*32 mod 2**64) + (s >> 59)`` — the two terms
    occupy disjoint bit ranges, so ``+`` is ``|``.

These generators give the gate queries full hash-match oracles where
round 1 only had rows-only checks.  Each generator mirrors one operator's
semantics exactly (same banding, same strict-inequality thresholds, same
rounding); keep them in lockstep with the operators they check.
"""

from __future__ import annotations

from .._core.fxhash import K, MASK64
from .._core.minhash import seed_table

_H64 = "18446744073709551616"          # 2**64
_U64MAX = "18446744073709551615"       # u64::MAX (empty-set minhash)
_KLIT = str(K)                         # FxHash multiplier, 0x517CC1B727220A95
_MASK32 = "4294967296"                 # 2**32


def _rotl5(x: int) -> int:
    return ((x << 5) | (x >> 59)) & MASK64


def fx_add_sql(state: str, word: str) -> str:
    """One FxHasher step ``(rotl5(state) ^ word) * K mod 2**64`` as a SQL
    expression over HUGEINT-ranged operands."""
    # force HUGEINT before *32: an int64-ranged literal state would otherwise
    # multiply (and overflow) in BIGINT
    rot = (f"((({state})::HUGEINT * 32) % {_H64} "
           f"+ (({state})::HUGEINT // 576460752303423488))")
    return (
        f"((xor(({rot})::UBIGINT, ({word})::UBIGINT)::HUGEINT"
        f" * {_KLIT}) % {_H64})"
    )


def _signed64(h: str) -> str:
    """u64 → two's-complement BIGINT (matches the ``*_bands_long`` Spark
    variants)."""
    return (
        f"(CASE WHEN ({h}) >= 9223372036854775808 "
        f"THEN ({h}) - {_H64} ELSE ({h}) END)::BIGINT"
    )


def _low32(h: str) -> str:
    """u64 → low 32 bits as BIGINT (matches ``lsh_min32``/``lsh_euclidean32``)."""
    return f"(({h}) % {_MASK32})::BIGINT"


def _hash_repr(h: str, low32: bool) -> str:
    return _low32(h) if low32 else _signed64(h)


# ---------------------------------------------------------------------------
# shingle sets (char ngrams and caller-supplied shingle strings)
# ---------------------------------------------------------------------------

def char_window_hash_sql(ngram_width: int, text: str = "text",
                         pos: str = "i") -> str:
    """FxHash-u32 of the ``ngram_width``-char window of ``text`` starting at
    1-based char position ``pos`` (``shingleset.rs:27-47``): usize length
    prefix, then each Unicode scalar value, low 32 bits kept."""
    # fx_add(0, width) = width * K  (rotl5(0)=0, 0^w=w)
    state = str((ngram_width * K) & MASK64)
    for k in range(ngram_width):
        state = fx_add_sql(state, f"unicode(substring({text}, {pos} + {k}, 1))")
    return f"(({state}) % {_MASK32})"


def string_hash_sql(sexpr: str) -> str:
    """FxHash-u32 of an arbitrary string's char sequence with usize length
    prefix (``shingleset.rs:12-22``) — used for word-shingle overloads and
    simhash tokens."""
    init = f"((length({sexpr})::HUGEINT * {_KLIT}) % {_H64})"
    chars = (
        f"list_transform(generate_series(1, length({sexpr})), "
        f"j -> unicode(substring({sexpr}, j, 1)))"
    )
    return (
        f"(list_reduce(list_prepend({init}, {chars}), "
        f"(a, x) -> {fx_add_sql('a', 'x')}) % {_MASK32})"
    )


def char_shingles_cte(ngram_width: int, source: str = "documents",
                      id_col: str = "doc_id", text_col: str = "text") -> str:
    """CTE body producing the DISTINCT u32 shingle set ``(id, sh)`` of every
    row (rows shorter than the ngram width yield no shingles)."""
    return f"""
  docs AS (SELECT {id_col} AS id, {text_col} AS text FROM {source}),
  win AS (
    SELECT id, text,
           unnest(generate_series(1, greatest(length(text) - {ngram_width - 1}, 0))) AS i
    FROM docs
  ),
  sh AS (SELECT DISTINCT id, {char_window_hash_sql(ngram_width)} AS sh FROM win)"""


def bigram_shingles_cte(source: str = "documents", id_col: str = "doc_id",
                        text_col: str = "text") -> str:
    """CTE body for the LIST(VARCHAR) overload's word-bigram shingle set —
    mirrors the Spark query's JVM bigram expression (split on whitespace
    runs, adjacent pairs joined by one space)."""
    return f"""
  docs AS (SELECT {id_col} AS id, {text_col} AS text FROM {source}),
  -- tokenizer contract shared with the Spark paths: ASCII-whitespace
  -- separators (spelled out because RE2's ws class lacks vertical tab),
  -- empty tokens dropped
  words AS (
    SELECT id,
           list_filter(string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+'),
                       x -> x <> '') AS w
    FROM docs),
  bg AS (
    SELECT id, unnest(list_transform(
        generate_series(1, greatest(len(w) - 1, 0)),
        i -> w[i] || ' ' || w[i + 1])) AS g
    FROM words
  ),
  sh AS (SELECT DISTINCT id, {string_hash_sql('g')} AS sh FROM bg)"""


# ---------------------------------------------------------------------------
# minhash bands over a shingle-set CTE
# ---------------------------------------------------------------------------

def _seed_values(band_count: int, band_size: int, seed) -> str:
    """Inline VALUES rows ``(seed_idx, pre)`` where ``pre`` is the FxHasher
    state after ``write_u64(seed_i)`` pre-rotated for the next step:
    ``rotl5(seed_i * K)``.

    ``seed`` may be a sequence (the README seed-rotation pattern): the
    per-seed tables concatenate, so ``seed_idx // band_size`` yields the
    operator's fused rotation band index ``band_idx + rot*band_count``."""
    seeds = (seed,) if isinstance(seed, int) else tuple(seed)
    table = [s for one in seeds for s in seed_table(band_count, band_size, one)]
    return ", ".join(
        f"({i}, {_rotl5((int(s) * K) & MASK64)}::HUGEINT)"
        for i, s in enumerate(table)
    )


def minhash_bands_ctes(band_count: int, band_size: int, seed) -> str:
    """CTE bodies from a ``sh(id, sh)`` set CTE (plus ``docs(id, ...)``) to
    ``bands(id, band_idx, h)`` with ``h`` the unsigned u64 band hash.
    Empty shingle sets fold band hashes over u64::MAX minima, exactly like
    the kernel (``minhasher.rs:22-45``)."""
    per_seed_hash = f"(xor(pre::UBIGINT, sh::UBIGINT)::HUGEINT * {_KLIT}) % {_H64}"
    return f"""
  seeds(seed_idx, pre) AS (VALUES {_seed_values(band_count, band_size, seed)}),
  minima AS (
    SELECT id, seed_idx, min({per_seed_hash}) AS m
    FROM sh CROSS JOIN seeds GROUP BY 1, 2
  ),
  allmin AS (
    SELECT d.id, s.seed_idx, coalesce(m.m, {_U64MAX}::HUGEINT) AS m
    FROM docs d CROSS JOIN seeds s
    LEFT JOIN minima m ON m.id = d.id AND m.seed_idx = s.seed_idx
  ),
  bands AS (
    SELECT id, seed_idx // {band_size} AS band_idx,
           list_reduce(list_prepend(0::HUGEINT, list(m ORDER BY seed_idx)),
                       (a, x) -> {fx_add_sql('a', 'x')}) AS h
    FROM allmin GROUP BY 1, 2
  )"""


# ---------------------------------------------------------------------------
# signature-query oracles
# ---------------------------------------------------------------------------

def minhash_signatures_sql(ngram_width: int, band_count: int, band_size: int,
                           seed: int, *, low32: bool = False,
                           id_out: str = "doc_id") -> str:
    """Oracle for ``lsh_min`` / ``lsh_min32`` over ``documents`` exploded to
    ``({id_out}, band_idx, band_hash)``."""
    return f"""
WITH {char_shingles_cte(ngram_width)},
{minhash_bands_ctes(band_count, band_size, seed)}
SELECT id AS {id_out}, band_idx::INT AS band_idx,
       {_hash_repr('h', low32)} AS band_hash
FROM bands
"""


def minhash_shingle_signatures_sql(band_count: int, band_size: int, seed: int,
                                   *, low32: bool = False) -> str:
    """Oracle for the LIST(VARCHAR) overloads over word bigrams."""
    return f"""
WITH {bigram_shingles_cte()},
{minhash_bands_ctes(band_count, band_size, seed)}
SELECT id AS doc_id, band_idx::INT AS band_idx,
       {_hash_repr('h', low32)} AS band_hash
FROM bands
"""


def weighted_shingles_cte(source: str = "documents",
                          id_col: str = "doc_id",
                          text_col: str = "text") -> str:
    """CTE body for the tf-weighted replicated shingle set: occurrence k
    of a word contributes the string ``word || ' ' || k`` (occurrence
    index in position order — ``row_number`` partitioned by (doc,
    word)), hashed with the from_shingles string hash.  Plain Jaccard
    over these replicated sets IS the weighted Jaccard
    ``Σ min(tf)/Σ max(tf)``, so the standard band + verify machinery
    composes unchanged."""
    return f"""
  docs AS (SELECT {id_col} AS id, {text_col} AS text FROM {source}),
  words AS (
    SELECT id,
           coalesce(list_filter(
             string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+'),
             x -> x <> ''), []) AS w
    FROM docs),
  occ0 AS (
    SELECT id, unnest(w) AS tok,
           unnest(CASE WHEN len(w) > 0
                       THEN generate_series(1, len(w)) ELSE [] END) AS pos
    FROM words),
  occ AS (
    SELECT id, tok || ' ' ||
           (row_number() OVER (PARTITION BY id, tok ORDER BY pos))::VARCHAR
           AS g
    FROM occ0),
  sh AS (SELECT DISTINCT id, {string_hash_sql('g')} AS sh FROM occ)"""


def weighted_word_shingles_cte(width: int = 2, source: str = "documents",
                               id_col: str = "doc_id",
                               text_col: str = "text") -> str:
    """CTE body for the tf-weighted WORD-``width``-GRAM replicated
    shingle set — ``weighted_shingles_cte`` composed with the n-gram
    construction of ``bigram_shingles_cte``: occurrence k of the n-gram
    string ``"w1 .. wn"`` (in position order) contributes
    ``"w1 .. wn k"``, injective for fixed ``width``."""
    gram = " || ' ' || ".join(f"w[i + {j}]" for j in range(width))
    return f"""
  docs AS (SELECT {id_col} AS id, {text_col} AS text FROM {source}),
  words AS (
    SELECT id,
           coalesce(list_filter(
             string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+'),
             x -> x <> ''), []) AS w
    FROM docs),
  occ0 AS (
    SELECT id,
           unnest(list_transform(gs, i -> {gram})) AS tok,
           unnest(gs) AS pos
    FROM (SELECT id, w,
                 CASE WHEN len(w) >= {width}
                      THEN generate_series(1, len(w) - {width} + 1)
                      ELSE [] END AS gs
          FROM words)),
  occ AS (
    SELECT id, tok || ' ' ||
           (row_number() OVER (PARTITION BY id, tok ORDER BY pos))::VARCHAR
           AS g
    FROM occ0),
  sh AS (SELECT DISTINCT id, {string_hash_sql('g')} AS sh FROM occ)"""


def weighted_word_near_dup_pairs_sql(band_count: int, band_size: int,
                                     seed: int, threshold: float,
                                     width: int = 2) -> str:
    """Oracle for the tf-weighted word-n-gram near-dup pair query:
    banded blocking + exact verification over the replicated n-gram
    shingle sets (plain Jaccard = weighted n-gram Jaccard)."""
    return f"""
WITH {weighted_word_shingles_cte(width)},
{minhash_bands_ctes(band_count, band_size, seed)},
  {pair_verify_ctes(threshold)}
SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM ver
"""


def weighted_minhash_signatures_sql(band_count: int, band_size: int,
                                    seed: int) -> str:
    """Oracle for tf-weighted MinHash signatures (integer-weight
    replication — see ``weighted_shingles_cte``)."""
    return f"""
WITH {weighted_shingles_cte()},
{minhash_bands_ctes(band_count, band_size, seed)}
SELECT id AS doc_id, band_idx::INT AS band_idx,
       {_hash_repr('h', low32=False)} AS band_hash
FROM bands
"""


def weighted_near_dup_pairs_sql(band_count: int, band_size: int, seed: int,
                                threshold: float) -> str:
    """Oracle for the tf-weighted near-dup pair query: banded blocking +
    exact verification over the replicated shingle sets — whose plain
    Jaccard equals the weighted Jaccard, so ``pair_verify_ctes``
    composes unchanged."""
    return f"""
WITH {weighted_shingles_cte()},
{minhash_bands_ctes(band_count, band_size, seed)},
  {pair_verify_ctes(threshold)}
SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM ver
"""


# ---------------------------------------------------------------------------
# pair-query oracles (banded blocking + exact jaccard verification)
# ---------------------------------------------------------------------------

def pair_verify_ctes(threshold: float) -> str:
    """CTE bodies from existing ``sh(id, sh)`` + ``bands(id, band_idx, h)``
    CTEs to ``ver(id_a, id_b, jaccard)``: pairs colliding in ≥1 band whose
    exact jaccard over the u32-hashed shingle sets exceeds ``threshold``
    (strict, like the operator and ``README.md:133-163``)."""
    return f"""cand AS (
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.h = b.h AND a.id < b.id
  ),
  sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
  inter AS (
    SELECT c.id_a, c.id_b, count(*) AS ni
    FROM cand c
    JOIN sh sa ON sa.id = c.id_a
    JOIN sh sb ON sb.id = c.id_b AND sb.sh = sa.sh
    GROUP BY 1, 2
  ),
  ver AS (
    SELECT i.id_a, i.id_b,
           i.ni::DOUBLE / (za.n + zb.n - i.ni)::DOUBLE AS jaccard
    FROM inter i
    JOIN sizes za ON za.id = i.id_a
    JOIN sizes zb ON zb.id = i.id_b
    WHERE i.ni::DOUBLE / (za.n + zb.n - i.ni)::DOUBLE > {threshold}
  )"""


def _verified_pairs_ctes(ngram_width: int, band_count: int, band_size: int,
                         seed: int, threshold: float,
                         source: str = "documents", id_col: str = "doc_id",
                         text_col: str = "text") -> str:
    """Shingles + bands + verification over ``source``, ending in ``ver``."""
    return f"""{char_shingles_cte(ngram_width, source, id_col, text_col)},
{minhash_bands_ctes(band_count, band_size, seed)},
  {pair_verify_ctes(threshold)}"""


def containment_pairs_sql(ngram_width: int, band_count: int,
                          band_size: int, seed: int,
                          threshold: float) -> str:
    """Oracle for ``lsh_containment_pairs``: band candidates (bit-exact
    shingle/minhash CTEs) verified by the asymmetric containments
    ``ni/|A|`` and ``ni/|B|`` (raw integer-ratio IEEE divisions, 6dp
    half-up round in both engines), keeping strict
    ``greatest(...) > threshold``."""
    return f"""
WITH {char_shingles_cte(ngram_width)},
{minhash_bands_ctes(band_count, band_size, seed)},
  cand AS (
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.h = b.h AND a.id < b.id
  ),
  sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
  inter AS (
    SELECT c.id_a, c.id_b, count(*) AS ni
    FROM cand c
    JOIN sh sa ON sa.id = c.id_a
    JOIN sh sb ON sb.id = c.id_b AND sb.sh = sa.sh
    GROUP BY 1, 2
  ),
  v AS (
    SELECT c.id_a, c.id_b,
           round(coalesce(i.ni, 0)::DOUBLE / za.n::DOUBLE, 6)
             AS cont_a_in_b,
           round(coalesce(i.ni, 0)::DOUBLE / zb.n::DOUBLE, 6)
             AS cont_b_in_a
    FROM cand c
    LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
    JOIN sizes za ON za.id = c.id_a
    JOIN sizes zb ON zb.id = c.id_b
  )
SELECT id_a, id_b, cont_a_in_b, cont_b_in_a FROM v
WHERE greatest(cont_a_in_b, cont_b_in_a) > {threshold}
"""


def edit_distance_pairs_sql(ngram_width: int, band_count: int,
                            band_size: int, seed: int,
                            threshold: float) -> str:
    """Oracle for ``lsh_edit_distance_pairs``: band-collision candidates
    (same bit-exact shingle/minhash CTEs as the Jaccard family) verified
    by Levenshtein similarity ``round(1 - lev/greatest(len_a, len_b), 6)
    > threshold`` (strict) — both engines' levenshtein is the classic
    character-level DP, integer-exact, and the single division + round
    replay one literal op order."""
    return f"""
WITH {char_shingles_cte(ngram_width)},
{minhash_bands_ctes(band_count, band_size, seed)},
  cand AS (
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.h = b.h AND a.id < b.id
  ),
  v AS (
    SELECT c.id_a, c.id_b,
           CASE WHEN greatest(length(da.text), length(db.text)) != 0
                THEN round(1.0
                     - CAST(levenshtein(da.text, db.text) AS DOUBLE)
                       / CAST(greatest(length(da.text), length(db.text))
                              AS DOUBLE), 6)
           END AS edit_sim
    FROM cand c
    JOIN documents da ON da.doc_id = c.id_a
    JOIN documents db ON db.doc_id = c.id_b
  )
SELECT id_a, id_b, edit_sim FROM v WHERE edit_sim > {threshold}
"""


def near_dup_pairs_sql(ngram_width: int, band_count: int, band_size: int,
                       seed: int, threshold: float) -> str:
    """Oracle for ``lsh_self_dedup_pairs`` flagship query
    ``(id_a, id_b, jaccard)`` with jaccard rounded to 6dp."""
    return f"""
WITH {_verified_pairs_ctes(ngram_width, band_count, band_size, seed, threshold)}
SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM ver
"""


def similarity_join_ab_sql(ngram_width: int, band_count: int, band_size: int,
                           seed: int, threshold: float) -> str:
    """Oracle for the two-table README join: odd-id docs probed against
    even-id docs (the query's A/B split), output
    ``(probe_id, corpus_id, jaccard)``."""
    # the self-pair machinery already yields every colliding unordered pair;
    # A⨝B keeps (odd, even) pairs in either orientation
    return f"""
WITH {_verified_pairs_ctes(ngram_width, band_count, band_size, seed, threshold)}
SELECT CASE WHEN id_a % 2 = 1 THEN id_a ELSE id_b END AS probe_id,
       CASE WHEN id_a % 2 = 1 THEN id_b ELSE id_a END AS corpus_id,
       round(jaccard, 6) AS jaccard
FROM ver
WHERE (id_a % 2) != (id_b % 2)
"""


def dedup_keep_first_sql(ngram_width: int, band_count: int, band_size: int,
                         seed: int, threshold: float) -> str:
    """Oracle for ``lsh_dedup_keep_first``: drop every doc that is a
    verified near-duplicate of ANY lower-id doc; keep (doc_id, lang,
    source) of the survivors."""
    return f"""
WITH {_verified_pairs_ctes(ngram_width, band_count, band_size, seed, threshold)}
SELECT d.doc_id, d.lang, d.source
FROM documents d
WHERE d.doc_id NOT IN (SELECT id_b FROM ver)
"""


def dedup_clusters_sql(ngram_width: int, band_count: int, band_size: int,
                       seed: int) -> str:
    """Oracle for ``lsh_dedup_clusters``: true connected components over the
    band-collision graph via a recursive reachability CTE; cluster label =
    min doc_id of the component (the operator's min-label propagation fixed
    point)."""
    return f"""
WITH RECURSIVE {char_shingles_cte(ngram_width)},
{minhash_bands_ctes(band_count, band_size, seed)},
  edges AS (
    SELECT DISTINCT a.id AS src, b.id AS dst
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.h = b.h AND a.id != b.id
  ),
  reach(id, r) AS (
    SELECT id, id FROM docs
    UNION
    SELECT e.src, w.r FROM edges e JOIN reach w ON w.id = e.dst
  )
SELECT id AS doc_id, min(r) AS cluster_id,
       (id = min(r)) AS is_representative
FROM reach GROUP BY id
"""


# ---------------------------------------------------------------------------
# sketch / fingerprint oracles
# ---------------------------------------------------------------------------

def kmv_doc_stats_sql(ngram_width: int = 3, k: int = 64) -> str:
    """Oracle for the KMV sketch stats query: exact distinct-ngram count
    plus the deterministic KMV estimate (exact below k, else
    (k-1)/(kth_min/2**32), rounded to 4dp)."""
    return f"""
WITH {char_shingles_cte(ngram_width)},
  stats AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
  kth AS (
    SELECT id, sh AS kth FROM (
      SELECT id, sh, row_number() OVER (PARTITION BY id ORDER BY sh) AS rn
      FROM sh
    ) WHERE rn = {k}
  )
SELECT d.id AS doc_id,
       coalesce(s.n, 0)::BIGINT AS n_distinct_ngrams,
       round(CASE WHEN coalesce(s.n, 0) < {k} THEN coalesce(s.n, 0)::DOUBLE
             ELSE {float(k - 1)} / (t.kth::DOUBLE / 4294967296.0) END,
             4) AS kmv_estimate
FROM docs d
LEFT JOIN stats s ON s.id = d.id
LEFT JOIN kth t ON t.id = d.id
"""


def doc_fingerprints_sql(kgram: int = 5, window: int = 4) -> str:
    """Oracle for winnowing fingerprints ``(doc_id, pos, fingerprint)``:
    rightmost-minimum per sliding hash window, distinct selected hashes
    sorted ascending with 0-based position (matching the Spark query's
    posexplode of the sorted array)."""
    return f"""
WITH
  docs AS (SELECT doc_id AS id, text FROM documents),
  hseq AS (
    SELECT id, i, {char_window_hash_sql(kgram)}::BIGINT AS h
    FROM (
      SELECT id, text,
             unnest(generate_series(1, greatest(length(text) - {kgram - 1}, 0))) AS i
      FROM docs
    )
  ),
  cnt AS (SELECT id, count(*) AS n FROM hseq GROUP BY id),
  small AS (
    SELECT h.id, h.h
    FROM hseq h JOIN cnt c ON c.id = h.id AND c.n <= {window}
    QUALIFY row_number() OVER (PARTITION BY h.id ORDER BY h.h ASC, h.i DESC) = 1
  ),
  starts AS (
    SELECT id, unnest(generate_series(1, n - {window - 1})) AS s
    FROM cnt WHERE n > {window}
  ),
  picked AS (
    SELECT st.id, st.s, h.h
    FROM starts st
    JOIN hseq h ON h.id = st.id AND h.i BETWEEN st.s AND st.s + {window - 1}
    QUALIFY row_number() OVER (PARTITION BY st.id, st.s
                               ORDER BY h.h ASC, h.i DESC) = 1
  ),
  fps AS (
    SELECT DISTINCT id, h FROM picked
    UNION
    SELECT DISTINCT id, h FROM small
  )
SELECT id AS doc_id,
       (row_number() OVER (PARTITION BY id ORDER BY h) - 1)::INT AS pos,
       h AS fingerprint
FROM fps
"""


# ---------------------------------------------------------------------------
# simhash oracle
# ---------------------------------------------------------------------------

def _wrapmul_sql(x: str, m: int) -> str:
    """``(x * m) mod 2**64`` for a u64-ranged expression ``x`` and a
    constant ``m`` that may exceed 2**63 (the direct HUGEINT product would
    overflow 128 bits): split ``m`` into 32-bit halves, so each partial
    product stays below 2**96."""
    m_lo, m_hi = m & 0xFFFFFFFF, m >> 32
    return (
        f"((({x}) * {m_lo} + ((({x}) * {m_hi}) % {_MASK32}) * {_MASK32})"
        f" % {_H64})"
    )


def _splitmix_sql(h: str, shift: int, mult: int | None) -> str:
    x = f"xor(({h})::UBIGINT, (({h}) // {1 << shift})::UBIGINT)::HUGEINT"
    if mult is None:
        return f"({x})"
    return _wrapmul_sql(x, mult)


def simhash_pairs_sql(max_hamming: int = 3) -> str:
    """Oracle for ``simhash_near_dup_pairs``: 64-bit simhash over
    whitespace tokens (FxHash-u32 token hash spread to 64 bits with the
    splitmix finalizer), 4×16-bit block pigeonhole candidates, exact
    hamming ≤ ``max_hamming``."""
    spread = _splitmix_sql(
        _splitmix_sql(_splitmix_sql("th", 30, 0xBF58476D1CE4E5B9),
                      27, 0x94D049BB133111EB),
        31, None)
    return f"""
WITH
  docs AS (SELECT doc_id AS id, text FROM documents),
  toks AS (
    SELECT id, unnest(list_filter(string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+'),
                                  t -> t != '')) AS tok
    FROM docs
  ),
  th AS (SELECT id, {string_hash_sql('tok')} AS th FROM toks),
  h64 AS (SELECT id, {spread} AS h FROM th),
  votes AS (
    SELECT id, b.b AS bit,
           sum(CASE WHEN ((h::UBIGINT >> b.b) & 1) = 1 THEN 1 ELSE -1 END) AS v
    FROM h64 CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) b
    GROUP BY 1, 2
  ),
  sigs AS (
    SELECT d.id,
           coalesce((SELECT sum((1::UBIGINT << bit)::HUGEINT)
                     FROM votes v WHERE v.id = d.id AND v.v > 0),
                    0)::HUGEINT AS u
    FROM docs d
  ),
  blocks AS (
    SELECT id, u, b.b AS block_idx,
           (u::UBIGINT >> (b.b * 16)) & 65535 AS block_val
    FROM sigs CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b) b
  ),
  cand AS (
    SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.u AS ua, b.u AS ub
    FROM blocks a JOIN blocks b
      ON a.block_idx = b.block_idx AND a.block_val = b.block_val
         AND a.id < b.id
  )
SELECT id_a, id_b,
       bit_count(xor(ua::UBIGINT, ub::UBIGINT))::INT AS hamming
FROM cand
WHERE bit_count(xor(ua::UBIGINT, ub::UBIGINT)) <= {max_hamming}
"""


# ---------------------------------------------------------------------------
# euclidean-LSH oracles (inlined Gaussian projection tables)
# ---------------------------------------------------------------------------

def _f64(x: float) -> str:
    """Shortest round-trip literal of a float64 (DuckDB parses to the
    nearest double — exact)."""
    return repr(float(x))


def _euclidean_r_exprs(bucket_width: float, band: int, band_size: int,
                       dim: int, a_stack, b_stack,
                       vec: str = "embedding") -> list[str]:
    """Per-band bucket expressions ``r_j`` (saturating u64 of
    ``ceil((x·A_j + b_j)/w)``) with the dot product folded in the kernel's
    exact order: acc starts 0.0, += x[k]*A[k,j] for k ascending, then +b."""
    out = []
    for j in range(band_size):
        a_lit = "[" + ", ".join(_f64(a_stack[band, k, j]) for k in range(dim)) + "]"
        acc = (
            f"list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform(generate_series(1, {dim}), "
            f"k -> {vec}[k]::DOUBLE * ({a_lit}::DOUBLE[])[k])), "
            f"(p, q) -> p + q)"
        )
        c = f"ceil((({acc}) + {_f64(b_stack[band, j])}) / {_f64(bucket_width)})"
        out.append(c)
    return out


def _saturate_u64(c: str) -> str:
    """Rust ``as u64`` saturating f64→u64 cast (NaN→0, <0→0, ≥2**64→MAX)."""
    return (
        f"(CASE WHEN isnan({c}) THEN 0::HUGEINT "
        f"WHEN ({c}) <= 0.0 THEN 0::HUGEINT "
        f"WHEN ({c}) >= 18446744073709551616.0 THEN {_U64MAX}::HUGEINT "
        f"ELSE ({c})::UBIGINT::HUGEINT END)"
    )


def euclidean_bands_cte(bucket_width: float, band_count: int, band_size: int,
                        seed: int, dim: int, *, source: str = "embeddings",
                        id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    """CTE body ``ebands(id, band_idx, h)`` with unsigned u64 band hashes of
    the Euclidean LSH (``src/euclidean_hash.rs:77-94``): per band, bucket
    indices then the ndarray-Hash fold (shape prefix [1, band_size], then
    each bucket)."""
    from .._core.euclidean import euclidean_tables
    from .._core.fxhash import fx_add

    a_stack, b_stack = euclidean_tables(
        float(bucket_width), band_count, band_size, dim, seed)
    # constant fold of the shape prefix: fx_add(fx_add(0, 1), band_size)
    st0 = fx_add(fx_add(0, 1), band_size)
    selects = []
    for band in range(band_count):
        cs = _euclidean_r_exprs(bucket_width, band, band_size, dim,
                                a_stack, b_stack, vec="v")
        inner = ", ".join(f"{c} AS c{j}" for j, c in enumerate(cs))
        state = str(st0)
        for j in range(band_size):
            state = fx_add_sql(state, _saturate_u64(f"c{j}"))
        selects.append(
            f"SELECT id, {band} AS band_idx, {state} AS h FROM "
            f"(SELECT id, {inner} FROM evecs)"
        )
    union = " UNION ALL ".join(selects)
    return f"""
  evecs AS (SELECT {id_col} AS id, {vec_col} AS v FROM {source}),
  ebands AS ({union})"""


def euclidean_signatures_sql(bucket_width: float, band_count: int,
                             band_size: int, seed: int, dim: int,
                             *, low32: bool = False) -> str:
    """Oracle for ``lsh_euclidean`` / ``lsh_euclidean32`` over embeddings,
    exploded to ``(vec_id, band_idx, band_hash)``."""
    return f"""
WITH {euclidean_bands_cte(bucket_width, band_count, band_size, seed, dim)}
SELECT id AS vec_id, band_idx::INT AS band_idx,
       {_hash_repr('h', low32)} AS band_hash
FROM ebands
"""


def ann_lsh_topk_sql(bucket_width: float, band_count: int, band_size: int,
                     seed: int, dim: int, *, k: int = 10,
                     n_queries: int = 10) -> str:
    """Oracle for ``euclidean_lsh_topk``: candidates sharing ≥1 Euclidean
    LSH band with a query (vec_id < n_queries), reranked by exact cosine
    (6dp) with neighbor-id tie-break."""
    return f"""
WITH {euclidean_bands_cte(bucket_width, band_count, band_size, seed, dim)},
  cand AS (
    SELECT DISTINCT q.id AS query_id, c.id AS neighbor_id
    FROM ebands q JOIN ebands c
      ON q.band_idx = c.band_idx AND q.h = c.h AND q.id != c.id
    WHERE q.id < {n_queries}
  ),
  vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
  scored AS (
    SELECT cd.query_id, cd.neighbor_id,
           round(CASE WHEN sqrt(list_dot_product(qv.v, qv.v)) > 0
                       AND sqrt(list_dot_product(cv.v, cv.v)) > 0
                 THEN list_dot_product(qv.v, cv.v)
                      / (sqrt(list_dot_product(qv.v, qv.v))
                         * sqrt(list_dot_product(cv.v, cv.v)))
                 ELSE 0.0 END, 6) AS cosine_sim
    FROM cand cd
    JOIN vecs qv ON qv.vec_id = cd.query_id
    JOIN vecs cv ON cv.vec_id = cd.neighbor_id
  ),
  ranked AS (
    SELECT query_id, neighbor_id, cosine_sim,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
    FROM scored
  )
SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= {k}
"""


def embedding_near_dup_lsh_sql(bucket_width: float, band_count: int,
                               band_size: int, seed: int, dim: int,
                               threshold: float) -> str:
    """Oracle for ``dedup.embedding_near_dup_lsh``: pairs sharing ≥1
    Euclidean-LSH band (same inlined projection tables as the signature
    oracles), verified by exact cosine (6dp) ≥ threshold."""
    return f"""
WITH {euclidean_bands_cte(bucket_width, band_count, band_size, seed, dim)},
  cand AS (
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM ebands a JOIN ebands b
      ON a.band_idx = b.band_idx AND a.h = b.h AND a.id < b.id
  ),
  vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
  scored AS (
    SELECT cd.id_a, cd.id_b,
           round(CASE WHEN sqrt(list_dot_product(av.v, av.v)) > 0
                       AND sqrt(list_dot_product(bv.v, bv.v)) > 0
                 THEN list_dot_product(av.v, bv.v)
                      / (sqrt(list_dot_product(av.v, av.v))
                         * sqrt(list_dot_product(bv.v, bv.v)))
                 ELSE 0.0 END, 6) AS cosine_sim
    FROM cand cd
    JOIN vecs av ON av.vec_id = cd.id_a
    JOIN vecs bv ON bv.vec_id = cd.id_b
  )
SELECT id_a, id_b, cosine_sim FROM scored WHERE cosine_sim >= {threshold}
"""


def dedup_keep_longest_sql(ngram_width: int, band_count: int,
                           band_size: int, seed: int) -> str:
    """Oracle for ``lsh_dedup_keep_longest``: true CC over the
    band-collision graph, then quality-aware retention — each component
    keeps its LONGEST document (ties on lowest doc_id)."""
    return f"""
WITH RECURSIVE {char_shingles_cte(ngram_width)},
{minhash_bands_ctes(band_count, band_size, seed)},
  edges AS (
    SELECT DISTINCT a.id AS src, b.id AS dst
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.h = b.h AND a.id != b.id
  ),
  reach(id, r) AS (
    SELECT id, id FROM docs
    UNION
    SELECT e.src, w.r FROM edges e JOIN reach w ON w.id = e.dst
  ),
  labels AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
SELECT d.doc_id, l.cluster_id, length(d.text)::INT AS n_chars
FROM documents d JOIN labels l ON l.id = d.doc_id
QUALIFY row_number() OVER (PARTITION BY l.cluster_id
                           ORDER BY length(d.text) DESC, d.doc_id) = 1
"""
