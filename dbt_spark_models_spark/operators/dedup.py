"""Deduplication operators for LLM training-data pipelines.

Beyond-reference surface (BASELINE.json north star). All variants avoid
driver-side loops and all-pairs comparison:

- exact:     hash-groupBy on a content signature (reference pattern
             ``models/spark/onfy/onfy_product_analogues.sql:50-57``).
- jaccard:   inverted-index join on tokens (posting lists), never N².
- minhash:   shingle → 16 hash permutations → 4 LSH bands → bucket join;
             only same-bucket candidates are verified. This is the 100 TB
             path: cost scales with bucket collisions, not pairs.
- simhash:   bitwise majority fingerprint; equal fingerprints cluster.

Cross-engine determinism: token/shingle ids use a polynomial rolling hash
(mod 1e9+7) computed with the same fold in Spark and the DuckDB oracle —
engine-native hashes (xxhash64 etc.) differ across engines and are only
used in non-oracle paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_spark_models_spark.operators import query
from dbt_spark_models_spark.sources.testdata import load_tables, spread

_MOD = 1_000_000_007
# 16 fixed (a, b) affine permutation constants for MinHash
_PERMS = [
    (2971, 433494437), (4423, 370248451), (5851, 275604541), (6007, 102334155),
    (7919, 39088169), (9311, 14930352), (10957, 5702887), (12823, 2178309),
    (15101, 832040), (17389, 317811),
    (19427, 121393), (21841, 46368), (24473, 17711), (27449, 6765),
    (30757, 2584), (34513, 987),
]

_N_BANDS = 4
_ROWS_PER_BAND = 4


def _polyhash_spark(col_expr: str) -> str:
    """Spark SQL text: polynomial rolling hash of a string, mod 1e9+7."""
    return f"""aggregate(
        transform(sequence(1, length({col_expr})),
                  i -> CAST(ascii(substring({col_expr}, i, 1)) AS BIGINT)),
        CAST(0 AS BIGINT),
        (acc, x) -> (acc * 31 + x) % {_MOD})"""


def _polyhash_duck(col_expr: str) -> str:
    """DuckDB SQL text for the same polynomial rolling hash."""
    return f"""list_reduce(
        list_prepend(CAST(0 AS BIGINT),
            list_transform(generate_series(1, len({col_expr})),
                           i -> CAST(ascii(substring({col_expr}, i, 1)) AS BIGINT))),
        (acc, x) -> (acc * 31 + x) % {_MOD})"""


def _tokens():
    return F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: F.length(x) > 0)


@query(
    "dedup_exact_groups",
    oracle="""
SELECT MD5(LOWER(TRIM(text))) AS content_hash,
       MIN(doc_id) AS canonical_doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY content_hash
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: normalize → MD5 content signature → hash groupBy.
    One shuffle on the hash; at 100 TB, partial aggregation collapses
    duplicates map-side first."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (
        d.withColumn("content_hash", F.md5(F.lower(F.trim(F.col("text")))))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@query(
    "dedup_keep_first_survivors",
    oracle="""
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM (
    SELECT lang, n_chars,
           ROW_NUMBER() OVER (PARTITION BY MD5(LOWER(TRIM(text)))
                              ORDER BY doc_id) AS rn
    FROM documents
) WHERE rn = 1
GROUP BY lang
""",
)
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-keep-first via ROW_NUMBER over the content hash (the
    reference's dedup idiom, ``models/spark/gold/gold_orders.sql:24``),
    then corpus stats over survivors."""
    from pyspark.sql import Window

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    w = Window.partitionBy(F.md5(F.lower(F.trim(F.col("text"))))).orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


@query(
    "dedup_token_jaccard_pairs",
    oracle="""
WITH tok AS (
    SELECT DISTINCT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                              x -> len(x) > 0)) AS token
    FROM documents
), sizes AS (
    SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id
), common AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
    FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
    GROUP BY doc_a, doc_b
)
SELECT doc_a, doc_b,
       ROUND(n_common / (sa.sz + sb.sz - n_common), 4) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common / (sa.sz + sb.sz - n_common) >= 0.6
""",
)
def dedup_token_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard near-dup pairs at threshold 0.6 over the
    WHOLE corpus — same lossless prefix-filter join as
    ``dedup_jaccard_prefix_filter`` (see ``jaccard_prefix_join``), at a
    moderate threshold (larger prefixes, more candidates — the PPJoin
    trade). The oracle is the UNFILTERED posting self-join ground truth,
    so the driver verifies losslessness at this threshold too. (The
    historical demo-slice posting join this replaces lives on as the
    reference implementation inside tests/test_property_differential.py.)"""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    return jaccard_prefix_join(d, 3, 5)


def _perm_values_sql() -> str:
    rows = ", ".join(
        f"({i}, CAST({a} AS BIGINT), CAST({b} AS BIGINT))"
        for i, (a, b) in enumerate(_PERMS)
    )
    return f"(VALUES {rows}) AS perms(i, a, b)"


@query(
    "dedup_minhash_lsh_pairs",
    oracle=f"""
WITH tok AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> len(x) > 0) AS tokens
    FROM documents
), th AS (
    SELECT doc_id,
           list_transform(tokens, t -> { _polyhash_duck('t') }) AS hts
    FROM tok
    WHERE len(tokens) >= 3
), shingle AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(generate_series(1, len(hts) - 2),
                  i -> (hts[i] * 1000003 + hts[i+1] * 31 + hts[i+2]) % {_MOD})))
               AS tid
    FROM th
), hashed AS (
    SELECT doc_id, tid FROM shingle
), minh AS (
    SELECT doc_id, perms.i AS i, MIN((perms.a * tid + perms.b) % {_MOD}) AS mh
    FROM hashed CROSS JOIN {_perm_values_sql()}
    GROUP BY doc_id, perms.i
), bands AS (
    SELECT doc_id, i // {_ROWS_PER_BAND} AS band,
           STRING_AGG(CAST(mh AS VARCHAR), '-' ORDER BY i) AS band_sig
    FROM minh GROUP BY doc_id, band
), cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
), sizes AS (
    SELECT doc_id, COUNT(*) AS sz FROM shingle GROUP BY doc_id
), verified AS (
    SELECT c.doc_a, c.doc_b, COUNT(s2.tid) AS n_common
    FROM cand c
    JOIN shingle s1 ON s1.doc_id = c.doc_a
    LEFT JOIN shingle s2 ON s2.doc_id = c.doc_b AND s2.tid = s1.tid
    GROUP BY c.doc_a, c.doc_b
)
SELECT v.doc_a, v.doc_b,
       ROUND(v.n_common / (sa.sz + sb.sz - v.n_common), 4) AS jaccard
FROM verified v
JOIN sizes sa ON sa.doc_id = v.doc_a
JOIN sizes sb ON sb.doc_id = v.doc_b
""",
)
def dedup_minhash_lsh(
    spark: SparkSession, sf_dir: str, with_exact: bool = False
) -> DataFrame:
    """MinHash + LSH near-dup detection, the 100 TB dedup path:
    3-token shingles → deterministic shingle ids (polynomial hash) →
    16 affine min-hash permutations → 4 bands of 4 → bucket self-join on
    (band, signature) → Jaccard verification of candidates only.

    No all-pairs stage exists anywhere: candidate generation is a shuffle
    on band signatures, verification joins only surviving candidate pairs.
    """
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    tok = d.select("doc_id", _tokens().alias("tokens")).filter(
        F.size("tokens") >= 3
    )
    # hash each TOKEN once (each char read once, not 3× per overlapping
    # shingle), combine token hashes per shingle arithmetically, and
    # dedupe row-locally with array_distinct. The shingle set STAYS an
    # in-row array end to end (r11, guide §2.4): the 16 minhashes and the
    # set size are row-local folds over the document's own array, so the
    # pre-r11 explode (|shingles| rows/doc) and the groupBy(doc_id)
    # re-aggregation exchange never happen.
    th = tok.select(
        "doc_id",
        F.expr(f"transform(tokens, t -> { _polyhash_spark('t') })").alias("hts"),
    )
    # base feeds three plan branches (band signatures + both sides of the
    # candidate verification); Spark evaluates each branch from scratch,
    # re-tokenizing and re-hashing every document. Materialize it once —
    # locally a disk-spillable persist; at 100 TB this is the "write the
    # doc→shingle-set table, then join against it" stage a production
    # pipeline runs anyway. LRU eviction reclaims it; results unchanged.
    base = (
        th.select(
            "doc_id",
            F.expr(
                "array_distinct(transform(sequence(1, size(hts) - 2),"
                f" i -> (hts[i-1] * 1000003 + hts[i] * 31 + hts[i+1]) % {_MOD}))"
            ).alias("tids"),
        )
        .select(
            "doc_id",
            "tids",
            F.size("tids").cast("long").alias("sz"),
            *[
                F.array_min(
                    F.expr(f"transform(tids, t -> ({a} * t + {b}) % {_MOD})")
                ).alias(f"mh{i}")
                for i, (a, b) in enumerate(_PERMS)
            ],
        )
        .persist()
    )
    # bands as row-local concat + posexplode (no shuffle)
    band_cols = [
        F.concat_ws(
            "-",
            *[
                F.col(f"mh{i}").cast("string")
                for i in range(b * _ROWS_PER_BAND, (b + 1) * _ROWS_PER_BAND)
            ],
        )
        for b in range(_N_BANDS)
    ]
    bands = base.select(
        "doc_id", F.posexplode(F.array(*band_cols)).alias("band", "band_sig")
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # verification is ROW-LOCAL per candidate pair: join the two cached
    # shingle ARRAYS and intersect in place (same device as
    # jaccard_prefix_join) — no posting re-join multiplies candidates by
    # shingles-per-doc, and the per-(doc,tid) shuffle of the pre-r11
    # LEFT-join count disappears. n_common = |intersection| exactly
    # (tids are distinct).
    ba = base.select(F.col("doc_id").alias("da"), F.col("tids").alias("ta"),
                     F.col("sz").alias("sza"))
    bb = base.select(F.col("doc_id").alias("db"), F.col("tids").alias("tb"),
                     F.col("sz").alias("szb"))
    scored = (
        cand.join(ba, F.col("da") == F.col("doc_a"))
        .join(bb, F.col("db") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("ta", "tb")).cast("long").alias("n_common"),
            "sza",
            "szb",
        )
    )
    jac = F.col("n_common") / (F.col("sza") + F.col("szb") - F.col("n_common"))
    # with_exact adds the UNROUNDED ratio for downstream consumers that
    # threshold it (eval_split_leakage at j>=0.9): thresholding the
    # 4-decimal display value would keep a pair with true j in
    # [0.89995, 0.9) that the exact-ratio oracle drops (ADVICE r3).
    cols = ["doc_a", "doc_b", F.round(jac, 4).alias("jaccard")]
    if with_exact:
        cols.append(jac.alias("jaccard_exact"))
    return scored.select(*cols)


@query(
    "dedup_jaccard_prefix_filter",
    oracle="""
WITH tok AS (
    SELECT DISTINCT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                              x -> len(x) > 0)) AS token
    FROM documents
), sizes AS (
    SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id
), common AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
    FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
    GROUP BY doc_a, doc_b
)
SELECT doc_a, doc_b,
       ROUND(n_common / (sa.sz + sb.sz - n_common), 4) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common / (sa.sz + sb.sz - n_common) >= 0.9
""",
)
def dedup_jaccard_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT token-Jaccard join over the WHOLE corpus via prefix filtering
    (PPJoin family) at threshold 0.9 — see ``jaccard_prefix_join``. The
    oracle is the unfiltered ground truth, so the driver verifies the
    losslessness claim itself, not a replica of the pruning."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    return jaccard_prefix_join(d, 9, 10)


def jaccard_prefix_join(d: DataFrame, t_num: int, t_den: int) -> DataFrame:
    """EXACT token-Jaccard self-join at threshold ``t_num/t_den`` via
    prefix filtering (PPJoin family) — the lossless fix for the
    posting-join quadratic blowup.

    Tokens get a global rarity order (document frequency asc, token asc);
    each document only indexes its first ``sz - ceil(t*sz) + 1`` tokens in
    that order. Any pair with Jaccard >= t MUST share a token inside both
    prefixes (the globally-smallest common token is provably in each), so
    joining prefix postings loses nothing — while hot tokens (stopwords)
    land in almost no prefix, removing exactly the postings that explode.

    Candidate volume is bounded twice: prefixes only hold rare tokens
    (df-ordered), and PPJoin's LENGTH FILTER drops any pair whose sizes
    alone cap Jaccard below t (J <= min_sz/max_sz, so require
    min_sz*t_den >= max_sz*t_num) before the distinct. Verification is
    ROW-LOCAL — each candidate pair joins the two (already-distinct)
    token ARRAYS and intersects them in place (`array_intersect`, hash
    set per row), so no posting re-join ever multiplies candidates by
    tokens-per-doc. The prefix length is integer arithmetic
    (ceil(t*sz) = floor((t_num*sz + t_den - 1)/t_den)) so plans are
    engine-exact.

    On a near-dup-saturated corpus (the sf0.1 synthetic table yields 7M
    qualifying pairs from 5k docs at t=0.6) runtime is output-volume
    bound — no candidate filter can beat the size of the correct answer;
    real corpora are far sparser. For cluster-level dedup at that density,
    feed these pairs to connected components instead of materializing all
    of them."""
    # doc -> distinct token array: feeds the posting explode AND both
    # verification sides — materialize once, the same write-then-join
    # staging a production all-pairs job uses
    base = (
        d.select("doc_id", F.array_distinct(_tokens()).alias("toks"))
        .withColumn("sz", F.size("toks").cast("long"))
        .persist()
    )
    tok = base.select("doc_id", "sz", F.explode("toks").alias("token"))
    dfreq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    w_rank = Window.partitionBy("doc_id").orderBy("df", "token")
    ranked = (
        tok.join(dfreq, "token")
        .withColumn("rk", F.row_number().over(w_rank))
        .withColumn(
            "p",
            F.col("sz")
            - F.floor((t_num * F.col("sz") + t_den - 1) / t_den).cast("long")
            + 1,
        )
    )
    prefix = ranked.filter(F.col("rk") <= F.col("p")).select(
        "doc_id", "sz", "token"
    )
    pa, pb = prefix.alias("pa"), prefix.alias("pb")
    cand = (
        pa.join(
            pb,
            (F.col("pa.token") == F.col("pb.token"))
            & (F.col("pa.doc_id") < F.col("pb.doc_id"))
            # length filter: J <= min_sz/max_sz < t ⇒ prune losslessly
            & (
                F.least(F.col("pa.sz"), F.col("pb.sz")) * t_den
                >= F.greatest(F.col("pa.sz"), F.col("pb.sz")) * t_num
            ),
        )
        .select(
            F.col("pa.doc_id").alias("doc_a"), F.col("pb.doc_id").alias("doc_b")
        )
        .distinct()
    )
    ba, bb = base.alias("ba"), base.alias("bb")
    scored = (
        cand.join(ba, F.col("ba.doc_id") == F.col("doc_a"))
        .join(bb, F.col("bb.doc_id") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect(F.col("ba.toks"), F.col("bb.toks")))
            .cast("long")
            .alias("n_common"),
            F.col("ba.sz").alias("sza"),
            F.col("bb.sz").alias("szb"),
        )
    )
    jac = F.col("n_common") / (F.col("sza") + F.col("szb") - F.col("n_common"))
    return (
        scored.filter(jac >= t_num / t_den)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


# DuckDB CTE chain computing (doc_id, simhash16) — shared by the
# fingerprint query and the banded Hamming near-dup pairs
_SIMHASH_DUCK_CTES = f"""tok AS (
    SELECT DISTINCT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                              x -> len(x) > 0)) AS token
    FROM documents
), hashed AS (
    SELECT doc_id, { _polyhash_duck('token') } AS th FROM tok
), bits AS (
    SELECT doc_id, b.bit AS bit,
           SUM(CASE WHEN (th >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
    FROM hashed CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS bit) b
    GROUP BY doc_id, b.bit
), sigs AS (
    SELECT doc_id,
           CAST(SUM(CASE WHEN v > 0 THEN (1 << bit) ELSE 0 END) AS BIGINT)
               AS simhash16
    FROM bits GROUP BY doc_id
)"""


def simhash_fingerprints(d: DataFrame) -> DataFrame:
    """(doc_id, simhash16) computed entirely ROW-LOCALLY: the bit-majority
    votes are per-document sums over the document's own distinct-token
    hash array, so the whole fingerprint pass is one corpus scan with
    ZERO exchanges — the pre-r11 form exploded tokens and ran a
    groupBy(doc_id) with 16 conditional sums, paying a hash aggregate and
    a per-doc exchange for numbers each row can compute by itself. The
    empty-token filter reproduces the explode form's behavior of dropping
    tokenless documents."""
    toks_sql = "filter(split(lower(text), '[^a-z0-9]+'), x -> length(x) > 0)"
    hts = d.select(
        "doc_id",
        F.expr(
            f"transform(array_distinct({toks_sql}),"
            f" t -> {_polyhash_spark('t')})"
        ).alias("hts"),
    ).filter(F.size("hts") >= 1)
    votes = hts.select(
        "doc_id",
        *[
            F.expr(
                f"aggregate(hts, CAST(0 AS BIGINT),"
                f" (acc, h) -> acc + IF(((h >> {b}) & 1) = 1, 1L, -1L))"
            ).alias(f"v{b}")
            for b in range(16)
        ],
    )
    fingerprint = None
    for b in range(16):
        term = F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fingerprint = term if fingerprint is None else fingerprint + term
    return votes.select(
        "doc_id", fingerprint.cast("long").alias("simhash16")
    )


@query(
    "dedup_simhash_fingerprints",
    oracle=f"""
WITH {_SIMHASH_DUCK_CTES}
SELECT doc_id, simhash16 FROM sigs
""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (16-bit here; 64-bit in production) — bitwise majority vote
    over token hashes. Equal/near fingerprints cluster near-duplicates."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    return simhash_fingerprints(d)


@query(
    "dedup_simhash_hamming_pairs",
    oracle=f"""
WITH {_SIMHASH_DUCK_CTES},
banded AS (
    SELECT doc_id, simhash16, 0 AS band, simhash16 & 255 AS bval FROM sigs
    UNION ALL
    SELECT doc_id, simhash16, 1 AS band, (simhash16 >> 8) & 255 AS bval
    FROM sigs
), cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.simhash16 AS ha, b.simhash16 AS hb
    FROM banded a
    JOIN banded b ON a.band = b.band AND a.bval = b.bval
                  AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(CAST(xor(ha, hb) AS BIGINT)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(CAST(xor(ha, hb) AS BIGINT)) <= 3
""",
)
def dedup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate PAIRS via banded candidate generation: the
    16-bit fingerprint splits into two 8-bit bands, candidates are
    band-bucket collisions (never the n² cross join), verification is one
    integer ``bit_count(xor)`` per candidate. By pigeonhole, any pair at
    Hamming distance ≤ 1 must agree on some band (guaranteed recall);
    distance 2-3 pairs are caught only when both flipped bits fall in one
    band — more/wider bands trade recall vs candidate volume exactly like
    MinHash LSH bands.

    Scale: candidate volume is Σ_bucket n²/2 within 8-bit band buckets;
    production uses 64-bit fingerprints with 4×16-bit bands, and the
    bucket join shuffles only (band, bval) — the same bounded-candidates
    design as ``dedup_minhash_lsh_pairs``."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    sigs = simhash_fingerprints(d)
    banded = sigs.select(
        "doc_id",
        "simhash16",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("band"),
                    F.expr("simhash16 & 255").alias("bval"),
                ),
                F.struct(
                    F.lit(1).alias("band"),
                    F.expr("(simhash16 >> 8) & 255").alias("bval"),
                ),
            )
        ).alias("b"),
    ).select("doc_id", "simhash16", "b.band", "b.bval")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash16").alias("ha"),
            F.col("b.simhash16").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.expr("bit_count(ha ^ hb)").cast("long"))
        .filter(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
    )


_CHUNK = 20


@query(
    "dedup_chunk_substring_overlap",
    oracle=f"""
WITH tok AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> len(x) > 0) AS tokens
    FROM documents
), chunks AS (
    SELECT doc_id,
           UNNEST(list_transform(generate_series(0, len(tokens) // {_CHUNK} - 1),
                  i -> MD5(array_to_string(
                         list_slice(tokens, i * {_CHUNK} + 1, (i + 1) * {_CHUNK}),
                         ' ')))) AS chunk_hash
    FROM tok WHERE len(tokens) >= {_CHUNK}
), shared AS (
    SELECT chunk_hash FROM chunks
    GROUP BY chunk_hash HAVING COUNT(DISTINCT doc_id) > 1
)
SELECT c.doc_id,
       COUNT(*) AS n_chunks,
       COUNT(s.chunk_hash) AS n_shared_chunks,
       ROUND(COUNT(s.chunk_hash) / COUNT(*), 4) AS shared_fraction
FROM chunks c LEFT JOIN shared s ON c.chunk_hash = s.chunk_hash
GROUP BY c.doc_id
""",
)
def dedup_chunk_substring_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact substring dedup (the scalable stand-in for
    suffix-array substring dedup à la "Deduplicating Training Data Makes
    Language Models Better": fixed 20-token chunks hashed exactly): per
    document, the fraction of its chunks that also appear verbatim in
    another document.

    Scale: chunking is row-local; the shared-chunk table is one
    map-side-combined groupBy on the hash (shuffle volume = distinct
    chunks, uniform key distribution by construction); re-join is
    hash-partitioned on the same key. No pairwise stage — cross-doc
    overlap is detected through the inverted chunk index, so cost is
    linear in corpus size at any scale."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    tok = d.select("doc_id", _tokens().alias("tokens")).filter(
        F.size("tokens") >= _CHUNK
    )
    # chunks feeds the shared-chunk index AND the per-doc rejoin: persist
    # so the tokenize + md5 chunking runs once, not once per branch
    chunks = tok.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(tokens) div {_CHUNK} - 1),"
                f" i -> md5(array_join(slice(tokens, i * {_CHUNK} + 1, {_CHUNK}),"
                f" ' ')))"
            )
        ).alias("chunk_hash"),
    ).persist()
    # "appears in >1 distinct doc" ⟺ min(doc_id) != max(doc_id): two plain
    # min/max aggregates partial-combine map-side, where COUNT(DISTINCT)
    # planned an Expand + second aggregate (r11, guide §2.3)
    shared = (
        chunks.groupBy("chunk_hash")
        .agg(F.min("doc_id").alias("d0"), F.max("doc_id").alias("d1"))
        .filter(F.col("d0") != F.col("d1"))
        .select("chunk_hash", F.lit(1).alias("hit"))
    )
    return (
        chunks.join(shared, "chunk_hash", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.count("hit").alias("n_shared_chunks"),
            F.round(F.count("hit") / F.count(F.lit(1)), 4).alias(
                "shared_fraction"
            ),
        )
    )


@query(
    "dedup_span_removal_reassembled",
    oracle=f"""
WITH tok AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> len(x) > 0) AS tokens
    FROM documents
), chunks AS (
    SELECT doc_id, i AS pos,
           array_to_string(
               list_slice(tokens, i * {_CHUNK} + 1, (i + 1) * {_CHUNK}),
               ' ') AS chunk
    FROM tok, UNNEST(generate_series(0,
             CAST(CEIL(len(tokens) / {_CHUNK}) AS BIGINT) - 1)) AS t(i)
    WHERE len(tokens) > 0
), kept AS (
    SELECT doc_id, pos, chunk,
           ROW_NUMBER() OVER (PARTITION BY md5(chunk)
                              ORDER BY doc_id, pos) AS occ
    FROM chunks
)
SELECT doc_id,
       COALESCE(string_agg(CASE WHEN occ = 1 THEN chunk END, ' '
                           ORDER BY pos), '') AS clean_text,
       COUNT(*) FILTER (occ = 1) AS n_kept_chunks,
       COUNT(*) FILTER (occ > 1) AS n_dropped_chunks
FROM kept
GROUP BY doc_id
""",
)
def dedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style duplicate-SPAN removal with document reassembly: the corpus
    is cut into fixed 20-token spans, every span that occurred earlier
    anywhere in the corpus (global keep-FIRST by (doc_id, position)) is
    deleted, and each document's surviving spans are stitched back together
    in order — producing the cleaned corpus itself, not just overlap
    scores (that's ``dedup_chunk_substring_overlap``). This is the
    operation C4 runs at sentence/3-line granularity and the reference
    approximates with downstream row dedup
    (``models/spark/gold/gold_orders.sql:24``).

    Scale: span hashing is row-local; keep-first is ONE window shuffle
    partitioned by the span hash (high-cardinality, uniform by
    construction — per-partition state is the tiny occurrence list of one
    span); reassembly is ONE shuffle back on doc_id building a bounded
    per-document array. No pairwise comparisons, cost linear in corpus
    size — the plan at 100 TB is the same two exchanges."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    tok = d.select("doc_id", _tokens().alias("tokens")).filter(
        F.size("tokens") > 0
    )
    chunks = tok.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, int(ceil(size(tokens) / {_CHUNK})) - 1),"
                f" i -> array_join(slice(tokens, i * {_CHUNK} + 1, {_CHUNK}), ' '))"
            )
        ).alias("pos", "chunk"),
    )
    w = Window.partitionBy(F.md5(F.col("chunk"))).orderBy("doc_id", "pos")
    kept = chunks.withColumn("occ", F.row_number().over(w))
    return kept.groupBy("doc_id").agg(
        F.array_join(
            F.expr(
                "transform(array_sort(collect_list(CASE WHEN occ = 1 THEN"
                " struct(pos, chunk) END)), s -> s.chunk)"
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.when(F.col("occ") == 1, 1)).alias("n_kept_chunks"),
        F.count(F.when(F.col("occ") > 1, 1)).alias("n_dropped_chunks"),
    )


@query(
    "dedup_incremental_vs_corpus",
    oracle="""
WITH tok AS (
    SELECT DISTINCT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                              x -> len(x) > 0)) AS token
    FROM documents
), sizes AS (
    SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id
), common AS (
    SELECT c.doc_id AS corpus_doc, i.doc_id AS incr_doc, COUNT(*) AS n_common
    FROM tok c JOIN tok i ON c.token = i.token
    WHERE c.doc_id % 10 != 7 AND i.doc_id % 10 = 7
    GROUP BY corpus_doc, incr_doc
)
SELECT corpus_doc, incr_doc,
       ROUND(n_common / (sc.sz + si.sz - n_common), 4) AS jaccard
FROM common
JOIN sizes sc ON sc.doc_id = corpus_doc
JOIN sizes si ON si.doc_id = incr_doc
WHERE n_common / (sc.sz + si.sz - n_common) >= 0.6
""",
)
def dedup_incremental_vs_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL near-dup detection: today's crawl (the doc_id%10==7
    slice) checked against the frozen corpus (the rest) WITHOUT re-pairing
    the corpus with itself — the operation a daily ingest actually runs at
    100 TB, where corpus×corpus all-pairs would redo yesterday's work.

    Same lossless prefix-filter machinery as ``jaccard_prefix_join``, made
    asymmetric: the corpus side's prefix postings are the persistent INDEX
    (built once under the corpus-frozen token-rarity order; increment
    tokens unseen in the corpus take df=0, i.e. maximally rare — they sort
    first and can only shrink candidate lists, never lose a pair, since a
    qualifying pair must share a corpus-known token whose rank clears both
    prefixes); the increment side probes it. Candidate volume scales with
    |increment| × avg-prefix, not |corpus|²; verification is row-local
    array intersection on candidate pairs only. The oracle is the
    UNFILTERED cross-set ground truth, so the driver verifies the index
    loses nothing."""
    t_num, t_den = 3, 5
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    base = (
        d.select(
            "doc_id",
            (F.col("doc_id") % 10 == 7).alias("is_incr"),
            F.array_distinct(_tokens()).alias("toks"),
        )
        .withColumn("sz", F.size("toks").cast("long"))
        .persist()
    )
    tok = base.select("doc_id", "is_incr", "sz", F.explode("toks").alias("token"))
    # token rarity order frozen on the CORPUS postings only
    dfreq = (
        tok.filter(~F.col("is_incr"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    w_rank = Window.partitionBy("doc_id").orderBy("df", "token")
    ranked = (
        tok.join(dfreq, "token", "left")
        .withColumn("df", F.coalesce(F.col("df"), F.lit(0)))
        .withColumn("rk", F.row_number().over(w_rank))
        .withColumn(
            "p",
            F.col("sz")
            - F.floor((t_num * F.col("sz") + t_den - 1) / t_den).cast("long")
            + 1,
        )
    )
    prefix = ranked.filter(F.col("rk") <= F.col("p")).select(
        "doc_id", "is_incr", "sz", "token"
    )
    idx = prefix.filter(~F.col("is_incr")).alias("pc")
    probe = prefix.filter(F.col("is_incr")).alias("pi")
    cand = (
        idx.join(
            probe,
            (F.col("pc.token") == F.col("pi.token"))
            & (
                F.least(F.col("pc.sz"), F.col("pi.sz")) * t_den
                >= F.greatest(F.col("pc.sz"), F.col("pi.sz")) * t_num
            ),
        )
        .select(
            F.col("pc.doc_id").alias("corpus_doc"),
            F.col("pi.doc_id").alias("incr_doc"),
        )
        .distinct()
    )
    bc, bi = base.alias("bc"), base.alias("bi")
    scored = (
        cand.join(bc, F.col("bc.doc_id") == F.col("corpus_doc"))
        .join(bi, F.col("bi.doc_id") == F.col("incr_doc"))
        .select(
            "corpus_doc",
            "incr_doc",
            F.size(F.array_intersect(F.col("bc.toks"), F.col("bi.toks")))
            .cast("long")
            .alias("n_common"),
            F.col("bc.sz").alias("szc"),
            F.col("bi.sz").alias("szi"),
        )
    )
    jac = F.col("n_common") / (F.col("szc") + F.col("szi") - F.col("n_common"))
    return scored.filter(jac >= t_num / t_den).select(
        "corpus_doc", "incr_doc", F.round(jac, 4).alias("jaccard")
    )


@query(
    "dedup_edit_distance_blocked",
    oracle="""
WITH d AS (
    SELECT doc_id, text, lang,
           length(text) AS len,
           CAST(FLOOR(length(text) / 40) AS INT) AS band,
           string_split_regex(lower(text), '[^a-z0-9]+')[1] AS tok1
    FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       levenshtein(a.text, b.text) AS edit_dist,
       ROUND(levenshtein(a.text, b.text)
             / GREATEST(a.len, b.len), 4) AS rel_dist
FROM d a
JOIN d b
  ON a.lang = b.lang AND a.tok1 = b.tok1 AND a.band = b.band
 AND a.doc_id < b.doc_id
WHERE levenshtein(a.text, b.text) <= 0.25 * GREATEST(a.len, b.len)
""",
)
def dedup_edit_distance_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance (Levenshtein) near-dup pairs under explicit blocking:
    candidates must share (lang, first token, length band of 40 chars),
    then verify relative edit distance ≤ 0.25. This is the
    character-level member of the dedup family — it catches small in-place
    edits (typo fixes, template fills) that token-set Jaccard scores as
    identical and SimHash may or may not flag, at the price of an O(n·m)
    DP per verified pair.

    Blocking is deliberately RECALL-BOUNDED (unlike the lossless
    prefix-filter Jaccard path): a pair whose first token differs is
    missed by construction. That is the documented trade of every
    production edit-distance dedup — the DP is too expensive to run on
    unblocked candidates — and the oracle mirrors the block definition
    exactly, so the gate verifies the operator's declared semantics.

    Scale: the self-join key (lang, tok1, band) spreads the corpus into
    ~|langs|·|vocab|·|bands| independent blocks; per-block pair counts are
    quadratic in BLOCK size only. The length band means cross-band pairs
    (which could never pass a 25% relative threshold when lengths differ
    ≥40 chars at these doc sizes) are never generated. Spark evaluates
    ``levenshtein`` JVM-side (codegen, no Python); at 100 TB, tighten the
    band width / add a second blocking token to keep blocks bounded.
    """
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id").select(
        "doc_id",
        "text",
        "lang",
        F.length("text").alias("len"),
        F.floor(F.length("text") / 40).cast("int").alias("band"),
        F.split(F.lower("text"), "[^a-z0-9]+")[0].alias("tok1"),
    )
    a, b = d.alias("a"), d.alias("b")
    pairs = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.tok1") == F.col("b.tok1"))
        & (F.col("a.band") == F.col("b.band"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    edit = F.levenshtein(F.col("a.text"), F.col("b.text"))
    longest = F.greatest(F.col("a.len"), F.col("b.len"))
    return pairs.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        edit.alias("edit_dist"),
        F.round(edit / longest, 4).alias("rel_dist"),
    ).filter(F.col("edit_dist") <= 0.25 * longest)


@query(
    "dedup_containment_pairs",
    oracle="""
WITH tok AS (
    SELECT DISTINCT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                              x -> len(x) > 0)) AS token
    FROM documents
), sizes AS (
    SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id
), common AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
    FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id != b.doc_id
    GROUP BY doc_a, doc_b
)
SELECT doc_a, doc_b,
       ROUND(n_common / sa.sz, 4) AS containment
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common * 10 >= sa.sz * 9
""",
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional set-CONTAINMENT join at t=0.9: emit (doc_a, doc_b)
    where ≥90% of doc_a's distinct tokens appear in doc_b — the
    quote/excerpt/subset detector that symmetric Jaccard misses (a
    paragraph quoted inside a long article has high containment but low
    Jaccard). Deduplicating "A is inside B" pairs keeps the superset
    document; symmetric near-dup keeps either.

    Lossless asymmetric prefix filter (the JOIN algorithm of Xiao et
    al.'s prefix family): only the PROBE side (A) prunes to its
    df-ordered prefix of sz−⌈t·sz⌉+1 rare tokens — if containment ≥ t,
    at most ⌊(1−t)·sz_a⌋ of A's tokens miss B, so one prefix token must
    hit B's full posting list. The index side must stay complete (the
    matching token may be anywhere in B) — that asymmetry is inherent to
    containment, so candidate volume is bounded by the PROBE prefix
    (rare tokens only) times posting length, plus the length filter
    sz_b·10 ≥ sz_a·9 (B can't contain what it can't hold). Verification
    is row-local ``array_intersect`` on the two token arrays. The oracle
    is the UNFILTERED directional ground truth, so the driver verifies
    losslessness itself.
    """
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    base = (
        d.select("doc_id", F.array_distinct(_tokens()).alias("toks"))
        .withColumn("sz", F.size("toks").cast("long"))
        .persist()
    )
    tok = base.select("doc_id", "sz", F.explode("toks").alias("token"))
    dfreq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    w_rank = Window.partitionBy("doc_id").orderBy("df", "token")
    prefix = (
        tok.join(dfreq, "token")
        .withColumn("rk", F.row_number().over(w_rank))
        .filter(
            F.col("rk")
            <= F.col("sz")
            - F.floor((9 * F.col("sz") + 9) / 10).cast("long")
            + 1
        )
        .select("doc_id", "sz", "token")
    )
    pa, ib = prefix.alias("pa"), tok.alias("ib")
    cand = (
        pa.join(
            ib,
            (F.col("pa.token") == F.col("ib.token"))
            & (F.col("pa.doc_id") != F.col("ib.doc_id"))
            # length filter: n_common <= sz_b, so sz_b*10 >= sz_a*9 or prune
            & (F.col("ib.sz") * 10 >= F.col("pa.sz") * 9),
        )
        .select(
            F.col("pa.doc_id").alias("doc_a"), F.col("ib.doc_id").alias("doc_b")
        )
        .distinct()
    )
    ba, bb = base.alias("ba"), base.alias("bb")
    return (
        cand.join(ba, F.col("ba.doc_id") == F.col("doc_a"))
        .join(bb, F.col("bb.doc_id") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("ba.toks", "bb.toks"))
            .cast("long")
            .alias("n_common"),
            F.col("ba.sz").alias("sz_a"),
        )
        .filter(F.col("n_common") * 10 >= F.col("sz_a") * 9)
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("n_common") / F.col("sz_a"), 4).alias("containment"),
        )
    )


_RECALL_BUCKETS_SQL = """CASE WHEN j >= 0.7 THEN '[0.7,1.0]'
            WHEN j >= 0.3 THEN '[0.3,0.7)'
            WHEN j >= 0.1 THEN '[0.1,0.3)'
            ELSE '[0.05,0.1)' END"""


@query(
    "dedup_minhash_recall",
    oracle=f"""
WITH tok AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> len(x) > 0) AS tokens
    FROM documents
), th AS (
    SELECT doc_id,
           list_transform(tokens, t -> { _polyhash_duck('t') }) AS hts
    FROM tok
    WHERE len(tokens) >= 3
), shingle AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(generate_series(1, len(hts) - 2),
                  i -> (hts[i] * 1000003 + hts[i+1] * 31 + hts[i+2]) % {_MOD})))
               AS tid
    FROM th
), sizes AS (
    SELECT doc_id, COUNT(*) AS sz FROM shingle GROUP BY doc_id
), common AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
    FROM shingle a JOIN shingle b ON a.tid = b.tid AND a.doc_id < b.doc_id
    GROUP BY 1, 2
), truth AS (
    SELECT doc_a, doc_b,
           n_common * 1.0 / (sa.sz + sb.sz - n_common) AS j
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_common * 1.0 / (sa.sz + sb.sz - n_common) >= 0.05
), minh AS (
    SELECT doc_id, perms.i AS i, MIN((perms.a * tid + perms.b) % {_MOD}) AS mh
    FROM shingle CROSS JOIN {_perm_values_sql()}
    GROUP BY doc_id, perms.i
), bands AS (
    SELECT doc_id, i // {_ROWS_PER_BAND} AS band,
           STRING_AGG(CAST(mh AS VARCHAR), '-' ORDER BY i) AS band_sig
    FROM minh GROUP BY doc_id, band
), cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
)
SELECT {_RECALL_BUCKETS_SQL} AS jac_band,
       COUNT(*) AS n_truth,
       COUNT(c.doc_a) AS n_caught,
       ROUND(COUNT(c.doc_a) * 1.0 / COUNT(*), 4) AS recall
FROM truth t
LEFT JOIN cand c ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
GROUP BY 1
""",
)
def dedup_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the MinHash-LSH candidate generator per true-Jaccard band
    — "measure, don't guess" for the banding knobs (16 perms, 4 bands × 4
    rows target the S-curve knee near j≈0.7): ground truth is the EXACT
    shingle-Jaccard join at j ≥ 0.05 (low enough that the table shows BOTH
    ends of the S-curve: sub-threshold pairs the banding rightly misses,
    near-dup pairs it must catch), and each true pair is checked for
    membership in the band-bucket candidate set.

    Scale: the exact ground-truth join is the eval's cost — shingle
    (3-gram) postings are far more selective than single tokens, but at
    100 TB this runs on a sampled slice, while the LSH side under
    evaluation is the full production plan (one agg for 16 minhashes,
    band-bucket self-join). The recall table is what justifies the chosen
    band geometry before a full-corpus dedup run."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = _tokens()
    shingle = (
        d.select("doc_id", toks.alias("tokens"))
        .filter(F.size("tokens") >= 3)
        .select(
            "doc_id",
            F.expr(f"transform(tokens, t -> { _polyhash_spark('t') })").alias(
                "hts"
            ),
        )
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "array_distinct(transform(sequence(1, size(hts) - 2),"
                    f" i -> (hts[i-1] * 1000003 + hts[i] * 31 + hts[i+1]) % {_MOD}))"
                )
            ).alias("tid"),
        )
        .persist()
    )
    sizes = shingle.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    sa_ = shingle.alias("sa_")
    sb_ = shingle.alias("sb_")
    common = (
        sa_.join(
            sb_,
            (F.col("sa_.tid") == F.col("sb_.tid"))
            & (F.col("sa_.doc_id") < F.col("sb_.doc_id")),
        )
        .groupBy(
            F.col("sa_.doc_id").alias("doc_a"),
            F.col("sb_.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    za = sizes.alias("za")
    zb = sizes.alias("zb")
    jac = F.col("n_common") / (F.col("za.sz") + F.col("zb.sz") - F.col("n_common"))
    truth = (
        common.join(F.broadcast(za), F.col("za.doc_id") == F.col("doc_a"))
        .join(F.broadcast(zb), F.col("zb.doc_id") == F.col("doc_b"))
        .select("doc_a", "doc_b", jac.alias("j"))
        .filter(F.col("j") >= 0.05)
    )
    minh = shingle.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("tid") + F.lit(b)) % _MOD).alias(f"mh{i}")
            for i, (a, b) in enumerate(_PERMS)
        ]
    )
    band_cols = [
        F.concat_ws(
            "-",
            *[
                F.col(f"mh{i}").cast("string")
                for i in range(b * _ROWS_PER_BAND, (b + 1) * _ROWS_PER_BAND)
            ],
        )
        for b in range(_N_BANDS)
    ]
    bands = minh.select(
        "doc_id", F.posexplode(F.array(*band_cols)).alias("band", "band_sig")
    )
    ba = bands.alias("ba")
    bb = bands.alias("bb")
    cand = (
        ba.join(
            bb,
            (F.col("ba.band") == F.col("bb.band"))
            & (F.col("ba.band_sig") == F.col("bb.band_sig"))
            & (F.col("ba.doc_id") < F.col("bb.doc_id")),
        )
        .select(
            F.col("ba.doc_id").alias("c_a"), F.col("bb.doc_id").alias("c_b")
        )
        .distinct()
    )
    flagged = truth.join(
        cand,
        (F.col("c_a") == F.col("doc_a")) & (F.col("c_b") == F.col("doc_b")),
        "left",
    )
    bucket = (
        F.when(F.col("j") >= 0.7, "[0.7,1.0]")
        .when(F.col("j") >= 0.3, "[0.3,0.7)")
        .when(F.col("j") >= 0.1, "[0.1,0.3)")
        .otherwise("[0.05,0.1)")
    )
    return flagged.groupBy(bucket.alias("jac_band")).agg(
        F.count(F.lit(1)).alias("n_truth"),
        F.count("c_a").alias("n_caught"),
        F.round(F.count("c_a") / F.count(F.lit(1)), 4).alias("recall"),
    )


@query(
    "dedup_url_canonical_groups",
    oracle="""
WITH urls AS (
    SELECT doc_id, source,
           (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END)
           || '://'
           || (CASE WHEN doc_id % 3 = 0 THEN UPPER(source) ELSE source END)
           || '.Example.COM/docs/' || CAST(doc_id % 50 AS VARCHAR)
           || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
           || (CASE doc_id % 4
                 WHEN 0 THEN '?utm_source=feed&utm_medium=rss&ref=' || lang
                 WHEN 1 THEN '?ref=' || lang || '&utm_campaign=x'
                 WHEN 2 THEN '?ref=' || lang
                 ELSE '' END)
           || (CASE WHEN doc_id % 7 = 0 THEN '#sec2' ELSE '' END) AS url
    FROM documents
), canon AS (
    SELECT doc_id, source,
           regexp_replace(
               lower(regexp_extract(url, '^([A-Za-z]+://[^/?#]+/[^?#]*)', 1)),
               '/+$', '')
           || (CASE WHEN regexp_extract(url, '[?&]ref=([a-z]+)', 1) <> ''
                    THEN '?ref=' || regexp_extract(url, '[?&]ref=([a-z]+)', 1)
                    ELSE '' END) AS canonical
    FROM urls
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(COUNT(DISTINCT canonical) AS BIGINT) AS n_canonical,
       CAST(COUNT(*) - COUNT(DISTINCT canonical) AS BIGINT) AS n_dups,
       ROUND(COUNT(DISTINCT canonical) * 1.0 / COUNT(*), 6) AS uniq_ratio,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
FROM canon GROUP BY source
""",
)
def dedup_url_canonical_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup — the FIRST stage of every web-corpus
    pipeline (CommonCrawl dedup is URL-level before any content hash):
    scheme/host case-folded, fragments stripped, tracking parameters
    (utm_*) dropped with a whitelist (`ref`) retained, trailing slash
    normalized; duplicates = same canonical URL. The noisy URLs are
    synthesized deterministically from (doc_id, source, lang) so both
    engines canonicalize the identical dirty input.

    Canonicalization is parse-and-rebuild, not in-place patching: extract
    scheme://host/path (case-folded, slash-trimmed) and the whitelisted
    param, and CONCATENATE the canonical form — sidesteps the
    backreference-syntax divergence between engines and the
    order-sensitivity of param-stripping regexes.

    Scale: canonicalization is row-local column math (zero shuffles);
    grouping is ONE hash groupBy on the canonical string — the exact-dedup
    shape (``dedup_exact_groups``) applied to the canonical key. The
    per-source distinct count is a keyed two-level agg; survivors (not
    materialized here) are min(doc_id) per canonical group, the same
    keep-first rule as ``dedup_keep_first_survivors``."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    did = F.col("doc_id")
    url = F.concat(
        F.when(did % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(did % 3 == 0, F.upper("source")).otherwise(F.col("source")),
        F.lit(".Example.COM/docs/"),
        (did % 50).cast("string"),
        F.when(did % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            did % 4 == 0,
            F.concat(F.lit("?utm_source=feed&utm_medium=rss&ref="), F.col("lang")),
        )
        .when(did % 4 == 1, F.concat(F.lit("?ref="), F.col("lang"), F.lit("&utm_campaign=x")))
        .when(did % 4 == 2, F.concat(F.lit("?ref="), F.col("lang")))
        .otherwise(F.lit("")),
        F.when(did % 7 == 0, F.lit("#sec2")).otherwise(F.lit("")),
    )
    urls = d.select("doc_id", "source", url.alias("url"))
    base = F.regexp_replace(
        F.lower(F.regexp_extract("url", r"^([A-Za-z]+://[^/?#]+/[^?#]*)", 1)),
        r"/+$",
        "",
    )
    ref = F.regexp_extract("url", r"[?&]ref=([a-z]+)", 1)
    canonical = F.concat(
        base,
        F.when(ref != "", F.concat(F.lit("?ref="), ref)).otherwise(F.lit("")),
    )
    canon = urls.select("doc_id", "source", canonical.alias("canonical"))
    return canon.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.countDistinct("canonical").cast("long").alias("n_canonical"),
        (F.count(F.lit(1)) - F.countDistinct("canonical"))
        .cast("long")
        .alias("n_dups"),
        F.round(F.countDistinct("canonical") / F.count(F.lit(1)), 6).alias(
            "uniq_ratio"
        ),
        F.min("doc_id").cast("long").alias("min_doc_id"),
    )
