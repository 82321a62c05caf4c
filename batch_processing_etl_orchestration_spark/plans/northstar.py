"""North-star LLM-data-pipeline operators (SURVEY §2.10, BASELINE.json).

Not present in the reference — these are the training-data-pipeline
operators the north star requires, built Spark-first over the driver's
``documents`` and ``embeddings`` tables: exact/near dedup, similarity
search, text analysis, fingerprinting. The SQL-expressible ones carry
DuckDB oracles; the sketch/LSH ones register rows-only and are
verified against brute-force in tests/.

Scale posture: dedup and similarity are shuffle-heavy by nature; every
operator here shuffles on a *derived compact key* (hash, shingle,
band signature, bucket id) rather than raw text/vectors, and candidate
generation (LSH/banding/blocking) bounds the pair explosion that a
naive cross join would cause at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from batch_processing_etl_orchestration_spark.plans.registry import register
from batch_processing_etl_orchestration_spark.tables import (
    artifact_schema,
    load_table,
    read_artifact,
)

# ---------------------------------------------------------------------------
# Exact deduplication
# ---------------------------------------------------------------------------


@register(
    "q_dedup_exact",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM (
      SELECT doc_id, lang, source, n_chars,
             row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      FROM documents
    )
    WHERE rn = 1
    """,
    tags=("dedup",),
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: keep the lowest doc_id per identical text.

    Scale note: shuffling full document text to group is wasteful at
    100 TB — q_dedup_exact_hash below shuffles a 32-byte digest
    instead. This variant exists for oracle parity on the *semantic*.
    """
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("text").orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_chars")
    )


@register(
    "q_dedup_exact_hash",
    oracle="""
    SELECT sha256(text) AS content_hash,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    tags=("dedup",),
)
def q_dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash dedup: group by sha256(text) — the scale path.
    Only the 64-hex digest shuffles; text stays columnar in the scan.
    min(doc_id) is the canonical survivor."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(F.sha2("text", 256).alias("content_hash")).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


# ---------------------------------------------------------------------------
# Word shingles (shared by n-gram Jaccard + fingerprint);
# lead-window formulation keeps the Spark and SQL sides structurally
# identical, so the oracle exercises the same semantics.
# ---------------------------------------------------------------------------


def _stage_checkpoint(df: DataFrame, eager: bool) -> DataFrame:
    """Pipeline-stage lineage truncation with the fault-tolerance
    posture made explicit (VERDICT r15 #7). `localCheckpoint` stores
    executor-local, non-replicated blocks: on a real cluster an
    executor loss (or dynamic-allocation release) kills the truncated
    lineage mid-query instead of recomputing. For the corpus-assembly
    stage boundaries — corpus-sized frames feeding multi-stage
    pipelines — use RELIABLE `checkpoint` whenever the session has a
    checkpoint directory configured (a cluster deployment sets one on
    durable storage); fall back to localCheckpoint when none is set
    (the fixture driver's vanilla local session, where executor ==
    driver and the distinction is moot). Measured at sf0.1
    (interleaved A/B, 2 rounds x 2 runs): reliable vs local is within
    noise — local 5.0-6.3 s, reliable 5.0-6.1 s on
    q_corpus_assembly_v2 — so the durable choice costs nothing where
    it applies. Operator-level FIXPOINT checkpoints (graph/
    clustering) stay eager localCheckpoint by design: their frames
    are edge/k-row-sized and the materialization job IS the
    iteration."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def _shingles(d: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct word n-grams — array-local transform
    (no shuffle/window; see operators/dedup.shingle_sets)."""
    from batch_processing_etl_orchestration_spark.operators.dedup import shingle_sets

    return shingle_sets(d, n)


def _sql_shingles_body(doc_table: str = "documents") -> str:
    """The word-3-gram shingle CTE chain over ``doc_table`` (any
    relation with doc_id + text). ONE definition for every consumer —
    the pair queries' oracles AND the adversarial attestation's
    boilerplate-injected corpus (review r10: a second verbatim copy
    would let the attested shingle semantics silently drift from the
    queries it prices)."""
    return f"""words AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) AS pos,
             unnest(string_split(text, ' ')) AS word
      FROM {doc_table}
    ),
    grams AS (
      SELECT doc_id,
             word || ' ' || lead(word, 1) OVER w || ' ' || lead(word, 2) OVER w
               AS shingle,
             lead(word, 2) OVER w AS _tail
      FROM words
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    shingles AS (
      SELECT DISTINCT doc_id, shingle FROM grams WHERE _tail IS NOT NULL
    )
"""


_SQL_SHINGLES = "\n    WITH " + _sql_shingles_body()


from batch_processing_etl_orchestration_spark.operators.dedup import (  # noqa: E402
    DF_CAP_FRAC,
    DF_CAP_MIN,
)

# MATERIALIZED: without it DuckDB re-inlines sdf/hot/cold into the
# downstream self-join and mis-plans the NOT IN as a nested scan
# (262 s → 4.5 s at sf1; see memory duckdb-oracle-planner-hazards).
# The cap constants interpolate from operators/dedup so the Spark
# split and every oracle move together (review r9).


def _sql_dfc_sdf(doc_table: str = "documents") -> str:
    """The df-cap scalar + shingle-df CTEs over ``doc_table`` — the
    shared prefix of _SQL_DF_CAP, parameterized for the adversarial
    attestation (review r10: one definition of the cap formula)."""
    return f""",
    dfc AS (
      SELECT GREATEST({DF_CAP_MIN},
                      CAST(CEIL(COUNT(*) * {DF_CAP_FRAC}) AS BIGINT))
               AS df_cap
      FROM {doc_table}
    ),
    sdf AS MATERIALIZED (
      SELECT shingle, COUNT(*) AS df FROM shingles GROUP BY 1
    )"""


_SQL_DF_CAP = _sql_dfc_sdf() + """,
    hot AS MATERIALIZED (SELECT shingle FROM sdf, dfc WHERE df > df_cap),
    cold AS MATERIALIZED (
      SELECT s.doc_id, s.shingle FROM shingles s
      WHERE s.shingle NOT IN (SELECT shingle FROM hot)
    )
"""


def _df_capped_common(cold, hot_sets, extra_joins=None):
    """(doc_a, doc_b, n_common) with candidates from the COLD shingle
    self-join and exact intersection counts recombined from each
    side's hot-shingle array (operators/dedup.df_capped_shingle_split
    documents the recall bound)."""
    a, b = cold.alias("a"), cold.alias("b")
    cond = (F.col("a.shingle") == F.col("b.shingle")) & (
        F.col("a.doc_id") < F.col("b.doc_id")
    )
    j = a.join(b, cond)
    if extra_joins is not None:
        j = extra_joins(j)
    cand = j.groupBy(
        F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
    ).agg(F.count(F.lit(1)).alias("n_cold"))
    ha = hot_sets.select(
        F.col("doc_id").alias("doc_a"), F.col("_hot").alias("_hot_a")
    )
    hb = hot_sets.select(
        F.col("doc_id").alias("doc_b"), F.col("_hot").alias("_hot_b")
    )
    n_hot = (
        F.when(
            F.col("_hot_a").isNull() | F.col("_hot_b").isNull(), F.lit(0)
        )
        .otherwise(F.size(F.array_intersect("_hot_a", "_hot_b")))
        .cast("long")
    )
    return (
        cand.join(ha, "doc_a", "left")
        .join(hb, "doc_b", "left")
        .select(
            "doc_a",
            "doc_b",
            (F.col("n_cold") + n_hot).alias("n_common"),
        )
    )


@register(
    "q_ngram_jaccard_pairs",
    oracle=_SQL_SHINGLES
    + _SQL_DF_CAP
    + """,
    sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY 1
    ),
    langs AS (SELECT doc_id, lang FROM documents),
    cold_common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_cold
      FROM cold a
      JOIN cold b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      JOIN langs la ON la.doc_id = a.doc_id
      JOIN langs lb ON lb.doc_id = b.doc_id AND la.lang = lb.lang
      GROUP BY 1, 2
    ),
    hot_common AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS n_hot
      FROM cold_common c
      JOIN shingles sa ON sa.doc_id = c.doc_a
                       AND sa.shingle IN (SELECT shingle FROM hot)
      JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
      GROUP BY 1, 2
    ),
    common AS (
      SELECT c.doc_a, c.doc_b, c.n_cold + COALESCE(h.n_hot, 0) AS n_common
      FROM cold_common c
      LEFT JOIN hot_common h ON h.doc_a = c.doc_a AND h.doc_b = c.doc_b
    )
    SELECT c.doc_a, c.doc_b,
           CAST(c.n_common AS DOUBLE)
             / CAST(sa.n_sh + sb.n_sh - c.n_common AS DOUBLE) AS jaccard
    FROM common c
    JOIN sizes sa ON sa.doc_id = c.doc_a
    JOIN sizes sb ON sb.doc_id = c.doc_b
    WHERE CAST(c.n_common AS DOUBLE)
            / CAST(sa.n_sh + sb.n_sh - c.n_common AS DOUBLE) >= 0.1
    """,
    tags=("dedup", "jaccard"),
)
def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs by word-3-gram Jaccard ≥ 0.1, blocked
    to same-language pairs, with a document-frequency cap on the
    candidate join (VERDICT r8 #1).

    Candidates come from the COLD shingle self-join only (df ≤
    greatest(5, 1% of corpus)), so every shuffle key fans out ≤ cap —
    a boilerplate 3-gram in f documents no longer lands f² pairs on
    one AQE-unsplittable key. Jaccard itself stays EXACT for every
    retained pair: sizes use full shingle sets and the intersection
    recombines cold-join counts with each side's (small, broadcast-
    bounded) hot-shingle arrays. A true pair is lost only when ALL of
    its common shingles are boilerplate — for jaccard ≥ 0.1 that means
    ≥ ~9% of the union is corpus-wide boilerplate, which is exactly
    the match near-dup mining must NOT count (recall bound in
    operators/dedup.df_capped_shingle_split; q_shingle_df_cap_report
    attests the dropped-shingle mass; adversarial quadratic-vs-capped
    test in tests/test_dedup.py).

    Scale: cold candidates ≤ cap·|shingle rows| (linear); hot set ≤
    avg_shingles_per_doc / 1% entries independent of corpus size →
    broadcastable. At 100 TB the MinHash-LSH variant
    (q_minhash_lsh_pairs) replaces even the capped join — banding
    tracks true near-dup density. Jaccard is an integer ratio →
    deterministic double division.
    """
    from batch_processing_etl_orchestration_spark.operators.dedup import (
        df_capped_shingle_split,
    )

    d = load_table(spark, sf_dir, "documents")
    # four DAG branches read the shingle relation (df agg, anti-join
    # probe, hot-set build, sizes) — materialize the explode once
    # instead of re-scanning documents per branch (review r9; same
    # pattern as minhash_lsh_pairs). LAZY checkpoint (ADVICE r9):
    # the block-manager cache still computes the explode once on the
    # first action, but plan-only callers (explain/plan-shape tests)
    # pay nothing at construction time.
    sh = _shingles(d, 3).localCheckpoint(eager=False)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    langs = d.select("doc_id", "lang")
    cold, hot_sets = df_capped_shingle_split(sh, d)

    def _lang_block(j):
        return j.join(langs.alias("la"), F.col("la.doc_id") == F.col("a.doc_id")).join(
            langs.alias("lb"),
            (F.col("lb.doc_id") == F.col("b.doc_id"))
            & (F.col("la.lang") == F.col("lb.lang")),
        )

    common = _df_capped_common(cold, hot_sets, extra_joins=_lang_block)
    jac = (
        common.join(sizes.alias("sa"), F.col("sa.doc_id") == F.col("doc_a"))
        .join(sizes.alias("sb"), F.col("sb.doc_id") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common").cast("double")
                / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
    )
    return jac.where(F.col("jaccard") >= 0.1)


@register(
    "q_repetition_ratio",
    oracle="""
    WITH words AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) AS pos,
             unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             word || ' ' || lead(word, 1) OVER w || ' ' || lead(word, 2) OVER w
               AS shingle,
             lead(word, 2) OVER w AS _tail
      FROM words
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(COUNT(DISTINCT shingle) AS BIGINT) AS n_distinct_grams,
           1.0 - CAST(COUNT(DISTINCT shingle) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS dup_fraction
    FROM grams WHERE _tail IS NOT NULL
    GROUP BY 1
    """,
    tags=("text", "quality"),
)
def q_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition: the fraction of word-3-grams that
    are duplicates of an earlier gram in the same document — the
    Gopher-style repetition quality signal (heavily repeated boiler-
    plate scores high and gets filtered). Counting needs the
    NON-distinct gram stream, so this builds grams without the
    array_distinct the shingle-set path applies; the ratio is an
    integer quotient → bit-stable division in both engines."""
    d = load_table(spark, sf_dir, "documents")
    parts = ", ".join(f"_words[i + {k}]" for k in range(3))
    grams = (
        "CASE WHEN size(_words) >= 3 THEN "
        "transform(sequence(0, size(_words) - 3), "
        f"i -> concat_ws(' ', {parts})) "
        "ELSE array() END"
    )
    g = d.select("doc_id", F.split("text", " ").alias("_words")).select(
        "doc_id", F.explode(F.expr(grams)).alias("shingle")
    )
    return g.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.countDistinct("shingle").alias("n_distinct_grams"),
        (
            F.lit(1.0)
            - F.countDistinct("shingle").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("dup_fraction"),
    )


@register(
    "q_pii_redact",
    oracle=r"""
    WITH salted AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 2 = 0
                          THEN ' reach me at user' || CAST(doc_id AS VARCHAR)
                               || '@example.com today'
                          ELSE ' call 555-'
                               || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                               || '-1234 now' END AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(t, '\d{3}-\d{3}-\d{4}')) AS BIGINT)
             AS n_phones,
           sha256(
             regexp_replace(
               regexp_replace(t,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
               '\d{3}-\d{3}-\d{4}', '[PHONE]', 'g')
           ) AS redacted_sha
    FROM salted
    """,
    tags=("text", "pii"),
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the redaction every training corpus runs before
    any other stage sees the bytes. Deterministic PII is spliced into
    each document in-query (even ids an email, odd ids a phone number
    — identical concat in both engines), then counted and redacted
    with regexes kept inside the Java/RE2 common subset; the DuckDB
    oracle hash-checks the sha256 of the REDACTED text, so a single
    leaked or over-redacted byte fails the row. Pure JVM-side
    regexp_replace — codegen, no UDF, no shuffle."""
    from batch_processing_etl_orchestration_spark.functions.text import (
        pii_counts,
        redact_pii,
    )

    d = load_table(spark, sf_dir, "documents")
    salted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(
                    F.lit(" reach me at user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com today"),
                ),
            ).otherwise(
                F.concat(
                    F.lit(" call 555-"),
                    F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                    F.lit("-1234 now"),
                )
            ),
        ).alias("t"),
    )
    n_emails, n_phones = pii_counts("t")
    return salted.select(
        "doc_id",
        n_emails.cast("long").alias("n_emails"),
        n_phones.cast("long").alias("n_phones"),
        F.sha2(redact_pii("t"), 256).alias("redacted_sha"),
    )


# 8-gram shingles for decontamination (the 3-gram _SQL_SHINGLES twin)
_SQL_SHINGLES_8 = """
    WITH words AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) AS pos,
             unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             word || ' ' || lead(word, 1) OVER w || ' ' || lead(word, 2) OVER w
                  || ' ' || lead(word, 3) OVER w || ' ' || lead(word, 4) OVER w
                  || ' ' || lead(word, 5) OVER w || ' ' || lead(word, 6) OVER w
                  || ' ' || lead(word, 7) OVER w AS shingle,
             lead(word, 7) OVER w AS _tail
      FROM words
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    shingles8 AS (
      SELECT DISTINCT doc_id, shingle FROM grams WHERE _tail IS NOT NULL
    )
"""


@register(
    "q_decontaminate",
    oracle=_SQL_SHINGLES_8
    + """,
    eval_g AS (
      SELECT DISTINCT shingle FROM shingles8 WHERE doc_id % 20 = 0
    )
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shared_ngrams
    FROM shingles8 s
    JOIN eval_g e ON s.shingle = e.shingle
    WHERE s.doc_id % 20 <> 0
    GROUP BY 1
    """,
    tags=("text", "dedup", "decontamination"),
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag every training document that
    shares a word-8-gram with the eval split (doc_id % 20 == 0 here) —
    the screen run before training so eval passages cannot leak into
    the corpus. Near-dups of eval docs surface with high shared-gram
    counts; unrelated docs share none (8-gram chance collisions are
    negligible). Value-level oracle: DuckDB recomputes the same
    8-gram overlap counts."""
    from batch_processing_etl_orchestration_spark.operators.dedup import decontaminate

    d = load_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 20 == 0
    return decontaminate(d.where(~is_eval), d.where(is_eval), n=8)


@register(
    "q_decontaminate_bloom",
    oracle=_SQL_SHINGLES_8
    + """,
    eval_g AS (
      SELECT DISTINCT shingle FROM shingles8 WHERE doc_id % 20 = 0
    )
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shared_ngrams
    FROM shingles8 s
    JOIN eval_g e ON s.shingle = e.shingle
    WHERE s.doc_id % 20 <> 0
    GROUP BY 1
    """,
    tags=("text", "dedup", "decontamination", "bloom"),
)
def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination via the bloom-prefilter scale path: eval grams
    fold into a 2^17-bit bloom TABLE (m/64 int64 rows — broadcastable
    no matter how large the eval set grows), the corpus probes it with
    four broadcast bit-checks, and only survivors reach the exact gram
    join. Oracle is IDENTICAL to q_decontaminate — bloom false
    positives must be removed by the exact verify, so any divergence
    from the exact path hash-mismatches."""
    from batch_processing_etl_orchestration_spark.operators.dedup import (
        decontaminate_bloom,
    )

    d = load_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 20 == 0
    return decontaminate_bloom(d.where(~is_eval), d.where(is_eval), n=8)


# ---------------------------------------------------------------------------
# Document fingerprinting
# ---------------------------------------------------------------------------


@register(
    "q_doc_fingerprint",
    oracle=_SQL_SHINGLES
    + """
    SELECT d.doc_id,
           md5(d.lang || ':' || lower(d.text)) AS fingerprint,
           m.min_shingle_md5
    FROM documents d
    JOIN (SELECT doc_id, MIN(md5(shingle)) AS min_shingle_md5
          FROM shingles GROUP BY 1) m
      ON m.doc_id = d.doc_id
    """,
    tags=("text", "fingerprint"),
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints: md5 of normalized text (exact identity)
    plus the minimum shingle-md5 (a 1-hash MinHash — equal min-shingle
    fingerprints are near-dup candidates)."""
    d = load_table(spark, sf_dir, "documents")
    sh = _shingles(d, 3)
    min_sh = sh.groupBy("doc_id").agg(F.min(F.md5("shingle")).alias("min_shingle_md5"))
    fp = d.select(
        "doc_id",
        F.md5(F.concat(F.col("lang"), F.lit(":"), F.lower("text"))).alias("fingerprint"),
    )
    return fp.join(min_sh, "doc_id")


# ---------------------------------------------------------------------------
# Text analysis: per-doc statistics, token counting, quality, lang-id
# ---------------------------------------------------------------------------


@register(
    "q_text_stats",
    oracle="""
    SELECT doc_id,
           n_chars,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_uniq_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / CAST(len(string_split(text, ' ')) AS DOUBLE) AS uniq_ratio,
           length(text) AS n_chars_actual
    FROM documents
    """,
    tags=("text",),
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics: whitespace token count, distinct
    tokens, type-token ratio. All JVM-side array functions — no UDF."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        "n_chars",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq_tokens"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast("double")).alias(
            "uniq_ratio"
        ),
        F.length("text").alias("n_chars_actual"),
    )


@register(
    "q_token_count_regex",
    oracle=r"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_ws_tokens,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))
             AS n_re_tokens
    FROM documents
    """,
    tags=("text", "tokens"),
)
def q_token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish regex
    (letter runs | digit runs | single other-glyph). The regex uses
    only constructs with identical semantics in Java regex and RE2."""
    from batch_processing_etl_orchestration_spark.functions.text import (
        regex_token_count,
        ws_token_count,
    )

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        ws_token_count("text").alias("n_ws_tokens"),
        regex_token_count("text").alias("n_re_tokens"),
    )


_QUALITY_SQL_FLAGS = """
           CASE WHEN length(text) BETWEEN 100 AND 450 THEN 1 ELSE 0 END
             + CASE WHEN len(string_split(text, ' ')) >= 20 THEN 1 ELSE 0 END
             + CASE WHEN CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                          / CAST(len(string_split(text, ' ')) AS DOUBLE) >= 0.15
                    THEN 1 ELSE 0 END
"""


@register(
    "q_quality_filter",
    oracle=f"""
    SELECT doc_id, lang, quality_score
    FROM (
      SELECT doc_id, lang, {_QUALITY_SQL_FLAGS} AS quality_score
      FROM documents
    )
    WHERE quality_score >= 2
    """,
    tags=("text", "quality"),
)
def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring (length band + token count + lexical
    diversity) and filtering — the standard pre-training corpus
    quality gate, as integer flag arithmetic (exact in both engines)."""
    from batch_processing_etl_orchestration_spark.functions.text import quality_score

    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", "lang", quality_score("text").alias("quality_score"))
        .where(F.col("quality_score") >= 2)
    )


_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ein", "zu", "ist"],
    "es": ["el", "la", "los", "de", "y", "un", "es"],
    "fr": ["le", "la", "les", "de", "et", "un", "est"],
    "zh": ["de", "shi", "le", "zai", "he", "you"],
}
_LANG_ORDER = ["en", "de", "es", "fr", "zh"]

# Gopher-style heuristic quality rules (Rae et al. 2021, Appendix A),
# expressed over integer per-doc features so every threshold compare
# is exact cross-multiplied integer arithmetic (no float ratios).
# Thresholds follow the paper where the fixture can exercise them
# (word-count band tightened to the fixture's 10–99-word docs so the
# rule actually fires); the stopword list is the engine's existing
# English list (_STOPWORDS['en']) rather than Gopher's — same rule,
# corpus-appropriate parameters.
_GOPHER_RULES_SQL = [
    ("gopher_word_count", "n_words BETWEEN 20 AND 1000"),
    (
        "gopher_mean_word_length",
        "3 * n_words <= chars AND chars <= 10 * n_words",
    ),
    ("gopher_symbol_ratio", "10 * (hashes + ells) <= n_words"),
    ("gopher_bullet_lines", "10 * bullet_lines <= 9 * n_lines"),
    ("gopher_ellipsis_lines", "10 * ell_lines <= 3 * n_lines"),
    ("gopher_alpha_words", "5 * alpha_words >= 4 * n_words"),
    ("gopher_stopwords", "stop_hits >= 2"),
]
_GOPHER_KEEP_SQL = (
    "(" + " AND ".join(p for _n, p in _GOPHER_RULES_SQL) + ")"
)


def _gopher_features(d: DataFrame, keep: tuple = ()) -> DataFrame:
    """Per-doc integer features for the Gopher rules — one projection,
    all JVM-side (split/translate/replace/higher-order filters), no
    UDFs, no shuffle. `keep` names passthrough columns (e.g. doc_id
    for the quarantine split)."""
    words = F.split("text", " ")
    lines = F.split("text", "\n")
    stop_hits = None
    for s in _STOPWORDS["en"]:
        c = F.array_contains(words, s).cast("int")
        stop_hits = c if stop_hits is None else stop_hits + c
    return d.select(
        *keep,
        F.size(words).cast("long").alias("n_words"),
        F.length(F.translate("text", " ", "")).cast("long").alias("chars"),
        (
            F.length("text") - F.length(F.translate("text", "#", ""))
        )
        .cast("long")
        .alias("hashes"),
        (
            (
                F.length("text")
                - F.length(F.replace(F.col("text"), F.lit("..."), F.lit("")))
            )
            / F.lit(3)
        )
        .cast("long")
        .alias("ells"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(
            F.filter(
                lines,
                lambda ln: ln.startswith("- ") | ln.startswith("* "),
            )
        )
        .cast("long")
        .alias("bullet_lines"),
        F.size(F.filter(lines, lambda ln: ln.endswith("...")))
        .cast("long")
        .alias("ell_lines"),
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
        .cast("long")
        .alias("alpha_words"),
        stop_hits.cast("long").alias("stop_hits"),
    )


def gopher_rules() -> dict:
    """The rule predicates as Columns over _gopher_features' frame —
    shared by the aggregate report (q_gopher_quality_rules) and the
    per-doc quarantine split (tests/test_gopher_rules.py)."""
    rules = {n: F.expr(p) for n, p in _GOPHER_RULES_SQL}
    rules["gopher_keep"] = F.expr(_GOPHER_KEEP_SQL)
    return rules


@register(
    "q_gopher_quality_rules",
    oracle="WITH f AS (\n"
    "  SELECT len(string_split(text, ' ')) AS n_words,\n"
    "         len(replace(text, ' ', '')) AS chars,\n"
    "         len(text) - len(replace(text, '#', '')) AS hashes,\n"
    "         CAST((len(text) - len(replace(text, '...', ''))) / 3\n"
    "              AS BIGINT) AS ells,\n"
    "         len(string_split(text, chr(10))) AS n_lines,\n"
    "         len(list_filter(string_split(text, chr(10)),\n"
    "             l -> l LIKE '- %' OR l LIKE '* %')) AS bullet_lines,\n"
    "         len(list_filter(string_split(text, chr(10)),\n"
    "             l -> l LIKE '%...')) AS ell_lines,\n"
    "         len(list_filter(string_split(text, ' '),\n"
    "             w -> regexp_matches(w, '[A-Za-z]'))) AS alpha_words,\n"
    "         ("
    + " + ".join(
        "(CASE WHEN list_contains(string_split(text, ' '), "
        f"'{s}') THEN 1 ELSE 0 END)"
        for s in _STOPWORDS["en"]
    )
    + ") AS stop_hits\n"
    "  FROM documents\n"
    ")\n"
    + " UNION ALL ".join(
        f"SELECT '{name}' AS rule, COUNT(*) AS n_rows, "
        f"CAST(SUM(CASE WHEN NOT COALESCE({pred}, FALSE) THEN 1 ELSE 0 "
        f"END) AS BIGINT) AS n_violations, "
        f"CAST(COUNT(*) - SUM(CASE WHEN NOT COALESCE({pred}, FALSE) "
        f"THEN 1 ELSE 0 END) AS BIGINT) / COUNT(*) AS pass_rate FROM f"
        for name, pred in (
            _GOPHER_RULES_SQL + [("gopher_keep", _GOPHER_KEEP_SQL)]
        )
    ),
    tags=("text", "quality", "expectations"),
)
def q_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher heuristic rule set (VERDICT r12 #4) as a one-scan
    corpus audit: word-count band, mean-word-length band, symbol-to-
    word ratio (# and ellipses), bullet-line and ellipsis-line
    fractions, alphabetic-word fraction, and stopword presence — plus
    'gopher_keep', the conjunction, whose violation count is exactly
    the documents the gate drops. Every rule is a conditional sum in
    ONE aggregation over integer features (check_expectations), so
    rule count never multiplies I/O — plan-asserted single parquet
    scan (tests/test_plans.py). Ratio thresholds are cross-multiplied
    integers, so both engines compare exactly; pass_rate is the one
    int/int division (bit-identical cross-engine).

    On this fixture the symbol/bullet/ellipsis/alpha rules pass
    everywhere (synthetic text has no punctuation — their zero counts
    still hash), while word-count, stopword-presence, and the keep
    conjunction fire; tests/test_gopher_rules.py additionally runs
    the per-doc quarantine split (split_expectations) on adversarial
    docs that trip every rule."""
    from batch_processing_etl_orchestration_spark.operators.expectations import (
        check_expectations,
    )

    d = load_table(spark, sf_dir, "documents")
    return check_expectations(_gopher_features(d), gopher_rules())




def _sql_stop_count(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in _STOPWORDS[lang])
    return (
        f"len(list_filter(string_split(lower(text), ' '), "
        f"w -> list_contains([{lst}], w)))"
    )


def _sql_argmax_lang() -> str:
    conds = []
    for lang in _LANG_ORDER:
        others = [o for o in _LANG_ORDER if o != lang]
        cond = " AND ".join(f"s_{lang} >= s_{o}" for o in others)
        conds.append(f"WHEN {cond} THEN '{lang}'")
    return "CASE " + " ".join(conds) + " ELSE 'und' END"


@register(
    "q_lang_id",
    oracle=f"""
    SELECT lang, predicted_lang, COUNT(*) AS n_docs
    FROM (
      SELECT lang, {_sql_argmax_lang()} AS predicted_lang
      FROM (
        SELECT lang,
               {", ".join(f"{_sql_stop_count(lg)} AS s_{lg}" for lg in _LANG_ORDER)}
        FROM documents
      )
    )
    GROUP BY 1, 2
    """,
    tags=("text", "langid"),
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID: count per-language stopword hits per
    document, argmax with a fixed tiebreak order, confusion rollup vs
    the labeled lang. Integer votes → exact cross-engine."""
    from batch_processing_etl_orchestration_spark.functions.text import (
        argmax_label,
        stopword_hits,
    )

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "lang",
        *[stopword_hits("text", _STOPWORDS[lg]).alias(f"s_{lg}") for lg in _LANG_ORDER],
    )
    pred = argmax_label({lg: f"s_{lg}" for lg in _LANG_ORDER})
    return (
        scored.select("lang", pred.alias("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Similarity search: brute-force cosine top-k (exact oracle-checked
# baseline; the LSH scale path registers rows-only in northstar_ml.py)
# ---------------------------------------------------------------------------

_TOPK_K = 10
_N_QUERY_VECS = 5


# Scaled-long fold (see functions/exact.py): per-element double
# products rounded at 1e-14 and accumulated as int64 — exact,
# order-insensitive, and on the primitive codegen path (the DECIMAL
# fold this replaces was ~10× slower). |x| ≤ ~0.6 in the fixture
# embeddings → per-term ≤ 3.6e13, 64 terms ≤ 2.4e15 ≪ 2^63.
_SIM_SCALE = 10**14


def _dot_dec(a: str, b: str) -> F.Column:
    """Exact dot product via scaled-long fold, returned as double."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0 AS BIGINT), (acc, v) -> acc + CAST(ROUND(v * {_SIM_SCALE}) AS BIGINT))"
    ) / F.lit(float(_SIM_SCALE))


def _norm_dec(a: str) -> F.Column:
    return F.sqrt(
        F.expr(
            f"aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
            f"CAST(0 AS BIGINT), (acc, v) -> acc + CAST(ROUND(v * {_SIM_SCALE}) AS BIGINT))"
        )
        / F.lit(float(_SIM_SCALE))
    )


@register(
    "q_cosine_topk_bruteforce",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe FROM embeddings
      WHERE vec_id < {_N_QUERY_VECS}
    ),
    c AS (SELECT vec_id AS cand_id, embedding AS ce, label FROM embeddings),
    elems AS (
      SELECT q.query_id, c.cand_id, c.label,
             CAST(ROUND(CAST(q.qe[i] AS DOUBLE) * CAST(c.ce[i] AS DOUBLE)
                        * {_SIM_SCALE}) AS BIGINT) AS p,
             CAST(ROUND(CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)
                        * {_SIM_SCALE}) AS BIGINT) AS qq,
             CAST(ROUND(CAST(c.ce[i] AS DOUBLE) * CAST(c.ce[i] AS DOUBLE)
                        * {_SIM_SCALE}) AS BIGINT) AS cc
      FROM q, c, range(1, 65) r(i)
      WHERE q.query_id <> c.cand_id
    ),
    sims AS (
      SELECT query_id, cand_id, ANY_VALUE(label) AS label,
             (CAST(SUM(p) AS DOUBLE) / {float(_SIM_SCALE)})
               / (SQRT(CAST(SUM(qq) AS DOUBLE) / {float(_SIM_SCALE)})
                  * SQRT(CAST(SUM(cc) AS DOUBLE) / {float(_SIM_SCALE)}))
               AS cosine_sim
      FROM elems GROUP BY 1, 2
    )
    SELECT query_id, cand_id, label, cosine_sim, rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, cand_id) AS rank
      FROM sims
    )
    WHERE rank <= {_TOPK_K}
    """,
    tags=("similarity", "ann"),
)
def q_cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the query vectors against
    every candidate, dot/norm via higher-order array functions
    (JVM-side, no UDF), rank per query.

    Determinism: products in double, sums in DECIMAL → bit-identical
    across engines and partitionings; rank ties broken by cand_id.
    Scale: queries broadcast (k vectors), candidates streamed — one
    pass over the embedding table, top-k via per-partition heap
    (TakeOrderedAndProject under the per-query window at realistic
    query counts it's a partial agg). This is the exact baseline the
    LSH/IVF variant is recall-tested against.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = (
        e.where(F.col("vec_id") < _N_QUERY_VECS)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))
    )
    c = e.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("ce"), "label"
    )
    pairs = F.broadcast(q).crossJoin(c).where(F.col("query_id") != F.col("cand_id"))
    sims = pairs.select(
        "query_id",
        "cand_id",
        "label",
        (_dot_dec("qe", "ce") / (_norm_dec("qe") * _norm_dec("ce"))).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("cand_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _TOPK_K)
        .select("query_id", "cand_id", "label", "cosine_sim", "rank")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs (the fifth §2.10 dedup modality)
# ---------------------------------------------------------------------------

_NEAR_DUP_TAU = 0.35


@register(
    "q_embedding_near_dup_pairs",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding, label FROM embeddings),
    elems AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             CAST(ROUND(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)
                        * {_SIM_SCALE}) AS BIGINT) AS p,
             CAST(ROUND(CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)
                        * {_SIM_SCALE}) AS BIGINT) AS aa,
             CAST(ROUND(CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)
                        * {_SIM_SCALE}) AS BIGINT) AS bb
      FROM e a
      JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id,
      range(1, 65) r(i)
    ),
    sims AS (
      SELECT vec_a, vec_b,
             (CAST(SUM(p) AS DOUBLE) / {float(_SIM_SCALE)})
               / (SQRT(CAST(SUM(aa) AS DOUBLE) / {float(_SIM_SCALE)})
                  * SQRT(CAST(SUM(bb) AS DOUBLE) / {float(_SIM_SCALE)}))
               AS cosine_sim
      FROM elems GROUP BY 1, 2
    )
    SELECT vec_a, vec_b, cosine_sim FROM sims
    WHERE cosine_sim >= {_NEAR_DUP_TAU}
    """,
    tags=("dedup", "similarity"),
)
def q_embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine ≥ τ), blocked to
    same-label pairs — the fifth dedup modality of SURVEY §2.10.

    Blocking is what makes this scale: compare only within a coarse
    partition (here the label; at 100 TB an LSH bucket from
    operators/similarity.lsh_bucket_ids, giving the same
    candidate-bounding effect without supervision). The cosine kernel
    is the scaled-long exact fold shared with q_cosine_topk_bruteforce.
    """
    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"), "label"
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"),
        F.col("label").alias("label_b"),
    )
    pairs = a.join(
        b, (F.col("label") == F.col("label_b")) & (F.col("vec_a") < F.col("vec_b"))
    )
    sims = pairs.select(
        "vec_a",
        "vec_b",
        (_dot_dec("ea", "eb") / (_norm_dec("ea") * _norm_dec("eb"))).alias("cosine_sim"),
    )
    return sims.where(F.col("cosine_sim") >= _NEAR_DUP_TAU)


# ---------------------------------------------------------------------------
# Language ID, char-n-gram variant (the n-gram heuristic; the stopword
# vote above is the word-level variant)
# ---------------------------------------------------------------------------

_CHAR_PROFILES = {
    "en": ["th", "he", "in", "er", "an"],
    "de": ["ch", "ei", "ie", "sc", "un"],
    "es": ["os", "as", "el", "ue", "ar"],
    "fr": ["ou", "es", "re", "ai", "eu"],
    "zh": ["zh", "sh", "ng", "xi", "ao"],
}


def _sql_bigram_hits(lang: str) -> str:
    lits = ", ".join(f"'{b}'" for b in _CHAR_PROFILES[lang])
    return (
        "len(list_filter(list_transform(range(1, length(text)), "
        "i -> substring(lower(text), i, 2)), "
        f"b -> list_contains([{lits}], b)))"
    )


def _sql_argmax_chain(names: list[str], col_fmt: str, labels: list[str]) -> str:
    conds = []
    for name, label in zip(names, labels):
        others = [o for o in names if o != name]
        cond = " AND ".join(f"{col_fmt.format(name)} >= {col_fmt.format(o)}" for o in others)
        conds.append(f"WHEN {cond} THEN '{label}'")
    return "CASE " + " ".join(conds) + " ELSE 'und' END"


@register(
    "q_lang_id_chargram",
    oracle=f"""
    SELECT lang, predicted_lang, COUNT(*) AS n_docs
    FROM (
      SELECT lang,
             {_sql_argmax_chain(list(_CHAR_PROFILES), "g_{}", list(_CHAR_PROFILES))}
               AS predicted_lang
      FROM (
        SELECT lang,
               {", ".join(f"{_sql_bigram_hits(lg)} AS g_{lg}" for lg in _CHAR_PROFILES)}
        FROM documents
      )
    )
    GROUP BY 1, 2
    """,
    tags=("text", "langid"),
)
def q_lang_id_chargram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-bigram language ID: count occurrences of each
    language's distinctive bigrams, argmax with fixed tiebreak —
    the n-gram heuristic complement to the stopword vote (q_lang_id).
    Built on functions/text.py char_bigram_hits / argmax_label."""
    from batch_processing_etl_orchestration_spark.functions.text import (
        argmax_label,
        char_bigram_hits,
    )

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "lang",
        *[
            char_bigram_hits("text", _CHAR_PROFILES[lg]).alias(f"g_{lg}")
            for lg in _CHAR_PROFILES
        ],
    )
    pred = argmax_label({lg: f"g_{lg}" for lg in _CHAR_PROFILES})
    return (
        scored.select("lang", pred.alias("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Deterministic content-hash train/eval split (corpus pipeline staple)
# ---------------------------------------------------------------------------


@register(
    "q_hash_split",
    oracle="""
    SELECT split, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc_id
    FROM (
      SELECT doc_id,
             CASE WHEN CAST('0x' || substring(md5(text), 1, 8) AS BIGINT) % 100 < 90
                  THEN 'train' ELSE 'eval' END AS split
      FROM documents
    )
    GROUP BY 1
    """,
    tags=("text", "split"),
)
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 train/eval split keyed on a content hash
    (md5 prefix mod 100) — reproducible across runs, engines, and
    re-shards, unlike random sampling; near-duplicate content hashes
    to one side only if texts are identical, which is why exact dedup
    runs first in a real pipeline."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("bigint") % 100
    split = F.when(bucket < 90, "train").otherwise("eval")
    return d.select("doc_id", split.alias("split")).groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc_id"),
    )


@register(
    "q_source_mix_rebalance",
    oracle="""
    WITH counts AS (
      SELECT source, COUNT(*) AS n_total FROM documents GROUP BY 1
    ),
    target AS (SELECT MIN(n_total) AS n_min FROM counts),
    kept AS (
      SELECT d.source, COUNT(*) AS n_kept
      FROM documents d
      JOIN counts c ON c.source = d.source
      CROSS JOIN target t
      WHERE CAST('0x' || substring(md5(d.text), 1, 8) AS BIGINT) % 1000000
            < t.n_min * 1000000 // c.n_total
      GROUP BY 1
    )
    SELECT c.source, c.n_total,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
    FROM counts c
    LEFT JOIN kept k ON k.source = c.source
    """,
    tags=("text", "sampling"),
)
def q_source_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mix rebalancing: deterministically downsample every
    source to the size of the smallest one (equal-mix target), the
    data-mixing step that precedes training-corpus assembly. Keep
    probability n_min/n_source is applied as an integer threshold on
    a content-hash bucket (md5 prefix mod 1e6), so the sample is
    reproducible across runs/engines and integer `div` keeps the
    threshold bit-exact. Two passes over documents: a per-source
    count (tiny result, broadcast back) then the filter — at 100 TB
    the counts side is metadata-sized, so the join never shuffles the
    corpus."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    n_min = counts.agg(F.min("n_total").alias("n_min"))
    bucket = (
        F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("bigint") % 1000000
    )
    kept = (
        d.select("source", bucket.alias("_bucket"))
        .join(F.broadcast(counts), "source")
        .crossJoin(F.broadcast(n_min))
        .where(F.col("_bucket") < F.expr("n_min * 1000000 div n_total"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return counts.join(kept, "source", "left").select(
        "source",
        "n_total",
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms (SURVEY §2.10 text-analysis row: TF-IDF)
# ---------------------------------------------------------------------------

_TFIDF_K = 3


@register(
    "q_tfidf_top_terms",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    tf AS (
      SELECT doc_id, word, COUNT(*) AS tf FROM words GROUP BY 1, 2
    ),
    df AS (
      SELECT word, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY 1
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT t.doc_id, t.word,
             ROUND(t.tf * ln(CAST(n.n_docs AS DOUBLE) / CAST(d.df AS DOUBLE)), 6)
               AS tfidf
      FROM tf t JOIN df d ON t.word = d.word CROSS JOIN n
    )
    SELECT doc_id, word, tfidf, rk
    FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, word) AS rk
      FROM scored
    )
    WHERE rk <= {_TFIDF_K}
    """,
    tags=("text", "tfidf"),
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_TFIDF_K} TF-IDF terms per document: term frequency ×
    ln(N/df), ranked per doc with a term tiebreak. tf/df are exact
    ints; the single ln+multiply is rounded to 6dp so a 1-ulp libm
    difference between engines cannot flip a value or a rank.

    Scale: two shuffles (tf on (doc, word), df on word — both compact
    keys); df joins back broadcast-or-shuffle by vocabulary size.
    """
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df = words.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(df, "word").select(
        "doc_id",
        "word",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df").cast("double")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("word"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _TFIDF_K)
        .select("doc_id", "word", "tfidf", "rk")
    )


# ---------------------------------------------------------------------------
# Per-dimension embedding statistics (array analytics)
# ---------------------------------------------------------------------------


@register(
    "q_embedding_dim_stats",
    oracle="""
    SELECT pos,
           COUNT(*) AS n,
           (CAST(SUM(CAST(ROUND(CAST(v AS DOUBLE) * 1000000000) AS BIGINT)) AS DOUBLE)
             / 1000000000.0) AS dim_sum,
           ROUND(MIN(CAST(v AS DOUBLE)), 6) AS dim_min,
           ROUND(MAX(CAST(v AS DOUBLE)), 6) AS dim_max
    FROM (
      SELECT generate_subscripts(embedding, 1) AS pos,
             unnest(embedding) AS v
      FROM embeddings
    )
    GROUP BY 1
    """,
    tags=("similarity", "array"),
)
def q_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension statistics over the embedding column: posexplode
    the vectors, aggregate per position. The columnar scan reads the
    list column once; the shuffle key is the 64-value position. Sum
    uses scale 1e9 (|x| < 1; 2000 rows/dim → far under 2^63); min/max
    of identical float→double casts are exact, rounded only for
    display symmetry."""
    e = load_table(spark, sf_dir, "embeddings")
    x = e.select(F.posexplode("embedding").alias("pos0", "v")).select(
        (F.col("pos0") + 1).alias("pos"), F.col("v").cast("double").alias("v")
    )
    return x.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.round(F.col("v") * F.lit(10**9)).cast("long")) / F.lit(1e9)).alias("dim_sum"),
        F.round(F.min("v"), 6).alias("dim_min"),
        F.round(F.max("v"), 6).alias("dim_max"),
    )


# ---------------------------------------------------------------------------
# Duplicate-cluster assignment: connected components over the near-dup
# pair graph (the step after pairwise dedup — "which rows are one
# document"). Iterative min-label propagation in Spark; the oracle is
# a DuckDB recursive CTE over the identical edge set.
# ---------------------------------------------------------------------------

_SQL_JACCARD_EDGES = """,
    sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY 1
    ),
    langs AS (SELECT doc_id, lang FROM documents),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM shingles a
      JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      JOIN langs la ON la.doc_id = a.doc_id
      JOIN langs lb ON lb.doc_id = b.doc_id AND la.lang = lb.lang
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT c.doc_a, c.doc_b
      FROM common c
      JOIN sizes sa ON sa.doc_id = c.doc_a
      JOIN sizes sb ON sb.doc_id = c.doc_b
      WHERE CAST(c.n_common AS DOUBLE)
              / CAST(sa.n_sh + sb.n_sh - c.n_common AS DOUBLE) >= 0.1
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    )
"""


@register(
    "q_dup_clusters",
    oracle=_SQL_SHINGLES.replace("WITH ", "WITH RECURSIVE ", 1)
    + _SQL_JACCARD_EDGES
    + """,
    walk(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT w.src, e.dst FROM walk w JOIN edges e ON w.dst = e.src
    ),
    comp AS (
      SELECT src AS doc_id, LEAST(src, MIN(dst)) AS comp_id
      FROM walk GROUP BY src
    )
    SELECT doc_id, comp_id,
           COUNT(*) OVER (PARTITION BY comp_id) AS cluster_size
    FROM comp
    """,
    tags=("dedup", "graph", "iterative"),
)
def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate clusters: connected components over the
    word-3-gram Jaccard ≥ 0.1 pair graph (q_ngram_jaccard_pairs'
    edges), each doc labeled with its component's minimum doc_id and
    the cluster size — the "pick one representative per duplicate
    cluster" primitive a training-data pipeline runs after pairwise
    near-dup detection.

    Implementation: operators/dedup.connected_components — min-label
    propagation with per-round pointer jumping (comp := min(comp,
    comp(comp))), so convergence is O(log diameter) rounds even on
    the chain graphs capped LSH buckets emit for over-cap duplicate
    clusters; each round is two key-partitioned joins on the compact
    (long, long) edge list with localCheckpoint lineage truncation.
    The driver-side loop only inspects a monotone scalar (sum of
    labels), never the data. The oracle is a DuckDB recursive CTE
    over the same edge set — a genuinely iterative operator that
    still hash-checks.
    """
    from batch_processing_etl_orchestration_spark.operators.dedup import (
        connected_components,
    )

    pairs = q_ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components(pairs)
    w = Window.partitionBy("comp")
    return labels.select(
        F.col("id").alias("doc_id"),
        F.col("comp").alias("comp_id"),
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    )


def _dup_labels_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-table access with build-once persistence: the
    connected-components fixpoint (q_dup_clusters) runs at most once
    per fixture generation; every later consumer reads the persisted
    DedupLabels parquet. The cache key folds in documents.parquet's
    (mtime, size) so a regenerated fixture invalidates stale labels
    instead of silently serving them. At 100 TB this is the ingest-
    batch labeling pass every downstream dedup consumer amortizes."""

    from batch_processing_etl_orchestration_spark.operators.dedup import DedupLabels

    from batch_processing_etl_orchestration_spark.tables import build_once

    path = build_once(
        sf_dir,
        "documents.parquet",
        "dedup_labels",
        lambda p: DedupLabels.build(spark, q_dup_clusters(spark, sf_dir), p),
    )
    return DedupLabels.load(spark, path).labels()


@register(
    "q_dedup_keep_canonical",
    oracle=_SQL_SHINGLES.replace("WITH ", "WITH RECURSIVE ", 1)
    + _SQL_JACCARD_EDGES
    + """,
    walk(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT w.src, e.dst FROM walk w JOIN edges e ON w.dst = e.src
    ),
    comp AS (
      SELECT src AS doc_id, LEAST(src, MIN(dst)) AS comp_id
      FROM walk GROUP BY src
    ),
    labeled AS (
      SELECT d.doc_id, COALESCE(c.comp_id, d.doc_id) AS comp_id, d.n_chars
      FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    ),
    ranked AS (
      SELECT comp_id, doc_id, n_chars,
             row_number() OVER (PARTITION BY comp_id
                                ORDER BY n_chars DESC, doc_id) AS rk,
             COUNT(*) OVER (PARTITION BY comp_id) AS cluster_size
      FROM labeled
    )
    SELECT comp_id, doc_id AS keep_doc_id, n_chars AS keep_n_chars,
           cluster_size
    FROM ranked WHERE rk = 1
    """,
    tags=("dedup", "graph", "iterative"),
)
def q_dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-survivor resolution: the step after near-dup
    clustering that decides WHICH document each cluster keeps. Rule:
    highest n_chars wins (keep the most complete copy), doc_id breaks
    ties; singleton docs (no near-dup edge) survive as their own
    cluster. Output is one row per surviving document.

    Scale shape: the cluster labels cover only docs that had a
    near-dup edge (a small fraction of a deduped-in-ingest corpus),
    so the label table broadcasts; the survivor window shuffles just
    the (doc_id, comp_id, n_chars) triple — document text never
    leaves the scan. Reference analog: none (reference drops exact
    dups only, duckdb row_number pattern); this is the north-star
    dedup pipeline's keep-rule."""
    clusters = _dup_labels_cached(spark, sf_dir).select("doc_id", "comp_id")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    labeled = d.join(F.broadcast(clusters), "doc_id", "left").select(
        "doc_id",
        F.coalesce("comp_id", "doc_id").alias("comp_id"),
        "n_chars",
    )
    w = Window.partitionBy("comp_id")
    wr = w.orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        labeled.select(
            "comp_id",
            "doc_id",
            "n_chars",
            F.row_number().over(wr).alias("rk"),
            F.count(F.lit(1)).over(w).alias("cluster_size"),
        )
        .where(F.col("rk") == 1)
        .select(
            "comp_id",
            F.col("doc_id").alias("keep_doc_id"),
            F.col("n_chars").alias("keep_n_chars"),
            "cluster_size",
        )
    )


@register(
    "q_unigram_logprob_quality",
    oracle="""
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    freq AS (
      SELECT word, COUNT(*) AS wc FROM words GROUP BY 1
    ),
    total AS (SELECT CAST(SUM(wc) AS BIGINT) AS n_corpus FROM freq),
    contrib AS (
      SELECT w.doc_id,
             CAST(ROUND(ln(CAST(f.wc AS DOUBLE)
                           / CAST(t.n_corpus AS DOUBLE)) * 1000000)
                  AS BIGINT) AS scaled_ll
      FROM words w
      JOIN freq f ON f.word = w.word
      CROSS JOIN total t
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(ROUND(-CAST(SUM(scaled_ll) AS DOUBLE)
                      / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) / 1000000.0
             AS nll_per_token
    FROM contrib
    GROUP BY 1
    """,
    tags=("text", "quality"),
)
def q_unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality score: mean negative log-likelihood per
    token under the corpus's own unigram distribution — the cheap
    perplexity proxy (CCNet-style) that flags documents full of rare
    tokens for review and boilerplate for down-weighting. Per-word
    log-probs are rounded to 6 dp and summed as scaled longs, so the
    order-sensitive double sum becomes an exact integer fold (the
    repo's standard exactness trick); the final divide is a single
    IEEE op both engines agree on.

    Scale shape: vocabulary (freq) is Zipf-small → broadcast join;
    the corpus total is one scalar. One wide shuffle: the groupBy
    doc_id re-aggregation of per-word contributions, carrying only
    (doc_id, long)."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    freq = words.groupBy("word").agg(F.count(F.lit(1)).alias("wc"))
    total = freq.agg(F.sum("wc").cast("bigint").alias("n_corpus"))
    scaled_ll = F.round(
        F.log(F.col("wc").cast("double") / F.col("n_corpus").cast("double"))
        * 1000000
    ).cast("bigint")
    return (
        words.join(F.broadcast(freq), "word")
        .crossJoin(F.broadcast(total))
        .select("doc_id", scaled_ll.alias("scaled_ll"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # round at the 1e6 scale (repo convention): the scaled-long
            # sum divided by the count rounds to an integer micro-nll,
            # exact in both engines; rounding the raw double at scale 6
            # diverges on boundary values.
            (
                F.round(
                    -F.sum("scaled_ll").cast("double")
                    / F.count(F.lit(1)).cast("double")
                ).cast("bigint")
                / F.lit(1000000.0)
            ).alias("nll_per_token"),
        )
    )


@register(
    "q_embedding_quantize_int8",
    oracle="""
    WITH dims AS (
      SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    scales AS (
      SELECT vec_id, GREATEST(MAX(abs(x)) / 127, 1e-12) AS s
      FROM dims GROUP BY 1
    ),
    per_dim AS (
      SELECT d.vec_id, d.label,
             abs(d.x - round(d.x / sc.s) * sc.s) <= sc.s * 0.500001
               AS within,
             CAST(abs(round(d.x / sc.s)) AS BIGINT) AS qabs
      FROM dims d JOIN scales sc ON sc.vec_id = d.vec_id
    ),
    per_vec AS (
      SELECT vec_id, label,
             CAST(COUNT(*) AS BIGINT) AS n_dims,
             bool_and(within) AS vec_within,
             MAX(qabs) AS vec_qmax
      FROM per_dim GROUP BY 1, 2
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(n_dims) AS BIGINT) AS n_dims_total,
           bool_and(vec_within) AS all_within_bound,
           MAX(vec_qmax) AS max_abs_q
    FROM per_vec GROUP BY 1
    """,
    tags=("embedding", "quantization"),
)
def q_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of embeddings (per-vector absmax
    scale, the standard ANN memory-reduction step: 4x smaller index,
    reconstruction error bounded by scale/2). The query attests the
    bound in-query — every dimension's dequantization error must sit
    within scale/2 (+1ulp slack) and every code within [-127,127] —
    and reports per-label vector/dim counts; the oracle recomputes
    the same attestation from the raw embeddings, so a wrong scale,
    rounding mode, or overflow flips a hash-checked boolean.

    Scale shape: quantize/verify run inside higher-order array
    functions on the scan (zero shuffle, no explode — 100 TB of
    vectors never leaves its partition); the only shuffle is the
    tiny per-label rollup. Bound uses MAX/COUNT/AND aggregates only,
    so no summation-order nondeterminism exists anywhere."""
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select(
        "label",
        "embedding",
        F.size("embedding").alias("n_dims"),
        F.expr(
            "GREATEST(aggregate(embedding, CAST(0.0 AS DOUBLE), "
            "(acc, x) -> GREATEST(acc, abs(CAST(x AS DOUBLE)))) / 127, "
            "CAST(1e-12 AS DOUBLE))"
        ).alias("s"),
    ).select(
        "label",
        "n_dims",
        F.expr(
            "forall(embedding, x -> "
            "abs(CAST(x AS DOUBLE) - round(CAST(x AS DOUBLE) / s) * s) "
            "<= s * 0.500001)"
        ).alias("vec_within"),
        F.expr(
            "aggregate(embedding, CAST(0 AS BIGINT), (acc, x) -> "
            "GREATEST(acc, CAST(abs(round(CAST(x AS DOUBLE) / s)) AS BIGINT)))"
        ).alias("vec_qmax"),
    )
    return v.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("n_dims").cast("bigint").alias("n_dims_total"),
        F.bool_and("vec_within").alias("all_within_bound"),
        F.max("vec_qmax").alias("max_abs_q"),
    )


@register(
    "q_length_prune",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM toks),
    hist AS (
      SELECT n_tok, COUNT(*) AS cnt,
             SUM(COUNT(*)) OVER (ORDER BY n_tok) AS cum
      FROM toks GROUP BY 1
    ),
    thresholds AS (
      SELECT (SELECT MIN(n_tok) FROM hist, n
              WHERE cum >= (n.n_docs * 5 + 99) // 100) AS lo_tok,
             (SELECT MIN(n_tok) FROM hist, n
              WHERE cum >= (n.n_docs * 95) // 100) AS hi_tok
    )
    SELECT t.source,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN t.n_tok BETWEEN th.lo_tok AND th.hi_tok
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           th.lo_tok, th.hi_tok
    FROM toks t CROSS JOIN thresholds th
    GROUP BY 1, 4, 5
    """,
    tags=("text", "quality"),
)
def q_length_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-length pruning: drop documents outside the exact
    [p05, p95] token-count band (k-th smallest = min length whose
    cumulative histogram count reaches k; k derived with integer
    ceil/floor division, so thresholds are bit-exact — no double
    quantile math anywhere). Training pipelines run this to cut
    truncated fragments and concatenation blobs.

    Scale shape: the percentile comes from the LENGTH HISTOGRAM
    (compact key: distinct token counts), not a global sort of the
    corpus — the cumulative window runs over thousands of rows at any
    corpus size, then two scalar thresholds broadcast back into the
    keep filter. This is the exact-percentile plan that survives
    100 TB; a row-level row_number() would global-sort everything."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "source", F.size(F.split("text", " ")).cast("bigint").alias("n_tok")
    )
    n_docs = toks.count()
    lo_k = (n_docs * 5 + 99) // 100
    hi_k = (n_docs * 95) // 100
    hist = (
        toks.groupBy("n_tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "cum",
            F.sum("cnt").over(
                Window.orderBy("n_tok").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
    )
    th = hist.agg(
        F.min(F.when(F.col("cum") >= lo_k, F.col("n_tok"))).alias("lo_tok"),
        F.min(F.when(F.col("cum") >= hi_k, F.col("n_tok"))).alias("hi_tok"),
    )
    return (
        toks.crossJoin(F.broadcast(th))
        .groupBy("source", "lo_tok", "hi_tok")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(
                F.when(
                    F.col("n_tok").between(F.col("lo_tok"), F.col("hi_tok")), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_kept"),
        )
        .select("source", "n_total", "n_kept", "lo_tok", "hi_tok")
    )


@register(
    "q_pmi_collocations",
    oracle="""
    WITH words AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) AS pos,
             unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_w FROM words GROUP BY 1),
    n AS (SELECT CAST(SUM(n_w) AS BIGINT) AS n_tok FROM uni),
    bi AS (
      SELECT w AS a, lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS b
      FROM words
    ),
    bic AS (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM bi WHERE b IS NOT NULL GROUP BY 1, 2
    ),
    btot AS (SELECT CAST(SUM(n_ab) AS BIGINT) AS n_bi FROM bic),
    scored AS (
      SELECT bc.a, bc.b, bc.n_ab,
             CAST(ROUND(ln((CAST(bc.n_ab AS DOUBLE)
                            * CAST(n.n_tok AS DOUBLE)
                            * CAST(n.n_tok AS DOUBLE))
                           / (CAST(bt.n_bi AS DOUBLE)
                              * CAST(ua.n_w AS DOUBLE)
                              * CAST(ub.n_w AS DOUBLE)))
                        * 1000000) AS BIGINT) / 1000000.0 AS pmi
      FROM bic bc
      JOIN uni ua ON ua.w = bc.a
      JOIN uni ub ON ub.w = bc.b
      CROSS JOIN n CROSS JOIN btot bt
      WHERE bc.n_ab >= 5
    )
    SELECT a, b, n_ab, pmi FROM scored
    ORDER BY pmi DESC, a, b LIMIT 20
    """,
    tags=("text", "collocations"),
)
def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 word collocations by pointwise mutual information
    (bigram count >= 5) — the corpus-analysis op that surfaces
    multiword expressions worth treating as single tokens. PMI =
    ln(p(ab) / (p(a)p(b))) computed as one ln of an integer-derived
    quotient with the SAME association both engines, then
    scale-then-rounded; no log is ever summed, so no fold-order
    nondeterminism exists.

    Scale shape: bigrams generate array-locally in the scan (no
    per-word window shuffle); the two unigram joins broadcast the
    Zipf-small vocab; the final top-20 sorts only the >=5-count
    bigram table with a full (pmi, a, b) tiebreak."""
    d = load_table(spark, sf_dir, "documents")
    bigrams = (
        "CASE WHEN size(_w) >= 2 THEN "
        "transform(sequence(0, size(_w) - 2), "
        "i -> struct(_w[i] AS a, _w[i + 1] AS b)) "
        "ELSE array() END"
    )
    bi = (
        d.select(F.split("text", " ").alias("_w"))
        .select(F.explode(F.expr(bigrams)).alias("p"))
        .select("p.a", "p.b")
    )
    uni = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    n_tok = uni.agg(F.sum("n_w").cast("bigint").alias("n_tok"))
    bic = bi.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_ab"))
    n_bi = bic.agg(F.sum("n_ab").cast("bigint").alias("n_bi"))
    ua = uni.select(F.col("w").alias("a"), F.col("n_w").alias("n_a"))
    ub = uni.select(F.col("w").alias("b"), F.col("n_w").alias("n_b"))
    pmi_raw = F.log(
        (
            F.col("n_ab").cast("double")
            * F.col("n_tok").cast("double")
            * F.col("n_tok").cast("double")
        )
        / (
            F.col("n_bi").cast("double")
            * F.col("n_a").cast("double")
            * F.col("n_b").cast("double")
        )
    )
    return (
        bic.where(F.col("n_ab") >= 5)
        .join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(n_bi))
        .select(
            "a",
            "b",
            "n_ab",
            (F.round(pmi_raw * 1000000).cast("bigint") / F.lit(1000000.0)).alias(
                "pmi"
            ),
        )
        .orderBy(F.col("pmi").desc(), "a", "b")
        .limit(20)
    )


@register(
    "q_zipf_fit",
    oracle="""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    freq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_w FROM words GROUP BY 1),
    ranked AS (
      SELECT n_w, row_number() OVER (ORDER BY n_w DESC, w) AS rk FROM freq
    ),
    pts AS (
      SELECT CAST(ROUND(ln(CAST(rk AS DOUBLE)) * 1000000) AS BIGINT) AS x,
             CAST(ROUND(ln(CAST(n_w AS DOUBLE)) * 1000000) AS BIGINT) AS y
      FROM ranked
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y // 1000000) AS BIGINT) AS sxy,
             CAST(SUM(x * x // 1000000) AS BIGINT) AS sxx
      FROM pts
    )
    SELECT n AS n_types,
           CAST(ROUND(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / 1000000)
                       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / 1000000))
                      * 1000000) AS BIGINT) / 1000000.0 AS zipf_slope
    FROM s
    """,
    tags=("text", "corpus-stats"),
)
def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency slope: least-squares fit of ln(freq) vs
    ln(rank) over the vocabulary — the corpus-health scalar quality
    reports track (natural text sits near -1; template/boilerplate
    corpora flatten). Every ln is rounded to a scaled long BEFORE any
    sum and the cross terms integer-divide back to the same scale, so
    all four regression sums are exact integers; the slope is then a
    fixed expression tree over exact inputs, scale-then-rounded.

    Scale shape: vocabulary-sized data only after the one word
    shuffle — but a 100 TB web corpus's vocabulary is itself huge, so
    the rank is the THREE-LEVEL form (VERDICT r11 #3 rider; tightened
    in r12 review): words bucket by (n_w, first-two-chars) — the
    2-char prefix is monotone in the binary string order, so
    (n_w DESC, bucket, w) IS the rank order — and each task ranks only
    its own bucket. The grouped (n_w, _wb) offsets table is NOT
    constant-size (distinct head frequencies grow ~sqrt(corpus), so at
    100 TB it is millions of rows — the r12 review catch), so ITS
    prefix sum is itself two-phase: range-repartitioned on the rank
    order, per-range totals prefix-summed on the CONSTANT 256-row
    range table (the only unpartitioned window anywhere), range-local
    cumulative windows for the rest. The offsets→vocab join carries no
    broadcast hint — the relation is corpus-dependent, so the planner
    (AQE) picks broadcast only when it actually fits. The hapax
    plateau (n_w = 1, half the vocab) still splits across its prefix
    buckets instead of one task, and rank VALUES are independent of
    where the range boundaries land, so the output is deterministic.

    Caching note (ADVICE r12 #3): the lazy localCheckpoint pinning
    `_pid` holds its executor blocks until the GC-driven
    ContextCleaner collects the plan, so repeated invocations in one
    long-lived session accumulate storage until GC runs, and a real
    cluster loses recompute-on-executor-loss for those blocks. Both
    `_pid` consumers share the single repartitionByRange exchange
    within an action (ReusedExchange would usually make the pin
    redundant), but the pin is kept because exchange reuse is an
    OPTIMIZATION Spark may skip (AQE replanning), and a double-
    evaluated range shuffle with different sampled boundaries would
    silently mis-join `_poff`. Sessions that loop this query can
    `spark.catalog.clearCache()` or rely on GC."""
    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    keyed = freq.withColumn("_wb", F.substring("w", 1, 2))
    grouped = keyed.groupBy("n_w", "_wb").agg(F.count(F.lit(1)).alias("_c"))
    # pin the range partitioning so the per-range totals and the
    # range-local windows below see the SAME partition ids (lazy: the
    # first action materializes it once; plan-only callers pay nothing)
    ranged = (
        grouped.repartitionByRange(256, F.col("n_w").desc(), "_wb")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    pid_off_w = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    pid_off = (
        ranged.groupBy("_pid")
        .agg(F.sum("_c").alias("_pt"))
        .select(
            "_pid",
            F.coalesce(F.sum("_pt").over(pid_off_w), F.lit(0)).alias("_poff"),
        )
    )
    in_pid = (
        Window.partitionBy("_pid")
        .orderBy(F.col("n_w").desc(), "_wb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = ranged.join(F.broadcast(pid_off), "_pid").select(
        "n_w",
        "_wb",
        (
            F.col("_poff")
            + F.coalesce(F.sum("_c").over(in_pid), F.lit(0))
        ).alias("_off"),
    )
    w_in = Window.partitionBy("n_w", "_wb").orderBy("w")
    rk = F.col("_off") + F.row_number().over(w_in)
    pts = keyed.join(offsets, ["n_w", "_wb"]).select(
        F.round(F.log(rk.cast("double")) * 1000000).cast("bigint").alias("x"),
        F.round(F.log(F.col("n_w").cast("double")) * 1000000)
        .cast("bigint")
        .alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.expr("x * y div 1000000")).cast("bigint").alias("sxy"),
        F.sum(F.expr("x * x div 1000000")).cast("bigint").alias("sxx"),
    )
    slope = (
        F.col("n").cast("double") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double") / 1000000
    ) / (
        F.col("n").cast("double") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double") / 1000000
    )
    return s.select(
        F.col("n").alias("n_types"),
        (F.round(slope * 1000000).cast("bigint") / F.lit(1000000.0)).alias(
            "zipf_slope"
        ),
    )


# ---------------------------------------------------------------------------
# Sequence packing: bin documents into fixed token budgets — the step
# that turns a filtered corpus into training batches (packing short
# docs together instead of padding each to the context length). The
# bin assignment depends on the RUNNING bin fill, a sequential
# next-fit recurrence (same family as the capped-session walk); it
# parallelizes across independent packer groups.
# ---------------------------------------------------------------------------

_PACK_BUDGET = 512  # tokens per bin (whitespace tokens here)
_N_PACKERS = 8


@register(
    "q_pack_sequences",
    oracle=f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             doc_id % {_N_PACKERS} AS packer,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             row_number() OVER (PARTITION BY doc_id % {_N_PACKERS}
                                ORDER BY doc_id) AS rn
      FROM documents
    ),
    walk(packer, rn, doc_id, n_tokens, bin_idx, bin_fill) AS (
      SELECT packer, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
      FROM toks WHERE rn = 1
      UNION ALL
      SELECT t.packer, t.rn, t.doc_id, t.n_tokens,
             CASE WHEN w.bin_fill + t.n_tokens > {_PACK_BUDGET}
                  THEN w.bin_idx + 1 ELSE w.bin_idx END,
             CASE WHEN w.bin_fill + t.n_tokens > {_PACK_BUDGET}
                  THEN t.n_tokens ELSE w.bin_fill + t.n_tokens END
      FROM walk w
      JOIN toks t ON t.packer = w.packer AND t.rn = w.rn + 1
    )
    SELECT packer, bin_idx,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc_id
    FROM walk GROUP BY 1, 2
    """,
    tags=("text", "packing", "grouped-map"),
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-fit sequence packing: docs partition into {_N_PACKERS}
    independent packer groups (doc_id mod — deterministic and
    SQL-reproducible), and each group walks its docs in doc_id order,
    closing the open bin whenever the next doc would overflow the
    token budget. A doc longer than the budget occupies its own
    (overflowing) bin — flagged downstream by total_tokens > budget,
    never silently truncated here. Output is per-bin stats, so a
    packing bug (wrong split point, lost doc) changes counts/sums and
    the hash.

    Scale: ONE shuffle (repartition on packer), then a sorted
    STREAMING walk — `sortWithinPartitions(packer, doc_id)` makes each
    packer's rows contiguous and ordered inside its partition, and
    `mapInPandas` consumes them one Arrow batch at a time. Unlike a
    `groupBy().applyInPandas` (which materializes a whole group as one
    pandas frame — corpus/N_packers rows in a single heap at 100 TB),
    resident state here is one open-bin tuple per in-flight packer
    plus the current Arrow batch, regardless of group size. The packer
    count scales with the cluster (packer = hash(doc) % N) without
    touching memory. Reference analog: none (north-star LLM-pipeline
    brief)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % _N_PACKERS).alias("packer"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    return _next_fit_bins(d)


_PACK_SCHEMA = (
    "packer BIGINT, bin_idx BIGINT, n_docs BIGINT, "
    "total_tokens BIGINT, first_doc_id BIGINT"
)


def _next_fit_bins(d: DataFrame, budget: int = _PACK_BUDGET) -> DataFrame:
    """Shared next-fit packing walk over (doc_id, packer, n_tokens):
    one hash shuffle on packer, an in-partition sort, then a streaming
    `mapInPandas` pass. Rows for a packer arrive contiguous and
    doc_id-ordered, so the walk carries only the open bin's
    (bin_idx, bin_fill, n_docs, total_tokens, first_doc_id) across
    batch boundaries and emits a bin the moment it closes — no group
    is ever materialized whole, so a packer group larger than executor
    memory still streams. Used by q_pack_sequences (whitespace-token
    budget), q_pack_sequences_bpe (tokenizer-token budget), and the
    corpus-assembly pipeline."""

    def walk(batches):
        import pandas as pd

        cols = ["packer", "bin_idx", "n_docs", "total_tokens", "first_doc_id"]
        packer = None  # packer of the open bin, None = no open bin
        bin_idx = n_docs = total = first = 0
        bin_fill = 0
        for pdf in batches:
            closed = []
            for p, nt, did in zip(
                pdf["packer"].to_numpy(),
                pdf["n_tokens"].to_numpy(),
                pdf["doc_id"].to_numpy(),
            ):
                p, nt, did = int(p), int(nt), int(did)
                if p != packer:  # new packer group starts
                    if packer is not None:
                        closed.append((packer, bin_idx, n_docs, total, first))
                    packer, bin_idx = p, 0
                    bin_fill, n_docs, total, first = nt, 1, nt, did
                elif bin_fill + nt > budget:  # close bin, open next
                    closed.append((packer, bin_idx, n_docs, total, first))
                    bin_idx += 1
                    bin_fill, n_docs, total, first = nt, 1, nt, did
                else:  # doc fits the open bin
                    bin_fill += nt
                    n_docs += 1
                    total += nt
            if closed:
                yield pd.DataFrame(closed, columns=cols)
        if packer is not None:  # flush the last open bin
            yield pd.DataFrame(
                [(packer, bin_idx, n_docs, total, first)], columns=cols
            )

    return (
        d.repartition("packer")
        .sortWithinPartitions("packer", "doc_id")
        .mapInPandas(walk, _PACK_SCHEMA)
    )


@register(
    "q_source_mix_temperature",
    oracle="""
    WITH counts AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_total
      FROM documents GROUP BY 1
    ),
    mn AS (SELECT MIN(n_total) AS n_min FROM counts),
    thresholds AS (
      SELECT c.source, c.n_total,
             CAST(FLOOR(1000000 * SQRT(CAST(m.n_min AS DOUBLE)
                                       / CAST(c.n_total AS DOUBLE)))
                  AS BIGINT) AS keep_threshold
      FROM counts c, mn m
    ),
    kept AS (
      SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_kept
      FROM documents d
      JOIN thresholds t ON t.source = d.source
      WHERE CAST('0x' || substring(md5(d.text), 1, 8) AS BIGINT) % 1000000
            < t.keep_threshold
      GROUP BY 1
    )
    SELECT t.source, t.n_total, t.keep_threshold,
           COALESCE(k.n_kept, 0) AS n_kept
    FROM thresholds t LEFT JOIN kept k ON k.source = t.source
    """,
    tags=("text", "sampling", "mixing"),
)
def q_source_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing (τ = 0.5): keep probability
    p_s = sqrt(n_min / n_s), the standard flattening between equal-mix
    (τ→0, q_source_mix_rebalance) and natural proportions (τ = 1) —
    big sources are downsampled, small ones kept whole, so no source
    dominates pretraining without discarding the long tail entirely.
    Same deterministic md5-bucket thresholding as the equal-mix query;
    IEEE sqrt is correctly rounded in both engines, so the integer
    thresholds agree exactly and the sample is reproducible
    across runs, engines, and re-shards. Counts are metadata-sized and
    broadcast; the corpus is filtered in place, never shuffled."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    n_min = counts.agg(F.min("n_total").alias("n_min"))
    thresholds = counts.crossJoin(F.broadcast(n_min)).select(
        "source",
        "n_total",
        F.floor(
            1000000
            * F.sqrt(F.col("n_min").cast("double") / F.col("n_total").cast("double"))
        )
        .cast("bigint")
        .alias("keep_threshold"),
    )
    bucket = (
        F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("bigint") % 1000000
    )
    kept = (
        d.select("source", bucket.alias("_bucket"))
        .join(F.broadcast(thresholds), "source")
        .where(F.col("_bucket") < F.col("keep_threshold"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return thresholds.join(kept, "source", "left").select(
        "source",
        "n_total",
        "keep_threshold",
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
    )


# ---------------------------------------------------------------------------
# Corpus assembly: the north-star stages CHAINED as one DAG — exact
# dedup → benchmark decontamination → length filter → temperature
# source mixing → sequence packing. Each stage is the registered
# standalone operator; this query attests they compose (the oracle
# mirrors every stage, so a bug anywhere in the chain hash-mismatches
# the final bins).
# ---------------------------------------------------------------------------


@register(
    "q_corpus_assembly",
    oracle=_SQL_SHINGLES_8.replace("WITH ", "WITH RECURSIVE ", 1)
    + """,
    train AS (
      SELECT doc_id, text, lang, n_chars FROM documents WHERE doc_id % 20 <> 0
    ),
    deduped AS (
      SELECT doc_id, text, lang, n_chars FROM (
        SELECT t.*, row_number() OVER (PARTITION BY md5(text)
                                       ORDER BY doc_id) AS rk
        FROM train t
      ) WHERE rk = 1
    ),
    eval_g AS (
      SELECT DISTINCT shingle FROM shingles8 WHERE doc_id % 20 = 0
    ),
    contaminated AS (
      SELECT DISTINCT s.doc_id
      FROM shingles8 s JOIN eval_g e ON s.shingle = e.shingle
    ),
    clean AS (
      SELECT d.* FROM deduped d
      WHERE d.doc_id NOT IN (SELECT doc_id FROM contaminated)
        AND d.n_chars BETWEEN 100 AND 520
    ),
    counts AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_l FROM clean GROUP BY 1
    ),
    mn AS (SELECT MIN(n_l) AS n_min FROM counts),
    kept AS (
      SELECT c.doc_id, c.text
      FROM clean c JOIN counts ct ON ct.lang = c.lang, mn
      WHERE CAST('0x' || substring(md5(c.text), 1, 8) AS BIGINT) % 1000000
            < CAST(FLOOR(1000000 * SQRT(CAST(mn.n_min AS DOUBLE)
                                        / CAST(ct.n_l AS DOUBLE))) AS BIGINT)
    ),
    toks AS (
      SELECT doc_id,
             doc_id % 8 AS packer,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             row_number() OVER (PARTITION BY doc_id % 8
                                ORDER BY doc_id) AS rn
      FROM kept
    ),
    walk(packer, rn, doc_id, n_tokens, bin_idx, bin_fill) AS (
      SELECT packer, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
      FROM toks WHERE rn = 1
      UNION ALL
      SELECT t.packer, t.rn, t.doc_id, t.n_tokens,
             CASE WHEN w.bin_fill + t.n_tokens > 512
                  THEN w.bin_idx + 1 ELSE w.bin_idx END,
             CASE WHEN w.bin_fill + t.n_tokens > 512
                  THEN t.n_tokens ELSE w.bin_fill + t.n_tokens END
      FROM walk w
      JOIN toks t ON t.packer = w.packer AND t.rn = w.rn + 1
    )
    SELECT packer, bin_idx,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc_id
    FROM walk GROUP BY 1, 2
    """,
    tags=("text", "pipeline", "assembly", "grouped-map"),
)
def q_corpus_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-corpus assembly end-to-end, every stage the registered
    standalone operator:

    1. exact dedup — keep the lowest doc_id per md5(text) group;
    2. decontamination — drop survivors sharing any word-8-gram with
       the eval split (doc_id % 20 == 0), operators/dedup.decontaminate;
    3. length filter — n_chars in [100, 520];
    4. temperature mixing (τ = 0.5) BY LANGUAGE — en dominates the
       fixture ~3:1, so the sqrt(n_min/n_l) thresholds genuinely bind;
    5. next-fit sequence packing into 512-token bins per packer group.

    The composed oracle mirrors all five stages, so the final bins
    hash-match only if every stage and every stage BOUNDARY is right —
    the integration attestation the per-operator queries can't give.

    Scale: the chain is exactly the per-operator plans back to back —
    no extra shuffles appear from composition (dedup window on the
    hash, broadcast decontamination semi-join, metadata-sized count
    joins, one grouped-map shuffle at the end)."""
    from batch_processing_etl_orchestration_spark.operators.dedup import decontaminate

    d = load_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 20 == 0
    train = d.where(~is_eval)
    wdup = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    # Stage-boundary localCheckpoints (r15 optimization): deduped
    # feeds decontamination AND the anti-join, clean feeds the mix
    # counts AND the kept projection — each extra consumer would
    # re-run the whole upstream subtree (Catalyst does not dedupe
    # common subplans; the composed initial plan carried 18 scans of
    # redundant recomputation). Materializing each stage once is the
    # composition's intent: the chain stays the per-operator plans
    # back to back, now literally back to back.
    deduped = _stage_checkpoint(
        train.withColumn("_rk", F.row_number().over(wdup))
        .where(F.col("_rk") == 1)
        .drop("_rk"),
        eager=False,
    )
    contaminated = decontaminate(deduped, d.where(is_eval), n=8).select("doc_id")
    clean = _stage_checkpoint(
        deduped.join(contaminated, "doc_id", "left_anti")
        .where(F.col("n_chars").between(100, 520)),
        eager=False,
    )
    # counts is lang-sized but its subtree is a full corpus pass —
    # truncate so the n_min scalar and the thresholds join don't each
    # pay one.
    counts = _stage_checkpoint(
        clean.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l")),
        eager=False,
    )
    n_min = counts.agg(F.min("n_l").alias("n_min"))
    thresholds = counts.crossJoin(F.broadcast(n_min)).select(
        "lang",
        F.floor(
            1000000
            * F.sqrt(F.col("n_min").cast("double") / F.col("n_l").cast("double"))
        )
        .cast("bigint")
        .alias("_thr"),
    )
    bucket = (
        F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("bigint") % 1000000
    )
    kept = (
        clean.join(F.broadcast(thresholds), "lang")
        .where(bucket < F.col("_thr"))
        .select(
            "doc_id",
            (F.col("doc_id") % _N_PACKERS).alias("packer"),
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        )
    )
    return _next_fit_bins(kept)


# ---------------------------------------------------------------------------
# Heavy hitters: exact top-k without shuffling the key space
# ---------------------------------------------------------------------------


@register(
    "q_heavy_hitters_words",
    oracle="""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ),
    counts AS (SELECT word, COUNT(*) AS n FROM words GROUP BY word)
    SELECT word, n, TRUE AS certified
    FROM counts ORDER BY n DESC, word LIMIT 10
    """,
    tags=("northstar", "text", "sketch"),
)
def q_heavy_hitters_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 corpus words via two-phase Misra-Gries
    (operators/frequent.py): per-partition O(capacity) summaries emit
    candidate keys, then ONE exact recount of candidates only —
    counts are exact, and the emitted `certified` flag proves it
    in-query (10th count 840 ≫ n/capacity ≈ 425 at sf0.01), which the
    oracle's full GROUP BY hash-checks.

    Scale: a plain groupBy shuffles one record per distinct key — at
    100 TB, billions of keys for a top-100 question. Here the shuffle
    holds ≤ capacity×partitions candidate keys. This fixture's 31-word
    vocabulary fits inside capacity (summaries never evict); the
    eviction path and its superset guarantee are pinned on a synthetic
    Zipf stream and an adversarial hot key in
    tests/test_frequent.py."""
    from batch_processing_etl_orchestration_spark.operators.frequent import (
        top_k_certified,
    )

    words = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("word")
    )
    top, certified = top_k_certified(words, "word", 10, capacity=64)
    return top.select("word", "n", F.lit(bool(certified)).alias("certified"))


# ---------------------------------------------------------------------------
# Inverted-index retrieval (operators/retrieval.py)
# ---------------------------------------------------------------------------

_SEARCH_TERMS = ["join", "hash"]
_BM25_TERMS = ["join", "hash", "scan"]


@register(
    "q_index_search_and",
    oracle="""
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    tf AS (
      SELECT doc_id, word, COUNT(*) AS tf
      FROM words WHERE word IN ('join', 'hash')
      GROUP BY doc_id, word
    )
    SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS total_tf
    FROM tf GROUP BY doc_id HAVING COUNT(*) = 2
    """,
    tags=("northstar", "retrieval"),
)
def q_index_search_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive term search answered from the PERSISTED inverted
    index (operators/retrieval.py PostingsIndex): docs containing both
    'join' AND 'hash', with their summed term frequency. The k-way
    posting intersection is ONE pruned scan + ONE groupBy (match
    count == k), never a join of per-term sets.

    Scale: the index is built once, range-clustered on word, so a
    term lookup reads only the posting files whose [min,max] word
    range covers it (same footer-stats pruning audited for zorder_by);
    the corpus itself is never rescanned at query time. The oracle
    recomputes from raw text."""
    from batch_processing_etl_orchestration_spark.operators.retrieval import (
        PostingsIndex,
        search_all_terms,
    )

    idx = _postings_index(spark, sf_dir)
    return search_all_terms(idx.postings(), _SEARCH_TERMS)


def _postings_index(spark: SparkSession, sf_dir: str):

    from batch_processing_etl_orchestration_spark.operators.retrieval import (
        PostingsIndex,
    )

    from batch_processing_etl_orchestration_spark.tables import build_once

    path = build_once(
        sf_dir,
        "documents.parquet",
        "postings_index",
        lambda p: PostingsIndex.build(
            spark, load_table(spark, sf_dir, "documents"), p
        ),
        layout=6,  # r13: corpus-stats metadata, windowed seeds
    )
    return PostingsIndex(spark, path)


@register(
    "q_bm25_topk",
    oracle="""
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    dl AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
    ),
    consts AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) / COUNT(*) AS avgdl FROM dl
    ),
    tf AS (
      SELECT doc_id, word, COUNT(*) AS tf
      FROM words WHERE word IN ('join', 'hash', 'scan')
      GROUP BY doc_id, word
    ),
    dfreq AS (
      SELECT word, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY word
    ),
    scored AS (
      SELECT t.doc_id,
             (ln(1.0 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
              * (t.tf * 2.2))
             / (t.tf + 1.2 * (0.25 + 0.75 * l.dl / c.avgdl)) AS term_score
      FROM tf t
      JOIN dfreq d USING (word)
      JOIN dl l USING (doc_id)
      CROSS JOIN consts c
    )
    SELECT doc_id,
           COUNT(*) AS n_terms_matched,
           ROUND(CAST(SUM(CAST(ROUND(term_score * 1e9) AS BIGINT)) AS DOUBLE)
                 / 1e9, 6) AS score
    FROM scored GROUP BY doc_id
    ORDER BY score DESC, doc_id LIMIT 15
    """,
    tags=("northstar", "retrieval"),
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-15 for a three-term query over the persisted posting
    index (Okapi form, k1=1.2, b=0.75, idf = ln(1 + (N−df+½)/(df+½))),
    served by the BLOCK-MAX pruned path (r13, VERDICT r12 #2): the
    index's per-(word, block) bounds establish a seed-phase top-k
    threshold, and only blocks whose summed bound can reach it are
    scanned — exactness preserved (the oracle is unchanged and the
    hash must match the full scan's), pruning attested by
    q_bm25_blockmax_prune_report. Per-term df and corpus constants
    (N, avgdl) are index-statistics integers re-injected as literals
    into the SAME scoring expression tree as the full-scan path;
    ONE groupBy sums per-doc scores via the scaled-long fold so float
    addition order can't move the hash, and scores round to 6 dp
    (ln's last ulp is libm-specific; every formula input is
    integer-exact, so rounded scores agree across engines). The
    oracle mirrors the exact expression tree, parenthesis for
    parenthesis.

    r14: serving moved to the IMPACT-ORDERED index (blocks assigned by
    maxtf DESC, dl ASC instead of doc-id ranges) — the hash is
    untouched (doc ids never rewritten; equality vs the full scan
    pinned in tests/test_retrieval.py) but block-LEVEL skips now
    engage on corpora whose repetition/length vary, which doc-id
    blocks provably could not deliver on this fixture
    (q_bm25_impact_prune_report attests the kept/candidate
    geometry)."""
    from batch_processing_etl_orchestration_spark.operators.retrieval import (
        bm25_topk_blockmax,
    )

    idx = _impact_index(spark, sf_dir)
    return bm25_topk_blockmax(idx, _BM25_TERMS, k=15)


@register(
    "q_bm25_blockmax_prune_report",
    # Reproduces the ENTIRE pruning rule chain independently: block
    # width (~32 docs/block), per-(word, block) bounds, the
    # JVM-paritied scaled upper bounds, the capped ub-ordered seed
    # prefix, the k-th seed score threshold, and the margin
    # comparison — so a hash match proves the serving path's pruning
    # decisions, not just its ranked output. k=15, |terms|=3 → seed
    # need = 45 posting rows, seed candidate cap = 64, margin = 5.
    oracle="""
    WITH width AS (
      SELECT GREATEST(1, ((MAX(doc_id) + 1) * 32) // COUNT(*)) AS w
      FROM documents
    ),
    dl AS MATERIALIZED (
      SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
    ),
    consts AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl FROM dl
    ),
    tf AS MATERIALIZED (
      SELECT doc_id, word, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents)
      WHERE word IN ('join', 'hash', 'scan')
      GROUP BY doc_id, word
    ),
    stats AS MATERIALIZED (
      SELECT t.word, t.doc_id // (SELECT w FROM width) AS blk,
             MAX(t.tf) AS max_tf, MIN(l.dl) AS min_dl,
             COUNT(*) AS df_blk
      FROM tf t JOIN dl l USING (doc_id)
      GROUP BY 1, 2
    ),
    dfreq AS (SELECT word, SUM(df_blk) AS df FROM stats GROUP BY 1),
    ub AS MATERIALIZED (
      SELECT s.blk,
             SUM(CAST(ROUND(
               ((ln(1.0 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
                 * (s.max_tf * 2.2))
                / (s.max_tf + 1.2 * (0.25 + 0.75 * s.min_dl
                     / (CAST(c.total_dl AS DOUBLE) / c.n_docs))))
               * 1e6) AS BIGINT)) AS ub6,
             SUM(s.df_blk) AS nrows
      FROM stats s JOIN dfreq d USING (word) CROSS JOIN consts c
      GROUP BY 1
    ),
    best AS (SELECT blk FROM ub ORDER BY ub6 DESC, blk LIMIT 1),
    seeds AS MATERIALIZED (
      SELECT blk, nrows FROM ub
      WHERE blk >= (SELECT blk FROM best)
        AND blk < (SELECT blk FROM best) + 256
    ),
    seed_scores AS MATERIALIZED (
      SELECT t.doc_id,
             ROUND(CAST(SUM(CAST(ROUND(
               ((ln(1.0 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
                 * (t.tf * 2.2))
                / (t.tf + 1.2 * (0.25 + 0.75 * l.dl
                     / (CAST(c.total_dl AS DOUBLE) / c.n_docs))))
               * 1e9) AS BIGINT)) AS DOUBLE) / 1e9, 6) AS score
      FROM tf t
      JOIN dfreq d USING (word)
      JOIN dl l USING (doc_id)
      CROSS JOIN consts c
      WHERE t.doc_id // (SELECT w FROM width) IN (SELECT blk FROM seeds)
      GROUP BY t.doc_id
    ),
    theta AS MATERIALIZED (
      SELECT CAST(ROUND(score * 1e6) AS BIGINT) AS t6
      FROM seed_scores ORDER BY score DESC, doc_id LIMIT 1 OFFSET 14
    ),
    kept AS MATERIALIZED (
      SELECT blk, nrows FROM ub
      WHERE (SELECT COUNT(*) FROM theta) = 0
         OR ub6 >= (SELECT t6 FROM theta) - 5
    ),
    termstats AS (
      SELECT word, SUM(df_blk) AS df, MAX(max_tf) AS max_tf
      FROM stats GROUP BY 1
    ),
    bounds AS MATERIALIZED (
      SELECT l.doc_id, ts.word,
             CAST(ROUND(
               ((ln(1.0 + (c.n_docs - ts.df + 0.5) / (ts.df + 0.5))
                 * (ts.max_tf * 2.2))
                / (ts.max_tf + 1.2 * (0.25 + 0.75 * l.dl
                     / (CAST(c.total_dl AS DOUBLE) / c.n_docs))))
               * 1e6) AS BIGINT) AS b6
      FROM dl l CROSS JOIN termstats ts CROSS JOIN consts c
    ),
    docbound AS MATERIALIZED (
      SELECT doc_id, SUM(b6) AS total6 FROM bounds GROUP BY 1
    ),
    bound_kept AS (
      SELECT COUNT(*) AS n
      FROM tf t
      JOIN dl l USING (doc_id)
      JOIN termstats d ON d.word = t.word
      JOIN bounds ob ON ob.doc_id = t.doc_id AND ob.word = t.word
      JOIN docbound db ON db.doc_id = t.doc_id
      CROSS JOIN consts c
      WHERE t.doc_id // (SELECT w FROM width) IN (SELECT blk FROM kept)
        AND ((SELECT COUNT(*) FROM theta) = 0
             OR CAST(ROUND(
                  ((ln(1.0 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
                    * (t.tf * 2.2))
                   / (t.tf + 1.2 * (0.25 + 0.75 * l.dl
                        / (CAST(c.total_dl AS DOUBLE) / c.n_docs))))
                  * 1e6) AS BIGINT)
                + db.total6 - ob.b6
                >= (SELECT t6 FROM theta) - 5)
    )
    SELECT CAST((SELECT w FROM width) AS BIGINT) AS block_width,
           (SELECT COUNT(*) FROM ub) AS n_blocks_total,
           (SELECT COUNT(*) FROM seeds) AS n_blocks_seed,
           CAST(COALESCE((SELECT SUM(nrows) FROM seeds), 0) AS BIGINT)
             AS n_postings_seed,
           (SELECT COUNT(*) FROM kept) AS n_blocks_kept,
           CAST(COALESCE((SELECT SUM(nrows) FROM kept), 0) AS BIGINT)
             AS n_postings_kept,
           (SELECT n FROM bound_kept) AS n_postings_bound_kept,
           CAST(COALESCE((SELECT SUM(nrows) FROM ub), 0) AS BIGINT)
             AS n_postings_total,
           COALESCE((SELECT t6 FROM theta), -1) AS theta_scaled
    """,
    tags=("northstar", "retrieval", "profile"),
)
def q_bm25_blockmax_prune_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Attestation row for block-max BM25 serving (VERDICT r12 #2:
    "pruning attested in-query — ranges scanned vs total"): block
    width, candidate block count, the ub-ordered seed prefix and its
    posting mass, the blocks the threshold keeps and their posting
    mass (vs the total the full scan would walk), and the scaled seed
    threshold. Built from the SAME blockmax_prune_plan dict
    q_bm25_topk's serving executes, so the report cannot drift from
    the rule that actually ran; the oracle recomputes every stage
    independently in SQL — the hash match certifies the pruning
    decisions themselves (bounds, seed order, threshold, margin), not
    just the ranked output. Serving additionally scans the seed
    blocks themselves (n_postings_seed) during threshold discovery,
    and physically coarsens the kept set into ≤ _KEPT_CAP merged id
    ranges — a superset read that can only add rows below the
    threshold, so the LOGICAL kept set reported here is what
    determines the result. n_postings_bound_kept is the SECOND pruning
    stage serving applies on top of the kept blocks: the per-posting
    bound (actual term_score plus every OTHER term's dl-conditional
    maximum vs θ) that cuts the per-doc shuffle mass even when block
    bounds are flat — on this uniform fixture with dense query terms
    it is the stage that actually prunes.

    theta_scaled = round(k-th seed score · 1e6), or -1 when the seed
    phase finds fewer than k docs (then nothing is pruned and kept ==
    total). Blocks hold ~32 docs at every sf, so bound variance — the
    thing block-max exploits — survives scale; BENCH_SF10.md §r13
    re-measures the serving decade."""
    return _blockmax_report(spark, _postings_index(spark, sf_dir))


def _blockmax_report(spark: SparkSession, idx) -> DataFrame:
    """Shared attestation body for the classic and impact-ordered
    block-max reports: executes the SAME blockmax_prune_plan serving
    uses and prices every pruning stage with the serving expression
    trees themselves, so neither report can drift from the rule that
    actually runs. The only mode difference is where blk comes from:
    classic derives it from the id (blk = doc_id // width), impact
    reads the stored assignment."""
    from batch_processing_etl_orchestration_spark.operators.retrieval import (
        _bm25_consts_df,
        _bm25_dfreq_df,
        _bm25_scored,
        _posting_bound_keep,
        blockmax_prune_plan,
    )

    plan = blockmax_prune_plan(idx, _BM25_TERMS, k=15)
    if plan is None:  # the fixture index is tombstone-free by build
        raise RuntimeError("blockmax plan unavailable on fixture index")
    blocks = plan["_blocks_df"]
    if plan["theta_scaled"] is None:
        tot = blocks.agg(
            F.count(F.lit(1)).cast("long").alias("nb"),
            F.coalesce(F.sum("nrows"), F.lit(0)).cast("long").alias("nr"),
        ).first()
        n_blocks_total, n_postings_total = int(tot["nb"]), int(tot["nr"])
        # no threshold → nothing pruned: kept == all candidates
        n_blocks_kept, n_postings_kept = n_blocks_total, n_postings_total
    else:
        # ONE fused agg for totals + kept (r15 optimization): the kept
        # rows are `blocks` rows passing the threshold predicate, so
        # conditional sums over one scan produce the identical four
        # numbers the two sequential aggs did — one driver action
        # instead of two (guide §1.2: remove passes).
        _kept = F.col("ub6") >= F.lit(
            int(plan["theta_scaled"]) - int(plan["margin"])
        )
        tot = blocks.agg(
            F.count(F.lit(1)).cast("long").alias("nb"),
            F.coalesce(F.sum("nrows"), F.lit(0)).cast("long").alias("nr"),
            F.count(F.when(_kept, F.lit(1))).cast("long").alias("knb"),
            F.coalesce(
                F.sum(F.when(_kept, F.col("nrows"))), F.lit(0)
            ).cast("long").alias("knr"),
        ).first()
        n_blocks_total, n_postings_total = int(tot["nb"]), int(tot["nr"])
        n_blocks_kept, n_postings_kept = int(tot["knb"]), int(tot["knr"])
    if plan["theta_scaled"] is None:
        n_bound_kept = n_postings_kept
    else:
        # count the postings that survive BOTH the logical kept-block
        # set and the per-posting bound — the attestation pays one
        # counting scan (same expressions as serving) so the report
        # cannot drift from the filter that actually runs
        keptdf = plan["_blocks_df"].where(
            F.col("ub6")
            >= F.lit(int(plan["theta_scaled"]) - int(plan["margin"]))
        ).select("blk")
        # pinned to the plan's generation: the attestation must count
        # against the SAME committed state the plan's stats derive
        # from (review r14) — unpinned reads could chase a concurrent
        # publish past the plan snapshot
        hits = idx.postings(
            plan["_gen"], segs=plan["_segs"], dead=None
        ).where(F.col("word").isin(list(_BM25_TERMS)))
        if not plan["impact"]:
            hits = hits.withColumn(
                "blk",
                F.floor(F.col("doc_id") / F.lit(plan["width"])).cast(
                    "long"
                ),
            )
        hits = hits.join(F.broadcast(keptdf), "blk")
        n_bound_kept = (
            _bm25_scored(
                hits,
                idx.doclens(plan["_gen"], segs=plan["_segs"], dead=None),
                _bm25_dfreq_df(spark, plan["df"]),
                _bm25_consts_df(spark, plan["n_docs"], plan["total_dl"]),
                1.2,
                0.75,
                "doc_id",
            )
            .where(_posting_bound_keep(plan, 1.2, 0.75))
            .count()
        )
    row = (
        int(plan["width"]),
        n_blocks_total,
        len(plan["seed_blocks"]),
        int(plan["seed_rows"]),
        n_blocks_kept,
        n_postings_kept,
        int(n_bound_kept),
        n_postings_total,
        -1 if plan["theta_scaled"] is None else int(plan["theta_scaled"]),
    )
    from batch_processing_etl_orchestration_spark.tables import local_rows_df

    return local_rows_df(
        spark,
        [row],
        "block_width BIGINT, n_blocks_total BIGINT, n_blocks_seed BIGINT, "
        "n_postings_seed BIGINT, n_blocks_kept BIGINT, "
        "n_postings_kept BIGINT, n_postings_bound_kept BIGINT, "
        "n_postings_total BIGINT, theta_scaled BIGINT",
    )


def _impact_index(spark: SparkSession, sf_dir: str):
    """The impact-ordered twin of _postings_index (VERDICT r13 #1):
    blocks assigned by (max term frequency DESC, doc length ASC)
    instead of doc-id ranges, so per-block bounds vary and block-LEVEL
    pruning engages — cached once per sf fixture like every derived
    store."""
    from batch_processing_etl_orchestration_spark.operators.retrieval import (
        PostingsIndex,
    )

    from batch_processing_etl_orchestration_spark.tables import build_once

    path = build_once(
        sf_dir,
        "documents.parquet",
        "impact_index",
        lambda p: PostingsIndex.build(
            spark,
            load_table(spark, sf_dir, "documents"),
            p,
            impact_ordered=True,
        ),
        layout=1,
    )
    return PostingsIndex(spark, path)


@register(
    "q_bm25_impact_prune_report",
    # The impact-ordered pruning chain, recomputed independently: the
    # (maxtf DESC, dl ASC) histogram offsets, the mod-spread block
    # assignment (plain % — chosen over a hash precisely so this oracle
    # CAN reproduce it), per-(word, blk) bounds, the seed set (top-128
    # blocks by bound ∪ a 128-target strided sample — impact-mode
    # seeding), the k-th seed threshold, and both pruning stages.
    oracle="""
    WITH dl AS MATERIALIZED (
      SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
    ),
    consts AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl FROM dl
    ),
    tfall AS MATERIALIZED (
      SELECT doc_id, word, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents)
      GROUP BY doc_id, word
    ),
    docstats AS MATERIALIZED (
      SELECT l.doc_id, l.dl, m.maxtf
      FROM dl l JOIN (SELECT doc_id, MAX(tf) AS maxtf FROM tfall
                      GROUP BY 1) m USING (doc_id)
    ),
    offs AS MATERIALIZED (
      SELECT maxtf, dl, cnt,
             COALESCE(SUM(cnt) OVER (
               ORDER BY maxtf DESC, dl ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS off
      FROM (SELECT maxtf, dl, COUNT(*) AS cnt FROM docstats
            GROUP BY 1, 2)
    ),
    blkmap AS MATERIALIZED (
      SELECT s.doc_id,
             CAST((o.off + s.doc_id % o.cnt) // 32 AS BIGINT) AS blk
      FROM docstats s JOIN offs o USING (maxtf, dl)
    ),
    tf AS MATERIALIZED (
      SELECT doc_id, word, tf FROM tfall
      WHERE word IN ('join', 'hash', 'scan')
    ),
    stats AS MATERIALIZED (
      SELECT t.word, b.blk,
             MAX(t.tf) AS max_tf, MIN(l.dl) AS min_dl,
             COUNT(*) AS df_blk
      FROM tf t JOIN blkmap b USING (doc_id) JOIN dl l USING (doc_id)
      GROUP BY 1, 2
    ),
    dfreq AS (SELECT word, SUM(df_blk) AS df FROM stats GROUP BY 1),
    ub AS MATERIALIZED (
      SELECT s.blk,
             SUM(CAST(ROUND(
               ((ln(1.0 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
                 * (s.max_tf * 2.2))
                / (s.max_tf + 1.2 * (0.25 + 0.75 * s.min_dl
                     / (CAST(c.total_dl AS DOUBLE) / c.n_docs))))
               * 1e6) AS BIGINT)) AS ub6,
             SUM(s.df_blk) AS nrows
      FROM stats s JOIN dfreq d USING (word) CROSS JOIN consts c
      GROUP BY 1
    ),
    topseed AS (
      SELECT blk, nrows FROM ub ORDER BY ub6 DESC, blk LIMIT 128
    ),
    nblk AS (SELECT COUNT(*) AS n FROM ub),
    seeds AS MATERIALIZED (
      SELECT blk, nrows FROM topseed
      UNION
      SELECT blk, nrows FROM ub
      WHERE blk % GREATEST(1, (SELECT n FROM nblk) // 128) = 0
    ),
    seed_scores AS MATERIALIZED (
      SELECT t.doc_id,
             ROUND(CAST(SUM(CAST(ROUND(
               ((ln(1.0 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
                 * (t.tf * 2.2))
                / (t.tf + 1.2 * (0.25 + 0.75 * l.dl
                     / (CAST(c.total_dl AS DOUBLE) / c.n_docs))))
               * 1e9) AS BIGINT)) AS DOUBLE) / 1e9, 6) AS score
      FROM tf t
      JOIN dfreq d USING (word)
      JOIN dl l USING (doc_id)
      JOIN blkmap b USING (doc_id)
      CROSS JOIN consts c
      WHERE b.blk IN (SELECT blk FROM seeds)
      GROUP BY t.doc_id
    ),
    theta AS MATERIALIZED (
      SELECT CAST(ROUND(score * 1e6) AS BIGINT) AS t6
      FROM seed_scores ORDER BY score DESC, doc_id LIMIT 1 OFFSET 14
    ),
    kept AS MATERIALIZED (
      SELECT blk, nrows FROM ub
      WHERE (SELECT COUNT(*) FROM theta) = 0
         OR ub6 >= (SELECT t6 FROM theta) - 5
    ),
    termstats AS (
      SELECT word, SUM(df_blk) AS df, MAX(max_tf) AS max_tf
      FROM stats GROUP BY 1
    ),
    bounds AS MATERIALIZED (
      SELECT l.doc_id, ts.word,
             CAST(ROUND(
               ((ln(1.0 + (c.n_docs - ts.df + 0.5) / (ts.df + 0.5))
                 * (ts.max_tf * 2.2))
                / (ts.max_tf + 1.2 * (0.25 + 0.75 * l.dl
                     / (CAST(c.total_dl AS DOUBLE) / c.n_docs))))
               * 1e6) AS BIGINT) AS b6
      FROM dl l CROSS JOIN termstats ts CROSS JOIN consts c
    ),
    docbound AS MATERIALIZED (
      SELECT doc_id, SUM(b6) AS total6 FROM bounds GROUP BY 1
    ),
    bound_kept AS (
      SELECT COUNT(*) AS n
      FROM tf t
      JOIN dl l USING (doc_id)
      JOIN blkmap bm USING (doc_id)
      JOIN termstats d ON d.word = t.word
      JOIN bounds ob ON ob.doc_id = t.doc_id AND ob.word = t.word
      JOIN docbound db ON db.doc_id = t.doc_id
      CROSS JOIN consts c
      WHERE bm.blk IN (SELECT blk FROM kept)
        AND ((SELECT COUNT(*) FROM theta) = 0
             OR CAST(ROUND(
                  ((ln(1.0 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
                    * (t.tf * 2.2))
                   / (t.tf + 1.2 * (0.25 + 0.75 * l.dl
                        / (CAST(c.total_dl AS DOUBLE) / c.n_docs))))
                  * 1e6) AS BIGINT)
                + db.total6 - ob.b6
                >= (SELECT t6 FROM theta) - 5)
    )
    SELECT CAST(32 AS BIGINT) AS block_width,
           (SELECT COUNT(*) FROM ub) AS n_blocks_total,
           (SELECT COUNT(*) FROM seeds) AS n_blocks_seed,
           CAST(COALESCE((SELECT SUM(nrows) FROM seeds), 0) AS BIGINT)
             AS n_postings_seed,
           (SELECT COUNT(*) FROM kept) AS n_blocks_kept,
           CAST(COALESCE((SELECT SUM(nrows) FROM kept), 0) AS BIGINT)
             AS n_postings_kept,
           (SELECT n FROM bound_kept) AS n_postings_bound_kept,
           CAST(COALESCE((SELECT SUM(nrows) FROM ub), 0) AS BIGINT)
             AS n_postings_total,
           COALESCE((SELECT t6 FROM theta), -1) AS theta_scaled
    """,
    tags=("northstar", "retrieval", "profile"),
)
def q_bm25_impact_prune_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The block-max attestation over the IMPACT-ORDERED index
    (VERDICT r13 #1): identical nine-column report and serving
    expressions as q_bm25_blockmax_prune_report, but blocks are
    assigned by static impact (max term frequency DESC, doc length
    ASC — operators/retrieval._with_impact_blk) instead of doc-id
    ranges. On the doc-id geometry every block mixes repetitive and
    plain docs, per-block maxima saturate, and block-LEVEL pruning
    never engages (the honest r13 caveat); impact ordering clusters
    the high-potential docs into a thin block prefix, so the bound
    distribution spreads and the threshold actually drops blocks —
    measured kept/candidate 8145 of 15566 at sf10 while the doc-id
    blocks kept all 15625. Seeding is mode-specific: impact blocks
    are HOMOGENEOUS neighborhoods, so the seed unions the
    top-by-bound blocks with a strided diversity sample instead of
    the classic contiguous window (the window's θ collapsed to 1.47
    vs true 2.09 at sf100). Top-k results are unchanged (doc ids are
    never rewritten; blocking is physical geometry) — certified by
    test_impact_index_matches_full_scan_and_prunes — and the oracle
    reproduces the whole chain including the block ASSIGNMENT itself,
    which is why the spread uses a plain modulo rather than a hash."""
    return _blockmax_report(spark, _impact_index(spark, sf_dir))


@register(
    "q_stream_index_maintain_impact",
    # The impact pruning chain over a STREAM-INGESTED index: identical
    # to q_bm25_impact_prune_report's oracle except the block
    # assignment is SEGMENTED — each micro-batch (seg = doc_id % 4,
    # files drained oldest-first) computes its own (maxtf DESC, dl
    # ASC) histogram and mints blocks in a DISJOINT range whose base
    # is 1 (the empty bootstrap base store's span) plus the spans of
    # the segments landed before it. Everything downstream (bounds,
    # diverse seeding, θ, both pruning stages) is unchanged — which is
    # the point: per-segment block maxima stay discriminative.
    oracle="""
    WITH dl AS MATERIALIZED (
      SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
    ),
    consts AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl FROM dl
    ),
    tfall AS MATERIALIZED (
      SELECT doc_id, word, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents)
      GROUP BY doc_id, word
    ),
    docstats AS MATERIALIZED (
      SELECT l.doc_id, l.dl, m.maxtf, l.doc_id % 4 AS seg
      FROM dl l JOIN (SELECT doc_id, MAX(tf) AS maxtf FROM tfall
                      GROUP BY 1) m USING (doc_id)
    ),
    segcnt AS (
      SELECT seg, COUNT(*) AS n_docs FROM docstats GROUP BY 1
    ),
    bases AS MATERIALIZED (
      SELECT seg,
             1 + COALESCE(SUM(n_docs // 32 + 1) OVER (
               ORDER BY seg
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS blk_base
      FROM segcnt
    ),
    offs AS MATERIALIZED (
      SELECT seg, maxtf, dl, cnt,
             COALESCE(SUM(cnt) OVER (
               PARTITION BY seg
               ORDER BY maxtf DESC, dl ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS off
      FROM (SELECT seg, maxtf, dl, COUNT(*) AS cnt FROM docstats
            GROUP BY 1, 2, 3)
    ),
    blkmap AS MATERIALIZED (
      SELECT s.doc_id,
             CAST(b.blk_base
                  + (o.off + s.doc_id % o.cnt) // 32 AS BIGINT) AS blk
      FROM docstats s JOIN offs o USING (seg, maxtf, dl)
           JOIN bases b USING (seg)
    ),
    tf AS MATERIALIZED (
      SELECT doc_id, word, tf FROM tfall
      WHERE word IN ('join', 'hash', 'scan')
    ),
    stats AS MATERIALIZED (
      SELECT t.word, b.blk,
             MAX(t.tf) AS max_tf, MIN(l.dl) AS min_dl,
             COUNT(*) AS df_blk
      FROM tf t JOIN blkmap b USING (doc_id) JOIN dl l USING (doc_id)
      GROUP BY 1, 2
    ),
    dfreq AS (SELECT word, SUM(df_blk) AS df FROM stats GROUP BY 1),
    ub AS MATERIALIZED (
      SELECT s.blk,
             SUM(CAST(ROUND(
               ((ln(1.0 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
                 * (s.max_tf * 2.2))
                / (s.max_tf + 1.2 * (0.25 + 0.75 * s.min_dl
                     / (CAST(c.total_dl AS DOUBLE) / c.n_docs))))
               * 1e6) AS BIGINT)) AS ub6,
             SUM(s.df_blk) AS nrows
      FROM stats s JOIN dfreq d USING (word) CROSS JOIN consts c
      GROUP BY 1
    ),
    topseed AS (
      SELECT blk, nrows FROM ub ORDER BY ub6 DESC, blk LIMIT 128
    ),
    nblk AS (SELECT COUNT(*) AS n FROM ub),
    seeds AS MATERIALIZED (
      SELECT blk, nrows FROM topseed
      UNION
      SELECT blk, nrows FROM ub
      WHERE blk % GREATEST(1, (SELECT n FROM nblk) // 128) = 0
    ),
    seed_scores AS MATERIALIZED (
      SELECT t.doc_id,
             ROUND(CAST(SUM(CAST(ROUND(
               ((ln(1.0 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
                 * (t.tf * 2.2))
                / (t.tf + 1.2 * (0.25 + 0.75 * l.dl
                     / (CAST(c.total_dl AS DOUBLE) / c.n_docs))))
               * 1e9) AS BIGINT)) AS DOUBLE) / 1e9, 6) AS score
      FROM tf t
      JOIN dfreq d USING (word)
      JOIN dl l USING (doc_id)
      JOIN blkmap b USING (doc_id)
      CROSS JOIN consts c
      WHERE b.blk IN (SELECT blk FROM seeds)
      GROUP BY t.doc_id
    ),
    theta AS MATERIALIZED (
      SELECT CAST(ROUND(score * 1e6) AS BIGINT) AS t6
      FROM seed_scores ORDER BY score DESC, doc_id LIMIT 1 OFFSET 14
    ),
    kept AS MATERIALIZED (
      SELECT blk, nrows FROM ub
      WHERE (SELECT COUNT(*) FROM theta) = 0
         OR ub6 >= (SELECT t6 FROM theta) - 5
    ),
    termstats AS (
      SELECT word, SUM(df_blk) AS df, MAX(max_tf) AS max_tf
      FROM stats GROUP BY 1
    ),
    bounds AS MATERIALIZED (
      SELECT l.doc_id, ts.word,
             CAST(ROUND(
               ((ln(1.0 + (c.n_docs - ts.df + 0.5) / (ts.df + 0.5))
                 * (ts.max_tf * 2.2))
                / (ts.max_tf + 1.2 * (0.25 + 0.75 * l.dl
                     / (CAST(c.total_dl AS DOUBLE) / c.n_docs))))
               * 1e6) AS BIGINT) AS b6
      FROM dl l CROSS JOIN termstats ts CROSS JOIN consts c
    ),
    docbound AS MATERIALIZED (
      SELECT doc_id, SUM(b6) AS total6 FROM bounds GROUP BY 1
    ),
    bound_kept AS (
      SELECT COUNT(*) AS n
      FROM tf t
      JOIN dl l USING (doc_id)
      JOIN blkmap bm USING (doc_id)
      JOIN termstats d ON d.word = t.word
      JOIN bounds ob ON ob.doc_id = t.doc_id AND ob.word = t.word
      JOIN docbound db ON db.doc_id = t.doc_id
      CROSS JOIN consts c
      WHERE bm.blk IN (SELECT blk FROM kept)
        AND ((SELECT COUNT(*) FROM theta) = 0
             OR CAST(ROUND(
                  ((ln(1.0 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
                    * (t.tf * 2.2))
                   / (t.tf + 1.2 * (0.25 + 0.75 * l.dl
                        / (CAST(c.total_dl AS DOUBLE) / c.n_docs))))
                  * 1e6) AS BIGINT)
                + db.total6 - ob.b6
                >= (SELECT t6 FROM theta) - 5)
    )
    SELECT CAST(32 AS BIGINT) AS block_width,
           (SELECT COUNT(*) FROM ub) AS n_blocks_total,
           (SELECT COUNT(*) FROM seeds) AS n_blocks_seed,
           CAST(COALESCE((SELECT SUM(nrows) FROM seeds), 0) AS BIGINT)
             AS n_postings_seed,
           (SELECT COUNT(*) FROM kept) AS n_blocks_kept,
           CAST(COALESCE((SELECT SUM(nrows) FROM kept), 0) AS BIGINT)
             AS n_postings_kept,
           (SELECT n FROM bound_kept) AS n_postings_bound_kept,
           CAST(COALESCE((SELECT SUM(nrows) FROM ub), 0) AS BIGINT)
             AS n_postings_total,
           COALESCE((SELECT t6 FROM theta), -1) AS theta_scaled
    """,
    tags=("streaming", "retrieval", "incremental", "profile"),
)
def q_stream_index_maintain_impact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming maintenance of the IMPACT-ORDERED index (VERDICT r14
    #6): q_stream_index_maintain proved segment-union serving on the
    CLASSIC (width-frozen) geometry; this closes the loop on the
    geometry production serving actually uses. Documents arrive as 4
    deterministic micro-batches (seg = doc_id % 4, one file per
    batch, drained oldest-first via maxFilesPerTrigger=1) through the
    SAME index_stream_sink exactly-once protocol, landing on an
    impact-ordered index bootstrapped EMPTY. Each segment computes
    its own (maxtf DESC, dl ASC) impact histogram and mints blocks in
    a DISJOINT blk range (base = Σ prior stores' spans —
    operators/retrieval.add_segment), so per-segment block maxima
    stay discriminative and block-LEVEL pruning keeps engaging as the
    index grows — the property the one-shot impact build demonstrated
    at sf10/sf100 and a segmented ingest must not lose.

    The registered result is the full nine-column kept/candidate
    attestation (_blockmax_report) over the SEGMENTED index, and the
    oracle reproduces the ENTIRE chain including the per-segment
    block assignment and the segment base offsets — hash equality
    proves the streamed geometry, not just the ranked output (top-15
    equality to the one-shot build is pinned in
    tests/test_stream_index.py).

    Scale: identical per-batch cost profile to q_stream_index_maintain
    (the impact histogram is per-BATCH, metadata-sized); compaction
    re-blocks globally (SCALE.md §segment fan-out)."""
    import os
    import shutil

    from batch_processing_etl_orchestration_spark.operators.retrieval import (
        PostingsIndex,
    )

    from batch_processing_etl_orchestration_spark.tables import (
        build_once,
        empty_df,
        fixture_cache_dir,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def _write_buckets(p: str) -> None:
        """One file per micro-batch, ascending mtimes in bucket order
        so FileStreamSource's oldest-first listing drains batch b as
        micro-batch b — the determinism the oracle's segment-base
        arithmetic needs."""
        os.makedirs(p, exist_ok=True)
        seen: set[str] = set()
        for b in range(4):
            (
                docs.where(F.pmod(F.col("doc_id"), F.lit(4)) == b)
                .coalesce(1)
                .write.mode("append")
                .parquet(p)
            )
            for fn in os.listdir(p):
                if fn.endswith(".parquet") and fn not in seen:
                    seen.add(fn)
                    t = 1_000_000_000 + b
                    os.utime(os.path.join(p, fn), (t, t))

    src = build_once(
        sf_dir, "documents.parquet", "stream_idximp_src", _write_buckets
    )
    run = fixture_cache_dir(
        sf_dir, "documents.parquet", "stream_idximp_run"
    )
    shutil.rmtree(run, ignore_errors=True)  # the scenario mutates state
    path = os.path.join(run, "index")
    ckpt = os.path.join(run, "ckpt")
    PostingsIndex.build(
        spark,
        empty_df(spark, "doc_id BIGINT, text STRING"),
        path,
        impact_ordered=True,
    )
    schema = artifact_schema(spark, src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    sq = (
        stream.writeStream.foreachBatch(index_stream_sink(path))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination()
    return _blockmax_report(spark, PostingsIndex(spark, path))


@register(
    "q_hybrid_search_rrf",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    dl AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
    ),
    consts AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) / COUNT(*) AS avgdl FROM dl
    ),
    tf AS (
      SELECT doc_id, word, COUNT(*) AS tf
      FROM words WHERE word IN ('join', 'hash', 'scan')
      GROUP BY doc_id, word
    ),
    dfreq AS (
      SELECT word, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY word
    ),
    bm25 AS (
      SELECT doc_id,
             ROUND(CAST(SUM(CAST(ROUND(
               ((ln(1.0 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
                 * (t.tf * 2.2))
                / (t.tf + 1.2 * (0.25 + 0.75 * l.dl / c.avgdl))) * 1e9
             ) AS BIGINT)) AS DOUBLE) / 1e9, 6) AS score
      FROM tf t JOIN dfreq d USING (word) JOIN dl l USING (doc_id)
      CROSS JOIN consts c
      GROUP BY doc_id
    ),
    text_rank AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY score DESC, doc_id) AS r_text
      FROM bm25 QUALIFY r_text <= 50
    ),
    q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    elems AS (
      SELECT c.vec_id AS doc_id,
             CAST(ROUND(CAST(q.qe[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)
                        * {_SIM_SCALE}) AS BIGINT) AS p,
             CAST(ROUND(CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)
                        * {_SIM_SCALE}) AS BIGINT) AS qq,
             CAST(ROUND(CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)
                        * {_SIM_SCALE}) AS BIGINT) AS cc
      FROM q, embeddings c, range(1, 65) r(i)
      WHERE c.vec_id <> 0
    ),
    sims AS (
      SELECT doc_id,
             (CAST(SUM(p) AS DOUBLE) / {float(_SIM_SCALE)})
               / (SQRT(CAST(SUM(qq) AS DOUBLE) / {float(_SIM_SCALE)})
                  * SQRT(CAST(SUM(cc) AS DOUBLE) / {float(_SIM_SCALE)}))
               AS cosine_sim
      FROM elems GROUP BY 1
    ),
    vec_rank AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY cosine_sim DESC, doc_id) AS r_vec
      FROM sims QUALIFY r_vec <= 50
    ),
    fused AS (
      SELECT COALESCE(t.doc_id, v.doc_id) AS doc_id,
             COALESCE(1.0 / (60 + t.r_text), 0.0)
               + COALESCE(1.0 / (60 + v.r_vec), 0.0) AS rrf_score,
             t.r_text, v.r_vec
      FROM text_rank t FULL OUTER JOIN vec_rank v USING (doc_id)
    )
    SELECT doc_id, rrf_score, r_text, r_vec
    FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 10
    """,
    tags=("northstar", "retrieval", "similarity"),
)
def q_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 keyword ranking fused with embedding
    cosine ranking by Reciprocal Rank Fusion (Cormack et al., SIGIR
    '09: score = Σ 1/(60 + rank), over each list's top-50). The text
    leg runs on the persisted posting index; the vector leg broadcasts
    the single query vector over the embedding table with the
    scaled-long dot/norm kernels; both legs are top-50 lists (small by
    construction), so the fusion join is broadcast-sized no matter the
    corpus.

    RRF needs only integer ranks — no score normalization across
    modalities — which is what makes it portable: the oracle
    recomputes both rankings and fuses with the same rational
    arithmetic, so the hash pins list membership, both rank columns,
    and the fused order. This is the serving pattern the corpus
    pipeline's dedup/ANN indexes exist to feed."""
    from batch_processing_etl_orchestration_spark.operators.retrieval import (
        bm25_topk,
    )

    idx = _postings_index(spark, sf_dir)
    text = bm25_topk(idx.postings(), idx.doclens(), _BM25_TERMS, k=50)
    w_text = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    text_rank = text.select(
        "doc_id", F.row_number().over(w_text).alias("r_text")
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    sims = (
        F.broadcast(q)
        .crossJoin(e.where(F.col("vec_id") != 0))
        .select(
            F.col("vec_id").alias("doc_id"),
            (
                _dot_dec("qe", "embedding")
                / (_norm_dec("qe") * _norm_dec("embedding"))
            ).alias("cosine_sim"),
        )
    )
    # Top-50 FIRST (TakeOrderedAndProject — per-partition partial
    # top-k, then one 50-row merge), THEN rank the survivors: the
    # row_number window never sees more than 50 rows. VERDICT r11 #3 —
    # the old shape ranked the FULL embeddings table in one task.
    top_vec = sims.orderBy(F.desc("cosine_sim"), F.asc("doc_id")).limit(50)
    w_vec = Window.orderBy(F.desc("cosine_sim"), F.asc("doc_id"))
    vec_rank = top_vec.select(
        "doc_id", F.row_number().over(w_vec).alias("r_vec")
    )

    fused = (
        text_rank.where(F.col("r_text") <= 50)
        .join(vec_rank, "doc_id", "full_outer")
        .select(
            "doc_id",
            (
                F.coalesce(1.0 / (60 + F.col("r_text")), F.lit(0.0))
                + F.coalesce(1.0 / (60 + F.col("r_vec")), F.lit(0.0))
            ).alias("rrf_score"),
            "r_text",
            "r_vec",
        )
    )
    return fused.orderBy(F.desc("rrf_score"), F.asc("doc_id")).limit(10)


def _ivf_full_index(spark: SparkSession, sf_dir: str):
    """A persisted full-corpus IvfIndex over the embeddings table
    (8 cells, dim 64, no deletes) — the build-once/serve-many vector
    side of index-served hybrid search."""
    from batch_processing_etl_orchestration_spark.operators.similarity import (
        IvfIndex,
    )
    from batch_processing_etl_orchestration_spark.tables import build_once

    def _build(p: str) -> None:
        e = load_table(spark, sf_dir, "embeddings")
        c = e.select(
            F.col("vec_id").alias("cand_id"),
            F.col("embedding").alias("ce"),
        )
        IvfIndex.build(spark, c, p, n_cells=8, dim=64)

    path = build_once(
        sf_dir, "embeddings.parquet", "ivf_full", _build, layout=1
    )
    return IvfIndex.load(spark, path)


@register(
    "q_hybrid_search_rrf_served",
    # the index-served run's recall is attested IN-QUERY against the
    # exact hybrid (same scaled-long cosine kernel, same RRF
    # arithmetic); the oracle pins the attestation shape the engine
    # must reach — the _ANN_ORACLE pattern
    oracle="""
    SELECT CAST(10 AS BIGINT) AS n_results,
           TRUE AS recall_floor_met
    FROM embeddings WHERE vec_id = 0
    """,
    tags=("northstar", "retrieval", "similarity", "hybrid", "ann"),
)
def q_hybrid_search_rrf_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid RRF served entirely from PERSISTED indexes (VERDICT r14
    #3): q_hybrid_search_rrf's vector leg brute-force-scans every
    embedding per query — fine as the exact baseline, fatal at 100 TB.
    Here BOTH legs are index probes, each pinned to one committed
    generation:

    - text: block-max pruned BM25 top-50 over the impact-ordered
      PostingsIndex (bm25_topk_blockmax — the pruned path q_bm25_topk
      serves, generation snapshot taken by its plan);
    - vector: IvfIndex probe, n_probe=4 of 8 cells — the shortlist is
      cell-pruned but scoring within probed cells is the EXACT
      scaled-long cosine (shortlist + exact re-rank, the pq_rerank
      shape), generation pinned by probe's snapshot.

    Fusion is the same Σ 1/(60+rank) over each leg's top-50. The text
    leg is exact by construction (block-max pruning is lossless), so
    the only approximation is the vector leg's unprobed cells; the
    query attests itself by recomputing the EXACT hybrid in-query
    (brute_force_topk uses the identical rounding kernel) and
    reporting fused-top-10 overlap against it: n_results (must be 10)
    and recall_floor_met (overlap ≥ 0.5, measured 0.9–1.0 across
    fixtures; with n_probe=8 the served result is hash-EQUAL to the
    exact hybrid — pinned in tests/test_retrieval.py).

    Scale: the text leg reads kept blocks only; the vector leg reads
    probed cells only (cell_id partition pruning); both lists are
    top-50 — fusion is broadcast-sized at any corpus size."""
    from batch_processing_etl_orchestration_spark.operators.retrieval import (
        bm25_topk_blockmax,
    )
    from batch_processing_etl_orchestration_spark.operators.similarity import (
        brute_force_topk,
    )

    idx_t = _impact_index(spark, sf_dir)
    text = bm25_topk_blockmax(idx_t, _BM25_TERMS, k=50)
    w_text = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    # 50-row leg referenced by BOTH fusions — pin it, or Spark
    # re-executes the whole pruned BM25 scan once per reference
    # (review r15; the r13 lazy-reuse lesson)
    text_rank = text.select(
        "doc_id", F.row_number().over(w_text).alias("r_text")
    ).localCheckpoint(eager=True)

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    idx_v = _ivf_full_index(spark, sf_dir)
    vec_rank = idx_v.probe(q, k=50, n_probe=4).select(
        F.col("cand_id").alias("doc_id"), F.col("rank").alias("r_vec")
    )

    def _fuse(tr: DataFrame, vr: DataFrame) -> DataFrame:
        return (
            tr.join(vr, "doc_id", "full_outer")
            .select(
                "doc_id",
                (
                    F.coalesce(1.0 / (60 + F.col("r_text")), F.lit(0.0))
                    + F.coalesce(1.0 / (60 + F.col("r_vec")), F.lit(0.0))
                ).alias("rrf_score"),
            )
            .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
            .limit(10)
        )

    # 10 rows, referenced by the hits join AND the final agg — pin so
    # the IVF probe leg runs once (review r15)
    served = (
        _fuse(text_rank, vec_rank)
        .select("doc_id")
        .localCheckpoint(eager=True)
    )

    # in-query exact baseline: same text leg (lossless), brute-force
    # vector leg with the identical rounding kernel
    c = e.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("ce")
    )
    exact_vec = brute_force_topk(q, c, k=50).select(
        F.col("cand_id").alias("doc_id"), F.col("rank").alias("r_vec")
    )
    exact = _fuse(text_rank, exact_vec).select("doc_id")

    hits = served.join(exact, "doc_id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return (
        served.agg(F.count(F.lit(1)).cast("bigint").alias("n_results"))
        .crossJoin(hits)
        .select(
            "n_results",
            (F.col("n_hits") / F.lit(10.0) >= 0.5).alias(
                "recall_floor_met"
            ),
        )
    )


@register(
    "q_udtf_ngrams",
    oracle="""
    WITH words AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) AS p,
             unnest(string_split(text, ' ')) AS word
      FROM documents WHERE doc_id < 40
    ),
    grams AS (
      SELECT doc_id, p - 1 AS pos,
             word || ' ' || lead(word, 1) OVER w || ' '
                  || lead(word, 2) OVER w AS gram,
             lead(word, 2) OVER w AS _tail
      FROM words WINDOW w AS (PARTITION BY doc_id ORDER BY p)
    )
    SELECT doc_id, pos, gram FROM grams WHERE _tail IS NOT NULL
    """,
    tags=("northstar", "text", "udtf"),
)
def q_udtf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional word trigrams via a Python UDTF in SQL LATERAL
    position (functions/udtf.py NgramsUDTF) — the Spark-4 API for
    custom row-to-rows exploders callable from pure SQL. The oracle
    derives the same (doc_id, pos, gram) rows with window functions;
    a hash match pins the UDTF's expansion semantics (0-based
    positions, duplicates preserved, short docs yield nothing) to the
    declarative formulation.

    Scale: the UDTF runs Arrow-batched in the Python worker pool like
    any pandas UDF; the JVM higher-order twin
    (operators/dedup.shingle_sets) remains the hot-path kernel — this
    is the SQL-surface convenience, capped here to 40 docs because
    its purpose is API parity, not throughput."""
    from batch_processing_etl_orchestration_spark.functions.udtf import (
        register_udtfs,
    )

    register_udtfs(spark)
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    docs.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.gram
        FROM udtf_docs d, LATERAL ngrams(d.text, 3) t
        """
    )


# ---------------------------------------------------------------------------
# Iterative graph: weighted PageRank (operators/graph.py)
# ---------------------------------------------------------------------------


def _pagerank_oracle(n_iter: int = 10, alpha: str = "0.85") -> str:
    """Stage-unrolled PageRank in plain SQL: recursive CTEs can't
    aggregate in the recursive term, so each power iteration becomes
    one named CTE mirroring the Spark update operation-for-operation
    (scaled-long folds at 1e12, grid re-snap per round).

    Every CTE is AS MATERIALIZED: each stage is referenced by the
    next twice (contribution join + dangling mass), so DuckDB's
    default inlining expands the chain exponentially — measured 587 s
    inlined vs 0.14 s materialized for 10 iterations on 3,934
    edges."""
    head = f"""
    WITH e AS MATERIALIZED (
      SELECT o_custkey % 64 AS src, o_orderkey % 64 AS dst,
             COUNT(*) AS w
      FROM orders
      WHERE o_custkey % 64 <> o_orderkey % 64
      GROUP BY 1, 2
    ),
    nodes AS MATERIALIZED (
      SELECT src AS node FROM e UNION SELECT dst FROM e
    ),
    consts AS MATERIALIZED (SELECT COUNT(*) AS n_nodes FROM nodes),
    outw AS MATERIALIZED (SELECT src, SUM(w) AS outw FROM e GROUP BY src),
    trans AS MATERIALIZED (
      SELECT e.src AS e_src, e.dst AS e_dst, e.w / o.outw AS p
      FROM e JOIN outw o ON o.src = e.src
    ),
    dangling AS MATERIALIZED (
      SELECT node FROM nodes WHERE node NOT IN (SELECT src FROM e)
    ),
    it0 AS MATERIALIZED (
      SELECT n.node,
             CAST(ROUND((1.0 / c.n_nodes) * 1e12) AS BIGINT) / 1e12 AS pr
      FROM nodes n CROSS JOIN consts c
    )"""
    stages = []
    for k in range(n_iter):
        stages.append(f""",
    con{k} AS MATERIALIZED (
      SELECT t.e_dst AS node,
             SUM(CAST(ROUND(p.pr * t.p * 1e12) AS BIGINT)) AS c_long
      FROM trans t JOIN it{k} p ON p.node = t.e_src
      GROUP BY t.e_dst
    ),
    dg{k} AS MATERIALIZED (
      SELECT COALESCE(SUM(CAST(ROUND(p.pr * 1e12) AS BIGINT)), 0) AS d_long
      FROM dangling d JOIN it{k} p ON p.node = d.node
    ),
    it{k + 1} AS MATERIALIZED (
      SELECT n.node,
             CAST(ROUND((
               (1.0 - {alpha}) / c.n_nodes
               + {alpha} * (CAST(COALESCE(con{k}.c_long, 0) AS DOUBLE) / 1e12)
               + ({alpha} * (CAST(dg{k}.d_long AS DOUBLE) / 1e12)) / c.n_nodes
             ) * 1e12) AS BIGINT) / 1e12 AS pr
      FROM nodes n
      CROSS JOIN consts c
      CROSS JOIN dg{k}
      LEFT JOIN con{k} ON con{k}.node = n.node
    )""")
    return head + "".join(stages) + f"\n    SELECT node, pr FROM it{n_iter}"


@register(
    "q_pagerank_orders",
    oracle=_pagerank_oracle(),
    tags=("northstar", "graph", "iterative"),
)
def q_pagerank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (α=0.85, 10 power iterations) over a 64-node
    graph derived from orders (src = o_custkey % 64,
    dst = o_orderkey % 64, multi-edges summed into weights) — the
    second canonical iterative-graph shape next to connected
    components, run entirely as DataFrame joins + aggregations
    (operators/graph.py). Ranks live on a 1e-12 grid with scaled-long
    reductions, so all 10 iterations are bit-identical under any
    scheduling — which the stage-unrolled DuckDB oracle (one CTE per
    iteration, mirroring the update expression op-for-op) hash-checks.

    Scale: each round shuffles (src, rank) pairs — never adjacency
    payloads; transition probabilities are precomputed once; lineage
    is checkpoint-truncated every 3 rounds like the CC fixpoint. The
    64-node modulus keeps the ORACLE tractable; the Spark plan is the
    full-scale formulation."""
    from batch_processing_etl_orchestration_spark.operators.graph import pagerank

    orders = load_table(spark, sf_dir, "orders")
    edges = (
        orders.where(F.col("o_custkey") % 64 != F.col("o_orderkey") % 64)
        .groupBy(
            (F.col("o_custkey") % 64).alias("src"),
            (F.col("o_orderkey") % 64).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return pagerank(edges, alpha=0.85, n_iter=10)


# ---------------------------------------------------------------------------
# Sliding-window document chunking — the context-window preprocessing
# step between cleaning and packing in an LLM data pipeline
# ---------------------------------------------------------------------------

_CHUNK_LEN = 32  # tokens per chunk
_CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


@register(
    "q_chunk_documents",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t,
             len(string_split(text, ' ')) AS n
      FROM documents
    ),
    chunks AS (
      SELECT doc_id,
             unnest(generate_series(
               0, CAST(floor((n - 1) / {_CHUNK_STRIDE}) AS BIGINT))) AS chunk_id,
             t
      FROM toks
    )
    SELECT doc_id, chunk_id,
           CAST(len(list_slice(t, chunk_id * {_CHUNK_STRIDE} + 1,
                               chunk_id * {_CHUNK_STRIDE} + {_CHUNK_LEN}))
                AS INT) AS n_chunk_tokens,
           sha256(array_to_string(
             list_slice(t, chunk_id * {_CHUNK_STRIDE} + 1,
                        chunk_id * {_CHUNK_STRIDE} + {_CHUNK_LEN}), ' '))
             AS chunk_sha
    FROM chunks
    """,
    tags=("northstar", "text", "chunking"),
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: split every document into overlapping
    {LEN}-token windows on a {STRIDE}-token stride (chunk k covers
    tokens [k*stride, k*stride+len)), the step that turns cleaned
    documents into context-window-sized training units; the overlap
    preserves cross-boundary n-grams for the model. Each chunk's
    content is pinned by sha256 over its joined tokens, so the oracle
    checks the exact token spans, not just counts.

    Scale: ZERO shuffles — split/sequence/explode/slice/sha2 are all
    codegen'd narrow ops, so the plan is a single scan→project stage
    whose fan-out is bounded by doc_len/stride. Chunk rows inherit the
    scan's partitioning; downstream packing (q_pack_sequences) can
    consume them without a repartition. A 100 TB corpus chunks in one
    embarrassingly-parallel pass."""
    d = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    df = (
        d.select("doc_id", t.alias("_t"), F.size(t).alias("_n"))
        .select(
            "doc_id",
            "_t",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.floor((F.col("_n") - 1) / _CHUNK_STRIDE).cast("bigint"),
                )
            ).alias("chunk_id"),
        )
    )
    chunk = F.slice(
        "_t", F.col("chunk_id").cast("int") * _CHUNK_STRIDE + 1, _CHUNK_LEN
    )
    return df.select(
        "doc_id",
        "chunk_id",
        F.size(chunk).alias("n_chunk_tokens"),
        F.sha2(F.array_join(chunk, " "), 256).alias("chunk_sha"),
    )


q_chunk_documents.__doc__ = q_chunk_documents.__doc__.replace(
    "{LEN}", str(_CHUNK_LEN)
).replace("{STRIDE}", str(_CHUNK_STRIDE))


# ---------------------------------------------------------------------------
# Token-budget sampling — fill a per-source token budget in
# deterministic hash order (two-phase distributed prefix sum)
# ---------------------------------------------------------------------------

def _bucketed_prefix(df, part_cols: list[str], weight_col: str):
    """Two-phase distributed prefix-sum scaffolding shared by
    q_token_budget_sample and q_training_shards: each row gains its
    md5 ordering hash `h` (over doc_id), its range-consistent bucket
    `b` (first two hex chars — ordering by (b, h) equals ordering by
    h), and `_off` — the total `weight_col` in EARLIER buckets of the
    same part_cols partition. Global prefix quantities are then
    `_off` + a within-(part, b) window, so no partition ever sorts in
    one reducer; the offsets table is part_cols × 256 rows and
    broadcasts."""
    h = F.md5(F.col("doc_id").cast("string"))
    docs = df.select(
        "*",
        h.alias("h"),
        F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias("b"),
    )
    offsets = (
        docs.groupBy(*part_cols, "b")
        .agg(F.sum(weight_col).alias("_bw"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_bw").over(
                    Window.partitionBy(*part_cols)
                    .orderBy("b")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .drop("_bw")
    )
    return docs.join(F.broadcast(offsets), [*part_cols, "b"])


@register(
    "q_exact_span_dedup",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t,
             len(string_split(text, ' ')) AS n
      FROM documents
    ),
    pos AS (
      SELECT doc_id, t,
             unnest(generate_series(1, n - 4)) AS i
      FROM toks WHERE n >= 5
    ),
    sh AS (
      SELECT doc_id, array_to_string(list_slice(t, i, i + 4), ' ') AS s
      FROM pos
    ),
    nd AS (SELECT s, COUNT(DISTINCT doc_id) AS ndocs FROM sh GROUP BY s)
    SELECT sh.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN nd.ndocs > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_shingles,
           (SUM(CASE WHEN nd.ndocs > 1 THEN 1 ELSE 0 END) * 2
              >= COUNT(*)) AS flagged
    FROM sh JOIN nd ON nd.s = sh.s
    GROUP BY sh.doc_id
    """,
    tags=("northstar", "dedup", "exact-substring"),
)
def q_exact_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT substring-level duplication (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better"
    family): per document, how many of its word-5-gram positions are
    covered by a span that appears VERBATIM in at least one OTHER
    document, plus a `flagged` bit when ≥ half the doc is duplicated
    span — the exact complement to MinHash/SimHash (which score
    whole-doc similarity and miss a boilerplate paragraph pasted into
    otherwise-distinct docs). Counts are exact integers; the oracle
    replays the identical shingle → distinct-doc-count → per-doc
    rollup pipeline.

    Scale: shingling is a narrow codegen'd explode (same zero-shuffle
    shape as q_chunk_documents); the only shuffles are the groupBy on
    the shingle key — with partial map-side aggregation, and no
    suffix array in sight because 5-gram equality IS substring-≥5
    equality — and the shingle→doc join back, both key-partitioned
    on the shingle.

    Shuffle key (VERDICT r8 next #6): the registered query runs
    HASH-KEYED — both shuffles key on xxhash64(shingle), an 8-byte
    long, instead of the ~30-byte raw string (measured 3.7× narrower
    shuffle keys on the fixture; SCALE.md). The OUTPUT never contains
    the key, so the DuckDB oracle (raw-string keys) is unchanged, and
    tests/test_dedup.py::test_span_dedup_hash_keyed_bit_equal pins
    bit-equality against the hash_keyed=False variant. Collisions: a
    64-bit hash collides only once per ~6·10⁹ distinct shingles
    (birthday) and a collision merely merges two shingles' doc sets —
    at 10¹²-shingle corpora, widen to 128 bits via a second seeded
    hash column (xxhash64(lit(1), s)) on the same plan shape."""
    return span_dedup_profile(load_table(spark, sf_dir, "documents"))


def span_dedup_profile(d: DataFrame, hash_keyed: bool = True) -> DataFrame:
    """Per-doc verbatim 5-gram duplication profile (see
    q_exact_span_dedup). hash_keyed=False shuffles on the raw shingle
    string — same results, ~3.7× wider shuffle keys; kept for the
    bit-equality attestation."""
    t = F.split("text", " ")
    sh = (
        d.select("doc_id", t.alias("_t"), F.size(t).alias("_n"))
        .where(F.col("_n") >= 5)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, _n - 4),"
                    " i -> concat_ws(' ', slice(_t, i, 5)))"
                )
            ).alias("s"),
        )
    )
    key = F.xxhash64("s") if hash_keyed else F.col("s")
    sh = sh.select("doc_id", key.alias("k"))
    nd = sh.groupBy("k").agg(F.countDistinct("doc_id").alias("ndocs"))
    dup = F.sum(F.when(F.col("ndocs") > 1, 1).otherwise(0))
    return (
        sh.join(nd, "k")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            dup.alias("n_dup_shingles"),
            (dup * 2 >= F.count(F.lit(1))).alias("flagged"),
        )
    )


_BUDGET_TOKENS = 3000


@register(
    "q_token_budget_sample",
    oracle=f"""
    WITH docs AS (
      SELECT source, doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ),
    run AS (
      SELECT source, doc_id, n_tokens,
             SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum
      FROM docs
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
    FROM run WHERE cum <= {_BUDGET_TOKENS}
    GROUP BY source
    """,
    tags=("northstar", "sampling", "prefix-sum"),
)
def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sampling: walk each source's documents in
    deterministic content-hash order and keep docs while the running
    token total stays within the budget — how a mixing recipe's
    "N billion tokens from source X" clause is materialized
    reproducibly (same hash order ⇒ same sample on any engine or
    shard layout).

    The running sum is computed as a TWO-PHASE DISTRIBUTED PREFIX SUM,
    not one window over each whole source: docs bucket by their hash
    prefix (256 range-consistent buckets), phase 1 computes per-bucket
    token subtotals (tiny: sources x 256 rows), a window over that
    metadata table turns subtotals into per-bucket starting offsets,
    and phase 2 adds offset + within-bucket running sum. A source with
    10^9 documents therefore never sorts in one partition — the
    per-partition window covers ~1/256th of a source, while the
    offset table stays broadcast-sized. The oracle states the same
    semantics as one plain window, which DuckDB can afford at sf0.01.
    """
    d = load_table(spark, sf_dir, "documents")
    docs = d.select(
        "source", "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    run = _bucketed_prefix(docs, ["source"], "n_tokens").withColumn(
        "cum",
        F.col("_off")
        + F.sum("n_tokens").over(
            Window.partitionBy("source", "b")
            .orderBy("h", "doc_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        run.where(F.col("cum") <= _BUDGET_TOKENS)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("n_tokens").alias("tokens_kept"),
            F.sum("doc_id").alias("sum_doc_id"),
        )
    )


# ---------------------------------------------------------------------------
# Semantic k-means clustering — exact-deterministic Lloyd iterations
# over the embedding space (operators/clustering.py)
# ---------------------------------------------------------------------------


# Shared stage-unrolled Lloyd CTE (k=8, 2 iterations, scale 1e6):
# a2 = final (vec_id, cluster c, exact squared distance d).
_KMEANS_CTE = """
    WITH ve AS (
      SELECT vec_id, i - 1 AS i,
             CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS x
      FROM embeddings, range(1, 65) r(i)
    ),
    cent0 AS (
      SELECT CAST(vec_id AS INT) AS c, i, x AS cw FROM ve WHERE vec_id < 8
    ),
    d1 AS (
      SELECT v.vec_id, c.c, SUM((v.x - c.cw) * (v.x - c.cw)) AS d
      FROM ve v JOIN cent0 c USING (i) GROUP BY 1, 2
    ),
    a1 AS (
      SELECT vec_id, c FROM (
        SELECT vec_id, c,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
        FROM d1
      ) WHERE rn = 1
    ),
    sums1 AS (
      SELECT a.c, v.i, SUM(v.x) AS s, COUNT(*) AS n
      FROM ve v JOIN a1 a USING (vec_id) GROUP BY 1, 2
    ),
    cent1 AS (
      SELECT c0.c, c0.i,
             COALESCE(
               CAST((s.s - (((s.s % s.n) + s.n) % s.n)) // s.n AS BIGINT),
               c0.cw) AS cw
      FROM cent0 c0 LEFT JOIN sums1 s ON s.c = c0.c AND s.i = c0.i
    ),
    d2 AS (
      SELECT v.vec_id, c.c, SUM((v.x - c.cw) * (v.x - c.cw)) AS d
      FROM ve v JOIN cent1 c USING (i) GROUP BY 1, 2
    ),
    a2 AS (
      SELECT vec_id, c, d FROM (
        SELECT vec_id, c, d,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
        FROM d2
      ) WHERE rn = 1
    )
"""


@register(
    "q_semantic_kmeans",
    oracle=f"""
    {_KMEANS_CTE}
    SELECT c AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(vec_id) AS BIGINT) AS sum_vec_id,
           CAST(SUM(d) AS BIGINT) AS inertia_scaled2
    FROM a2 GROUP BY c
    """,
    tags=("northstar", "clustering", "iterative"),
)
def q_semantic_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic clustering of the embedding space: 2 Lloyd iterations
    of k=8 k-means run ENTIRELY on an integer grid
    (operators/clustering.py exact_kmeans_assign) — scaled-long
    elements, exact long distances, lowest-cluster tie-breaks, and
    integer floor-division centroid means — so the DuckDB oracle can
    unroll the whole fixpoint (one CTE per assign/update stage,
    PageRank-style) and hash-check per-cluster membership AND exact
    inertia, not just counts. Semantic dedup, topic-balanced mixing,
    and IVF coarse quantization all sit on this primitive; the float
    production twin is ivf_build_centroids (similarity.py:373).

    Scale: assignment folds against the BROADCAST k-row centroid table
    in codegen (n·k rows, no element explosion); the update is one key
    join + a (cluster, dim) aggregation with map-side partials into
    k·dim groups. No driver collect anywhere — centroids stay a
    DataFrame end to end, unlike the IVF build's driver-side index
    metadata."""
    from batch_processing_etl_orchestration_spark.operators.clustering import (
        exact_kmeans_assign,
    )

    e = load_table(spark, sf_dir, "embeddings")
    a = exact_kmeans_assign(e, "vec_id", "embedding", k=8, n_iter=2)
    return (
        a.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("vec_id").alias("sum_vec_id"),
            F.sum("dist_scaled2").alias("inertia_scaled2"),
        )
        .withColumnRenamed("cluster", "cluster_id")
    )


@register(
    "q_semantic_dedup_keep",
    oracle=f"""
    {_KMEANS_CTE}
    , reps AS (
      SELECT c, vec_id, d FROM (
        SELECT c, vec_id, d,
               row_number() OVER (PARTITION BY c ORDER BY d, vec_id) AS rn
        FROM a2
      ) WHERE rn = 1
    ),
    sizes AS (SELECT c, COUNT(*) AS n_members FROM a2 GROUP BY c)
    SELECT r.c AS cluster_id,
           r.vec_id AS rep_doc_id,
           doc.source AS rep_source,
           CAST(s.n_members AS BIGINT) AS n_members,
           CAST(s.n_members - 1 AS BIGINT) AS n_dropped
    FROM reps r
    JOIN sizes s ON s.c = r.c
    JOIN documents doc ON doc.doc_id = r.vec_id
    """,
    tags=("northstar", "clustering", "dedup"),
)
def q_semantic_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup: cluster the embedding space (the exact k-means
    of q_semantic_kmeans) and keep ONE representative document per
    cluster — the member nearest its centroid, ties to the lowest id —
    dropping the rest. This is the cluster-then-pick-canonical recipe
    (SemDeDup-style) that removes "same meaning, different words"
    redundancy where MinHash/SimHash (lexical overlap) can't see it;
    the two families are complementary passes in a curation DAG.

    Scale: on top of the k-means passes, picking representatives is
    one k-group min-struct aggregation, and the representative rows
    (k of them) BROADCAST-join back to the documents table for
    metadata — corpus text never shuffles, exactly like
    q_dedup_keep_canonical's label-broadcast survivor join."""
    from batch_processing_etl_orchestration_spark.operators.clustering import (
        exact_kmeans_assign,
    )

    e = load_table(spark, sf_dir, "embeddings")
    a = exact_kmeans_assign(e, "vec_id", "embedding", k=8, n_iter=2)
    reps = (
        a.groupBy("cluster")
        .agg(
            F.min(F.struct("dist_scaled2", "vec_id")).alias("_m"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .select(
            F.col("cluster").alias("cluster_id"),
            F.col("_m.vec_id").alias("rep_doc_id"),
            "n_members",
            (F.col("n_members") - 1).alias("n_dropped"),
        )
    )
    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("rep_doc_id"), F.col("source").alias("rep_source")
    )
    return d.join(F.broadcast(reps), "rep_doc_id").select(
        "cluster_id", "rep_doc_id", "rep_source", "n_members", "n_dropped"
    )


@register(
    "q_triangle_count",
    oracle="""
    WITH edges AS (
      SELECT o_custkey % 64 AS src, o_orderkey % 64 AS dst FROM orders
    ),
    und AS (
      SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      FROM edges WHERE src <> dst
    ),
    deg AS (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und
      ) GROUP BY 1
    ),
    e AS (
      SELECT CASE WHEN (da.deg < db.deg)
                    OR (da.deg = db.deg AND u.a < u.b)
                  THEN u.a ELSE u.b END AS u,
             CASE WHEN (da.deg < db.deg)
                    OR (da.deg = db.deg AND u.a < u.b)
                  THEN u.b ELSE u.a END AS v
      FROM und u
      JOIN deg da ON da.node = u.a
      JOIN deg db ON db.node = u.b
    ),
    tri AS (
      SELECT e1.u AS x, e1.v AS y, e2.v AS z
      FROM e e1 JOIN e e2 ON e2.u = e1.v
      WHERE EXISTS (
        SELECT 1 FROM e e3 WHERE e3.u = e1.u AND e3.v = e2.v
      )
    )
    SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM (
      SELECT x AS node FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri
    ) GROUP BY node
    """,
    tags=("northstar", "graph"),
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts on the 64-node orders graph (same
    derivation as q_pagerank_orders) via degree-ordered orientation
    (operators/graph.py triangle_count) — the third canonical graph
    shape after connected components and PageRank, and the
    clustering-coefficient building block. The oracle mirrors the
    orientation op-for-op, so each triangle's unique x<y<z generation
    is hash-checked, not just the totals.

    Scale: orientation bounds wedge generation at Σ outdeg² ≤ O(m^1.5)
    even on power-law graphs (a naive neighbor self-join pays hub
    deg²); every join is a key-partitioned equi-join on node ids and
    the semi-join close never materializes adjacency. The 64-node
    modulus keeps the ORACLE's wedge join tractable; the Spark plan is
    the full-scale formulation."""
    from batch_processing_etl_orchestration_spark.operators.graph import (
        triangle_count,
    )

    orders = load_table(spark, sf_dir, "orders")
    edges = orders.select(
        (F.col("o_custkey") % 64).alias("src"),
        (F.col("o_orderkey") % 64).alias("dst"),
    )
    return triangle_count(edges)


@register(
    "q_khop_reach",
    oracle="""
    WITH RECURSIVE e AS (
      SELECT DISTINCT o_custkey % 64 AS src, o_orderkey % 64 AS dst
      FROM orders WHERE o_custkey % 64 <> o_orderkey % 64
    ),
    seeds AS (SELECT DISTINCT src AS node FROM e WHERE src % 16 = 0),
    walk(node, hops) AS (
      SELECT node, 0 FROM seeds
      UNION
      SELECT e.dst, w.hops + 1
      FROM walk w JOIN e ON e.src = w.node
      WHERE w.hops < 3
    )
    SELECT CAST(node AS BIGINT) AS node,
           CAST(MIN(hops) AS BIGINT) AS hops
    FROM walk GROUP BY node
    """,
    tags=("northstar", "graph", "iterative", "bfs"),
)
def q_khop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-hop reachability (level-synchronous BFS, k=3) from
    the seed set {nodes ≡ 0 mod 16 with out-edges} over the 64-node
    orders graph (same derivation as q_pagerank_orders): each node's
    MINIMUM hop distance from any seed — the traversal primitive
    under impact analysis, fraud rings, and lineage walks, and the
    fourth canonical iterative-graph shape here next to connected
    components, PageRank, and triangles (operators/graph.py
    bfs_min_hops). Hop counts are exact integers, so the result is
    bit-stable under any scheduling; the oracle replays the same
    frontier expansion as a hop-bounded recursive CTE and takes
    MIN(hops) per node.

    Scale: per level one key-partitioned equi-join of the (node,hops)
    frontier against the edge table plus an anti-join against the
    visited set — a vertex expands exactly once, shuffle volume per
    level is |new frontier| + touched edges, and no adjacency payload
    ever rides a shuffle. The 64-node modulus keeps the ORACLE's walk
    enumeration tractable; the Spark plan is the full-scale
    formulation."""
    from batch_processing_etl_orchestration_spark.operators.graph import (
        bfs_min_hops,
    )

    orders = load_table(spark, sf_dir, "orders")
    edges = (
        orders.where(F.col("o_custkey") % 64 != F.col("o_orderkey") % 64)
        .select(
            (F.col("o_custkey") % 64).alias("src"),
            (F.col("o_orderkey") % 64).alias("dst"),
        )
        .distinct()
    )
    seeds = edges.where(F.col("src") % 16 == 0).select(
        F.col("src").alias("node")
    ).distinct()
    return bfs_min_hops(edges, seeds, max_hops=3)


@register(
    "q_leakage_safe_split",
    oracle=_SQL_SHINGLES.replace("WITH ", "WITH RECURSIVE ", 1)
    + _SQL_JACCARD_EDGES
    + """,
    walk(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT w.src, e.dst FROM walk w JOIN edges e ON w.dst = e.src
    ),
    comp AS (
      SELECT src AS doc_id, LEAST(src, MIN(dst)) AS comp_id
      FROM walk GROUP BY src
    ),
    labeled AS (
      SELECT d.doc_id, COALESCE(c.comp_id, d.doc_id) AS comp_id
      FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    ),
    sized AS (
      SELECT doc_id, comp_id,
             COUNT(*) OVER (PARTITION BY comp_id) AS cluster_size,
             CASE WHEN CAST('0x' || substring(
                    md5(CAST(comp_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 90
                  THEN 'train' ELSE 'eval' END AS split
      FROM labeled
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT comp_id) AS BIGINT) AS n_clusters,
           CAST(SUM(CASE WHEN cluster_size > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_docs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
    FROM sized GROUP BY split
    """,
    tags=("dedup", "split", "iterative"),
)
def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/eval split: the split key is the NEAR-DUP
    CLUSTER id, not the document — every member of a duplicate cluster
    lands on the same side by construction, closing the classic eval
    contamination hole where a paraphrase of an eval doc sits in train
    (plain q_hash_split routes near-identical docs independently).
    Composition: cached cluster labels (the q_dup_clusters fixpoint via
    the persisted DedupLabels table) + singleton fallback + an md5
    bucket on comp_id.

    Scale: the label table covers only docs with a near-dup edge, so
    it BROADCASTS into the corpus scan (same shape as
    q_dedup_keep_canonical); the split decision is a codegen'd hash of
    a long — no extra shuffle beyond the final small aggregation. The
    oracle replays the full recursive-CTE component walk and checks
    per-split doc counts, cluster counts, and membership sums."""
    clusters = _dup_labels_cached(spark, sf_dir).select("doc_id", "comp_id")
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    labeled = d.join(F.broadcast(clusters), "doc_id", "left").select(
        "doc_id", F.coalesce("comp_id", "doc_id").alias("comp_id")
    )
    w = Window.partitionBy("comp_id")
    bucket = (
        F.conv(F.substring(F.md5(F.col("comp_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100
    )
    sized = labeled.select(
        "doc_id",
        "comp_id",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
        F.when(bucket < 90, "train").otherwise("eval").alias("split"),
    )
    return sized.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("comp_id").alias("n_clusters"),
        F.sum(F.when(F.col("cluster_size") > 1, 1).otherwise(0)).alias(
            "n_dup_docs"
        ),
        F.sum("doc_id").alias("sum_doc_id"),
    )


_SHARD_SIZE = 64


@register(
    "q_training_shards",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id,
             row_number() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rank
      FROM documents
    )
    SELECT CAST((rank - 1) // {_SHARD_SIZE} AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(rank) AS BIGINT) AS min_rank,
           CAST(MAX(rank) AS BIGINT) AS max_rank,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
    FROM ranked GROUP BY 1
    """,
    tags=("northstar", "sharding", "prefix-sum"),
)
def q_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + sharding: order the corpus by a
    content-independent hash (the training-order shuffle every
    pretraining run needs to be REPRODUCIBLE — same seed, same order,
    any engine) and cut it into contiguous {SZ}-doc shards. The
    oracle's single global window proves each shard holds exactly the
    right contiguous rank range.

    Scale: the global rank is NEVER computed by a global sort —
    _bucketed_prefix's 256 range-consistent hash buckets + broadcast
    offsets give rank = bucket offset + within-bucket row_number; the
    only corpus-wide movement is the bucket partitioning itself. At
    100 TB this is how you shard a corpus into training files without
    a single-reducer sort."""
    d = load_table(spark, sf_dir, "documents")
    docs = d.select("doc_id", F.lit(1).alias("_one"))
    ranked = _bucketed_prefix(docs, [], "_one").select(
        "doc_id",
        (
            F.col("_off")
            + F.row_number().over(
                Window.partitionBy("b").orderBy("h", "doc_id")
            )
        ).alias("rank"),
    )
    return ranked.groupBy(
        ((F.col("rank") - 1) / _SHARD_SIZE).cast("bigint").alias("shard")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("rank").alias("min_rank"),
        F.max("rank").alias("max_rank"),
        F.sum("doc_id").alias("sum_doc_id"),
    )


q_training_shards.__doc__ = q_training_shards.__doc__.replace(
    "{SZ}", str(_SHARD_SIZE)
)


_PHRASE = ["slow", "hash", "batch"]


@register(
    "q_phrase_search",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
             unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    slots(wd, slot) AS (VALUES {", ".join(f"('{w}', {i})" for i, w in enumerate(_PHRASE))}),
    starts AS (
      SELECT w.doc_id, w.pos - s.slot AS start, s.slot
      FROM w JOIN slots s ON s.wd = w.word
    ),
    m AS (
      SELECT doc_id, start FROM starts
      GROUP BY doc_id, start HAVING COUNT(DISTINCT slot) = {len(_PHRASE)}
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM m GROUP BY doc_id
    """,
    tags=("northstar", "retrieval", "phrase"),
)
def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase retrieval ("slow hash batch") over the persisted
    POSITIONAL posting index: each term's occurrences shift to their
    would-be phrase start, and a start where every slot checks in is a
    match (operators/retrieval.py phrase_search). The oracle rebuilds
    positions from raw text and must agree on every matching doc AND
    its occurrence count.

    Scale: the positional store shares the index's word
    range-clustering, so the three term scans prune to ~1 parquet file
    each (footer min/max on word); matching cost tracks Σ df, never
    corpus size; one (doc, start) shuffle. The tf-only index
    (q_bm25_topk) cannot answer this — positions are the extra
    index column phrase semantics buy."""
    from batch_processing_etl_orchestration_spark.operators.retrieval import (
        phrase_search,
    )

    idx = _postings_index(spark, sf_dir)
    return phrase_search(idx.positions(), _PHRASE)


@register(
    "q_proximity_search",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
             unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    pairs AS (
      SELECT a.doc_id, ABS(a.pos - b.pos) AS gap
      FROM w a JOIN w b
        ON b.doc_id = a.doc_id AND b.word = 'scan'
      WHERE a.word = 'vector' AND ABS(a.pos - b.pos) <= 5
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(MIN(gap) AS BIGINT) AS min_gap
    FROM pairs GROUP BY doc_id
    """,
    tags=("northstar", "retrieval", "proximity"),
)
def q_proximity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity retrieval (NEAR/5: 'vector' within 5 tokens of
    'scan') over the persisted positional index — the operator between
    bag-of-words AND search and exact phrases: order-free, gap-banded.
    Two pruned term scans join per document with the band predicate in
    the join, so pair work is tf_a × tf_b per doc; the oracle rebuilds
    positions from raw text and checks every matching doc's pair count
    and closest gap."""
    from batch_processing_etl_orchestration_spark.operators.retrieval import (
        proximity_search,
    )

    idx = _postings_index(spark, sf_dir)
    return proximity_search(idx.positions(), "vector", "scan", window=5)


@register(
    "q_embedding_standardize",
    oracle="""
    WITH elems AS (
      SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS v
      FROM embeddings, range(1, 65) r(i)
    ),
    stats AS (
      SELECT pos,
             COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(v * 1e9) AS BIGINT)) AS DOUBLE) / 1e9
               AS s1,
             CAST(SUM(CAST(ROUND(v * v * 1e9) AS BIGINT)) AS DOUBLE) / 1e9
               AS s2
      FROM elems GROUP BY pos
    ),
    ms AS (
      SELECT pos, n, s1 / n AS mean,
             SQRT(s2 / n - (s1 / n) * (s1 / n)) AS sd
      FROM stats
    )
    SELECT e.pos,
           ANY_VALUE(m.n) AS n,
           ROUND(ANY_VALUE(m.mean), 6) + 0.0 AS dim_mean,
           ROUND(ANY_VALUE(m.sd), 6) AS dim_std,
           CAST(SUM(CASE WHEN ABS((e.v - m.mean) / m.sd) > 3.0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           ROUND(CAST(SUM(CAST(ROUND(((e.v - m.mean) / m.sd) * 1e6)
                              AS BIGINT)) AS DOUBLE) / 1e6, 3) + 0.0
             AS z_sum
    FROM elems e JOIN ms m USING (pos)
    GROUP BY e.pos
    """,
    tags=("similarity", "array", "normalize"),
)
def q_embedding_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension standardization (z-scoring) of the embedding
    space — the feature-normalization pass before clustering/
    quantization treats all dimensions equally. Two passes: per-dim
    mean/std from EXACT scaled-long sums (64 groups, broadcast back),
    then the z-transform with an outlier count (|z| > 3) and a
    scaled-fold z-sum per dimension (≈ 0 by construction — the oracle
    checks the exact rounded value, so a biased or mis-scaled
    transform hash-mismatches).

    Determinism: every mean/std derives from identical exact integer
    sums on both engines, and IEEE sqrt/division are correctly
    rounded, so the doubles agree bit-for-bit; folds of z-values go
    through scaled longs so addition order cannot move the hash.

    Scale: stats are a 64-row broadcast; both passes are single scans
    of the list column; nothing driver-side."""
    e = load_table(spark, sf_dir, "embeddings")
    elems = e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v0")
    ).select("vec_id", "pos", F.col("v0").cast("double").alias("v"))
    stats = elems.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.round(F.col("v") * 1e9).cast("long")) / F.lit(1e9)).alias("s1"),
        (
            F.sum(F.round(F.col("v") * F.col("v") * 1e9).cast("long"))
            / F.lit(1e9)
        ).alias("s2"),
    )
    ms = stats.select(
        "pos",
        "n",
        (F.col("s1") / F.col("n")).alias("mean"),
        F.sqrt(
            F.col("s2") / F.col("n")
            - (F.col("s1") / F.col("n")) * (F.col("s1") / F.col("n"))
        ).alias("sd"),
    )
    z = (F.col("v") - F.col("mean")) / F.col("sd")
    return (
        elems.join(F.broadcast(ms), "pos")
        .groupBy("pos")
        .agg(
            F.first("n").alias("n"),
            (F.round(F.first("mean"), 6) + F.lit(0.0)).alias("dim_mean"),
            F.round(F.first("sd"), 6).alias("dim_std"),
            F.sum(F.when(F.abs(z) > 3.0, 1).otherwise(0)).alias("n_outliers"),
            (
                F.round(
                    F.sum(F.round(z * 1e6).cast("long")) / F.lit(1e6), 3
                )
                + F.lit(0.0)
            ).alias("z_sum"),
        )
    )


@register(
    "q_weighted_sample_tokens",
    oracle="""
    WITH d AS (
      SELECT source, doc_id,
             len(string_split(text, ' ')) AS w,
             (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                   AS BIGINT) % 1000000000 + 1) / 1000000000.0 AS u
      FROM documents
    ),
    k AS (
      SELECT source, doc_id, w, ROUND(ln(u) / w, 9) AS es_key FROM d
    ),
    r AS (
      SELECT source, doc_id, w, es_key,
             row_number() OVER (PARTITION BY source
                                ORDER BY es_key DESC, doc_id) AS rank
      FROM k
    )
    SELECT source, doc_id, CAST(w AS BIGINT) AS n_tokens, es_key, rank
    FROM r WHERE rank <= 20
    """,
    tags=("northstar", "sampling", "weighted"),
)
def q_weighted_sample_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis):
    take 20 docs per source with inclusion probability proportional to
    token count — the "sample long documents more" knob a curation
    recipe turns — via the exponential-key trick, ranked on
    ln(u)/w with u a DETERMINISTIC hash-derived uniform (md5 prefix,
    never an RNG: same sample on any engine, run, or partitioning).
    Keys round to 9 dp before ranking (ln's last ulp is
    libm-specific — the q_bm25_topk convention) with doc_id
    tie-breaks, so the oracle reproduces the exact sample.

    Scale: one scan computes keys in codegen; the per-source top-20
    is a window whose partitions are per-source — for a mega-source,
    the same hash-prefix bucketing as _bucketed_prefix turns it into
    per-bucket top-20 + a 256×20-row final merge; at fixture scale
    the planner's window is the right call."""
    d = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 1000000000 + 1
    ) / 1000000000.0
    w = F.size(F.split("text", " "))
    keyed = d.select(
        "source",
        "doc_id",
        w.cast("bigint").alias("n_tokens"),
        F.round(F.log(u) / w, 9).alias("es_key"),
    )
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(F.desc("es_key"), "doc_id")
    )
    return keyed.select("*", rk.alias("rank")).where(F.col("rank") <= 20)


from batch_processing_etl_orchestration_spark.plans.registry import (
    QUERIES as _REGISTRY,
)


def _segmented_index(spark: SparkSession, sf_dir: str):
    """Build-once segmented index: base = docs with doc_id % 10 != 9,
    plus one segment holding the % 10 == 9 'new arrivals'."""
    import shutil

    from batch_processing_etl_orchestration_spark.operators.retrieval import (
        PostingsIndex,
    )

    from batch_processing_etl_orchestration_spark.tables import build_once

    def _build(path: str) -> None:
        docs = load_table(spark, sf_dir, "documents")
        idx = PostingsIndex.build(
            spark, docs.where(F.col("doc_id") % 10 != 9), path
        )
        idx.add_segment(docs.where(F.col("doc_id") % 10 == 9), "batch-9")

    path = build_once(
        sf_dir, "documents.parquet", "segmented_index", _build,
        layout=6,  # r13: corpus-stats metadata, windowed seeds
    )
    return PostingsIndex(spark, path)


@register(
    "q_index_segment_add",
    # the oracle IS the full-corpus BM25 oracle — same SQL object
    oracle=_REGISTRY["q_bm25_topk"].oracle,
    tags=("northstar", "retrieval", "incremental"),
)
def q_index_segment_add(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index maintenance, Lucene's segment model: the base
    index covers 90% of the corpus; a new ingest batch lands as a
    SEGMENT (one pass over the batch, zero base-index I/O); BM25 over
    the segmented index must rank EXACTLY like a monolithic index over
    the full corpus — the oracle IS q_bm25_topk's full-corpus SQL, so
    the hash match proves segment-union df/tf/doclen statistics are
    indistinguishable from a rebuild.

    Scale: continuous ingestion without index rebuilds — each batch
    pays only its own indexing; term scans prune per generation
    (footer word ranges), and compact_segments folds generations back
    when scan fan-out grows — the merge policy knob, exercised in
    test_retrieval.py."""
    from batch_processing_etl_orchestration_spark.operators.retrieval import (
        bm25_topk,
    )

    idx = _segmented_index(spark, sf_dir)
    return bm25_topk(idx.postings(), idx.doclens(), _BM25_TERMS, k=15)


@register(
    "q_ann_cluster_route",
    oracle=f"""
    {_KMEANS_CTE}
    , q AS (SELECT vec_id, c FROM a2 WHERE vec_id < 3),
    members AS (
      SELECT q.vec_id AS query_id, a2.vec_id AS cand_id
      FROM q JOIN a2 ON a2.c = q.c
      WHERE a2.vec_id <> q.vec_id
    ),
    emb AS (SELECT vec_id, embedding FROM embeddings),
    elems2 AS (
      SELECT m.query_id, m.cand_id,
             CAST(ROUND(CAST(eq.embedding[i] AS DOUBLE)
                        * CAST(ec.embedding[i] AS DOUBLE)
                        * {_SIM_SCALE}) AS BIGINT) AS p,
             CAST(ROUND(CAST(eq.embedding[i] AS DOUBLE)
                        * CAST(eq.embedding[i] AS DOUBLE)
                        * {_SIM_SCALE}) AS BIGINT) AS qq,
             CAST(ROUND(CAST(ec.embedding[i] AS DOUBLE)
                        * CAST(ec.embedding[i] AS DOUBLE)
                        * {_SIM_SCALE}) AS BIGINT) AS cc
      FROM members m
      JOIN emb eq ON eq.vec_id = m.query_id
      JOIN emb ec ON ec.vec_id = m.cand_id
      CROSS JOIN range(1, 65) r(i)
    ),
    sims AS (
      SELECT query_id, cand_id,
             (CAST(SUM(p) AS DOUBLE) / {float(_SIM_SCALE)})
               / (SQRT(CAST(SUM(qq) AS DOUBLE) / {float(_SIM_SCALE)})
                  * SQRT(CAST(SUM(cc) AS DOUBLE) / {float(_SIM_SCALE)}))
               AS cosine_sim
      FROM elems2 GROUP BY 1, 2
    )
    SELECT query_id, cand_id, cosine_sim, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, cand_id) AS rank
      FROM sims
    ) WHERE rank <= 5
    """,
    tags=("similarity", "ann", "clustering"),
)
def q_ann_cluster_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-routed ANN, fully oracle-checked end to end: queries
    route to their exact-k-means cluster and rank ONLY that cluster's
    members by exact cosine — IVF's probe-one-cell serving path, but
    with every stage (Lloyd fixpoint, routing, scaled-long cosine,
    ranking) on the integer-deterministic grid, so one DuckDB oracle
    hash-checks the whole composition. The production IVF
    (operators/similarity.py) uses float centroids and attests recall
    in-query; THIS query is the end-to-end proof that the
    cluster-then-search shape itself is exact under the grid
    discipline.

    Scale: the search never touches vectors outside the routed
    cluster — 1/k of the corpus per query on balanced cells; the
    scaled-long fold runs in codegen; per-query ranking is a
    window over cluster-local candidates."""
    from batch_processing_etl_orchestration_spark.operators.clustering import (
        exact_kmeans_assign,
    )

    e = load_table(spark, sf_dir, "embeddings")
    # assignment table consumed twice (query routing + membership);
    # checkpoint so the Lloyd fixpoint runs once (r15 optimization)
    a = (
        exact_kmeans_assign(e, "vec_id", "embedding", k=8, n_iter=2)
        .select("vec_id", "cluster")
        .localCheckpoint(eager=True)
    )
    q = a.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("cluster").alias("qc")
    )
    emb = e.select("vec_id", "embedding")
    members = (
        a.join(F.broadcast(q), a["cluster"] == q["qc"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("cand_id"))
    )
    pairs = (
        members.join(
            emb.select(
                F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
            ),
            "query_id",
        )
        .join(
            emb.select(
                F.col("vec_id").alias("cand_id"), F.col("embedding").alias("ce")
            ),
            "cand_id",
        )
    )
    sims = pairs.select(
        "query_id",
        "cand_id",
        (_dot_dec("qe", "ce") / (_norm_dec("qe") * _norm_dec("ce"))).alias(
            "cosine_sim"
        ),
    )
    rk = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("cosine_sim").desc(), "cand_id"
        )
    )
    return sims.select("*", rk.alias("rank")).where(F.col("rank") <= 5)


def _tombstoned_index(spark: SparkSession, sf_dir: str):
    """Build-once: full-corpus index with doc_id % 10 == 7 tombstoned
    (deleted logically, stores untouched)."""
    import shutil

    from batch_processing_etl_orchestration_spark.operators.retrieval import (
        PostingsIndex,
    )

    from batch_processing_etl_orchestration_spark.tables import build_once

    def _build(path: str) -> None:
        docs = load_table(spark, sf_dir, "documents")
        idx = PostingsIndex.build(spark, docs, path)
        idx.delete_docs(
            docs.where(F.col("doc_id") % 10 == 7).select("doc_id")
        )

    path = build_once(
        sf_dir, "documents.parquet", "tombstoned_index", _build,
        layout=6,  # r13: corpus-stats metadata, windowed seeds
    )
    return PostingsIndex(spark, path)


@register(
    "q_index_delete_docs",
    # the full-corpus BM25 oracle with the deleted docs excluded at
    # the source — derived from q_bm25_topk's SQL so the two never
    # drift apart
    oracle=_REGISTRY["q_bm25_topk"].oracle.replace(
        "FROM documents", "FROM (SELECT * FROM documents WHERE doc_id % 10 <> 7)"
    ),
    tags=("northstar", "retrieval", "incremental"),
)
def q_index_delete_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index deletes via tombstones (Lucene's deleted-docs bitmap):
    10% of the corpus is deleted LOGICALLY — a broadcast anti-join at
    scan time, zero store rewrites — and BM25 must rank exactly as if
    those documents never existed: df, N, and avgdl all derive from
    the read-side postings, so the statistics adjust with no
    recomputation step. The oracle is q_bm25_topk's SQL over the
    corpus minus the deleted ids, so any stale statistic (a df still
    counting a dead doc, a doclen survivor) hash-mismatches.

    compact_segments applies the bitmaps physically and clears them —
    the deletes-then-merge lifecycle, exercised in test_retrieval.py.
    At 100 TB, deletes cost one id-list write; the rewrite bill is
    paid once at merge time, amortized across every delete since."""
    from batch_processing_etl_orchestration_spark.operators.retrieval import (
        bm25_topk,
    )

    idx = _tombstoned_index(spark, sf_dir)
    return bm25_topk(idx.postings(), idx.doclens(), _BM25_TERMS, k=15)


@register(
    "q_decile_lift",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, n_chars,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en,
             row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rank,
             COUNT(*) OVER () AS n
      FROM documents
    )
    SELECT CAST((rank - 1) * 10 // n AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(is_en) AS BIGINT) AS n_en,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM ranked GROUP BY 1
    """,
    tags=("northstar", "analytics", "prefix-sum"),
)
def q_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift table (the model-eval staple: rank by a score, cut
    into tenths, read the response rate per tenth) — here ranking
    documents by length and measuring English share per decile. The
    oracle states it as the global window everyone writes; the Spark
    plan computes the SAME exact ranks without a single-partition
    window: the score itself is the range bucket (counts per distinct
    n_chars are metadata), a descending window over that tiny count
    table yields per-score offsets, and rank = offset + row_number
    within the equal-score partition — the _bucketed_prefix discipline
    with the score as the bucket. ntile() is avoided deliberately:
    its remainder distribution is engine-specific, while
    (rank-1)*10/n is exact arithmetic on both sides."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("is_en"),
    )
    counts = (
        d.groupBy("n_chars")
        .agg(F.count(F.lit(1)).alias("_c"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_c").over(
                    Window.orderBy(F.desc("n_chars")).rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .withColumn("_n", F.sum("_c").over(Window.partitionBy()))
        .drop("_c")
    )
    ranked = d.join(F.broadcast(counts), "n_chars").select(
        "doc_id",
        "n_chars",
        "is_en",
        (
            F.col("_off")
            + F.row_number().over(
                Window.partitionBy("n_chars").orderBy("doc_id")
            )
        ).alias("rank"),
        F.col("_n").alias("n"),
    )
    return ranked.groupBy(
        F.floor((F.col("rank") - 1) * 10 / F.col("n")).alias("decile")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("is_en").alias("n_en"),
        F.sum("n_chars").alias("sum_chars"),
    )


def _doc_bigrams(d: DataFrame) -> DataFrame:
    """(doc_id, w1, w2) adjacent word pairs — array-local assembly
    (transform over a position sequence, the shingle trick), no
    per-doc window."""
    return d.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(split(text, ' ')) >= 2 THEN "
                "transform(sequence(0, size(split(text, ' ')) - 2), "
                "i -> struct(split(text, ' ')[i] AS w1, "
                "split(text, ' ')[i + 1] AS w2)) "
                "ELSE array() END"
            )
        ).alias("bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))


def _bigram_lm_model(spark: SparkSession, sf_dir: str) -> str:
    """Build-once persisted bigram LM: the (w1,w2) and (w1) count
    tables plus the vocab scalar ARE the model — train once over the
    corpus, score every batch after against the stored tables (the
    DedupLabels economics; at 100 TB the two count tables are the only
    corpus-sized aggregations and they never recompute). Count tables
    persist range-clustered on their join keys so the scoring join's
    scan prunes and AQE sees pre-sorted compact files."""
    from batch_processing_etl_orchestration_spark.tables import build_once

    def _build(path: str) -> None:
        d = load_table(spark, sf_dir, "documents")
        bigrams = _doc_bigrams(d)
        (
            bigrams.groupBy("w1", "w2")
            .agg(F.count(F.lit(1)).alias("n2"))
            .repartitionByRange(8, "w1", "w2")
            .sortWithinPartitions("w1", "w2")
            .write.parquet(os.path.join(path, "c2"))
        )
        (
            bigrams.groupBy("w1")
            .agg(F.count(F.lit(1)).alias("n1"))
            .repartitionByRange(4, "w1")
            .sortWithinPartitions("w1")
            .write.parquet(os.path.join(path, "c1"))
        )
        (
            d.select(F.explode(F.split("text", " ")).alias("word"))
            .agg(F.countDistinct("word").alias("v"))
            .write.parquet(os.path.join(path, "vocab"))
        )

    return build_once(sf_dir, "documents.parquet", "bigram_lm", _build)


@register(
    "q_bigram_logprob_quality",
    oracle="""
    WITH words AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) AS pos,
             unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    bi AS (
      SELECT doc_id, word AS w1,
             lead(word, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM words
    ),
    bigrams AS (
      SELECT doc_id, w1, w2 FROM bi WHERE w2 IS NOT NULL
    ),
    c2 AS (SELECT w1, w2, COUNT(*) AS n2 FROM bigrams GROUP BY 1, 2),
    c1 AS (SELECT w1, COUNT(*) AS n1 FROM bigrams GROUP BY 1),
    vocab AS (SELECT COUNT(DISTINCT word) AS v FROM words)
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(CAST(SUM(CAST(ROUND(
             ln((CAST(c2.n2 AS DOUBLE) + 1.0)
                / (CAST(c1.n1 AS DOUBLE) + vv.v)) * 10000
           ) AS BIGINT)) AS DOUBLE) / 10000.0 / COUNT(*), 6)
             AS avg_logprob
    FROM bigrams b
    JOIN c2 ON c2.w1 = b.w1 AND c2.w2 = b.w2
    JOIN c1 ON c1.w1 = b.w1
    CROSS JOIN vocab vv
    GROUP BY b.doc_id
    """,
    tags=("northstar", "text", "quality"),
)
def q_bigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring with add-one smoothing — the
    perplexity-filter step (CCNet-style) one rung above
    q_unigram_logprob_quality: a document whose word TRANSITIONS are
    improbable under the corpus LM (shuffled text, boilerplate,
    gibberish) scores low even when its unigrams look fine. Per doc:
    mean of ln((c(w1,w2)+1)/(c(w1)+V)) over adjacent pairs.

    Scale: bigram assembly is array-local (transform over a position
    sequence — the shingle trick, no per-doc window); the LM "model"
    IS the two count tables plus the vocab scalar, TRAINED ONCE and
    persisted (_bigram_lm_model via tables.build_once, range-clustered
    on the join keys) — scoring any batch after is a join against the
    stored tables, never a corpus recount (measured: 3.1 s warm at
    sf0.1 AND 3.3 s at sf1 — scoring cost tracks the scored batch, not
    the training corpus). The per-doc fold is scaled-long so addition
    order never moves the hash, with ln's engine agreement guaranteed
    by integer-exact inputs (the q_unigram convention)."""
    d = load_table(spark, sf_dir, "documents")
    bigrams = _doc_bigrams(d)
    model = _bigram_lm_model(spark, sf_dir)
    c2 = read_artifact(spark, os.path.join(model, "c2"))
    c1 = read_artifact(spark, os.path.join(model, "c1"))
    vocab = read_artifact(spark, os.path.join(model, "vocab"))
    lp = F.log(
        (F.col("n2").cast("double") + 1.0)
        / (F.col("n1").cast("double") + F.col("v"))
    )
    return (
        bigrams.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            # per-term grid 1e-4, NOT 1e-6: ln's engine ulp can sit
            # within half an ulp of a fine rounding boundary (one
            # bigram flipped at sf1 under 1e-6); a coarser grid makes
            # a boundary hit ~1e-6-improbable while the fold stays
            # exact (both engines round to identical grid values)
            F.round(
                F.sum(F.round(lp * 10000).cast("long"))
                / F.lit(10000.0)
                / F.count(F.lit(1)),
                6,
            ).alias("avg_logprob"),
        )
    )


@register(
    "q_negative_sampling",
    oracle="""
    WITH r0 AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS idx
      FROM documents
    ),
    nn AS (SELECT COUNT(*) AS n FROM documents),
    probes AS (
      SELECT r0.doc_id, r0.idx, j.j,
             CAST('0x' || substring(
                 md5(CAST(r0.doc_id AS VARCHAR) || ':'
                     || CAST(j.j AS VARCHAR)), 1, 8)
               AS BIGINT) % nn.n AS h
      FROM r0
      CROSS JOIN nn
      CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS j) j
    ),
    fixed AS (
      SELECT p.doc_id, CAST(p.j AS BIGINT) AS j,
             CASE WHEN p.h = p.idx THEN (p.h + 1) % nn.n ELSE p.h END
               AS h2
      FROM probes p CROSS JOIN nn
    )
    SELECT f.doc_id, f.j, r2.doc_id AS neg_doc_id
    FROM fixed f JOIN r0 r2 ON r2.idx = f.h2
    """,
    tags=("northstar", "sampling", "contrastive"),
)
def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for
    every anchor document, k=3 pseudo-random negatives drawn by
    hashing (anchor, j) onto a DENSE corpus index — md5-derived, so
    the same pairs on any engine, run, or partitioning (the
    q_weighted_sample_tokens hash idiom), with a +1 shift when a draw
    hits the anchor itself (no self-negatives).

    The dense index comes from operators/renumber.dense_renumber —
    the segmented two-phase ROW_NUMBER (bucket-local windows + an
    exclusive bucket-offset broadcast), NOT the single-task global
    window: at 100 TB the renumber is the hard part of index-based
    sampling, and this one's task width is bounded by rows-per-bucket.
    The negatives join is a plain equi-join on idx (shuffle on a
    bigint), k× the corpus in probe rows, output-linear.

    Reference anchor: the reference draws ad-hoc samples driver-side
    (`.sample()` notebook idiom); this is the distributed,
    reproducible replacement a contrastive data pipeline needs."""
    from batch_processing_etl_orchestration_spark.operators.renumber import (
        dense_renumber,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    # one materialization of the (doc_id, idx) table: it feeds BOTH
    # the probe side and the negative side — without the checkpoint
    # the whole renumber subtree (scan + bucket window + offsets)
    # executes twice, doubling the dominant cost at scale
    r = dense_renumber(d, "doc_id").localCheckpoint(eager=True)
    n = r.agg(F.count(F.lit(1)).alias("n"))
    probes = (
        r.crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "idx",
            F.explode(F.sequence(F.lit(0), F.lit(2))).alias("j0"),
            "n",
        )
        .select(
            "doc_id",
            "idx",
            F.col("j0").cast("long").alias("j"),
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("doc_id").cast("string"),
                                F.lit(":"),
                                F.col("j0").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % F.col("n")
            ).alias("h"),
            "n",
        )
        .select(
            "doc_id",
            "j",
            F.when(F.col("h") == F.col("idx"), (F.col("h") + 1) % F.col("n"))
            .otherwise(F.col("h"))
            .alias("h2"),
        )
    )
    neg = r.select(F.col("idx").alias("h2"), F.col("doc_id").alias("neg_doc_id"))
    return probes.join(neg, "h2").select("doc_id", "j", "neg_doc_id")


@register(
    "q_ngram_containment_pairs",
    oracle=_SQL_SHINGLES
    + _SQL_DF_CAP
    + """,
    sizes AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh
      FROM shingles GROUP BY 1
    ),
    cold_common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS n_cold
      FROM cold a
      JOIN cold b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    hot_common AS (
      SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS n_hot
      FROM cold_common c
      JOIN shingles sa ON sa.doc_id = c.doc_a
                       AND sa.shingle IN (SELECT shingle FROM hot)
      JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
      GROUP BY 1, 2
    ),
    common AS (
      SELECT c.doc_a, c.doc_b,
             CAST(c.n_cold + COALESCE(h.n_hot, 0) AS BIGINT) AS n_common
      FROM cold_common c
      LEFT JOIN hot_common h ON h.doc_a = c.doc_a AND h.doc_b = c.doc_b
    )
    SELECT c.doc_a, c.doc_b, c.n_common,
           CAST(c.n_common AS DOUBLE)
             / LEAST(sa.n_sh, sb.n_sh) AS containment
    FROM common c
    JOIN sizes sa ON sa.doc_id = c.doc_a
    JOIN sizes sb ON sb.doc_id = c.doc_b
    WHERE CAST(c.n_common AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh) >= 0.5
    """,
    tags=("dedup", "containment"),
)
def q_ngram_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC near-dup pairs by word-3-gram CONTAINMENT ≥ 0.5:
    |A∩B| / min(|A|, |B|). Jaccard (q_ngram_jaccard_pairs) misses the
    quote/excerpt case — a short doc fully embedded in a long one has
    tiny Jaccard but containment ≈ 1 — which is exactly the
    train-on-the-quote / eval-on-the-source leak a decontamination
    pass must catch (the same reason q_decontaminate uses
    containment-style matching).

    Candidate generation is df-capped like q_ngram_jaccard_pairs
    (VERDICT r8 #1): only shingles with df ≤ greatest(5, 1% of corpus)
    join, bounding per-key fan-out; containment recombines to the
    EXACT value on every retained pair via the hot-shingle arrays. A
    containment-≥ 0.5 pair is lost only when ≥ half of the smaller
    doc's shingles are each corpus-wide boilerplate — i.e. the
    "excerpt" is boilerplate, not a leak. Recall bound:
    operators/dedup.df_capped_shingle_split; dropped-shingle mass
    attested by q_shingle_df_cap_report.

    Determinism: integer intersection and set sizes; containment is a
    single IEEE division of exact integers.

    Scale: cold candidates ≤ cap·|shingle rows|; hot arrays are
    corpus-size-independent in width; at 100 TB the LSH band join
    generates candidates and this containment check runs only on the
    candidate pairs."""
    from batch_processing_etl_orchestration_spark.operators.dedup import (
        df_capped_shingle_split,
    )

    d = load_table(spark, sf_dir, "documents")
    # materialize the explode once for the four consuming branches
    # (review r9; same pattern as minhash_lsh_pairs) — lazy, so plan
    # construction stays free (ADVICE r9; see q_ngram_jaccard_pairs)
    sh = _shingles(d, 3).localCheckpoint(eager=False)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    cold, hot_sets = df_capped_shingle_split(sh, d)
    common = _df_capped_common(cold, hot_sets)
    return (
        common.join(sizes.alias("sa"), F.col("sa.doc_id") == F.col("doc_a"))
        .join(sizes.alias("sb"), F.col("sb.doc_id") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / F.least(F.col("sa.n_sh"), F.col("sb.n_sh"))
            ).alias("containment"),
        )
        .where(F.col("containment") >= 0.5)
    )


@register(
    "q_shingle_df_cap_report",
    oracle=_SQL_SHINGLES
    + _SQL_DF_CAP
    + """
    SELECT (SELECT df_cap FROM dfc) AS df_cap,
           CAST(COUNT(*) FILTER (WHERE df > (SELECT df_cap FROM dfc))
                AS BIGINT) AS n_hot_shingles,
           CAST(COALESCE(SUM(df) FILTER (
                WHERE df > (SELECT df_cap FROM dfc)), 0)
                AS BIGINT) AS n_hot_occurrences,
           CAST(COUNT(*) FILTER (WHERE df <= (SELECT df_cap FROM dfc))
                AS BIGINT) AS n_cold_shingles
    FROM sdf
    """,
    tags=("dedup", "profile"),
)
def q_shingle_df_cap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attestation row for the df-capped pair joins (VERDICT r8 next-
    round #1: "emit the dropped-shingle count as an attested column"):
    the active cap, how many distinct shingles exceed it (= dropped
    from candidate generation in q_ngram_jaccard_pairs /
    q_ngram_containment_pairs), their total (doc, shingle) occurrence
    mass, and the surviving cold-shingle count. One row; the groupBy
    is the same df aggregation the pair queries run."""
    from batch_processing_etl_orchestration_spark.operators.dedup import (
        shingle_df_cap,
    )

    d = load_table(spark, sf_dir, "documents")
    sh = _shingles(d, 3)
    # The cap rides as a broadcast 1-row relation on BOTH sides of the
    # aggregate (never a plan-time .first() collect — ADVICE r9 flagged
    # the eager fetch: registered fns must stay lazy so plan-only
    # callers pay nothing). The ungrouped agg emits exactly one row
    # even on a corpus with zero shingles (review r9), and the trailing
    # crossJoin re-attaches df_cap to that row — correct even in the
    # docs-but-no-shingles corner where a per-row cap column would
    # aggregate to NULL.
    cap = shingle_df_cap(d)
    sdf = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    hot_flag = F.col("_df") > F.col("df_cap")
    return (
        sdf.crossJoin(F.broadcast(cap))
        .agg(
            F.count(F.when(hot_flag, 1)).alias("n_hot_shingles"),
            F.coalesce(F.sum(F.when(hot_flag, F.col("_df"))), F.lit(0))
            .cast("long")
            .alias("n_hot_occurrences"),
            F.count(F.when(~hot_flag, 1)).alias("n_cold_shingles"),
        )
        .crossJoin(F.broadcast(cap))
        .select(
            F.col("df_cap").cast("long").alias("df_cap"),
            "n_hot_shingles",
            "n_hot_occurrences",
            "n_cold_shingles",
        )
    )


@register(
    "q_vocab_growth",
    oracle="""
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    per_doc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens
      FROM words GROUP BY 1
    ),
    first_seen AS (
      SELECT word, MIN(doc_id) AS first_doc FROM words GROUP BY 1
    ),
    fresh AS (
      SELECT first_doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS new_words
      FROM first_seen GROUP BY 1
    )
    SELECT p.doc_id, p.n_tokens,
           CAST(COALESCE(f.new_words, 0) AS BIGINT) AS new_words,
           CAST(SUM(p.n_tokens) OVER (ORDER BY p.doc_id
                                      ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_tokens,
           CAST(SUM(COALESCE(f.new_words, 0)) OVER (ORDER BY p.doc_id
                                                    ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_vocab
    FROM per_doc p LEFT JOIN fresh f USING (doc_id)
    """,
    tags=("text", "corpus", "vocabulary"),
)
def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (the empirical Heaps-law trajectory):
    per document in corpus order, tokens added and NEW distinct words
    introduced, with running totals — the curve that tells a corpus
    builder when additional data stops buying vocabulary (and whose
    flattening is the classic saturation/contamination signal).

    The cumulative-distinct is NOT computed as a running
    COUNT(DISTINCT) window (quadratic state): each word is attributed
    once to the document that first contains it (MIN doc_id per
    word), and the curve is a plain prefix sum of those first-seen
    counts — same trick as the first-touch attribution family.

    Determinism: all integers; corpus order is the total doc_id
    order.

    Scale: the word explode shuffles once on the word for the
    MIN(doc_id) aggregate (map-side combine absorbs within-doc
    repeats); everything after runs on the |docs|-row aggregated
    domain. The running totals are the TWO-PHASE prefix sum
    (VERDICT r11 #2, the _bucketed_prefix discipline): doc_ids split
    into 256 contiguous ranges via integer range bucketing on the
    broadcast (min, max) bounds — monotone in doc_id, so ordering by
    (bucket, doc_id) IS corpus order — per-bucket totals prefix-sum
    on a 256-row table that broadcasts back, and each task finishes
    its own bucket's within-range window. No unpartitioned window
    anywhere; the largest single-task slice is |docs|/256."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    per_doc = words.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens")
    )
    fresh = (
        words.groupBy("word")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("new_words"))
    )
    # localCheckpoint (r15 optimization): joined is |docs| rows of
    # three ints but feeds the bounds scalar, the bucketing join, and
    # through it both prefix-sum phases — without truncation each consumer
    # re-ran BOTH word explodes (six explode subtrees in the plan;
    # two is the floor: n_tokens and first-seen counts aggregate the
    # token stream on different keys).
    joined = (
        per_doc.join(fresh, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("new_words"), F.lit(0)).alias("new_words"),
        )
        .localCheckpoint(eager=False)
    )
    # Phase 0: contiguous range buckets — the 1-row bounds relation
    # rides in as a broadcast scalar-attach, never a collect.
    bounds = joined.agg(
        F.min("doc_id").alias("_mn"), F.max("doc_id").alias("_mx")
    )
    bucketed = (
        joined.join(F.broadcast(bounds))
        .withColumn(
            "_b",
            F.expr(
                "CAST(((CAST(doc_id AS BIGINT) - _mn) * 256)"
                " DIV (_mx - _mn + 1) AS INT)"
            ),
        )
        .drop("_mn", "_mx")
    )
    # Phase 1: per-bucket totals, prefix-summed on the 256-row table.
    off_w = (
        Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        bucketed.groupBy("_b")
        .agg(
            F.sum("n_tokens").alias("_bt"),
            F.sum("new_words").alias("_bv"),
        )
        .select(
            "_b",
            F.coalesce(F.sum("_bt").over(off_w), F.lit(0)).alias("_offt"),
            F.coalesce(F.sum("_bv").over(off_w), F.lit(0)).alias("_offv"),
        )
    )
    # Phase 2: bucket-local windows + broadcast offsets = global sums.
    w = (
        Window.partitionBy("_b")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return bucketed.join(F.broadcast(offsets), "_b").select(
        "doc_id",
        "n_tokens",
        "new_words",
        (F.col("_offt") + F.sum("n_tokens").over(w)).alias("cum_tokens"),
        (F.col("_offv") + F.sum("new_words").over(w)).alias("cum_vocab"),
    )


@register(
    "q_dedup_soft_reweight",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             array_to_string(string_split(lower(text), ' ')[1:5], ' ')
               AS prefix_key
      FROM documents
    ),
    csize AS (
      SELECT prefix_key, COUNT(*) AS c FROM keyed GROUP BY 1
    ),
    weighted AS (
      SELECT k.source, k.n_tokens, c.c,
             (k.n_tokens * 1000) // c.c AS w_milli
      FROM keyed k JOIN csize c ON c.prefix_key = k.prefix_key
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(w_milli) AS BIGINT) AS weighted_tokens_milli
    FROM weighted
    GROUP BY 1 ORDER BY 1
    """,
    tags=("dedup", "llm-pipeline"),
)
def q_dedup_soft_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft deduplication (SlimPajama/FineWeb-style duplication
    DISCOUNT rather than removal): cluster documents by a template
    proxy — the first five lowercased whitespace tokens — and weight
    each document's token count by 1/cluster_size, so duplicated
    boilerplate contributes one cluster's worth of tokens to the
    training mix instead of being either dropped or fully counted.
    Reported per source: raw vs reweighted token budgets and how many
    documents sit in multi-member clusters.

    Integer-exact: per-doc weight is the floored milli-scaled
    division (n_tokens·1000)//cluster_size, summed as int64 — no
    engine-order-dependent double accumulation anywhere.

    Scale: one shuffle on the compact prefix key (the text column
    never shuffles), a broadcast-size cluster map if skew demands it
    (cluster sizes are bounded by template popularity, not corpus
    size), then a map-combined per-source rollup. Pairs with the
    exact/near-dup family: q_dedup_exact_hash REMOVES, this REWEIGHTS
    — both run on the same single-shuffle shape."""
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.concat_ws(
            " ", F.slice(F.split(F.lower(F.col("text")), " "), 1, 5)
        ).alias("prefix_key"),
    )
    csize = keyed.groupBy("prefix_key").agg(F.count(F.lit(1)).alias("c"))
    weighted = keyed.join(csize, "prefix_key").select(
        "source",
        "n_tokens",
        "c",
        F.expr("CAST((n_tokens * 1000) DIV c AS BIGINT)").alias("w_milli"),
    )
    return (
        weighted.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).alias("n_dup_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("w_milli").alias("weighted_tokens_milli"),
        )
        .orderBy("source")
    )


@register(
    "q_cross_source_overlap",
    oracle="""
    WITH words AS (
      SELECT doc_id, source,
             generate_subscripts(string_split(text, ' '), 1) AS pos,
             unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    grams AS (
      SELECT source,
             word || ' ' || lead(word, 1) OVER w || ' '
                  || lead(word, 2) OVER w AS shingle,
             lead(word, 2) OVER w AS _tail
      FROM words
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    sng AS (
      SELECT DISTINCT source, shingle FROM grams WHERE _tail IS NOT NULL
    ),
    sizes AS (
      SELECT source, COUNT(*) AS n_sh FROM sng GROUP BY 1
    ),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_common
      FROM sng a JOIN sng b
        ON a.shingle = b.shingle AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT i.src_a, i.src_b, i.n_common,
           CAST(sa.n_sh + sb.n_sh - i.n_common AS BIGINT) AS n_union,
           CAST((i.n_common * 1000000)
                // (sa.n_sh + sb.n_sh - i.n_common) AS BIGINT)
             AS jaccard_ppm
    FROM inter i
    JOIN sizes sa ON sa.source = i.src_a
    JOIN sizes sb ON sb.source = i.src_b
    ORDER BY i.src_a, i.src_b
    """,
    tags=("dedup", "llm-pipeline", "governance"),
)
def q_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level contamination matrix: word-3-gram Jaccard overlap
    between every pair of corpus sources — the governance view that
    tells a data curator which feeds are re-crawls or mirrors of each
    other BEFORE doc-level dedup spends compute on them.

    Integer-exact: intersection and union are distinct-shingle
    counts; Jaccard is emitted on the ppm grid via integer division.

    Scale: per-source distinct shingles collapse the corpus to a
    (source, shingle) relation first — one map-side-distinct shuffle
    on the shingle; the pair join then keys on shingles whose
    per-key width is bounded by the SOURCE count (≤ a few hundred),
    not corpus size, so the worst key fans out to |sources|² pairs,
    never |docs|². The same shape as q_ngram_jaccard_pairs one level
    up the hierarchy; the per-pair aggregate is map-combined."""
    from batch_processing_etl_orchestration_spark.operators.dedup import (
        shingle_sets,
    )

    d = load_table(spark, sf_dir, "documents")
    # localCheckpoint (r15 optimization): sng is BOTH self-join sides
    # plus the per-source sizes (referenced twice more in the final
    # broadcast joins) — without truncation the shingle explode + distinct
    # ran four times in the one plan. The (source, shingle) relation
    # is the query's core working set; materializing it once is the
    # standard self-join discipline (the doc-level pair queries do
    # the same).
    sng = (
        shingle_sets(
            d.select(F.col("source"), F.col("text")), 3, id_col="source"
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = (
        sng.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sh"))
        .localCheckpoint(eager=False)  # |sources| rows; referenced twice
    )
    a, b = sng.alias("a"), sng.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(
            F.broadcast(sizes.selectExpr("source AS src_a", "n_sh AS n_a")),
            "src_a",
        )
        .join(
            F.broadcast(sizes.selectExpr("source AS src_b", "n_sh AS n_b")),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            "n_common",
            (F.col("n_a") + F.col("n_b") - F.col("n_common")).alias("n_union"),
            F.expr(
                "CAST((n_common * 1000000) DIV (n_a + n_b - n_common)"
                " AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
        .orderBy("src_a", "src_b")
    )


# ---------------------------------------------------------------------------
# Tokenizer-exact (BPE) token counting — VERDICT r9 next #2, the last
# first-class LLM-pipeline operator the catalog lacked: every earlier
# token budget (q_token_count_regex, q_pack_sequences,
# q_token_budget_sample, q_chunk_documents) counts whitespace/regex
# tokens, a proxy that drifts 20-40% by language. The merge list is a
# committed deterministic constant (functions/bpe_merges.json, trained
# by tools/train_bpe.py); the oracle replays the EXACT merge algorithm
# in SQL — tokens render as "(tok)(tok)" strings and each merge step
# is one replace('(a)(b)','(ab)') inside a recursive CTE (SQL replace
# rewrites non-overlapping occurrences left-to-right, which IS the BPE
# merge rule), so the hash check attests token-level identity between
# the Arrow kernel and an independent engine.
# ---------------------------------------------------------------------------

from batch_processing_etl_orchestration_spark.functions.bpe import (  # noqa: E402
    load_merges as _bpe_load_merges,
    load_merges_sf1 as _bpe_load_merges_sf1,
    merges_sql_values as _bpe_merges_sql_values,
    vocab_sql_values as _bpe_vocab_sql_values,
)

_BPE_N_MERGES = len(_bpe_load_merges())

# Shared oracle stages: unique words -> character tokens -> one merge
# per recursion step -> per-word BPE token count -> per-doc sums.
# bpe_counts/bpe_per_doc (and the pack walk's toks) are MATERIALIZED:
# q_pack_sequences_bpe's recursive next-fit walk joins toks every
# iteration, and without materialization DuckDB re-evaluates the whole
# BPE chain (explode + enc recursion + join) per iteration — ~6k
# iterations x 0.5 s hung the sf1 check (the CROSS_PRODUCT/re-inline
# planner hazard class; see the _SQL_DF_CAP note).
_SQL_BPE_MERGES = f"merges(pri, a, b) AS (VALUES {_bpe_merges_sql_values()})"


def _sql_bpe_enc(vocab_cte: str, enc_name: str) -> str:
    """THE merge replay — the cross-engine identity core: per word,
    character tokens rendered "(c)(c)...", then one recursion step per
    merge priority, each a single string replace (non-overlapping,
    left-to-right — exactly the BPE merge rule). ONE definition
    (review r10): both the per-doc counting chain and the id-stream
    oracle consume this builder, so an escaping or planner fix can
    never be applied to one copy and missed in the other."""
    return f"""{enc_name} AS (
      SELECT 0 AS pri, w, regexp_replace(w, '(.)', '(\\1)', 'g') AS toks
      FROM {vocab_cte}
      UNION ALL
      SELECT m.pri, e.w,
             replace(e.toks, '(' || m.a || ')(' || m.b || ')',
                     '(' || m.a || m.b || ')')
      FROM {enc_name} e JOIN merges m ON m.pri = e.pri + 1
    )"""


_SQL_BPE_PER_DOC = f"""
    {_SQL_BPE_MERGES},
    bpe_words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    bpe_vocab AS (SELECT DISTINCT w FROM bpe_words WHERE w <> ''),
    {_sql_bpe_enc("bpe_vocab", "bpe_enc")},
    bpe_counts AS MATERIALIZED (
      SELECT w,
             CAST(length(toks) - length(replace(toks, '(', '')) AS BIGINT)
               AS n_bpe
      FROM bpe_enc WHERE pri = {_BPE_N_MERGES}
    ),
    bpe_per_doc AS MATERIALIZED (
      SELECT wo.doc_id,
             CAST(COUNT(*) AS BIGINT) AS ws_tokens,
             CAST(SUM(c.n_bpe) AS BIGINT) AS bpe_tokens
      FROM bpe_words wo JOIN bpe_counts c ON c.w = wo.w
      GROUP BY 1
    )
"""


# Shared oracle tail: per-source totals over the per-doc BPE counts.
# ONE definition consumed by BOTH the batch (q_bpe_token_count) and
# streaming (q_stream_bpe_budget) attestations of the same totals —
# a COALESCE/cast fix can never reach one and miss the twin (review
# r11; same rule as _sql_bpe_enc).
_SQL_BPE_BY_SOURCE = """
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(COALESCE(p.ws_tokens, 0)) AS BIGINT) AS ws_tokens,
           CAST(SUM(COALESCE(p.bpe_tokens, 0)) AS BIGINT) AS bpe_tokens
    FROM documents d LEFT JOIN bpe_per_doc p USING (doc_id)
    GROUP BY 1
    """


@register(
    "q_bpe_token_count",
    oracle="WITH RECURSIVE " + _SQL_BPE_PER_DOC + _SQL_BPE_BY_SOURCE,
    tags=("text", "tokenizer", "bpe"),
)
def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-exact corpus token budget by source: per source, doc
    count and BOTH token counts — whitespace (the proxy every earlier
    budget used) and BPE (what a training run actually pays) — so the
    proxy's drift is a first-class, hash-attested number.

    Encoding is Sennrich BPE over the committed deterministic merge
    list (functions/bpe.py): per word, character tokens, then each
    merge in priority order rewrites left-to-right exhaustively.
    The oracle replays the same walk in a recursive CTE, so the
    attestation is token-level cross-engine identity, not just
    plausible totals.

    Scale: the merge table is a broadcast constant (a real tokenizer's
    ~100k merges ≈ a few MB — same posture); the Arrow kernel memoizes
    word→count per task so cost tracks DISTINCT words per task (Zipf
    head encodes once); the only shuffle is the final per-source
    aggregate over |docs| rows. Reference analog: none (north-star
    LLM-pipeline brief)."""
    from batch_processing_etl_orchestration_spark.functions.bpe import (
        bpe_token_counts,
    )

    d = load_table(spark, sf_dir, "documents")
    # source rides THROUGH the kernel: one scan, no join-back shuffle
    # (review r10) — the aggregate is the plan's only exchange
    counts = bpe_token_counts(d, passthrough=("source",))
    return counts.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ws_tokens").cast("long").alias("ws_tokens"),
        F.sum("bpe_tokens").cast("long").alias("bpe_tokens"),
    )


@register(
    "q_bpe_proxy_drift",
    oracle="WITH RECURSIVE "
    + _SQL_BPE_PER_DOC
    + """,
    fert_per_doc AS (
      SELECT d.source,
             COALESCE(p.ws_tokens, 0) AS ws,
             COALESCE(p.bpe_tokens, 0) AS bpe
      FROM documents d LEFT JOIN bpe_per_doc p USING (doc_id)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(CASE WHEN SUM(ws) = 0 THEN NULL
                     ELSE SUM(bpe) * 1000000 // SUM(ws) END AS BIGINT)
             AS fertility_ppm,
           CAST(COUNT(*) FILTER (WHERE bpe * 100 > ws * 110) AS BIGINT)
             AS drift_docs,
           CAST(MAX(CASE WHEN ws > 0 THEN bpe * 1000000 // ws END)
                AS BIGINT) AS max_doc_fertility_ppm
    FROM fert_per_doc GROUP BY 1
    """,
    tags=("text", "tokenizer", "bpe", "profile"),
)
def q_bpe_proxy_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fertility audit by source: how wrong is the
    whitespace-token proxy, per corpus slice? Fertility (BPE tokens
    per whitespace token) is THE number that converts a corpus budget
    into a training budget — a pipeline that mixes sources by
    whitespace counts over/under-weights each slice by exactly this
    ratio. Reported per source: fertility in ppm (integer math —
    ``sum(bpe)*1e6 DIV sum(ws)`` — so both engines agree bit-for-bit
    with no float rounding), the count of >10%-drift documents
    (``bpe*100 > ws*110``), and the worst single-document fertility.
    NULL-guarded for an all-empty source under ANSI mode (the vanilla
    driver session): the division never executes when sum(ws)=0.

    Same scale shape as q_bpe_token_count (one pruned scan, source
    rides through the Arrow kernel, one aggregate exchange); the
    integer-ppm trick is the production pattern for cross-engine /
    cross-replica reproducible ratio metrics. Reference analog: none
    (north-star LLM-pipeline brief)."""
    from batch_processing_etl_orchestration_spark.functions.bpe import (
        bpe_token_counts,
    )

    d = load_table(spark, sf_dir, "documents")
    counts = bpe_token_counts(d, passthrough=("source",))
    return counts.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr(
            "CAST(CASE WHEN sum(ws_tokens) = 0 THEN NULL "
            "ELSE sum(bpe_tokens) * 1000000 DIV sum(ws_tokens) END "
            "AS BIGINT)"
        ).alias("fertility_ppm"),
        F.sum(
            F.when(
                F.col("bpe_tokens") * 100 > F.col("ws_tokens") * 110, 1
            ).otherwise(0)
        ).cast("long").alias("drift_docs"),
        F.max(
            F.when(
                F.col("ws_tokens") > 0,
                F.expr("bpe_tokens * 1000000 DIV ws_tokens"),
            )
        ).cast("long").alias("max_doc_fertility_ppm"),
    )


@register(
    "q_stream_bpe_budget",
    oracle="WITH RECURSIVE " + _SQL_BPE_PER_DOC + _SQL_BPE_BY_SOURCE,
    tags=("streaming", "text", "tokenizer", "bpe", "incremental"),
)
def q_stream_bpe_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming token accounting — the shape a CONTINUOUS ingestion
    pipeline runs: documents arrive as 4 ordered micro-batches
    (maxFilesPerTrigger=1 over a doc_id-ranged 4-file copy of the
    corpus), each batch is tokenizer-counted by the same Arrow kernel
    as q_bpe_token_count and merged into a source-partitioned running
    budget MV (warehouse/incremental.py). After the availableNow
    drain, the MV must equal ONE batch aggregation over the whole
    corpus — the oracle — because token counts are a commutative
    monoid: no batching of arrivals can change the totals.

    This closes the tokenizer ladder's last gap: counts → budgets →
    ids were all BATCH attestations; a real platform meters token
    budgets as data lands. Batch commit tokens recorded INSIDE the MV
    commit make foreachBatch redelivery safe with no marker-after-
    merge crash window (same pattern as q_stream_incremental_mv: at
    100 TB the token becomes a transactional-commit column, the merge
    algebra is identical); per-batch cost is the batch's own tokenize
    — run ONCE, the per-doc delta is localCheckpoint'ed before
    delta_refresh executes it twice — plus O(touched source
    partitions) MV I/O, so steady-state metering tracks ARRIVAL RATE,
    not corpus size."""
    import os
    import shutil

    from batch_processing_etl_orchestration_spark.functions.bpe import (
        bpe_token_counts,
    )
    from batch_processing_etl_orchestration_spark.tables import (
        build_once,
        fixture_cache_dir,
    )
    from batch_processing_etl_orchestration_spark.warehouse.incremental import (
        MergeableSpec,
        delta_refresh,
        read_mv,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    src = build_once(
        sf_dir,
        "documents.parquet",
        "stream_bpe_src",
        lambda p: docs.repartitionByRange(4, "doc_id")
        .write.mode("overwrite")
        .parquet(p),
    )

    run = fixture_cache_dir(sf_dir, "documents.parquet", "stream_bpe_run")
    mv, ckpt = os.path.join(run, "mv"), os.path.join(run, "ckpt")
    shutil.rmtree(run, ignore_errors=True)  # the scenario mutates state

    spec = MergeableSpec(
        partition_col="source",
        group_cols=(),
        sum_cols={"ws_tokens": "ws_tokens", "bpe_tokens": "bpe_tokens"},
        count_name="n_docs",
    )

    def merge(batch_df, batch_id: int) -> None:
        from batch_processing_etl_orchestration_spark.warehouse.incremental import (
            has_commit,
        )

        # Idempotence rides INSIDE the MV commit (ADVICE r11 #2): the
        # batch token is recorded by delta_refresh between the data
        # write and the intent-clear/ready step, so no crash window
        # exists where the merge landed but the token didn't — a
        # redelivered batch either re-merges cleanly (nothing
        # committed) or is skipped (token present).
        if has_commit(mv, f"batch_{batch_id}"):
            return  # skip the tokenize entirely on redelivery
        # localCheckpoint (eager): delta_refresh executes its input
        # TWICE (affected_partitions' distinct-collect, then the
        # aggregate/write) — without materializing, the Arrow tokenize
        # kernel would run twice per batch (review r11). The delta is
        # one tiny row per doc, so the checkpoint is cheap.
        delta = (
            bpe_token_counts(batch_df, passthrough=("source",))
            .select("source", "ws_tokens", "bpe_tokens")
            .localCheckpoint(eager=True)
        )
        delta_refresh(spark, delta, spec, mv, commit_token=f"batch_{batch_id}")

    schema = artifact_schema(spark, src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # finalize() serves scaled-long sums as DOUBLE; these are integer
    # token counts well inside 2^53, so the cast back to long is exact
    return read_mv(spark, spec, mv).select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("ws_tokens").cast("long").alias("ws_tokens"),
        F.col("bpe_tokens").cast("long").alias("bpe_tokens"),
    )


_PACK_BUDGET_BPE = 640  # BPE tokens per bin


@register(
    "q_pack_sequences_bpe",
    oracle="WITH RECURSIVE "
    + _SQL_BPE_PER_DOC
    + f""",
    toks AS MATERIALIZED (
      SELECT d.doc_id,
             d.doc_id % {_N_PACKERS} AS packer,
             COALESCE(p.bpe_tokens, 0) AS n_tokens,
             row_number() OVER (PARTITION BY d.doc_id % {_N_PACKERS}
                                ORDER BY d.doc_id) AS rn
      FROM documents d LEFT JOIN bpe_per_doc p USING (doc_id)
    ),
    walk(packer, rn, doc_id, n_tokens, bin_idx, bin_fill) AS (
      SELECT packer, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
      FROM toks WHERE rn = 1
      UNION ALL
      SELECT t.packer, t.rn, t.doc_id, t.n_tokens,
             CASE WHEN w.bin_fill + t.n_tokens > {_PACK_BUDGET_BPE}
                  THEN w.bin_idx + 1 ELSE w.bin_idx END,
             CASE WHEN w.bin_fill + t.n_tokens > {_PACK_BUDGET_BPE}
                  THEN t.n_tokens ELSE w.bin_fill + t.n_tokens END
      FROM walk w
      JOIN toks t ON t.packer = w.packer AND t.rn = w.rn + 1
    )
    SELECT packer, bin_idx,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc_id
    FROM walk GROUP BY 1, 2
    """,
    tags=("text", "packing", "tokenizer", "bpe"),
)
def q_pack_sequences_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_pack_sequences with the budget in TOKENIZER tokens: next-fit
    packing of documents into 640-BPE-token training bins. This is the form a real pipeline runs — a whitespace budget
    under-fills or overflows the context window by exactly the
    proxy drift q_bpe_token_count attests — while the walk itself
    (one shuffle on packer, streaming mapInPandas, O(1) state) is the
    identical scale shape already proven for the whitespace variant.

    The BPE counts come from the same Arrow kernel as
    q_bpe_token_count; the oracle chains the recursive merge replay
    into the recursive next-fit walk, so one hash covers tokenizer
    identity AND packing identity."""
    from batch_processing_etl_orchestration_spark.functions.bpe import (
        bpe_token_counts,
    )

    d = load_table(spark, sf_dir, "documents")
    counts = bpe_token_counts(d).select(
        "doc_id",
        (F.col("doc_id") % _N_PACKERS).alias("packer"),
        F.col("bpe_tokens").alias("n_tokens"),
    )
    return _next_fit_bins(counts, budget=_PACK_BUDGET_BPE)


# ---------------------------------------------------------------------------
# Adversarial-shape attestation (VERDICT r9 next #6): the two skew
# shapes tools/make_adversarial.py generates — corpus-wide boilerplate
# and a one-user hot-entity — injected INLINE as pure deterministic
# transforms of the sf_dir tables, so the DRIVER hash-checks the
# capped-candidate math and the skew-block bound every rotation, at
# whatever sf it runs, with no dependence on an out-of-repo fixture
# dir. The constants come from fixtures.py (single definition shared
# with the generator and tests/test_adversarial.py).
# ---------------------------------------------------------------------------

_NB_HEAD_K = 16  # exact head vocabulary size (production: ~1e5)
_NB_TAIL_B = 64  # hashed tail buckets (the DSIR mechanism below)

from batch_processing_etl_orchestration_spark.fixtures import (  # noqa: E402
    ADVERSARIAL_BOILER,
    ADVERSARIAL_BOILER_PCT,
    ADVERSARIAL_HOT_EVENT_MOD,
    ADVERSARIAL_HOT_SOURCE,
    ADVERSARIAL_HOT_SOURCE_MOD,
    ADVERSARIAL_MEGA_PHRASE,
    ADVERSARIAL_MEGA_REPEAT,
)


@register(
    "q_adversarial_skew_report",
    oracle=f"""
    WITH adocs AS (
      SELECT doc_id,
             CASE WHEN doc_id % 100 < {ADVERSARIAL_BOILER_PCT}
                  THEN text || ' {ADVERSARIAL_BOILER}'
                  ELSE text END AS text
      FROM documents
    ),
    {_sql_shingles_body("adocs")}
    {_sql_dfc_sdf("adocs")},
    doc_side AS (
      SELECT CAST(COUNT(*) FILTER (WHERE df > (SELECT df_cap FROM dfc))
                  AS BIGINT) AS n_hot_shingles,
             CAST(COUNT(*) FILTER (WHERE df <= (SELECT df_cap FROM dfc))
                  AS BIGINT) AS n_cold_shingles,
             CAST(COALESCE(SUM(df * (df - 1) // 2), 0) AS BIGINT)
               AS uncapped_pair_mass,
             CAST(COALESCE(SUM(df * (df - 1) // 2) FILTER (
                  WHERE df <= (SELECT df_cap FROM dfc)), 0) AS BIGINT)
               AS capped_pair_mass
      FROM sdf
    ),
    hotu AS (SELECT MIN(user_id) AS hot_user FROM events),
    ev2 AS (
      SELECT CASE WHEN event_id % {ADVERSARIAL_HOT_EVENT_MOD} = 0
                  THEN (SELECT hot_user FROM hotu)
                  ELSE user_id END AS user_id,
             CAST(ts AS DATE) AS day
      FROM events
    ),
    blocks AS (
      SELECT user_id, day, CAST(COUNT(*) AS BIGINT) AS n
      FROM ev2 GROUP BY 1, 2
    ),
    ev_side AS (
      SELECT CAST(COALESCE(SUM(n) FILTER (
                  WHERE user_id = (SELECT hot_user FROM hotu)), 0)
                  AS BIGINT) AS hot_user_rows,
             CAST(MAX(n) AS BIGINT) AS widest_block_rows
      FROM blocks
    ),
    selc AS (
      SELECT doc_id,
             CASE WHEN doc_id = (SELECT MIN(doc_id) FROM documents)
                  THEN rtrim(repeat('{ADVERSARIAL_MEGA_PHRASE} ',
                                    {ADVERSARIAL_MEGA_REPEAT}))
                  ELSE text END AS text,
             CASE WHEN doc_id % {ADVERSARIAL_HOT_SOURCE_MOD} <> 0
                  THEN '{ADVERSARIAL_HOT_SOURCE}'
                  ELSE source END AS source
      FROM documents
    ),
    selw AS MATERIALIZED (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM selc
    ),
    selhead AS (
      SELECT word FROM (
        SELECT word, COUNT(*) AS df
        FROM (SELECT unnest(list_distinct(string_split(text, ' ')))
                AS word FROM selc)
        GROUP BY 1
      ) ORDER BY df DESC, word LIMIT {_NB_HEAD_K}
    ),
    selbuck AS MATERIALIZED (
      SELECT (ascii(substr(word, 1, 1)) * 961
              + ascii(substr(word, 2, 1)) * 31
              + length(word)) % {_NB_TAIL_B} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM selw GROUP BY 1
    ),
    sel_side AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM selc
              WHERE source = '{ADVERSARIAL_HOT_SOURCE}')
               AS hot_source_docs,
             (SELECT CAST(len(string_split(text, ' ')) AS BIGINT)
              FROM selc
              WHERE doc_id = (SELECT MIN(doc_id) FROM documents))
               AS mega_doc_tokens,
             (SELECT CAST(COUNT(DISTINCT CASE
                 WHEN h.word IS NOT NULL THEN 'w:' || w.word
                 ELSE 'b:' || CAST((ascii(substr(w.word, 1, 1)) * 961
                      + ascii(substr(w.word, 2, 1)) * 31
                      + length(w.word)) % {_NB_TAIL_B} AS VARCHAR)
               END) AS BIGINT)
              FROM selw w LEFT JOIN selhead h ON h.word = w.word)
               AS nb_feat_rows,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM selbuck)
               AS dsir_buckets,
             (SELECT CAST(MAX(n) AS BIGINT) FROM selbuck)
               AS dsir_max_bucket_tokens
    )
    SELECT (SELECT df_cap FROM dfc) AS df_cap,
           d.n_hot_shingles, d.n_cold_shingles,
           d.uncapped_pair_mass, d.capped_pair_mass,
           e.hot_user_rows, e.widest_block_rows,
           s.hot_source_docs, s.mega_doc_tokens, s.nb_feat_rows,
           s.dsir_buckets, s.dsir_max_bucket_tokens
    FROM doc_side d, ev_side e, sel_side s
    """,
    tags=("dedup", "adversarial", "profile"),
)
def q_adversarial_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row attestation of the engine's two skew defenses against
    ADVERSARIAL-BY-CONSTRUCTION inputs, built inline from the sf_dir
    tables (same deterministic transforms as tools/make_adversarial.py
    via fixtures.py):

    - Boilerplate corpus: a fixed paragraph in 30% of documents. `uncapped_pair_mass` = Σ df·(df−1)/2 over shingles
      is EXACTLY the candidate-pair count a raw self-join would emit —
      quadratic in corpus size through the hot keys (SCALE.md measured
      15.76M → 1.575B at 10× docs) — while `capped_pair_mass` (df ≤
      cap terms only) is what the df-capped join actually emits,
      bounded by cap·|cold rows| (linear). Both are cheap aggregates
      over the df table: the attestation PRICES the avoided join
      without running it.
    - Hot entity: 50% of events on one user. `widest_block_rows` is the largest (user, day) task the
      blocked sessionizer would see vs `hot_user_rows` on that user —
      the bound that keeps one executor from receiving the whole hot
      partition (a window partition is one task; AQE cannot split it).

    Scale: shingle explode + one df groupBy (the pair queries' own
    stage), one events groupBy on (user, day); the caps/hot-user
    scalars ride as broadcast 1-row relations, never a collect.

    Every scalar is computed on a SINGLE-CONSUMER chain (r15
    optimization, guide §1.2): a DataFrame referenced by two
    downstream consumers is a duplicated subtree in the one physical
    plan — Catalyst does not dedupe common subplans, and AQE exchange
    reuse only fires on byte-identical exchanges. So hot_user rides
    the (user, day) block grouping (a constant grouping column
    instead of a second events scan), and the NB/DSIR/mega/hot-source
    quantities all fall out of ONE word-explode pass (see fb below)
    instead of four. The cap's second reference stays (a COUNT-only
    scan, metadata-cheap) to preserve the 1-row-on-empty-corpus edge
    review r9 pinned."""
    from batch_processing_etl_orchestration_spark.operators.dedup import (
        shingle_df_cap,
    )

    d = load_table(spark, sf_dir, "documents")
    boilered = F.col("doc_id") % 100 < ADVERSARIAL_BOILER_PCT
    adocs = d.select(
        "doc_id",
        F.when(boilered, F.concat("text", F.lit(" " + ADVERSARIAL_BOILER)))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    cap = shingle_df_cap(adocs)
    sdf = _shingles(adocs, 3).groupBy("shingle").agg(
        F.count(F.lit(1)).alias("_df")
    )
    hot_flag = F.col("_df") > F.col("df_cap")
    pair_mass = F.expr("_df * (_df - 1) DIV 2")
    # (doc_side stays an UNGROUPED aggregate — grouping by the
    # constant df_cap would carry it out in one pass but emits ZERO
    # rows on an empty shingle table where the oracle emits one
    # (review r9 pinned that edge); the second cap reference below is
    # a COUNT-only documents scan, metadata-cheap at any scale.)
    doc_side = (
        sdf.crossJoin(F.broadcast(cap))
        .agg(
            F.count(F.when(hot_flag, 1)).alias("n_hot_shingles"),
            F.count(F.when(~hot_flag, 1)).alias("n_cold_shingles"),
            F.coalesce(F.sum(pair_mass), F.lit(0))
            .cast("long")
            .alias("uncapped_pair_mass"),
            F.coalesce(F.sum(F.when(~hot_flag, pair_mass)), F.lit(0))
            .cast("long")
            .alias("capped_pair_mass"),
        )
    )
    ev = load_table(spark, sf_dir, "events")
    hotu = ev.agg(F.min("user_id").alias("hot_user"))
    ev2 = ev.crossJoin(F.broadcast(hotu)).select(
        F.when(
            F.col("event_id") % ADVERSARIAL_HOT_EVENT_MOD == 0,
            F.col("hot_user"),
        )
        .otherwise(F.col("user_id"))
        .alias("user_id"),
        F.to_date("ts").alias("day"),
        "hot_user",
    )
    # hot_user is constant, so grouping by it changes no group — it
    # just rides through so ev_side needs no second events scan.
    blocks = ev2.groupBy("user_id", "day", "hot_user").agg(
        F.count(F.lit(1)).alias("n")
    )
    ev_side = blocks.agg(
        F.coalesce(
            F.sum(F.when(F.col("user_id") == F.col("hot_user"), F.col("n"))),
            F.lit(0),
        )
        .cast("long")
        .alias("hot_user_rows"),
        F.max("n").cast("long").alias("widest_block_rows"),
    )
    # selection-family shapes (r13, VERDICT r12 #5): hot source + mega
    # doc, built inline with the same fixtures.py constants. Prices the
    # NB weight-build shuffle (reduce side = DISTINCT capped features —
    # constant ≤ K+B no matter how skewed the corpus) and the DSIR
    # bucket histogram (≤ B rows; max bucket mass shows where the mega
    # doc's tokens land). hot_source_docs is the widest source-keyed
    # group corpus assembly/mixing would reduce; mega_doc_tokens is the
    # widest per-doc explode task (one input row explodes in one task —
    # the priced quantity; the per-doc scoring agg absorbs it with
    # map-side partials).
    mn = d.agg(F.min("doc_id").alias("_mn"))
    mega_text = F.rtrim(
        F.repeat(F.lit(ADVERSARIAL_MEGA_PHRASE + " "), ADVERSARIAL_MEGA_REPEAT)
    )
    selc = d.crossJoin(F.broadcast(mn)).select(
        "doc_id",
        F.when(F.col("doc_id") == F.col("_mn"), mega_text)
        .otherwise(F.col("text"))
        .alias("text"),
        F.when(
            F.col("doc_id") % ADVERSARIAL_HOT_SOURCE_MOD != 0,
            F.lit(ADVERSARIAL_HOT_SOURCE),
        )
        .otherwise(F.col("source"))
        .alias("source"),
        F.col("_mn"),
    )
    # posexplode instead of explode: pos==0 marks exactly one row per
    # document (split() never yields an empty array), so DOC-level
    # counts (hot-source membership) can ride the word-level pass.
    selw = selc.select(
        (F.col("doc_id") == F.col("_mn")).alias("is_mega"),
        (F.col("source") == ADVERSARIAL_HOT_SOURCE).alias("is_hot_src"),
        F.posexplode(F.split("text", " ")).alias("pos", "word"),
    )
    selhead = _nb_head_df(selc).select(
        "word", F.lit(True).alias("_h")
    )
    sel_bucket = _nb_bucket_expr()
    # ONE word-explode pass feeds ALL FOUR selection-side quantities
    # (r15 optimization, guide §1.2/§2.3). The (feat, bucket)
    # pre-aggregation is map-side combinable into ≤ K+B groups (feat's
    # domain is {w:head} ∪ {b:bucket}), and bucket is a pure function
    # of feat (head feat → its word's bucket, tail feat → the bucket
    # itself) — so fb holds exactly one row per distinct feat, and:
    # - nb_feat_rows   = Σ over buckets of fb rows (count_distinct
    #   feat, because feat→bucket is functional),
    # - dsir_buckets / dsir_max_bucket_tokens = count / max over the
    #   per-bucket token sums,
    # - mega_doc_tokens = Σ n_mega (one exploded row per mega-doc
    #   word),
    # - hot_source_docs = Σ n_first_hot (pos==0 once per doc).
    # Everything chains through per_bucket with a SINGLE consumer at
    # every level — the earlier shape aggregated fb twice (NB side +
    # DSIR side), which duplicated the whole explode+join+groupBy
    # subtree in the physical plan, and paid a separate selc scan for
    # the hot-source/mega pair on top.
    fb = (
        selw.join(F.broadcast(selhead), "word", "left")
        .select(
            F.when(
                F.col("_h").isNotNull(),
                F.concat(F.lit("w:"), F.col("word")),
            )
            .otherwise(F.concat(F.lit("b:"), sel_bucket.cast("string")))
            .alias("feat"),
            sel_bucket.alias("bucket"),
            "is_mega",
            ((F.col("pos") == 0) & F.col("is_hot_src")).alias("first_hot"),
        )
        .groupBy("feat", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("is_mega"), 1).otherwise(0)).alias("n_mega"),
            F.sum(F.when(F.col("first_hot"), 1).otherwise(0)).alias(
                "n_first_hot"
            ),
        )
    )
    per_bucket = fb.groupBy("bucket").agg(
        F.sum("n").alias("bn"),
        F.count(F.lit(1)).alias("nf"),
        F.sum("n_mega").alias("bm"),
        F.sum("n_first_hot").alias("bh"),
    )
    sel_side = per_bucket.agg(
        F.coalesce(F.sum("nf"), F.lit(0)).cast("long").alias("nb_feat_rows"),
        F.count(F.lit(1)).cast("long").alias("dsir_buckets"),
        F.max("bn").cast("long").alias("dsir_max_bucket_tokens"),
        F.coalesce(F.sum("bm"), F.lit(0))
        .cast("long")
        .alias("mega_doc_tokens"),
        F.coalesce(F.sum("bh"), F.lit(0))
        .cast("long")
        .alias("hot_source_docs"),
    )
    return (
        doc_side.crossJoin(ev_side)
        .crossJoin(F.broadcast(cap))
        .crossJoin(F.broadcast(sel_side))
        .select(
            F.col("df_cap").cast("long").alias("df_cap"),
            "n_hot_shingles",
            "n_cold_shingles",
            "uncapped_pair_mass",
            "capped_pair_mass",
            "hot_user_rows",
            "widest_block_rows",
            "hot_source_docs",
            "mega_doc_tokens",
            "nb_feat_rows",
            "dsir_buckets",
            "dsir_max_bucket_tokens",
        )
    )


_BPE_SAMPLE_MOD = 97  # deterministic ~1% doc sample for the id stream


@register(
    "q_bpe_encode_ids",
    oracle=f"""
    WITH RECURSIVE {_SQL_BPE_MERGES},
    vocab(token, token_id) AS (VALUES {_bpe_vocab_sql_values()}),
    sdocs AS (
      SELECT doc_id, text FROM documents WHERE doc_id % {_BPE_SAMPLE_MOD} = 0
    ),
    swords AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) AS word_pos,
             unnest(string_split(text, ' ')) AS w
      FROM sdocs
    ),
    svocab AS (SELECT DISTINCT w FROM swords WHERE w <> ''),
    {_sql_bpe_enc("svocab", "enc")},
    toklists AS MATERIALIZED (
      SELECT w,
             string_split(substr(toks, 2, length(toks) - 2), ')(') AS toks
      FROM enc WHERE pri = {_BPE_N_MERGES}
    ),
    exploded AS (
      SELECT wo.doc_id, wo.word_pos,
             generate_subscripts(t.toks, 1) AS tok_pos,
             unnest(t.toks) AS tok
      FROM swords wo JOIN toklists t ON t.w = wo.w
    )
    SELECT e.doc_id,
           CAST(e.word_pos AS BIGINT) AS word_pos,
           CAST(e.tok_pos AS BIGINT) AS tok_pos,
           CAST(COALESCE(v.token_id, -1) AS BIGINT) AS token_id
    FROM exploded e LEFT JOIN vocab v ON v.token = e.tok
    """,
    tags=("text", "tokenizer", "bpe"),
)
def q_bpe_encode_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The token-ID stream itself, attested id-by-id: a deterministic
    ~1% doc sample (doc_id % 97 == 0) encoded to (doc_id, word_pos,
    tok_pos, token_id) rows — what a training run actually consumes
    after packing. Completes the tokenizer attestation ladder: counts
    (q_bpe_token_count) → budgets (q_pack_sequences_bpe) → the ids
    themselves. The vocab is a pure function of the committed merge
    list (36 base chars, then merge products in priority order, first
    surface occurrence wins); the oracle rebuilds it as a VALUES table
    and splits the replayed "(tok)(tok)" strings back into
    per-position tokens, so a single id off by one position anywhere
    in the sample flips the hash. An out-of-vocab token (a character
    outside the trained [a-z0-9] alphabet after a corpus regen) maps
    to the sentinel id -1 in BOTH engines (kernel fallback; oracle
    LEFT JOIN + COALESCE), so alphabet drift surfaces as visible -1
    ids instead of silent cross-engine divergence.

    Scale: a modulo predicate is NOT pushable into a parquet scan
    (the plan shows it as a post-scan Filter; only IsNotNull pushes),
    so the sample still reads the (doc_id, text) columns of every row
    group — at 100 TB a production 1% sample would partition or
    bucket by a sample key to get scan pruning. Everything after is a
    stateless flatMap with a per-task word→ids memo; no shuffle at
    all (the output needs no aggregation). The kernel itself IS the
    production tokenize step — this query is the attestation-sized
    twin."""
    from batch_processing_etl_orchestration_spark.functions.bpe import (
        bpe_encode_ids,
    )

    d = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % _BPE_SAMPLE_MOD == 0
    )
    return bpe_encode_ids(d)


# The saturated sf1-trained table (VERDICT r10 next #7): 383 merges —
# the fixture corpus's PHYSICAL ceiling (training stops when no pair
# occurs twice over its 310 distinct words; 'a few thousand' merges is
# impossible on this vocabulary — tools/train_bpe.py documents the
# wall, and encoder cost at a real ~100k-merge table is pinned by the
# flat-cost unit bench in tests/test_bpe.py). Loaded at import so the
# oracle below interpolates the SAME committed constant the kernel
# broadcasts.
_BPE_SAT_MERGES = _bpe_load_merges_sf1()
_BPE_SAT_N = len(_BPE_SAT_MERGES)
_BPE_SAT_SAMPLE_MOD = 89  # a DIFFERENT ~1% sample than q_bpe_encode_ids


@register(
    "q_bpe_encode_ids_satvocab",
    oracle=f"""
    WITH RECURSIVE
    merges(pri, a, b) AS (VALUES {_bpe_merges_sql_values(_BPE_SAT_MERGES)}),
    vocab(token, token_id) AS (VALUES {_bpe_vocab_sql_values(_BPE_SAT_MERGES)}),
    sdocs AS (
      SELECT doc_id, text FROM documents
      WHERE doc_id % {_BPE_SAT_SAMPLE_MOD} = 0
    ),
    swords AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) AS word_pos,
             unnest(string_split(text, ' ')) AS w
      FROM sdocs
    ),
    svocab AS (SELECT DISTINCT w FROM swords WHERE w <> ''),
    {_sql_bpe_enc("svocab", "enc")},
    toklists AS MATERIALIZED (
      SELECT w,
             string_split(substr(toks, 2, length(toks) - 2), ')(') AS toks
      FROM enc WHERE pri = {_BPE_SAT_N}
    ),
    exploded AS (
      SELECT wo.doc_id, wo.word_pos,
             generate_subscripts(t.toks, 1) AS tok_pos,
             unnest(t.toks) AS tok
      FROM swords wo JOIN toklists t ON t.w = wo.w
    )
    SELECT e.doc_id,
           CAST(e.word_pos AS BIGINT) AS word_pos,
           CAST(e.tok_pos AS BIGINT) AS tok_pos,
           CAST(COALESCE(v.token_id, -1) AS BIGINT) AS token_id
    FROM exploded e LEFT JOIN vocab v ON v.token = e.tok
    """,
    tags=("text", "tokenizer", "bpe"),
)
def q_bpe_encode_ids_satvocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_bpe_encode_ids under the LARGEST table this corpus can train:
    the committed 383-merge sf1-saturated list (8x the 48-merge table;
    saturation — no pair occurs twice — is the fixture vocabulary's
    physical ceiling, documented in tools/train_bpe.py). The id stream
    is the right attestation shape at saturation: per-word token
    COUNTS degenerate toward 1 as the table grows (every in-vocabulary
    word compresses to a single token), but each token ID is a
    function of the ENTIRE merge ORDER — 383 VALUES rows, 383
    recursive replay iterations, and the priority-sensitive vocab
    numbering all have to agree across engines for a single row to
    hash-match. Same plan shape as q_bpe_encode_ids (pruned 2-column
    scan, post-scan sample filter, stateless Arrow flatMap, zero
    shuffles); a deliberately DIFFERENT ~1% sample (mod 89) so the two
    ladder queries attest NEAR-disjoint docs (only doc_ids divisible
    by lcm(89,97)=8633 — doc 0 and ~0.01% of a corpus — land in
    both)."""
    from batch_processing_etl_orchestration_spark.functions.bpe import (
        bpe_encode_ids,
        load_merges_sf1,
    )

    d = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % _BPE_SAT_SAMPLE_MOD == 0
    )
    return bpe_encode_ids(d, merges=load_merges_sf1())


# The sf10-trained table (VERDICT r11 next #4): make_sf1's per-replica
# word suffixing gives the sf10 corpus ~10x the distinct vocabulary, so
# training saturates at 3,263 merges — organically past the
# multi-thousand-merge bar the sf1 corpus physically cannot reach
# (tools/train_bpe.py documents both walls). Loaded at import so the
# oracle interpolates the SAME committed constant the kernel broadcasts.
from batch_processing_etl_orchestration_spark.functions.bpe import (  # noqa: E402
    load_merges_sf10 as _bpe_load_merges_sf10,
)

_BPE_SF10_MERGES = _bpe_load_merges_sf10()
_BPE_SF10_N = len(_BPE_SF10_MERGES)
_BPE_SF10_SAMPLE_MOD = 83  # a THIRD ~1% sample (vs mods 97 and 89)


@register(
    "q_bpe_encode_ids_sf10vocab",
    oracle=f"""
    WITH RECURSIVE
    merges(pri, a, b) AS (VALUES {_bpe_merges_sql_values(_BPE_SF10_MERGES)}),
    vocab(token, token_id) AS (VALUES {_bpe_vocab_sql_values(_BPE_SF10_MERGES)}),
    sdocs AS (
      SELECT doc_id, text FROM documents
      WHERE doc_id % {_BPE_SF10_SAMPLE_MOD} = 0
    ),
    swords AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) AS word_pos,
             unnest(string_split(text, ' ')) AS w
      FROM sdocs
    ),
    svocab AS (SELECT DISTINCT w FROM swords WHERE w <> ''),
    {_sql_bpe_enc("svocab", "enc")},
    toklists AS MATERIALIZED (
      SELECT w,
             string_split(substr(toks, 2, length(toks) - 2), ')(') AS toks
      FROM enc WHERE pri = {_BPE_SF10_N}
    ),
    exploded AS (
      SELECT wo.doc_id, wo.word_pos,
             generate_subscripts(t.toks, 1) AS tok_pos,
             unnest(t.toks) AS tok
      FROM swords wo JOIN toklists t ON t.w = wo.w
    )
    SELECT e.doc_id,
           CAST(e.word_pos AS BIGINT) AS word_pos,
           CAST(e.tok_pos AS BIGINT) AS tok_pos,
           CAST(COALESCE(v.token_id, -1) AS BIGINT) AS token_id
    FROM exploded e LEFT JOIN vocab v ON v.token = e.tok
    """,
    tags=("text", "tokenizer", "bpe"),
)
def q_bpe_encode_ids_sf10vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_bpe_encode_ids under the committed sf10-TRAINED table — 3,263
    merges, the first ORGANICALLY multi-thousand-merge table this
    fixture family supports (VERDICT r11 next #4; the sf1 corpus
    saturates at 383). The id stream is attested id-for-id: every
    token ID is a function of the entire 3,263-step merge ORDER, so
    the oracle replays all 3,263 recursion steps over the sample
    vocabulary and a single mis-ranked merge anywhere flips the hash.
    Against the base corpus most suffixed sf10 merges simply never
    fire (their operands don't occur) — exactly how a production
    tokenizer trained on a superset corpus behaves on a slice — while
    the table-size-independence of the rank-dict encoder keeps the
    kernel's per-word cost identical to the 48-merge query
    (tests/test_bpe.py pins that bound on THIS table).

    Scale: same plan as q_bpe_encode_ids — pruned 2-column scan,
    post-scan ~1% sample filter (mod 83: a third near-disjoint sample
    vs mods 97/89), stateless Arrow flatMap with a per-task word→ids
    memo, zero shuffles."""
    from batch_processing_etl_orchestration_spark.functions.bpe import (
        bpe_encode_ids,
        load_merges_sf10,
    )

    d = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % _BPE_SF10_SAMPLE_MOD == 0
    )
    return bpe_encode_ids(d, merges=load_merges_sf10())


# ---------------------------------------------------------------------------
# Model-based quality filtering (r12): the classifier leg of the quality
# ladder. q_quality_filter/q_unigram_logprob_quality are heuristic and
# self-supervised; production pipelines (CCNet, the GPT-3 data work)
# additionally score every document with a cheap linear classifier
# trained to separate a trusted reference corpus from the raw pool.
# Both queries below are closed-form (counting + log), so the full
# estimator — not a converged approximation — is oracle-checked.
# ---------------------------------------------------------------------------



@register(
    "q_nb_quality_classifier",
    oracle=f"""
    WITH labeled AS (
      SELECT doc_id, text, (lang = 'en') AS is_pos FROM documents
    ),
    words AS (
      SELECT doc_id, is_pos, unnest(string_split(text, ' ')) AS word
      FROM labeled
    ),
    head AS (
      SELECT word FROM (
        SELECT word, COUNT(*) AS df
        FROM (SELECT unnest(list_distinct(string_split(text, ' ')))
                AS word FROM labeled)
        GROUP BY 1
      ) ORDER BY df DESC, word LIMIT {_NB_HEAD_K}
    ),
    feats AS (
      SELECT w.doc_id, w.is_pos,
             CASE WHEN h.word IS NOT NULL THEN 'w:' || w.word
                  ELSE 'b:' || CAST((ascii(substr(w.word, 1, 1)) * 961
                       + ascii(substr(w.word, 2, 1)) * 31
                       + length(w.word)) % {_NB_TAIL_B} AS VARCHAR)
             END AS feat
      FROM words w LEFT JOIN head h ON h.word = w.word
    ),
    freq AS (
      SELECT feat,
             CAST(COUNT(*) FILTER (WHERE is_pos) AS BIGINT) AS wc_pos,
             CAST(COUNT(*) FILTER (WHERE NOT is_pos) AS BIGINT) AS wc_neg
      FROM feats GROUP BY 1
    ),
    consts AS (
      SELECT CAST(SUM(wc_pos) AS BIGINT) AS n_pos,
             CAST(SUM(wc_neg) AS BIGINT) AS n_neg
      FROM freq
    ),
    weights AS (
      SELECT f.feat,
             CAST(ROUND(ln(CAST(f.wc_pos + 1 AS DOUBLE)
                           / CAST(c.n_pos + {_NB_HEAD_K + _NB_TAIL_B}
                                  AS DOUBLE)) * 1000000)
                  AS BIGINT)
             - CAST(ROUND(ln(CAST(f.wc_neg + 1 AS DOUBLE)
                             / CAST(c.n_neg + {_NB_HEAD_K + _NB_TAIL_B}
                                    AS DOUBLE)) * 1000000)
                    AS BIGINT) AS scaled_lo
      FROM freq f CROSS JOIN consts c
    ),
    prior AS (
      SELECT CAST(ROUND(ln(
               CAST(COUNT(*) FILTER (WHERE is_pos) AS DOUBLE)
               / CAST(COUNT(*) FILTER (WHERE NOT is_pos) AS DOUBLE))
               * 1000000) AS BIGINT) AS scaled_prior
      FROM labeled
    )
    SELECT w.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           (CAST(SUM(wt.scaled_lo) AS BIGINT) + MIN(p.scaled_prior))
             / 1000000.0 AS log_odds,
           (CAST(SUM(wt.scaled_lo) AS BIGINT) + MIN(p.scaled_prior)) > 0
             AS pred_pos
    FROM feats w
    JOIN weights wt ON wt.feat = w.feat
    CROSS JOIN prior p
    GROUP BY 1
    """,
    tags=("text", "quality", "classifier"),
)
def q_nb_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive-Bayes quality classifier with a CONSTANT-
    BOUNDED feature space, trained and applied in one pass: the model's
    features are the top-K (_NB_HEAD_K=16) words by document frequency
    (kept exact) plus B (_NB_TAIL_B=64) hashed buckets that absorb the
    entire vocabulary tail — so the weight table is ≤ K+B rows at ANY
    corpus size. Per-feature log-odds come from Laplace-smoothed class
    counts over the fixed K+B feature space (reference class =
    lang='en', the trusted-corpus stand-in; pool class = everything
    else); per-document score = Σ log-odds + class prior; keep
    decision = score > 0. This is the classifier leg of a production
    quality ladder (CCNet / GPT-3-style reference-vs-pool filtering)
    with the standard production trick — a capped vocabulary with
    feature hashing for the tail — applied: Zipf puts the predictive
    mass in the head, and the tail's pooled log-odds approach the
    smoothing prior anyway. NB's MLE is closed-form counting, so the
    EXACT capped estimator is oracle-checked — a wrong smoothing
    constant, a swapped class, a missing prior, or a boundary-tie
    difference in the head selection flips the hash (head ties break
    df DESC, word ASC: total order, both engines). Per-feature
    log-odds round to 6dp scaled longs before the per-doc sum (the
    repo's standard exact-fold trick, q_unigram_logprob_quality).

    VERDICT r12 #1: the previous revision broadcast a weight table
    that grew with the corpus vocabulary — measured 15.47× cold at the
    sf10→sf100 decade (BENCH_SF10.md §r12-selection), the repo's one
    flagged scale-killer. This revision bounds it: the head is a
    TakeOrderedAndProject over the df aggregate (K constant → per-
    partition top-K, never a global sort), the tail reuses
    q_dsir_importance_weights' portable bucket hash, and the smoothing
    denominator is the constant K+B, keeping the estimator closed-form
    over the fixed feature space.

    Honesty note: this fixture's generator draws every language from
    the same vocabulary, so class separation is sampling noise — the
    attestation pins the ESTIMATOR, not corpus separability (same
    spirit as the BPE saturation note, plans/northstar.py §BPE).

    Execution shape (r13, measured): training COLLECTS the constant-
    size model at call time (_nb_train_capped — head words, ≤ K+B
    weight rows, one prior long; every collect small-by-construction)
    and scoring re-injects it as literals (nb_score_frozen). A fully
    lazy self-referencing plan — head TakeOrdered feeding feats
    feeding freq feeding weights feeding the scoring join — evaluates
    the explode+distinct subtree once per branch (~6 corpus scans;
    measured 172 s at sf10 vs 7.5 s for the r12 shape), so the
    train-once/score-frozen split is the scalable form: ~3 exploded
    scans total (df-distinct agg, feature-count agg, scoring scan),
    each exactly once, every shuffle linear and uniform. The weight
    broadcast is ≤ K+B rows at any corpus size; df-ranked head (not
    tf-ranked) so the adversarial mega-document cannot promote its
    own words into the exact head."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    head_words, weight_rows, prior6 = _nb_train_capped(spark, d)
    return nb_score_frozen(
        spark, d.select("doc_id", "text"), head_words, weight_rows, prior6
    )


@register(
    "q_dsir_importance_weights",
    oracle="""
    WITH words AS (
      SELECT doc_id, (lang = 'en') AS is_tgt,
             unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    feats AS (
      SELECT doc_id, is_tgt,
             (ascii(substr(word, 1, 1)) * 961
              + ascii(substr(word, 2, 1)) * 31
              + length(word)) % 64 AS bucket
      FROM words
    ),
    counts AS (
      SELECT bucket,
             CAST(COUNT(*) AS BIGINT) AS c_raw,
             CAST(COUNT(*) FILTER (WHERE is_tgt) AS BIGINT) AS c_tgt
      FROM feats GROUP BY 1
    ),
    totals AS (
      SELECT CAST(SUM(c_raw) AS BIGINT) AS n_raw,
             CAST(SUM(c_tgt) AS BIGINT) AS n_tgt
      FROM counts
    ),
    ratios AS (
      SELECT c.bucket,
             CAST(ROUND(ln(CAST(c.c_tgt + 1 AS DOUBLE)
                           / CAST(t.n_tgt + 64 AS DOUBLE)) * 1000000)
                  AS BIGINT)
             - CAST(ROUND(ln(CAST(c.c_raw + 1 AS DOUBLE)
                             / CAST(t.n_raw + 64 AS DOUBLE)) * 1000000)
                    AS BIGINT) AS scaled_lr
      FROM counts c CROSS JOIN totals t
    ),
    per_doc AS (
      SELECT f.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(r.scaled_lr) AS BIGINT) AS scaled_lw
      FROM feats f JOIN ratios r USING (bucket)
      GROUP BY 1
    ),
    shortlist AS (
      SELECT doc_id FROM per_doc ORDER BY scaled_lw DESC, doc_id LIMIT 100
    )
    SELECT p.doc_id, p.n_tokens,
           p.scaled_lw / 1000000.0 AS log_weight,
           p.doc_id IN (SELECT doc_id FROM shortlist) AS resampled
    FROM per_doc p
    """,
    tags=("text", "quality", "sampling"),
)
def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): hashed-n-gram
    importance weights log p_target(features)/p_raw(features), where
    both distributions live on a CONSTANT-width table of hashed
    feature buckets (B=64 here), then a top-N resampling shortlist.
    Target = lang='en' documents (the trusted-domain stand-in); raw =
    the whole pool, target included, as in the paper. Per-bucket
    smoothed log-ratios round to 6dp scaled longs so the per-doc sum
    is an exact integer fold; the shortlist breaks weight ties on
    doc_id, making membership deterministic.

    The bucket hash is a portable character polynomial (first two
    code points × {961,31} + word length, mod 64) so DuckDB computes
    bit-identical buckets; a production run swaps in xxhash64 — the
    estimator is hash-agnostic, only collision statistics change.

    Scale: THIS is the declared 100 TB path for model-based selection
    (vs q_nb_quality_classifier's vocab-sized weights): counts/ratios
    are B rows regardless of corpus size → broadcast is always valid;
    one uniform shuffle per aggregation (bucket keys, doc keys); the
    shortlist is TakeOrderedAndProject (per-partition top-N, never a
    global sort); the final membership flag is a 100-row broadcast
    left join. DSIR's actual sampling is ∝ exp(log_weight) with
    Gumbel noise — deterministic top-N is the noise-free limit, kept
    so the oracle can replay selection exactly."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        (F.col("lang") == "en").alias("is_tgt"),
        F.explode(F.split("text", " ")).alias("word"),
    )
    bucket = (
        F.ascii(F.substring("word", 1, 1)) * 961
        + F.ascii(F.substring("word", 2, 1)) * 31
        + F.length("word")
    ) % 64
    feats = words.select("doc_id", "is_tgt", bucket.alias("bucket"))
    # ONE explode pass (r15 optimization): the raw feats frame used to
    # feed the bucket counts AND the per-doc fold, and each of those
    # fed two more consumers — six word-explode subtrees in the one
    # physical plan. Pre-aggregate to (doc, bucket) token counts
    # (map-side combinable, ≤ 64 rows per doc) and checkpoint; every
    # downstream quantity derives from it exactly: c_raw/c_tgt by
    # bucket-summing n, and the per-doc fold by Σ n·scaled_lr =
    # Σ_word scaled_lr (integer products, no rounding).
    pre = (
        feats.groupBy("doc_id", "is_tgt", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=False)
    )
    counts = (
        pre.groupBy("bucket")
        .agg(
            F.sum("n").cast("bigint").alias("c_raw"),
            F.sum(F.when(F.col("is_tgt"), F.col("n")).otherwise(0))
            .cast("bigint")
            .alias("c_tgt"),
        )
        .localCheckpoint(eager=False)  # B rows; feeds totals AND ratios
    )
    totals = counts.agg(
        F.sum("c_raw").cast("bigint").alias("n_raw"),
        F.sum("c_tgt").cast("bigint").alias("n_tgt"),
    )

    def _scaled(cnt: str, n: str):
        return F.round(
            F.log(
                (F.col(cnt) + 1).cast("double")
                / (F.col(n) + 64).cast("double")
            )
            * 1000000
        ).cast("bigint")

    ratios = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (_scaled("c_tgt", "n_tgt") - _scaled("c_raw", "n_raw"))
            .alias("scaled_lr"),
        )
    )
    per_doc = (
        pre.join(F.broadcast(ratios), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("bigint").alias("n_tokens"),
            F.sum(F.col("n") * F.col("scaled_lr"))
            .cast("bigint")
            .alias("scaled_lw"),
        )
        .localCheckpoint(eager=False)  # feeds the shortlist AND the join
    )
    shortlist = (
        per_doc.orderBy(F.desc("scaled_lw"), "doc_id")
        .limit(100)
        .select("doc_id", F.lit(True).alias("_in_shortlist"))
    )
    return (
        per_doc.join(F.broadcast(shortlist), "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("scaled_lw") / F.lit(1000000.0)).alias("log_weight"),
            F.coalesce(F.col("_in_shortlist"), F.lit(False)).alias(
                "resampled"
            ),
        )
    )


def _nb_bucket_expr(col: str = "word"):
    """The portable tail-bucket hash (first two code points × {961,31}
    + length, mod _NB_TAIL_B) — ONE Python copy shared by the trainer,
    the frozen scorer, and the adversarial report so the estimator and
    its priced quantities can never desynchronize (review r13)."""
    return (
        F.ascii(F.substring(col, 1, 1)) * 961
        + F.ascii(F.substring(col, 2, 1)) * 31
        + F.length(col)
    ) % _NB_TAIL_B


def _nb_head_df(docs: DataFrame) -> DataFrame:
    """Top-K exact head vocabulary by DOCUMENT frequency with a total
    tiebreak (df DESC, word ASC) — compiles to TakeOrderedAndProject
    over the df aggregate (per-partition top-K, never a global sort;
    plan-asserted in tests/test_plans.py). df-ranked, not tf-ranked,
    so a mega-document cannot promote its own words into the head.

    df computed as a PLAIN COUNT over per-doc array_distinct tokens —
    exactly COUNT(DISTINCT doc_id), but the dedup happens row-local
    (JVM, no shuffle) and the count is map-side combinable, instead of
    a (word, doc_id)-pair distinct exchange (measured ~70 s of the
    88 s sf10 cold before this form)."""
    return (
        docs.select(
            F.explode(F.array_distinct(F.split("text", " "))).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), "word")
        .limit(_NB_HEAD_K)
        .select("word")
    )


def _nb_train_capped(spark: SparkSession, docs: DataFrame):
    """Train the capped NB model ONCE on a frozen snapshot and collect
    it: (head_words, weight_rows, prior6). The expressions mirror
    q_nb_quality_classifier's training stage term for term — the
    streaming query's oracle IS the batch scorer's SQL, so any drift
    between this trainer and the batch estimator hash-fails. The
    collected model is tiny by construction: ≤ K+B weight rows, K head
    words, one prior long."""
    labeled = docs.select(
        "doc_id", "text", (F.col("lang") == "en").alias("is_pos")
    )
    words = labeled.select(
        "doc_id", "is_pos", F.explode(F.split("text", " ")).alias("word")
    )
    head_words = sorted(
        r["word"] for r in _nb_head_df(labeled).collect()
    )
    bucket = _nb_bucket_expr()
    feats = words.select(
        "doc_id",
        "is_pos",
        F.when(
            F.col("word").isin(head_words),
            F.concat(F.lit("w:"), F.col("word")),
        )
        .otherwise(F.concat(F.lit("b:"), bucket.cast("string")))
        .alias("feat"),
    )
    freq = feats.groupBy("feat").agg(
        F.sum(F.when(F.col("is_pos"), 1).otherwise(0))
        .cast("bigint")
        .alias("wc_pos"),
        F.sum(F.when(~F.col("is_pos"), 1).otherwise(0))
        .cast("bigint")
        .alias("wc_neg"),
    )
    consts = freq.agg(
        F.sum("wc_pos").cast("bigint").alias("n_pos"),
        F.sum("wc_neg").cast("bigint").alias("n_neg"),
    )
    n_features = _NB_HEAD_K + _NB_TAIL_B

    def _scaled_ll(cnt: str, n: str):
        return F.round(
            F.log(
                (F.col(cnt) + 1).cast("double")
                / (F.col(n) + n_features).cast("double")
            )
            * 1000000
        ).cast("bigint")

    weight_rows = [
        (r["feat"], int(r["scaled_lo"]))
        for r in (
            freq.crossJoin(F.broadcast(consts))
            .select(
                "feat",
                (
                    _scaled_ll("wc_pos", "n_pos")
                    - _scaled_ll("wc_neg", "n_neg")
                ).alias("scaled_lo"),
            )
            .collect()  # ≤ K+B rows
        )
    ]
    prior6 = int(
        labeled.agg(
            F.round(
                F.log(
                    F.sum(F.when(F.col("is_pos"), 1).otherwise(0)).cast(
                        "double"
                    )
                    / F.sum(F.when(~F.col("is_pos"), 1).otherwise(0)).cast(
                        "double"
                    )
                )
                * 1000000
            )
            .cast("bigint")
            .alias("p")
        ).first()["p"]
    )
    return head_words, weight_rows, prior6


@register(
    "q_stream_quality_filter",
    # the drained per-doc keep/drop decisions must equal the BATCH
    # scorer's exactly — same SQL object as q_nb_quality_classifier
    oracle=_REGISTRY["q_nb_quality_classifier"].oracle,
    tags=("streaming", "text", "quality", "classifier", "incremental"),
)
def q_stream_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming model-based quality gate (VERDICT r12 #3): a
    production pipeline trains the quality classifier ONCE on a frozen
    trusted snapshot, then scores documents AS THEY LAND. Here the
    frozen snapshot is the fixture corpus; the capped NB model
    (top-K exact head + hashed tail, constant ≤ K+B weight rows) is
    trained once and collected, then documents arrive as 4 ordered
    micro-batches (maxFilesPerTrigger=1 over a doc_id-ranged copy) and
    each batch is scored with the frozen broadcast weights — per-batch
    cost is the batch's own explode + a broadcast join + one grouped
    fold, tracking ARRIVAL RATE, not corpus size.

    Exactly-once: each batch's scores land via write-to-_tmp + atomic
    rename to batch_<id>; the directory IS the replay marker, so a
    redelivered batch (checkpoint loss, foreachBatch retry) skips
    without duplicating — pinned by
    tests/test_stream_quality.py::test_replayed_batch_is_skipped.
    After the availableNow drain the union of batch outputs must be
    row-for-row hash-equal to the batch estimator over the same
    corpus (the oracle IS q_nb_quality_classifier's SQL): scoring
    with frozen weights is embarrassingly batch-decomposable, so no
    micro-batching of arrivals can change any score.

    Scale: the model broadcast is constant-bounded (K+B rows); the
    sink appends one directory per batch (at 100 TB: one
    transactional table append per batch, same algebra); training
    cost is paid once per model refresh, never per batch."""
    import os
    import shutil

    from batch_processing_etl_orchestration_spark.tables import (
        build_once,
        fixture_cache_dir,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    src = build_once(
        sf_dir,
        "documents.parquet",
        "stream_qf_src",
        lambda p: docs.select("doc_id", "text")
        .repartitionByRange(4, "doc_id")
        .write.mode("overwrite")
        .parquet(p),
    )
    run = fixture_cache_dir(sf_dir, "documents.parquet", "stream_qf_run")
    out, ckpt = os.path.join(run, "scores"), os.path.join(run, "ckpt")
    shutil.rmtree(run, ignore_errors=True)  # the scenario mutates state
    os.makedirs(out, exist_ok=True)

    head_words, weight_rows, prior6 = _nb_train_capped(spark, docs)
    score = nb_stream_sink(out, head_words, weight_rows, prior6)
    schema = artifact_schema(spark, src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(score)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(os.path.join(out, "batch_*")).select(
        "doc_id", "n_tokens", "log_odds", "pred_pos"
    )


def nb_stream_sink(
    out: str, head_words: list, weight_rows: list, prior6: int
):
    """foreachBatch sink for the streaming quality gate: scores the
    batch with the frozen model and lands it via write-to-_tmp +
    atomic rename to batch_<id>. The directory IS the replay marker —
    a redelivered batch id returns without writing (pinned by
    tests/test_stream_quality.py)."""
    import os
    import uuid as _uuid

    def score(batch_df: DataFrame, batch_id: int) -> None:
        final = os.path.join(out, f"batch_{batch_id}")
        if os.path.isdir(final):
            return  # replayed batch: already committed atomically
        s = batch_df.sparkSession
        scored = nb_score_frozen(
            s, batch_df, head_words, weight_rows, prior6
        )
        tmp = os.path.join(out, f"_tmp-{_uuid.uuid4().hex[:8]}")
        scored.write.mode("errorifexists").parquet(tmp)
        os.rename(tmp, final)  # atomic publish; the marker IS the data

    return score


def nb_score_frozen(
    spark: SparkSession,
    batch: DataFrame,
    head_words: list,
    weight_rows: list,
    prior6: int,
) -> DataFrame:
    """Score a document batch with a FROZEN capped-NB model: the same
    expression tree as q_nb_quality_classifier's scoring stage, with
    the weight table re-injected as exact scaled-long literals (so
    the doubles in log_odds match the batch estimator bit for bit).
    A feature unseen at training time finds no weight row and drops
    out of the sum (contributes 0) — with the hashed tail absorbing
    the whole vocabulary this can only happen to an empty bucket;
    a production gate would assign such features the smoothing
    prior."""
    bucket = _nb_bucket_expr()
    feats = batch.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).select(
        "doc_id",
        F.when(
            F.col("word").isin(list(head_words)),
            F.concat(F.lit("w:"), F.col("word")),
        )
        .otherwise(F.concat(F.lit("b:"), bucket.cast("string")))
        .alias("feat"),
    )
    from batch_processing_etl_orchestration_spark.tables import local_rows_df

    w_df = local_rows_df(
        spark, sorted(weight_rows), "feat STRING, scaled_lo BIGINT"
    )
    return (
        feats.join(F.broadcast(w_df), "feat")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            (
                (F.sum("scaled_lo").cast("bigint") + F.lit(int(prior6)))
                / F.lit(1000000.0)
            ).alias("log_odds"),
            (
                (F.sum("scaled_lo").cast("bigint") + F.lit(int(prior6)))
                > 0
            ).alias("pred_pos"),
        )
    )


def index_stream_sink(path: str):
    """foreachBatch sink for streaming index maintenance: each
    micro-batch lands as a PostingsIndex SEGMENT named by its batch id
    — segment-name = batch id IS the exactly-once marker. Replay
    handling, in order of where the redelivery can strike:

    1. the segment dir already exists in the live generation, OR a
       compaction folded it (the cumulative committed_segments
       ledger in the folded manifest remembers every folded name —
       ADVICE r14: without it, a batch tombstoned AND compacted away
       before the checkpoint advanced would be re-landed on replay,
       resurrecting the deleted docs) → skip before any Spark work;
    2. a replay of a folded batch whose ids are STILL live → the
       landing protocol's id-disjointness check raises "already
       live" → treated as committed only when EVERY id is live;
    3. the rename itself loses (another replay landed it mid-flight)
       or the ledger check raises FileExistsError mid-race → OSError
       family with segment_committed(name) True → committed, skip.

    Anything else propagates: a real failure must fail the stream,
    not be swallowed as a replay."""
    import os

    from batch_processing_etl_orchestration_spark.operators.retrieval import (
        PostingsIndex,
    )

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        name = f"batch-{batch_id}"
        idx = PostingsIndex(batch_df.sparkSession, path)
        if idx.segment_committed(name):
            return  # replayed batch: already committed (live or folded)
        try:
            idx.add_segment(batch_df.select("doc_id", "text"), name)
        except ValueError as e:
            if "already live" not in str(e):
                raise  # tombstoned-id / duplicate-id: a REAL conflict
            # "already live" is only a committed replay when EVERY
            # batch id is live (the fold-then-redeliver case). A
            # partial overlap — an at-least-once source re-emitting
            # one old doc alongside fresh ones — must fail loudly, or
            # the fresh docs silently vanish (review r14). The two
            # verification jobs run only on this exception path.
            ids = batch_df.select("doc_id").distinct()
            n_live = ids.join(
                idx._live_ids(idx._gen()), "doc_id", "left_semi"
            ).count()
            if n_live != ids.count():
                raise
        except OSError:
            # benign ONLY as the committed-collision signature: a
            # concurrent replay landed the segment first, or the
            # ledger check caught a folded name mid-race. Any other
            # OSError (disk full, permissions) must fail the stream —
            # swallowing it would advance the checkpoint past a batch
            # that never landed (review r14).
            if idx.segment_committed(name):
                return
            raise
        # Fold when fan-out hits the measured threshold (VERDICT r14
        # #4, SCALE.md §segment fan-out) — the ingest path owns its
        # merge policy. OUTSIDE the try (review r15): the just-landed
        # segment makes segment_committed(name) true, so a real fold
        # failure (disk full, permissions) caught by the replay
        # handler above would be silently swallowed and the checkpoint
        # would advance past a compaction that never happened.
        idx.maybe_compact()

    return ingest


@register(
    "q_stream_index_maintain",
    # post-drain serving must equal a one-shot batch build over the
    # same corpus — the oracle IS q_bm25_topk's full-corpus SQL
    oracle=_REGISTRY["q_bm25_topk"].oracle,
    tags=("streaming", "retrieval", "incremental"),
)
def q_stream_index_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming index maintenance (VERDICT r13 #3): a platform
    ingests documents continuously, so the postings index must grow by
    MICRO-BATCH, not rebuild. Documents arrive as 4 ordered
    micro-batches (maxFilesPerTrigger=1 over a doc_id-ranged copy)
    draining through foreachBatch → PostingsIndex.add_segment with
    segment-name = batch id — the atomic-rename landing doubles as the
    exactly-once replay marker (the q_stream_quality_filter pattern,
    applied to index state instead of score files; redelivery no-ops
    pinned in tests/test_stream_index.py, mid-drain tombstones
    honored there too).

    After the availableNow drain, BM25 top-15 over the segmented
    index must be hash-equal to a ONE-SHOT batch build over the same
    corpus (the oracle IS q_bm25_topk's SQL): segment-union df/tf/
    doclen statistics are indistinguishable from a rebuild, so no
    micro-batching of arrivals can change any score.

    Scale: per-batch cost is the batch's own tokenize/cluster write
    plus one bounded disjointness probe — tracks ARRIVAL RATE, not
    corpus size; compact_segments (exercised in tests) is the merge
    policy when segment fan-out grows. The base index starts EMPTY
    (the bootstrap a brand-new ingest pipeline faces) — width and
    meta freeze at build, segments carry all the data."""
    import shutil

    from batch_processing_etl_orchestration_spark.operators.retrieval import (
        PostingsIndex,
        bm25_topk,
    )

    from batch_processing_etl_orchestration_spark.tables import (
        build_once,
        empty_df,
        fixture_cache_dir,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = build_once(
        sf_dir,
        "documents.parquet",
        "stream_idx_src",
        lambda p: docs.repartitionByRange(4, "doc_id")
        .write.mode("overwrite")
        .parquet(p),
    )
    run = fixture_cache_dir(sf_dir, "documents.parquet", "stream_idx_run")
    shutil.rmtree(run, ignore_errors=True)  # the scenario mutates state
    path = os.path.join(run, "index")
    ckpt = os.path.join(run, "ckpt")
    PostingsIndex.build(
        spark,
        empty_df(spark, "doc_id BIGINT, text STRING"),
        path,
    )
    schema = artifact_schema(spark, src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(index_stream_sink(path))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    idx = PostingsIndex(spark, path)
    return bm25_topk(idx.postings(), idx.doclens(), _BM25_TERMS, k=15)


# the v2 assembly's gopher feature CTE (the q_gopher_quality_rules
# feature block, plus doc_id so the keep set can join back)
_GOPHER_FEATURES_SQL = (
    "SELECT doc_id,\n"
    "       len(string_split(text, ' ')) AS n_words,\n"
    "       len(replace(text, ' ', '')) AS chars,\n"
    "       len(text) - len(replace(text, '#', '')) AS hashes,\n"
    "       CAST((len(text) - len(replace(text, '...', ''))) / 3\n"
    "            AS BIGINT) AS ells,\n"
    "       len(string_split(text, chr(10))) AS n_lines,\n"
    "       len(list_filter(string_split(text, chr(10)),\n"
    "           l -> l LIKE '- %' OR l LIKE '* %')) AS bullet_lines,\n"
    "       len(list_filter(string_split(text, chr(10)),\n"
    "           l -> l LIKE '%...')) AS ell_lines,\n"
    "       len(list_filter(string_split(text, ' '),\n"
    "           w -> regexp_matches(w, '[A-Za-z]'))) AS alpha_words,\n"
    "       ("
    + " + ".join(
        "(CASE WHEN list_contains(string_split(text, ' '), "
        f"'{s}') THEN 1 ELSE 0 END)"
        for s in _STOPWORDS["en"]
    )
    + ") AS stop_hits\n"
    "FROM documents"
)


@register(
    "q_corpus_assembly_v2",
    oracle=_SQL_SHINGLES_8.replace("WITH ", "WITH RECURSIVE ", 1)
    + f""",
    train AS (
      SELECT doc_id, text, lang, n_chars FROM documents WHERE doc_id % 20 <> 0
    ),
    deduped AS (
      SELECT doc_id, text, lang, n_chars FROM (
        SELECT t.*, row_number() OVER (PARTITION BY md5(text)
                                       ORDER BY doc_id) AS rk
        FROM train t
      ) WHERE rk = 1
    ),
    eval_g AS (
      SELECT DISTINCT shingle FROM shingles8 WHERE doc_id % 20 = 0
    ),
    contaminated AS (
      SELECT DISTINCT s.doc_id
      FROM shingles8 s JOIN eval_g e ON s.shingle = e.shingle
    ),
    clean AS (
      SELECT d.* FROM deduped d
      WHERE d.doc_id NOT IN (SELECT doc_id FROM contaminated)
        AND d.n_chars BETWEEN 100 AND 520
    ),
    gof AS ({_GOPHER_FEATURES_SQL}),
    gokeep AS (SELECT doc_id FROM gof WHERE {_GOPHER_KEEP_SQL}),
    nbkeep AS (
      SELECT doc_id
      FROM ({{NB_ORACLE}})
      WHERE pred_pos
    ),
    gated AS (
      SELECT c.* FROM clean c
      JOIN gokeep USING (doc_id)
      JOIN nbkeep USING (doc_id)
    ),
    counts AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_l FROM gated GROUP BY 1
    ),
    mn AS (SELECT MIN(n_l) AS n_min FROM counts),
    kept AS (
      SELECT c.doc_id, c.text
      FROM gated c JOIN counts ct ON ct.lang = c.lang, mn
      WHERE CAST('0x' || substring(md5(c.text), 1, 8) AS BIGINT) % 1000000
            < CAST(FLOOR(1000000 * SQRT(CAST(mn.n_min AS DOUBLE)
                                        / CAST(ct.n_l AS DOUBLE))) AS BIGINT)
    ),
    toks AS (
      SELECT doc_id,
             doc_id % 8 AS packer,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             row_number() OVER (PARTITION BY doc_id % 8
                                ORDER BY doc_id) AS rn
      FROM kept
    ),
    walk(packer, rn, doc_id, n_tokens, bin_idx, bin_fill) AS (
      SELECT packer, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
      FROM toks WHERE rn = 1
      UNION ALL
      SELECT t.packer, t.rn, t.doc_id, t.n_tokens,
             CASE WHEN w.bin_fill + t.n_tokens > 512
                  THEN w.bin_idx + 1 ELSE w.bin_idx END,
             CASE WHEN w.bin_fill + t.n_tokens > 512
                  THEN t.n_tokens ELSE w.bin_fill + t.n_tokens END
      FROM walk w
      JOIN toks t ON t.packer = w.packer AND t.rn = w.rn + 1
    )
    SELECT packer, bin_idx,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc_id
    FROM walk GROUP BY 1, 2
    """.replace(
        "{NB_ORACLE}", _REGISTRY["q_nb_quality_classifier"].oracle
    ),
    tags=("text", "pipeline", "assembly", "quality", "grouped-map"),
)
def q_corpus_assembly_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus assembly with the r13 QUALITY GATES wired into the DAG
    (VERDICT r13 #6) — the stages a production pipeline inserts
    between dedup and mixing:

    1. exact dedup — lowest doc_id per md5(text) group;
    2. decontamination — drop survivors sharing any word-8-gram with
       the eval split (doc_id % 20 == 0);
    3. length filter — n_chars in [100, 520];
    4. GOPHER RULE GATE — the full heuristic keep conjunction
       (word count, mean word length, symbol/bullet/ellipsis ratios,
       alpha-word share, stopword hits) from q_gopher_quality_rules;
    5. NB QUALITY GATE — the capped top-K + hashed-tail classifier
       (q_nb_quality_classifier) trained ONCE on the frozen fixture
       snapshot, survivors kept on pred_pos (measured at sf0.01: the
       two gates jointly pass 95 of 385 length-clean docs, keeping
       every language represented so the mixing stage still binds);
    6. temperature mixing (τ = 0.5) by language;
    7. next-fit packing into 512-token bins per packer group.

    The composed oracle (which embeds the FULL NB training SQL as a
    sub-select) mirrors all seven stages, so the final bins hash-match
    only if every stage and every stage BOUNDARY is right — including
    both new gate boundaries. q_corpus_assembly (v1) remains the
    gate-free baseline; the pair shows the gates' corpus effect
    in-query.

    Scale: the gates add one feature projection (JVM higher-order
    functions, no shuffle) and one broadcast-scored pass with the
    constant-bounded (≤ K+B rows) weight table — both linear scans;
    training is paid once per model refresh, never per assembly run."""
    from batch_processing_etl_orchestration_spark.operators.dedup import (
        decontaminate,
    )

    d = load_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 20 == 0
    train = d.where(~is_eval)
    wdup = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    # Stage-boundary localCheckpoints (r15 optimization, same
    # rationale as q_corpus_assembly): every gate consumes its input
    # twice (feature/keep-set side + the semi-join side), so without
    # truncation the subtree duplication COMPOUNDS per stage — the
    # composed initial plan carried 72 scans / 27 explodes / 55
    # exchanges of redundant recomputation. Each stage materializes
    # once; the attested stage semantics and the composed oracle are
    # untouched.
    deduped = _stage_checkpoint(
        train.withColumn("_rk", F.row_number().over(wdup))
        .where(F.col("_rk") == 1)
        .drop("_rk"),
        eager=True,
    )
    contaminated = decontaminate(
        deduped, d.where(is_eval), n=8
    ).select("doc_id")
    clean = _stage_checkpoint(
        deduped.join(contaminated, "doc_id", "left_anti")
        .where(F.col("n_chars").between(100, 520)),
        eager=True,
    )
    # stage 4: Gopher keep conjunction (features over the survivor set
    # — per-doc predicates, so gating survivors equals gating the
    # corpus then intersecting, which is what the oracle does)
    gokeep = (
        _gopher_features(clean, keep=("doc_id",))
        .where(gopher_rules()["gopher_keep"])
        .select("doc_id")
    )
    gated = _stage_checkpoint(
        clean.join(gokeep, "doc_id", "left_semi"), eager=False
    )
    # stage 5: frozen NB quality gate (train once on the full snapshot,
    # score survivors with broadcast literals — q_stream_quality_filter's
    # serving kernel)
    head_words, weight_rows, prior6 = _nb_train_capped(spark, d)
    nbkeep = (
        nb_score_frozen(spark, gated, head_words, weight_rows, prior6)
        .where(F.col("pred_pos"))
        .select("doc_id")
    )
    gated = _stage_checkpoint(
        gated.join(nbkeep, "doc_id", "left_semi"), eager=False
    )
    counts = _stage_checkpoint(
        gated.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l")),
        eager=True,
    )
    n_min = counts.agg(F.min("n_l").alias("n_min"))
    thresholds = counts.crossJoin(F.broadcast(n_min)).select(
        "lang",
        F.floor(
            1000000
            * F.sqrt(
                F.col("n_min").cast("double") / F.col("n_l").cast("double")
            )
        )
        .cast("bigint")
        .alias("_thr"),
    )
    bucket = (
        F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("bigint")
        % 1000000
    )
    kept = (
        gated.join(F.broadcast(thresholds), "lang")
        .where(bucket < F.col("_thr"))
        .select(
            "doc_id",
            (F.col("doc_id") % _N_PACKERS).alias("packer"),
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        )
    )
    return _next_fit_bins(kept)
