"""Relevance ranking and time-series plans.

Extends the engine past the reference's analytics surface with the
two remaining staples of a training-data/serving pipeline:

* **Relevance ranking** — TF-IDF and BM25 over the ``documents``
  corpus.  The reference's only scoring is the duplicate-name LIKE
  scan (``sql.py:1602-1624``); these generalize it to the standard
  IR-scoring operators a corpus pipeline needs (query-document
  ranking, per-document salient terms).
* **Time-series repair/resample** — calendar gap-fill with
  last-observation-carried-forward, and OHLC bar resampling.  The
  reference stores per-block time series (``TxStats``,
  ``sql.py:238-312``) and a trigger-kept rate history
  (``omni_db_triggers.psql:15-26``) but recomputes presentation
  series ad hoc; these make the resample/repair step a named
  operator.
* **Anomaly flagging** — per-group z-score outliers, the batch form
  of the reference's "suspicious property" flagging (D9).

Scale notes (100 TB): every plan here is one or two key-partitioned
shuffles over codegen expressions — no UDFs, no driver collects.
TF-IDF/BM25 shuffle on (doc, term) then broadcast the per-term
document-frequency dim (vocabulary ≪ corpus); gap-fill explodes a
bounded per-key calendar (days in the key's own span) and runs one
per-key ordered window; z-scores reduce each group to three integer
moments (exact, overflow-checked) and broadcast them back.

Float portability: scores that involve ``ln`` are rounded to 6 dp in
both engines (JVM ``Math.log`` and libm may differ in the last ulp);
everything else is integer-exact (cents trick) or IEEE-exact
(division, sqrt), so the oracle hash-compares bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from omniengine_spark.plans.registry import query
from omniengine_spark.sources import load_table

_TOKEN_SPLIT = r"\s+"

# Fixed query for BM25 — terms present in the corpus vocabulary.
_BM25_QUERY = ("join", "vector", "spark")
_BM25_K1 = 1.2
_BM25_B = 0.75


def _tokens(col):
    return F.split(F.trim(F.lower(col)), _TOKEN_SPLIT)


# --------------------------------------------------------------------
# TF-IDF: top-3 salient terms per document.
#
# tf(d,t) = term count in doc; idf(t) = ln(N / df(t)); score rounded
# to 6 dp before ranking so both engines rank identically.  The df
# dim is |vocabulary| rows — broadcast side of the join at any scale.
# --------------------------------------------------------------------
@query(
    "text_tfidf_topk",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ), df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1
    ), n AS (
      SELECT COUNT(*) AS n FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term, tf.tf,
             ROUND(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    ), ranked AS (
      SELECT doc_id, term, tf, tfidf,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, term ASC
             ) AS rank
      FROM scored
    )
    SELECT doc_id, CAST(rank AS INTEGER) AS rank, term,
           CAST(tf AS BIGINT) AS tf, tfidf
    FROM ranked WHERE rank <= 3
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()  # one scalar; the corpus row count
    toks = docs.select(
        "doc_id", F.explode(_tokens(F.col("text"))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df = toks.groupBy("term").agg(
        F.count_distinct("doc_id").alias("df")
    )
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id",
        "term",
        "tf",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "doc_id",
            F.col("rank").cast("int").alias("rank"),
            "term",
            F.col("tf").cast("long").alias("tf"),
            "tfidf",
        )
    )


# --------------------------------------------------------------------
# BM25: rank the corpus against a fixed query.
#
# idf(t)   = ln((N - df + 0.5) / (df + 0.5) + 1)   (Lucene form —
#            always positive even for df > N/2, which matters in this
#            small-vocabulary corpus)
# score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))
#
# avgdl is an exact integer ratio; the only libm call is ln (rounded).
# Top-25 documents, deterministic tie-break on doc_id.
# --------------------------------------------------------------------
@query(
    "text_bm25_rank",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
      FROM documents
    ), dl AS (
      SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1
    ), stats AS (
      SELECT COUNT(*) AS n, SUM(dl) AS total_dl FROM dl
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks
      WHERE term IN ('join', 'vector', 'spark')
      GROUP BY 1, 2
    ), df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1
    ), parts AS (
      SELECT tf.doc_id,
             ROUND(
               ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * tf.tf * ({_BM25_K1} + 1.0)
               / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                  + {_BM25_B} * dl.dl * stats.n
                    / CAST(stats.total_dl AS DOUBLE))),
               6) AS part
      FROM tf
      JOIN dl USING (doc_id)
      JOIN df USING (term)
      CROSS JOIN stats
    ), scores AS (
      SELECT doc_id, ROUND(SUM(part), 6) AS bm25 FROM parts GROUP BY 1
    )
    SELECT doc_id, bm25 FROM scores
    ORDER BY bm25 DESC, doc_id ASC LIMIT 25
    """,
)
def text_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(_tokens(F.col("text"))).alias("term")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    # corpus stats ride a broadcast one-row frame (the repo's anchor
    # pattern) instead of an eager .first() — an eager collect here
    # would pay a full extra tokenize+aggregate scan before the plan
    # even runs
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    )
    tf = (
        toks.filter(F.col("term").isin(*_BM25_QUERY))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    n_docs = F.col("n_docs").cast("double")
    # dl·n/total_dl keeps the ratio dl/avgdl as one exact-integer
    # product before the single IEEE division.
    norm = (
        F.col("dl").cast("double")
        * n_docs
        / F.col("total_dl").cast("double")
    )
    idf = F.log(
        (n_docs - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    part = F.round(
        idf
        * F.col("tf")
        * (_BM25_K1 + 1.0)
        / (F.col("tf") + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * norm)),
        6,
    )
    scores = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", part.alias("part"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("part"), 6).alias("bm25"))
    )
    return scores.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(25)


# --------------------------------------------------------------------
# Calendar gap-fill with LOCF over per-user daily spend.
#
# Each user's daily series is completed over [min(day), max(day)] of
# that user (sequence + explode — the calendar is bounded by the
# key's own span, so no global cross join), missing days carry the
# last observed value forward.  One shuffle to the (user) key, one
# ordered window.  Reference analog: the per-block TxStats series is
# dense by construction (sql.py:247's loop); a rate/fee series is
# not, and serving it requires exactly this repair.
# --------------------------------------------------------------------
@query(
    "ts_gap_fill_locf",
    oracle="""
    WITH daily AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2
    ), spans AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily
      GROUP BY 1
    ), calendar AS (
      SELECT user_id, u.day AS day
      FROM spans,
           UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS u(day)
    ), joined AS (
      SELECT c.user_id, c.day, d.cents
      FROM calendar c LEFT JOIN daily d
        ON c.user_id = d.user_id AND c.day = d.day
    )
    SELECT user_id, day,
           last_value(cents IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cents_filled,
           cents IS NULL AS is_gap
    FROM joined
    """,
)
def ts_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(
            "user_id", F.date_trunc("day", "ts").alias("day")
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "cents"
            )
        )
    )
    calendar = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    "d0", "d1", F.expr("INTERVAL 1 DAY")
                )
            ).alias("day"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        calendar.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.last("cents", ignorenulls=True)
            .over(w)
            .alias("cents_filled"),
            F.col("cents").isNull().alias("is_gap"),
        )
    )


# --------------------------------------------------------------------
# OHLC bar resampling: hourly open/high/low/close + volume per
# event_type.  Open/close are ordered-first/last with a (ts,
# event_id) composite tie-break, pinned identically in both engines
# via row_number.  One shuffle to the (type, hour) key.
# --------------------------------------------------------------------
@query(
    "ts_ohlc_bars",
    oracle="""
    WITH priced AS (
      SELECT event_type, date_trunc('hour', ts) AS hour, ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    ), ordered AS (
      SELECT *,
             ROW_NUMBER() OVER (
               PARTITION BY event_type, hour
               ORDER BY ts ASC, event_id ASC) AS rn_a,
             ROW_NUMBER() OVER (
               PARTITION BY event_type, hour
               ORDER BY ts DESC, event_id DESC) AS rn_z
      FROM priced
    )
    SELECT event_type, hour,
           MAX(CASE WHEN rn_a = 1 THEN cents END) AS open_cents,
           MAX(cents) AS high_cents,
           MIN(cents) AS low_cents,
           MAX(CASE WHEN rn_z = 1 THEN cents END) AS close_cents,
           CAST(COUNT(*) AS BIGINT) AS n_trades,
           CAST(SUM(cents) AS BIGINT) AS volume_cents
    FROM ordered
    GROUP BY 1, 2
    """,
)
def ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    priced = events.select(
        "event_type",
        F.date_trunc("hour", "ts").alias("hour"),
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w_a = Window.partitionBy("event_type", "hour").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    w_z = Window.partitionBy("event_type", "hour").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        priced.withColumn("rn_a", F.row_number().over(w_a))
        .withColumn("rn_z", F.row_number().over(w_z))
        .groupBy("event_type", "hour")
        .agg(
            F.max(
                F.when(F.col("rn_a") == 1, F.col("cents"))
            ).alias("open_cents"),
            F.max("cents").alias("high_cents"),
            F.min("cents").alias("low_cents"),
            F.max(
                F.when(F.col("rn_z") == 1, F.col("cents"))
            ).alias("close_cents"),
            F.count(F.lit(1)).alias("n_trades"),
            F.sum("cents").alias("volume_cents"),
        )
    )


# --------------------------------------------------------------------
# Per-group z-score anomaly flags — integer-exact moments.
#
# Mean and variance come from Σc and Σc² accumulated as BIGINT cents
# (10 k events × (1e6 cents)² ≈ 1e16 ≪ int64 max), so the only float
# ops are two IEEE-exact divisions and one sqrt — the z-scores are
# bit-identical across engines with no rounding slack needed (we
# still round to 6 dp for display).  Batch generalization of the
# reference's suspicious-property flagging (sql.py:1602-1624).
# --------------------------------------------------------------------
@query(
    "stats_anomaly_zscore",
    oracle="""
    WITH priced AS (
      SELECT event_id, event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    ), moments AS (
      SELECT event_type, COUNT(*) AS n, SUM(cents) AS s1,
             SUM(cents * cents) AS s2
      FROM priced GROUP BY 1
    ), scored AS (
      SELECT p.event_id, p.event_type, p.cents,
             ROUND(
               (p.cents - CAST(m.s1 AS DOUBLE) / m.n)
               / sqrt((CAST(m.s2 AS DOUBLE) / m.n)
                      - (CAST(m.s1 AS DOUBLE) / m.n)
                        * (CAST(m.s1 AS DOUBLE) / m.n)),
               6) AS z
      FROM priced p JOIN moments m USING (event_type)
    )
    SELECT event_id, event_type, cents, z
    FROM scored WHERE abs(z) > 2.5
    """,
)
def stats_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    priced = events.select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    moments = priced.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = F.col("s2").cast("double") / F.col("n") - mean * mean
    z = F.round((F.col("cents") - mean) / F.sqrt(var), 6)
    return (
        priced.join(F.broadcast(moments), "event_type")
        .select("event_id", "event_type", "cents", z.alias("z"))
        .filter(F.abs(F.col("z")) > 2.5)
    )
