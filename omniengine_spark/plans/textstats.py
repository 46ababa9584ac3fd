"""Text-analysis plans over the ``documents`` table.

Training-data-pipeline operators (project north star) generalizing the
reference's only text analytics — duplicate-name LIKE scanning
(reference ``sql.py:1602-1624``) — into the standard LLM-corpus
toolkit: token counting, quality scoring, language-ID,
fingerprinting, benchmark decontamination, and PII scrubbing.

All are pure column-expression pipelines (no UDFs): at 100 TB
they run inside whole-stage codegen directly over the parquet scan,
shuffling only the final per-group rollups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from omniengine_spark.plans.registry import query
from omniengine_spark.sources import load_table

# Marker stopwords for quality scoring / language-ID.  Deterministic,
# embedded identically in the oracle SQL.
_STOPWORDS = ("the", "a", "of", "and", "to", "in")
_TOKEN_SPLIT = r"\s+"


def _tokens(col):
    return F.split(F.trim(col), _TOKEN_SPLIT)


# --------------------------------------------------------------------
# Token counting: whitespace tokens + distinct tokens + char stats.
# --------------------------------------------------------------------
@query(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
           len(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS n_distinct_tokens,
           length(text) AS n_chars_measured,
           CAST(length(replace(text, ' ', '')) AS DOUBLE)
             / len(regexp_split_to_array(trim(text), '\\s+')) AS avg_token_len,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))
             AS n_bpe_pieces
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n_tokens = F.size(toks)
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
        (
            F.length(F.regexp_replace("text", " ", "")).cast("double")
            / n_tokens
        ).alias("avg_token_len"),
        # BPE-ish pre-tokenizer: letter runs / digit runs / single
        # punctuation — the usual first split of a byte-pair encoder.
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0
            )
        ).cast("long").alias("n_bpe_pieces"),
    )


# --------------------------------------------------------------------
# Quality scoring: stopword ratio, type-token ratio, length band —
# the classic corpus-filter heuristics (Gopher/C4-style), exactly
# reproducible in SQL.
# --------------------------------------------------------------------
@query(
    "text_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM documents
    ), m AS (
      SELECT doc_id, lang,
             len(toks) AS n_tokens,
             len(list_filter(toks, x -> x IN {tuple(_STOPWORDS)!r})) AS n_stop,
             len(list_distinct(toks)) AS n_distinct
      FROM t
    )
    SELECT doc_id, lang, n_tokens,
           CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
           CAST(n_distinct AS DOUBLE) / n_tokens AS type_token_ratio,
           (CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 1 ELSE 0 END
            + CASE WHEN CAST(n_stop AS DOUBLE) / n_tokens >= 0.05 THEN 1 ELSE 0 END
            + CASE WHEN CAST(n_distinct AS DOUBLE) / n_tokens >= 0.1 THEN 1 ELSE 0 END)
             AS quality_score
    FROM m
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    d = docs.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tokens"),
        F.size(
            F.filter(toks, lambda x: F.array_contains(stop_arr, x))
        ).alias("n_stop"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
    )
    stop_ratio = F.col("n_stop").cast("double") / F.col("n_tokens")
    ttr = F.col("n_distinct").cast("double") / F.col("n_tokens")
    score = (
        F.when(F.col("n_tokens").between(20, 1000), 1).otherwise(0)
        + F.when(stop_ratio >= 0.05, 1).otherwise(0)
        + F.when(ttr >= 0.1, 1).otherwise(0)
    )
    return d.select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        ttr.alias("type_token_ratio"),
        score.alias("quality_score"),
    )


# --------------------------------------------------------------------
# Language-ID: marker-token scoring (n-gram-profile heuristic reduced
# to word unigrams — the corpus vocabulary is ASCII word salad, so
# character trigram profiles degenerate; the operator structure is the
# real deliverable).  Deterministic argmax with fixed tie order.
# --------------------------------------------------------------------
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "es": ("el", "la", "de", "que"),
    "fr": ("le", "la", "et", "les"),
    "de": ("der", "die", "und", "das"),
    "zh": ("de5", "shi4", "le5", "zai4"),
}


def _lang_case_sql() -> str:
    scores = []
    for lang, marks in _LANG_MARKERS.items():
        scores.append(
            f"len(list_filter(toks, x -> x IN {tuple(marks)!r})) AS s_{lang}"
        )
    return ", ".join(scores)


@query(
    "text_langid",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id, {_lang_case_sql()} FROM t
    )
    SELECT doc_id,
           CASE GREATEST(s_en, s_es, s_fr, s_de, s_zh)
             WHEN s_en THEN 'en' WHEN s_es THEN 'es' WHEN s_fr THEN 'fr'
             WHEN s_de THEN 'de' ELSE 'zh' END AS pred_lang,
           GREATEST(s_en, s_es, s_fr, s_de, s_zh) AS marker_hits
    FROM s
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    d = docs.select("doc_id", toks.alias("toks"))

    def marker_count(marks: tuple[str, ...]):
        arr = F.array(*[F.lit(m) for m in marks])
        # single-arg lambda: two-arg HOF lambdas mean (element, index)
        return F.size(F.filter(F.col("toks"), lambda x: F.array_contains(arr, x)))

    for lang, marks in _LANG_MARKERS.items():
        d = d.withColumn(f"s_{lang}", marker_count(marks))
    best = F.greatest(*[F.col(f"s_{lang}") for lang in _LANG_MARKERS])
    # Fixed tie order mirrors the oracle's CASE: en, es, fr, de, zh.
    pred = (
        F.when(F.col("s_en") == best, "en")
        .when(F.col("s_es") == best, "es")
        .when(F.col("s_fr") == best, "fr")
        .when(F.col("s_de") == best, "de")
        .otherwise("zh")
    )
    return d.select(
        "doc_id", pred.alias("pred_lang"), best.cast("long").alias("marker_hits")
    )


# --------------------------------------------------------------------
# Document fingerprinting: md5 content hash over normalized text plus
# a locality-insensitive first/last-token sketch — both engines ship
# bit-identical md5, so this is fully oracle-checkable.
# --------------------------------------------------------------------
@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(text))) AS content_md5,
           substr(md5(lower(trim(text))), 1, 8) AS bucket8,
           len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.col("text")))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("content_md5"),
        F.substring(F.md5(norm), 1, 8).alias("bucket8"),
        F.size(_tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )


# --------------------------------------------------------------------
# Benchmark decontamination: flag training docs sharing any 8-token
# shingle with a held-out probe set (doc_id % 97 == 0 stands in for
# the benchmark suite).  Candidate generation is an equi-join on the
# shingle — the same bucketed no-all-pairs shape as the dedup suite.
# Shingles join as raw strings here so the oracle is bit-exact; at
# 100 TB swap the join key for xxhash64(shingle) (8-byte postings,
# like operators/dedup.py ngram_jaccard) and keep counts identical
# modulo a ~n²/2⁶⁴ collision risk.
# --------------------------------------------------------------------
@query(
    "text_decontaminate",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
      FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+7], ' ') AS gram
      FROM toks, UNNEST(generate_series(1, len(t) - 7)) AS u(i)
      WHERE len(t) >= 8
    ), probe AS (
      SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0
    ), hits AS (
      SELECT g.doc_id, COUNT(*) AS n_overlap
      FROM grams g JOIN probe p ON g.gram = p.gram
      WHERE g.doc_id % 97 != 0
      GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(h.n_overlap, 0) AS BIGINT) AS n_overlap,
           COALESCE(h.n_overlap, 0) > 0 AS contaminated
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    WHERE d.doc_id % 97 != 0
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", _tokens(F.col("text")).alias("t")
    ).withColumn("n", F.size("t"))
    grams = (
        toks.filter(F.col("n") >= 8)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.col("n") - 7),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("t"), i, F.lit(8))
                    ),
                )
            ).alias("gram"),
        )
        .distinct()
    )
    probe = (
        grams.filter(F.col("doc_id") % 97 == 0).select("gram").distinct()
    )
    hits = (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(probe, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        docs.filter(F.col("doc_id") % 97 != 0)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias(
                "n_overlap"
            ),
            (F.coalesce("n_overlap", F.lit(0)) > 0).alias("contaminated"),
        )
    )


# --------------------------------------------------------------------
# PII scrubbing: detect + redact emails/phones with engine-portable
# regexes (Java regex and RE2 agree on these character classes).
# The corpus is word-salad, so deterministic PII is injected per doc
# and then scrubbed — the plan proves the redaction pipeline, counts
# and post-redaction lengths checked exactly.  Pure codegen
# (regexp_extract_all / regexp_replace); no UDFs.
# --------------------------------------------------------------------
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"555-[0-9]+"


@query(
    "text_pii_scrub",
    oracle=f"""
    WITH seeded AS (
      SELECT doc_id,
             text || ' contact u' || CAST(doc_id AS VARCHAR)
                  || '@example.com or 555-'
                  || CAST(doc_id % 10000 AS VARCHAR) AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS BIGINT)
             AS n_phones,
           length(regexp_replace(regexp_replace(t, '{_EMAIL_RE}',
                  '[EMAIL]', 'g'), '{_PHONE_RE}', '[PHONE]', 'g'))
             AS scrubbed_len
    FROM seeded
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact u"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            (F.col("doc_id") % 10000).cast("string"),
        ).alias("t"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("t"), _EMAIL_RE, "[EMAIL]"),
        _PHONE_RE,
        "[PHONE]",
    )
    return seeded.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("t"), F.lit(_EMAIL_RE), F.lit(0))).cast(
            "long"
        ).alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("t"), F.lit(_PHONE_RE), F.lit(0))).cast(
            "long"
        ).alias("n_phones"),
        F.length(scrubbed).cast("long").alias("scrubbed_len"),
    )


# --------------------------------------------------------------------
# Repetition ratio: fraction of word 3-grams that are duplicates
# within the document — the Gopher/C4-style boilerplate signal (a
# high ratio means templated or looping text).  Generalizes the
# reference's duplicate-name scan (sql.py:1602-1624) from
# across-corpus names to within-document n-grams; pure expressions,
# no shuffle at all (per-row computation + one rollup-free output).
# --------------------------------------------------------------------
@query(
    "text_repetition",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM documents
    ), g AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 3
                  THEN list_transform(range(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                  ELSE [] END AS tri
      FROM t
    )
    SELECT doc_id,
           CAST(len(tri) AS BIGINT) AS n_trigrams,
           CAST(len(list_distinct(tri)) AS BIGINT) AS n_unique,
           CASE WHEN len(tri) > 0
                THEN CAST(len(tri) - len(list_distinct(tri)) AS DOUBLE)
                     / CAST(len(tri) AS DOUBLE)
                ELSE 0.0 END AS dup_ratio,
           CASE WHEN len(tri) > 0
                AND CAST(len(tri) - len(list_distinct(tri)) AS DOUBLE)
                    / CAST(len(tri) AS DOUBLE) > 0.05
                THEN TRUE ELSE FALSE END AS is_repetitive
    FROM g
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Relational formulation, not a per-row array HOF: building the
    # trigram array with transform/element_at lambdas runs the
    # interpreted expression path (measured 26 s at sf0.1 vs 0.2 s in
    # DuckDB).  posexplode → lead ×2 → grouped count/count_distinct
    # stays entirely in codegen; the shuffle is the token stream
    # partitioned by doc_id — the same posting-list shape
    # dedup_ngram_jaccard scales on, bounded by max doc length per
    # group.
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", _tokens(F.col("text")).alias("toks")
    )
    tok = docs.select(
        "doc_id", F.posexplode("toks").alias("pos", "w")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    nxt1, nxt2 = F.lead("w", 1).over(w), F.lead("w", 2).over(w)
    tri = tok.select(
        "doc_id",
        F.concat_ws(" ", F.col("w"), nxt1, nxt2).alias("tri"),
        nxt2.isNotNull().alias("full"),
    ).filter("full")
    counts = tri.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        F.count_distinct("tri").alias("n_unique"),
    )
    base = docs.select("doc_id").join(counts, "doc_id", "left")
    n_tri = F.coalesce(F.col("n_trigrams"), F.lit(0))
    n_uniq = F.coalesce(F.col("n_unique"), F.lit(0))
    dup_ratio = F.when(
        n_tri > 0,
        (n_tri - n_uniq).cast("double") / n_tri.cast("double"),
    ).otherwise(F.lit(0.0))
    return base.select(
        "doc_id",
        n_tri.cast("long").alias("n_trigrams"),
        n_uniq.cast("long").alias("n_unique"),
        dup_ratio.alias("dup_ratio"),
        (dup_ratio > 0.05).alias("is_repetitive"),
    )


_BPE_TOPK = 50


@query(
    "text_bpe_pair_stats",
    oracle=f"""
    WITH words AS (
      SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))
               AS w
      FROM documents
    ), wf AS (
      SELECT w, COUNT(*) AS freq FROM words
      WHERE len(w) >= 2 GROUP BY w
    ), prs AS (
      SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, freq
      FROM wf, unnest(range(1, len(w))) AS r(i)
    ), agg AS (
      SELECT pair, CAST(SUM(freq) AS BIGINT) AS n_occurrences
      FROM prs GROUP BY pair
    )
    SELECT pair, n_occurrences, CAST(rnk AS BIGINT) AS rnk FROM (
      SELECT *, ROW_NUMBER() OVER (
        ORDER BY n_occurrences DESC, pair) AS rnk
      FROM agg
    ) WHERE rnk <= {_BPE_TOPK}
    """,
)
def text_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First iteration of BPE tokenizer training: corpus-weighted
    adjacent-symbol pair frequencies (symbols = characters before any
    merge), top-50 candidates ranked — the statistic a tokenizer
    trainer computes once per merge round over the whole corpus.

    Scale shape: word-frequency compression FIRST (the classic BPE
    trick — pair counting runs over distinct words weighted by
    frequency, not over raw text), then one explode over positions
    and one small pair aggregation.  Both shuffles key on words/pairs
    (high cardinality, no skew); everything is codegen."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        ).alias("w")
    ).filter(F.length("w") >= 2)
    wf = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    prs = wf.select(
        "freq",
        F.explode(
            F.sequence(F.lit(1), F.length("w") - 1)
        ).alias("i"),
        F.col("w").substr(F.col("i"), F.lit(2)).alias("pair"),
    )
    agg = prs.groupBy("pair").agg(
        F.sum("freq").cast("long").alias("n_occurrences")
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("pair"))
    return (
        agg.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= _BPE_TOPK)
        .select("pair", "n_occurrences", "rnk")
    )


# --------------------------------------------------------------------
# Statistical language-model fluency scoring: a character-trigram
# model trained on the corpus itself, scored back over every
# document.  The KenLM-perplexity filter of the standard LLM data
# pipeline (CCNet and successors), made engine-exact: instead of
# float log-probabilities (whose transcendental rounding differs
# across engines), the score is kept in integer corpus-frequency
# space — SUM of the trigram's corpus count (exact BIGINT) and the
# fraction of rare trigrams (exact INT ratio cast once to DOUBLE).
# Gibberish scores low coverage / high rarity exactly as with
# log-probs, and the whole plan is reproducible bit-for-bit.
# --------------------------------------------------------------------
_LM_RARE_THRESHOLD = 5


@query(
    "text_lm_fluency",
    oracle=f"""
    WITH tri AS (
      SELECT doc_id,
             unnest([substr(text, i, 3)
                     for i in generate_series(1, length(text) - 2)]) AS tri
      FROM documents
      WHERE length(text) >= 3
    ), doc_tri AS (
      SELECT doc_id, tri, COUNT(*) AS c FROM tri GROUP BY doc_id, tri
    ), model AS (
      SELECT tri, CAST(SUM(c) AS BIGINT) AS corpus_freq
      FROM doc_tri GROUP BY tri
    )
    SELECT t.doc_id,
           CAST(SUM(t.c) AS BIGINT) AS n_trigrams,
           CAST(SUM(t.c * m.corpus_freq) AS BIGINT) AS corpus_hits,
           CAST(SUM(t.c * m.corpus_freq) AS DOUBLE) / SUM(t.c)
             AS avg_trigram_freq,
           CAST(SUM(CASE WHEN m.corpus_freq < {_LM_RARE_THRESHOLD}
                         THEN t.c ELSE 0 END) AS DOUBLE) / SUM(t.c)
             AS rare_ratio
    FROM doc_tri t JOIN model m ON m.tri = t.tri
    GROUP BY t.doc_id
    """,
)
def text_lm_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trigram fluency score per document.

    Scale shape: the position explode runs TWICE — once into the
    model agg, once into the scoring join — and NOTHING is cached.
    Earlier rounds persisted a per-(doc, trigram) count frame between
    the branches, but measured it a net loss: documents rarely repeat
    a trigram (~1.2× compression at 60-word docs), so the cache held
    ~corpus-characters rows of pure overhead — it OOM'd an 8 GB heap
    as a localCheckpoint, thrashed as a MEMORY_AND_DISK cache
    (spill-soak e=+1.34), and pinned executor storage for the rest of
    the session.  Recomputing one substr explode is cheaper than one
    disk round-trip of the same rows.  The two branches are then both
    shuffle-light: the model agg keys on the trigram with map-side
    combine (per-partition key space bounded by alphabet³), the
    trained model — a few million rows regardless of corpus size —
    broadcasts into a map-side join against raw instance rows, and
    the per-doc rollup's partial agg compresses each partition to its
    distinct doc_ids before the one real shuffle (on doc_id)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= 3
    )
    # The testdata corpus is one parquet file → one input split; fan
    # out before the CPU-heavy position explode (at real scale the
    # scan has thousands of splits and fan_out no-ops; here the
    # exchange is ~free relative to the explode it parallelizes:
    # 4.5×).
    from omniengine_spark.sources import fan_out

    docs = fan_out(docs)
    tri_rows = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("text") - 2),
                lambda i: F.col("text").substr(i, F.lit(3)),
            )
        ).alias("tri"),
    )
    model = tri_rows.groupBy("tri").agg(
        F.count(F.lit(1)).alias("corpus_freq")
    )
    scored = tri_rows.join(F.broadcast(model), "tri")
    n_tri = F.count(F.lit(1))
    hits = F.sum("corpus_freq")
    return scored.groupBy("doc_id").agg(
        n_tri.alias("n_trigrams"),
        hits.alias("corpus_hits"),
        (hits.cast("double") / n_tri).alias("avg_trigram_freq"),
        (
            F.sum(
                F.when(
                    F.col("corpus_freq") < _LM_RARE_THRESHOLD,
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).cast("double")
            / n_tri
        ).alias("rare_ratio"),
    )
