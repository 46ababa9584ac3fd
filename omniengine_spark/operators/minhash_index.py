"""Persistent MinHash-LSH dedup index: build once, ingest shards
forever — the operating loop of a production training-data pipeline.

The one-shot ``minhash_lsh_pairs`` rescans and re-shingles the whole
corpus per run; a 100 TB pipeline instead ingests each new crawl
shard against a PERSISTED index and pays only shard-proportional
work.  Three versioned warehouse tables (``sources.versioned``) hold
the full index state:

    <root>/band_entries   (doc_id, n_sh, band, bucket)  — the
                          joinable LSH index (signatures are a pure
                          function of content, so entries computed
                          today band-join exactly against entries
                          stored last month)
    <root>/pairs          (doc_a, doc_b, jaccard)       — verified
                          near-duplicate pairs over everything
                          ingested so far
    <root>/shingles       (doc_id, hs)                  — hashed
                          shingle sets, so the exact-verify stage
                          never returns to the raw documents

``ingest_shard`` per shard costs:
  - |shard| signatures + shingle sets (the only document scan, and
    it reads ONLY the shard);
  - a band-join of shard entries against stored entries (shuffle
    ∝ |shard| + matching buckets, not corpus size);
  - an exact verify whose shingle inputs are SEMI-JOINED down to
    candidate-touched doc ids — round 8 shipped this stage reading
    the full corpus∪shard, a complete re-scan + re-shingle per
    ingest that contradicted the operator's purpose; now corpus
    shingle sets come from the persisted table pruned to candidates
    (tests/test_operators.py pins the pruning);
  - three DELTA commits (``versioned.commit(base_version=...)``)
    writing only shard-sized parquet, so shard N+1 sees shard N
    without any table ever being rewritten.

Equality with the one-shot run over the union is exact, not
probabilistic-modulo-banding: banding stored∪shard entries finds
EXACTLY the candidate pairs a one-shot band-join over the union
finds, and the verify math is the same ``_verify_jaccard`` fold —
``tests/test_operators.py`` pins two sequential shard ingests
against one ``minhash_lsh_pairs`` over the whole corpus.

Reference analogue: the seen-tx skip (``sql.py:382-384``)
generalized from transaction identity to content identity.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from omniengine_spark.operators.dedup import (
    _verify_jaccard,
    band_candidates,
    band_candidates_cross,
    hashed_shingle_docs,
    minhash_band_entries,
)
from omniengine_spark.sources.versioned import (
    commit,
    current_version,
    read_version,
    version_history,
)

# a shard delta smaller than this on disk gets an explicit broadcast
# hint into the band join / verify semi-join (parquet-backed sizes
# make the hint safe to gate on); bigger shards fall back to the
# shuffle join — still shard-proportional, just not map-side
_BROADCAST_BYTES = 64 << 20

ENTRIES, PAIRS, SHINGLES = "band_entries", "pairs", "shingles"


def index_paths(root: str) -> tuple[str, str, str]:
    return f"{root}/{ENTRIES}", f"{root}/{PAIRS}", f"{root}/{SHINGLES}"


def latest_tag(root: str) -> str | None:
    """Description of the newest committed index state (None when the
    index doesn't exist yet).  The three tables commit under one tag
    per lifecycle step, so any one table's history identifies the
    state; ``pairs`` is the output table, so it is the authority."""
    hist = version_history(index_paths(root)[1])
    return hist[-1]["description"] if hist else None


def build_index(
    spark: SparkSession,
    root: str,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    num_hashes: int = 128,
    band_rows: int = 4,
    threshold: Fraction = Fraction(4, 5),
    tag: str,
) -> None:
    """Corpus-ingest day: shingle + sign the corpus ONCE, self-dedup
    it, and persist all three index tables as version 1.  The one
    full-corpus scan the lifecycle ever performs."""
    entries = minhash_band_entries(
        corpus, id_col, text_col, n, num_hashes, band_rows
    )
    shingles = hashed_shingle_docs(corpus, id_col, text_col, n)
    epath, ppath, spath = index_paths(root)
    commit(entries, epath, tag)
    commit(shingles, spath, tag)
    pairs = _verify_jaccard(
        band_candidates(
            read_version(spark, epath),
            read_version(spark, epath),
            threshold,
        ),
        read_version(spark, spath),
        threshold,
    )
    commit(pairs, ppath, tag)


def _dir_bytes(path: str) -> int:
    from pathlib import Path
    from urllib.parse import unquote, urlparse

    if "://" in path or path.startswith("file:"):
        path = unquote(urlparse(path).path)
    return sum(
        f.stat().st_size for f in Path(path).rglob("*") if f.is_file()
    )


def _maybe_broadcast(df: DataFrame, delta_dir: str) -> DataFrame:
    return (
        F.broadcast(df)
        if _dir_bytes(delta_dir) < _BROADCAST_BYTES
        else df
    )


def _commit_shard_frames(
    spark: SparkSession,
    root: str,
    shard: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int,
    num_hashes: int,
    band_rows: int,
    tag: str,
) -> tuple[DataFrame, DataFrame, int, int]:
    """Compute the shard's band entries + shingle sets ONCE, commit
    them as delta versions, and hand back (entries, shingles,
    base_entries_version, base_shingles_version) with the shard
    frames re-read from their just-written delta dirs: parquet-backed
    frames carry accurate size stats, so the band join and verify
    semi-join can broadcast a small shard instead of shuffling the
    corpus index.  Idempotent per table: a crash-retry whose tag
    already heads a table's history reuses that delta instead of
    committing a duplicate."""
    epath, _, spath = index_paths(root)

    def _delta(path: str, frame_fn) -> tuple[DataFrame, int]:
        hist = version_history(path)
        if hist and hist[-1]["description"] == tag:
            ver, base = hist[-1]["version"], hist[-1]["base"]
        else:
            base = current_version(path)
            ver = commit(frame_fn(), path, tag, base_version=base)
        return spark.read.parquet(f"{path}/v={ver}"), base

    entries_pq, base_e = _delta(
        epath,
        lambda: minhash_band_entries(
            shard, id_col, text_col, n, num_hashes, band_rows
        ),
    )
    shingles_pq, base_s = _delta(
        spath,
        lambda: hashed_shingle_docs(shard, id_col, text_col, n),
    )
    return entries_pq, shingles_pq, base_e, base_s


def _ingest_plan(
    spark: SparkSession,
    root: str,
    shard_entries: DataFrame,
    shard_shingles: DataFrame,
    base_entries: int,
    base_shingles: int,
    threshold: Fraction,
) -> tuple[DataFrame, DataFrame]:
    """The lazy shard-vs-corpus pipeline over ALREADY-COMMITTED shard
    deltas: (verify_docs, new_pairs).  Exposed separately so tests
    can assert the exact production plan shape — in particular that
    ``verify_docs`` is the persisted shingle table semi-joined to
    candidate ids, never a corpus re-shingle."""
    epath, _, spath = index_paths(root)
    stored_entries = read_version(spark, epath, base_entries)
    stored_shingles = read_version(spark, spath, base_shingles)
    e_files = shard_entries.inputFiles()
    small_e = (
        _maybe_broadcast(shard_entries, e_files[0].rsplit("/", 1)[0])
        if e_files
        else F.broadcast(shard_entries)  # empty shard: trivially small
    )

    # one normalized cross join (single scan of the corpus index,
    # shard side broadcast when small) plus the within-shard
    # self-join; both emit (least, greatest) pairs so distinct dedups
    cand = (
        band_candidates_cross(small_e, stored_entries, threshold)
        .unionByName(
            band_candidates(shard_entries, shard_entries, threshold)
        )
        .distinct()
    )
    # exact-verify reads shingle sets ONLY for candidate-touched docs:
    # stored sets from the persisted index semi-joined to the (tiny,
    # broadcast) candidate id set, shard sets from the committed
    # delta — the raw corpus documents are never touched
    cand_ids = F.broadcast(
        cand.select(
            F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
        ).distinct()
    )
    verify_docs = stored_shingles.unionByName(shard_shingles).join(
        cand_ids, "doc_id", "left_semi"
    )
    new_pairs = _verify_jaccard(cand, verify_docs, threshold)
    return verify_docs, new_pairs


def ingest_shard(
    spark: SparkSession,
    root: str,
    shard: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    num_hashes: int = 128,
    band_rows: int = 4,
    threshold: Fraction = Fraction(4, 5),
    tag: str,
) -> DataFrame:
    """Dedup ``shard`` against the persisted index, COMMIT the shard
    back (delta versions of all three tables — shard-sized writes,
    no table rewrite), and return the complete post-ingest pair set
    read from the committed snapshot.  Idempotent per ``tag``: a
    replay whose tag is already the newest committed state returns
    the stored pairs without recomputing or re-committing, and a
    crash-retry reuses whichever per-table deltas already landed."""
    epath, ppath, spath = index_paths(root)
    if latest_tag(root) == tag:
        return read_version(spark, ppath)

    entries_pq, shingles_pq, base_e, base_s = _commit_shard_frames(
        spark, root, shard, id_col, text_col,
        n=n, num_hashes=num_hashes, band_rows=band_rows, tag=tag,
    )
    _, new_pairs = _ingest_plan(
        spark, root, entries_pq, shingles_pq, base_e, base_s, threshold
    )
    commit(new_pairs, ppath, tag, base_version=current_version(ppath))
    return read_version(spark, ppath)


def compact_index(spark: SparkSession, root: str) -> None:
    """Squash each index table's delta chain into one snapshot
    (``versioned.compact``) so a later ``vacuum`` can retire the
    per-shard versions — the periodic O(corpus) maintenance that
    bounds read fan-in after many shard ingests.  The snapshot
    carries the CURRENT tag as its description, so ``ingest_shard``'s
    tag-based idempotency is unaffected by when compaction runs."""
    from omniengine_spark.sources.versioned import compact

    tag = latest_tag(root)
    for path in index_paths(root):
        compact(spark, path, description=tag)
