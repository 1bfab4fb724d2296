"""Incremental near-duplicate detection (q79): pair a newly-arrived shard
against an existing LSH index without re-pairing the base corpus.

The operation a growing training corpus actually runs: the 100 TB base has
already been deduplicated (q25) and its LSH artifacts persist — the banded
bucket table (doc_id, band_no, key) and the token-hash sets used for exact
verification.  When a new shard lands, the only NEW pairs are
(delta x base) and (delta x delta); base x base pairs are already in the
pair graph and must not be recomputed.  This plan generates exactly those:
the base side contributes its bucket index to the join but never
self-joins, so incremental cost is O(|delta| x bucket occupancy), not
O(|corpus|^2) — re-running the full q25 on base+delta would re-shuffle and
re-verify the entire history every time a shard lands.

Semantics contract (pinned by tests/test_incremental_dedup.py): the output
equals q25 run on the full corpus, restricted to pairs touching the delta
— banding, the stop-bucket cap, star-linking of over-cap buckets, and the
Jaccard >= 0.5 verification all measure COMBINED (base+delta) bucket
occupancy, exactly as the maintained index would.  `kind` labels each pair
delta_base or delta_delta so downstream clustering can count new-vs-known
linkage.

The delta here is the deterministic 10% slice doc_id % 10 = 7 (standing in
for "the shard that just arrived"); at scale the split is the ingest
boundary and the base artifacts are read from the persisted index rather
than recomputed (the q64 physical-index pattern applied to LSH).

Scale shape: delta signatures are a narrow map over the shard only; the
bucket join shuffles ids-only rows; the star path stays O(bucket); token
sets re-attach per verified candidate.  No base-base candidate is ever
generated in the plan — not filtered after the fact.

Reference: LLM-extension scope; reference analog is nexus-writer's
resume-after-gap semantics (nexus-writer/src/run_engine/engine.rs:144-173)
— new data reconciles against persisted state instead of replaying
history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..materialize import materialize
from ..sources.testdata import load_table
from .relational import _register
from .text_dedup import (
    _DUCK_TH_CTE,
    _LSH_BUCKET_CAP,
    _N_BANDS,
    _ROWS_PER_BAND,
    _band_keys_duck,
    _minhash_cols_spark,
    _with_token_hashes,
)

# the "newly arrived shard": a deterministic 10% slice
_DELTA_MOD = 10
_DELTA_REM = 7


def _sized_buckets(banded: DataFrame) -> DataFrame:
    """Bucket occupancy AND the star representative from ONE window over
    the banded rows (q25's r15 rewrite, shared by q79/q82): r14 computed
    occupancy as groupBy+join-back and the rep as a second groupBy+join —
    three extra exchanges of the same (band_no, key)-keyed rows (guide
    §2.4).  Skew parity with the join form: a hot bucket clusters onto one
    task either way, and the star path bounds its output."""
    from pyspark.sql.window import Window

    wb = Window.partitionBy("band_no", "key")
    return banded.withColumn("count", F.count(F.lit(1)).over(wb)).withColumn(
        "rep", F.min("doc_id").over(wb)
    )


def _delta_probe_pairs(cap_delta: DataFrame, capped: DataFrame) -> DataFrame:
    """Candidate pairs touching the delta, from ONE bucket join: the delta
    side probes the full capped table (base + delta), self-matches are
    dropped, and the pair is normalized to doc_a = min.  Produces exactly
    the union of delta x base (both orientations) and delta x delta that
    r14 built with three oriented joins — a delta_delta pair arrives in
    both orientations and collapses in the caller's dropDuplicates.
    base x base pairs are never generated: one join side is always the
    delta, so the incremental-cost contract (O(|delta| x occupancy)) is
    preserved while the plan runs one join instead of three."""
    aa, bb = cap_delta.alias("a"), capped.alias("b")
    return aa.join(
        bb,
        (F.col("a.band_no") == F.col("b.band_no"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col("a.doc_id") != F.col("b.doc_id")),
    ).select(
        F.least("a.doc_id", "b.doc_id").alias("doc_a"),
        F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
    )


def _q79_oracle() -> str:
    from .text_dedup import _minhash_cols_duck

    return f"""
    {_DUCK_TH_CTE}
    , sigs AS (
        SELECT doc_id, th,
               {_minhash_cols_duck()}
        FROM th_t WHERE len(th) > 0
    ), banded AS (
        SELECT doc_id,
               {_band_keys_duck()}
        FROM sigs
    ), long_banded AS (
        SELECT doc_id, band_no, key FROM (
            SELECT doc_id, 0 AS band_no, band0 AS key FROM banded
            UNION ALL SELECT doc_id, 1, band1 FROM banded
            UNION ALL SELECT doc_id, 2, band2 FROM banded
            UNION ALL SELECT doc_id, 3, band3 FROM banded
        )
    ), sized AS (
        SELECT *, count(*) OVER (PARTITION BY band_no, key) AS bucket_n,
               doc_id % {_DELTA_MOD} = {_DELTA_REM} AS is_delta
        FROM long_banded
    ), capped AS (
        SELECT doc_id, band_no, key, is_delta
        FROM sized WHERE bucket_n <= {_LSH_BUCKET_CAP}
    ), star AS (
        SELECT rep AS doc_a, doc_id AS doc_b FROM (
            SELECT doc_id, is_delta,
                   min(doc_id) OVER (PARTITION BY band_no, key) AS rep
            FROM sized WHERE bucket_n > {_LSH_BUCKET_CAP}
        ) WHERE doc_id > rep
          AND (is_delta OR rep % {_DELTA_MOD} = {_DELTA_REM})
    ), pairs AS (
        SELECT DISTINCT doc_a, doc_b FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM capped a JOIN capped b
              ON a.band_no = b.band_no AND a.key = b.key AND b.doc_id > a.doc_id
            WHERE a.is_delta OR b.is_delta
            UNION ALL SELECT doc_a, doc_b FROM star
        )
    )
    SELECT p.doc_a, p.doc_b,
           len(list_intersect(ta.th, tb.th))::INT::DOUBLE
               / (len(ta.th) + len(tb.th) - len(list_intersect(ta.th, tb.th))) AS jaccard,
           CASE WHEN p.doc_a % {_DELTA_MOD} = {_DELTA_REM}
                 AND p.doc_b % {_DELTA_MOD} = {_DELTA_REM}
                THEN 'delta_delta' ELSE 'delta_base' END AS kind
    FROM pairs p
    JOIN th_t ta ON ta.doc_id = p.doc_a
    JOIN th_t tb ON tb.doc_id = p.doc_b
    WHERE len(list_intersect(ta.th, tb.th))::INT::DOUBLE
               / (len(ta.th) + len(tb.th) - len(list_intersect(ta.th, tb.th))) >= 0.5
    """


@_register("q79_incremental_dedup", oracle=_q79_oracle())
def q79_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-shard near-dup pass: (delta x base) + (delta x delta) candidate
    pairs only — see module docstring.  Output: verified pairs touching the
    delta with exact Jaccard and a delta_base/delta_delta kind label."""
    # one tokenize+md5 pass: every downstream consumer (signatures, the
    # two verification-token attaches) derives from the narrow (doc_id,
    # th) projection, so materialize it once — the plan otherwise repeats
    # the corpus tokenize subtree per consumer (4 passes measured r14;
    # guide §1.2 "don't compute things twice").  Same in-query
    # materialize() pattern as q25's builder; ~16 B/token row.
    base = materialize(
        _with_token_hashes(spark, sf_dir, spread=True)
        .filter(F.size("th") > 0)
        .select("doc_id", "th")
    )
    th = base
    sigs = base.select("doc_id", *_minhash_cols_spark())
    band_cols = []
    for bnd in range(_N_BANDS):
        parts = [
            F.col(f"mh{bnd * _ROWS_PER_BAND + r:02d}").cast("string")
            for r in range(_ROWS_PER_BAND)
        ]
        band_cols.append(
            F.struct(
                F.lit(bnd).alias("band_no"), F.md5(F.concat_ws(",", *parts)).alias("key")
            ).alias(f"b{bnd}")
        )
    banded = (
        sigs.select("doc_id", F.explode(F.array(*band_cols)).alias("bk"))
        .select("doc_id", F.col("bk.band_no").alias("band_no"), F.col("bk.key").alias("key"))
    )
    is_delta = F.col("doc_id") % _DELTA_MOD == _DELTA_REM
    # occupancy is COMBINED (base+delta) — the maintained index's view;
    # one window computes it together with the star rep (see _sized_buckets)
    sized = _sized_buckets(banded)
    capped = sized.filter(F.col("count") <= _LSH_BUCKET_CAP).select(
        "doc_id", "band_no", "key"
    )
    # ONE join generates every candidate pair touching the delta: the delta
    # side probes the FULL capped table (base + delta members of the same
    # bucket) and the orientation is normalized afterwards (doc_a = min).
    # base x base pairs are still never generated — one join side is always
    # the delta — and a delta_delta pair arriving in both orientations
    # collapses in the dropDuplicates below.  Replaces r14's three oriented
    # joins (delta x base, base x delta, delta x delta): same pair set, one
    # exchange pair instead of three join stages (guide §2.4).
    pairs_new = _delta_probe_pairs(capped.filter(is_delta), capped)
    # over-cap buckets: star edges to the bucket rep, kept only if the pair
    # touches the delta (rep may be a base doc linking a delta member, or a
    # delta rep linking any member)
    pairs_star = (
        sized.filter(F.col("count") > _LSH_BUCKET_CAP)
        .filter(F.col("doc_id") > F.col("rep"))
        .filter(is_delta | (F.col("rep") % _DELTA_MOD == _DELTA_REM))
        .select(F.col("rep").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    pairs = pairs_new.unionByName(pairs_star).dropDuplicates(["doc_a", "doc_b"])
    ta = th.select(F.col("doc_id").alias("doc_a"), F.col("th").alias("tha"))
    tb = th.select(F.col("doc_id").alias("doc_b"), F.col("th").alias("thb"))
    verified = pairs.join(ta, "doc_a").join(tb, "doc_b")
    inter = F.size(F.array_intersect("tha", "thb"))
    union = F.size("tha") + F.size("thb") - inter
    jac = inter.cast("double") / union
    kind = F.when(
        (F.col("doc_a") % _DELTA_MOD == _DELTA_REM)
        & (F.col("doc_b") % _DELTA_MOD == _DELTA_REM),
        "delta_delta",
    ).otherwise("delta_base")
    return (
        verified.select("doc_a", "doc_b", jac.alias("jaccard"), kind.alias("kind"))
        .filter(F.col("jaccard") >= 0.5)
    )


# ---------------------------------------------------------------------------
# q82 — the incremental pass against a PERSISTED LSH index
# ---------------------------------------------------------------------------
#
# q79 derives the base side's artifacts in-plan; this is the production
# form: the base corpus's banded bucket table and verification token sets
# are parquet artifacts written once (the index-build job), and the
# incremental pass READS them — the only per-shard compute is the delta's
# own signatures.  Registered with q79's oracle: moving the base side to a
# stored layout must not move a single value.

import os
import tempfile

_BUILT: dict = {}


def lsh_index_path(sf_dir: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(tempfile.gettempdir(), f"supermusr_lsh_index_{base}.parquet")


def _banded(sigs: DataFrame) -> DataFrame:
    """(doc_id, band_no, key) rows from a signature table — the exact q25
    banding (md5 over each band's 4 signature values)."""
    band_cols = []
    for bnd in range(_N_BANDS):
        parts = [
            F.col(f"mh{bnd * _ROWS_PER_BAND + r:02d}").cast("string")
            for r in range(_ROWS_PER_BAND)
        ]
        band_cols.append(
            F.struct(
                F.lit(bnd).alias("band_no"), F.md5(F.concat_ws(",", *parts)).alias("key")
            ).alias(f"b{bnd}")
        )
    return (
        sigs.select("doc_id", F.explode(F.array(*band_cols)).alias("bk"))
        .select("doc_id", F.col("bk.band_no").alias("band_no"), F.col("bk.key").alias("key"))
    )


# doc-id hash buckets for the tokens artifact: a probe knows its candidate
# doc_ids, so their buckets become a literal partition filter and the
# verification-token scan reads only touched directories instead of the
# whole corpus — the q64/q114 physical-index pattern applied to the dedup
# index's verification side.  Fixed fan-out (the bounded-directory rule).
_TOK_BUCKETS = 256


def _tok_bucket(col):
    return F.pmod(F.xxhash64(col.cast("long")), F.lit(_TOK_BUCKETS)).cast("int")


# segment ids for the LSH index's `bid` partition column: streaming
# batches use their non-negative Structured Streaming batch ids; every
# non-streaming writer must stay NEGATIVE so a streaming query's dynamic
# partition overwrite can never clobber a bulk/maintenance segment (the
# postings_ingest id-space rule applied index-wide)
LSH_BASE_BID = -1          # the bulk index build
LSH_BULK_APPEND_BID = -2   # append_shard_to_index batch growth


def write_lsh_index(spark: SparkSession, sf_dir: str, out_path: str) -> None:
    """Index-build job for the BASE corpus: two artifacts under one root —
    ``bands/`` (doc_id, band_no, key) partitioned by (band_no, bid), and
    ``tokens/`` (doc_id, th) for exact-Jaccard verification, partitioned
    by (``tb`` = hash(doc_id) % 256, bid) so candidate verification
    prunes to the touched buckets.  ``bid`` is the SEGMENT id: the bulk
    build writes bid=-1, and the streaming front door
    (streaming/shard_ingest.py) appends each micro-batch as its own
    bid=<batch_id> partitions via dynamic partition overwrite — a
    crash-retry REPLACES its segment instead of duplicating rows, with
    no marker files.  Token-id arrays are bigints, so the parquet
    round-trip is exact.  At 100 TB this is the standing dedup index a
    shard lands against; a shard that passes is then APPENDED to it
    (band rows + token sets), which is the whole point of the layout —
    growing the index is an append, not a rebuild."""
    from .index_maintenance import resolve_dir

    df = _with_token_hashes(spark, sf_dir, spread=True)
    # both artifacts derive from (doc_id, th); cache that projection so
    # the corpus tokenize+hash pass runs ONCE instead of once per write
    # (the dominant build cost — same-session A/B in the build docstring
    # history: ~2x on the shared pass at sf0.1)
    base = (
        df.filter((F.col("doc_id") % _DELTA_MOD != _DELTA_REM) & (F.size("th") > 0))
        .select("doc_id", "th")
        .persist()
    )
    try:
        (
            base
            .withColumn("tb", _tok_bucket(F.col("doc_id")))
            .withColumn("bid", F.lit(LSH_BASE_BID))
            .repartition("tb")
            .write.partitionBy("tb", "bid")
            .mode("overwrite")
            .parquet(resolve_dir(os.path.join(out_path, "tokens")))
        )
        sigs = base.select("doc_id", *_minhash_cols_spark())
        (
            _banded(sigs)
            .withColumn("bid", F.lit(LSH_BASE_BID))
            .repartition("band_no")
            .write.partitionBy("band_no", "bid")
            .mode("overwrite")
            .parquet(resolve_dir(os.path.join(out_path, "bands")))
        )
    finally:
        base.unpersist()


@_register("q82_indexed_incremental", oracle=_q79_oracle())
def q82_indexed_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q79 with the base side served from the persisted index: base band
    rows and token sets are parquet scans (no recomputation of base
    signatures from text); only the delta shard is tokenized, hashed, and
    banded in this pass.  Build-once per session ($TMPDIR artifact, the
    q64 pattern); value-identical to q79 by construction and by oracle."""
    path = lsh_index_path(sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir)
    if not _BUILT.get(key):
        write_lsh_index(spark, sf_dir, path)
        _BUILT[key] = True

    is_delta = F.col("doc_id") % _DELTA_MOD == _DELTA_REM
    # q79's single-pass rule: tokenize+md5 the delta shard ONCE into the
    # narrow (doc_id, th) projection (the doc_id filter pushes below the
    # spread repartition, so only shard rows are shuffled or tokenized);
    # signatures and the verification attach both derive from it
    delta_base = materialize(
        _with_token_hashes(spark, sf_dir, spread=True)
        .filter(is_delta)
        .filter(F.size("th") > 0)
        .select("doc_id", "th")
    )
    delta_th = delta_base
    delta_banded = _banded(delta_base.select("doc_id", *_minhash_cols_spark()))
    from .index_maintenance import resolve_dir

    base_banded = spark.read.parquet(
        resolve_dir(os.path.join(path, "bands"))
    ).select("doc_id", F.col("band_no").cast("int").alias("band_no"), "key")
    # no tb pruning here: a 10%-of-corpus delta's candidates touch nearly
    # every bucket, so the filter would list all directories for nothing;
    # the SMALL-batch probe (streaming/shard_ingest.admit_batch) is where
    # the bucketed layout pays
    base_th = spark.read.parquet(
        resolve_dir(os.path.join(path, "tokens"))
    ).select("doc_id", "th")

    banded = base_banded.unionByName(delta_banded)
    # combined occupancy — identical to the maintained index's view (q79);
    # one window computes it together with the star rep (_sized_buckets)
    sized = _sized_buckets(banded)
    capped = sized.filter(F.col("count") <= _LSH_BUCKET_CAP).select(
        "doc_id", "band_no", "key"
    )
    # q79's single-join rule: delta probes the full capped table once,
    # orientation normalized after (doc_a = min); never base x base
    pairs_new = _delta_probe_pairs(capped.filter(is_delta), capped)
    pairs_star = (
        sized.filter(F.col("count") > _LSH_BUCKET_CAP)
        .filter(F.col("doc_id") > F.col("rep"))
        .filter(is_delta | (F.col("rep") % _DELTA_MOD == _DELTA_REM))
        .select(F.col("rep").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    pairs = pairs_new.unionByName(pairs_star).dropDuplicates(["doc_a", "doc_b"])
    th = base_th.unionByName(delta_th)
    ta = th.select(F.col("doc_id").alias("doc_a"), F.col("th").alias("tha"))
    tb = th.select(F.col("doc_id").alias("doc_b"), F.col("th").alias("thb"))
    verified = pairs.join(ta, "doc_a").join(tb, "doc_b")
    inter = F.size(F.array_intersect("tha", "thb"))
    union = F.size("tha") + F.size("thb") - inter
    jac = inter.cast("double") / union
    kind = F.when(
        (F.col("doc_a") % _DELTA_MOD == _DELTA_REM)
        & (F.col("doc_b") % _DELTA_MOD == _DELTA_REM),
        "delta_delta",
    ).otherwise("delta_base")
    return (
        verified.select("doc_a", "doc_b", jac.alias("jaccard"), kind.alias("kind"))
        .filter(F.col("jaccard") >= 0.5)
    )


def append_shard_to_index(spark: SparkSession, sf_dir: str, out_path: str) -> None:
    """Admit the delta shard into the standing index: append its band rows
    and token sets to the persisted artifacts (parquet append — no rewrite
    of the base).  After this, the index covers base + delta and the NEXT
    shard's incremental pass sees the grown corpus — the growth path the
    module docstring promises, as code.

    At 100 TB this is the only index maintenance a landing shard needs;
    the append is partitioned by band_no like the original layout, and
    the band-key bucket occupancy used by future passes automatically
    reflects the appended rows (occupancy is computed per pass, not
    stored).  Rows land in the reserved bid=-2 bulk-append segment so a
    concurrent streaming door's batch-id partitions can never collide
    with them."""
    from .index_maintenance import resolve_dir

    is_delta = F.col("doc_id") % _DELTA_MOD == _DELTA_REM
    # both artifacts derive from (doc_id, th) — persist the narrow
    # projection so the shard tokenize+md5 pass runs once, not once per
    # write (the write_lsh_index rule applied to the append job)
    delta = (
        _with_token_hashes(spark, sf_dir, spread=True)
        .filter(is_delta)
        .filter(F.size("th") > 0)
        .select("doc_id", "th")
        .persist()
    )
    try:
        (
            delta
            .withColumn("tb", _tok_bucket(F.col("doc_id")))
            .withColumn("bid", F.lit(LSH_BULK_APPEND_BID))
            .repartition("tb")
            .write.partitionBy("tb", "bid")
            .mode("append")
            .parquet(resolve_dir(os.path.join(out_path, "tokens")))
        )
        (
            _banded(delta.select("doc_id", *_minhash_cols_spark()))
            .withColumn("bid", F.lit(LSH_BULK_APPEND_BID))
            .repartition("band_no")
            .write.partitionBy("band_no", "bid")
            .mode("append")
            .parquet(resolve_dir(os.path.join(out_path, "bands")))
        )
    finally:
        delta.unpersist()


# ---------------------------------------------------------------------------
# q94 — shard admission: the admit/drop decision per incoming document
# ---------------------------------------------------------------------------


def _q94_oracle() -> str:
    return f"""
    WITH pairs AS ({_q79_oracle()}),
    flags AS (
        SELECT doc_id % {_DELTA_MOD} = {_DELTA_REM} AS _d, * FROM documents
    ),
    dupbase AS (
        SELECT DISTINCT CASE WHEN doc_a % {_DELTA_MOD} = {_DELTA_REM}
                             THEN doc_a ELSE doc_b END AS doc_id
        FROM pairs WHERE kind = 'delta_base'
    ),
    duppeer AS (
        SELECT DISTINCT doc_b AS doc_id FROM pairs
        WHERE kind = 'delta_delta'
    )
    SELECT f.doc_id,
           db.doc_id IS NOT NULL AS dups_base,
           dp.doc_id IS NOT NULL AS dups_earlier_peer,
           db.doc_id IS NULL AND dp.doc_id IS NULL AS admit,
           CASE WHEN db.doc_id IS NOT NULL THEN 'near_dup_of_base'
                WHEN dp.doc_id IS NOT NULL THEN 'near_dup_of_earlier_peer'
                ELSE 'admitted' END AS reason
    FROM flags f
    LEFT JOIN dupbase db ON db.doc_id = f.doc_id
    LEFT JOIN duppeer dp ON dp.doc_id = f.doc_id
    WHERE f._d
    """


@_register("q94_shard_admission", oracle=_q94_oracle())
def q94_shard_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decision layer over q79's pair graph: an incoming document is
    DROPPED if it near-duplicates any base document (the corpus already
    has it) or an earlier peer in its own shard (doc_a < doc_b keeps the
    first copy), otherwise admitted — one row per shard document with the
    reason, ready to gate `append_shard_to_index`.

    Scale shape: q79's pair output is bounded by real duplication, so
    both decision joins are BROADCAST against the shard; the shard scan
    itself is one narrow filtered pass."""
    pairs = q79_incremental_dedup(spark, sf_dir)
    is_delta = F.col("doc_id") % _DELTA_MOD == _DELTA_REM
    shard = load_table(spark, sf_dir, "documents").filter(is_delta).select("doc_id")
    dup_base = (
        pairs.filter(F.col("kind") == "delta_base")
        .select(
            F.when(F.col("doc_a") % _DELTA_MOD == _DELTA_REM, F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("doc_id")
        )
        .distinct()
        .withColumn("dups_base", F.lit(True))
    )
    dup_peer = (
        pairs.filter(F.col("kind") == "delta_delta")
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("dups_earlier_peer", F.lit(True))
    )
    out = (
        shard.join(F.broadcast(dup_base), "doc_id", "left")
        .join(F.broadcast(dup_peer), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("dups_base", F.lit(False)).alias("dups_base"),
            F.coalesce("dups_earlier_peer", F.lit(False)).alias("dups_earlier_peer"),
        )
    )
    return out.select(
        "doc_id",
        "dups_base",
        "dups_earlier_peer",
        (~F.col("dups_base") & ~F.col("dups_earlier_peer")).alias("admit"),
        F.when(F.col("dups_base"), "near_dup_of_base")
        .when(F.col("dups_earlier_peer"), "near_dup_of_earlier_peer")
        .otherwise("admitted")
        .alias("reason"),
    )
