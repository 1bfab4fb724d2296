"""Behavioral tests for the round-5 curation/training operators (q58-q63):
semantic-dedup keep semantics, leakage-audit consistency, training-order
permutation invariants, dup-span bounds, merge-candidate ordering, and
importance-weight direction — properties the oracle hash can't state."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def q():
    return entry_mod.queries()


def test_semantic_dedup_keeps_lowest_id_per_group(spark, q):
    rows = q["q58_semantic_dedup"](spark, SF_DIR).collect()
    assert len(rows) == 500  # one verdict per vector
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r.cell, []).append(r)
    # every cell keeps at least one vector, and any vector with zero
    # duplicates is kept (nothing to dedup against)
    for cell, members in by_cell.items():
        assert any(m.is_kept for m in members), f"cell {cell} kept nothing"
        for m in members:
            if m.n_sem_dups == 0:
                assert m.is_kept
    # a dropped vector must have a lower-id kept-or-dropped neighbor: the
    # greedy rule is "drop iff some lower-id neighbor above the bar"
    dropped = [r for r in rows if not r.is_kept]
    assert dropped, "corpus plants near-duplicate embeddings; some must drop"
    for r in dropped:
        assert r.n_sem_dups >= 1


def test_semantic_dedup_drop_rate_is_surgical(spark, q):
    """The threshold must remove the planted near-dups, not decimate the
    corpus (a tau regression to random-pair level reads >50% dropped)."""
    df = q["q58_semantic_dedup"](spark, SF_DIR)
    dropped = df.filter(~F.col("is_kept")).count()
    assert 1 <= dropped <= 100


def test_split_leakage_pairs_are_near_dups_crossing_splits(spark, q):
    leaks = q["q59_split_leakage"](spark, SF_DIR).collect()
    assert leaks, "with random hash splits some near-dup pair must cross"
    pairs = {
        (r.doc_a, r.doc_b)
        for r in q["q25_lsh_near_dup"](spark, SF_DIR).collect()
    }
    splits = {
        r.doc_id: r.split for r in q["q50_split_assign"](spark, SF_DIR).collect()
    }
    for r in leaks:
        assert (r.doc_a, r.doc_b) in pairs  # subset of the near-dup graph
        assert r.split_a != r.split_b
        assert splits[r.doc_a] == r.split_a  # labels agree with q50
        assert splits[r.doc_b] == r.split_b


def test_training_order_is_a_permutation_and_deterministic(spark, q):
    rows = q["q60_training_order"](spark, SF_DIR).collect()
    n_seqs = (
        q["q52_sequence_packing"](spark, SF_DIR)
        .select("source", "seq_no")
        .distinct()
        .count()
    )
    assert len(rows) == n_seqs
    assert sorted(r.position for r in rows) == list(range(1, n_seqs + 1))
    # position order is exactly (hash, source, seq_no) order
    by_pos = sorted(rows, key=lambda r: r.position)
    assert by_pos == sorted(
        rows, key=lambda r: (r.order_hash, r.source, r.seq_no)
    )
    again = q["q60_training_order"](spark, SF_DIR).collect()
    assert {(r.source, r.seq_no): r.position for r in rows} == {
        (r.source, r.seq_no): r.position for r in again
    }


def test_dup_ngram_spans_bounds_and_planted_dups(spark, q):
    rows = q["q61_dup_ngram_spans"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_dup_positions <= r.n_grams
        assert abs(r.dup_fraction - round(r.n_dup_positions / r.n_grams, 6)) < 1e-9
    # the corpus plants near-duplicate documents that share 8-token runs
    assert any(r.dup_fraction > 0 for r in rows)


def test_merge_candidates_ordering(spark, q):
    rows = q["q62_bpe_merge_candidates"](spark, SF_DIR).collect()
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == list(
        range(1, len(rows) + 1)
    )
    by_rank = sorted(rows, key=lambda r: r.rank)
    for a, b in zip(by_rank, by_rank[1:]):
        assert (-a.pair_count, a.left_tok, a.right_tok) < (
            -b.pair_count,
            b.left_tok,
            b.right_tok,
        )
        assert a.pair_count >= 1


def test_importance_weights_tilt_toward_target(spark, q):
    df = q["q63_importance_weights"](spark, SF_DIR)
    r = {
        row.is_en: row.m
        for row in df.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("avg_log_ratio").alias("m"))
        .collect()
    }
    # the en-fit LM must score en documents above the rest on average —
    # the direction DSIR sampling relies on
    assert r[True] > r[False]


def test_lsh_cluster_recall_gate(spark, q):
    """q69's measurement: pair-level recall of 4x4 banding is inherently
    low near the threshold, but CLUSTER recall — would the two near-dups
    be deduped together? — must stay high; the star-linked over-cap
    buckets are what keep template families connected.  found ⇒
    same_cluster always (a q25 edge puts both docs in one component)."""
    rows = q["q69_lsh_recall"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert not (r.found and not r.same_cluster)
    recall = sum(r.same_cluster for r in rows) / len(rows)
    assert recall >= 0.9, f"cluster recall {recall:.3f} regressed"


def test_cluster_split_has_zero_leakage(spark, q):
    """q70's whole point: no q25 near-dup pair may cross splits (both
    members share a cluster, hence a split key, hence a split)."""
    splits = {r.doc_id: r.split for r in q["q70_cluster_split"](spark, SF_DIR).collect()}
    pairs = q["q25_lsh_near_dup"](spark, SF_DIR).collect()
    assert pairs
    for p in pairs:
        assert splits[p.doc_a] == splits[p.doc_b]
    # and it is still a usable 80/10/10-ish split, not one giant bucket
    from collections import Counter
    frac = Counter(splits.values())
    assert frac["train"] / len(splits) > 0.5


def test_training_corpus_split_agrees_with_q70(spark, q):
    """q75's inline split must equal q70's for every curated doc (same
    cluster key, same salt — the composition can't drift)."""
    q70 = {r.doc_id: r.split for r in q["q70_cluster_split"](spark, SF_DIR).collect()}
    rows = q["q75_training_corpus"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.split == q70[r.doc_id]
        assert r.n_tokens > 0


def test_manifest_detects_any_row_change(spark, tmp_path):
    """q85 is only useful if a one-row change moves the fingerprint: copy
    the documents table, flip one character in one row, and assert key_xor
    moves while n_rows stays put (and the untouched tables' rows do not)."""
    import shutil

    import duckdb

    src = "/root/testdata/sf0.001"
    mod = tmp_path / "modified_sf"
    mod.mkdir()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        shutil.copy(f"{src}/{t}.parquet", mod / f"{t}.parquet")
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT doc_id, CASE WHEN doc_id = 3 THEN text || '!' ELSE text END AS text,
                        lang, source, n_chars
                 FROM read_parquet('{src}/documents.parquet'))
            TO '{mod / "documents.parquet"}' (FORMAT PARQUET)"""
    )
    base = {r.table_name: r for r in
            entry_mod.queries()["q85_corpus_manifest"](spark, src).collect()}
    tweaked = {r.table_name: r for r in
               entry_mod.queries()["q85_corpus_manifest"](spark, str(mod)).collect()}
    assert base["documents"].n_rows == tweaked["documents"].n_rows
    assert base["documents"].key_xor != tweaked["documents"].key_xor
    for t in ("embeddings", "events"):
        assert base[t].key_xor == tweaked[t].key_xor
        assert base[t].numeric_sum == tweaked[t].numeric_sum


def test_gap_fill_grid_is_dense_and_fill_is_correct(spark):
    """q86: per type the hourly grid is contiguous, gap rows carry the most
    recent earlier value, and n_events totals the raw stream."""
    rows = entry_mod.queries()["q86_gap_fill"](spark, "/root/testdata/sf0.01").collect()
    ev_n = spark.read.parquet("/root/testdata/sf0.01/events.parquet").count()
    assert sum(r.n_events for r in rows) == ev_n
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    assert len(by_type) == 5
    saw_gap = False
    for rs in by_type.values():
        rs.sort(key=lambda r: r.hour_us)
        hours = [r.hour_us for r in rs]
        assert hours == list(range(hours[0], hours[-1] + 1, 3_600_000_000)), "grid not dense"
        last = None
        for r in rs:
            if r.is_gap:
                saw_gap = True
                assert r.n_events == 0
                if last is not None:
                    assert r.filled_value == last
            else:
                assert r.n_events > 0
                last = r.filled_value
    assert saw_gap, "fixture produced no gaps — grid too coarse"


def test_retention_cohort_week_zero_is_full(spark):
    """q87: every user is active in their own cohort week, so offset 0 has
    retention exactly 1.0; later offsets never exceed the cohort size."""
    rows = entry_mod.queries()["q87_retention_cohorts"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert rows
    zero = [r for r in rows if r.week_offset == 0]
    assert zero and all(r.n_active == r.cohort_size and r.retention == 1.0 for r in zero)
    assert all(r.week_offset >= 0 and 0 < r.n_active <= r.cohort_size for r in rows)


def test_hll_sketches_are_accurate_and_mergeable(spark):
    """q88: estimates land within 5% of exact, and a union of per-source
    partial sketches estimates the same cardinality as one global sketch
    (within HLL noise) — the mergeability that makes sketches the 100 TB
    distinct-count form."""
    from pyspark.sql import functions as F

    rows = entry_mod.queries()["q88_distinct_sketches"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert rows and all(r.hll_within_bound for r in rows)
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    merged = (
        ev.groupBy("event_type")
        .agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"))
        .collect()[0]
        .est
    )
    direct = (
        ev.agg(F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias("est"))
        .collect()[0]
        .est
    )
    exact = ev.select("user_id").distinct().count()
    assert abs(merged - exact) / exact <= 0.05
    assert abs(direct - exact) / exact <= 0.05


def test_funnel_order_constraint_binds(spark, tmp_path):
    """q89: step counts are monotonically non-increasing on the fixture,
    and on a constructed corpus a user whose purchase precedes any
    qualifying click must NOT convert (the ts constraint is live)."""
    rows = {r.step: r for r in
            entry_mod.queries()["q89_funnel"](spark, "/root/testdata/sf0.01").collect()}
    assert rows["view"].n_users >= rows["click"].n_users >= rows["purchase"].n_users
    assert rows["view"].conv_from_prev == 1.0 and rows["view"].conv_overall == 1.0

    # micro-fixture: user 1 = proper order; user 2 = purchase BEFORE click
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    mk = lambda m: base + dt.timedelta(minutes=m)
    data = [
        (1, mk(0), 1, "view", 1.0, ""), (2, mk(1), 1, "click", 1.0, ""),
        (3, mk(2), 1, "purchase", 1.0, ""),
        (4, mk(0), 2, "view", 1.0, ""), (5, mk(2), 2, "click", 1.0, ""),
        (6, mk(1), 2, "purchase", 1.0, ""),  # before the click
    ]
    df = spark.createDataFrame(
        data, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    micro = {r.step: r for r in
             entry_mod.queries()["q89_funnel"](spark, str(tmp_path)).collect()}
    assert micro["view"].n_users == 2 and micro["click"].n_users == 2
    assert micro["purchase"].n_users == 1, "out-of-order purchase converted"


def test_jaccard_histogram_mass_accounts_for_all_pairs(spark):
    """q110: shares sum to 1, bins stay in [0, 9], and on this exact-dup-
    heavy fixture the top bin (jaccard ~1.0) carries real mass."""
    rows = entry_mod.queries()["q110_jaccard_histogram"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert rows and all(0 <= r.bin <= 9 for r in rows)
    assert abs(sum(r.share for r in rows) - 1.0) < 0.005
    top = next((r for r in rows if r.bin == 9), None)
    assert top is not None and top.n_pairs > 0


def test_source_dup_matrix_is_unordered_and_covers_pairs(spark):
    """q111: cells are unordered (source_a <= source_b), totals equal the
    pair graph, and the fixture's template families span sources (off-
    diagonal mass exists)."""
    rows = entry_mod.queries()["q111_source_dup_matrix"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert rows and all(r.source_a <= r.source_b for r in rows)
    n_pairs = entry_mod.queries()["q25_lsh_near_dup"](
        spark, "/root/testdata/sf0.01"
    ).count()
    assert sum(r.n_pairs for r in rows) == n_pairs
    assert any(r.source_a != r.source_b for r in rows), "no cross-source dups found"
    assert all(0 <= r.n_exact <= r.n_pairs for r in rows)
