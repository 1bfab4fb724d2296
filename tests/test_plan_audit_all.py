"""Whole-registry plan audit: EVERY registered query's physical plan is
held to the two invariants that decide 100 TB viability —

1. no unbounded join shapes (CartesianProduct / BroadcastNestedLoopJoin)
   anywhere, ever;
2. no row-at-a-time Python (BatchEvalPython) anywhere; Arrow-batched
   Python (ArrowEvalPython / mapInPandas / FlatMapGroupsInPandas) is
   allowed ONLY for the explicitly whitelisted detector/codec/BPE paths
   whose semantics genuinely need numpy;
3. no Window without a partitionBy — an unpartitioned window sorts its
   whole input through ONE task — except over inputs that are provably
   bounded (a post-limit(k) frame, a bucket-alphabet offsets table, the
   funnel's step list), each whitelisted with its bound.

The sampled pins in test_plan_quality.py check specific shapes; this
audit guarantees no NEW query can regress the baseline invariants
without showing up in review."""

import contextlib
import io

import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

# queries whose plans legitimately carry a BroadcastNestedLoopJoin: every
# one is a SCALAR (1-row aggregate: corpus totals, quantizer bounds, the
# Zipf fit) or a tiny query-side broadcast joined under a non-equi
# condition — a nested loop over a 1-row build side is a map, not a
# blow-up.  A BNLJ in any OTHER query fails the audit.
_BNLJ_OK = {
    "daq_full_chain",        # run-window scalar joined to the event table
    "q27_ann_topk",          # |Q|-row broadcast, vec_id != query_id
    "q41_embedding_quantize",  # per-dim min/max bounds (1 row)
    "q47_ann_recall",        # ground-truth side under a != condition
    "q51_ivf_sq8_ann",       # quantizer bounds (1 row)
    "q54_tfidf_keywords",    # corpus N (1 row)
    "q55_unigram_quality",   # vocab total (1 row)
    "q119_bigram_quality",   # context-vocab total (1 row)
    "q57_mixture_epochs",    # mixture totals (1 row)
    "q63_importance_weights",  # target/proposal totals (1 row)
    "q69_lsh_recall",        # recall denominators (1 row)
    "q77_mixture_budget",    # grand total (1 row)
    "q99_token_zipf",        # the fitted slope (1 row)
    "q104_split_agreement",  # corpus total (1 row)
    "q109_customer_deciles",  # revenue total (1 row)
    "q110_jaccard_histogram",  # pair-count total (1 row)
    "q112_bm25_topk",        # N/avgdl scalar (1 row)
    "q114_bm25_indexed",     # stats artifact scalar (1 row)
    "q116_hybrid_rrf",       # N/avgdl scalar (1 row, BM25 leg)
    "q117_hard_negatives",   # N/avgdl scalar (1 row, BM25 leg)
}

# queries whose plans carry an UNPARTITIONED window over a provably
# bounded input — the bound is the whole justification, so name it.
# Any other query with a global window fails the audit (the q109/q99
# rewrites replaced corpus-sized global windows with two-phase ranks).
_GLOBAL_WINDOW_OK = {
    "q60_training_order",      # 256-row bucket-offset table (hash-prefix alphabet)
    "q62_bpe_merge_candidates",  # rank over a post-limit(50) frame
    "q89_funnel",              # lead over the 3-row funnel-step list
    "q90_weighted_sample",     # rank over a post-limit(25) frame
    "q99_token_zipf",          # band-offset table (<= 4*64 log2 cells)
    "q109_customer_deciles",   # bucket-offset table (<= 128*64 log2 cells)
}

# queries whose plans legitimately run Arrow-batched Python
_PANDAS_OK = {
    "q14_threshold_detect",
    "q30_differential_detect",
    "q31_advanced_muon",
    "q32_daq_stats",
    "daq_full_chain",
    "trace_file_ingest",
    "multimodal_features",
    "q37_envelope_roundtrip",
    "q38_dev2_roundtrip",
    "q91_bpe_learn",
    "q92_bpe_encode",
}

_NAMES = sorted(entry_mod.queries())


def _global_windows(df):
    """Window nodes with an empty partitionSpec in the optimized logical
    plan (the physical plan hides behind AdaptiveSparkPlanExec)."""
    hits = []

    def walk(node):
        if (
            node.getClass().getSimpleName() == "Window"
            and node.partitionSpec().size() == 0
        ):
            hits.append(str(node.windowExpressions().apply(0))[:120])
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return hits


@pytest.mark.parametrize("name", _NAMES)
def test_plan_invariants(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "CartesianProduct" not in p, f"{name}: cartesian product"
    if name not in _BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in p, f"{name}: nested-loop join"
    assert "BatchEvalPython" not in p, f"{name}: row-at-a-time Python"
    if name not in _PANDAS_OK:
        for marker in ("ArrowEvalPython", "FlatMapGroupsInPandas", "MapInPandas"):
            assert marker not in p, f"{name}: unexpected Python stage {marker}"
    if name not in _GLOBAL_WINDOW_OK:
        gw = _global_windows(df)
        assert not gw, f"{name}: unpartitioned window(s): {gw}"
