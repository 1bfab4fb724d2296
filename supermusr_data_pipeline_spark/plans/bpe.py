"""BPE tokenizer training and application as Spark jobs (q91/q92).

Byte-pair encoding is THE tokenizer-construction step of an LLM data
pipeline; q62 surfaces single-pass merge candidates, this module runs the
real iterative algorithm.  Training operates on the distinct-WORD
frequency table (the classic Sennrich formulation: corpus -> (word, freq),
each word a symbol sequence), which is the right distributed shape — the
iterative state is the vocabulary, orders of magnitude smaller than the
corpus, yet still a DataFrame (millions of distinct words at 100 TB, never
a driver-side dict):

- per iteration: explode each word's adjacent symbol pairs weighted by
  word frequency (narrow), one keyed aggregation for pair counts, a 1-row
  argmax collect (count desc, then lexicographic pair — deterministic
  ties), then a mapInPandas pass rewriting symbol sequences that contain
  the merged pair.  Word rows are independent, so the rewrite
  parallelizes with the table's partitioning.
- the merge TABLE (<= n_merges rows) is the learned artifact; application
  (q92) tokenizes the distinct words once with the collected merge list
  (Arrow-batched, greedy lowest-rank-first — the standard BPE apply) and
  broadcast-joins word -> token count back onto documents, so encode cost
  is O(distinct words), not O(corpus).
- ``batch_k > 1`` amortizes the per-merge driver round-trip (the 50k-merge
  production concern): each scan selects up to k SYMBOL-DISJOINT merges —
  disjoint pairs' occurrences cannot overlap, so the scan's counts are
  their true sequential counts — applied in one rewrite pass.  The honest
  trade: sequential BPE builds chains ('t'+'h' then 'th'+'e') that a batch
  cannot see, so the batched table compresses slightly worse at equal
  merge count (gated <= 10% on the fixture, tests/test_bpe.py); k=1 stays
  the default, pinned byte-exact against the pure-Python reference.

Determinism: exact integer pair counts + lexicographic tie-break make the
merge list independent of partitioning; tests/test_bpe.py pins the Spark
learner EXACTLY against a pure-Python reference implementation.

No SQL oracle (iterative fixpoint — not expressible as one query): q91/q92
register as rows-only checks per the driver contract, with the reference
equivalence and roundtrip gates carrying correctness.

Reference: Sennrich, Haddow, Birch, "Neural Machine Translation of Rare
Words with Subword Units" (ACL 2016) — public method, original
implementation.  LLM-extension scope (no reference-repo analog).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_table
from .relational import _register
from .text_dedup import _TOKENS_EXPR_SPARK

_BPE_MERGES = 30
_END = "</w>"  # end-of-word marker so merges can learn suffixes


def _word_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.expr(_TOKENS_EXPR_SPARK)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    # word -> [c1, c2, ..., cn, </w>]
    return words.select(
        "word",
        "freq",
        F.expr(
            f"concat(transform(split(word, ''), c -> c), array('{_END}'))"
        ).alias("syms"),
    )


# learned (merge list, scan rounds) per (appId, sf_dir, n_merges, batch_k):
# the training artifact is tiny (<= n_merges string pairs) and
# deterministic, so one learn per session serves q91, q92, and any test
# that needs the ranks.  Rounds ride in the cache entry — a module global
# would go stale on cache hits and race concurrent learns.
_LEARNED: dict = {}


def _select_compatible(top_rows, k: int, remaining: int) -> list[tuple[str, str]]:
    """Greedy top-k batch from one scan's sorted pair counts: a pair joins
    the batch only if its symbols are DISJOINT from every already-selected
    pair's.  Disjointness is what makes the batch exact-ish: occurrences of
    symbol-disjoint pairs cannot overlap, so applying one cannot change the
    others' counts — the stale scan counts are the true sequential counts.
    The only divergence from k=1 is that a pair CREATED by a merge this
    round (involving the new symbol) cannot out-rank the batch's tail; the
    k=1 path stays the pinned-against-reference default."""
    selected: list[tuple[str, str]] = []
    used: set[str] = set()
    for r in top_rows:
        if len(selected) >= min(k, remaining):
            break
        if r.n < 2:
            break
        if r.a in used or r.b in used:
            continue
        selected.append((r.a, r.b))
        used.update((r.a, r.b))
    return selected


def learn_bpe_merges(
    spark: SparkSession,
    sf_dir: str,
    n_merges: int = _BPE_MERGES,
    batch_k: int = 1,
) -> list[tuple[str, str]]:
    """Run iterative BPE training; returns the ordered merge list.

    ``batch_k > 1`` selects up to k symbol-disjoint merges per corpus scan
    and applies them in ONE rewrite pass — the driver round-trip count
    (the 50k-merge production concern) drops ~k x.  ``batch_k=1`` is the
    classic Sennrich loop, pinned byte-exact against the pure-Python
    reference in tests/test_bpe.py."""
    key = (spark.sparkContext.applicationId, sf_dir, n_merges, batch_k)
    hit = _LEARNED.get(key)
    if hit is not None:
        return list(hit[0])
    from ..materialize import materialize
    from .text_dedup import _persistent_rdd_ids, _unpersist_rdd_ids

    sc = spark.sparkContext
    before = _persistent_rdd_ids(sc)
    syms = materialize(_initial_symbols(_word_freqs(spark, sf_dir)))
    merges: list[tuple[str, str]] = []
    rounds = 0
    try:
        while len(merges) < n_merges:
            pairs = (
                # fully-merged words (one symbol) emit no pairs — and must
                # be excluded BEFORE sequence(): sequence(0, -1) descends
                syms.filter(F.size("syms") >= 2).select(
                    "freq",
                    F.explode(
                        F.expr(
                            "transform(sequence(0, size(syms) - 2), "
                            "i -> struct(syms[i] as a, syms[i + 1] as b))"
                        )
                    ).alias("p"),
                )
                .groupBy("p.a", "p.b")
                .agg(F.sum("freq").alias("n"))
            )
            # headroom over k: compat filtering may skip sorted rows
            top = (
                pairs.orderBy(F.desc("n"), "a", "b")
                .limit(max(1, batch_k * 8))
                .collect()
            )
            rounds += 1
            selected = _select_compatible(top, batch_k, n_merges - len(merges))
            if not selected:
                break
            merges.extend(selected)
            pairmap = {pair: pair[0] + pair[1] for pair in selected}

            def merge_fn(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                for pdf in pdfs:
                    out = []
                    for s in pdf["syms"]:
                        s = list(s)
                        i, res = 0, []
                        while i < len(s):
                            m = (
                                pairmap.get((s[i], s[i + 1]))
                                if i + 1 < len(s)
                                else None
                            )
                            if m is not None:
                                res.append(m)
                                i += 2
                            else:
                                res.append(s[i])
                                i += 1
                        out.append(res)
                    pdf = pdf.copy()
                    pdf["syms"] = out
                    yield pdf

            held = _persistent_rdd_ids(sc)
            syms = materialize(
                syms.mapInPandas(
                    merge_fn, "word string, freq bigint, syms array<string>"
                )
            )
            # release the superseded round's checkpoint blocks (DataFrame
            # .unpersist() does NOT free localCheckpoint RDDs — the CC
            # rounds in text_dedup learned the same lesson)
            _unpersist_rdd_ids(sc, held - before)
        _LEARNED[key] = (list(merges), rounds)
        return merges
    finally:
        _unpersist_rdd_ids(sc, _persistent_rdd_ids(sc) - before)


def bpe_scan_rounds(
    spark: SparkSession,
    sf_dir: str,
    n_merges: int = _BPE_MERGES,
    batch_k: int = 1,
) -> int:
    """Corpus-scan rounds the learn took (learning first if not cached) —
    the batched-selection claim is "rounds drop ~k x", and this is the
    number a test gates on.  Read from the cache entry, so it is correct
    for THIS parameter tuple regardless of other learns in the session."""
    learn_bpe_merges(spark, sf_dir, n_merges=n_merges, batch_k=batch_k)
    key = (spark.sparkContext.applicationId, sf_dir, n_merges, batch_k)
    return _LEARNED[key][1]


def apply_bpe(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first BPE apply (the standard algorithm)."""
    s = list(word) + [_END]
    while len(s) > 1:
        best, best_rank = None, None
        for i in range(len(s) - 1):
            r = ranks.get((s[i], s[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        s = s[:best] + [s[best] + s[best + 1]] + s[best + 2 :]
    return s


@_register("q91_bpe_learn")  # rows-only: iterative fixpoint, no SQL oracle
def q91_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table: rank, the merged pair, and the resulting
    symbol — the tokenizer artifact a training run ships.  See module
    docstring for the distributed shape."""
    merges = learn_bpe_merges(spark, sf_dir)
    rows = [(i, a, b, a + b) for i, (a, b) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, merged string"
    )


@_register("q115_bpe_learn_batched")  # rows-only: iterative fixpoint, no SQL oracle
def q115_bpe_learn_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q91's merge table through the BATCHED learner (batch_k=8): each
    corpus scan selects up to 8 symbol-disjoint merges and applies them in
    one rewrite pass, so the driver round-trip count (the 50k-merge
    production concern) drops ~8x.  The output carries the scan-round
    count so the batching is observable in the artifact itself; the
    compression trade vs the k=1 table is gated <= 10% in
    tests/test_bpe.py.  Rows-only per the driver contract (iterative
    fixpoint, no SQL oracle), like q91."""
    merges = learn_bpe_merges(spark, sf_dir, batch_k=8)
    rounds = bpe_scan_rounds(spark, sf_dir, batch_k=8)
    rows = [(i, a, b, a + b, rounds) for i, (a, b) in enumerate(merges)]
    return spark.createDataFrame(
        rows,
        "rank int, left string, right string, merged string, scan_rounds int",
    )


@_register("q92_bpe_encode")  # rows-only: depends on q91's iterative artifact
def q92_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with the learned merges: per document, the
    whitespace token count, the BPE symbol count, and the compression
    ratio the vocabulary buys.  Distinct words tokenize ONCE (Arrow
    batches over the vocabulary table), then BROADCAST-join back onto the
    exploded corpus — encode cost scales with the vocabulary, and the
    corpus pass is one narrow explode + keyed re-aggregation."""
    merges = learn_bpe_merges(spark, sf_dir)
    ranks = {m: i for i, m in enumerate(merges)}

    def encode_fn(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "n_syms": [len(apply_bpe(w, ranks)) for w in pdf["word"]],
                }
            )

    words = _word_freqs(spark, sf_dir).select("word")
    encoded = words.mapInPandas(encode_fn, "word string, n_syms int")
    docs = load_table(spark, sf_dir, "documents")
    exploded = docs.select(
        "doc_id", F.explode(F.expr(_TOKENS_EXPR_SPARK)).alias("word")
    )
    return (
        exploded.join(F.broadcast(encoded), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_words"),
            F.sum("n_syms").cast("int").alias("n_bpe_syms"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_bpe_syms",
            F.round(F.col("n_bpe_syms").cast("double") / F.col("n_words"), 4).alias(
                "syms_per_word"
            ),
        )
    )
