"""Training-set preparation operators — the steps between a curated corpus
and a tokenizer/trainer: sequence packing, vocabulary coverage, keyword
extraction, unigram-LM quality scoring, PII redaction.  Extends the
text_dedup family (BASELINE.json LLM-extension scope; no reference analog)
with the same engine-agnostic discipline: every query has a DuckDB oracle
with identical column aliases, floats rounded in-query so both engines
agree bit-for-bit after canonicalization.

Scale notes: everything is exploded-token relational algebra — shuffles on
token or (source) keys, no Python in any hot path, top-V vocabularies kept
as broadcast dimensions.  The packing window partitions by source (the
shard key a real pipeline packs within), so no global single-partition
window exists anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.testdata import load_table, spread_scan
from .relational import ORACLES, QUERIES, _register
from .text_dedup import _TOKENS_EXPR_SPARK, _TOKENS_SQL_DUCK

# ---------------------------------------------------------------------------
# q52 — sequence packing (concat-then-chunk at document granularity)
# ---------------------------------------------------------------------------

_PACK_BUDGET = 256  # tokens per training sequence


@_register(
    "q52_sequence_packing",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source, len({_TOKENS_SQL_DUCK}) AS n_tokens
        FROM documents
    ), c AS (
        SELECT doc_id, source, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cum_before
        FROM t WHERE n_tokens > 0
    )
    SELECT doc_id, source, n_tokens, cum_before,
           CAST(floor(cum_before / {_PACK_BUDGET}.0) AS BIGINT) AS seq_no
    FROM c
    """,
)
def q52_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each document to a fixed-token-budget training sequence:
    within a source shard, documents are concatenated in doc_id order and
    chunked every _PACK_BUDGET tokens (the GPT-style concat-then-chunk
    scheme, tracked at document granularity so provenance survives).

    Scale shape: one window per SOURCE partition — the shard key a real
    packing job works within — so parallelism is per-shard and no global
    ordering exists; the cumulative sum is a single exchange on source.
    Deterministic and retry-stable (pure function of doc_id order)."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.expr(_TOKENS_EXPR_SPARK))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = docs.select("doc_id", "source", n_tok.alias("n_tokens")).filter(
        F.col("n_tokens") > 0
    )
    cum = t.withColumn("cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return cum.select(
        "doc_id",
        "source",
        "n_tokens",
        "cum_before",
        F.floor(F.col("cum_before") / _PACK_BUDGET).cast("bigint").alias("seq_no"),
    )


# ---------------------------------------------------------------------------
# q53 — vocabulary coverage (top-V vocab fit + per-doc OOV rate)
# ---------------------------------------------------------------------------

_VOCAB_SIZE = 100


@_register(
    "q53_vocab_coverage",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({_TOKENS_SQL_DUCK}) AS token FROM documents
    ), freq AS (
        SELECT token, count(*) AS cnt FROM tok GROUP BY token
    ), vocab AS (
        SELECT token FROM freq ORDER BY cnt DESC, token LIMIT {_VOCAB_SIZE}
    ), per AS (
        SELECT t.doc_id, count(*) AS n_tokens,
               CAST(sum(CASE WHEN v.token IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_in_vocab
        FROM tok t LEFT JOIN vocab v ON t.token = v.token
        GROUP BY t.doc_id
    )
    SELECT doc_id, n_tokens, n_in_vocab,
           round(1.0 - n_in_vocab / CAST(n_tokens AS DOUBLE), 6) AS oov_rate
    FROM per
    """,
)
def q53_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit a top-V frequency vocabulary over the corpus (deterministic
    count-desc/token-asc order) and score every document's coverage: the
    fraction of token OCCURRENCES that fall outside the vocabulary — the
    go/no-go statistic for sizing a tokenizer's vocab.

    Scale shape: one token-count shuffle to fit the vocab; the vocab is a
    tiny broadcast dimension, so the per-doc scoring pass is a broadcast
    join plus one doc_id aggregation — the corpus is touched twice, never
    joined to itself."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.expr(_TOKENS_EXPR_SPARK)).alias("token")
    )
    vocab = (
        tok.groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(_VOCAB_SIZE)
        .select("token", F.lit(1).alias("in_vocab"))
    )
    joined = tok.join(F.broadcast(vocab), "token", "left")
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.coalesce("in_vocab", F.lit(0))).alias("n_in_vocab"),
    ).select(
        "doc_id",
        "n_tokens",
        "n_in_vocab",
        F.round(
            1.0 - F.col("n_in_vocab") / F.col("n_tokens").cast("double"), 6
        ).alias("oov_rate"),
    )


# ---------------------------------------------------------------------------
# q54 — TF-IDF keyword extraction (per-doc top-k)
# ---------------------------------------------------------------------------

_TFIDF_K = 3


@_register(
    "q54_tfidf_keywords",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({_TOKENS_SQL_DUCK}) AS token FROM documents
    ), tf AS (
        SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token
    ), dl AS (
        SELECT doc_id, sum(tf) AS dlen FROM tf GROUP BY doc_id
    ), idf AS (
        SELECT token, count(*) AS df FROM tf GROUP BY token
    ), n AS (
        SELECT count(DISTINCT doc_id) AS n_docs FROM tok
    ), s AS (
        SELECT tf.doc_id, tf.token,
               round((tf.tf / CAST(dl.dlen AS DOUBLE))
                     * ln(CAST(n.n_docs AS DOUBLE) / idf.df), 6) AS tfidf
        FROM tf JOIN dl USING (doc_id) JOIN idf USING (token) CROSS JOIN n
    ), r AS (
        SELECT doc_id, token, tfidf,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rnk
        FROM s
    )
    SELECT doc_id, token, tfidf, rnk FROM r WHERE rnk <= {_TFIDF_K}
    """,
)
def q54_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-k tokens by TF-IDF (tf = in-doc occurrence share,
    idf = ln(N/df)) — the classic keyword/topic signal a curation UI or a
    domain-mix report is built on.  Ranking happens on the ROUNDED score
    with a token tie-break, so both engines rank identically.

    Scale shape: one (doc, token) count shuffle; doc length is a partial
    re-aggregation of that same keyed frame; the df table shuffles on
    token; the final top-k is a bounded per-doc window.  No self-join of
    the raw corpus anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.expr(_TOKENS_EXPR_SPARK)).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dlen"))
    idf = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = tf.select("doc_id").distinct().agg(F.count("*").alias("n_docs"))
    s = (
        tf.join(dl, "doc_id")
        .join(idf, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            F.round(
                (F.col("tf") / F.col("dlen").cast("double"))
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        s.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TFIDF_K)
        .select("doc_id", "token", "tfidf", "rnk")
    )


# ---------------------------------------------------------------------------
# q55 — unigram-LM quality score (CCNet-style perplexity proxy)
# ---------------------------------------------------------------------------


@_register(
    "q55_unigram_quality",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({_TOKENS_SQL_DUCK}) AS token FROM documents
    ), cnt AS (
        SELECT token, count(*) AS c FROM tok GROUP BY token
    ), tot AS (
        SELECT count(*) AS total FROM tok
    )
    SELECT t.doc_id, count(*) AS n_tokens,
           round(sum(-ln(cnt.c / CAST(tot.total AS DOUBLE))) / count(*), 6)
               AS avg_neg_logprob
    FROM tok t JOIN cnt USING (token) CROSS JOIN tot
    GROUP BY t.doc_id
    """,
)
def q55_unigram_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score each document by its average negative log-probability under a
    corpus-fit unigram LM — the cheap stand-in for the KenLM perplexity
    filter of CCNet-style pipelines (low = boilerplate-typical, high =
    rare-token noise; both tails get filtered in practice).

    Scale shape: one token-count shuffle fits the LM; scoring joins the
    exploded corpus to the count table on token (standard shuffle join —
    the vocab of a web corpus outgrows a broadcast) and re-aggregates per
    doc.  The corpus-total is a broadcast scalar, kept in-plan (no driver
    collect)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.expr(_TOKENS_EXPR_SPARK)).alias("token")
    )
    cnt = tok.groupBy("token").agg(F.count("*").alias("c"))
    tot = tok.agg(F.count("*").alias("total"))
    return (
        tok.join(cnt, "token")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.sum(-F.log(F.col("c") / F.col("total").cast("double")))
                / F.count("*"),
                6,
            ).alias("avg_neg_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# q57 — mixture construction with computed epoch repeats (up/down-sampling)
# ---------------------------------------------------------------------------

# target RELATIVE weights per source; sources not listed get the default.
# Weights are normalized over the sources actually observed, so the op is
# total-token-preserving in expectation regardless of what the corpus holds.
_MIX_TARGETS = {"src0": 0.20, "src1": 0.10, "src2": 0.01}
_MIX_DEFAULT = 0.02
_MIX_DENOM = 1_000_000  # hash-gate resolution for fractional epochs


def _mix_weight_case_duck() -> str:
    arms = " ".join(
        f"WHEN '{s}' THEN {w}" for s, w in sorted(_MIX_TARGETS.items())
    )
    return f"CASE source {arms} ELSE {_MIX_DEFAULT} END"


@_register(
    "q57_mixture_epochs",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source, len({_TOKENS_SQL_DUCK}) AS n_tokens
        FROM documents
    ), s AS (
        SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
        FROM t WHERE n_tokens > 0 GROUP BY source
    ), w AS (
        SELECT source, src_tokens, {_mix_weight_case_duck()} AS wraw FROM s
    ), n AS (
        SELECT sum(wraw) AS wsum, CAST(sum(src_tokens) AS DOUBLE) AS total
        FROM w
    ), r AS (
        SELECT w.source,
               (n.total * (w.wraw / n.wsum)) / CAST(w.src_tokens AS DOUBLE)
                   AS rep
        FROM w CROSS JOIN n
    ), d AS (
        SELECT t.doc_id, t.source, t.n_tokens, r.rep,
               CAST(floor(r.rep) AS BIGINT) AS n_full,
               ('0x' || substr(md5('mix:' || t.doc_id::VARCHAR), 1, 8))
                   ::UBIGINT::BIGINT % {_MIX_DENOM} AS gate_key
        FROM t JOIN r USING (source) WHERE t.n_tokens > 0
    )
    SELECT doc_id, source, n_tokens, CAST(u.epoch AS BIGINT) AS epoch
    FROM d, unnest(generate_series(0, n_full)) AS u(epoch)
    WHERE epoch < n_full OR gate_key < (rep - n_full) * {_MIX_DENOM}
    """,
)
def q57_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a training mixture from target source weights: per-source
    repeat factors are COMPUTED from the corpus (target token share over
    actual token share, normalized across observed sources and preserving
    the total token budget in expectation), then applied as whole epoch
    copies plus a deterministic hash gate for the fractional epoch — the
    Llama/Dolma-style up/down-sampling step, reproducible across retries
    because no rand() exists anywhere.

    Output is one row per (document, epoch): epochs 0..n_full-1 are the
    guaranteed copies, epoch n_full survives the fractional gate.

    Scale shape: one partial-agg shuffle fits the per-source token stats
    (20-ish rows); the repeat table broadcasts back onto the corpus, and
    the epoch explode is narrow — the corpus is scanned twice, joined to
    itself never."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "source", F.size(F.expr(_TOKENS_EXPR_SPARK)).alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    s = t.groupBy("source").agg(F.sum("n_tokens").alias("src_tokens"))
    wraw = F.lit(_MIX_DEFAULT)
    for src, wgt in sorted(_MIX_TARGETS.items()):
        wraw = F.when(F.col("source") == src, F.lit(wgt)).otherwise(wraw)
    w = s.select("source", "src_tokens", wraw.alias("wraw"))
    n = w.agg(
        F.sum("wraw").alias("wsum"),
        F.sum("src_tokens").cast("double").alias("total"),
    )
    r = w.crossJoin(F.broadcast(n)).select(
        "source",
        (
            (F.col("total") * (F.col("wraw") / F.col("wsum")))
            / F.col("src_tokens").cast("double")
        ).alias("rep"),
    )
    gate_key = F.expr(
        f"cast(conv(substr(md5(concat('mix:', cast(doc_id as string))), 1, 8),"
        f" 16, 10) as bigint) % {_MIX_DENOM}"
    )
    d = t.join(F.broadcast(r), "source").select(
        "doc_id",
        "source",
        "n_tokens",
        "rep",
        F.floor("rep").cast("bigint").alias("n_full"),
        gate_key.alias("gate_key"),
    )
    return (
        d.select(
            "*", F.explode(F.sequence(F.lit(0), F.col("n_full"))).alias("epoch")
        )
        .filter(
            (F.col("epoch") < F.col("n_full"))
            | (F.col("gate_key") < (F.col("rep") - F.col("n_full")) * _MIX_DENOM)
        )
        .select("doc_id", "source", "n_tokens", F.col("epoch").cast("bigint").alias("epoch"))
    )


# ---------------------------------------------------------------------------
# q56 — PII detection + redaction (regex scrub, shared RE2/Java-safe syntax)
# ---------------------------------------------------------------------------

# patterns restricted to the RE2 ∩ java.util.regex common subset (no
# lookaround), so Spark and the DuckDB oracle scrub identically
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


@_register(
    "q56_pii_redaction",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_PII_EMAIL}')) AS n_emails,
           len(regexp_extract_all(text, '{_PII_PHONE}')) AS n_phones,
           len(regexp_extract_all(
               regexp_replace(text, '{_PII_PHONE}', '[PHONE]', 'g'),
               '{_PII_IP}')) AS n_ips,
           regexp_replace(regexp_replace(regexp_replace(
               text, '{_PII_EMAIL}', '[EMAIL]', 'g'),
                     '{_PII_PHONE}', '[PHONE]', 'g'),
                     '{_PII_IP}', '[IP]', 'g') AS clean_text
    FROM documents
    """,
)
def q56_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect and redact emails, phone numbers, and IPv4 addresses — the
    compliance scrub every training corpus passes through before a
    tokenizer sees it.  Counts ride along so a per-source PII rate report
    is one aggregation away.  IPs are counted AFTER phone redaction (a
    XXX.XXX.XXXX phone would otherwise double-count as a partial IP) —
    the oracle mirrors the same order.

    Scale shape: a pure narrow map — JVM regexp engines row-by-row, no
    shuffle, no Python; predicate-pushdown and column pruning untouched.
    The synthetic corpus contains no PII (all counts 0, text unchanged) —
    the behavioral evidence lives in tests/test_text_train.py's crafted
    fixtures; this query pins the plumbing at corpus scale."""
    return scrub_pii(load_table(spark, sf_dir, "documents"))


def scrub_pii(docs: DataFrame) -> DataFrame:
    """The q56 transform over any (doc_id, text) frame — exposed so tests
    can drive it with crafted PII fixtures (the synthetic corpus has
    none)."""
    return with_pii_scrub(docs).select(
        "doc_id", "n_emails", "n_phones", "n_ips", "clean_text"
    )


def with_pii_scrub(docs: DataFrame) -> DataFrame:
    """Append the PII counts + ``clean_text`` to any frame with a ``text``
    column, preserving the input columns (q56 and the streaming curation
    gate share this single definition)."""
    no_phone = F.regexp_replace("text", _PII_PHONE, "[PHONE]")
    # email FIRST (an address like user@1.2.3.4.net must become [EMAIL],
    # not keep a [IP] inside it), then phone, then ip — oracle order exactly
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("text", _PII_EMAIL, "[EMAIL]"),
            _PII_PHONE,
            "[PHONE]",
        ),
        _PII_IP,
        "[IP]",
    )
    return docs.withColumns(
        {
            "n_emails": F.size(
                F.regexp_extract_all("text", F.lit(_PII_EMAIL), F.lit(0))
            ),
            "n_phones": F.size(
                F.regexp_extract_all("text", F.lit(_PII_PHONE), F.lit(0))
            ),
            "n_ips": F.size(F.regexp_extract_all(no_phone, F.lit(_PII_IP), F.lit(0))),
            "clean_text": clean,
        }
    )


# ---------------------------------------------------------------------------
# q60 — global training order (distributed rank without a global window)
# ---------------------------------------------------------------------------

_ORDER_SALT = "order:v1:"  # rotate to reshuffle the epoch on purpose
_ORDER_BUCKETS = 256  # two hex chars of the order hash


@_register(
    "q60_training_order",
    oracle=f"""
    WITH p AS ({ORACLES["q52_sequence_packing"]}),
    seqs AS (
        SELECT DISTINCT source, seq_no FROM p
    ), h AS (
        SELECT source, seq_no,
               md5('{_ORDER_SALT}' || source || ':' || seq_no::VARCHAR)
                   AS order_hash
        FROM seqs
    )
    SELECT source, seq_no, order_hash,
           CAST(row_number() OVER (ORDER BY order_hash, source, seq_no)
                AS BIGINT) AS position
    FROM h
    """,
)
def q60_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle of the packed training sequences
    (q52's (source, seq_no) units): each sequence's epoch position is the
    rank of a salted hash, so the training order is reproducible under
    retries and rotatable by salt — `rand()`-free, like q50's splits.

    Scale shape: a naive `row_number() OVER (ORDER BY hash)` collapses the
    corpus into ONE partition — the classic window scale-killer.  This
    plan ranks in two phases instead: rows rank locally within 256 hash-
    prefix buckets (the bucket id IS the leading byte of the hash, so
    bucket order is hash order), a 256-row bucket-count table turns into
    exclusive prefix offsets on the driver-side-sized aggregate, and
    global position = broadcast offset + local rank.  The only full-data
    exchange is the bucket hash partitioning; the offset window touches
    {_ORDER_BUCKETS} rows regardless of corpus size."""
    seqs = (
        q52_sequence_packing(spark, sf_dir).select("source", "seq_no").distinct()
    )
    h = seqs.withColumn(
        "order_hash",
        F.expr(
            f"md5(concat('{_ORDER_SALT}', source, ':', cast(seq_no as string)))"
        ),
    ).withColumn(
        "bucket", F.expr("cast(conv(substr(order_hash, 1, 2), 16, 10) as int)")
    )
    w_local = Window.partitionBy("bucket").orderBy("order_hash", "source", "seq_no")
    ranked = h.withColumn("local_rank", F.row_number().over(w_local))
    counts = h.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = (
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    )  # 256-row window — bounded by the bucket alphabet, not the data
    offsets = counts.withColumn(
        "offset", F.coalesce(F.sum("cnt").over(w_off), F.lit(0))
    ).select("bucket", "offset")
    return (
        ranked.join(F.broadcast(offsets), "bucket")
        .select(
            "source",
            "seq_no",
            "order_hash",
            (F.col("offset") + F.col("local_rank")).cast("bigint").alias("position"),
        )
    )


# ---------------------------------------------------------------------------
# q61 — duplicated n-gram spans (exact-substring dedup signal)
# ---------------------------------------------------------------------------

_DUP_K = 8  # tokens per exact-match gram (Lee et al. use 50 BPE tokens)


def _gram_hash_spark(k: int) -> str:
    toks = ", ".join(f"toks[i+{j}]" for j in range(k))
    return (
        f"transform(sequence(0, size(toks) - {k}), i -> "
        f"cast(conv(substr(md5(concat_ws(' ', {toks})), 1, 8), 16, 10) as bigint))"
    )


def _gram_hash_duck(k: int) -> str:
    toks = ", ".join(f"toks[i+{j}]" for j in range(1, k + 1))
    return (
        f"('0x' || substr(md5(concat_ws(' ', {toks})), 1, 8))::UBIGINT::BIGINT"
    )


@_register(
    "q61_dup_ngram_spans",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_TOKENS_SQL_DUCK} AS toks FROM documents
    ), g AS (
        SELECT doc_id, i AS pos, {_gram_hash_duck(_DUP_K)} AS h
        FROM t, unnest(generate_series(0, len(toks) - {_DUP_K})) AS u(i)
        WHERE len(toks) >= {_DUP_K}
    ), hd AS (
        SELECT h FROM g GROUP BY h HAVING count(DISTINCT doc_id) >= 2
    ), dup AS (
        SELECT g.doc_id, count(*) AS n_dup FROM g JOIN hd ON hd.h = g.h
        GROUP BY g.doc_id
    ), per AS (
        SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id
    )
    SELECT p.doc_id, CAST(p.n_grams AS BIGINT) AS n_grams,
           CAST(COALESCE(d.n_dup, 0) AS BIGINT) AS n_dup_positions,
           round(COALESCE(d.n_dup, 0) / CAST(p.n_grams AS DOUBLE), 6)
               AS dup_fraction
    FROM per p LEFT JOIN dup d ON d.doc_id = p.doc_id
    """,
)
def q61_dup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication signal (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", at token-{_DUP_K}-gram
    granularity): a gram is duplicated if it occurs in ≥2 distinct
    documents; each document reports how many of its gram positions are
    corpus-duplicated and the resulting fraction — the per-doc signal a
    substring-level dedup pass thresholds on.

    Scale shape: grams explode narrowly per document, then shuffle ONCE on
    the 8-byte gram hash (ids only, never text) — the distributed analog
    of the suffix-array pass, with skew bounded because a gram's group is
    its true corpus frequency.  The per-doc re-aggregation keys on doc_id.
    No Python, no windows over data-sized partitions."""
    docs = spread_scan(load_table(spark, sf_dir, "documents"))
    g = (
        docs.select("doc_id", F.expr(_TOKENS_EXPR_SPARK).alias("toks"))
        .filter(F.size("toks") >= _DUP_K)
        .select("doc_id", F.explode(F.expr(_gram_hash_spark(_DUP_K))).alias("h"))
    )
    hd = (
        g.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    dup = g.join(hd, "h").groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_dup"))
    per = g.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    return (
        per.join(dup, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_grams").cast("bigint").alias("n_grams"),
            F.coalesce("n_dup", F.lit(0)).cast("bigint").alias("n_dup_positions"),
            F.round(
                F.coalesce("n_dup", F.lit(0)) / F.col("n_grams").cast("double"), 6
            ).alias("dup_fraction"),
        )
    )


# ---------------------------------------------------------------------------
# q62 — BPE merge candidates (adjacent-pair frequency, the tokenizer-fit step)
# ---------------------------------------------------------------------------

_MERGE_TOP = 50


@_register(
    "q62_bpe_merge_candidates",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_TOKENS_SQL_DUCK} AS toks FROM documents
    ), pc AS (
        SELECT toks[i+1] AS left_tok, toks[i+2] AS right_tok,
               count(*) AS pair_count
        FROM t, unnest(generate_series(0, len(toks) - 2)) AS u(i)
        WHERE len(toks) >= 2
        GROUP BY 1, 2
    )
    SELECT left_tok, right_tok, pair_count, rank FROM (
        SELECT left_tok, right_tok, pair_count,
               CAST(row_number() OVER (ORDER BY pair_count DESC,
                                       left_tok, right_tok) AS INT) AS rank
        FROM pc
    ) WHERE rank <= {_MERGE_TOP}
    """,
)
def q62_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first step of BPE/WordPiece tokenizer training: count every
    adjacent token pair across the corpus and emit the top-{_MERGE_TOP}
    merge candidates (count desc, pair asc — the deterministic merge-order
    tie-break).  Iterating this against a merge table is the full BPE fit;
    one round is the operator the engine owns.

    Scale shape: pairs explode narrowly, aggregate with map-side partial
    combine on (left, right) — one shuffle whose width is the observed
    bigram vocabulary.  The global top-k is TakeOrdered (per-partition
    top-{_MERGE_TOP}, then a {_MERGE_TOP}-row merge on the driver-side
    reduce), never a full sort; the rank window touches {_MERGE_TOP} rows."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = (
        docs.select("doc_id", F.expr(_TOKENS_EXPR_SPARK).alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1), i -> "
                    "named_struct('l', toks[i - 1], 'r', toks[i]))"
                )
            ).alias("p")
        )
        .select(F.col("p.l").alias("left_tok"), F.col("p.r").alias("right_tok"))
    )
    pc = pairs.groupBy("left_tok", "right_tok").agg(
        F.count(F.lit(1)).alias("pair_count")
    )
    top = pc.orderBy(
        F.desc("pair_count"), "left_tok", "right_tok"
    ).limit(_MERGE_TOP)
    w = Window.orderBy(F.desc("pair_count"), "left_tok", "right_tok")
    return top.withColumn("rank", F.row_number().over(w))


# ---------------------------------------------------------------------------
# q63 — DSIR-style importance weights (target-vs-corpus unigram log-ratio)
# ---------------------------------------------------------------------------

_DSIR_TARGET_LANG = "en"  # the target distribution: English documents


@_register(
    "q63_importance_weights",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({_TOKENS_SQL_DUCK}) AS token FROM documents
    ), cc AS (
        SELECT token, count(*) AS c FROM tok GROUP BY token
    ), tc AS (
        SELECT token, count(*) AS c FROM tok
        JOIN documents USING (doc_id) WHERE lang = '{_DSIR_TARGET_LANG}'
        GROUP BY token
    ), tots AS (
        SELECT (SELECT count(*) FROM tok) AS n_corpus,
               (SELECT count(*) FROM tok JOIN documents USING (doc_id)
                WHERE lang = '{_DSIR_TARGET_LANG}') AS n_target,
               (SELECT count(DISTINCT token) FROM tok) AS v
    )
    SELECT d.doc_id, d.lang, CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(ln((COALESCE(tc.c, 0) + 1)
                        / CAST(tots.n_target + tots.v AS DOUBLE))
                     - ln((cc.c + 1)
                          / CAST(tots.n_corpus + tots.v AS DOUBLE))), 6)
               AS avg_log_ratio
    FROM tok
    JOIN documents d USING (doc_id)
    JOIN cc USING (token)
    LEFT JOIN tc USING (token)
    CROSS JOIN tots
    GROUP BY d.doc_id, d.lang
    """,
)
def q63_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023): score every document by
    the average log-ratio of an add-one-smoothed unigram LM fit on the
    TARGET slice (lang = '{_DSIR_TARGET_LANG}') vs one fit on the whole
    corpus.  Positive = looks more like the target than the average
    document; sampling proportional to exp(weight) tilts a 100 TB corpus
    toward the target domain without a neural scorer.

    Scale shape: q55's access pattern twice over one exploded pass — both
    count tables shuffle on token (web vocabularies outgrow a broadcast),
    the three corpus totals ride as a broadcast scalar row, and the final
    aggregation keys on doc_id.  All JVM."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(F.expr(_TOKENS_EXPR_SPARK)).alias("token")
    )
    cc = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cc"))
    tc = (
        tok.filter(F.col("lang") == _DSIR_TARGET_LANG)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tc"))
    )
    tots = tok.agg(
        F.count(F.lit(1)).alias("n_corpus"),
        F.sum(F.when(F.col("lang") == _DSIR_TARGET_LANG, 1).otherwise(0)).alias(
            "n_target"
        ),
        F.countDistinct("token").alias("v"),
    )
    log_ratio = F.log(
        (F.coalesce("tc", F.lit(0)) + 1)
        / (F.col("n_target") + F.col("v")).cast("double")
    ) - F.log((F.col("cc") + 1) / (F.col("n_corpus") + F.col("v")).cast("double"))
    return (
        tok.join(cc, "token")
        .join(tc, "token", "left")
        .crossJoin(F.broadcast(tots))
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.avg(log_ratio), 6).alias("avg_log_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# q74 — packing efficiency report (tokens delivered vs budget burned)
# ---------------------------------------------------------------------------


@_register(
    "q74_packing_efficiency",
    oracle=f"""
    WITH p AS ({ORACLES["q52_sequence_packing"]})
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(seq_no) + 1 AS BIGINT) AS n_seqs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(sum(n_tokens)
                 / CAST((max(seq_no) + 1) * {_PACK_BUDGET} AS DOUBLE), 6)
               AS fill_ratio
    FROM p GROUP BY source
    """,
)
def q74_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing efficiency per source shard: sequences minted, tokens
    delivered, and the fill ratio of the token budget — concat-then-chunk
    (q52) wastes only the final partial chunk per shard, and this report
    is how a pipeline confirms that (fill_ratio ≈ 1) or catches a
    regression to per-document padding (fill_ratio collapses).

    Scale shape: one keyed aggregation over q52's output — the packing
    window's exchange on source is reused, nothing new shuffles."""
    p = q52_sequence_packing(spark, sf_dir)
    return p.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (F.max("seq_no") + 1).cast("bigint").alias("n_seqs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.round(
            F.sum("n_tokens")
            / ((F.max("seq_no") + 1) * _PACK_BUDGET).cast("double"),
            6,
        ).alias("fill_ratio"),
    )


# ---------------------------------------------------------------------------
# q77 — mixture budget report (what the epoch-repeat mixture delivers)
# ---------------------------------------------------------------------------


@_register(
    "q77_mixture_budget",
    oracle=f"""
    WITH m AS ({ORACLES["q57_mixture_epochs"]})
    SELECT source,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_doc_copies,
           CAST(sum(n_tokens) AS BIGINT) AS effective_tokens,
           round(sum(n_tokens) / CAST((SELECT sum(n_tokens) FROM m) AS DOUBLE),
                 6) AS mixture_share
    FROM m GROUP BY source
    """,
)
def q77_mixture_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The report that validates q57's mixture: per source, documents,
    copies after epoch repeats, effective training tokens, and the
    realized mixture share — the numbers an operator compares against the
    TARGET weights to confirm the up/down-sampling landed (and the input
    to the cluster's storage/compute sizing for the run).

    Scale shape: one keyed aggregation over q57's exploded output plus a
    broadcast scalar total — nothing new shuffles beyond q57's own plan."""
    m = q57_mixture_epochs(spark, sf_dir)
    tot = m.agg(F.sum("n_tokens").cast("double").alias("total"))
    return (
        m.groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_doc_copies"),
            F.sum("n_tokens").cast("bigint").alias("effective_tokens"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_doc_copies",
            "effective_tokens",
            F.round(F.col("effective_tokens") / F.col("total"), 6).alias(
                "mixture_share"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q80 — context-window chunking with overlap
# ---------------------------------------------------------------------------

# window/stride in TOKENS.  Test-corpus values (docs here are ~50 tokens);
# production long-document splitting uses the same plan with e.g. 2048/1536.
_CHUNK_W = 24
_CHUNK_S = 16  # overlap = _CHUNK_W - _CHUNK_S


@_register(
    "q80_context_chunks",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_TOKENS_SQL_DUCK} AS t FROM documents
    ), sized AS (
        SELECT doc_id, t, len(t) AS n,
               CASE WHEN len(t) <= {_CHUNK_W} THEN 1
                    ELSE 1 + CAST(ceil((len(t) - {_CHUNK_W})
                                       / CAST({_CHUNK_S} AS DOUBLE)) AS INT)
               END AS n_chunks
        FROM toks WHERE len(t) > 0
    ), chunks AS (
        SELECT doc_id, n, n_chunks, unnest(generate_series(0, n_chunks - 1)) AS chunk_id
        FROM sized
    )
    SELECT c.doc_id, CAST(c.chunk_id AS INT) AS chunk_id,
           CAST(c.chunk_id * {_CHUNK_S} AS INT) AS start_tok,
           CAST(least(c.chunk_id * {_CHUNK_S} + {_CHUNK_W}, c.n)
                - c.chunk_id * {_CHUNK_S} AS INT) AS n_chunk_toks,
           md5(array_to_string(
               s.t[c.chunk_id * {_CHUNK_S} + 1 :
                   least(c.chunk_id * {_CHUNK_S} + {_CHUNK_W}, c.n)],
               ' ')) AS chunk_digest
    FROM chunks c JOIN sized s USING (doc_id)
    """,
)
def q80_context_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-document splitting into fixed context windows with overlap —
    the step between curation and packing (q52) when documents exceed the
    model's context length.  Chunk starts advance by the stride; the final
    window truncates at the document end, and a document shorter than one
    window is a single chunk.  Overlap (window - stride) preserves
    cross-boundary context; every token is covered by construction
    (the last start is < n).  The digest fingerprints each chunk so
    downstream exact-dedup (q22) can collapse repeated chunks (boilerplate
    headers/footers surface naturally at chunk granularity).

    Scale shape: tokenize once, explode chunk starts per document (narrow —
    output rows ~ n_tokens / stride per doc), slice + hash inside the same
    projection.  No shuffle at all; chunking a 100 TB corpus is a pure map
    over documents and parallelizes with the input partitioning."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.expr(_TOKENS_EXPR_SPARK)
    sized = docs.select(
        "doc_id", t.alias("t"), F.size(t).alias("n")
    ).filter(F.col("n") > 0).withColumn(
        "n_chunks",
        F.when(F.col("n") <= _CHUNK_W, F.lit(1)).otherwise(
            1 + F.ceil((F.col("n") - _CHUNK_W) / F.lit(float(_CHUNK_S))).cast("int")
        ),
    )
    chunks = sized.select(
        "doc_id", "t", "n",
        F.explode(F.expr("sequence(0, n_chunks - 1)")).alias("chunk_id"),
    )
    start = F.col("chunk_id") * _CHUNK_S
    clen = F.least(start + _CHUNK_W, F.col("n")) - start
    return chunks.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        start.cast("int").alias("start_tok"),
        clen.cast("int").alias("n_chunk_toks"),
        F.md5(
            F.concat_ws(
                " ",
                F.expr(f"slice(t, chunk_id * {_CHUNK_S} + 1, "
                       f"least(chunk_id * {_CHUNK_S} + {_CHUNK_W}, n)"
                       f" - chunk_id * {_CHUNK_S})"),
            )
        ).alias("chunk_digest"),
    )


# ---------------------------------------------------------------------------
# q81 — per-source rate cap (deterministic top-N per source)
# ---------------------------------------------------------------------------

_SOURCE_CAP = 15
_CAP_SALT = "srccap:v1:"


@_register(
    "q81_source_cap",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, source, n_chars,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5('{_CAP_SALT}' || doc_id::VARCHAR), doc_id
               ) AS pick_rank,
               count(*) OVER (PARTITION BY source) AS source_total
        FROM documents
    )
    SELECT doc_id, source, CAST(pick_rank AS INT) AS pick_rank,
           CAST(source_total AS INT) AS source_total
    FROM ranked WHERE pick_rank <= {_SOURCE_CAP}
    """,
)
def q81_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source rate cap: keep at most `_SOURCE_CAP` documents per
    source, selected by a salted-hash order — the guard that stops any one
    domain/crawl from dominating the mixture.  Like q50's splits, the
    selection is a pure function of the row (no rand()): stable under
    retries and recomputation, rotated on purpose by versioning the salt.
    `source_total` rides along so the report shows how hard each source
    was capped.

    Scale shape: `source_total` comes from a tiny pre-aggregation that
    BROADCASTS back (not a second window, which would block the rank-limit
    pushdown), so the one remaining rank window carries a WindowGroupLimit:
    each input partition keeps only its local top-cap rows per source
    BEFORE the shuffle — a hot source ships cap rows per upstream
    partition, not its whole population (pinned by
    tests/test_plan_quality.py)."""
    docs = load_table(spark, sf_dir, "documents")
    order_key = F.md5(F.concat(F.lit(_CAP_SALT), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(order_key, "doc_id")
    totals = docs.groupBy("source").agg(F.count("*").cast("int").alias("source_total"))
    return (
        docs.select("doc_id", "source", "n_chars")
        .withColumn("pick_rank", F.row_number().over(w))
        .filter(F.col("pick_rank") <= _SOURCE_CAP)
        .join(F.broadcast(totals), "source")
        .select("doc_id", "source", F.col("pick_rank").cast("int").alias("pick_rank"),
                "source_total")
    )


# ---------------------------------------------------------------------------
# q84 — chunk-level exact dedup (boilerplate detection over q80's digests)
# ---------------------------------------------------------------------------


@_register(
    "q84_chunk_dedup",
    oracle=f"""
    WITH chunks AS ({ORACLES["q80_context_chunks"]}),
    dup AS (
        SELECT chunk_digest,
               count(*) AS n_copies,
               count(DISTINCT doc_id) AS n_docs,
               min(doc_id) AS keeper_doc_id
        FROM chunks GROUP BY chunk_digest HAVING count(*) > 1
    )
    SELECT d.chunk_digest, CAST(d.n_copies AS INT) AS n_copies,
           CAST(d.n_docs AS INT) AS n_docs, d.keeper_doc_id,
           CAST(min(c.chunk_id) AS INT) AS keeper_chunk_id
    FROM dup d JOIN chunks c
      ON c.chunk_digest = d.chunk_digest AND c.doc_id = d.keeper_doc_id
    GROUP BY d.chunk_digest, d.n_copies, d.n_docs, d.keeper_doc_id
    """,
)
def q84_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup at CHUNK granularity: group q80's window digests and
    report every digest that repeats — across documents this is shared
    boilerplate (headers, footers, licenses) that document-level dedup
    (q22) cannot see, and the keeper (lowest doc_id, then lowest chunk_id
    within it) is the copy a chunk-level curation pass would retain.

    Scale shape: q80's chunking is shuffle-free; this adds ONE exchange on
    the digest (16-byte key, map-side combine) plus a self-join restricted
    to the duplicated digests (bounded by real duplication, like q25's
    verify step).  The 100 TB form of 'strip repeated boilerplate before
    packing'."""
    chunks = QUERIES["q80_context_chunks"](spark, sf_dir)
    dup = (
        chunks.groupBy("chunk_digest")
        .agg(
            F.count("*").cast("int").alias("n_copies"),
            F.countDistinct("doc_id").cast("int").alias("n_docs"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .filter(F.col("n_copies") > 1)
    )
    keeper = (
        chunks.select("chunk_digest", "doc_id", "chunk_id")
        .join(
            F.broadcast(dup),
            (F.col("doc_id") == F.col("keeper_doc_id"))
            & (chunks.chunk_digest == dup.chunk_digest),
        )
        .drop(dup.chunk_digest)
        .groupBy("chunk_digest", "n_copies", "n_docs", "keeper_doc_id")
        .agg(F.min("chunk_id").cast("int").alias("keeper_chunk_id"))
    )
    return keeper.select(
        "chunk_digest", "n_copies", "n_docs", "keeper_doc_id", "keeper_chunk_id"
    )


# ---------------------------------------------------------------------------
# q90 — weighted sampling without replacement (deterministic exp-race)
# ---------------------------------------------------------------------------

_WS_K = 25            # sample size
_WS_SALT = "wsample:v1:"
# the race key is a libm ln() — not guaranteed bit-identical across
# engines — so both sides RANK on the key rounded to 12 dp (libm
# disagreement is ~1 ulp ~ 1e-16 relative; 1e-12 absorbs it)
_WS_ROUND = 12


@_register(
    "q90_weighted_sample",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, source, n_chars,
               round(
                 -ln((('0x' || substr(md5('{_WS_SALT}' || doc_id::VARCHAR), 1, 13))
                          ::UBIGINT::BIGINT + 1.0) / 4503599627370497.0)
                 / n_chars, {_WS_ROUND}) AS race_key
        FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, source, CAST(n_chars AS INT) AS weight,
           round(race_key, 6) AS race_key_6, CAST(rk AS INT) AS sample_rank
    FROM (
        SELECT *, row_number() OVER (ORDER BY race_key, doc_id) AS rk FROM keyed
    ) WHERE rk <= {_WS_K}
    """,
)
def q90_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    exponential race): each document draws a deterministic uniform from a
    salted hash of its id, its race key is -ln(u)/weight, and the k
    smallest keys are the sample — inclusion probability proportional to
    weight (n_chars here), no rand() anywhere, so the sample is identical
    under retries, repartitioning, and recomputation, and versioning the
    salt redraws it on purpose.  The primitive under weighted mixture
    draws (q57 up/down-samples by repeat counts; this samples exact-k).

    Scale shape: the race key is a narrow projection; the global smallest-k
    is TakeOrdered (per-partition top-k then a k-row merge — no full sort,
    no single-partition window; pinned by tests/test_plan_quality.py).
    13 hex digits = 52 uniform bits, +1 over (2^52 + 1) keeps u in (0, 1]
    so ln(u) is finite."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        F.expr(
            f"cast(conv(substr(md5(concat('{_WS_SALT}', cast(doc_id as string))),"
            f" 1, 13), 16, 10) as bigint)"
        ).cast("double")
        + 1.0
    ) / 4503599627370497.0
    key = F.round(-F.log(u) / F.col("n_chars"), _WS_ROUND)
    keyed = docs.select(
        "doc_id", "source", F.col("n_chars").cast("int").alias("weight"),
        key.alias("race_key"),
    )
    topk = keyed.orderBy("race_key", "doc_id").limit(_WS_K)
    w = Window.orderBy("race_key", "doc_id")
    return topk.select(
        "doc_id", "source", "weight",
        F.round("race_key", 6).alias("race_key_6"),
        F.row_number().over(w).cast("int").alias("sample_rank"),
    )


# ---------------------------------------------------------------------------
# q93 — feature-hashing vectorizer (hashing trick -> fixed-dim doc vectors)
# ---------------------------------------------------------------------------

_FH_DIM = 32
_FH_SALT = "fhash:v1:"


@_register(
    "q93_feature_hash",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKENS_SQL_DUCK}) AS tok FROM documents
    ), hashed AS (
        SELECT doc_id,
               ('0x' || substr(md5('{_FH_SALT}' || tok), 1, 8))::UBIGINT::BIGINT
                   % {_FH_DIM} AS bucket,
               CASE WHEN ('0x' || substr(md5('{_FH_SALT}' || tok), 9, 1))
                             ::UBIGINT::BIGINT % 2 = 0
                    THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END AS sign
        FROM toks
    ), counts AS (
        SELECT doc_id, bucket, sum(sign) AS v
        FROM hashed GROUP BY doc_id, bucket
    ), vecs AS (
        SELECT doc_id,
               [coalesce(list_sum([e.v for e in entries if e.b = i - 1]), 0.0)
                for i in range(1, 33)] AS raw
        FROM (
            SELECT doc_id, list(struct_pack(b := bucket, v := v)) AS entries
            FROM counts GROUP BY doc_id
        )
    )
    SELECT doc_id,
           round(sqrt(list_sum([x * x for x in raw])), 6) AS l2_norm,
           CAST(len(list_filter(raw, x -> x <> 0)) AS INT) AS n_nonzero,
           round(list_sum(raw), 6) AS signed_sum
    FROM vecs WHERE list_sum([x * x for x in raw]) > 0
    """,
)
def q93_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing-trick vectorizer: tokens hash to one of {_FH_DIM}
    buckets with a salted md5 (and a second hash bit supplies the sign,
    the Weinberger et al. trick that keeps bucket collisions unbiased) —
    a fixed-dimension document representation with NO vocabulary state,
    which is what makes it the scale-first featurizer: nothing to fit,
    nothing to broadcast, new tokens land deterministically.  Output
    reports the vector's norm, sparsity, and signed mass per document
    (the full vector rides in `raw` upstream of the projection).

    Scale shape: explode tokens (narrow), ONE keyed aggregation on
    (doc_id, bucket), pivot to the fixed-width array inside the same
    per-doc aggregation — no joins, no state, shuffle keyed by doc."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.expr(_TOKENS_EXPR_SPARK)).alias("tok"))
    h = f"md5(concat('{_FH_SALT}', tok))"
    hashed = toks.select(
        "doc_id",
        F.expr(f"cast(conv(substr({h}, 1, 8), 16, 10) as bigint) % {_FH_DIM}").alias(
            "bucket"
        ),
        F.expr(
            f"CASE WHEN cast(conv(substr({h}, 9, 1), 16, 10) as bigint) % 2 = 0"
            " THEN 1.0D ELSE -1.0D END"
        ).alias("sign"),
    )
    counts = hashed.groupBy("doc_id", "bucket").agg(F.sum("sign").alias("v"))
    vecs = (
        counts.groupBy("doc_id")
        .agg(
            F.map_from_entries(F.collect_list(F.struct("bucket", "v"))).alias("m")
        )
        .select(
            "doc_id",
            F.expr(
                f"transform(sequence(1, {_FH_DIM}), "
                "i -> coalesce(element_at(m, cast(i - 1 as bigint)), 0.0D))"
            ).alias("raw"),
        )
    )
    norm2 = F.expr("aggregate(transform(raw, x -> x * x), 0D, (a, x) -> a + x)")
    return (
        vecs.select(
            "doc_id",
            F.round(F.sqrt(norm2), 6).alias("l2_norm"),
            F.expr("size(filter(raw, x -> x != 0D))").cast("int").alias("n_nonzero"),
            F.round(
                F.expr("aggregate(raw, 0D, (a, x) -> a + x)"), 6
            ).alias("signed_sum"),
            norm2.alias("_n2"),
        )
        .filter(F.col("_n2") > 0)
        .drop("_n2")
    )


# ---------------------------------------------------------------------------
# q95 — CUBE over (source, lang): every aggregation granularity at once
# ---------------------------------------------------------------------------


@_register(
    "q95_source_lang_cube",
    oracle=f"""
    SELECT source, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len({_TOKENS_SQL_DUCK})) AS BIGINT) AS n_tokens,
           CAST(grouping(source) AS INT) AS g_source,
           CAST(grouping(lang) AS INT) AS g_lang
    FROM documents
    GROUP BY CUBE (source, lang)
    """,
)
def q95_source_lang_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four granularities of the (source, lang) corpus budget in one
    pass — per cell, per source, per lang, and the grand total — with
    GROUPING flags distinguishing a real NULL group from a rolled-up one.
    Complements q68's rollup lattice with the full cube (rollup only
    walks the prefix hierarchy; mixture planning wants the lang margin
    too).

    Scale shape: Spark expands the cube map-side and partial-aggregates
    all granularities in the SAME shuffle — one exchange regardless of
    how many grouping sets, which is exactly why CUBE beats four separate
    GROUP BYs unioned (four corpus scans, four shuffles)."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.expr(_TOKENS_EXPR_SPARK))
    return (
        docs.select("source", "lang", n_tok.alias("nt"))
        .cube("source", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("nt").cast("bigint").alias("n_tokens"),
            F.grouping("source").cast("int").alias("g_source"),
            F.grouping("lang").cast("int").alias("g_lang"),
        )
    )


# ---------------------------------------------------------------------------
# q102 — equi-width length histogram per source (the plotting primitive)
# ---------------------------------------------------------------------------

_HIST_LO = 0
_HIST_HI = 600
_HIST_BINS = 12
_HIST_W = (_HIST_HI - _HIST_LO) // _HIST_BINS


@_register(
    "q102_length_histogram",
    oracle=f"""
    WITH b AS (
        SELECT source,
               least(CAST(floor((n_chars - {_HIST_LO}) / {_HIST_W}.0) AS INT),
                     {_HIST_BINS - 1}) AS bin
        FROM documents WHERE n_chars >= {_HIST_LO}
    )
    SELECT source, CAST(bin AS INT) AS bin,
           CAST(bin * {_HIST_W} + {_HIST_LO} AS INT) AS bin_lo,
           CAST((bin + 1) * {_HIST_W} + {_HIST_LO} AS INT) AS bin_hi,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(count(*)::DOUBLE
                 / sum(count(*)) OVER (PARTITION BY source), 4) AS share
    FROM b GROUP BY source, bin
    """,
)
def q102_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source equi-width histogram of document lengths (12 bins over
    [0, 600), top bin open-ended) with within-source shares — the binned
    aggregate every distribution dashboard and drift monitor consumes,
    computed engine-side so only bins x sources rows leave the cluster
    (never raw lengths).

    Scale shape: binning is arithmetic in the scan projection; one keyed
    aggregation with map-side combine; the share window runs over at most
    `_HIST_BINS` rows per source."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") >= _HIST_LO)
    bin_ = F.least(
        F.floor((F.col("n_chars") - _HIST_LO) / float(_HIST_W)).cast("int"),
        F.lit(_HIST_BINS - 1),
    )
    w = Window.partitionBy("source")
    return (
        docs.select("source", bin_.alias("bin"))
        .groupBy("source", "bin")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .select(
            "source",
            F.col("bin").cast("int").alias("bin"),
            (F.col("bin") * _HIST_W + _HIST_LO).cast("int").alias("bin_lo"),
            ((F.col("bin") + 1) * _HIST_W + _HIST_LO).cast("int").alias("bin_hi"),
            "n_docs",
            F.round(
                F.col("n_docs").cast("double") / F.sum("n_docs").over(w), 4
            ).alias("share"),
        )
    )


# ---------------------------------------------------------------------------
# q119 — bigram-LM perplexity scoring (the KenLM-style quality filter)
# ---------------------------------------------------------------------------
#
# q55 scores documents against a corpus-fit UNIGRAM model; production
# quality filtering (CCNet and descendants) uses an n-gram LM because word
# ORDER is what separates fluent text from keyword soup.  This is the
# bigram step: fit add-half-smoothed bigram probabilities on the corpus
# itself, then score every document by its mean negative log-likelihood
# per bigram (low = in-distribution, high = disfluent/outlier — either
# tail gets routed out of the training mix).

_BIGRAM_ALPHA = 0.5  # add-alpha smoothing mass


@_register(
    "q119_bigram_quality",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_TOKENS_SQL_DUCK} AS toks FROM documents
    ), big AS (
        SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
        FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i)
        WHERE len(toks) >= 2
    ), bc AS (
        SELECT w1, w2, count(*) AS c2 FROM big GROUP BY w1, w2
    ), uc AS (
        SELECT w1, count(*) AS c1 FROM big GROUP BY w1
    ), stats AS (
        SELECT count(*) AS v FROM uc
    )
    SELECT b.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(CAST(round(-ln((bc.c2 + {_BIGRAM_ALPHA})
                                   / (uc.c1 + {_BIGRAM_ALPHA} * s.v)) * 1e6, 0)
                         AS BIGINT)) AS BIGINT) AS sum_nll_e6,
           round(sum(CAST(round(-ln((bc.c2 + {_BIGRAM_ALPHA})
                                    / (uc.c1 + {_BIGRAM_ALPHA} * s.v)) * 1e6, 0)
                          AS BIGINT)) / count(*) / 1e6, 6) AS avg_nll
    FROM big b
    JOIN bc ON bc.w1 = b.w1 AND bc.w2 = b.w2
    JOIN uc ON uc.w1 = b.w1
    CROSS JOIN stats s
    GROUP BY b.doc_id
    """,
)
def q119_bigram_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM document quality: P(w2|w1) = (c(w1,w2)+a)/(c(w1)+aV)
    with a=0.5 over context vocabulary V; per doc, the count of bigrams
    and the mean per-bigram negative log-likelihood.  Per-term NLLs are
    quantized to integer micro-nats BEFORE summing (float summation
    order differs between engines; integer sums don't), and the mean is
    derived from the exact sum.

    Scale shape: bigrams come from ONE zip_with over the token array (no
    self-join, no positional explode-join); the model tables are the two
    grouped aggregations every corpus-statistics pass already pays, and
    scoring re-joins them on their own keys — co-partitionable with the
    counts by bucketing on w1 at 100 TB.  V is a 1-row literal broadcast.
    No Python anywhere."""
    toks = f"({_TOKENS_EXPR_SPARK})"
    big = (
        spread_scan(load_table(spark, sf_dir, "documents"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"zip_with(slice({toks}, 1, size({toks}) - 1),"
                    f" slice({toks}, 2, size({toks}) - 1),"
                    " (x, y) -> named_struct('w1', x, 'w2', y))"
                )
            ).alias("b"),
        )
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    bc = big.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    # c(w1) = Σ_w2 c(w1,w2): derive the unigram-context table from the
    # bigram counts instead of re-running the tokenize+explode pass — one
    # fewer corpus pass, and the physical planner reuses bc's exchange
    # for both consumers (identical subtree)
    uc = bc.groupBy("w1").agg(F.sum("c2").alias("c1"))
    stats = uc.agg(F.count("*").alias("v"))
    nll_e6 = F.round(
        -F.log(
            (F.col("c2") + F.lit(_BIGRAM_ALPHA))
            / (F.col("c1") + F.lit(_BIGRAM_ALPHA) * F.col("v"))
        )
        * F.lit(1e6),
        0,
    ).cast("bigint")
    return (
        big.join(bc, ["w1", "w2"])
        .join(uc, "w1")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", nll_e6.alias("nll_e6"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.sum("nll_e6").cast("bigint").alias("sum_nll_e6"),
            F.round(F.sum("nll_e6") / F.count("*") / F.lit(1e6), 6).alias("avg_nll"),
        )
    )
