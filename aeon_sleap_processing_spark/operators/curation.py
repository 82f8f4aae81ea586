"""Corpus-curation operators: sequence packing, segment-level dedup, PII
scan/redaction, domain mixture rebalancing (100 TB pipeline kit, wave 2).

These complete the training-data wing (operators/text.py, similarity.py,
graph.py) with the remaining steps a pretraining data pipeline runs between
"filtered corpus" and "tokenized shards":

- ``pack_sequences``        — concat-and-cut packing into fixed context
                              windows (the standard pretraining layout),
                              reported per sequence.
- ``paragraph_dedup``       — segment-level exact dedup (CCNet/RefinedWeb
                              style line dedup): drop segments duplicated
                              anywhere in the corpus, keep first occurrence,
                              reassemble documents.
- ``pii_scan``              — regex email/phone/IPv4 detection counts and
                              redacted text. RE2-compatible patterns so the
                              same strings run in Spark (Java regex) and the
                              DuckDB oracle.
- ``domain_mixture_sample`` — temperature-weighted (count^alpha) domain
                              rebalancing with the deterministic salted-hash
                              Bernoulli from operators/text.py.

Scale notes: nothing here introduces an unkeyed global window over data-sized
input. ``pack_sequences`` needs a corpus-wide prefix sum; it reuses the
two-level chunked-scan pattern of ``chunked_sessionize``
(operators/temporal.py:362): local cumulative sums per id-chunk (keyed
window), then ONE ordered window over the per-chunk totals (rows = number of
chunks, tiny) whose offsets broadcast-join back. ``paragraph_dedup``'s dedup
window partitions by segment hash (dense key). ``pii_scan`` is pure codegen
expressions. ``domain_mixture_sample`` aggregates to one row per source and
broadcasts the keep-probability table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .text import md5_long, salted_uniform, tokenize

__all__ = [
    "pack_sequences",
    "pack_bins",
    "paragraph_dedup",
    "pii_scan",
    "domain_mixture_sample",
    "shuffle_shards",
    "PII_PATTERNS",
]


def pack_sequences(
    docs: DataFrame,
    capacity: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk: int = 1000,
) -> DataFrame:
    """Concat-and-cut sequence packing: lay every document's tokens end to
    end in ``id_col`` order and cut the stream every ``capacity`` tokens —
    the layout LLM pretraining uses for its training sequences (documents
    may straddle a cut; nothing is padded or dropped).

    Returns one row per packed sequence:
      (seq_id, n_docs, n_tokens, n_starts, n_straddle)
    where ``n_docs`` counts documents contributing >= 1 token to the window,
    ``n_starts`` those that BEGIN in it, and ``n_straddle`` those that
    continue into the next window. The final sequence may be short.

    Plan shape: the corpus-wide token prefix sum is two-level (the
    ``chunked_sessionize`` pattern, temporal.py:362) — a keyed window per
    id-chunk of ``chunk`` documents, then one ordered window over the
    per-chunk totals (tiny) broadcast-joined back; each document's token
    span then explodes into the sequences it overlaps (span/capacity + 2
    rows max) and a map-side-combinable groupBy(seq_id) aggregates. No
    unkeyed data-sized window anywhere.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity!r}")
    # split("") yields [""] (size 1) — count whitespace-only docs as 0 tokens
    n_tok = F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(
        F.size(tokenize(F.col(text_col)))
    )
    base = (
        docs.select(F.col(id_col), n_tok.alias("__n"))
        .where(F.col("__n") > 0)
        .withColumn("__chunk", F.floor(F.col(id_col) / F.lit(chunk)))
    )
    wloc = W.partitionBy("__chunk").orderBy(id_col)
    local = base.withColumn(
        "__lcum", F.sum("__n").over(wloc.rowsBetween(W.unboundedPreceding, -1))
    ).withColumn("__lcum", F.coalesce(F.col("__lcum"), F.lit(0)))

    totals = base.groupBy("__chunk").agg(F.sum("__n").alias("__tot"))
    wc = W.orderBy("__chunk")  # one row per id-chunk: tiny, single partition OK
    offsets = totals.select(
        "__chunk",
        F.coalesce(
            F.sum("__tot").over(wc.rowsBetween(W.unboundedPreceding, -1)), F.lit(0)
        ).alias("__off"),
    )

    spans = (
        local.join(F.broadcast(offsets), "__chunk")
        .select(
            id_col,
            (F.col("__off") + F.col("__lcum")).alias("__start"),
            (F.col("__off") + F.col("__lcum") + F.col("__n")).alias("__end"),
        )
        .withColumn("__s0", F.floor(F.col("__start") / capacity))
        .withColumn("__s1", F.floor((F.col("__end") - 1) / capacity))
    )
    per_seq = spans.select(
        F.col("__start"),
        F.col("__end"),
        F.col("__s0"),
        F.col("__s1"),
        F.explode(F.sequence("__s0", "__s1")).alias("seq_id"),
    )
    lo = F.greatest(F.col("__start"), F.col("seq_id") * capacity)
    hi = F.least(F.col("__end"), (F.col("seq_id") + 1) * capacity)
    return (
        per_seq.groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(hi - lo).alias("n_tokens"),
            F.sum((F.col("__s0") == F.col("seq_id")).cast("long")).alias("n_starts"),
            F.sum((F.col("__s1") > F.col("seq_id")).cast("long")).alias("n_straddle"),
        )
        .orderBy("seq_id")
    )


def pack_bins(
    docs: DataFrame,
    capacity: int = 512,
    shard_col: str = "shard",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Boundary-respecting greedy bin packing — the SFT-training layout
    (documents are never split across sequences; unused tail tokens become
    padding), complementing ``pack_sequences``' concat-and-cut.

    Within each shard, documents are walked in ``id_col`` order: a document
    joins the open bin when it fits, else the bin closes and a new one
    opens. A document longer than ``capacity`` gets a bin of its own
    (n_tokens > capacity flags it for truncation downstream). Returns one
    row per bin: (shard, bin_id, n_docs, n_tokens, fill_frac).

    Scale: greedy fill is a sequential recurrence whose carry (the open
    bin's fill) cannot be summarized for a two-level scan — packing order
    IS the algorithm — so parallelism comes from sharding: one sequential
    ``applyInPandas`` kernel per shard (the engine's stateful-kernel
    pattern, operators/kernels.py), shards sized by the caller. The
    streaming twin ``stream_pack_sequences`` shards the same way.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity!r}")
    from pyspark.sql import types as T

    n_tok = F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(
        F.size(tokenize(F.col(text_col)))
    )
    base = docs.select(
        F.col(shard_col).alias("__shard"), F.col(id_col), n_tok.alias("__n")
    ).where(F.col("__n") > 0)

    out_schema = T.StructType(
        [
            T.StructField("shard", base.schema["__shard"].dataType),
            T.StructField("bin_id", T.LongType()),
            T.StructField("n_docs", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("fill_frac", T.DoubleType()),
        ]
    )

    def kernel(pdf):
        import math

        import pandas as pd

        def round_half_up(x: float, nd: int = 6) -> float:
            # SQL ROUND semantics (half away from zero), NOT Python's
            # banker's round — fill = k/512 hits exact 6-decimal ties
            return math.floor(x * 10**nd + 0.5) / 10**nd

        pdf = pdf.sort_values(id_col)
        shard = pdf["__shard"].iloc[0]
        bins: list[dict] = []
        fill = n_docs = 0
        for n in pdf["__n"].astype("int64"):
            if fill and fill + n > capacity:
                bins.append({"n_docs": n_docs, "n_tokens": fill})
                fill = n_docs = 0
            fill += int(n)
            n_docs += 1
        if fill:
            bins.append({"n_docs": n_docs, "n_tokens": fill})
        return pd.DataFrame(
            [
                {
                    "shard": shard,
                    "bin_id": i,
                    "n_docs": b["n_docs"],
                    "n_tokens": b["n_tokens"],
                    "fill_frac": round_half_up(b["n_tokens"] / capacity),
                }
                for i, b in enumerate(bins)
            ]
        )

    return base.groupBy("__shard").applyInPandas(kernel, out_schema)


def paragraph_dedup(
    docs: DataFrame,
    block_words: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Segment-level exact dedup (the line/paragraph dedup of CCNet and
    RefinedWeb): split each document into segments, drop every segment whose
    exact text already occurred earlier in the corpus (first occurrence by
    (doc_id, position) wins), and reassemble what remains.

    Segmenting: newline-delimited corpora split on lines; this corpus is a
    single-line word stream, so segments are non-overlapping ``block_words``
    word blocks — the same operator body serves both (the split expression
    is the only difference).

    Returns (doc_id, n_blocks, n_kept, dedup_text); fully-duplicated
    documents keep 0 blocks and an empty string.

    Plan shape: posexplode(blocks) → first-occurrence window PARTITIONED BY
    the segment hash (dense key — parallel) → groupBy(doc_id) reassembly
    via sort_array(collect_list(struct(pos, block))). No unkeyed window; at
    100 TB the hash partitioning spreads identical segments' rows to one
    task each, bounded by a segment's corpus frequency.
    """
    if block_words <= 0:
        raise ValueError(f"block_words must be positive, got {block_words!r}")
    words = tokenize(F.col(text_col))
    n_blocks = F.ceil(F.size(words) / F.lit(block_words)).cast("int")
    blocks = F.transform(
        F.sequence(F.lit(0), n_blocks - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i * block_words + 1, block_words)),
    )
    rows = docs.select(
        F.col(id_col), F.posexplode(blocks).alias("__pos", "__blk")
    )
    # partition by the segment TEXT, not a 32-bit hash of it: a hash
    # collision would merge two distinct segments' first-occurrence ranking
    # (Spark hashes the shuffle key internally either way)
    wfirst = W.partitionBy("__blk").orderBy(id_col, "__pos")
    kept = rows.withColumn("__rn", F.row_number().over(wfirst))
    reassembled = (
        kept.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum((F.col("__rn") == 1).cast("long")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__rn") == 1,
                                F.struct(F.col("__pos"), F.col("__blk")),
                            )
                        )
                    ),
                    lambda s: s["__blk"],
                ),
                " ",
            ).alias("dedup_text"),
        )
    )
    return reassembled.select(id_col, "n_blocks", "n_kept", "dedup_text")


def shuffle_shards(
    docs: DataFrame,
    n_shards: int = 8,
    salt: str = "shuf",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic corpus shuffle + shard assignment — the last step
    before a training run writes its tokenized shards: every document
    gets a shard (``pmod(md5_long(salt|id), n_shards)``) and a position
    within that shard (ascending salted hash, ties by id), so the
    training order is globally shuffled yet a pure function of
    (id, salt) — reproducible across runs, engines, and partitionings,
    and re-shufflable per epoch by changing the salt. An RNG shuffle is
    neither (and cannot be oracled).

    Scale shape: ONE shuffle on the dense shard key, then a per-shard
    window sort — exactly the repartition(n_shards) +
    sortWithinPartitions physical layout the shard writer needs, so the
    assignment plan IS the write plan. No global ordering ever
    materializes (per-shard positions are independent)."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    h = md5_long(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string")))
    w = W.partitionBy("shard").orderBy("h", id_col)
    return (
        docs.select(F.col(id_col), h.alias("h"))
        .withColumn("shard", F.pmod(F.col("h"), F.lit(n_shards)).cast("int"))
        .select(
            F.col(id_col),
            "shard",
            F.row_number().over(w).cast("bigint").alias("pos"),
        )
    )


# RE2-compatible (no lookaround/backreferences) so the identical strings run
# under Java regex (Spark) and RE2 (DuckDB oracle). Order matters for
# redaction: emails before phones so the digits of "user123@x.com" are not
# half-eaten by the phone pattern.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?[0-9][0-9 -]{7,}[0-9]", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
)


def pii_scan(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII detection and redaction: counts of email / phone /
    IPv4 matches plus the text with every match replaced by a typed marker
    (the pre-training privacy scrub, e.g. the BigScience ROOTS pipeline).

    Returns (doc_id, n_email, n_phone, n_ipv4, redacted_text,
    redacted_chars). Each class is counted on the text with the PRECEDING
    classes already redacted, so counts equal the number of markers each
    class inserts — the digit run inside "user123456789@x.com" is an email,
    not a phone number, because emails redact first. Pure codegen
    expressions — regexp_extract_all + chained regexp_replace, no shuffle,
    no UDF.
    """
    counts = []
    red = F.col(text_col)
    for name, pat, marker in PII_PATTERNS:
        counts.append(F.size(F.regexp_extract_all(red, F.lit(pat), 0)).alias(f"n_{name}"))
        red = F.regexp_replace(red, pat, marker)
    return docs.select(
        F.col(id_col),
        *counts,
        red.alias("redacted_text"),
        F.length(red).alias("redacted_chars"),
    )


def domain_mixture_sample(
    docs: DataFrame,
    alpha: float = 0.5,
    target_frac: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Temperature-weighted domain rebalancing: resample the corpus so the
    kept set's domain mix follows ``count^alpha`` (alpha < 1 flattens toward
    uniform — the multilingual/domain temperature sampling of mT5/XLM-R) at
    ``target_frac`` of the original corpus size.

    Per-source keep probability: share_s = n_s^alpha / sum_t n_t^alpha;
    p_s = min(1, share_s * target_frac * N / n_s). Membership is the
    deterministic salted-md5 Bernoulli draw shared with ``weighted_sample``
    (``text.salted_uniform``) — reproducible across runs, engines,
    partitionings. The membership test compares against p_keep QUANTIZED to
    12 decimals: the normalizer is a float sum whose accumulation order
    differs across engines/partitionings, and an unquantized strict
    ``u < p`` could flip a document on a last-ULP difference.

    Returns per source: (source, n_docs, target_share, p_keep, n_kept,
    kept_frac). One aggregation to one row per source, a broadcast scalar
    for the normalizer, a broadcast join of the probability table back onto
    the corpus, one final aggregation — no data-sized shuffle beyond the
    two groupBys.
    """
    counts = docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(
        F.sum(F.pow(F.col("n_docs"), F.lit(alpha))).alias("__wsum"),
        F.sum("n_docs").alias("__N"),
    )
    probs = counts.crossJoin(F.broadcast(tot)).select(
        source_col,
        "n_docs",
        (F.pow(F.col("n_docs"), F.lit(alpha)) / F.col("__wsum")).alias("target_share"),
        F.least(
            F.lit(1.0),
            F.pow(F.col("n_docs"), F.lit(alpha))
            / F.col("__wsum")
            * F.lit(target_frac)
            * F.col("__N")
            / F.col("n_docs"),
        ).alias("p_keep"),
    )
    kept = (
        docs.select(source_col, salted_uniform(F.col(id_col), salt).alias("__u"))
        .join(F.broadcast(probs), source_col)
        .groupBy(source_col, "n_docs", "target_share", "p_keep")
        .agg(
            F.sum(
                (F.col("__u") < F.round(F.col("p_keep"), 12)).cast("long")
            ).alias("n_kept")
        )
    )
    return kept.select(
        source_col,
        "n_docs",
        F.round("target_share", 6).alias("target_share"),
        F.round("p_keep", 6).alias("p_keep"),
        "n_kept",
        F.round(F.col("n_kept") / F.col("n_docs"), 6).alias("kept_frac"),
    )
