"""Text-analysis + dedup operators over a documents table (100 TB pipeline kit).

All hashing is md5-based (available and bit-identical in Spark and DuckDB) so
every operator has an exact SQL oracle. The LLM-data-pipeline surface:

- ``text_stats``        — token count, punct/stopword ratios, quality score
- ``lang_id``           — n-gram/marker-word heuristic language ID
- ``doc_fingerprint``   — min-hash-of-shingles document fingerprint
- ``exact_dedup``       — normalized-text hash dedup, keep lowest doc_id
- ``minhash_signature`` — k-permutation MinHash over word shingles
- ``lsh_buckets``       — banded LSH buckets (near-dup candidate discovery)
- ``jaccard_top_pairs`` — exact n-gram Jaccard via inverted-index self-join
- ``simhash``           — 32-bit SimHash from per-word hashes

Scale notes: everything is expressed as explode → hash → groupBy/join — all
shuffle-parallel by doc_id or shingle. The jaccard self-join is the classic
inverted-index pattern: pairs are generated per shingle (bounded by shingle
frequency), never a cartesian product. At 100 TB you'd additionally cap hot
shingles (drop shingles with document frequency > threshold) — exposed via
``max_shingle_df``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from .util import ensure_min_parallelism

__all__ = [
    "tokenize",
    "token_count",
    "BPE_SPLIT_PATTERN",
    "md5_long",
    "salted_uniform",
    "text_stats",
    "lang_id",
    "doc_fingerprint",
    "exact_dedup",
    "minhash_signature",
    "lsh_buckets",
    "jaccard_top_pairs",
    "simhash",
    "simhash_pairs",
    "tfidf_top_terms",
    "char_ngram_profile",
    "quality_buckets",
    "length_percentiles",
    "minhash_est_vs_exact",
    "dup_span_stats",
    "dup_span_cut",
    "cdc_chunk_stats",
    "bpe_train",
    "bpe_encode_token_counts",
    "bpe_apply_token_counts",
    "fuzzy_pairs",
    "repetition_stats",
    "domain_stats",
    "ngram_lm_score",
    "corpus_split",
    "weighted_sample",
    "decontaminate",
]

EN_STOPWORDS = ("the", "and", "with", "of", "to", "a", "in", "is")
LANG_MARKERS = {
    "de": ("und", "der", "nicht", "das", "ist"),
    "en": ("the", "and", "with", "of", "is"),
    "es": ("y", "para", "como", "los", "que"),
    "fr": ("et", "dans", "pour", "les", "une"),
}
CJK_RANGE = "一-鿿"


def tokenize(text: Column) -> Column:
    """Whitespace tokenization — identical to the oracle's string_split_regex."""
    return F.split(F.trim(text), r"\s+")


# GPT-2-style pre-tokenizer approximation: contraction suffixes, space-glued
# letter runs, digit runs, punctuation runs, residual whitespace. ASCII-only
# classes so Java (Spark) and RE2 (DuckDB) regex engines count identically.
BPE_SPLIT_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def token_count(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting both ways a data pipeline needs it: whitespace words
    (cheap size estimate) and BPE-ish pre-tokenizer segments (the quantity a
    subword tokenizer's budget actually tracks). Pure regexp expressions —
    whole-stage codegen, no UDF."""
    pieces = F.regexp_extract_all(F.col(text_col), F.lit(BPE_SPLIT_PATTERN), 0)
    non_ws = F.filter(pieces, lambda p: p.rlike(r"\S"))
    return docs.select(
        F.col(id_col),
        F.size(tokenize(F.col(text_col))).alias("ws_tokens"),
        F.size(non_ws).alias("bpe_tokens"),
        F.round(
            F.length(F.col(text_col)).cast("double") / F.greatest(F.size(non_ws), F.lit(1)), 4
        ).alias("chars_per_token"),
    )


def md5_long(col: Column) -> Column:
    """Deterministic 32-bit hash as long: first 8 hex chars of md5.

    Chosen over xxhash64/crc32 because md5 is bit-identical in DuckDB, letting
    every hash-based operator have an exact SQL oracle."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def salted_uniform(id_col: Column, salt: str) -> Column:
    """Deterministic U[0,1) draw as a pure function of (id, salt): salted
    md5 of the id mapped to [0,1). Reproducible across runs, engines, and
    partitionings; a different salt gives an independent draw. The single
    source of truth for every Bernoulli-sampling operator (weighted_sample,
    domain_mixture_sample) — their DuckDB oracles pin this exact formula."""
    return md5_long(F.concat(F.lit(salt + "|"), id_col.cast("string"))) / F.lit(
        float(1 << 32)
    )


def _word_in(words: Column, vocab: tuple[str, ...]) -> Column:
    def pred(w: Column) -> Column:
        c = F.lit(False)
        for v in vocab:
            c = c | (w == v)
        return c

    return F.size(F.filter(words, pred))


def _shingles(words: Column, k: int) -> Column:
    """Overlapping k-word shingles joined by spaces; empty when < k words.

    Array-side form (``F.transform`` lambda → interpreted, no codegen).
    Hot paths should use :func:`shingle_rows` instead — same rows, 4x faster."""
    n = F.size(words)
    idx = F.sequence(F.lit(1), n - (k - 1))
    return F.when(
        n >= k, F.transform(idx, lambda i: F.array_join(F.slice(words, i, k), " "))
    ).otherwise(F.array().cast("array<string>"))


def shingle_rows(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    alias: str = "__sg",
    with_pos: bool = False,
) -> DataFrame:
    """(id, shingle) rows: k-word shingles built from ``arrays_zip`` of k
    shifted slices + explode + ``concat_ws`` — every operator whole-stage
    codegen. The lambda form (``F.transform``) runs interpreted and measures
    ~4x slower end-to-end on the minhash path at sf0.1.

    Docs with fewer than k words produce no rows (empty zip explodes to
    nothing), matching the array form's semantics. ``with_pos`` adds the
    0-based shingle position as ``__pos`` (posexplode) for operators that
    need positional signals (``dup_span_stats``)."""
    words = tokenize(F.col(text_col))
    n_sh = F.greatest(F.size(words) - (k - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice(words, i + 1, n_sh) for i in range(k)])
    sg = F.concat_ws(" ", *[F.col("__zz")[str(i)] for i in range(k)]).alias(alias)
    if with_pos:
        return docs.select(
            F.col(id_col), F.posexplode(z).alias("__pos", "__zz")
        ).select(id_col, "__pos", sg)
    return docs.select(F.col(id_col), F.explode(z).alias("__zz")).select(id_col, sg)


def text_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality metrics (token count, punctuation/stopword ratios,
    composite quality score). Pure column expressions — whole-stage codegen."""
    words = tokenize(F.col(text_col))
    n_tokens = F.size(words)
    n_chars = F.length(F.col(text_col))
    punct_count = F.length(F.regexp_replace(F.col(text_col), r"[A-Za-z0-9\s]", ""))
    punct_ratio = punct_count.cast("double") / n_chars
    stop_ratio = _word_in(words, EN_STOPWORDS).cast("double") / n_tokens
    tok_len_sum = F.aggregate(
        F.transform(words, F.length), F.lit(0), lambda acc, x: acc + x
    )
    quality = (
        F.lit(0.4) * F.least(F.lit(1.0), n_tokens.cast("double") / 100.0)
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * stop_ratio
    )
    return docs.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(tok_len_sum.cast("double") / n_tokens, 6).alias("avg_token_len"),
        F.round(quality, 6).alias("quality_score"),
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language ID with CJK-codepoint shortcut; deterministic
    alphabetical tie-break (de < en < es < fr)."""
    words = tokenize(F.col(text_col))
    cjk = F.length(F.regexp_replace(F.col(text_col), f"[^{CJK_RANGE}]", ""))
    s = {lang: _word_in(words, mk) for lang, mk in LANG_MARKERS.items()}
    pred = (
        F.when(cjk > 0, F.lit("zh"))
        .when(s["de"] >= F.greatest(s["en"], s["es"], s["fr"]), F.lit("de"))
        .when(s["en"] >= F.greatest(s["es"], s["fr"]), F.lit("en"))
        .when(s["es"] >= s["fr"], F.lit("es"))
        .otherwise(F.lit("fr"))
    )
    return docs.select(F.col(id_col), F.col("lang").alias("true_lang"), pred.alias("pred_lang"))


def doc_fingerprint(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5
) -> DataFrame:
    """Rolling-hash document fingerprint: min hash over k-word shingles."""
    base = ensure_min_parallelism(docs.select(id_col, text_col), id_col)
    # explode → hash → groupBy-min: the per-shingle hash runs inside
    # whole-stage codegen (array lambdas would be interpreted, ~10x slower)
    rows = shingle_rows(base, text_col, id_col, k)
    return rows.groupBy(id_col).agg(F.min(md5_long(F.col("__sg"))).alias("fingerprint"))


def exact_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup on normalized text hash; representative = lowest doc_id.

    Returns one row per distinct text: (doc_id, text_hash, n_copies)."""
    h = F.md5(F.lower(F.trim(F.col(text_col))))
    hashed = docs.select(F.col(id_col), h.alias("text_hash"))
    w = W.partitionBy("text_hash").orderBy(id_col)
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .withColumn("n_copies", F.count(F.lit(1)).over(W.partitionBy("text_hash")))
        .where(F.col("rn") == 1)
        .select(id_col, "text_hash", "n_copies")
    )


def minhash_signature(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """MinHash signature: num_perm independent salted min-hashes over k-word
    shingles. Stays array-side (no explode) — one narrow projection, no shuffle."""
    # explode → codegen'd hashes → one map-side-combinable groupBy with
    # num_perm MIN aggregates. Array-lambda minhashing would run interpreted
    # (no whole-stage codegen) — ~10x slower per shingle. Each md5 yields four
    # independent 32-bit slices, so num_perm permutations cost only
    # ceil(num_perm/4) md5 calls per shingle (salted by slab index).
    # Documents with fewer than shingle_k words produce no shingle rows and
    # therefore NO signature row — deliberate: a doc too short to shingle has
    # no meaningful MinHash, and a NULL-signature row would collide every
    # such doc into one LSH band downstream. The SQL oracle filters empty
    # shingle lists to pin the same semantics.
    base = ensure_min_parallelism(docs.select(id_col, text_col), id_col)
    rows = shingle_rows(base, text_col, id_col, shingle_k)
    n_slabs = (num_perm + 3) // 4
    hexcat = F.concat(
        *[
            F.md5(F.concat(F.lit(f"{s}|"), F.col("__sg")) if s else F.col("__sg"))
            for s in range(n_slabs)
        ]
    )
    aggs = [
        F.min(
            F.conv(F.substring(hexcat, j * 8 + 1, 8), 16, 10).cast("long")
        ).alias(f"mh{j}")
        for j in range(num_perm)
    ]
    return rows.groupBy(id_col).agg(*aggs)


def minhash_bands_for(
    n_docs: int,
    threshold: float = 0.7,
    target_recall: float = 0.95,
    p_background: float = 0.1,
    margin: int = 2,
    max_bands: int = 64,
) -> tuple[int, int, int]:
    """Size a banded-MinHash plan from the corpus — the r9/r10 band-sizing
    LAW as code instead of README prose (the embedding twin is
    :func:`~.similarity.lsh_planes_for`; r14 VERDICT task 2):

    - ``band_size r`` from the RANDOM-FLOOR rule: two non-dup docs agree
      on one min-hash w.p. ~their background Jaccard ``p_background``
      (common shingles — natural text, boilerplate), so one band of r
      hashes random-collides w.p. p_bg^r and the floor
      n_bands·p_bg^r·n²/2 is QUADRATIC in n at fixed r. Requiring
      p_bg^r ≤ 2^-margin / n gives
      ``r = ceil((log2(n) + margin) / log2(1/p_bg))`` — the same
      b ≈ log₂(n)+margin discipline that cured the embedding LSH second
      decade. Measured evidence this binds: the driver's fixed 2-perm
      bands at 500k NATURAL docs hit the quadratic common-shingle floor
      (>30 GB shuffle, killed — recorded in
      bench_runs_r14/minhash_decade2.json's failure observations).
    - ``n_bands`` from the amplification identity: a true pair at
      Jaccard ≥ ``threshold`` collides per band w.p. threshold^r, so
      ``n_bands = ceil(ln(1-target_recall) / ln(1-threshold^r))`` bands
      give OR-amplified recall ≥ ``target_recall`` (capped at
      ``max_bands`` — if the cap binds, achievable recall is
      1-(1-threshold^r)^max_bands; raise ``threshold`` or accept).

    Returns ``(num_perm, band_size, n_bands)`` with
    ``num_perm = band_size * n_bands``, ready for
    :func:`minhash_signature` + :func:`lsh_buckets` /
    :func:`minhash_est_vs_exact` (both take ``auto_bands=True`` to apply
    this from one corpus count). Signature cost scales as
    ceil(num_perm/4) md5 calls per shingle (the 4-slice slab trick in
    :func:`minhash_signature`), LINEAR in num_perm — the law trades that
    bounded linear cost against the quadratic floor."""
    import math

    if n_docs < 1:
        raise ValueError(f"n_docs must be >= 1, got {n_docs}")
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be a Jaccard in (0, 1], got {threshold}")
    if not 0.0 < target_recall < 1.0:
        raise ValueError(f"target_recall must be in (0, 1), got {target_recall}")
    if not 0.0 < p_background < 1.0:
        raise ValueError(f"p_background must be in (0, 1), got {p_background}")
    r = max(
        2,
        math.ceil(
            (math.log2(max(n_docs, 2)) + margin) / math.log2(1.0 / p_background)
        ),
    )
    hit = threshold**r
    if hit >= 1.0:
        n_bands = 1
    else:
        n_bands = math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - hit))
        n_bands = min(max(n_bands, 1), max_bands)
    return r * n_bands, r, n_bands


def lsh_buckets(
    sigs: DataFrame,
    id_col: str = "doc_id",
    num_perm: int = 8,
    band_size: int = 2,
    auto_bands: bool = False,
    n_docs: int | None = None,
    threshold: float = 0.7,
    p_background: float = 0.1,
) -> DataFrame:
    """Banded LSH over a MinHash signature: docs sharing a band-hash are
    near-dup candidates. Returns buckets with >= 2 docs:
    (band, band_hash, n_docs, min_doc, max_doc).

    ``auto_bands=True`` applies the :func:`minhash_bands_for` floor rule
    to the signature AT HAND: ``band_size`` is re-sized to the law's r
    for ``n_docs`` (counted from ``sigs`` if not given) and the bands
    re-split from the available ``num_perm``. If the signature is too
    narrow to hold even ONE law-sized band, this raises with the plan
    :func:`minhash_bands_for` wants — fixed weak bands at scale fail
    QUADRATICALLY and silently (the 500k-doc kill recorded in
    bench_runs_r14/minhash_decade2.json), so the engine refuses to be
    the silent version of that."""
    if auto_bands:
        if n_docs is None:
            n_docs = sigs.count()
        want_perm, law_r, want_bands = minhash_bands_for(
            n_docs, threshold=threshold, p_background=p_background
        )
        if num_perm < law_r:
            raise ValueError(
                f"auto_bands: signature has num_perm={num_perm} but the "
                f"band-sizing law wants band_size={law_r} at n_docs="
                f"{n_docs} — regenerate signatures with num_perm="
                f"{want_perm} (minhash_bands_for -> (num_perm, band_size,"
                f" n_bands) = {(want_perm, law_r, want_bands)})"
            )
        band_size = law_r
    n_bands = num_perm // band_size
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "_",
                        *[
                            F.col(f"mh{b * band_size + i}").cast("string")
                            for i in range(band_size)
                        ],
                    )
                ).alias("band_hash"),
            )
            for b in range(n_bands)
        ]
    )
    exploded = sigs.select(F.col(id_col), F.explode(bands).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.band_hash").alias("band_hash")
    )
    return (
        exploded.groupBy("band", "band_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("min_doc"),
            F.max(id_col).alias("max_doc"),
        )
        .where(F.col("n_docs") >= 2)
    )


def jaccard_top_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    top_n: int = 20,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity via inverted-index self-join.

    Candidate pairs come only from shared shingles (never cartesian);
    ``max_shingle_df`` drops hot shingles, the standard scale cap."""
    sh = (
        shingle_rows(
            ensure_min_parallelism(docs.select(id_col, text_col), id_col),
            text_col,
            id_col,
            shingle_k,
            alias="shingle",
        )
        # inverted-index key = xxhash64 of the shingle: the distinct, the
        # self-join, and their shuffles move 8-byte longs instead of full
        # shingle strings. Intersection counts are unchanged unless two
        # DISTINCT shingles of overlapping docs collide in 64 bits (~2^-64
        # per pair — negligible; the md5-parity rule only binds operators
        # that OUTPUT hash values, not internal join keys).
        .select(F.col(id_col).alias("doc"), F.xxhash64("shingle").alias("shingle"))
        .distinct()  # per-doc distinct shingles (replaces array-side array_distinct)
    )
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_shingles").alias("n_b"))
    jac = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
    )
    return jac.orderBy(F.col("jaccard").desc(), F.col("doc_a").asc(), F.col("doc_b").asc()).limit(
        top_n
    )


def simhash(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32
) -> DataFrame:
    """SimHash: per-word hashes vote ±1 on each bit; sign of each bit-sum forms
    the signature. explode → 1 hash → groupBy with ``bits`` conditional sums —
    a single map-side-combinable aggregation."""
    words = ensure_min_parallelism(docs.select(id_col, text_col), id_col).select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("word")
    ).withColumn("h", md5_long(F.col("word")))
    sums = [
        F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"s{b}")
        for b in range(bits)
    ]
    agg = words.groupBy(id_col).agg(*sums)
    sig = None
    for b in range(bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return agg.select(F.col(id_col), sig.cast("long").alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    n_bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup PAIRS: band the signature into ``n_bands`` bit
    slices — two docs within hamming distance < n_bands must share at least
    one identical band (pigeonhole), so candidates come from a band-value
    equi-join, then the exact ``bit_count(xor)`` hamming filter keeps pairs
    at ``max_hamming`` or less. The standard scale path for SimHash dedup:
    shuffle is bounded by band-collision counts, never |docs|².

    Guarantee: exhaustive for max_hamming <= n_bands - 1 (here 3 <= 3);
    larger distances would need more bands."""
    band_bits = bits // n_bands
    mask = (1 << band_bits) - 1
    sig = simhash(docs, text_col, id_col, bits)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * band_bits)
                .bitwiseAND(F.lit(mask))
                .alias("bv"),
            )
            for b in range(n_bands)
        ]
    )
    memb = sig.select(id_col, "simhash", F.explode(bands).alias("bb")).select(
        id_col, "simhash", F.col("bb.band").alias("band"), F.col("bb.bv").alias("bv")
    )
    a, b = memb.alias("a"), memb.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def tfidf_top_terms(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 3,
) -> DataFrame:
    """Top-k TF-IDF terms per document: ``score = tf · ln(N/df)``.

    Shapes: explode → two map-side-combinable aggregations (tf per (doc,word),
    df per word) → broadcast scalar N → window top-k. At 100 TB the word
    dimension (df) is the small side of the join after aggregation, so it
    broadcasts; the (doc, word) tf table never re-shuffles (top-k window
    partitions by the same doc key the tf aggregation produced). The ranking
    orders by the ROUNDED score so cross-engine ulp drift in ln() cannot flip
    the tie-break."""
    words = docs.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("word")
    )
    tf = words.groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("tf"))
    df = words.groupBy("word").agg(F.countDistinct(id_col).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    score = F.round(
        F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
    )
    w = W.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("word").asc())
    return (
        tf.join(F.broadcast(df), "word")
        .crossJoin(F.broadcast(n))
        .withColumn("tfidf", score)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(id_col, "word", "tfidf", "rank")
    )


def char_ngram_profile(
    docs: DataFrame,
    n: int = 3,
    top: int = 5,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-language top character n-grams — the frequency profile behind
    statistical language ID (the scalable form of :func:`lang_id`'s marker
    lists). Whitespace-bearing grams are dropped.

    Plan shape: split-on-whitespace → explode tokens → explode positions →
    substr → two-level count → per-lang top-k. Splitting FIRST is equivalent
    to extracting all grams and dropping whitespace-bearing ones (a gram with
    no whitespace lies entirely within one maximal non-space run) but never
    materializes the dropped grams and needs no per-gram regex — measured
    4.5x faster at sf0.1. All codegen; the count is map-side combinable on
    (lang, ngram); only the tiny counted table hits the ranking window."""
    base = docs.select(
        F.col(lang_col).alias("lang"),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("__w"),
    ).where(F.length("__w") >= n)
    positions = F.sequence(F.lit(1), F.length("__w") - (n - 1))
    grams = base.select("lang", "__w", F.explode(positions).alias("__i")).select(
        "lang", F.col("__w").substr(F.col("__i"), F.lit(n)).alias("ngram")
    )
    counted = grams.groupBy("lang", "ngram").agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("lang").orderBy(F.col("n").desc(), F.col("ngram").asc())
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top)
        .select("lang", "ngram", "n", "rank")
    )


def quality_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Corpus quality partitioning: bucket documents by the composite
    :func:`text_stats` quality score (low < 0.5 <= medium < 0.7 <= high) and
    summarize per source — the keep/review/drop split of a training-data
    curation pass. Buckets compare the ROUNDED score so the cut is exact
    cross-engine."""
    stats = text_stats(docs, text_col=text_col, id_col=id_col)
    bucket = (
        F.when(F.col("quality_score") >= 0.7, F.lit("high"))
        .when(F.col("quality_score") >= 0.5, F.lit("medium"))
        .otherwise(F.lit("low"))
    )
    return (
        stats.join(docs.select(id_col, group_col), id_col)
        .withColumn("bucket", bucket)
        .groupBy(group_col, "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            # decimal sum of the (already 6-decimal) scores: exact and
            # order-independent, so the 6-decimal mean can't flip on a
            # partial-sum boundary (observed: 0.4312965)
            F.round(
                F.sum(F.col("quality_score").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_quality"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        )
    )


def quality_classifier(
    docs: DataFrame,
    weights: list[float],
    bias: float,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Linear (fastText-style) quality-classifier filter — the trained
    classifier stage of a curation pipeline (the CCNet/GPT-3 shape: a
    cheap linear model, distilled offline from an expensive scorer,
    gates every document):

        score = sigmoid(bias + w · [stop_ratio, avg_token_len,
                                    least(n_tokens, 200) / 200])

    over :func:`text_stats`' ROUNDED surface features, ``keep`` compared
    on the 6-decimal rounded score so the cut is exact cross-engine.
    Weights are trained offline (tools/fit_quality_clf.py — pyspark.ml
    logistic regression distilled from the composite quality_score
    teacher at AUC 0.99997) and PINNED to tools/quality_clf_trained.json,
    the ivf_centroids_trained.json technique. Pure column expressions —
    whole-stage codegen end to end, no UDF; at 100 TB this is a map-only
    pass that fuses into the scan."""
    stats = text_stats(docs, text_col=text_col, id_col=id_col)
    feats = [
        F.col("stop_ratio"),
        F.col("avg_token_len"),
        F.least(F.col("n_tokens"), F.lit(200)).cast("double") / 200.0,
    ]
    if len(weights) != len(feats):
        raise ValueError(
            f"expected {len(feats)} weights, got {len(weights)}"
        )
    z = F.lit(float(bias))
    for w, x in zip(weights, feats):
        z = z + F.lit(float(w)) * x
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return stats.select(
        F.col(id_col),
        score.alias("clf_score"),
        (score >= F.lit(float(threshold))).alias("keep"),
    )


def length_percentiles(
    docs: DataFrame, len_col: str = "n_chars", group_col: str = "lang"
) -> DataFrame:
    """Exact interpolated length percentiles per group (corpus length-
    distribution audit). Spark ``percentile`` and DuckDB ``quantile_cont``
    share linear interpolation."""
    return docs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.expr(f"percentile({len_col}, 0.5)"), 4).alias("median_len"),
        F.round(F.expr(f"percentile({len_col}, 0.9)"), 4).alias("p90_len"),
        F.min(len_col).alias("min_len"),
        F.max(len_col).alias("max_len"),
    )


def minhash_est_vs_exact(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 8,
    band_size: int = 2,
    shingle_k: int = 3,
    auto_bands: bool = False,
    threshold: float = 0.7,
    target_recall: float = 0.95,
    p_background: float = 0.1,
) -> DataFrame:
    """Estimator-quality audit: for every banded-LSH candidate pair, the
    MinHash Jaccard estimate (matching-permutation fraction) next to the
    EXACT shingle Jaccard — the precision measurement a dedup pipeline runs
    before trusting a threshold at scale.

    One row per candidate pair: (id_a, id_b, est_jaccard, exact_jaccard).

    Plan shape (no doc-id re-joins, no sort-merge): the estimate is
    computed IN the band-bucket join — each membership row carries its full
    signature as an array, so the matching-permutation fraction is a
    ``zip_with`` at pair-formation time. The exact side is the
    inverted-index self-join keyed on xxhash64 shingles (the
    ``jaccard_top_pairs`` shape, text.py:289), restricted to candidate
    docs, then inner-joined to the candidate pairs; every join is a
    hash-distributed equi-join on a dense key — never all-pairs.

    ``auto_bands=True`` sizes the whole plan from ONE corpus count via
    :func:`minhash_bands_for` (band_size from the log₂(n)+margin random
    floor, n_bands from the amplification identity at ``threshold`` /
    ``target_recall``) — the production path at scale; the explicit
    ``num_perm``/``band_size`` defaults stay for the pinned driver
    oracles."""
    if auto_bands:
        n_docs = docs.count()
        if n_docs == 0:
            raise ValueError("auto_bands: empty corpus — no plan to size")
        num_perm, band_size, _ = minhash_bands_for(
            n_docs, threshold=threshold, target_recall=target_recall,
            p_background=p_background,
        )
    sigs = minhash_signature(docs, text_col, id_col, num_perm, shingle_k)
    n_bands = num_perm // band_size
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "_",
                        *[F.col(f"mh{b * band_size + i}").cast("string") for i in range(band_size)],
                    )
                ).alias("bh"),
            )
            for b in range(n_bands)
        ]
    )
    sig_arr = F.array(*[F.col(f"mh{j}") for j in range(num_perm)])
    memb = sigs.select(
        F.col(id_col), sig_arr.alias("sig"), F.explode(bands).alias("bb")
    ).select(id_col, "sig", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    a, b = memb.alias("a"), memb.alias("b")
    matches = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    pairs = (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        # dedup multi-band collisions; signatures are functionally
        # determined by the ids, so first() is deterministic
        .groupBy("id_a", "id_b")
        .agg((F.first(matches) / F.lit(float(num_perm))).alias("est_jaccard"))
        # candidate pairs feed the cand-doc semi-join, the exact join, and
        # the output — checkpoint so the band join runs once (bounded:
        # LSH-collided pairs only). Lazy: the first action materializes it;
        # an eager checkpoint would serialize an extra blocking job
        # (measured +0.8 s on the audit query at sf0.1)
        .localCheckpoint(eager=False)
    )
    # exact side: distinct hashed shingles, only for docs appearing in pairs
    cand_docs = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionByName(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    sh = (
        shingle_rows(docs.join(cand_docs, id_col, "left_semi"), text_col, id_col, shingle_k)
        .select(F.col(id_col).alias("doc"), F.xxhash64("__sg").alias("sh"))
        .distinct()
        # candidate shingle sets feed sizes + both legs of the self-join
        .localCheckpoint(eager=False)
    )
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    xa, xb = sh.alias("xa"), sh.alias("xb")
    co = (
        xa.join(
            xb.hint("shuffle_hash"),
            (F.col("xa.sh") == F.col("xb.sh")) & (F.col("xa.doc") < F.col("xb.doc")),
        )
        .groupBy(F.col("xa.doc").alias("id_a"), F.col("xb.doc").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = sizes.select(F.col("doc").alias("id_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        pairs.join(co.hint("shuffle_hash"), ["id_a", "id_b"], "left")
        .join(na.hint("shuffle_hash"), "id_a")
        .join(nb.hint("shuffle_hash"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round("est_jaccard", 6).alias("est_jaccard"),
            F.round(
                F.coalesce(F.col("n_inter"), F.lit(0)).cast("double")
                / (F.col("n_a") + F.col("n_b") - F.coalesce(F.col("n_inter"), F.lit(0))),
                6,
            ).alias("exact_jaccard"),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Benchmark decontamination: per corpus document, the fraction of its
    distinct k-word shingles that appear anywhere in the benchmark set —
    the standard eval-leakage check a training-data pipeline runs before a
    corpus ships (n-gram overlap against held-out benchmarks).

    Returns (doc_id, n_shingles, n_hit, overlap_frac, contaminated) — one
    row per corpus doc with >= 1 shingle; ``contaminated`` is
    ``overlap_frac >= threshold``.

    Scale shape: both sides reduce to distinct xxhash64 shingle keys (8-byte
    join keys, like ``jaccard_top_pairs``); the probe is a hash-distributed
    left semi-ish join (left join + conditional count, map-side-combinable
    groupBy on doc id). The benchmark side deduplicates to its distinct
    shingle set first, so a shingle repeated across benchmark docs costs one
    row, and no all-pairs product exists anywhere."""
    sh = (
        shingle_rows(docs.select(id_col, text_col), text_col, id_col, shingle_k)
        .select(F.col(id_col), F.xxhash64("__sg").alias("__sh"))
        .distinct()
    )
    bench_sh = (
        shingle_rows(benchmark.select(id_col, text_col), text_col, id_col, shingle_k)
        .select(F.xxhash64("__sg").alias("__sh"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        sh.join(bench_sh, "__sh", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("__hit").alias("n_hit"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_shingles"), 6).alias("overlap_frac"),
            (F.col("n_hit") / F.col("n_shingles") >= threshold).alias("contaminated"),
        )
    )


def incremental_dedup(
    incoming: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Incremental (new-batch-vs-corpus) exact dedup, the shape a production
    ingest pipeline runs every batch: collapse duplicate fingerprints WITHIN
    the incoming batch (keep the lowest id), then anti-join the survivors
    against the fingerprint set of the already-ingested corpus.

    Returns (id, fingerprint) rows for genuinely-new documents only.

    Scale: the corpus leg reduces to its DISTINCT fingerprint column (one
    bigint per historical doc) before the anti-join, so the join state is
    the fingerprint set — not the corpus text. At 100 TB the fingerprint set
    would live as its own bucketed table maintained incrementally; both sides
    hash-partition on `fingerprint`, and the anti-join co-partitions with the
    within-batch window, so survivors shuffle once."""
    fin = doc_fingerprint(incoming, text_col, id_col, k)
    w = W.partitionBy("fingerprint").orderBy(id_col)
    survivors = (
        fin.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")
    )
    seen = doc_fingerprint(corpus, text_col, id_col, k).select("fingerprint").distinct()
    return survivors.join(seen, "fingerprint", "left_anti").select(id_col, "fingerprint")


def bigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 20,
) -> DataFrame:
    """Corpus bigram statistics with conditional probability — the count table
    a classic n-gram LM trains from: p(w2 | w1) = c(w1 w2) / c(w1 ·).

    Top-``top_k`` bigrams by corpus frequency, ties broken on the bigram
    string so both engines pick identical rows.

    Scale: bigram extraction is the same explode→codegen path as shingling;
    both aggregations are map-side combinable, and the context join keys on
    w1 — the heavy (bigram) aggregate shuffles once, the (w1) context table
    is a strict rollup of it."""
    bg = shingle_rows(docs.select(id_col, text_col), text_col, id_col, 2)
    counts = bg.groupBy(F.col("__sg").alias("bigram")).agg(
        F.count(F.lit(1)).alias("n_bigram")
    )
    counts = counts.withColumn("w1", F.split(F.col("bigram"), " ")[0])
    ctx = counts.groupBy("w1").agg(F.sum("n_bigram").alias("n_ctx"))
    return (
        counts.join(ctx, "w1")
        .select(
            "bigram",
            "n_bigram",
            F.col("n_ctx").cast("long").alias("n_ctx"),
            F.round(F.col("n_bigram").cast("double") / F.col("n_ctx"), 6).alias("cond_p"),
        )
        .orderBy(F.col("n_bigram").desc(), F.col("bigram").asc())
        .limit(top_k)
    )


def dup_span_stats(
    docs: DataFrame, k: int = 5, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact-substring-dedup signals (the shingle approximation of Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models Better"):
    per document, how much of it is text that occurs elsewhere in the
    corpus, and the longest CONTIGUOUS duplicated span.

    A position's k-word shingle is *duplicated* when the identical shingle
    occurs anywhere else in the corpus (another document or another position
    of the same one). Returns per document:

    - ``n_shingles``   — positions scanned (0 for docs with < k words)
    - ``n_dup``        — positions whose shingle is duplicated
    - ``dup_frac``     — n_dup / n_shingles (NULL when no shingles)
    - ``max_dup_run``  — longest run of consecutive duplicated positions, in
      shingles; a run of r covers r + k - 1 words — the span an ExactSubstr
      pass would cut (0 when none)

    Scale: positional shingles (posexplode — codegen), occurrence counts by
    shingle (map-side-combinable groupBy on the shingle key), one
    shuffle-join back on the shingle, then per-doc keyed windows for the
    run-length scan (the pos − row_number() grouping trick of
    ``run_length``, temporal.py:615). No unkeyed window, no UDF; at 100 TB
    the shingle join is bounded by shingle frequency like the jaccard
    inverted index (text.py:289)."""
    base = ensure_min_parallelism(docs.select(id_col, text_col), id_col)
    rows = shingle_rows(base, text_col, id_col, k, with_pos=True)
    occ = rows.groupBy("__sg").agg(F.count(F.lit(1)).alias("__occ"))
    flagged = rows.join(occ, "__sg").select(
        id_col, "__pos", (F.col("__occ") > 1).alias("__dup")
    )
    per_doc = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.col("__dup").cast("long")).alias("n_dup"),
    )
    # consecutive-run grouping: within a doc, duplicated positions with the
    # same (pos - rank-among-duplicated) are one contiguous run
    wdoc = W.partitionBy(id_col).orderBy("__pos")
    runs = (
        flagged.where("__dup")
        .withColumn("__grp", F.col("__pos") - F.row_number().over(wdoc))
        .groupBy(id_col, "__grp")
        .agg(F.count(F.lit(1)).alias("__run"))
        .groupBy(id_col)
        .agg(F.max("__run").alias("max_dup_run"))
    )
    return (
        base.select(id_col)
        .join(per_doc, id_col, "left")
        .join(runs, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_dup", F.lit(0)).alias("n_dup"),
            F.round(F.col("n_dup") / F.col("n_shingles"), 6).alias("dup_frac"),
            F.coalesce("max_dup_run", F.lit(0)).alias("max_dup_run"),
        )
    )


def dup_span_cut(
    docs: DataFrame, k: int = 5, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """ExactSubstr-style duplicate-span REMOVAL — the action companion to
    :func:`dup_span_stats` (Lee et al. 2022 cut all-but-one occurrence of
    every long duplicated substring; this is the same positional-shingle
    approximation acting on the text instead of reporting on it).

    Policy (deterministic, total): a position's k-word shingle is
    *duplicated* when the identical shingle occurs anywhere else in the
    corpus; the corpus-wide FIRST occurrence (minimum ``(doc_id, pos)``) is
    the keeper, every other occurrence marks its k covered word indices for
    removal. A word survives iff no non-keeper duplicated shingle covers
    it. Returns one row per input document::

        doc_id, text (kept words joined by ' '), n_kept, n_cut

    Docs with < k words have no shingles and pass through intact (modulo
    whitespace normalization — reconstruction joins the tokenized words, so
    runs of whitespace collapse; the oracle reconstructs identically).

    Scale: shingle occurrence count AND keeper are one map-side-combinable
    ``groupBy(shingle)`` (``min(struct(doc_id, pos))`` — no shingle-keyed
    window, so a hot stopword run skews only the join fanout, which AQE
    skew-join splits), one shuffle-join back on the shingle, a distinct on
    (doc, word-index), one anti-join, and a per-doc ``collect_list`` bounded
    by document length — the same envelope as ``dup_span_stats`` plus the
    reconstruction groupBy."""
    base = ensure_min_parallelism(docs.select(id_col, text_col), id_col)
    rows = shingle_rows(base, text_col, id_col, k, with_pos=True)
    occ = rows.groupBy("__sg").agg(
        F.count(F.lit(1)).alias("__occ"),
        F.min(F.struct(F.col(id_col).alias("d"), F.col("__pos").alias("p"))).alias(
            "__keep"
        ),
    )
    cut = (
        rows.join(occ, "__sg")
        .where(
            (F.col("__occ") > 1)
            & ~(
                (F.col(id_col) == F.col("__keep.d"))
                & (F.col("__pos") == F.col("__keep.p"))
            )
        )
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("__pos"), F.col("__pos") + F.lit(k - 1))
            ).alias("__wi"),
        )
        .distinct()
    )
    words = base.select(
        F.col(id_col), F.posexplode(tokenize(F.col(text_col))).alias("__wi", "__w")
    )
    kept = words.join(cut, [id_col, "__wi"], "left_anti")
    agg = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__wi", "__w"))),
                lambda s: s["__w"],
            ),
            " ",
        ).alias("__text"),
        F.count(F.lit(1)).alias("__kept"),
    )
    n_words = F.size(tokenize(F.col(text_col)))
    return base.join(agg, id_col, "left").select(
        id_col,
        F.coalesce("__text", F.lit("")).alias(text_col),
        F.coalesce("__kept", F.lit(0)).cast("long").alias("n_kept"),
        (n_words - F.coalesce("__kept", F.lit(0))).cast("long").alias("n_cut"),
    )


def fuzzy_pairs(
    df: DataFrame,
    col: str,
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """Edit-distance pair search over a string column (approximate string
    join, Gravano et al. 2001): find all DISTINCT value pairs within
    Levenshtein distance ``max_dist`` without an all-pairs cross.

    Pipeline: distinct values (fuzzy matching runs on the vocabulary — the
    right input after exact dedup, and what keeps the pair space bounded) →
    positional q-grams (explode, codegen substr) → equi-join on the gram
    with the POSITION filter ``|i - j| <= d`` → count filter: a pair within
    distance d shares at least ``max(L1, L2) - q + 1 - d*q`` positional
    grams (each edit destroys at most q grams), counted as join rows
    (overcounting only ADDS candidates — sound) → exact ``levenshtein``
    verify on the survivors.

    EXACT over the whole vocabulary: the gram leg covers pairs where BOTH
    strings have length >= (d+1)*q (below that the count bound is vacuous
    AND two strings within d can share zero grams); pairs involving a
    shorter string go through a direct small-side pass — the short stratum
    (len < (d+1)*q, 6 chars at the defaults) is a tiny vocabulary after
    ``.distinct()`` (bounded by |alphabet|^(min_len-1) in the worst case,
    a handful of part codes / short names in practice), so it is
    broadcast-nested-loop joined against every value within length
    tolerance d (dist <= d forces |len diff| <= d, so the other side is
    pre-filtered to len < (d+1)*q + d) and exact-levenshtein verified.
    The two legs are disjoint by construction (gram leg: both sides long;
    short leg: at least one side short), so the union needs no dedup.
    Returns (name_a, name_b, dist) with name_a < name_b.

    Scale: the gram join is an equi-join on short keys, skew bounded by
    gram frequency like the shingle inverted index (jaccard_top_pairs);
    the count/length filters run before any levenshtein is computed. The
    short leg's NL join is (tiny broadcast) x (length-filtered slice) —
    bounded work even on a 100 TB corpus because both factors are
    vocabulary slices of bounded string length, not the corpus."""
    min_len = (max_dist + 1) * q
    vocab = df.select(F.col(col).cast("string").alias("s")).distinct()
    s = vocab.where(F.length("s") >= min_len)
    grams = s.select(
        "s",
        F.length("s").alias("n"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("s") - (q - 1)),
                lambda i: F.struct(
                    F.col("s").substr(i, F.lit(q)).alias("g"), i.alias("p")
                ),
            )
        ).alias("gp"),
    ).select("s", "n", F.col("gp.g").alias("g"), F.col("gp.p").alias("p"))
    a, b = grams.alias("a"), grams.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.s") < F.col("b.s"))
            & (F.abs(F.col("a.p") - F.col("b.p")) <= max_dist),
        )
        .groupBy(
            F.col("a.s").alias("name_a"),
            F.col("b.s").alias("name_b"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("__shared"))
        .where(
            (F.abs(F.col("na") - F.col("nb")) <= max_dist)
            & (
                F.col("__shared")
                >= F.greatest("na", "nb") - F.lit(q - 1) - F.lit(max_dist * q)
            )
        )
    )
    long_pairs = (
        cand.withColumn("dist", F.levenshtein("name_a", "name_b"))
        .where(F.col("dist") <= max_dist)
        .select("name_a", "name_b", "dist")
    )
    # Short-string leg: every pair with at least one side below min_len.
    # The short set is a bounded vocabulary -> broadcast; the other side
    # only needs values within length tolerance d of a short string.
    short = vocab.where(F.length("s") < min_len)
    near = vocab.where(F.length("s") < min_len + max_dist)
    # sa is always the short member, so a (short, long) pair where the
    # long string sorts first still appears — normalize with
    # least/greatest and distinct (a short-short pair matches twice).
    short_pairs = (
        F.broadcast(short.select(F.col("s").alias("sa")))
        .join(
            near.select(F.col("s").alias("sb")),
            (F.col("sa") != F.col("sb"))
            & (F.abs(F.length("sa") - F.length("sb")) <= max_dist),
        )
        .where(F.levenshtein("sa", "sb") <= max_dist)
        .select(
            F.least("sa", "sb").alias("name_a"),
            F.greatest("sa", "sb").alias("name_b"),
        )
        .distinct()
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
    )
    return long_pairs.unionByName(short_pairs)


def bpe_train(
    docs: DataFrame,
    num_merges: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_size: int = 1,
) -> DataFrame:
    """Distributed BPE vocabulary training (Sennrich et al. 2016) — the
    corpus-side heavy lifting of tokenizer construction: learn
    ``num_merges`` byte-pair merges from corpus word frequencies.

    Representation trick that keeps EVERYTHING codegen (no UDF) and gives
    the iterative algorithm an exact unrolled-CTE DuckDB oracle: a word's
    symbol sequence is one string — symbols joined by TWO spaces, two
    spaces at both ends (``'  l  o  w  </w>  '``). Merging pair (a, b) is
    then the plain left-to-right string replace of ``' a  b '`` with
    ``' ab '``: each match consumes ONE space of each flanking double
    separator, so adjacent matches keep their own separator and the
    non-overlapping scan equals greedy left-to-right BPE merging (the
    ``'a a a'`` case merges the first two, as the token walk does).

    Per merge round: split the reps on the double space, count adjacent
    symbol pairs weighted by word frequency (explode + map-side-combinable
    groupBy over the UNIQUE-WORD table — vocabulary-sized, not
    corpus-sized), pick the max pair (ties: lexicographic on the pair —
    pinned so the oracle agrees), rewrite the reps with one ``replace``.
    The corpus is touched ONCE (word counting); the k rounds iterate over
    the vocabulary table with lineage checkpointed each round.

    Returns (merge_rank, left, right, pair_count) for the merges learned,
    in order — fewer than ``num_merges`` rows when the corpus runs out of
    pairs."""
    _, merges = _bpe_learn(docs, num_merges, text_col, batch_size)
    spark = docs.sparkSession
    schema = "merge_rank int, left string, right string, pair_count long"
    return spark.createDataFrame(merges, schema)


def _word_reps(docs: DataFrame, text_col: str) -> DataFrame:
    """(__w, __cnt, __rep): unique corpus words with counts and the
    double-space symbol representation (the shared substrate of BPE
    training and application — see bpe_train for the representation
    contract)."""
    words = (
        docs.select(F.explode(tokenize(F.col(text_col))).alias("__w"))
        .where(F.length("__w") >= 1)
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    rep = F.concat(
        F.lit("  "),
        F.array_join(
            F.concat(F.split(F.col("__w"), ""), F.array(F.lit("</w>"))), "  "
        ),
        F.lit("  "),
    )
    return words.select("__w", "__cnt", rep.alias("__rep"))


def _bpe_learn(
    docs: DataFrame, num_merges: int, text_col: str, batch_size: int = 1
) -> tuple[DataFrame, list[tuple]]:
    """The shared BPE learn loop: returns (final vocab-rep table
    [__w, __cnt, __rep], merges [(rank, left, right, count)]).

    ``batch_size=1`` is exact sequential greedy BPE. ``batch_size=m > 1``
    is BATCHED greedy (the standard scaling trick for tokenizer-size
    merge counts, where k sequential merges = k driver round-trips +
    k checkpoints): per round, rank pairs by (count DESC, pair ASC),
    take the top ``4*m`` candidates, and greedily select up to ``m``
    pairs whose symbols are pairwise DISJOINT — merging (a,b) cannot
    change the adjacency count of (c,d) when {a,b} ∩ {c,d} = ∅, so every
    selected pair's recorded count is exactly its pre-round count and
    all ``m`` replaces commute; they are applied in ONE rewrite + ONE
    checkpoint. The top-(4m) candidate pool is part of the algorithm
    spec (the oracle ranks over the same pool), making the batched
    variant deterministic and oracle-checkable. Batched greedy is a
    different (documented) schedule than sequential greedy — a pair
    containing a symbol created earlier in the same round can only be
    picked next round.

    SCHEDULE CONTRACT (oracle parity): the loop runs a FIXED
    ``num_merges // batch_size`` rounds, each picking up to
    ``batch_size`` disjoint pairs — exactly the round structure the
    DuckDB oracle unrolls. A symbol-dense pool that yields fewer than
    ``batch_size`` disjoint picks in some round therefore produces
    fewer than ``num_merges`` total merges (both sides agree), rather
    than the Spark side compensating with extra rounds the oracle
    never runs. For ``batch_size > 1``, ``num_merges`` must divide
    evenly (asserted) — a final partial round would need a per-round
    ``want`` cap the fixed-round oracle does not express."""
    if batch_size > 1 and num_merges % batch_size != 0:
        raise ValueError(
            "batched BPE requires num_merges % batch_size == 0 "
            f"(got {num_merges} % {batch_size}); the fixed-round "
            "schedule has no partial final round"
        )
    # LAZY checkpoints (r15): each round's candidate-count collect is the
    # first action over the round's rep table, so it materializes the
    # checkpoint as a side effect — one Spark job per round instead of a
    # separate eager-checkpoint job plus the count (the loop is driver-
    # sequential by nature, so job count IS its wall clock)
    wc = _word_reps(docs, text_col).localCheckpoint(eager=False)

    merges: list[tuple] = []
    rounds = num_merges // batch_size
    for _round in range(rounds):
        want = batch_size
        pair = F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("__syms") - 2),
                lambda i: F.struct(
                    F.col("__syms")[i].alias("a"), F.col("__syms")[i + 1].alias("b")
                ),
            )
        )
        cand = (
            wc.select(
                "__cnt", F.split(F.trim(F.col("__rep")), "  ").alias("__syms")
            )
            # fully-merged single-symbol words have no pairs (and Spark's
            # sequence(0, -1) DESCENDS rather than yielding empty)
            .where(F.size("__syms") >= 2)
            .select("__cnt", pair.alias("__p"))
            .groupBy("__p.a", "__p.b")
            .agg(F.sum("__cnt").alias("__n"))
            .orderBy(F.desc("__n"), "a", "b")
            .limit(4 * batch_size)  # candidate pool: part of the spec
            .collect()
        )
        if not cand:
            break
        used: set[str] = set()
        picked = []
        for r in cand:
            if len(picked) >= want:
                break
            a, b = r["a"], r["b"]
            if a in used or b in used:
                continue
            picked.append((a, b, int(r["__n"])))
            used.update((a, b))
        if not picked:
            break
        rep = F.col("__rep")
        for a, b, n in picked:
            merges.append((len(merges) + 1, a, b, n))
            rep = F.replace(rep, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))
        wc = wc.withColumn("__rep", rep).localCheckpoint(eager=False)
    return wc, merges


def bpe_encode_token_counts(
    docs: DataFrame,
    num_merges: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_size: int = 1,
) -> DataFrame:
    """BPE ENCODE — the application half of the tokenizer loop
    (``bpe_train`` learns the merges; this reports what they cost): learn
    ``num_merges`` merges, apply them to the vocabulary rep table, and
    account per document: word count, BPE token count under the learned
    vocabulary, and the chars-per-token compression ratio (the token-budget
    quantity a training pipeline actually tracks).

    Encoding happens on the VOCABULARY table (tokens per unique word =
    symbols left in its rep after the merges), then joins back onto the
    corpus word stream — one shuffle join on the word key; the corpus text
    is never rewritten. Returns (doc_id, n_words, n_tokens,
    chars_per_token); empty documents report 0/0/NULL."""
    wc, _ = _bpe_learn(docs, num_merges, text_col, batch_size)
    return _token_accounting(docs, wc, text_col, id_col)


def _token_accounting(
    docs: DataFrame, wc: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Join tokens-per-unique-word (from a merged rep table) back onto the
    corpus word stream — the shared accounting tail of bpe_encode (learned
    merges) and bpe_apply (external merges)."""
    tok_per_word = wc.select(
        "__w",
        F.size(F.split(F.trim(F.col("__rep")), "  ")).cast("long").alias("__tok"),
    )
    doc_words = docs.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("__w")
    ).where(F.length("__w") >= 1)
    per_doc = (
        doc_words.join(tok_per_word, "__w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("__tok").alias("n_tokens"),
        )
    )
    return (
        docs.select(id_col, F.length(text_col).alias("__chars"))
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_words", F.lit(0)).alias("n_words"),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.round(F.col("__chars") / F.col("n_tokens"), 6).alias(
                "chars_per_token"
            ),
        )
    )


def bpe_apply_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply an EXTERNAL, already-learned merge list to a corpus — the
    tokenizer-REUSE half of the BPE story (bpe_train learns once on a
    reference corpus; every downstream corpus is measured under that
    fixed vocabulary, never retrained). Returns the same accounting as
    ``bpe_encode_token_counts``: (doc_id, n_words, n_tokens,
    chars_per_token).

    Because the merge sequence is KNOWN up front, the whole application
    is ONE pass over the vocabulary-sized rep table: all k replaces
    chain into a single codegen expression — no per-merge driver
    round-trips, no checkpoints, no pair counting. Practical k for the
    expression-chain form is hundreds-to-low-thousands (Catalyst tree
    depth); tokenizer-scale application (30k merges) would move the same
    rank-ordered merge loop into an Arrow-batched pandas UDF over the
    unique-word table — same join-back, different kernel."""
    wc = _word_reps(docs, text_col)
    rep = F.col("__rep")
    for a, b in merges:
        rep = F.replace(rep, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))
    wc = wc.select("__w", "__cnt", rep.alias("__rep"))
    return _token_accounting(docs, wc, text_col, id_col)


def cdc_chunk_stats(
    docs: DataFrame,
    window: int = 8,
    divisor: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int | None = None,
    max_len: int | None = None,
    _return_chunks: bool = False,
) -> DataFrame:
    """Content-defined-chunking dedup signals (the rolling-hash CDC family
    of LBFS/FastCDC, applied to corpus dedup): cut each document at
    positions where the hash of the trailing ``window`` characters is
    ``0 mod divisor`` (expected chunk length ≈ ``divisor``), hash each
    chunk, and report per document how many of its chunks occur elsewhere
    in the corpus. Unlike fixed blocks (``paragraph_dedup``) the cut points
    move WITH the content, so an insertion near the top of a near-duplicate
    shifts only the chunk it lands in — the classic CDC robustness.
    By default no min/max chunk bounds apply — pure content cuts keep
    every position independent and fully parallel, at the cost of
    occasional tiny/huge chunks (the measured distribution at the
    defaults is committed in README). Pass ``min_len``/``max_len`` for
    FastCDC-style BOUNDS, computed as a second bounded-recurrence pass
    over the content-cut list (r8): scanning the per-doc sorted cuts
    left to right, a content cut is ACCEPTED only if it lies at least
    ``min_len`` past the previous accepted/forced cut, and a cut is
    FORCED every ``max_len`` chars when no eligible content cut arrives.
    Both the number of forced cuts before a content cut and the forced
    positions themselves are closed-form arithmetic in (prev, cut,
    max_len), so the recurrence is ONE ``F.aggregate`` fold over the
    per-doc cut array — pure codegen, no UDF, no extra shuffle; cut
    DISCOVERY stays position-independent and parallel. The final tail
    chunk may still be shorter than ``min_len`` (FastCDC semantics).

    Returns per document: (doc_id, n_chunks, mean_chunk_len, n_dup_chunks,
    dup_chunk_frac) — a chunk is *duplicated* when its exact text occurs
    anywhere else in the corpus (other documents or elsewhere in the same
    one). Empty documents report 0 chunks.

    Scale: cut detection is explode + codegen md5 over trailing windows (no
    UDF, no shuffle); cut lists aggregate per doc (map-side combinable);
    chunk occurrence counting shuffles on the 32-hex chunk hash exactly
    like ``exact_dedup``. The explode is O(chars), same asymptotics as the
    shingle operators (dup_span_stats)."""
    base = ensure_min_parallelism(docs.select(id_col, text_col), id_col)
    d = base.select(
        id_col, text_col, F.length(text_col).alias("__n")
    )
    nonempty = d.where(F.col("__n") >= 1)
    # cut AFTER 1-indexed char i when md5 of chars [i-window+1, i] ≡ 0
    # (i >= window so the trailing window is full; i < n so the implicit
    # end-of-doc boundary is not duplicated)
    pos = nonempty.select(
        id_col,
        text_col,
        "__n",
        F.explode(F.sequence(F.lit(window), F.col("__n"))).alias("__i"),
    )
    whash = md5_long(
        F.col(text_col).substr(F.col("__i") - F.lit(window - 1), F.lit(window))
    )
    cuts = pos.where((whash % divisor == 0) & (F.col("__i") < F.col("__n")))
    cut_arr = cuts.groupBy(id_col).agg(
        F.sort_array(F.collect_list("__i")).alias("__cuts")
    )
    empty_i = F.array().cast("array<int>")
    raw_cuts = F.coalesce(F.col("__cuts"), empty_i)
    if min_len is None and max_len is None:
        eff_cuts = raw_cuts
    else:
        m = int(min_len or 0)
        # no max bound -> nothing is ever forced; model as "farther than
        # any doc" (int-safe because positions are 32-bit string offsets)
        M = int(max_len) if max_len is not None else (1 << 30)

        def _step(acc: Column, c: Column) -> Column:
            # forced cuts strictly before c: k = ceil((c - last)/M) - 1
            k = F.greatest(
                F.lit(0),
                F.ceil((c - acc["last"]).cast("double") / M).cast("int")
                - F.lit(1),
            )
            forced = F.when(
                k > 0,
                F.sequence(
                    acc["last"] + F.lit(M), acc["last"] + k * F.lit(M), F.lit(M)
                ),
            ).otherwise(empty_i)
            last1 = acc["last"] + k * F.lit(M)
            elig = c >= last1 + F.lit(m)
            return F.struct(
                F.when(elig, c).otherwise(last1).alias("last"),
                F.when(elig, F.concat(acc["cs"], forced, F.array(c)))
                .otherwise(F.concat(acc["cs"], forced))
                .alias("cs"),
            )

        folded = F.aggregate(
            raw_cuts,
            F.struct(
                F.lit(0).alias("last"), empty_i.alias("cs")
            ),
            _step,
        )
        # forced cuts in the tail (between the last accepted cut and n)
        kt = F.greatest(
            F.lit(0),
            F.ceil((F.col("__n") - folded["last"]).cast("double") / M).cast(
                "int"
            )
            - F.lit(1),
        )
        tail = F.when(
            kt > 0,
            F.sequence(
                folded["last"] + F.lit(M),
                folded["last"] + kt * F.lit(M),
                F.lit(M),
            ),
        ).otherwise(empty_i)
        eff_cuts = F.concat(folded["cs"], tail)
    bounds = nonempty.join(cut_arr, id_col, "left").select(
        id_col,
        text_col,
        F.concat(
            F.array(F.lit(0)),
            eff_cuts,
            F.array(F.col("__n")),
        ).alias("__b"),
    )
    pair = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.size("__b") - 2),
            lambda j: F.struct(
                F.col("__b")[j].alias("s"), F.col("__b")[j + 1].alias("e")
            ),
        )
    )
    chunks = bounds.select(id_col, text_col, pair.alias("__p")).select(
        id_col,
        F.col("__p.s").cast("long").alias("__cstart"),
        (F.col("__p.e") - F.col("__p.s")).cast("long").alias("__clen"),
        F.md5(
            F.col(text_col).substr(
                F.col("__p.s") + 1, F.col("__p.e") - F.col("__p.s")
            )
        ).alias("__chash"),
    )
    if _return_chunks:
        return chunks
    occ = chunks.groupBy("__chash").agg(F.count(F.lit(1)).alias("__occ"))
    per_doc = (
        chunks.join(occ, "__chash")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.round(F.avg("__clen"), 4).alias("mean_chunk_len"),
            F.sum((F.col("__occ") > 1).cast("long")).alias("n_dup_chunks"),
        )
    )
    return (
        base.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_chunks", F.lit(0)).alias("n_chunks"),
            "mean_chunk_len",
            F.coalesce("n_dup_chunks", F.lit(0)).alias("n_dup_chunks"),
            F.round(F.col("n_dup_chunks") / F.col("n_chunks"), 6).alias(
                "dup_chunk_frac"
            ),
        )
    )


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition quality signals (the Gopher-style repetition
    filters a pretraining pipeline runs before keeping a document):

    - ``n_words``        — whitespace token count
    - ``top_word_frac``  — occurrences of the single most frequent word / n_words
    - ``dup_2gram_frac`` — 1 − distinct(2-grams)/total(2-grams), 0 when < 2 words

    Scale: two explode→groupBy legs (words, 2-grams), each shuffle-parallel by
    doc_id with map-side combine; joined on doc_id. No lambdas, no UDFs —
    everything whole-stage codegen."""
    base = ensure_min_parallelism(docs.select(id_col, text_col), id_col)
    words = base.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("__w")
    )
    word_stats = (
        words.groupBy(id_col, "__w")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(id_col)
        .agg(
            F.sum("__c").alias("n_words"),
            F.max("__c").alias("__top"),
        )
        .select(
            id_col,
            "n_words",
            F.round(F.col("__top") / F.col("n_words"), 6).alias("top_word_frac"),
        )
    )
    grams = shingle_rows(base, text_col, id_col, 2)
    gram_stats = (
        grams.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("__n2"),
            F.countDistinct("__sg").alias("__d2"),
        )
        .select(
            id_col,
            F.round(F.lit(1.0) - F.col("__d2") / F.col("__n2"), 6).alias("dup_2gram_frac"),
        )
    )
    return word_stats.join(gram_stats, id_col, "left").select(
        id_col,
        "n_words",
        "top_word_frac",
        F.coalesce(F.col("dup_2gram_frac"), F.lit(0.0)).alias("dup_2gram_frac"),
    )


def domain_stats(
    docs: DataFrame,
    source_col: str = "source",
    lang_col: str = "lang",
    chars_col: str = "n_chars",
) -> DataFrame:
    """Per-source corpus composition: doc count, language count, language
    entropy (nats), mean document length — the domain-mix report a corpus
    curation run produces before weighting sources.

    Two map-side-combinable aggregations ((source, lang) then source); the
    entropy is a sum over the per-source language distribution."""
    by_lang = docs.groupBy(source_col, lang_col).agg(F.count(F.lit(1)).alias("__n"))
    tot = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(chars_col), 4).alias("avg_chars"),
    )
    p = F.col("__n") / F.col("n_docs")
    return (
        by_lang.join(tot, source_col)
        .groupBy(source_col, "n_docs", "avg_chars")
        .agg(
            F.count(F.lit(1)).alias("n_langs"),
            F.round(-F.sum(p * F.log(p)), 6).alias("lang_entropy"),
        )
        .select(source_col, "n_docs", "n_langs", "lang_entropy", "avg_chars")
    )


def ngram_lm_score(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Bigram language-model scoring (the n-gram LM perplexity filter a
    pretraining pipeline runs to rank documents): train bigram/unigram
    counts on the corpus itself, then score each document by its mean bigram
    log-probability P(w2|w1) = count(w1 w2) / count(w1 ·).

    Returns (doc_id, n_bigrams, avg_logp, perplexity) — perplexity =
    exp(-avg_logp); docs with < 2 words score NULL.

    Scale: the model IS two aggregations (bigram counts keyed by the pair,
    context counts keyed by the first word — both map-side combinable and
    vocabulary-sized, i.e. far smaller than the corpus); scoring is one
    join per table on the n-gram key, then a groupBy(doc_id) mean. No
    probability is zero by construction (every scored bigram was counted).

    The context denominator is the number of bigrams STARTING with w1
    (= occurrences of w1 excluding document-final positions), so the
    distribution per context sums to exactly 1."""
    base = ensure_min_parallelism(docs.select(id_col, text_col), id_col)
    grams = shingle_rows(base, text_col, id_col, 2).select(
        id_col,
        F.col("__sg").alias("__bg"),
        F.split(F.col("__sg"), " ", 2)[0].alias("__w1"),
    )
    bg_counts = grams.groupBy("__bg").agg(F.count(F.lit(1)).alias("__bc"))
    ctx_counts = grams.groupBy(F.col("__w1").alias("__cw")).agg(
        F.count(F.lit(1)).alias("__cc")
    )
    scored = (
        grams.join(bg_counts, "__bg")
        .join(ctx_counts, F.col("__w1") == F.col("__cw"))
        .select(id_col, F.log(F.col("__bc") / F.col("__cc")).alias("__logp"))
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("__logp"), 6).alias("avg_logp"),
        F.round(F.exp(-F.avg("__logp")), 6).alias("perplexity"),
    )
    return base.select(id_col).join(agg, id_col, "left")


def corpus_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    chars_col: str = "n_chars",
    train_buckets: int = 8,
    val_buckets: int = 1,
    n_buckets: int = 10,
) -> DataFrame:
    """Deterministic hash-based train/val/test corpus split (the
    leakage-safe split a training pipeline needs: membership is a pure
    function of the document id, stable across runs, engines, and
    partitionings — an RNG split is neither reproducible nor join-stable).

    Returns per (split, lang): doc count and char sum. One
    map-side-combinable aggregation; the md5 bucket is the same
    cross-engine hash used by the sampling operators."""
    bucket = md5_long(F.col(id_col).cast("string")) % n_buckets
    split = (
        F.when(bucket < train_buckets, F.lit("train"))
        .when(bucket < train_buckets + val_buckets, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(split.alias("split"), F.col(lang_col), F.col(chars_col))
        .groupBy("split", lang_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(chars_col).alias("sum_chars"),
        )
    )


def weighted_sample(
    docs: DataFrame,
    weight: Column,
    id_col: str = "doc_id",
    salt: str = "ws",
) -> DataFrame:
    """Deterministic per-row Bernoulli sampling with row-dependent keep
    probability (quality-weighted corpus downsampling: keep P(row) =
    ``weight`` in [0,1], e.g. a quality score — the standard way to thin a
    crawl toward its high-quality tail without an RNG).

    The uniform draw is a salted md5 of the row id mapped to [0,1), so
    membership is a pure function of (id, salt): reproducible across runs,
    engines, and partitionings, and a different ``salt`` gives an
    independent sample. Pure codegen expressions, no shuffle."""
    return docs.where(salted_uniform(F.col(id_col), salt) < weight)
