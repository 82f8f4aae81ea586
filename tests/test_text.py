"""Text dedup operators: SimHash pair search exhaustiveness."""

import pandas as pd
from pyspark.sql import functions as F

from aeon_sleap_processing_spark.operators.text import simhash, simhash_pairs


class TestSimhashPairs:
    def test_exhaustive_within_pigeonhole_bound(self, spark, sf_dir):
        """For max_hamming <= n_bands - 1 the banded join must find EVERY
        pair a brute-force all-pairs hamming scan finds (pigeonhole: <
        n_bands differing bits can't hit all bands)."""
        from aeon_sleap_processing_spark.sources import load_table

        docs = load_table(spark, "documents", sf_dir).limit(120)
        sigs = simhash(docs, bits=32).toPandas()
        brute = set()
        rows = list(zip(sigs.doc_id, sigs.simhash))
        for i, (ida, sa) in enumerate(rows):
            for idb, sb in rows[i + 1 :]:
                h = bin(int(sa) ^ int(sb)).count("1")
                if h <= 7:
                    pair = (min(ida, idb), max(ida, idb), h)
                    brute.add(pair)
        got = simhash_pairs(docs, bits=32, n_bands=8, max_hamming=7).toPandas()
        got_set = set(zip(got.id_a, got.id_b, got.hamming))
        assert got_set == brute

    def test_planted_near_duplicate_found(self, spark):
        base = (
            "the quick brown fox jumps over the lazy dog while the cat "
            "watches from the warm windowsill in the afternoon sun"
        )
        docs = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [1, 2, 3],
                    "text": [base, base + " today", "entirely unrelated content here"],
                }
            )
        )
        out = simhash_pairs(docs, n_bands=8, max_hamming=7).toPandas()
        planted = out[(out.id_a == 1) & (out.id_b == 2)]
        assert len(planted) == 1
        assert planted.hamming.iloc[0] <= 7


class TestCharNgramProfile:
    def test_counts_match_python(self, spark):
        import pandas as pd
        from aeon_sleap_processing_spark.operators.text import char_ngram_profile

        docs = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [1, 2, 3],
                    "lang": ["en", "en", "fr"],
                    "text": ["Abcabc", "bca", "xy"],  # "xy" shorter than n → no grams
                }
            )
        )
        got = char_ngram_profile(docs, n=3, top=5).toPandas()
        en = {(r.ngram, r.n) for r in got[got.lang == "en"].itertuples()}
        # lowercased: abcabc → abc,bca,cab,abc ; bca → bca
        assert en == {("abc", 2), ("bca", 2), ("cab", 1)}
        assert got[got.lang == "fr"].empty

    def test_whitespace_grams_dropped_and_rank_tiebreak(self, spark):
        import pandas as pd
        from aeon_sleap_processing_spark.operators.text import char_ngram_profile

        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "lang": ["en"], "text": ["ab ab"]})
        )
        got = char_ngram_profile(docs, n=3, top=5).toPandas()
        assert got.empty  # every trigram of "ab ab" spans the space


class TestQualityBuckets:
    def test_bucket_boundaries_on_rounded_score(self, spark, sf_dir):
        from aeon_sleap_processing_spark.operators.text import quality_buckets, text_stats
        from aeon_sleap_processing_spark.sources import load_table

        docs = load_table(spark, "documents", sf_dir)
        got = quality_buckets(docs).toPandas()
        stats = text_stats(docs).toPandas()
        srcs = docs.select("doc_id", "source").toPandas()
        merged = stats.merge(srcs, on="doc_id")
        merged["bucket"] = merged.quality_score.map(
            lambda q: "high" if q >= 0.7 else ("medium" if q >= 0.5 else "low")
        )
        expect = merged.groupby(["source", "bucket"]).size().to_dict()
        assert {(r.source, r.bucket): r.n_docs for r in got.itertuples()} == expect
        assert got.n_docs.sum() == len(merged)


class TestLengthPercentiles:
    def test_matches_numpy_linear_interpolation(self, spark, sf_dir):
        import numpy as np
        from aeon_sleap_processing_spark.operators.text import length_percentiles
        from aeon_sleap_processing_spark.sources import load_table

        docs = load_table(spark, "documents", sf_dir)
        got = length_percentiles(docs).toPandas().set_index("lang")
        pdf = docs.select("lang", "n_chars").toPandas()
        for lang, grp in pdf.groupby("lang"):
            med = np.percentile(grp.n_chars, 50, method="linear")
            p90 = np.percentile(grp.n_chars, 90, method="linear")
            assert abs(got.loc[lang, "median_len"] - round(med, 4)) < 1e-9
            assert abs(got.loc[lang, "p90_len"] - round(p90, 4)) < 1e-9


class TestMinhashShortDocs:
    def test_short_docs_have_no_signature_row(self, spark):
        """Docs with fewer than shingle_k words produce NO signature row
        (deliberate: a NULL signature would collide every short doc into one
        LSH band; the SQL oracle pins the same semantics)."""
        import pandas as pd
        from aeon_sleap_processing_spark.operators.text import lsh_buckets, minhash_signature

        docs = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [0, 1, 2, 3],
                    "text": ["one two", "a b c d e", "x", "a b c d e"],
                }
            )
        )
        sigs = minhash_signature(docs, num_perm=8, shingle_k=3)
        got = sigs.toPandas().sort_values("doc_id")
        assert got.doc_id.tolist() == [1, 3]  # 2-word and 1-word docs dropped
        assert got.notna().all().all()
        # identical long docs still bucket together; short docs never appear
        buckets = lsh_buckets(sigs, num_perm=8, band_size=2).toPandas()
        assert (buckets.n_docs == 2).all()
        assert set(buckets.min_doc) == {1} and set(buckets.max_doc) == {3}


class TestSamplingDeterminism:
    def test_stable_under_partitioning_changes(self, spark, sf_dir):
        """Hash-ranked sampling must select the SAME rows regardless of
        shuffle-partition count or input partitioning (SURVEY P11 pins
        reproducible-across-engines sampling; an RNG sampler would not be)."""
        from aeon_sleap_processing_spark.operators.util import sample_n_per_bin
        from aeon_sleap_processing_spark.sources import load_table

        ev = load_table(spark, "events", sf_dir)
        base = sorted(
            sample_n_per_bin(ev, "event_type", 7).select("event_id").toPandas().event_id
        )
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "3")
            repart = sorted(
                sample_n_per_bin(ev.repartition(5), "event_type", 7)
                .select("event_id")
                .toPandas()
                .event_id
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        assert base == repart


class TestRepetitionDomainStats:
    def test_repetition_vs_pandas(self, spark):
        import pandas as pd
        from aeon_sleap_processing_spark.operators.text import repetition_stats

        docs = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [0, 1, 2],
                    "text": ["a b a b a", "x y z", "w"],
                }
            )
        )
        got = repetition_stats(docs).toPandas().set_index("doc_id").sort_index()
        # doc 0: 5 words, top 'a' x3 -> 0.6; 2-grams: ab ba ab ba -> 2 distinct/4 -> dup 0.5
        assert got.loc[0, "n_words"] == 5
        assert abs(got.loc[0, "top_word_frac"] - 0.6) < 1e-9
        assert abs(got.loc[0, "dup_2gram_frac"] - 0.5) < 1e-9
        # doc 2: single word -> no 2-grams -> dup frac 0
        assert got.loc[2, "n_words"] == 1
        assert got.loc[2, "dup_2gram_frac"] == 0.0

    def test_domain_entropy(self, spark):
        import math
        import pandas as pd
        from aeon_sleap_processing_spark.operators.text import domain_stats

        docs = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": range(4),
                    "source": ["s1", "s1", "s1", "s2"],
                    "lang": ["en", "en", "fr", "de"],
                    "n_chars": [10, 20, 30, 40],
                }
            )
        )
        got = domain_stats(docs).toPandas().set_index("source")
        exp = -(2 / 3 * math.log(2 / 3) + 1 / 3 * math.log(1 / 3))
        assert abs(got.loc["s1", "lang_entropy"] - round(exp, 6)) < 1e-9
        assert got.loc["s2", "lang_entropy"] == 0.0
        assert got.loc["s1", "n_langs"] == 2 and got.loc["s1", "n_docs"] == 3


class TestNgramLm:
    def test_bigram_lm_vs_hand_computed(self, spark):
        import math
        import pandas as pd
        from aeon_sleap_processing_spark.operators.text import ngram_lm_score

        # corpus bigrams: "a b" x2, "b a" x1, "b c" x1; contexts: a->2, b->2
        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": [0, 1, 2], "text": ["a b a", "a b c", "x"]})
        )
        got = ngram_lm_score(docs).toPandas().set_index("doc_id").sort_index()
        # doc 0: P(b|a)=2/2=1, P(a|b)=1/2 -> mean log = (0 + ln .5)/2
        exp0 = (math.log(1.0) + math.log(0.5)) / 2
        assert got.loc[0, "n_bigrams"] == 2
        assert abs(got.loc[0, "avg_logp"] - round(exp0, 6)) < 1e-9
        assert abs(got.loc[0, "perplexity"] - round(math.exp(-exp0), 6)) < 1e-9
        # doc 2: single word -> no bigrams -> NULL score row kept
        assert pd.isna(got.loc[2, "avg_logp"])


class TestWeightedSample:
    def test_membership_is_pure_function_of_id_and_weight(self, spark):
        import pandas as pd
        from pyspark.sql import functions as F
        from aeon_sleap_processing_spark.operators.text import weighted_sample

        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": range(2000), "w": [0.25] * 1000 + [0.9] * 1000})
        )
        kept = weighted_sample(docs, F.col("w")).toPandas()
        kept2 = weighted_sample(docs.repartition(7), F.col("w")).toPandas()
        # deterministic under repartitioning
        assert sorted(kept.doc_id) == sorted(kept2.doc_id)
        # keep rates track the weights (hash-uniform, so loose bounds)
        lo = kept[kept.doc_id < 1000]
        hi = kept[kept.doc_id >= 1000]
        assert 0.15 < len(lo) / 1000 < 0.35
        assert 0.84 < len(hi) / 1000 < 0.96
        # weight 0 keeps nothing, weight 1 keeps everything
        none = weighted_sample(docs, F.lit(0.0)).count()
        all_ = weighted_sample(docs, F.lit(1.0)).count()
        assert none == 0 and all_ == 2000
        # different salt -> different (still deterministic) sample
        other = weighted_sample(docs, F.col("w"), salt="ws2").toPandas()
        assert sorted(other.doc_id) != sorted(kept.doc_id)


class TestDecontaminate:
    def test_overlap_fractions_vs_python(self, spark):
        from aeon_sleap_processing_spark.operators.text import decontaminate

        docs = pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "a b c d e",          # shingles: abc bcd cde
                    "a b c x y z",        # shingles: abc bcx cxy xyz
                    "p q r s",            # shingles: pqr qrs
                ],
            }
        )
        bench = pd.DataFrame({"doc_id": [100], "text": ["a b c d q"]})  # abc bcd cdq
        out = (
            decontaminate(
                spark.createDataFrame(docs), spark.createDataFrame(bench), threshold=0.5
            )
            .orderBy("doc_id")
            .toPandas()
        )
        assert out.doc_id.tolist() == [1, 2, 3]
        assert out.n_shingles.tolist() == [3, 4, 2]
        assert out.n_hit.tolist() == [2, 1, 0]   # abc+bcd; abc; none
        assert out.contaminated.tolist() == [True, False, False]

    def test_short_docs_absent_and_duplicate_bench_shingles_count_once(self, spark):
        from aeon_sleap_processing_spark.operators.text import decontaminate

        docs = pd.DataFrame({"doc_id": [1, 2], "text": ["a b", "a b c a b c"]})
        # benchmark repeats 'a b c' across two docs — must count once
        bench = pd.DataFrame({"doc_id": [9, 10], "text": ["a b c", "a b c"]})
        out = decontaminate(
            spark.createDataFrame(docs), spark.createDataFrame(bench)
        ).toPandas()
        # doc 1 has < 3 words -> no shingles -> no row
        assert out.doc_id.tolist() == [2]
        # doc 2 distinct shingles: abc bca cab abc -> {abc, bca, cab}; hit: abc
        assert out.n_shingles.tolist() == [4 - 1]
        assert out.n_hit.tolist() == [1]


class TestDupSpanStats:
    def test_planted_duplicated_span(self, spark):
        from aeon_sleap_processing_spark.operators.text import dup_span_stats

        shared = "alpha beta gamma delta epsilon zeta eta"  # 7 words
        docs = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [0, 1, 2],
                    "text": [
                        "unique0 words0 here0 " + shared + " tail0 only0 mine0",
                        "different head1 words1 " + shared + " closing1 text1",
                        "no overlap at all in this one document",
                    ],
                }
            )
        )
        got = dup_span_stats(docs, k=5).toPandas().set_index("doc_id").sort_index()
        # the 7 shared words give 3 consecutive duplicated 5-shingles in each
        assert got.loc[0, "max_dup_run"] == 3
        assert got.loc[1, "max_dup_run"] == 3
        assert got.loc[2, "max_dup_run"] == 0 and got.loc[2, "n_dup"] == 0
        # run of r duplicated k-shingles covers r + k - 1 = 7 words = len(shared)
        assert got.loc[0, "n_dup"] == 3

    def test_short_docs_zero_shingles(self, spark):
        from aeon_sleap_processing_spark.operators.text import dup_span_stats

        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": [0], "text": ["just four words here"]})
        )
        got = dup_span_stats(docs, k=5).toPandas()
        assert got.n_shingles[0] == 0 and got.max_dup_run[0] == 0
        assert pd.isna(got.dup_frac[0])


class TestDupSpanCut:
    def test_keeper_survives_cut(self, spark):
        from aeon_sleap_processing_spark.operators.text import dup_span_cut

        shared = "alpha beta gamma delta epsilon zeta eta"  # 7 words
        docs = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [0, 1, 2],
                    "text": [
                        "unique0 words0 here0 " + shared + " tail0 only0 mine0",
                        "different head1 words1 " + shared + " closing1 text1",
                        "no overlap at all in this one document",
                    ],
                }
            )
        )
        got = dup_span_cut(docs, k=5).toPandas().set_index("doc_id").sort_index()
        # doc 0 holds the corpus-first occurrence of every shared shingle
        assert got.loc[0, "text"] == "unique0 words0 here0 " + shared + " tail0 only0 mine0"
        assert got.loc[0, "n_cut"] == 0
        # doc 1 loses exactly the 7 shared words (3 dup shingles cover 3+5-1)
        assert got.loc[1, "text"] == "different head1 words1 closing1 text1"
        assert got.loc[1, "n_cut"] == 7 and got.loc[1, "n_kept"] == 5
        # untouched doc passes through
        assert got.loc[2, "n_cut"] == 0
        assert got.loc[2, "text"] == "no overlap at all in this one document"

    def test_within_doc_repeat_keeps_first(self, spark):
        from aeon_sleap_processing_spark.operators.text import dup_span_cut

        span = "one two three four five"
        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": [0], "text": [span + " junk " + span]})
        )
        got = dup_span_cut(docs, k=5).toPandas()
        assert got.text[0] == span + " junk"
        assert got.n_cut[0] == 5 and got.n_kept[0] == 6

    def test_short_doc_untouched_and_word_accounting(self, spark):
        from aeon_sleap_processing_spark.operators.text import dup_span_cut

        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": [0, 1], "text": ["just four words here", "a b c d e"]})
        )
        got = dup_span_cut(docs, k=5).toPandas().set_index("doc_id").sort_index()
        assert got.loc[0, "text"] == "just four words here"
        assert (got.n_kept + got.n_cut).tolist() == [4, 5]

    def test_fully_duplicated_doc_emptied(self, spark):
        from aeon_sleap_processing_spark.operators.text import dup_span_cut

        span = "p q r s t"
        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": [0, 1], "text": [span, span]})
        )
        got = dup_span_cut(docs, k=5).toPandas().set_index("doc_id").sort_index()
        assert got.loc[0, "text"] == span  # keeper
        assert got.loc[1, "text"] == "" and got.loc[1, "n_kept"] == 0
        assert got.loc[1, "n_cut"] == 5


class TestCdcChunkStats:
    def test_shift_robustness_and_counts(self, spark):
        """The CDC property fixed blocks lack: prepending one char to a
        duplicate document shifts cut positions but chunk CONTENT past the
        first content-defined cut re-aligns, so most chunks still dedup.
        Also pins exact bookkeeping: identical docs dup every chunk; the
        empty doc reports 0 chunks; a unique doc reports 0 dups."""
        import numpy as np

        from aeon_sleap_processing_spark.operators.text import cdc_chunk_stats

        rng = np.random.RandomState(11)
        alpha = "abcdefghijklmnopqrstuvwxyz "
        body = "".join(alpha[i] for i in rng.randint(0, len(alpha), 2000))
        rows = [
            (0, body),
            (1, body),          # exact duplicate: every chunk duplicated
            (2, "X" + body),    # shifted near-duplicate
            (3, "".join(alpha[i] for i in rng.randint(0, len(alpha), 500))),
            (4, ""),            # empty
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in cdc_chunk_stats(df).collect()}

        assert out[0]["n_chunks"] > 5  # 2000 chars / divisor 64 ≈ 30 cuts
        assert out[0]["n_dup_chunks"] == out[0]["n_chunks"]  # doc 1 matches all
        assert out[1]["dup_chunk_frac"] == 1.0
        # shifted copy: everything after the first shared cut re-aligns, so
        # at most the leading chunk (plus hash-luck) fails to dedup
        assert out[2]["n_dup_chunks"] >= out[2]["n_chunks"] - 1
        assert out[3]["n_dup_chunks"] == 0
        assert out[4]["n_chunks"] == 0 and out[4]["dup_chunk_frac"] is None

    def test_chunks_partition_the_text(self, spark):
        """Chunk lengths per doc must sum to the doc length (cuts are a
        partition of [0, n))."""
        from pyspark.sql import functions as F

        from aeon_sleap_processing_spark.operators.text import cdc_chunk_stats
        from aeon_sleap_processing_spark.sources import load_table

        docs = load_table(spark, "documents", "/root/testdata/sf0.001").limit(200)
        out = cdc_chunk_stats(docs)
        joined = (
            out.join(docs.select("doc_id", F.length("text").alias("n")), "doc_id")
            .select(
                "doc_id",
                (F.round(F.col("mean_chunk_len") * F.col("n_chunks"))
                 .cast("long") == F.col("n")).alias("ok"),
                (F.col("n") == 0).alias("empty"),
            )
        )
        bad = joined.where(~F.col("ok") & ~F.col("empty")).count()
        assert bad == 0

    def test_bounded_matches_sequential_reference(self, spark):
        """min_len/max_len bounds (r8): the array-fold derivation over the
        content-cut list must equal an INDEPENDENT sequential FastCDC-style
        scan (walk the text, skip ineligible positions, force a cut every
        max_len chars) — the theorem behind doing bounds without a
        sequential pass. Random texts, aggressive divisor so all code
        paths (skipped cuts, forced runs, tail forcing) are exercised."""
        import hashlib

        import numpy as np

        from aeon_sleap_processing_spark.operators.text import cdc_chunk_stats

        window, divisor, m, M = 3, 4, 4, 17

        def is_content_cut(text, i):  # cut after 1-indexed char i
            if i < window or i >= len(text):
                return False
            w = text[i - window : i]
            h = int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
            return h % divisor == 0

        def ref_cuts(text):
            n, last, cuts = len(text), 0, []
            pos = 1
            while pos < n:
                if pos - last >= M:
                    cuts.append(last + M)
                    last = last + M
                    pos = last + 1
                    continue
                if pos - last >= m and is_content_cut(text, pos):
                    cuts.append(pos)
                    last = pos
                pos += 1
            return cuts

        rng = np.random.RandomState(7)
        alpha = "abc d"
        rows = [
            (i, "".join(alpha[j] for j in rng.randint(0, len(alpha), ln)))
            for i, ln in enumerate([0, 1, 3, 16, 17, 18, 40, 200, 1000])
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        chunks = cdc_chunk_stats(
            df, window=window, divisor=divisor,
            min_len=m, max_len=M, _return_chunks=True,
        )
        got = {}
        for r in chunks.collect():
            got.setdefault(r["doc_id"], []).append((r["__cstart"], r["__clen"]))
        for doc_id, text in rows:
            n = len(text)
            exp_bounds = [0] + ref_cuts(text) + [n]
            exp = [
                (s, e - s) for s, e in zip(exp_bounds, exp_bounds[1:])
            ] if n else []
            assert sorted(got.get(doc_id, [])) == exp, (doc_id, text)
        # invariants: no chunk exceeds max_len; only the LAST chunk of a
        # doc may undershoot min_len
        for doc_id, text in rows:
            cl = sorted(got.get(doc_id, []))
            assert all(length <= M for _, length in cl)
            assert all(length >= m for _, length in cl[:-1])

    def test_bounds_default_off_identical(self, spark):
        """min_len=None/max_len=None must be byte-identical to the r7
        unbounded operator (the q_cdc_dedup oracle contract)."""
        from aeon_sleap_processing_spark.operators.text import cdc_chunk_stats
        from aeon_sleap_processing_spark.sources import load_table

        docs = load_table(spark, "documents", "/root/testdata/sf0.001").limit(50)
        a = cdc_chunk_stats(docs).orderBy("doc_id").collect()
        b = cdc_chunk_stats(docs, min_len=None, max_len=None).orderBy(
            "doc_id"
        ).collect()
        assert a == b


class TestBpeTrain:
    def test_matches_reference_implementation(self, spark):
        """bpe_train must reproduce the classic sequential BPE (Sennrich et
        al. 2016: recount pairs each round, merge the argmax greedily
        left-to-right) including the overlap case ('aaa' merges the first
        two) and fully-merged words dropping out of the pair pool."""
        import collections

        from aeon_sleap_processing_spark.operators.text import bpe_train

        def ref_bpe(words, k):
            vocab = collections.Counter(words)
            reps = {w: tuple(list(w) + ["</w>"]) for w in vocab}
            merges = []
            for rank in range(1, k + 1):
                pairs = collections.Counter()
                for w, c in vocab.items():
                    s = reps[w]
                    for i in range(len(s) - 1):
                        pairs[(s[i], s[i + 1])] += c
                if not pairs:
                    break
                (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
                merges.append((rank, a, b, n))
                for w in reps:
                    s = reps[w]
                    out, i = [], 0
                    while i < len(s):
                        if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                            out.append(a + b)
                            i += 2
                        else:
                            out.append(s[i])
                            i += 1
                    reps[w] = tuple(out)
            return merges

        text = (
            "low low low low low lower lower newest newest newest newest "
            "newest newest widest widest widest aaa aaa baaab "
            "go go go go go go go go go go go go"
        )
        expected = ref_bpe(text.split(), 14)
        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        got = [
            (r.merge_rank, r.left, r.right, r.pair_count)
            for r in bpe_train(df, 14).orderBy("merge_rank").collect()
        ]
        assert got == expected

    def test_runs_out_of_pairs(self, spark):
        from aeon_sleap_processing_spark.operators.text import bpe_train

        df = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
        out = bpe_train(df, 50).collect()  # a+b, ab+</w> -> one symbol left
        assert len(out) == 2

    def test_batched_matches_its_spec(self, spark):
        """batch_size=m: per round, greedy pick of up to m symbol-disjoint
        pairs from the top-4m (count DESC, pair ASC) pool; every recorded
        count is the pre-round count. Check against a reference Python
        implementation of exactly that schedule, and that picks within a
        round share no symbol."""
        import collections

        from aeon_sleap_processing_spark.operators.text import bpe_train

        def ref_batched(words, k, m):
            vocab = collections.Counter(words)
            reps = {w: tuple(list(w) + ["</w>"]) for w in vocab}
            merges, round_sizes = [], []
            while len(merges) < k:
                pairs = collections.Counter()
                for w, c in vocab.items():
                    s = reps[w]
                    for i in range(len(s) - 1):
                        pairs[(s[i], s[i + 1])] += c
                if not pairs:
                    break
                pool = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
                pool = pool[: 4 * m]
                used, picked = set(), []
                for (a, b), n in pool:
                    if len(picked) >= min(m, k - len(merges)):
                        break
                    if a in used or b in used:
                        continue
                    picked.append((a, b, n))
                    used.update((a, b))
                if not picked:
                    break
                round_sizes.append(len(picked))
                for a, b, n in picked:
                    merges.append((len(merges) + 1, a, b, n))
                    for w in reps:
                        s = reps[w]
                        out, i = [], 0
                        while i < len(s):
                            if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                                out.append(a + b)
                                i += 2
                            else:
                                out.append(s[i])
                                i += 1
                        reps[w] = tuple(out)
            return merges, round_sizes

        text = (
            "low low low low low lower lower newest newest newest newest "
            "newest newest widest widest widest aaa aaa baaab "
            "go go go go go go go go go go go go"
        )
        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        got = [
            (r.merge_rank, r.left, r.right, r.pair_count)
            for r in bpe_train(df, 12, batch_size=4)
            .orderBy("merge_rank")
            .collect()
        ]
        expected, round_sizes = ref_batched(text.split(), 12, 4)
        assert got == expected
        # applying a round's replaces in one chain is only valid because
        # its picks are pairwise symbol-disjoint — assert it held per
        # ACTUAL round (rounds may pick fewer than m)
        start = 0
        for size in round_sizes:
            pick_syms = [
                {a, b} for _, a, b, _ in got[start : start + size]
            ]
            for i, si in enumerate(pick_syms):
                for sj in pick_syms[i + 1 :]:
                    assert not (si & sj), got[start : start + size]
            start += size


class TestBpeEncode:
    def test_token_accounting(self, spark):
        """Encoding under 0 merges = chars+1 per word (</w> counts); more
        merges never increase the token count; empty docs report 0/NULL."""
        from aeon_sleap_processing_spark.operators.text import (
            bpe_encode_token_counts,
        )

        rows = [(0, "low low lower"), (1, ""), (2, "low")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        zero = {r.doc_id: r for r in bpe_encode_token_counts(df, 0).collect()}
        # chars + 1 (</w>) per word: low=4, low=4, lower=6
        assert zero[0].n_words == 3 and zero[0].n_tokens == 4 + 4 + 6
        assert zero[1].n_words == 0 and zero[1].n_tokens == 0
        assert zero[1].chars_per_token is None
        eight = {r.doc_id: r for r in bpe_encode_token_counts(df, 8).collect()}
        for d in (0, 2):
            assert eight[d].n_tokens <= zero[d].n_tokens
            assert eight[d].n_words == zero[d].n_words


class TestFuzzyPairs:
    def test_exact_vs_bruteforce(self, spark, sf_dir):
        """The q-gram count filter + short-string leg must introduce NO
        false negatives: compare against a brute-force all-pairs
        Levenshtein scan over the FULL distinct vocabulary (no length
        filter — the short stratum goes through the broadcast NL leg)."""
        from aeon_sleap_processing_spark.operators.text import fuzzy_pairs
        from aeon_sleap_processing_spark.sources import load_table

        def lev(a, b):
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i]
                for j, cb in enumerate(b, 1):
                    cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
                prev = cur
            return prev[-1]

        part = load_table(spark, "part", sf_dir)
        names = sorted(
            r[0] for r in part.select("p_name").distinct().collect()
        )
        brute = {
            (a, b, lev(a, b))
            for i, a in enumerate(names)
            for b in names[i + 1 :]
            if lev(a, b) <= 2
        }
        got = {
            (r.name_a, r.name_b, r.dist)
            for r in fuzzy_pairs(part, "p_name", max_dist=2, q=2).collect()
        }
        assert got == brute and len(brute) > 0

    def test_short_string_leg(self, spark):
        """Strings below (d+1)*q chars must participate in the pair
        search — the r7 gap. Covers short-short pairs, short-long pairs,
        and the ordering edge where the LONG member sorts before the
        short one (would be lost by a naive sa < sb join)."""
        from aeon_sleap_processing_spark.operators.text import fuzzy_pairs

        vocab = [
            "cat", "cart",          # short-short, dist 1
            "abcde", "abcdef",      # short(5)-long(6), dist 1, short first
            "aaaaaa", "aaaab",      # long(6)-short(5), LONG sorts first
            "zzzzzz",               # long, no partner
            "qq",                   # short, no partner
        ]
        df = spark.createDataFrame([(v,) for v in vocab], "v string")
        got = {
            (r.name_a, r.name_b, r.dist)
            for r in fuzzy_pairs(df, "v", max_dist=2, q=2).collect()
        }
        assert ("cart", "cat", 1) in got
        assert ("abcde", "abcdef", 1) in got
        assert ("aaaaaa", "aaaab", 2) in got
        assert all(
            "zzzzzz" not in p and "qq" not in p for p in got
        ), got


# ---------------------------------------------------------------------------
# property test: fuzzy_pairs (both legs) vs brute-force Levenshtein
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_vocab = st.lists(
    st.text(alphabet="ab", min_size=1, max_size=9),
    min_size=2,
    max_size=25,
    unique=True,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(vocab=_vocab, d=st.integers(min_value=1, max_value=2))
def test_fuzzy_pairs_matches_bruteforce_any_vocab(spark_global, vocab, d):
    """Random tiny-alphabet vocabularies (dense edit-distance neighborhoods,
    lengths straddling the (d+1)*q gram floor): the gram leg + short-string
    leg together must equal an all-pairs Levenshtein scan exactly — no
    false negatives from the count filter, no misses in the short stratum,
    no duplicates from the leg union."""
    from aeon_sleap_processing_spark.operators.text import fuzzy_pairs

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    brute = {
        (a, b, lev(a, b))
        for i, a in enumerate(sorted(vocab))
        for b in sorted(vocab)[i + 1 :]
        if lev(a, b) <= d
    }
    df = spark_global.createDataFrame([(v,) for v in vocab], "v string")
    rows = fuzzy_pairs(df, "v", max_dist=d, q=2).collect()
    got = [(r.name_a, r.name_b, r.dist) for r in rows]
    assert len(got) == len(set(got))  # no duplicate pairs across legs
    assert set(got) == brute


class TestBpeBatchedSchedule:
    def test_indivisible_num_merges_rejected(self, spark):
        """r8 ADVICE (low): the batched loop runs the FIXED round count
        the oracle unrolls; a partial final round is inexpressible, so
        num_merges % batch_size != 0 must be rejected up front."""
        import pytest as _pytest

        from aeon_sleap_processing_spark.operators.text import bpe_train

        df = spark.createDataFrame([("ab ab",)], "text string")
        with _pytest.raises(ValueError, match="num_merges % batch_size"):
            bpe_train(df, num_merges=5, batch_size=4)

    def test_dense_pool_yields_fewer_merges_not_extra_rounds(self, spark):
        """When a round's candidate pool is symbol-dense (fewer than
        batch_size disjoint picks available), the fixed-round schedule
        returns FEWER than num_merges merges — it must not run extra
        rounds the oracle never executes. One word 'abcd' has only
        overlapping pairs; each of the 2 rounds picks at most 2 disjoint
        pairs, so 8 requested merges cannot all materialize."""
        from aeon_sleap_processing_spark.operators.text import bpe_train

        df = spark.createDataFrame([("abcd",)], "text string")
        out = bpe_train(df, num_merges=8, batch_size=4).collect()
        assert 0 < len(out) < 8


class TestQualityClassifier:
    """r11: the trained classifier-filter stage. The pinned-coefficient
    sigmoid faces the driver oracle (q_quality_classifier); here we pin
    the operator's contract on constructed docs."""

    def test_scores_and_keep_semantics(self, spark):
        from aeon_sleap_processing_spark.operators.text import (
            quality_classifier,
        )

        docs = spark.createDataFrame(
            [(1, "the cat and the dog in the house is a friend of all"),
             (2, "zzz qqq xxx")],
            "doc_id long, text string",
        )
        # hand weights: stopword-rich doc scores high, junk scores low
        out = {
            r.doc_id: r
            for r in quality_classifier(
                docs, weights=[10.0, 0.0, 0.0], bias=-2.0, threshold=0.5
            ).collect()
        }
        assert out[1].keep and not out[2].keep
        assert 0.0 <= out[2].clf_score < 0.5 <= out[1].clf_score <= 1.0
        # score is the 6-decimal-rounded sigmoid of the exact features:
        # doc 1 has 8/13 stopwords (the x3, and, in, is, a, of)
        import math

        z = 10.0 * round(8 / 13, 6) - 2.0
        assert out[1].clf_score == round(1.0 / (1.0 + math.exp(-z)), 6)

    def test_weight_arity_validated(self, spark):
        import pytest as _pytest

        from aeon_sleap_processing_spark.operators.text import (
            quality_classifier,
        )

        docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        with _pytest.raises(ValueError, match="expected 3 weights"):
            quality_classifier(docs, weights=[1.0], bias=0.0)

    def test_pinned_artifact_agrees_with_teacher(self, spark):
        """The committed coefficients must keep distilling the teacher:
        >= 97% agreement with the quality_score >= 0.52 cut at sf0.001
        (trained at sf0.01, AUC 0.99997 — a regression here means the
        artifact and the features drifted apart)."""
        import json
        import os

        from pyspark.sql import functions as F

        from aeon_sleap_processing_spark.operators.text import (
            quality_classifier,
            text_stats,
        )
        from aeon_sleap_processing_spark.sources.catalog import load_table

        p = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools", "quality_clf_trained.json",
        )
        with open(p) as f:
            clf = json.load(f)
        docs = load_table(spark, "documents", "/root/testdata/sf0.001")
        scored = quality_classifier(docs, clf["weights"], clf["bias"])
        teacher = text_stats(docs).select(
            "doc_id", (F.col("quality_score") >= 0.52).alias("t")
        )
        j = scored.join(teacher, "doc_id")
        n = j.count()
        agree = j.where(F.col("keep") == F.col("t")).count()
        assert agree / n >= 0.97, (agree, n)


class TestMinhashBandsFor:
    """r14 VERDICT task 2: the minhash band-sizing law as CODE. Evidence
    it binds: the driver's fixed 2-perm bands at 500k natural docs hit
    the quadratic common-shingle floor (>30 GB shuffle, killed —
    bench_runs_r14/minhash_decade2.json failure observations)."""

    def test_two_decade_plan_pins(self):
        """Pin the law's output at the decade-2 probe's two corpus sizes
        (cd50k / cd500k) so the production sizing is a committed fact."""
        import math

        from aeon_sleap_processing_spark.operators.text import (
            minhash_bands_for,
        )

        for n, want_r in [(50_000, 6), (500_000, 7)]:
            num_perm, r, n_bands = minhash_bands_for(
                n, threshold=0.7, target_recall=0.95, p_background=0.1
            )
            assert r == want_r == math.ceil(
                (math.log2(n) + 2) / math.log2(10)
            )
            assert num_perm == r * n_bands
            # the floor rule: expected random candidates PER DOC
            # (n_bands * p_bg^r * n / 2) bounded by n_bands/2^(margin+1)
            # independent of n — the quadratic term is gone
            floor_per_doc = n_bands * 0.1**r * n / 2
            assert floor_per_doc <= n_bands / 8, (n, floor_per_doc)
            # amplification identity: recall target met, not oversized
            achieved = 1 - (1 - 0.7**r) ** n_bands
            assert achieved >= 0.95
            if n_bands > 1:
                assert 1 - (1 - 0.7**r) ** (n_bands - 1) < 0.95

    def test_monotone_and_validates(self):
        import pytest

        from aeon_sleap_processing_spark.operators.text import (
            minhash_bands_for,
        )

        _, r1, _ = minhash_bands_for(1_000)
        _, r2, _ = minhash_bands_for(1_000_000)
        assert r2 > r1  # band_size grows with log n
        # tighter threshold -> fewer bands needed at same r
        _, _, nb_loose = minhash_bands_for(50_000, threshold=0.7)
        _, _, nb_tight = minhash_bands_for(50_000, threshold=0.95)
        assert nb_tight < nb_loose
        for bad in [
            dict(n_docs=0),
            dict(n_docs=10, threshold=0.0),
            dict(n_docs=10, threshold=1.5),
            dict(n_docs=10, target_recall=1.0),
            dict(n_docs=10, p_background=0.0),
        ]:
            with pytest.raises(ValueError):
                minhash_bands_for(**bad)

    def test_lsh_buckets_auto_bands_refuses_narrow_signature(self, spark):
        """A signature too narrow for the law must raise WITH the wanted
        plan — the silent alternative is the measured quadratic kill."""
        import pytest

        from aeon_sleap_processing_spark.operators.text import (
            lsh_buckets, minhash_signature,
        )

        docs = spark.createDataFrame(
            [(i, f"alpha beta gamma delta epsilon doc{i}") for i in range(30)],
            "doc_id long, text string",
        )
        sigs = minhash_signature(docs, num_perm=4)
        with pytest.raises(ValueError, match="num_perm="):
            lsh_buckets(sigs, num_perm=4, auto_bands=True, n_docs=500_000)

    def test_auto_sized_audit_finds_planted_dups(self, spark):
        """minhash_est_vs_exact(auto_bands=True) end-to-end on a small
        corpus with planted near-dups: the auto plan (sized from ONE
        count) recalls every planted pair with exact_jaccard ~1."""
        from aeon_sleap_processing_spark.operators.text import (
            minhash_est_vs_exact,
        )

        base = [
            " ".join(f"w{(7 * i + j) % 23}" for j in range(30))
            for i in range(40)
        ]
        rows = []
        for i, t in enumerate(base):
            rows.append((2 * i, t))
            rows.append((2 * i + 1, t + " tail"))  # near-dup partner
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = minhash_est_vs_exact(docs, auto_bands=True, threshold=0.7)
        pairs = {
            (r.id_a, r.id_b): r.exact_jaccard for r in out.collect()
        }
        for i in range(40):
            assert (2 * i, 2 * i + 1) in pairs, i  # every planted pair
            assert pairs[(2 * i, 2 * i + 1)] > 0.85
