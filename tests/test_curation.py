"""Corpus-curation operators: sequence packing, segment dedup, PII scan,
domain mixture — pandas-oracle and invariant tests on crafted inputs."""

import math

import pandas as pd
from pyspark.sql import functions as F

from aeon_sleap_processing_spark.operators.curation import (
    domain_mixture_sample,
    pack_sequences,
    paragraph_dedup,
    pii_scan,
)


def _docs(spark, texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return spark.createDataFrame(pd.DataFrame({"doc_id": ids, "text": texts}))


class TestPackSequences:
    def test_matches_sequential_oracle(self, spark):
        texts = ["w " * n for n in (3, 10, 4, 7, 1, 12, 5)]
        cap = 8
        got = pack_sequences(_docs(spark, [t.strip() for t in texts]), capacity=cap).toPandas()

        # sequential oracle: concatenate doc token streams, cut every cap
        lens = [3, 10, 4, 7, 1, 12, 5]
        total = sum(lens)
        n_seqs = math.ceil(total / cap)
        assert list(got.seq_id) == list(range(n_seqs))
        assert got.n_tokens.sum() == total
        # every sequence except possibly the last is exactly full
        assert (got.n_tokens[:-1] == cap).all()
        # straddle consistency: doc straddles out of seq k iff it starts
        # before (k+1)*cap and ends after
        off = 0
        per_seq_docs = [set() for _ in range(n_seqs)]
        for i, n in enumerate(lens):
            for s in range(off // cap, (off + n - 1) // cap + 1):
                per_seq_docs[s].add(i)
            off += n
        assert list(got.n_docs) == [len(s) for s in per_seq_docs]

    def test_chunking_invariant(self, spark):
        """Global result must not depend on the prefix-sum chunk size."""
        texts = ["tok " * (n % 13 + 1) for n in range(97)]
        df = _docs(spark, [t.strip() for t in texts])
        a = pack_sequences(df, capacity=32, chunk=7).toPandas()
        b = pack_sequences(df, capacity=32, chunk=1000).toPandas()
        pd.testing.assert_frame_equal(a, b)

    def test_empty_docs_skipped(self, spark):
        got = pack_sequences(_docs(spark, ["a b c", "", "d e"]), capacity=4).toPandas()
        assert got.n_tokens.sum() == 5


class TestParagraphDedup:
    def test_first_occurrence_wins(self, spark):
        blk = "one two three four five six seven eight nine ten"
        docs = _docs(
            spark,
            [
                blk + " unique tail of document zero",
                blk,  # fully duplicated block -> 0 kept
                "fresh content here",
            ],
        )
        got = (
            paragraph_dedup(docs, block_words=10)
            .toPandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert got.loc[0, "n_kept"] == 2 and got.loc[0, "dedup_text"].startswith(blk)
        assert got.loc[1, "n_kept"] == 0 and got.loc[1, "dedup_text"] == ""
        assert got.loc[2, "n_kept"] == 1

    def test_within_doc_repeat_deduped(self, spark):
        blk = "a b c d e f g h i j"
        got = paragraph_dedup(_docs(spark, [blk + " " + blk]), block_words=10).toPandas()
        assert got.n_blocks[0] == 2 and got.n_kept[0] == 1
        assert got.dedup_text[0] == blk

    def test_order_preserved(self, spark):
        words = [f"w{i}" for i in range(30)]
        text = " ".join(words)
        got = paragraph_dedup(_docs(spark, [text]), block_words=10).toPandas()
        assert got.dedup_text[0] == text


class TestPiiScan:
    def test_counts_and_redaction(self, spark):
        docs = _docs(
            spark,
            [
                "mail me at jane.doe+x@sub.example.org thanks",
                "server 192.168.0.1 and 10.0.0.255 up",
                "call +44 20 7946 0958 or 555-123-4567 now",
                "clean text with no pii at all",
            ],
        )
        got = pii_scan(docs).toPandas().set_index("doc_id").sort_index()
        assert got.loc[0, "n_email"] == 1 and "<EMAIL>" in got.loc[0, "redacted_text"]
        assert "jane" not in got.loc[0, "redacted_text"]
        assert got.loc[1, "n_ipv4"] == 2 and got.loc[1, "redacted_text"].count("<IP>") == 2
        assert got.loc[2, "n_phone"] == 2 and got.loc[2, "redacted_text"].count("<PHONE>") == 2
        assert (got.loc[3, ["n_email", "n_phone", "n_ipv4"]] == 0).all()
        assert got.loc[3, "redacted_text"] == "clean text with no pii at all"

    def test_email_digits_not_eaten_by_phone(self, spark):
        got = pii_scan(_docs(spark, ["write 123456789jane@example.com ok"])).toPandas()
        assert got.n_email[0] == 1 and got.n_phone[0] == 0
        assert got.redacted_text[0] == "write <EMAIL> ok"


class TestDomainMixture:
    def test_flattens_toward_uniform(self, spark):
        rows = [("big", i) for i in range(400)] + [("small", 1000 + i) for i in range(25)]
        docs = spark.createDataFrame(
            pd.DataFrame({"source": [r[0] for r in rows], "doc_id": [r[1] for r in rows]})
        )
        got = (
            domain_mixture_sample(docs, alpha=0.5, target_frac=0.5)
            .toPandas()
            .set_index("source")
        )
        # alpha=0.5 boosts the small domain's share above its raw fraction
        assert got.loc["small", "target_share"] > 25 / 425
        assert got.loc["big", "target_share"] < 400 / 425
        # keep probabilities honored in expectation (binomial 3-sigma)
        for s in ("big", "small"):
            n, p, k = got.loc[s, "n_docs"], got.loc[s, "p_keep"], got.loc[s, "n_kept"]
            assert abs(k - n * p) <= 3 * math.sqrt(n * p * (1 - p)) + 1

    def test_alpha_one_is_proportional(self, spark):
        docs = spark.createDataFrame(
            pd.DataFrame(
                {"source": ["a"] * 60 + ["b"] * 40, "doc_id": list(range(100))}
            )
        )
        got = domain_mixture_sample(docs, alpha=1.0, target_frac=0.5).toPandas()
        # alpha=1: share == raw fraction, so every domain keeps ~target_frac
        assert (got.p_keep.round(6) == 0.5).all()

    def test_deterministic(self, spark, sf_dir):
        from aeon_sleap_processing_spark.sources import load_table

        docs = load_table(spark, "documents", sf_dir)
        a = domain_mixture_sample(docs).toPandas().sort_values("source", ignore_index=True)
        b = domain_mixture_sample(docs).toPandas().sort_values("source", ignore_index=True)
        pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# property tests: engine output vs pure-Python sequential oracles
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

doc_lens = st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=60)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(lens=doc_lens, cap=st.integers(min_value=1, max_value=50), chunk=st.integers(min_value=1, max_value=20))
def test_pack_sequences_matches_sequential_oracle(spark_global, lens, cap, chunk):
    """Concat-and-cut is a sequential scan; the distributed two-level prefix
    sum must reproduce it exactly for every (corpus, capacity, chunk)."""
    texts = [" ".join(["w"] * n) for n in lens]
    df = spark_global.createDataFrame(
        pd.DataFrame({"doc_id": list(range(len(texts))), "text": texts})
    )
    got = pack_sequences(df, capacity=cap, chunk=chunk).toPandas()

    # oracle: walk docs in order, slice the token stream every cap
    seqs = {}
    off = 0
    for i, n in enumerate(lens):
        if n == 0:
            continue
        s0, s1 = off // cap, (off + n - 1) // cap
        for s in range(s0, s1 + 1):
            e = seqs.setdefault(s, {"n_docs": 0, "n_tokens": 0, "n_starts": 0, "n_straddle": 0})
            e["n_docs"] += 1
            e["n_tokens"] += min(off + n, (s + 1) * cap) - max(off, s * cap)
            e["n_starts"] += s == s0
            e["n_straddle"] += s1 > s
        off += n
    assert list(got.seq_id) == sorted(seqs)
    for _, r in got.iterrows():
        e = seqs[r.seq_id]
        assert (r.n_docs, r.n_tokens, r.n_starts, r.n_straddle) == (
            e["n_docs"], e["n_tokens"], e["n_starts"], e["n_straddle"]
        )


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=25),
        min_size=1,
        max_size=15,
    ),
    k=st.integers(min_value=1, max_value=4),
)
def test_paragraph_dedup_matches_sequential_oracle(spark_global, docs, k):
    """First-occurrence-wins over (doc order, block order) — a sequential
    set-scan the distributed hash-partitioned window must reproduce."""
    texts = [" ".join(f"t{v}" for v in ws) for ws in docs]
    df = spark_global.createDataFrame(
        pd.DataFrame({"doc_id": list(range(len(texts))), "text": texts})
    )
    got = paragraph_dedup(df, block_words=k).toPandas().set_index("doc_id").sort_index()

    seen = set()
    for i, text in enumerate(texts):
        words = text.split()
        blocks = [" ".join(words[j : j + k]) for j in range(0, len(words), k)]
        kept = []
        for b in blocks:
            if b not in seen:
                seen.add(b)
                kept.append(b)
        assert got.loc[i, "n_blocks"] == len(blocks)
        assert got.loc[i, "n_kept"] == len(kept)
        assert got.loc[i, "dedup_text"] == " ".join(kept)


class TestPackBins:
    def _pack(self, spark, lens, cap=16, shards=None):
        from aeon_sleap_processing_spark.operators.curation import pack_bins

        texts = [" ".join(["w"] * n) for n in lens]
        pdf = pd.DataFrame(
            {
                "shard": shards if shards is not None else [0] * len(texts),
                "doc_id": list(range(len(texts))),
                "text": texts,
            }
        )
        return (
            pack_bins(spark.createDataFrame(pdf), capacity=cap)
            .toPandas()
            .sort_values(["shard", "bin_id"], ignore_index=True)
        )

    def test_greedy_fill_matches_sequential_oracle(self, spark):
        lens = [5, 9, 3, 11, 2, 13, 8, 21, 4, 4, 4]
        got = self._pack(spark, lens, cap=16)
        # sequential oracle
        bins, fill, nd = [], 0, 0
        for n in lens:
            if fill and fill + n > 16:
                bins.append((nd, fill))
                fill = nd = 0
            fill += n
            nd += 1
        bins.append((nd, fill))
        assert list(zip(got.n_docs, got.n_tokens)) == bins
        # documents are never split: every bin fits unless single-doc oversize
        assert ((got.n_tokens <= 16) | (got.n_docs == 1)).all()

    def test_oversized_doc_gets_own_bin(self, spark):
        got = self._pack(spark, [30, 2, 3], cap=16)
        assert got.n_tokens.tolist() == [30, 5]
        assert got.n_docs.tolist() == [1, 2]

    def test_shards_pack_independently(self, spark):
        got = self._pack(spark, [10, 10, 10, 10], cap=16, shards=[0, 1, 0, 1])
        # each shard: two 10s -> two bins of one doc each
        assert len(got) == 4 and (got.n_docs == 1).all()

    def test_fill_frac_half_up_tie(self, spark):
        # 4/512 = 0.0078125 rounds HALF-UP to 0.007813 (banker's would
        # give 0.007812 and diverge from the SQL oracle)
        got = self._pack(spark, [4], cap=512)
        assert got.fill_frac[0] == 0.007813


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    lens=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=50),
    cap=st.integers(min_value=1, max_value=30),
    n_shards=st.integers(min_value=1, max_value=4),
)
def test_pack_bins_matches_sequential_oracle(spark_global, lens, cap, n_shards):
    """Greedy fill is order-defined; each shard's distributed kernel must
    reproduce the per-shard sequential walk exactly."""
    from aeon_sleap_processing_spark.operators.curation import pack_bins

    texts = [" ".join(["w"] * n) for n in lens]
    shards = [i % n_shards for i in range(len(texts))]
    df = spark_global.createDataFrame(
        pd.DataFrame({"shard": shards, "doc_id": list(range(len(texts))), "text": texts})
    )
    got = (
        pack_bins(df, capacity=cap)
        .toPandas()
        .sort_values(["shard", "bin_id"], ignore_index=True)
    )

    expected = []
    for s in range(n_shards):
        seq = [n for i, n in enumerate(lens) if i % n_shards == s and n > 0]
        bins, fill, nd = [], 0, 0
        for n in seq:
            if fill and fill + n > cap:
                bins.append((nd, fill))
                fill = nd = 0
            fill += n
            nd += 1
        if fill:
            bins.append((nd, fill))
        expected.extend((s, b, d, t) for b, (d, t) in enumerate(bins))
    assert list(zip(got.shard, got.bin_id, got.n_docs, got.n_tokens)) == expected


class TestShuffleShards:
    def test_assignment_is_deterministic_complete_and_contiguous(self, spark):
        from aeon_sleap_processing_spark.operators.curation import shuffle_shards

        docs = _docs(spark, [f"t{i}" for i in range(40)], ids=list(range(40)))
        a = shuffle_shards(docs, n_shards=4).collect()
        b = shuffle_shards(docs, n_shards=4).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        # every doc exactly once; shards in range
        assert sorted(r.doc_id for r in a) == list(range(40))
        assert all(0 <= r.shard < 4 for r in a)
        # positions are 1..n_s contiguous within each shard
        by_shard = {}
        for r in a:
            by_shard.setdefault(r.shard, []).append(r.pos)
        for poss in by_shard.values():
            assert sorted(poss) == list(range(1, len(poss) + 1))

    def test_salt_reshuffles_order_but_not_membership(self, spark):
        from aeon_sleap_processing_spark.operators.curation import shuffle_shards

        docs = _docs(spark, [f"t{i}" for i in range(60)], ids=list(range(60)))
        e0 = {(r.doc_id, r.shard, r.pos) for r in shuffle_shards(docs, 4, salt="e0").collect()}
        e1 = {(r.doc_id, r.shard, r.pos) for r in shuffle_shards(docs, 4, salt="e1").collect()}
        assert {d for d, _, _ in e0} == {d for d, _, _ in e1}
        assert e0 != e1  # a different epoch salt produces a different order
