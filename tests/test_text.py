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
