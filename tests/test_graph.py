"""Connected components + end-to-end near-dup clustering."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from aeon_sleap_processing_spark.operators.graph import connected_components, dedup_clusters


def _edges(spark, pairs):
    return spark.createDataFrame(pd.DataFrame(pairs, columns=["src", "dst"]))


THRESHOLDS = [100_000, 0]  # driver union-find fast path AND distributed stars


class TestConnectedComponents:
    def _components(self, spark, pairs, driver_threshold=100_000):
        out = connected_components(
            _edges(spark, pairs), driver_threshold=driver_threshold
        ).toPandas()
        return {int(r.node): int(r.component) for r in out.itertuples()}

    @pytest.mark.parametrize("thr", THRESHOLDS)
    def test_both_paths_agree(self, spark, thr):
        pairs = [(1, 2), (2, 3), (9, 8), (4, 4), (3, 1)]
        comp = self._components(spark, pairs, driver_threshold=thr)
        assert comp == {1: 1, 2: 1, 3: 1, 8: 8, 9: 8}

    def test_chain(self, spark):
        comp = self._components(spark, [(1, 2), (2, 3), (3, 4)])
        assert comp == {1: 1, 2: 1, 3: 1, 4: 1}

    def test_two_components_and_cycle(self, spark):
        comp = self._components(
            spark, [(5, 6), (6, 7), (7, 5), (20, 21), (21, 22)]
        )
        assert {comp[5], comp[6], comp[7]} == {5}
        assert {comp[20], comp[21], comp[22]} == {20}

    def test_long_path_converges(self, spark):
        n = 64
        comp = self._components(spark, [(i, i + 1) for i in range(n)])
        assert set(comp.values()) == {0}
        assert len(comp) == n + 1

    def test_reversed_and_duplicate_edges(self, spark):
        comp = self._components(spark, [(2, 1), (1, 2), (3, 2), (2, 3)])
        assert comp == {1: 1, 2: 1, 3: 1}


class TestConnectedComponentsProperty:
    @pytest.mark.parametrize("thr", THRESHOLDS)
    def test_random_graphs_match_union_find(self, spark, thr):
        """Both CC paths (driver union-find and alternating stars) must agree
        with a pure-python union-find oracle on random graphs of varying
        density (incl. self-loops and dups)."""
        import numpy as np

        for seed, n_nodes, n_edges in [(0, 30, 15), (1, 40, 60), (2, 25, 5), (3, 50, 120)]:
            rng = np.random.default_rng(seed)
            pairs = [
                (int(a), int(b))
                for a, b in zip(
                    rng.integers(0, n_nodes, n_edges), rng.integers(0, n_nodes, n_edges)
                )
            ]
            parent = list(range(n_nodes))

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for a, b in pairs:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            # expected: every touched node -> min node id of its component
            touched = sorted({x for p in pairs for x in p if p[0] != p[1]})
            roots: dict[int, int] = {}
            expected = {}
            for x in touched:
                r = find(x)
                roots.setdefault(r, min(y for y in touched if find(y) == r))
                expected[x] = roots[r]
            got = {
                int(r.node): int(r.component)
                for r in connected_components(
                    _edges(spark, pairs), driver_threshold=thr
                )
                .toPandas()
                .itertuples()
            }
            assert got == expected, f"seed={seed}"


class TestDedupClusters:
    def test_planted_duplicates_cluster_together(self, spark):
        base = "the quick brown fox jumps over the lazy dog again and again today"
        other = "completely different words about spark engines and parquet columns here"
        docs = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [1, 2, 3, 4],
                    "text": [base, base, other, base + " extra"],
                }
            )
        )
        out = dedup_clusters(docs).toPandas().set_index("doc_id")
        # exact duplicates 1,2 share all shingles → same cluster, rep = 1
        assert out.loc[1].cluster == out.loc[2].cluster == 1
        assert bool(out.loc[1].is_representative)
        assert not bool(out.loc[2].is_representative)
        # doc 3 is its own singleton cluster
        assert out.loc[3].cluster == 3 and bool(out.loc[3].is_representative)
        # doc 4 shares most shingles with 1/2 → lands in their cluster
        assert out.loc[4].cluster == 1


class TestClusterAwareSplit:
    def test_near_dups_never_straddle_the_split(self, spark):
        """The leakage guard: every member of a near-dup cluster gets the
        SAME split label (a per-doc hash split would scatter them), the
        assignment is deterministic across invocations, and every doc is
        assigned exactly once."""
        from aeon_sleap_processing_spark.operators.graph import (
            cluster_aware_split,
        )
        from aeon_sleap_processing_spark.sources import load_table

        docs = load_table(spark, "documents", "/root/testdata/sf0.001")
        # plant extra near-dups so multi-member clusters certainly exist
        planted = docs.limit(10).selectExpr("doc_id + 100000 AS doc_id", "text")
        corpus = docs.select("doc_id", "text").unionByName(planted)
        out = cluster_aware_split(corpus).toPandas()
        assert len(out) == corpus.count()
        per_cluster = out.groupby("cluster")["split"].nunique()
        assert (per_cluster == 1).all()  # no cluster straddles splits
        multi = out.groupby("cluster").size()
        assert (multi > 1).any()  # the planted dups actually clustered
        # deterministic: a second run assigns identically
        again = cluster_aware_split(corpus).toPandas()
        a = out.sort_values("doc_id").reset_index(drop=True)
        b = again.sort_values("doc_id").reset_index(drop=True)
        assert a.equals(b)
