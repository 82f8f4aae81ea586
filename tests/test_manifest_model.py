"""Property-based model test of the manifest store (r11): random
sequences of appends / overwrites / compactions / deletes / TTL-free
merges run against a real store AND a trivial in-memory model — after
every op the resolved read must equal the model, and at the end the
pure-Python CDC mirror must agree with the JVM changes reader for every
cursor. This searches the op-interleaving space the hand-written suites
sample point-wise (the delta-log replay, rewrite validation, and
data-change semantics all sit under it)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aeon_sleap_processing_spark.sources.sinks import (
    compact_manifested,
    delete_manifested,
    merge_manifested,
    read_manifested,
    read_manifested_changes,
    write_manifested,
)

# ops: ("append", lo, n) | ("overwrite", lo, n) | ("compact",) |
#      ("delete", cut) | ("merge", id)
_op = st.one_of(
    st.tuples(st.just("append"), st.integers(0, 200), st.integers(1, 30)),
    st.tuples(st.just("overwrite"), st.integers(0, 200), st.integers(1, 30)),
    st.tuples(st.just("compact")),
    st.tuples(st.just("delete"), st.integers(0, 220)),
    st.tuples(st.just("merge"), st.integers(0, 240)),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=3, max_size=7))
def test_random_op_sequences_match_model(spark_global, tmp_path_factory, ops):
    spark = spark_global
    path = str(tmp_path_factory.mktemp("model") / "store")
    write_manifested(spark, spark.range(0, 10).coalesce(1), path)
    model = set(range(10))

    def ids():
        return sorted(
            r.id for r in read_manifested(spark, path).select("id").collect()
        )

    for op in ops:
        kind = op[0]
        if kind == "append":
            _, lo, n = op
            new = [i for i in range(lo, lo + n) if i not in model]
            if not new:
                continue
            write_manifested(
                spark,
                spark.createDataFrame([(i,) for i in new], "id long")
                .coalesce(1),
                path,
            )
            model |= set(new)
        elif kind == "overwrite":
            _, lo, n = op
            write_manifested(
                spark, spark.range(lo, lo + n).coalesce(1), path,
                replace="all",
            )
            model = set(range(lo, lo + n))
        elif kind == "compact":
            compact_manifested(spark, path, min_files_to_compact=2)
        elif kind == "delete":
            _, cut = op
            delete_manifested(spark, path, f"id < {cut}")
            model = {i for i in model if i >= cut}
        elif kind == "merge":
            _, key = op
            merge_manifested(
                spark,
                spark.createDataFrame([(key,)], "id long"),
                path, key="id",
            )
            model.add(key)
        assert ids() == sorted(model), (op, ops)

    # the CDC mirror must agree with the JVM changes reader for EVERY
    # cursor over the whole history (both may raise on an expired
    # cursor; they must then both raise — no vacuum ran, so neither
    # should)
    from aeon_sleap_processing_spark.streaming.cdc_source import (
        _ManifestLogMirror,
    )

    mirror = _ManifestLogMirror(path)
    head = mirror.head_version()
    for since in range(-1, head + 1):
        df, _ = read_manifested_changes(spark, path, since_version=since)
        jvm_files = (
            sorted(f.split(path + "/")[-1] for f in df.inputFiles())
            if df is not None else []
        )
        assert sorted(mirror.changed_files(since, head)) == jvm_files, since
