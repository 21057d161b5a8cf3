"""Regression tests for the four ADVICE r04 findings.

1. checkpoint.py: Hadoop FS rename/mkdirs report failure by returning
   false — _flush must check the booleans, not assume exceptions.
2. dedup.py: Dataset.unpersist is a no-op for localCheckpoint blocks;
   release must go through the LogicalRDD's persisted RDD.
3. packing.py: decimal(38,6) HALF_UP rounding before floor() flips
   chunk_id near boundaries at max_tokens >= ~2e6; `div` is exact.
4. stats.py: merge_profiles / runner must tolerate profile parts written
   by the pre-min_int/max_int code version (resume across upgrade).
"""

from types import SimpleNamespace

import pytest

from json_skema_spark.operators import stats
from json_skema_spark.operators.checkpoint import PartitionManifest
from json_skema_spark.operators.dedup import _release_local_checkpoint
from json_skema_spark.operators.packing import chunk_assignments


# ---------------------------------------------------------------- advice 1
class _FakeOut:
    def write(self, b):
        pass

    def close(self):
        pass


class _FakeFS:
    def __init__(self, *, rename_ok=True, mkdirs_ok=True):
        self.rename_ok, self.mkdirs_ok = rename_ok, mkdirs_ok

    def mkdirs(self, p):
        return self.mkdirs_ok

    def create(self, p, overwrite):
        return _FakeOut()

    def delete(self, p, recursive):
        return True

    def rename(self, src, dst):
        return self.rename_ok


_FAKE_JVM = SimpleNamespace(org=SimpleNamespace(apache=SimpleNamespace(
    hadoop=SimpleNamespace(fs=SimpleNamespace(Path=lambda s: s)))))


def _remote_manifest(tmp_path, fs):
    m = PartitionManifest(str(tmp_path / "m"))
    m._remote = True
    m._hfs = lambda: (fs, _FAKE_JVM)
    return m


def test_manifest_remote_rename_failure_raises(tmp_path):
    m = _remote_manifest(tmp_path, _FakeFS(rename_ok=False))
    with pytest.raises(IOError, match="rename failed"):
        m.mark_done(0, {"rows": 1})


def test_manifest_remote_mkdirs_failure_raises(tmp_path):
    m = _remote_manifest(tmp_path, _FakeFS(mkdirs_ok=False))
    with pytest.raises(IOError, match="mkdirs failed"):
        m.mark_done(0, {"rows": 1})


def test_manifest_remote_success_path_still_flushes(tmp_path):
    m = _remote_manifest(tmp_path, _FakeFS())
    m.mark_done(3, {"rows": 7})  # no raise
    assert m.is_done(3)


# ---------------------------------------------------------------- advice 2
def test_release_local_checkpoint_frees_block_manager_storage(spark):
    sc = spark.sparkContext._jsc.sc()

    def stored_ids():
        return {info.id() for info in sc.getRDDStorageInfo()}

    before = stored_ids()
    df = spark.range(1000).localCheckpoint(eager=True)
    df.count()
    created = stored_ids() - before
    assert created, "localCheckpoint should register block-manager storage"
    _release_local_checkpoint(df, blocking=True)
    assert not (stored_ids() & created), \
        "release must drop the checkpoint's blocks (Dataset.unpersist " \
        "does not — ADVICE r04)"


def test_release_local_checkpoint_noop_on_plain_plan(spark):
    # non-LogicalRDD plan: helper must be a silent no-op, never raise
    _release_local_checkpoint(spark.range(10), blocking=True)


# ---------------------------------------------------------------- advice 3
def test_chunk_id_exact_at_large_max_tokens_boundary(spark):
    # start of doc "b" = 3_999_999 — one token below the chunk boundary.
    # The old decimal(38,6) route rounded 3999999/4000000 = 0.99999975 to
    # 1.000000 before floor(), mislabeling "b" into chunk 1.
    df = spark.createDataFrame(
        [("a", 3_999_999), ("b", 5)], "doc_id string, n_tokens long")
    out = {r["doc_id"]: r for r in chunk_assignments(
        df, "doc_id", "n_tokens", max_tokens=4_000_000).collect()}
    assert out["a"]["chunk_id"] == 0 and out["a"]["chunk_offset"] == 0
    assert out["b"]["chunk_id"] == 0
    assert out["b"]["chunk_offset"] == 3_999_999


def test_chunk_id_unchanged_at_default_max_tokens(spark):
    df = spark.createDataFrame(
        [("a", 1000), ("b", 1500), ("c", 100)],
        "doc_id string, n_tokens long")
    out = {r["doc_id"]: (r["chunk_id"], r["chunk_offset"])
           for r in chunk_assignments(df, "doc_id", "n_tokens",
                                      max_tokens=2048).collect()}
    assert out == {"a": (0, 0), "b": (0, 1000), "c": (1, 452)}


# ---------------------------------------------------------------- advice 4
def _old_style_part(df):
    """A profile part as the PRE-min_int code wrote it: integral min/max
    folded as doubles in min_num/max_num, no min_int/max_int columns."""
    from pyspark.sql import functions as F
    p = stats.mergeable_profile(df)
    return (p.withColumn("min_num", F.coalesce("min_num",
                                               F.col("min_int").cast("double")))
            .withColumn("max_num", F.coalesce("max_num",
                                              F.col("max_int").cast("double")))
            .drop("min_int", "max_int"))


def test_merge_profiles_tolerates_pre_min_int_parts(spark, tmp_path):
    # bucket=0 written by the OLD code version (integrals in min_num, no
    # min_int/max_int), bucket=1 by the new one — the exact
    # resume-across-upgrade layout. The old part holds the true table
    # min (1) and the new part the true max (10): the merge must COMBINE
    # the two representations, not prefer one (review r05).
    d1 = spark.createDataFrame([(1,), (2,)], "v long")
    d2 = spark.createDataFrame([(10,), (None,)], "v long")
    root = str(tmp_path / "profile")
    _old_style_part(d1).write.parquet(root + "/bucket=0")
    stats.mergeable_profile(d2).write.parquet(root + "/bucket=1")

    parts = spark.read.option("mergeSchema", "true").parquet(root)
    row = stats.merge_profiles(parts.drop("bucket")).collect()[0]
    assert row["column_name"] == "v"
    assert row["n_rows"] == 4
    assert row["null_fraction"] == pytest.approx(0.25)
    # min from the OLD part (double rendering — old parts lost decimal
    # exactness at write time), max from the NEW part (decimal rendering)
    assert row["min_value"] == "1.0" and row["max_value"] == "10"


def test_merge_profiles_missing_columns_direct(spark):
    d = spark.createDataFrame([("x",), ("y",)], "s string")
    parts = stats.mergeable_profile(d).drop("min_int", "max_int")
    row = stats.merge_profiles(parts).collect()[0]
    assert row["min_value"] == "x" and row["max_value"] == "y"
