"""Training-shard sink: exact-size assignment, hash assignment, and the
partitioned write round-trip."""

import pytest

import pyspark.sql.functions as F

from mrmr_spark.sources.shards import hash_shards, sized_shards, write_training_shards


@pytest.fixture(scope="module")
def corpus(spark):
    # deliberately unsorted ids and a non-unique order key (score) so the
    # id tiebreak matters
    rows = [(i * 37 % 101, float((i * 13) % 7), f"doc {i}") for i in range(101)]
    return spark.createDataFrame(rows, "doc_id long, score double, text string")


def test_sized_shards_exact_sizes_and_order(spark, corpus):
    pin = []
    out = sized_shards(corpus, 10, order_by=["score"], rank_col="rank", pin=pin)
    rows = out.collect()
    assert len(rows) == 101
    # rank is the exact global rank under (score, doc_id)
    want = sorted((r.score, r.doc_id) for r in rows)
    got = {r.doc_id: (r.rank, r.shard) for r in rows}
    for rank, (score, doc_id) in enumerate(want):
        assert got[doc_id] == (rank, rank // 10), (doc_id, rank)
    # shard sizes: 10 full shards of 10 + one of 1
    sizes = sorted(
        r["cnt"] for r in out.groupBy("shard").agg(F.count("*").alias("cnt")).collect()
    )
    assert sizes == [1] + [10] * 10
    for p in pin:
        p.unpersist()


def test_sized_shards_deterministic_across_partitionings(spark, corpus):
    def run(df):
        pin = []
        r = {x.doc_id: x.shard
             for x in sized_shards(df, 7, order_by=["score"], pin=pin).collect()}
        for p in pin:
            p.unpersist()
        return r

    assert run(corpus) == run(corpus.repartition(13)) == run(corpus.coalesce(1))
    with pytest.raises(ValueError, match="rows_per_shard"):
        sized_shards(corpus, 0)


def test_hash_shards_determinism_and_coverage(spark, corpus):
    out = hash_shards(corpus, 8).collect()
    again = {r.doc_id: r.shard for r in hash_shards(corpus.repartition(5), 8).collect()}
    assert {r.doc_id: r.shard for r in out} == again
    assert {r.shard for r in out} <= set(range(8))
    # pure projection: no exchange
    plan = hash_shards(corpus, 8)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
    with pytest.raises(ValueError, match="n_shards"):
        hash_shards(corpus, 0)


def test_write_training_shards_roundtrip(spark, corpus, tmp_path):
    path = str(tmp_path / "shards")
    man = write_training_shards(corpus, path, rows_per_shard=25, order_by=["score"])
    assert man == {
        "path": path, "format": "parquet", "n_rows": 101, "n_shards": 5,
        "mode": "sized",
    }
    back = spark.read.parquet(path)
    sizes = {r.shard: r["cnt"]
             for r in back.groupBy("shard").agg(F.count("*").alias("cnt")).collect()}
    assert sizes == {0: 25, 1: 25, 2: 25, 3: 25, 4: 1}
    # shard 0 holds exactly the 25 lowest (score, doc_id) rows
    want_first = {d for _, d in sorted(
        (r.score, r.doc_id) for r in corpus.collect())[:25]}
    got_first = {r.doc_id for r in back.where("shard = 0").collect()}
    assert got_first == want_first

    man2 = write_training_shards(corpus, str(tmp_path / "h"), n_shards=4)
    assert man2["mode"] == "hash" and man2["n_rows"] == 101 and man2["n_shards"] == 4

    # custom id_col must reach BOTH assignment modes
    renamed = corpus.withColumnRenamed("doc_id", "uid")
    man3 = write_training_shards(
        renamed, str(tmp_path / "h2"), n_shards=4, id_col="uid"
    )
    assert man3["n_rows"] == 101
    man4 = write_training_shards(
        renamed, str(tmp_path / "s2"), rows_per_shard=50, order_by=["score"],
        id_col="uid",
    )
    assert man4["n_rows"] == 101 and man4["n_shards"] == 3

    with pytest.raises(ValueError, match="exactly one"):
        write_training_shards(corpus, path)
    with pytest.raises(ValueError, match="exactly one"):
        write_training_shards(corpus, path, rows_per_shard=5, n_shards=2)
    with pytest.raises(ValueError, match="format"):
        write_training_shards(corpus, path, n_shards=2, format="csvx")
