"""run_eval.py pipeline: full run, resume with identical manifests,
predictions-file mode, and the echo-input floor baseline."""

import json
import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def eval_parquet(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("evalset")
    path = str(base / "eval.parquet")
    rows = [
        (i, f"task{i % 3}", f"question {i} about thing {i % 7}", f"answer {i % 5}")
        for i in range(60)
    ]
    spark.createDataFrame(
        rows, "doc_id long, source string, text string, lang string"
    ).write.mode("overwrite").parquet(path)
    return path


def test_run_eval_full_then_resume(spark, eval_parquet, tmp_path):
    import tools.run_eval as run_eval

    ck = str(tmp_path / "ck")
    args = ["--input", eval_parquet, "--shots", "2", "--checkpoint-dir", ck]
    out1 = run_eval.main(args)
    assert out1["micro_em"] == 0.0  # empty baseline never matches
    assert [p["phase"] for p in out1["phases"]] == [
        "ingest", "prompts", "predict", "score", "report",
    ]
    assert sum(t["n"] for t in out1["tasks"]) > 0
    # every eval row got its shots from the carved-out pool
    assert all(t["avg_shots"] == 2.0 for t in out1["tasks"])

    out2 = run_eval.main(args)
    assert [p["manifest_id"] for p in out2["phases"]] == [
        p["manifest_id"] for p in out1["phases"]
    ]
    assert out2["tasks"] == out1["tasks"]


def test_run_eval_predictions_file_scores(spark, eval_parquet, tmp_path):
    import tools.run_eval as run_eval

    # perfect predictions for task0 rows, garbage for the rest
    ev = spark.read.parquet(eval_parquet)
    preds = ev.select(
        "doc_id",
        F.when(F.col("source") == "task0", F.col("lang"))
        .otherwise(F.lit("wrong words entirely"))
        .alias("prediction"),
    )
    ppath = str(tmp_path / "preds.parquet")
    preds.write.mode("overwrite").parquet(ppath)
    out = run_eval.main(
        ["--input", eval_parquet, "--shots", "1", "--predictions", ppath,
         "--checkpoint-dir", str(tmp_path / "ck2")]
    )
    by_task = {t["source"]: t for t in out["tasks"]}
    assert by_task["task0"]["em"] == 1.0 and by_task["task0"]["f1"] == 1.0
    assert by_task["task1"]["em"] == 0.0
    assert 0.0 < out["micro_f1"] < 1.0


def test_run_eval_echo_baseline(spark, eval_parquet, tmp_path):
    import tools.run_eval as run_eval

    out = run_eval.main(
        ["--input", eval_parquet, "--baseline", "echo-input",
         "--checkpoint-dir", str(tmp_path / "ck3")]
    )
    # inputs share the word "thing N" with targets never -> EM 0, tiny F1
    assert out["micro_em"] == 0.0
    assert out["micro_f1"] < 0.5


def test_run_eval_extra_metrics(spark, eval_parquet, tmp_path):
    import tools.run_eval as run_eval

    # perfect predictions of a >=4-token target: every enabled metric
    # must hit 1.0 (sentence BLEU-4 needs a 4-gram, so the 2-token
    # "answer N" target would floor bleu at 0 by the unsmoothed
    # convention — that behavior is covered in test_evalmetrics)
    ev = spark.read.parquet(eval_parquet).withColumn(
        "lang", F.concat(F.lit("the long answer is "), F.col("lang"))
    )
    epath = str(tmp_path / "eval_long.parquet")
    ev.write.mode("overwrite").parquet(epath)
    ppath = str(tmp_path / "perfect.parquet")
    ev.select("doc_id", F.col("lang").alias("prediction")).write.mode(
        "overwrite"
    ).parquet(ppath)
    out = run_eval.main(
        ["--input", epath, "--shots", "1", "--predictions", ppath,
         "--metrics", "qa,bleu,rouge,chrf,wer",
         "--checkpoint-dir", str(tmp_path / "ck_metrics")]
    )
    for t in out["tasks"]:
        assert t["em"] == 1.0 and t["f1"] == 1.0
        assert t["bleu"] == 1.0 and t["rouge_l_f"] == 1.0
        assert t["chrf"] == 1.0 and t["wer"] == 0.0

    # validation: unknown metric / missing qa
    with pytest.raises(ValueError, match="metrics"):
        run_eval.main(
            ["--input", eval_parquet, "--metrics", "qa,meteor",
             "--checkpoint-dir", str(tmp_path / "ck_bad")]
        )
    with pytest.raises(ValueError, match="metrics"):
        run_eval.main(
            ["--input", eval_parquet, "--metrics", "bleu",
             "--checkpoint-dir", str(tmp_path / "ck_bad2")]
        )
