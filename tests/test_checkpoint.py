import json
import os

import pytest
from pyspark.sql import functions as F

from mrmr_spark.plans.checkpoint import PhaseRunner, load_manifest, resume_or_run


def test_checkpoint_and_resume(spark, tmp_path, transcripts):
    path = str(tmp_path / "phase1")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return transcripts.withColumn("text_len", F.length("text"))

    df1, m1 = resume_or_run(spark, path, "fe", build, key_cols=["conv_id"])
    assert calls["n"] == 1
    assert m1["complete"] and m1["n_rows"] == transcripts.count()
    assert m1["n_partitions"] >= 1
    assert all("rows" in p and "min_conv_id" in p for p in m1["partitions"])

    # resume: builder must NOT run again
    def explode():
        raise AssertionError("should not recompute a completed phase")

    df2, m2 = resume_or_run(spark, path, "fe", explode)
    assert m2["manifest_id"] == m1["manifest_id"]
    assert df2.count() == m1["n_rows"]


def test_incomplete_manifest_triggers_rebuild(spark, tmp_path, transcripts):
    path = str(tmp_path / "phase2")

    def build():
        return transcripts.limit(100)

    _, m = resume_or_run(spark, path, "p", build)
    # simulate a crash mid-write: mark incomplete
    mp = os.path.join(path, "manifest.json")
    m["complete"] = False
    with open(mp, "w") as f:
        json.dump(m, f)
    assert load_manifest(path) is None
    calls = {"n": 0}

    def rebuild():
        calls["n"] += 1
        return transcripts.limit(100)

    _, m2 = resume_or_run(spark, path, "p", rebuild)
    assert calls["n"] == 1 and m2["complete"]


def test_phase_runner_lineage(spark, tmp_path, transcripts):
    runner = PhaseRunner(spark, str(tmp_path / "pipe"))
    out = runner.run(
        [
            ("sessionize", lambda _: __import__("mrmr_spark.operators.sessionize", fromlist=["sessionize"]).sessionize(transcripts)),
            ("lens", lambda prev: prev.withColumn("text_len", F.length("text"))),
        ],
        key_cols=["conv_id"],
    )
    assert "text_len" in out.columns and "session_id" in out.columns
    assert len(runner.manifests) == 2
    assert runner.manifests[1]["parents"] == [runner.manifests[0]["manifest_id"]]


def test_run_curation_pipeline_resumes(spark, tmp_path):
    """The curation spark-submit entrypoint: one full run, then a resume
    run that must read every phase back from its manifest (identical
    output, identical manifest ids, no recompute)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import run_curation

    ckpt = str(tmp_path / "cur")
    argv = [
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--checkpoint-dir", ckpt,
        "--budget", "512",
        "--min-words", "10",
        "--min-stopword-hits", "0",
    ]
    first = run_curation.main(argv)
    assert first["n_docs"] > 0 and first["n_chunks"] > 0
    assert [p["phase"] for p in first["phases"]] == [
        "ingest", "decontaminate", "quality", "dedup", "split", "pack"
    ]

    second = run_curation.main(argv)
    assert second["n_docs"] == first["n_docs"]
    assert second["n_chunks"] == first["n_chunks"]
    # resume = identical manifest ids (phases read back, not rebuilt)
    assert [p["manifest_id"] for p in second["phases"]] == [
        p["manifest_id"] for p in first["phases"]
    ]


def test_run_curation_optin_phases(spark, tmp_path):
    """--pii and --line-max-df insert their resumable phases; off by
    default they are omitted entirely (no pass-through checkpoints)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import run_curation

    ckpt = str(tmp_path / "cur_opt")
    argv = [
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--checkpoint-dir", ckpt,
        "--budget", "512",
        "--min-words", "10",
        "--min-stopword-hits", "0",
        "--pii",
        "--line-max-df", "400",
        "--strip-html",
        "--blocklist", "zzznope,alsonothing",
        "--ref-corpus", "/root/testdata/sf0.001/documents.parquet",
    ]
    out = run_curation.main(argv)
    assert [p["phase"] for p in out["phases"]] == [
        "ingest", "html", "decontaminate", "pii", "lines", "quality",
        "blocklist", "dedup", "refdedup", "split", "pack",
    ]
    # refdedup against the corpus itself drops EVERY doc: the pipeline
    # must still finish cleanly with an empty pack
    assert out["n_docs"] == 0


def test_run_curation_bpe_tokenize_phase(spark, tmp_path):
    """--bpe-merges inserts the tokenize phase: packing runs on exact BPE
    subword counts, the trained merge list persists beside the manifests,
    and a resume run reuses it (identical merges file, identical manifest
    ids — no retraining)."""
    import json
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import run_curation

    ckpt = str(tmp_path / "cur_bpe")
    argv = [
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--checkpoint-dir", ckpt,
        "--budget", "512",
        "--min-words", "10",
        "--min-stopword-hits", "0",
        "--bpe-merges", "20",
    ]
    first = run_curation.main(argv)
    assert [p["phase"] for p in first["phases"]] == [
        "ingest", "decontaminate", "quality", "dedup", "split",
        "tokenize", "pack",
    ]
    mpath = os.path.join(ckpt, "bpe_merges.json")
    with open(mpath) as f:
        saved = json.load(f)
    assert len(saved["merges"]) == 20

    # packing consumed the BPE counts: n_tokens in the packed output must
    # equal the tokenize phase's n_bpe_tokens, which exceeds the
    # whitespace count (every word is >= 1 subword, most are several)
    packed = spark.read.parquet(os.path.join(ckpt, "pack", "data"))
    tok = spark.read.parquet(os.path.join(ckpt, "tokenize", "data"))
    a = {r.doc_id: r.n_tokens for r in packed.select("doc_id", "n_tokens").collect()}
    b = {r.doc_id: r.n_bpe_tokens for r in tok.select("doc_id", "n_bpe_tokens").collect()}
    assert a == b
    ws = {
        r.doc_id: r.n_ws
        for r in tok.select(
            "doc_id", F.size(F.split("text", " ")).alias("n_ws")
        ).collect()
    }
    assert sum(a.values()) > sum(ws.values())

    before = os.path.getmtime(mpath)
    second = run_curation.main(argv)
    assert os.path.getmtime(mpath) == before  # merges not retrained
    assert [p["manifest_id"] for p in second["phases"]] == [
        p["manifest_id"] for p in first["phases"]
    ]


def test_run_sft_pipeline_resumes(spark, tmp_path, transcripts_pdf):
    """The SFT spark-submit entrypoint: transcripts -> render -> dedup ->
    BPE-mask -> split -> pack, resumable. One full run, then a resume run
    that reads every phase back (identical manifest ids) and reuses the
    persisted merge list; the packed mask accounting is self-consistent."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import run_sft

    src = str(tmp_path / "turns.parquet")
    spark.createDataFrame(transcripts_pdf).select(
        "conv_id", "turn_idx", "role", "text"
    ).write.parquet(src)
    ckpt = str(tmp_path / "sft")
    argv = ["--input", src, "--checkpoint-dir", ckpt,
            "--budget", "256", "--merges", "15"]
    first = run_sft.main(argv)
    assert [p["phase"] for p in first["phases"]] == [
        "ingest", "render", "dedup", "mask", "split", "pack"
    ]
    assert first["n_convs"] > 0 and first["n_chunks"] > 0
    assert 0.0 < first["loss_token_frac"] < 1.0

    with open(os.path.join(ckpt, "bpe_merges.json")) as f:
        assert len(json.load(f)["merges"]) == 15

    second = run_sft.main(argv)
    assert second == first  # phases read back, merges reused, no recompute

    # the mask vectors in the pack output account for every token
    packed = spark.read.parquet(os.path.join(ckpt, "pack", "data"))
    bad = packed.where(
        (F.size("mask") != F.col("n_tok"))
        | (F.aggregate("mask", F.lit(0).cast("long"),
                       lambda a, x: a + x.cast("long")) != F.col("n_loss"))
    ).count()
    assert bad == 0


def test_resume_keys_on_config_fingerprint(spark, tmp_path, transcripts):
    from mrmr_spark.plans.checkpoint import config_fingerprint

    path = str(tmp_path / "cfg_phase")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return transcripts.withColumn("text_len", F.length("text"))

    cfg_a = config_fingerprint({"metrics": "qa", "shots": 2})
    _, m1 = resume_or_run(spark, path, "fe", build, config_id=cfg_a)
    assert calls["n"] == 1 and m1["config_id"] == cfg_a

    # same config: resumes (builder not called)
    _, m2 = resume_or_run(spark, path, "fe", build, config_id=cfg_a)
    assert calls["n"] == 1 and m2["manifest_id"] == m1["manifest_id"]

    # changed config: REBUILDS — no silent replay of the old run
    cfg_b = config_fingerprint({"metrics": "qa,wer", "shots": 2})
    assert cfg_b != cfg_a
    _, m3 = resume_or_run(spark, path, "fe", build, config_id=cfg_b)
    assert calls["n"] == 2 and m3["config_id"] == cfg_b

    # a fingerprinting caller refuses a legacy (config-free) manifest
    legacy = str(tmp_path / "legacy_phase")
    resume_or_run(spark, legacy, "fe", build)          # writes config_id None
    calls_before = calls["n"]
    resume_or_run(spark, legacy, "fe", build, config_id=cfg_a)
    assert calls["n"] == calls_before + 1
    # while a config-free caller resumes anything complete
    resume_or_run(spark, legacy, "fe", build)
    assert calls["n"] == calls_before + 1


def test_crash_mid_rebuild_invalidates_stale_manifest(spark, tmp_path, transcripts):
    """A driver killed between the data overwrite and the manifest write
    must NOT leave the previous run's complete manifest paired with the
    new run's data (r05 advice): checkpoint_phase deletes the old
    manifest before touching the data, so a crash anywhere in the rebuild
    forces a rebuild on the next run instead of a stale resume."""
    from mrmr_spark.plans import checkpoint as cp
    from mrmr_spark.plans.checkpoint import config_fingerprint

    path = str(tmp_path / "crash_phase")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return transcripts.withColumn("text_len", F.length("text"))

    cfg_a = config_fingerprint({"v": 1})
    _, m1 = resume_or_run(spark, path, "fe", build, config_id=cfg_a)
    assert m1["complete"] and calls["n"] == 1

    # rebuild under config B, crashing right after the data overwrite
    # (before the manifest write) — simulated by failing the metrics pass
    cfg_b = config_fingerprint({"v": 2})
    orig = cp._manifest_id

    def boom(payload):
        raise RuntimeError("simulated crash before manifest write")

    cp._manifest_id = boom
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            resume_or_run(spark, path, "fe", build, config_id=cfg_b)
    finally:
        cp._manifest_id = orig
    assert calls["n"] == 2

    # the OLD complete manifest must be gone: neither the old config nor a
    # legacy (config-free) caller may resume the half-rebuilt state
    assert load_manifest(path) is None
    _, m3 = resume_or_run(spark, path, "fe", build, config_id=cfg_a)
    assert calls["n"] == 3 and m3["complete"]


def test_run_eval_config_change_rebuilds(spark, tmp_path):
    import tools.run_eval as run_eval

    path = str(tmp_path / "cfg_eval.parquet")
    rows = [
        (i, f"task{i % 2}", f"question {i}", f"the long answer is {i % 5}")
        for i in range(40)
    ]
    spark.createDataFrame(
        rows, "doc_id long, source string, text string, lang string"
    ).write.mode("overwrite").parquet(path)
    ck = str(tmp_path / "cfg_ck")

    out1 = run_eval.main(["--input", path, "--shots", "1",
                          "--checkpoint-dir", ck])
    assert "wer" not in out1["tasks"][0]

    # same dir, changed --metrics: the score/report phases must rebuild
    # and carry the new columns, not replay the qa-only outputs
    out2 = run_eval.main(["--input", path, "--shots", "1",
                          "--metrics", "qa,wer",
                          "--checkpoint-dir", ck])
    assert all("wer" in t and t["wer"] is not None for t in out2["tasks"])
