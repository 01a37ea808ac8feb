import numpy as np

from mrmr_spark.sources.transcripts import generate_transcripts_pandas, turn_text


def test_schema_and_determinism(transcripts_pdf):
    pdf = transcripts_pdf
    assert list(pdf.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    pdf2 = generate_transcripts_pandas(n_convs=60, mean_turns=25, seed=42)
    assert pdf.equals(pdf2)


def test_turn_idx_dense_and_ts_increasing(transcripts_pdf):
    for _, g in transcripts_pdf.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        assert (g["turn_idx"].to_numpy() == np.arange(len(g))).all()
        ts = g["ts"].to_numpy()
        assert (np.diff(ts) >= np.timedelta64(0, "us")).all()


def test_text_is_pure_function_of_identity(transcripts_pdf):
    """Per-turn text equality invariant: text is recomputable from ids alone."""
    pdf = transcripts_pdf
    conv_num = pdf["conv_id"].str.removeprefix("conv-").astype(np.int64).to_numpy()
    expected = turn_text(conv_num, pdf["turn_idx"].to_numpy().astype(np.int64))
    assert (pdf["text"].to_numpy() == expected).all()


def test_zipf_skew(transcripts_pdf):
    sizes = transcripts_pdf.groupby("conv_id").size().sort_values()
    assert sizes.iloc[-1] >= 4 * sizes.median()


def test_read_transcripts_jsonl_and_csv_round_trip(spark, transcripts_pdf, tmp_path):
    """jsonl:// and csv:// dispatch read the input_hint schema explicitly
    (no inference pass) and reproduce the parquet rows exactly."""
    from mrmr_spark.sources.transcripts import read_transcripts

    pdf = transcripts_pdf.copy()
    pq_path = str(tmp_path / "t.parquet")
    pdf.to_parquet(pq_path)
    want = read_transcripts(spark, pq_path)

    jl = pdf.copy()
    jl["ts"] = jl["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
    jl_path = str(tmp_path / "t.jsonl")
    jl.to_json(jl_path, orient="records", lines=True)
    got_j = read_transcripts(spark, f"jsonl://{jl_path}")
    assert got_j.schema == want.schema
    key = ["conv_id", "turn_idx"]
    a = want.orderBy(*key).toPandas()
    b = got_j.orderBy(*key).toPandas()
    assert a.equals(b)

    csv_path = str(tmp_path / "t.csv")
    jl.to_csv(csv_path, index=False)
    got_c = read_transcripts(spark, f"csv://{csv_path}")
    assert got_c.schema == want.schema
    c = got_c.orderBy(*key).toPandas()
    # CSV writes empty strings for missing tool -> nulls either way
    assert a.equals(c)


def test_read_transcripts_jsonl_drops_malformed_lines(spark, tmp_path):
    """DROPMALFORMED: a corrupt line is dropped inside the parser rather
    than failing the 100 TB job OR surviving as an all-null row (which
    would sessionize into a phantom NULL conversation and poison the
    feature matrix). Must also survive column-pruned consumers — the
    PERMISSIVE + where(_corrupt_record) pattern threw
    UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN on a bare
    count() because pruning left only the corrupt column in the scan."""
    from mrmr_spark.sources.transcripts import read_transcripts

    path = tmp_path / "bad.jsonl"
    path.write_text(
        '{"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "hi",'
        ' "tool": null, "ts": "2024-01-01T00:00:00.000000"}\n'
        "this is not json\n"
        '{"conv_id": "c1", "turn_idx": 1, "role": "assistant", "text": "yo",'
        ' "tool": null, "ts": "2024-01-01T00:00:05.000000"}\n'
    )
    df = read_transcripts(spark, f"jsonl://{path}")
    rows = df.orderBy("turn_idx").collect()
    assert len(rows) == 2  # the non-JSON line is gone, both good rows stay
    assert [r.turn_idx for r in rows] == [0, 1]
    assert all(r.conv_id == "c1" for r in rows)
    assert "_corrupt_record" not in df.columns
    # column-pruned consumers: bare count and single-column select (these
    # crashed under the corrupt-record-filter implementation)
    assert df.count() == 2
    assert df.select("conv_id").distinct().count() == 1
