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
