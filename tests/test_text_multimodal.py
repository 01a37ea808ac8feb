import numpy as np
import pandas as pd

from mrmr_spark.operators.multimodal import (
    _fake_features,
    extract_media_features,
    frame_sample_plan,
    synth_media_df,
)
from mrmr_spark.operators.textstats import with_text_stats


def test_text_stats(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "the cat and the dog sat on the mat in a box",
                "el perro y el gato en la casa de los abuelos",
                "xyz qrs tuv",
            ],
        }
    )
    got = with_text_stats(spark.createDataFrame(pdf)).toPandas().sort_values("doc_id")
    assert got["n_tokens"].tolist() == [12, 11, 3]
    assert got["lang_pred"].tolist() == ["en", "es", "other"]
    assert (got["quality"] >= 0).all() and (got["quality"] <= 1).all()
    # fingerprint: normalization collapses case/whitespace
    pdf2 = pd.DataFrame({"doc_id": [0], "text": ["  THE cat   and the dog sat on the mat in a box "]})
    fp2 = with_text_stats(spark.createDataFrame(pdf2)).collect()[0]["fingerprint"]
    assert fp2 == got[got.doc_id == 0].iloc[0]["fingerprint"]


def test_media_feature_extraction(spark):
    media = synth_media_df(spark, n=30, seed=9)
    feats = extract_media_features(media).toPandas().sort_values("media_id")
    assert len(feats) == 30
    assert feats["feature"].map(len).eq(16).all()
    # deterministic: pure function of the bytes
    raw = media.select("media_id", "content").toPandas().sort_values("media_id")
    for mid, content in zip(raw["media_id"], raw["content"]):
        exp = _fake_features(bytes(content))
        got = np.array(feats[feats["media_id"] == mid].iloc[0]["feature"])
        assert np.allclose(got, exp)
    assert (feats["n_bytes"] == raw["content"].map(len).to_numpy()).all()


def test_media_real_codec_is_stubbed(spark):
    import pytest

    media = synth_media_df(spark, n=3)
    with pytest.raises(Exception) as exc_info:
        extract_media_features(media, codec="real").collect()
    assert "NotImplementedError" in str(exc_info.value) or "decode" in str(exc_info.value)


def test_frame_sample_plan(spark):
    media = synth_media_df(spark, n=12, seed=9)
    plan = frame_sample_plan(media, every_ms=5000).toPandas()
    meta = media.where("kind = 'video'").select("media_id", "meta.duration_ms").toPandas()
    for mid, dur in zip(meta["media_id"], meta["duration_ms"]):
        frames = plan[plan["media_id"] == mid]["frame_ms"].to_numpy()
        assert frames[0] == 0 and frames[-1] <= dur
        assert (np.diff(frames) == 5000).all()
