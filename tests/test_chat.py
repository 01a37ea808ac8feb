"""Chat-template rendering + loss-mask spans: Python string oracle, the
substring-extraction invariant row-by-row, custom templates, NULL turns,
stable ordering, and composition with the curation layer (rendered
conversations are documents: exact dedup + BPE token counting run
downstream unchanged)."""

import pytest
from pyspark.sql import functions as F

from mrmr_spark.operators.chat import (
    DEFAULT_FOOTER,
    DEFAULT_HEADER,
    render_conversations,
    turn_spans,
)

ROWS = [
    ("c1", 0, "user", "hi there"),
    ("c1", 1, "assistant", "hello!"),
    ("c1", 2, "user", None),
    ("c1", 3, "assistant", "bye"),
    ("c2", 0, "system", "be nice"),
    ("c2", 1, "assistant", "ok"),
    ("c3", 0, None, "orphan"),
]


@pytest.fixture(scope="module")
def convs(spark):
    return spark.createDataFrame(ROWS, "conv_id string, turn_idx int, role string, text string")


def py_render(rows, header=DEFAULT_HEADER, footer=DEFAULT_FOOTER, bos=""):
    out = {}
    for conv, _, role, text in sorted(rows, key=lambda r: (r[0], r[1])):
        pre, post = header.split("{role}")
        out.setdefault(conv, bos)
        out[conv] += pre + (role or "") + post + (text or "") + footer
    return out


def test_render_matches_python_oracle(spark, convs):
    got = {r.conv_id: (r.text, r.n_turns) for r in render_conversations(convs).collect()}
    want = py_render(ROWS)
    counts = {}
    for r in ROWS:
        counts[r[0]] = counts.get(r[0], 0) + 1
    assert got == {c: (want[c], counts[c]) for c in want}


def test_render_custom_template_and_bos(spark, convs):
    got = {
        r.conv_id: r.text
        for r in render_conversations(
            convs, header="[{role}] ", footer="\n", bos="<s>"
        ).collect()
    }
    assert got == py_render(ROWS, header="[{role}] ", footer="\n", bos="<s>")


def test_render_roleless_header(spark, convs):
    got = {
        r.conv_id: r.text
        for r in render_conversations(convs, header="### ", footer="\n").collect()
    }
    want = {}
    for conv, _, role, text in sorted(ROWS, key=lambda r: (r[0], r[1])):
        want.setdefault(conv, "")
        want[conv] += "### " + (text or "") + "\n"
    assert got == want


def test_render_template_validation(spark, convs):
    with pytest.raises(ValueError, match="at most one"):
        render_conversations(convs, header="{role}{role}")


def test_spans_extract_exact_text(spark, convs):
    """The core invariant: substring(rendered, start, end) == turn text,
    for every turn, checked against the actual rendered string."""
    rendered = {r.conv_id: r.text for r in render_conversations(convs).collect()}
    for r in turn_spans(convs).collect():
        assert rendered[r.conv_id][r.text_start : r.text_end] == (r.text or "")
        assert r.loss_mask == (r.role == "assistant")


def test_spans_extract_exact_text_custom_template(spark, convs):
    rendered = {
        r.conv_id: r.text
        for r in render_conversations(
            convs, header="[{role}]: ", footer="</s>", bos="<s>"
        ).collect()
    }
    sp = turn_spans(convs, header="[{role}]: ", footer="</s>", bos="<s>")
    for r in sp.collect():
        assert rendered[r.conv_id][r.text_start : r.text_end] == (r.text or "")
    # roleless template: role appears nowhere, spans still exact
    rendered = {
        r.conv_id: r.text
        for r in render_conversations(convs, header="### ", footer="\n").collect()
    }
    for r in turn_spans(convs, header="### ", footer="\n").collect():
        assert rendered[r.conv_id][r.text_start : r.text_end] == (r.text or "")


def test_spans_distributed_invariant(spark):
    """Bigger generated corpus; the invariant counted on the cluster via a
    join of spans onto the rendered strings — zero violations."""
    from mrmr_spark.sources.transcripts import generate_transcripts_pandas

    tr = spark.createDataFrame(
        generate_transcripts_pandas(n_convs=40, mean_turns=12, seed=5)
    ).select("conv_id", "turn_idx", "role", "text")
    rendered = render_conversations(tr, out_col="chat_text")
    sp = turn_spans(tr)
    joined = sp.join(rendered.select("conv_id", "chat_text"), "conv_id")
    bad = joined.where(
        F.substring(
            F.col("chat_text"),
            (F.col("text_start") + 1).cast("int"),
            (F.col("text_end") - F.col("text_start")).cast("int"),
        )
        != F.coalesce(F.col("text"), F.lit(""))
    ).count()
    assert bad == 0


def test_render_order_is_stable(spark):
    """Turn order comes from order_cols, not input row order."""
    shuffled = spark.createDataFrame(
        list(reversed(ROWS)), "conv_id string, turn_idx int, role string, text string"
    ).repartition(4)
    a = {r.conv_id: r.text for r in render_conversations(shuffled).collect()}
    assert a == py_render(ROWS)


def test_rendered_conversations_feed_curation(spark, convs):
    """Rendered conversations are documents: exact dedup and BPE token
    counting compose downstream without adapters."""
    from mrmr_spark.operators.dedup import exact_dedup
    from mrmr_spark.operators.tokenizer import bpe_token_count

    docs = render_conversations(convs).withColumnRenamed("conv_id", "doc_id")
    deduped = exact_dedup(docs)
    assert deduped.count() == 3
    counted = bpe_token_count(docs, [("h", "i")], text_col="text")
    got = {r.doc_id: r.n_bpe_tokens for r in counted.collect()}
    assert all(v > 0 for v in got.values())


def test_render_is_single_exchange(spark, convs):
    plan = render_conversations(convs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1
    assert "Python" not in plan and "ArrowEval" not in plan


def test_streaming_render_matches_batch(spark, tmp_path):
    """The streaming renderer replayed over micro-batches must emit the
    batch render_conversations string byte-for-byte for every conversation
    whose end marker arrived; a conversation without a marker stays in
    state (not emitted)."""
    import os

    from mrmr_spark.operators.chat import render_conversations
    from mrmr_spark.streaming.chat import streaming_render_conversations

    rows = []
    for conv, n in [("c1", 4), ("c2", 2), ("c3", 3)]:
        for i in range(n):
            role = ["user", "assistant", "system"][i % 3]
            rows.append((conv, i, role, f"{conv} says {i}"))
        if conv != "c3":  # c3 never closes
            rows.append((conv, n, "end", None))
    pdf_cols = "conv_id string, turn_idx int, role string, text string"
    sdf = spark.createDataFrame(rows, pdf_cols)

    flat = os.path.join(str(tmp_path), "chat_stream")
    os.makedirs(flat)
    for i, (lo, hi) in enumerate([(0, 2), (2, 4), (4, 100)]):
        part = sdf.where(f"turn_idx >= {lo} and turn_idx < {hi}").coalesce(1)
        d = os.path.join(str(tmp_path), f"cb{i}")
        part.write.mode("overwrite").parquet(d)
        f = [x for x in os.listdir(d) if x.endswith(".parquet")][0]
        os.rename(os.path.join(d, f), os.path.join(flat, f"slice{i}.parquet"))

    stream = (
        spark.readStream.schema(sdf.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    out = streaming_render_conversations(stream)
    q = (
        out.writeStream.format("memory").queryName("chat_stream_render")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r.conv_id: (r.text, r.n_turns)
        for r in spark.table("chat_stream_render").collect()
    }
    batch = {
        r.conv_id: (r.text, r.n_turns)
        for r in render_conversations(
            sdf.where("role <> 'end'")
        ).collect()
    }
    assert set(got) == {"c1", "c2"}  # c3 has no end marker
    for c in got:
        assert got[c] == batch[c], c
