"""Dialogue prep (operators/dialogue.py): contiguity, NULL-turn
concat behavior, and exact span arithmetic on a hand-built frame."""

from mircv_project_spark.operators.dialogue import (
    assistant_token_spans,
    turn_windows,
)


def _t(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )


def test_turn_windows_contiguity_and_nulls(spark):
    t = _t(
        spark,
        [
            ("c1", 0, "user", "a a"),
            ("c1", 1, "assistant", None),  # NULL turn: skipped by concat_ws
            ("c1", 2, "user", "c"),
            ("c1", 4, "assistant", "e"),  # gap 2->4 breaks contiguity
            ("c1", 5, "user", "f"),
            ("c2", 0, "user", "x"),  # too short for any window
        ],
    )
    got = {
        (r["conv_id"], r["start_turn"]): r["text"]
        for r in turn_windows(t, w=3).collect()
    }
    assert got == {("c1", 0): "a a\nc"}  # NULL middle turn skipped


def test_assistant_token_spans_exact(spark):
    t = _t(
        spark,
        [
            ("c1", 0, "user", "a b c"),
            ("c1", 1, "assistant", "d d"),
            ("c1", 2, "tool", None),
            ("c1", 3, "assistant", "e"),
        ],
    )
    got = {
        r["turn_idx"]: (r["start_tok"], r["end_tok"], r["is_target"])
        for r in assistant_token_spans(t).collect()
    }
    assert got == {
        0: (0, 3, False),
        1: (3, 5, True),
        2: (5, 5, False),  # NULL text: zero-width span
        3: (5, 6, True),
    }


def test_instruction_pairs_strict_adjacency(spark):
    """Only assistant turns IMMEDIATELY preceded by a user turn emit;
    tool/system gaps and conversation starts emit nothing."""
    from mircv_project_spark.operators.dialogue import instruction_pairs

    rows = [
        ("c1", 0, "user", "ask one", None, 1),
        ("c1", 1, "assistant", "answer one", None, 2),   # pairs
        ("c1", 2, "system", "note", None, 3),
        ("c1", 3, "assistant", "orphan", None, 4),       # after system: no
        ("c2", 0, "assistant", "cold open", None, 5),    # no prev: no
        ("c2", 1, "user", "ask two", None, 6),
        ("c2", 2, "assistant", "answer two", None, 7),   # pairs
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, us long",
    ).selectExpr(
        "conv_id", "turn_idx", "role", "text", "tool",
        "timestamp_micros(us) AS ts",
    )
    got = {
        (r.conv_id, r.turn_idx): (
            r.prompt, r.response, r.prompt_ntok, r.response_ntok
        )
        for r in instruction_pairs(df).collect()
    }
    assert got == {
        ("c1", 1): ("ask one", "answer one", 2, 2),
        ("c2", 2): ("ask two", "answer two", 2, 2),
    }


def test_streaming_sft_pairs_cross_batch_adjacency(spark, tmp_path):
    """A user turn in batch 1 pairing with its assistant turn in
    batch 2 is found via the held state; within-batch pairs and the
    system-gap exclusion behave like the batch miner."""
    from mircv_project_spark.streaming.sft_stream import (
        run_streaming_sft,
        sft_pairs_with_counts,
    )

    schema = "conv_id string, turn_idx int, role string, text string"
    e1 = [
        ("c1", 0, "user", "ask one"),
        ("c1", 1, "assistant", "answer one"),   # within-batch pair
        ("c2", 0, "user", "ask two"),           # pairs across batches
    ]
    e2 = [
        ("c2", 1, "assistant", "answer two"),
        ("c2", 2, "system", "note"),
        ("c2", 3, "assistant", "orphan"),       # after system: no pair
    ]
    inp, out, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    spark.createDataFrame(e1, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(inp)
    run_streaming_sft(spark, inp, out, ckpt).awaitTermination(120)
    spark.createDataFrame(e2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    run_streaming_sft(spark, inp, out, ckpt).awaitTermination(120)

    got = {
        (r.conv_id, r.turn_idx): (r.prompt, r.response, r.prompt_ntok)
        for r in sft_pairs_with_counts(
            spark.read.parquet(out)
        ).collect()
    }
    assert got == {
        ("c1", 1): ("ask one", "answer one", 2),
        ("c2", 1): ("ask two", "answer two", 2),
    }


def test_preference_pairs_edge_rules(spark):
    """Single-assistant conversations emit nothing; all-equal
    qualities pin the pair to (earliest, latest) — never
    degenerate."""
    from mircv_project_spark.operators.dialogue import preference_pairs

    rows = [
        # conv A: ONE assistant turn -> no row
        ("conv-a", 0, "user", "hello there my friend"),
        ("conv-a", 1, "assistant", "a reply of medium length here"),
        # conv B: two assistant turns with IDENTICAL text (equal
        # quality) -> chosen = earliest, rejected = latest
        ("conv-b", 1, "assistant", "same answer text here okay"),
        ("conv-b", 5, "assistant", "same answer text here okay"),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    got = {r["conv_id"]: r for r in preference_pairs(t).collect()}
    assert "conv-a" not in got
    b = got["conv-b"]
    assert b["chosen_turn"] == 1 and b["rejected_turn"] == 5
    assert b["margin_micro"] == 0
