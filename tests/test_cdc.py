"""CDC apply (operators/cdc.py): tiny-frame semantics + plan shape."""

from pyspark.sql import functions as F

from mircv_project_spark.operators.cdc import apply_changes


def _apply(spark, base_rows, change_rows):
    base = spark.createDataFrame(base_rows, "k string, v string")
    changes = spark.createDataFrame(
        change_rows, "k string, v string, op string, seq long"
    )
    return {
        r["k"]: r["v"]
        for r in apply_changes(base, changes, ["k"]).collect()
    }


def test_upsert_delete_insert_noop(spark):
    got = _apply(
        spark,
        [("a", "1"), ("b", "2"), ("c", "3")],
        [
            ("a", "upd", "U", 1),  # replace
            ("b", None, "D", 1),  # delete
            ("d", "new", "U", 1),  # insert
            ("zz", None, "D", 1),  # no-op delete on absent key
        ],
    )
    assert got == {"a": "upd", "c": "3", "d": "new"}


def test_last_seq_wins_including_delete_then_upsert(spark):
    got = _apply(
        spark,
        [("a", "1"), ("b", "2")],
        [
            ("a", "first", "U", 1),
            ("a", "second", "U", 2),  # wins
            ("b", None, "D", 1),
            ("b", "revived", "U", 2),  # upsert after delete wins
        ],
    )
    assert got == {"a": "second", "b": "revived"}


def test_plan_is_one_anti_join(spark):
    base = spark.createDataFrame([("a", "1")], "k string, v string")
    changes = spark.createDataFrame(
        [("a", "u", "U", 1)], "k string, v string, op string, seq long"
    )
    plan = (
        apply_changes(base, changes, ["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_streaming_cdc_replay_and_late_low_seq_are_noops(spark, tmp_path):
    """Replayed deliveries and late LOWER-seq changes must not change
    the state; a higher seq must override; final table equals the
    batch apply over the full feed."""
    from mircv_project_spark.operators.cdc import apply_changes
    from mircv_project_spark.streaming.cdc_stream import (
        final_cdc_table,
        run_streaming_cdc,
    )

    base = spark.createDataFrame(
        [("c1", 0, "user", "hello", None, 100),
         ("c1", 1, "assistant", "hi", None, 200),
         ("c2", 0, "user", "bye", None, 300)],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, us long",
    )
    feed_schema = (
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, us long, op string, seq long"
    )
    e1 = [
        ("c1", 0, "user", "v2", None, 101, "U", 2),
        ("c2", 0, None, None, None, None, "D", 1),
    ]
    e2 = [
        ("c1", 0, "user", "v2", None, 101, "U", 2),   # verbatim replay
        ("c1", 0, "user", "v1-late", None, 99, "U", 1),  # late low seq
        ("c1", 1, "assistant", "v3", None, 201, "U", 3),  # override
    ]
    inp, out, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    spark.createDataFrame(e1, feed_schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(inp)
    run_streaming_cdc(spark, inp, out, ckpt).awaitTermination(120)
    spark.createDataFrame(e2, feed_schema).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    run_streaming_cdc(spark, inp, out, ckpt).awaitTermination(120)

    raw = spark.read.parquet(out)
    # (c1, 0)'s epoch-2 state must equal epoch-1 (replay + low seq)
    c10 = {r.epoch: (r.seq, r.op, r.text)
           for r in raw.where("conv_id = 'c1' AND turn_idx = 0").collect()}
    assert c10[1] == c10[2] == (2, "U", "v2")

    got = {
        (r.conv_id, r.turn_idx): (r.role, r.text, r.us)
        for r in final_cdc_table(base, raw).collect()
    }
    changes = spark.createDataFrame(e1 + e2, feed_schema)
    want = {
        (r.conv_id, r.turn_idx): (r.role, r.text, r.us)
        for r in apply_changes(base, changes, ["conv_id", "turn_idx"]).collect()
    }
    assert got == want
    assert got[("c1", 1)] == ("assistant", "v3", 201)
    assert ("c2", 0) not in got
