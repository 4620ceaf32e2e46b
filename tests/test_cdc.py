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
