"""scripts/pipeline.py CLI smoke: every subcommand runs end-to-end on
the sf0.001 corpus and produces consistent outputs (semantics of the
underlying operators are pinned by their own gates)."""

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _main():
    spec = importlib.util.spec_from_file_location(
        "pipeline_cli", f"{REPO}/scripts/pipeline.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.main


def test_pipeline_cli_all_subcommands(spark, tmp_path, capsys):
    main = _main()
    src = "/root/testdata/sf0.001/documents.parquet"

    assert main(["stats", "--input", src]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["docs"] == 500 and stats["tokens"] > 0
    assert sum(stats["by_source"].values()) == 500

    out = str(tmp_path / "clean")
    assert main(["clean", "--input", src, "--output", out]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["input_docs"] == 500
    kept = spark.read.parquet(f"{out}/documents")
    assert kept.count() == rep["kept_docs"] > 0
    verdict = spark.read.parquet(f"{out}/verdict")
    assert verdict.count() == 500

    out2 = str(tmp_path / "dedup")
    assert main(["dedup", "--input", src, "--output", out2]) == 0
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0 < rep2["kept_docs"] <= 500
    assert spark.read.parquet(out2).count() == rep2["kept_docs"]

    out3 = str(tmp_path / "packed")
    assert main(["pack", "--input", src, "--output", out3, "--window", "128"]) == 0
    rep3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep3["rows"] == 500
    packed = spark.read.parquet(out3)
    assert packed.count() == 500


def test_pipeline_cli_new_subcommands(spark, tmp_path, capsys):
    import json as _json

    main = _main()
    src = "/root/testdata/sf0.001/documents.parquet"

    out = str(tmp_path / "chunks")
    assert main(["chunks", "--input", src, "--output", out]) == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["chunks"] > 0
    assert spark.read.parquet(out).count() == rep["chunks"]

    assert main(["fertility", "--input", src]) == 0
    fert = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert fert and all(v["fertility"] > 0 for v in fert.values())

    # sft needs a transcript-shaped input
    tsrc = str(tmp_path / "transcripts")
    from mircv_project_spark.sources.transcripts import load_transcripts

    load_transcripts(spark, "/root/testdata/sf0.001").select(
        "conv_id", "turn_idx", "role", "text"
    ).write.mode("overwrite").parquet(tsrc)
    out2 = str(tmp_path / "sft")
    assert main(["sft", "--input", tsrc, "--output", out2]) == 0
    rep2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["pairs"] > 0
    assert spark.read.parquet(out2).count() == rep2["pairs"]


def test_pipeline_cli_round5_subcommands(spark, tmp_path, capsys):
    import json as _json

    main = _main()
    src = "/root/testdata/sf0.001/documents.parquet"

    out = str(tmp_path / "spans")
    assert main(["span-corruption", "--input", src, "--output", out]) == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["spans"] > 0
    assert spark.read.parquet(out).count() == rep["spans"]

    out2 = str(tmp_path / "ssamp")
    assert main(["stratified-sample", "--input", src, "--output", out2,
                 "--k", "5"]) == 0
    rep2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["sampled"] > 0
    samp = spark.read.parquet(out2)
    assert samp.count() == rep2["sampled"]
    assert samp.groupBy("source").count().agg({"count": "max"}).collect()[0][0] <= 5

    tsrc = str(tmp_path / "transcripts")
    from mircv_project_spark.sources.transcripts import load_transcripts

    load_transcripts(spark, "/root/testdata/sf0.001").select(
        "conv_id", "turn_idx", "role", "text"
    ).write.mode("overwrite").parquet(tsrc)
    out3 = str(tmp_path / "prefs")
    assert main(["preference-pairs", "--input", tsrc, "--output", out3]) == 0
    rep3 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep3["pairs"] > 0
    assert spark.read.parquet(out3).count() == rep3["pairs"]
