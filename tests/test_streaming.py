"""Streaming drain mode == batch extraction output; checkpoint resume."""

import os

from frogocr_spark.operators.extraction import extract_turns
from frogocr_spark.sources import transcripts
from frogocr_spark.sources.catalog import Table
from frogocr_spark.streaming import stream


def test_drain_matches_batch(spark, tmp_path):
    tdf = transcripts.generate(spark, 15)
    input_dir = str(tmp_path / "in")
    tdf.write.parquet(input_dir)

    out_dir = str(tmp_path / "out")
    stream.run_drain(spark, input_dir, out_dir)

    streamed = {(r.conv_id, r.turn_idx): r.extracted_text
                for r in Table(spark, os.path.join(out_dir, "extractions"))
                .read().collect()}
    batch = {(r.conv_id, r.turn_idx): r.extracted_text
             for r in extract_turns(spark.read.parquet(input_dir)).collect()}
    assert streamed == batch


def test_checkpoint_no_reprocessing(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    transcripts.generate(spark, 10).write.parquet(input_dir)
    stream.run_drain(spark, input_dir, out_dir)
    table = Table(spark, os.path.join(out_dir, "extractions"))
    n1 = table.read().count()

    # drain again with the SAME checkpoint: nothing new to process
    stream.run_drain(spark, input_dir, out_dir)
    assert table.read().count() == n1

    # add more input files → only the delta is processed
    transcripts.generate(spark, 14).where("conv_id >= 'conv_00000010'") \
        .write.mode("append").parquet(input_dir)
    stream.run_drain(spark, input_dir, out_dir)
    n2 = table.read().count()
    assert n2 > n1
    keys = table.read().select("conv_id", "turn_idx")
    assert keys.count() == keys.distinct().count()  # exactly-once
