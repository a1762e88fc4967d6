"""applyInPandasWithState: per-conversation running summaries accumulate
across micro-batches and survive the checkpoint."""

import os

from frogocr_spark.core.extract import extract_turn
from frogocr_spark.sources import payloadgen, transcripts
from frogocr_spark.streaming.stateful import conversation_state_stream
from frogocr_spark.sources.transcripts import TRANSCRIPT_SCHEMA


def _expected(n_convs):
    exp = {}
    for r in payloadgen.gen_transcripts(n_convs):
        rec = extract_turn(r["text"])
        e = exp.setdefault(r["conv_id"],
                           {"n_turns": 0, "n_extracted": 0, "n_empty": 0,
                            "last_turn_idx": -1})
        e["n_turns"] += 1
        if rec["extracted_text"]:
            e["n_extracted"] += 1
        else:
            e["n_empty"] += 1
        e["last_turn_idx"] = max(e["last_turn_idx"], r["turn_idx"])
    return exp


def test_stateful_accumulation_across_batches(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    tdf = transcripts.generate(spark, 12)
    # two separate files → maxFilesPerTrigger=1 forces ≥2 micro-batches
    tdf.where("pmod(hash(conv_id), 2) = 0").write.parquet(
        input_dir + "/part1")
    tdf.where("pmod(hash(conv_id), 2) = 1").write.parquet(
        input_dir + "/part2")

    stream = (spark.readStream.schema(TRANSCRIPT_SCHEMA)
              .option("maxFilesPerTrigger", "1")
              .parquet(input_dir + "/part*"))
    out = conversation_state_stream(stream)
    q = (out.writeStream.format("memory").queryName("conv_state")
         .outputMode("update")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()

    # take the LAST emitted row per conv (update mode re-emits)
    rows = spark.sql("select * from conv_state").collect()
    final = {}
    for r in rows:  # memory sink appends updates in batch order
        final[r.conv_id] = r
    exp = _expected(12)
    assert set(final) == set(exp)
    for cid, e in exp.items():
        r = final[cid]
        assert (r.n_turns, r.n_extracted, r.n_empty, r.last_turn_idx) == (
            e["n_turns"], e["n_extracted"], e["n_empty"], e["last_turn_idx"]), cid
