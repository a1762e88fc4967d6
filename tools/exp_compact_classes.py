"""VERDICT r4 #5 experiment: does shrinking the Python→JVM Arrow
boundary move the 8→32 scaling ratio?

Hypothesis from the r4 replication experiment: the 32-core level is
memory-bandwidth-bound, so cutting per-turn bytes on the extraction
operator's Arrow output should raise the 8→32 raw ratio if (and only
if) that bandwidth is a binding constraint.

Lever under test: ``extract_turns(compact_classes=True)`` — the
``payload_class`` column crosses the boundary as int8 instead of a
string, decoded JVM-side.  (True Arrow dictionary encoding at this
boundary is unsupported: Spark's ArrowColumnVector raises
``UNSUPPORTED_CALL`` on ``getUTF8String`` over a dictionary vector
from mapInArrow — probed on 4.1.2 — so the integer code + element_at
decode is the available equivalent.)

Protocol: same interleaved (low, high) rounds as bench.py's scaling
pairs, modes alternated WITHIN each round (off, on at 8; off, on at
32) so box-load drift hits both modes together.  Prints one JSON line.

Usage: python tools/exp_compact_classes.py [rounds]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from frogocr_spark.session import get_spark
    from frogocr_spark.sources import transcripts

    tmp = tempfile.mkdtemp(prefix="exp_compact_")
    input_dir = os.path.join(tmp, "transcripts")
    try:
        spark = get_spark(app_name="exp-gen", cores=32)
        tdf = transcripts.generate_for_sf(spark, sf_dir)
        est = int(transcripts.sf_of_dir(sf_dir) * transcripts.ROWS_PER_SF)
        n_files = max(64, min(1024, est // 9000))
        tdf.repartition(n_files).write.mode("overwrite").parquet(input_dir)
        n_rows = spark.read.parquet(input_dir).count()
        spark.stop()

        out: dict = {"experiment": "compact_classes_8_32",
                     "n_turns": n_rows, "rounds": rounds}
        tput: dict[tuple[bool, int], list[float]] = {}
        for r in range(rounds):
            for cores in (8, 32):
                for mode in (False, True):
                    t = bench._extraction_run(
                        cores, input_dir, n_rows,
                        f"exp-cc{int(mode)}-{cores}-r{r}",
                        window=bench.SCALING_WINDOW,
                        extract_kwargs={"compact_classes": mode})
                    tput.setdefault((mode, cores), []).append(t)
        for mode in (False, True):
            lows = tput[(mode, 8)]
            highs = tput[(mode, 32)]
            effs = [(h / l) / 4.0 for l, h in zip(lows, highs)]
            key = "compact" if mode else "baseline"
            out[key] = {
                "turns_per_sec_8": [round(x, 1) for x in lows],
                "turns_per_sec_32": [round(x, 1) for x in highs],
                "efficiency_per_round": [round(e, 3) for e in effs],
                "efficiency_median": round(statistics.median(effs), 3),
                "tput32_median": round(statistics.median(highs), 1),
            }
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
