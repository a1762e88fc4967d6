"""Column-level CTC collapse (A7) — the Spark surface of core.ctc.

Reference ``Source/Paddle/Recognition.cpp:102-128``: per-timestep argmax,
drop blanks (class 0) and repeats, confidence = mean of kept max-scores.
One Arrow-batched pandas UDF over a flattened ``array<float>`` score
column (timesteps × n_classes, row-major) — decoding model outputs at
corpus scale is a pure map, no shuffle.

Scores are upcast to float64 before the mean so the confidence matches
the DuckDB ``avg`` oracle bit-for-bit after rounding.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..core.ctc import ctc_collapse

_OUT = T.StructType([
    T.StructField("ids", T.ArrayType(T.IntegerType()), False),
    T.StructField("conf", T.DoubleType(), False),
])


def ctc_decode_column(df: DataFrame, scores_col: str, n_classes: int,
                      id_cols: tuple[str, ...] = ("vec_id",)) -> DataFrame:
    """Decode a flattened score column: rows whose array length is not a
    multiple of ``n_classes`` are truncated to whole timesteps; NULL
    arrays and 0-step inputs yield empty ids with conf 1.0.

    That empty-decode convention is a DELIBERATE deviation from the
    reference: Recognition.cpp computes score/count → NaN when nothing
    is kept and then skips emitting the result row entirely.  A
    relational operator must stay 1-row-in-1-row-out (downstream joins
    and the lineage sidecar count on it), so empty decodes are emitted
    with a well-defined (empty, 1.0) record instead of silently
    disappearing."""

    @pandas_udf(_OUT)
    def decode(arrs: pd.Series) -> pd.DataFrame:
        ids_out, conf_out = [], []
        for a in arrs:
            v = np.asarray(a if a is not None else [], dtype=np.float64)
            t = len(v) // n_classes
            ids, conf = ctc_collapse(v[: t * n_classes]
                                     .reshape(t, n_classes))
            ids_out.append([int(i) for i in ids])
            conf_out.append(conf)
        return pd.DataFrame({"ids": ids_out, "conf": conf_out})

    return (df.select(*id_cols, decode(F.col(scores_col)).alias("d"))
            .select(*id_cols, F.col("d.ids").alias("ids"),
                    F.col("d.conf").alias("conf")))
