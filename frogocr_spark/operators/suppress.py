"""Per-group NMS operator (W5) via grouped applyInPandas.

One shuffle on the group key; the sequential suppression loop runs on
bounded per-group candidate lists (cap W6), so group size — not table
size — bounds the non-vectorized work.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from ..core.nms import nms


def nms_per_group(df: DataFrame, group_cols: list[str],
                  start_col: str = "start", end_col: str = "end",
                  score_col: str = "score",
                  iou_threshold: float = 0.5) -> DataFrame:
    """Keep per-group candidates surviving greedy NMS."""
    schema = df.select(*group_cols, start_col, end_col, score_col).schema

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        cands = list(zip(pdf[start_col].astype(int),
                         pdf[end_col].astype(int),
                         pdf[score_col].astype(float)))
        kept = nms(cands, iou_threshold)
        head = pdf.iloc[0]
        return pd.DataFrame(
            [[*(head[g] for g in group_cols), s, e, sc]
             for s, e, sc in kept],
            columns=[*group_cols, start_col, end_col, score_col])

    return (df.select(*group_cols, start_col, end_col, score_col)
            .groupBy(*group_cols).applyInPandas(run, schema=schema))
