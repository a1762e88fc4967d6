"""Directory-enumeration source (S4) + producer path derivation.

The reference's ``frog add`` recursively lists a directory, keeps ``*.jpg``
files, and derives ``output_path`` by swapping the extension — reference
``Source/Application.cpp:191-246``, ``Source/Core/Filesystem.cpp:59-77``,
``Source/Core/String.hpp:23-27``.  Spark-native: the ``binaryFile``
source with a ``pathGlobFilter`` (distributed listing + content), or a
listing-only variant that skips content for producer-style enumeration.

Remote filesystems (the reference's smb:// client with its global mutex —
``Source/Core/SambaClient.cpp:16-26``) map to Hadoop FS connectors
(s3a://, abfs://) — same API here, no serialization point (SURVEY §2.1
S5: partition-local IO only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import path_with_extension


def enumerate_files(spark: SparkSession, root: str,
                    glob: str = "*.jpg",
                    output_ext: str = "xml",
                    with_content: bool = False) -> DataFrame:
    """Recursive listing → (input_path, output_path, length[, content])."""
    reader = (spark.read.format("binaryFile")
              .option("pathGlobFilter", glob)
              .option("recursiveFileLookup", "true"))
    df = reader.load(root)
    cols = [
        F.col("path").alias("input_path"),
        path_with_extension(F.col("path"), output_ext).alias("output_path"),
        F.col("length"),
    ]
    if with_content:
        cols.append(F.col("content"))
    return df.select(*cols)


def as_task_rows(files: DataFrame, priority: int = 0,
                 settings_csv: str = "") -> DataFrame:
    """S3 producer shape: the reference's task-insert tuple
    (``Source/Application.cpp:66-73``)."""
    return files.select(
        "input_path", "output_path",
        F.lit(priority).alias("priority"),
        F.lit(settings_csv).alias("settings_csv"),
    )
