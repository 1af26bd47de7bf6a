"""Source scan utilities (SURVEY.md §2.1 S1-S5).

The reference's input plugin (in_opensearch.rb) runs a scroll scan with
N sliced reader threads; in Spark the scan IS the parallelism (one task
per file split), so S2-S4 collapse to ``spark.read``. What remains
worth implementing:

  * S5 docinfo enrichment — attach source-location metadata under
    ``@metadata`` exactly like ``process_events`` attaches
    ``_index/_type/_id`` (in_opensearch.rb:412-435). For file sources
    Spark exposes the hidden ``_metadata`` struct (file_path,
    row_index, ...) — the per-row lineage the north_star requires.
  * S3 slice control — an explicit repartition knob for downstream
    stages that need different parallelism than the file layout gives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def scan_with_docinfo(
    spark: SparkSession, path: str, docinfo_target: str = "@metadata"
) -> DataFrame:
    """S1+S5: parquet scan with per-row source lineage under
    ``@metadata`` (struct of file path + row position — the columnar
    analog of the scroll hit's ``_index``/``_id``)."""
    df = spark.read.parquet(path)
    return df.select(
        "*",
        F.struct(
            F.col("_metadata.file_path").alias("source_file"),
            F.col("_metadata.row_index").alias("source_row"),
        ).alias(docinfo_target),
    )


def with_slices(df: DataFrame, num_slices: int) -> DataFrame:
    """S3: the sliced-scan analog — explicit parallelism override.
    Spark only needs this when the file layout under-partitions
    (few huge files); prefer letting ``maxPartitionBytes`` split."""
    return df.repartition(num_slices)
