"""Small-files compaction — the operational half of the sink story.

At 100 TB, a pipeline that writes one file per task per partition
produces millions of small objects: metadata-bound scans, throttled
object stores, slow footer probes. The fix is sizing files at WRITE
time; this module packages the two standard levers:

* ``maxRecordsPerFile`` caps file size without any shuffle (a task
  rolls to a new file when full) — the cheap lever, but it cannot MERGE
  many small tasks into few files.
* ``repartition(n)`` (optionally by partition columns) re-groups rows
  so each task writes approximately one right-sized file — one shuffle,
  used only when the input is fragmented.

``write_compacted`` picks the shuffle only when needed (estimated from
the input's partition count vs the target), mirroring what table
formats' OPTIMIZE jobs do.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame


def write_compacted(
    df: DataFrame,
    path: str,
    target_rows_per_file: int,
    partition_by: list[str] | None = None,
) -> int:
    """Write ``df`` as parquet with ~``target_rows_per_file`` rows per
    file; returns the number of output tasks used.

    The row count here costs one count job; a production OPTIMIZE would
    use table statistics instead. The count → ceil division decides the
    writer parallelism, and ``maxRecordsPerFile`` backstops any task
    that still exceeds the target (skewed partition_by values).
    """
    n_rows = df.count()
    n_tasks = max(1, math.ceil(n_rows / target_rows_per_file))
    current = df.rdd.getNumPartitions()
    if current != n_tasks:
        # repartition rather than coalesce even when shrinking:
        # coalesce(n) merges without a shuffle but also caps the
        # PRECEDING stage's parallelism at n — a full-pipeline slowdown
        # far costlier than one shuffle of the final rows.
        df = (
            df.repartition(n_tasks, *partition_by)
            if partition_by
            else df.repartition(n_tasks)
        )
    writer = df.write.option("maxRecordsPerFile", target_rows_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.mode("overwrite").parquet(path)
    return n_tasks
