"""Custom PySpark DataSource (Spark 4 Python data source API).

The reference's generator is a driver-side Java loop writing a text
file (BD_hw1 ``src/generator/BillingMain.java:27`` → 1M lines on one
thread); ``sources/generator.py`` already rebuilds it as a distributed
DataFrame. THIS module adds the third form a modern engine offers: a
first-class pluggable source — ``spark.read.format("pybilling")`` —
implemented against the Python DataSource V2 API (Spark 4), with
partition planning (each InputPartition generates its row range
independently, so the source scales out like any file source) and a
deterministic md5-derived payload the DuckDB oracle reproduces
row-for-row, making even the custom-source path full-value-hash
checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

PYDS_ROWS = 5000
PYDS_PARTITIONS = 8


class BillingReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("rows", str(PYDS_ROWS)))
        self.parts = int(options.get("partitions", str(PYDS_PARTITIONS)))

    def partitions(self):
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition):
        import hashlib

        i = partition.value
        per = self.n // self.parts
        lo = i * per
        hi = self.n if i == self.parts - 1 else lo + per
        for j in range(lo, hi):
            h = hashlib.md5(str(j).encode()).hexdigest()
            yield (
                j,
                int(h[:4], 16) % 28 + 1,
                int(h[4:8], 16) % 12 + 1,
                int(h[8:12], 16) % 500,
            )


class BillingSource(DataSource):
    @classmethod
    def name(cls):
        return "pybilling"

    def schema(self):
        return "bid bigint, day int, month int, cost int"

    def reader(self, schema):
        return BillingReader(self.options)


def python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly rollup read THROUGH the registered custom source:
    ``spark.read.format("pybilling")`` plans one task per
    InputPartition; every row is a pure function of its row id (md5
    digits), so the oracle regenerates the identical table with
    generate_series + md5 in SQL. Columns: month, n, day_sum,
    cost_sum.
    """
    spark.dataSource.register(BillingSource)
    df = spark.read.format("pybilling").load()
    return df.groupBy("month").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("day").cast("long").alias("day_sum"),
        F.sum("cost").cast("long").alias("cost_sum"),
    )
