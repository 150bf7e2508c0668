"""Engine tests for z-order layout keys (operators/layout.py): textbook
Morton order on a small grid, range-clustering locality, and input
validation."""

import pytest
from pyspark.sql import functions as F

from crawld_spark.operators import layout


class TestZorderKey:
    def test_textbook_morton_order_4x4(self, spark):
        rows = [(x, y) for y in range(4) for x in range(4)]
        df = spark.createDataFrame(rows, "x long, y long")
        got = {
            (r.x, r.y): r.z
            for r in df.select(
                "x", "y", layout.zorder_key(F.col("x"), F.col("y"), bits=2).alias("z")
            ).collect()
        }
        # Morton: x in even bits, y in odd — the classic 4x4 curve
        want = {
            (0, 0): 0, (1, 0): 1, (0, 1): 2, (1, 1): 3,
            (2, 0): 4, (3, 0): 5, (2, 1): 6, (3, 1): 7,
            (0, 2): 8, (1, 2): 9, (0, 3): 10, (1, 3): 11,
            (2, 2): 12, (3, 2): 13, (2, 3): 14, (3, 3): 15,
        }
        assert got == want

    def test_bits_bounds(self, spark):
        with pytest.raises(ValueError):
            layout.zorder_key(F.lit(1), F.lit(1), bits=0)
        with pytest.raises(ValueError):
            layout.zorder_key(F.lit(1), F.lit(1), bits=32)

    def test_cluster_narrows_both_dimensions(self, spark):
        # after z-order range clustering, each partition's span of EITHER
        # hash dimension is far narrower than the full domain — the
        # zone-map-pruning property
        df = spark.range(0, 4096).select(
            F.concat(F.lit("h"), (F.col("id") % 64).cast("string")).alias("host"),
            F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        )
        bits = 12
        out = layout.cluster_by_zorder(df, "host", "url", n_partitions=16, bits=bits)
        spans = (
            out.withColumn("pid", F.spark_partition_id())
            .withColumn("ah", F.pmod(F.xxhash64("host"), F.lit(1 << bits)))
            .groupBy("pid")
            .agg((F.max("_zk") - F.min("_zk")).alias("zspan"))
            .collect()
        )
        full = (1 << (2 * bits)) - 1
        # 16 range partitions over the key space: each spans ~1/16th
        assert all(r.zspan < full / 4 for r in spans if r.zspan is not None)


class TestCdxPrefixScan:
    """The scale claim behind queries.cdx_prefix_scan: over a CDX store
    sorted/range-partitioned by SURT key, the domain range [lo, hi) is a
    pushed-down parquet filter (zone-map-prunable), not a post-scan one."""

    LO, HI = "com,example,host3,", "com,example,host3-"

    def _cdx(self, spark):
        from crawld_spark.functions.url import surt_key

        return spark.range(0, 700).select(
            F.col("id").alias("doc_id"),
            surt_key(
                F.concat(
                    F.lit("https://sub"), (F.col("id") % 5).cast("string"),
                    F.lit(".host"), (F.col("id") % 7).cast("string"),
                    F.lit(".example.com/p/"), F.col("id").cast("string"),
                )
            ).alias("surt"),
        )

    def test_range_filter_is_pushed_to_parquet(self, spark, tmp_path):
        path = str(tmp_path / "cdx")
        (
            self._cdx(spark)
            .repartitionByRange(8, "surt")
            .sortWithinPartitions("surt")
            .write.parquet(path)
        )
        scan = spark.read.parquet(path).where(
            (F.col("surt") >= self.LO) & (F.col("surt") < self.HI)
        )
        plan = scan._jdf.queryExecution().executedPlan().toString()
        assert "GreaterThanOrEqual(surt,com,example,host3," in plan
        assert "LessThan(surt,com,example,host3-" in plan
        # exactly the host3 captures (id % 7 == 3), every subdomain included
        assert scan.count() == 100
        subs = {
            r.surt.split(",sub", 1)[1][0] for r in scan.collect()
        }
        assert subs == {"0", "1", "2", "3", "4"}

    def test_sorted_layout_isolates_domain_to_few_files(self, spark, tmp_path):
        # range-partitioned sort puts one domain's contiguous key range in
        # a small file subset — the partition-pruning property at 10^10 rows
        path = str(tmp_path / "cdx_sorted")
        (
            self._cdx(spark)
            .repartitionByRange(8, "surt")
            .sortWithinPartitions("surt")
            .write.parquet(path)
        )
        hit = (
            spark.read.parquet(path)
            .where((F.col("surt") >= self.LO) & (F.col("surt") < self.HI))
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )
        total = (
            spark.read.parquet(path)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )
        assert hit <= max(2, total // 3), (hit, total)
