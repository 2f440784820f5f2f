"""Z-order layout: key correctness and actual file-pruning benefit."""

import numpy as np
import pyarrow.parquet as pq


class TestZorder:
    def test_key_interleaves_bits(self, spark):
        from pyspark.sql import functions as F

        from accelerated_intelligent_document_processing_on_aws_spark.operators.layout_opt import (
            zorder_key,
        )

        df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
        k = df.select(zorder_key(["a", "b"], 3).alias("k")).first()["k"]
        # a bits at even positions, b at odd: a=101, b=011 →
        # pos0=a0=1, pos1=b0=1, pos2=a1=0, pos3=b1=1, pos4=a2=1, pos5=b2=0
        # = 0b011011 (pos5..pos0) = 27
        assert k == 0b011011

    def test_zorder_layout_shrinks_per_file_ranges(self, spark, tmp_path):
        """The point of z-ordering: per-file min/max spans of BOTH key
        columns shrink vs an unclustered write, so range predicates on
        either column prune files."""
        import random

        from accelerated_intelligent_document_processing_on_aws_spark.operators.layout_opt import (
            zorder_layout,
        )

        rng = random.Random(11)
        rows = [(i, rng.randrange(100000), float(rng.randrange(100000)))
                for i in range(40000)]
        df = spark.createDataFrame(rows, "id long, a long, v double")

        plain_dir = str(tmp_path / "plain")
        z_dir = str(tmp_path / "zord")
        df.repartition(16).write.parquet(plain_dir)
        zorder_layout(df, ["a", "v"], bits=8, n_files=16).write.parquet(z_dir)

        def avg_span(d, col):
            import glob
            spans = []
            for f in glob.glob(f"{d}/*.parquet"):
                md = pq.read_metadata(f)
                lo, hi = None, None
                for rg in range(md.num_row_groups):
                    for ci in range(md.num_columns):
                        c = md.row_group(rg).column(ci)
                        if c.path_in_schema == col and c.statistics:
                            s = c.statistics
                            lo = s.min if lo is None else min(lo, s.min)
                            hi = s.max if hi is None else max(hi, s.max)
                if lo is not None:
                    spans.append(float(hi) - float(lo))
            return float(np.mean(spans))

        for col in ("a", "v"):
            plain_span = avg_span(plain_dir, col)
            z_span = avg_span(z_dir, col)
            # 16 files over 2 interleaved dims → each file covers ~1/4
            # of each axis; unclustered files cover ~the whole axis
            assert z_span < 0.55 * plain_span, (col, z_span, plain_span)
