"""Training-shard export: split-partitioned layout, file-size bounds, and
a split-pruned read-back that matches the source exactly."""

import os

from pyspark.sql import functions as F

from supermusr_data_pipeline_spark.operators.export import export_training_shards
from supermusr_data_pipeline_spark.plans.text_dedup import QUERIES
from supermusr_data_pipeline_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_export_layout_and_readback(spark, tmp_path):
    splits = QUERIES["q50_split_assign"](spark, SF_DIR).select("doc_id", "split")
    docs = load_table(spark, SF_DIR, "documents").join(splits, "doc_id")
    out = str(tmp_path / "shards")
    export_training_shards(docs, out, max_records_per_file=100)
    dirs = sorted(d for d in os.listdir(out) if d.startswith("split="))
    assert dirs == ["split=test", "split=train", "split=val"]
    # file bound respected: the train split (~400 docs) must roll files
    train_files = [
        f for f in os.listdir(os.path.join(out, "split=train")) if f.endswith(".parquet")
    ]
    assert len(train_files) >= 2
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # a split-restricted read prunes at the partition level
    tr = back.filter(F.col("split") == "train")
    plan = tr._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "split" in plan
    assert tr.count() == docs.filter(F.col("split") == "train").count()
