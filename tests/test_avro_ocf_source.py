"""Avro OCF DataSource (sources/avro_ocf_source.py): write → read
roundtrips the events slice exactly, the published files are REAL
container files a standalone decoder accepts, append commits don't
collide, overwrite replaces, and the scan splits one partition per
file."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from kstreams_spark.io import load_table
from kstreams_spark.sources.avro_ocf_source import AvroOcfDataSource

SF = "/root/testdata/sf0.001"


def _events(spark, lo, hi):
    return (
        load_table(spark, SF, "events")
        .filter((F.col("event_id") >= lo) & (F.col("event_id") < hi))
        .select(
            "event_id",
            "user_id",
            F.when(F.col("event_id") % 7 == 0, F.lit(None))
            .otherwise(F.col("event_type"))
            .alias("event_type"),
            F.when(F.col("event_id") % 11 == 0, F.lit(None))
            .otherwise(F.col("value"))
            .alias("value"),
        )
    )


def _rows(df):
    return sorted(
        (r.event_id, r.user_id, r.event_type, r.value) for r in df.collect()
    )


def test_write_read_roundtrip_and_real_files(spark, tmp_path):
    spark.dataSource.register(AvroOcfDataSource)
    src = _events(spark, 0, 500)
    d = str(tmp_path / "ocf")
    src.repartition(3).write.format("kstreams_avro_ocf").mode("append").save(d)
    files = sorted(glob.glob(os.path.join(d, "part-*.avro")))
    assert files and not glob.glob(os.path.join(d, "_staged-*"))
    # each published file is a complete, standalone-decodable OCF
    from kstreams_spark.functions.avro_binary import decode_sensor_record_at
    from kstreams_spark.functions.avro_ocf import AVRO_MAGIC, decode_ocf

    total = 0
    for f in files:
        buf = open(f, "rb").read()
        assert buf[:4] == AVRO_MAGIC
        meta, recs = decode_ocf(buf, decode_sensor_record_at)
        assert meta["avro.codec"] == b"null"
        total += len(recs)
    assert total == src.count()
    back = spark.read.format("kstreams_avro_ocf").load(d)
    assert _rows(back) == _rows(src)
    # one partition per file
    assert back.rdd.getNumPartitions() == len(files)


def test_append_and_overwrite_modes(spark, tmp_path):
    spark.dataSource.register(AvroOcfDataSource)
    d = str(tmp_path / "ocf")
    a, b = _events(spark, 0, 200), _events(spark, 200, 300)
    a.coalesce(1).write.format("kstreams_avro_ocf").mode("append").save(d)
    b.coalesce(1).write.format("kstreams_avro_ocf").mode("append").save(d)
    back = spark.read.format("kstreams_avro_ocf").load(d)
    assert _rows(back) == _rows(a.unionByName(b))
    b.coalesce(1).write.format("kstreams_avro_ocf").mode("overwrite").save(d)
    assert _rows(spark.read.format("kstreams_avro_ocf").load(d)) == _rows(b)


def test_wrong_schema_rejected(spark, tmp_path):
    import pytest

    spark.dataSource.register(AvroOcfDataSource)
    df = load_table(spark, SF, "documents").select("doc_id", "text")
    with pytest.raises(Exception, match="sensor-event schema"):
        df.write.format("kstreams_avro_ocf").mode("append").save(
            str(tmp_path / "x")
        )
