"""North-star size gate: total encoded bytes <= Spark's own ORC-zlib size
on identical rows (BASELINE.json: "total encoded bytes must be <= the
reference ORC-compressed size").
"""

import subprocess

import pytest
from pyspark.sql import functions as F

from orc_rs_spark.encoder import encode_table
from orc_rs_spark.fixtures import token_df


def _du(path: str) -> int:
    return int(subprocess.run(["du", "-sb", path], capture_output=True, text=True).stdout.split()[0])


@pytest.mark.spark
def test_encoded_size_beats_spark_orc_zlib(spark, tmp_path):
    df = token_df(spark, 8000, seed=42, partitions=4).cache()
    df.count()
    # hash mode: deterministic row->chunk assignment (range sampling
    # re-draws per action, jittering sizes ~1.5% at this tiny scale)
    chunks = encode_table(df, partitions=4, partition_mode="hash")
    enc_bytes = int(chunks.agg(F.sum("enc_bytes")).collect()[0][0])
    df.write.mode("overwrite").option("compression", "zlib").orc(str(tmp_path / "orc"))
    orc_bytes = _du(str(tmp_path / "orc"))
    assert enc_bytes <= orc_bytes, f"{enc_bytes} > {orc_bytes} (ratio {enc_bytes/orc_bytes:.3f})"
    df.unpersist()
