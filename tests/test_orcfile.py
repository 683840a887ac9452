"""Wire-format parity against real ORC files.

Three independent proofs:
1. Tail parse of the reference's golden files matches the hard-coded
   expectations in /root/reference/src/tail.rs:232-744.
2. Decoded data agrees with each file's own footer ColumnStatistics, and
   demo-11 (Hive 0.11, RLEv1) decodes byte-identically to demo-12 (0.12,
   RLEv2) — same logical data through two generations of the format.
3. Spark's native JVM ORC reader and writer agree with this reader on
   golden files and on freshly written files across zlib/snappy/lz4/none.
"""

import numpy as np
import pyarrow.compute as pc
import pytest

from orc_rs_spark.orcfile import OrcFileReader, read_tail

GOLD = "/root/reference/src/test/test_files"

# (file, compression, version, rows, content_length, header_length, stride, columns)
# — the expectations hard-coded at /root/reference/src/tail.rs:243-744
TAIL_EXPECT = [
    ("TestOrcFile.testSnappy.orc", "snappy", (0, 12), 10000, 126061, 3, 10000,
     ["int1", "string1"]),
    ("nulls-at-end-snappy.orc", "snappy", (0, 12), 70000, 366347, 3, 10000,
     ["_col0", "_col1", "_col2", "_col3", "_col4", "_col5", "_col6"]),
    ("TestVectorOrcFile.testLz4.orc", "lz4", (0, 12), 10000, 120952, 3, 10000,
     ["x", "y", "z"]),
    ("TestVectorOrcFile.testZstd.0.12.orc", "zstd", (0, 12), 10000, 120734, 3, 10000,
     ["x", "y", "z"]),
    ("demo-11-zlib.orc", "zlib", (0, 11), 1920800, 396823, 3, 10000,
     ["_col" + str(i) for i in range(9)]),
    ("demo-12-zlib.orc", "zlib", (0, 12), 1920800, 45592, 3, 10000,
     ["_col" + str(i) for i in range(9)]),
    ("orc-file-11-format.orc", "none", (0, 11), 7500, 372542, 3, 10000,
     ["boolean1", "byte1", "short1", "int1", "long1", "float1", "double1",
      "bytes1", "string1", "middle", "list", "map", "ts", "decimal1"]),
]


@pytest.mark.parametrize("name,comp,ver,rows,content,hdr,stride,cols",
                         TAIL_EXPECT, ids=[t[0] for t in TAIL_EXPECT])
def test_tail_matches_reference_expectations(name, comp, ver, rows, content, hdr, stride, cols):
    t = read_tail(f"{GOLD}/{name}")
    assert t.postscript.compression == comp
    assert t.postscript.version == ver
    assert t.footer.number_of_rows == rows
    assert t.footer.content_length == content
    assert t.footer.header_length == hdr
    assert t.footer.row_index_stride == stride
    assert t.schema_names == cols


def _check_stats(reader, table):
    """Decoded data must reproduce the footer's own column statistics."""
    stats = reader.tail.footer.statistics
    types = reader.tail.footer.types
    for i, name in enumerate(table.column_names):
        col_id = types[0].subtypes[i]
        st = stats[col_id]
        col = table.column(name)
        if st.number_of_values is not None:
            assert table.num_rows - col.null_count == st.number_of_values, name
        if st.int_sum is not None:
            assert pc.sum(col).as_py() == st.int_sum, name
            assert pc.min(col).as_py() == st.int_min, name
            assert pc.max(col).as_py() == st.int_max, name
        if st.string_sum is not None:
            assert pc.sum(pc.utf8_length(col)).as_py() == st.string_sum, name
            mm = pc.min_max(col)
            assert mm["min"].as_py() == st.string_min, name
            assert mm["max"].as_py() == st.string_max, name
        if st.double_sum is not None:
            mm = pc.min_max(col)
            assert mm["min"].as_py() == pytest.approx(st.double_min), name
            assert mm["max"].as_py() == pytest.approx(st.double_max), name
        if st.true_count is not None:
            assert pc.sum(col.cast("int64")).as_py() == st.true_count, name


@pytest.mark.parametrize("name", [
    "demo-12-zlib.orc", "TestOrcFile.testSnappy.orc",
    "TestVectorOrcFile.testLz4.orc", "TestVectorOrcFile.testZstd.0.12.orc",
    "nulls-at-end-snappy.orc",
])
def test_decode_matches_own_footer_stats(name):
    r = OrcFileReader(f"{GOLD}/{name}")
    _check_stats(r, r.read_all())


def test_demo11_rlev1_equals_demo12_rlev2():
    """Same logical data, two format generations (RLEv1 vs RLEv2 paths)."""
    t11 = OrcFileReader(f"{GOLD}/demo-11-zlib.orc").read_all()
    t12 = OrcFileReader(f"{GOLD}/demo-12-zlib.orc").read_all()
    assert t11.num_rows == 1920800
    assert t11.equals(t12)


def test_complex_types_known_values():
    """orc-file-11-format.orc holds the canonical Apache ORC test content."""
    t = OrcFileReader(f"{GOLD}/orc-file-11-format.orc").read_all()
    assert t.num_rows == 7500
    row0 = t.slice(0, 1).to_pylist()[0]
    assert row0["boolean1"] is False
    assert row0["byte1"] == 1
    assert row0["short1"] == 1024
    assert row0["int1"] == 65536
    assert row0["long1"] == 9223372036854775807
    assert row0["bytes1"] == b"\x00\x01\x02\x03\x04"
    assert row0["string1"] == "hi"
    assert row0["middle"]["list"][0] == {"int1": 1, "string1": "bye"}
    assert row0["map"] == []
    assert str(row0["decimal1"]) == "12345678.6547456"
    assert str(row0["ts"]) == "2000-03-12 15:00:00"
    row1 = t.slice(1, 1).to_pylist()[0]
    assert dict(row1["map"])["chani"] == {"int1": 5, "string1": "chani"}
    assert str(row1["ts"]) == "2000-03-12 15:00:01"


def test_lzo_raises_clearly():
    """The one codec with no decoder (the reference does not ship LZO
    either); a clear error, never silent corruption."""
    from orc_rs_spark.orcfile.reader import orc_stream_decompress

    with pytest.raises(ValueError, match="lzo"):
        orc_stream_decompress(b"\x06\x00\x00abc", "lzo")


# ------------------------------------------------------ Spark cross-checks


@pytest.mark.spark
@pytest.mark.parametrize("name", [
    "demo-12-zlib.orc", "TestOrcFile.testSnappy.orc", "nulls-at-end-snappy.orc",
    "TestVectorOrcFile.testZstd.0.12.orc",
])
def test_golden_file_matches_spark_native_reader(spark, name):
    """Row-for-row parity with Spark's JVM ORC reader on golden files."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ours = OrcFileReader(f"{GOLD}/{name}").read_all()
    theirs = spark.read.orc(f"{GOLD}/{name}").toArrow()
    ours = ours.combine_chunks().sort_by(ours.column_names[0])
    theirs = theirs.cast(ours.schema).sort_by(ours.column_names[0])
    assert ours.equals(theirs.combine_chunks())


@pytest.mark.spark
@pytest.mark.parametrize("codec", ["zlib", "snappy", "lz4", "zstd", "none"])
def test_spark_written_orc_roundtrip(spark, codec, tmp_path):
    """Spark writes ORC with each codec; this reader must reproduce the
    source rows exactly (nulls, strings, floats, dates, arrays via ORC)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    import pyspark.sql.functions as F

    df = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select(
            "l_orderkey", "l_partkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_returnflag", "l_linestatus",
            F.col("l_shipdate").cast("date").alias("ship_date"),
            F.when(F.col("l_linenumber") % 3 == 0, None)
            .otherwise(F.col("l_returnflag")).alias("nullable_flag"),
        )
    )
    out = str(tmp_path / f"orc_{codec}")
    df.coalesce(1).write.option("compression", codec).orc(out)
    import glob

    [orc_file] = glob.glob(f"{out}/*.orc")
    ours = OrcFileReader(orc_file).read_all()
    expect = df.toArrow()
    keys = ["l_orderkey", "l_linenumber"]
    ours = ours.cast(expect.schema).combine_chunks().sort_by([(k, "ascending") for k in keys])
    expect = expect.combine_chunks().sort_by([(k, "ascending") for k in keys])
    assert ours.equals(expect)


@pytest.mark.spark
def test_distributed_orc_source(spark):
    """read_orc parallelizes by stripe and agrees with the local reader."""
    from orc_rs_spark.orcfile.spark_source import read_orc

    df = read_orc(spark, f"{GOLD}/TestOrcFile.testSnappy.orc")
    assert df.count() == 10000
    got = df.agg({"int1": "sum"}).collect()[0][0]
    local = OrcFileReader(f"{GOLD}/TestOrcFile.testSnappy.orc").read_all()
    assert got == pc.sum(local.column("int1")).as_py()


def test_snappy_lz4_kernel_edge_cases():
    """From-spec decoders: overlap copies, long literals, truncation."""
    from orc_rs_spark.kernels.lzblocks import lz4_block_decompress, snappy_decompress

    # snappy: literal + overlapping copy (RLE-style)
    # "ab" literal, then copy offset=2 len=8 -> "ababababab"
    payload = bytes([10]) + bytes([0b000001_00]) + b"ab" + bytes([(4 << 2) | 1 | (0 << 5), 2])
    assert snappy_decompress(payload) == b"ab" + b"abababab"
    # lz4: token lit=2 match=4(min) offset=2 -> "ababab" + tail literals
    blk = bytes([0x20 | 0x0]) + b"ab" + bytes([2, 0]) + bytes([0x10]) + b"z"
    assert lz4_block_decompress(blk) == b"ababab" + b"z"
    with pytest.raises(ValueError):
        snappy_decompress(bytes([200, 1]))  # truncated
    with pytest.raises(ValueError):
        lz4_block_decompress(bytes([0xF0]))  # truncated literal run


# ------------------------------------------------------------- ORC writer


def _writer_table():
    from decimal import Decimal

    import pyarrow as pa

    return pa.table(
        {
            "b": pa.array([True, False, None, True] * 250),
            "i8": pa.array([1, -2, None, 127] * 250, type=pa.int8()),
            "i16": pa.array([1000, -2000, None, 32000] * 250, type=pa.int16()),
            "i32": pa.array([100000, -7, None, 2**31 - 1] * 250, type=pa.int32()),
            "i64": pa.array([2**40, -(2**40), None, 42] * 250, type=pa.int64()),
            "f32": pa.array([1.5, -0.0, None, 3.25] * 250, type=pa.float32()),
            "f64": pa.array([1.5e300, -0.0, None, float("inf")] * 250),
            "s": pa.array(["hi", "", None, "unicode ✓"] * 250),
            "bin": pa.array([b"\x00\x01", b"", None, b"\xff"] * 250, type=pa.binary()),
            "d": pa.array([0, 10957, None, -3650] * 250, type=pa.int32()).cast(pa.date32()),
            "dec": pa.array(
                [Decimal("12345678901234567890.12345"), Decimal("-1.00000"), None,
                 Decimal("0.00001")],
                type=pa.decimal128(38, 5),
            ).take(pa.array([0, 1, 2, 3] * 250)),
            "lst": pa.array([[1, 2], [], None, [None, 5]] * 250, type=pa.list_(pa.int64())),
            "mp": pa.array([[("a", 1)], [], None, [("b", None)]] * 250,
                           type=pa.map_(pa.string(), pa.int32())),
            "st": pa.array([{"x": 1, "y": "a"}, {"x": None, "y": "b"}, None, {"x": 3, "y": None}] * 250,
                           type=pa.struct([("x", pa.int64()), ("y", pa.string())])),
        }
    )


@pytest.mark.parametrize("codec", ["zlib", "none", "snappy", "lz4", "zstd"])
def test_writer_roundtrip_own_reader(codec, tmp_path):
    """write_orc -> OrcFileReader reproduces the table exactly (all types,
    nulls at every level, multiple stripes)."""
    from orc_rs_spark.orcfile.writer import write_orc

    tbl = _writer_table()
    path = str(tmp_path / f"own_{codec}.orc")
    write_orc(tbl, path, compression=codec, stripe_rows=300)
    got = OrcFileReader(path).read_all()
    assert got.cast(tbl.schema).combine_chunks().equals(tbl.combine_chunks())


def test_writer_timestamps_roundtrip_own_reader(tmp_path):
    import pyarrow as pa

    from orc_rs_spark.orcfile.writer import write_orc

    vals = [
        "2020-06-01T12:34:56.789123456",
        "2015-01-01T00:00:00",
        "2014-12-31T23:59:59.5",  # rel -1 with nanos: the floor/trunc edge
        "2000-03-12T15:00:00.000000100",
        "1969-12-31T23:59:59",
        "1969-12-31T23:59:58.5",  # pre-1970 fractional: -1s reader fix-up
        None,
    ]
    arr = pa.array([np.datetime64(v, "ns") if v else None for v in vals], type=pa.timestamp("ns"))
    tbl = pa.table({"ts": arr})
    path = str(tmp_path / "ts.orc")
    write_orc(tbl, path)
    got = OrcFileReader(path).read_all()
    assert got.column("ts").combine_chunks().equals(arr)
    # fractional values in (-1s, 0) shift +1s — the JVM wire convention is
    # lossy there and this writer/reader pair is deliberately bug-compatible
    # (calibrated against Spark's own ORC writer+reader behavior)
    edge = pa.array([np.datetime64("1969-12-31T23:59:59.999", "ns")], type=pa.timestamp("ns"))
    path2 = str(tmp_path / "ts_edge.orc")
    write_orc(pa.table({"ts": edge}), path2)
    got2 = OrcFileReader(path2).read_all()
    assert got2.column("ts").to_pylist()[0] == np.datetime64("1970-01-01T00:00:00.999", "ns")


@pytest.mark.spark
@pytest.mark.parametrize("codec", ["zlib", "none", "snappy", "zstd"])
def test_writer_read_by_spark_native(spark, codec, tmp_path):
    """The cross-engine proof: Spark's JVM ORC reader reads OUR files."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from orc_rs_spark.orcfile.writer import write_orc

    tbl = _writer_table()
    path = str(tmp_path / f"for_spark_{codec}.orc")
    write_orc(tbl, path, compression=codec, stripe_rows=300)
    got = spark.read.orc(path).toArrow()
    assert got.cast(tbl.schema).combine_chunks().equals(tbl.combine_chunks())


@pytest.mark.spark
def test_writer_timestamp_convention_matches_spark(spark, tmp_path):
    """Calibrates the seconds/nanos split against the JVM implementation,
    including pre-2015 fractional values."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    import pyarrow as pa

    from orc_rs_spark.orcfile.writer import write_orc

    vals = [
        "2020-06-01T12:34:56.789123",
        "2014-12-31T23:59:59.5",
        "2000-03-12T15:00:00.0001",
        "1969-12-31T23:59:58.5",
        "1969-12-31T23:59:59.999",
    ]
    # the last value falls in the JVM wire convention's lossy (-1s, 0)
    # window: Spark's OWN writer+reader also maps it to 1970-01-01
    # 00:00:00.999 (verified), so bug-compatible output is the correct one
    expect = vals[:-1] + ["1970-01-01T00:00:00.999"]
    arr = pa.array([np.datetime64(v, "ns") for v in vals], type=pa.timestamp("ns"))
    exp = pa.array([np.datetime64(v, "ns") for v in expect], type=pa.timestamp("ns"))
    path = str(tmp_path / "ts_ours.orc")
    write_orc(pa.table({"ts": arr}), path)
    got = spark.read.orc(path).toArrow()
    assert got.column("ts").cast(pa.timestamp("ns")).combine_chunks().equals(exp)


@pytest.mark.spark
def test_distributed_orc_sink(spark, tmp_path):
    """Partition-parallel ORC write; Spark's native reader reads the dir."""
    from orc_rs_spark.orcfile.spark_source import write_orc_dir

    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_returnflag"
    ).repartition(4)
    out = str(tmp_path / "sink")
    n = write_orc_dir(df, out, compression="zlib")
    assert n == df.count()
    back = spark.read.orc(out)
    assert back.count() == n
    import pyspark.sql.functions as F

    a = df.agg(F.sum("l_quantity"), F.sum("l_orderkey")).collect()[0]
    b = back.agg(F.sum("l_quantity"), F.sum("l_orderkey")).collect()[0]
    assert list(a) == list(b)


def test_zstd_kernel_handcrafted_frame():
    """Hand-built frame: raw block + RLE block + skippable frame handling
    (compressed blocks are covered end-to-end by the golden/Spark tests)."""
    from orc_rs_spark.kernels.zstd import zstd_decompress

    frame = (
        (0xFD2FB528).to_bytes(4, "little")
        + bytes([0b00100000])  # single-segment, fcs_flag=0 -> 1-byte fcs
        + bytes([15])  # frame content size
        + (0 | (0 << 1) | (5 << 3)).to_bytes(3, "little") + b"hello"  # raw, not last
        + (1 | (1 << 1) | (10 << 3)).to_bytes(3, "little") + b"a"  # RLE, last
    )
    skippable = (0x184D2A50).to_bytes(4, "little") + (3).to_bytes(4, "little") + b"xyz"
    assert zstd_decompress(skippable + frame) == b"hello" + b"a" * 10
    with pytest.raises(ValueError, match="magic"):
        zstd_decompress(b"\x00\x01\x02\x03\x04\x05\x06\x07")


def test_writer_dictionary_strings(tmp_path):
    """Low-cardinality strings auto-select DICTIONARY_V2 (sorted symbol
    table, the R10 pattern); own reader reproduces values; encoding tag
    verified on the wire."""
    import pyarrow as pa

    from orc_rs_spark.orcfile import proto
    from orc_rs_spark.orcfile.reader import orc_stream_decompress
    from orc_rs_spark.orcfile.writer import write_orc

    vals = (["web", "books", "code", None, "wiki"] * 300)
    tbl = pa.table({"src": pa.array(vals, type=pa.string())})
    path = str(tmp_path / "dict.orc")
    write_orc(tbl, path)
    r = OrcFileReader(path)
    got = r.read_all()
    assert got.column("src").combine_chunks().equals(tbl.column("src").combine_chunks())
    stripe = r.tail.footer.stripes[0]
    with open(path, "rb") as f:
        f.seek(stripe.offset + stripe.index_length + stripe.data_length)
        sf = proto.StripeFooter.parse(
            orc_stream_decompress(f.read(stripe.footer_length), r.codec)
        )
    assert sf.columns[1].kind == "DICTIONARY_V2"
    assert sf.columns[1].dictionary_size == 4


@pytest.mark.spark
def test_writer_dictionary_read_by_spark(spark, tmp_path):
    import pyarrow as pa

    from orc_rs_spark.orcfile.writer import write_orc

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    vals = ["web", "books", "code", None, "wiki"] * 300
    tbl = pa.table({"src": pa.array(vals, type=pa.string())})
    path = str(tmp_path / "dict_spark.orc")
    write_orc(tbl, path)
    got = spark.read.orc(path).toArrow()
    assert got.column("src").combine_chunks().equals(tbl.column("src").combine_chunks())


def test_stripe_pruning_metadata_stats():
    """demo-11 has 385 stripes + a Metadata section; a narrow _col0 range
    must prune most stripes while keeping every matching row."""
    from orc_rs_spark.orcfile.reader import prune_stripes, read_stripe_statistics, read_tail

    path = f"{GOLD}/demo-11-zlib.orc"
    tail = read_tail(path)
    stats = read_stripe_statistics(path, tail)
    assert len(stats) == 385 and len(stats[0]) == 10
    keep = prune_stripes(path, "_col0", 1, 100, tail)
    assert 0 < len(keep) < 385
    r = OrcFileReader(path)
    got = 0
    import pyarrow.compute as pc

    for i in keep:
        b = r.read_stripe(i)
        got += pc.sum(
            pc.and_(pc.greater_equal(b.column("_col0"), 1), pc.less_equal(b.column("_col0"), 100))
        ).as_py() or 0
    full = r.read_all()
    expect = pc.sum(
        pc.and_(pc.greater_equal(full.column("_col0"), 1), pc.less_equal(full.column("_col0"), 100))
    ).as_py()
    assert got == expect and expect > 0


@pytest.mark.spark
def test_read_orc_with_predicate_pruning(spark):
    from orc_rs_spark.orcfile.spark_source import read_orc

    path = f"{GOLD}/demo-11-zlib.orc"
    df = read_orc(spark, path, predicate=("_col0", 1, 100))
    import pyspark.sql.functions as F

    got = df.where(F.col("_col0").between(1, 100)).count()
    full = spark.read.orc(path).where(F.col("_col0").between(1, 100)).count()
    assert got == full and full > 0


def test_union_column_roundtrip(tmp_path):
    """R13: ORC union encode+decode from spec (the reference ships a union
    reader but never wires it into its factory — src/column_reader/mod.rs:265).
    TAG byte-RLE stream + per-child value streams; dense-union arrow arrays
    on both ends."""
    import pyarrow as pa

    from orc_rs_spark.orcfile.writer import write_orc

    n = 900
    tags = pa.array([i % 3 for i in range(n)], type=pa.int8())
    offsets = pa.array([i // 3 for i in range(n)], type=pa.int32())
    ints = pa.array(list(range(300)), type=pa.int64())
    strs = pa.array([f"s{i}" for i in range(300)], type=pa.string())
    dbls = pa.array([i * 0.5 for i in range(300)], type=pa.float64())
    u = pa.UnionArray.from_dense(tags, offsets, [ints, strs, dbls])
    tbl = pa.table({"k": pa.array(range(n), type=pa.int64()), "u": u})
    path = str(tmp_path / "union.orc")
    write_orc(tbl, path, stripe_rows=400)  # multi-stripe
    got = OrcFileReader(path).read_all().combine_chunks()
    assert got.column("u").to_pylist() == u.to_pylist()
    assert got.column("k").to_pylist() == list(range(n))


@pytest.mark.spark
def test_read_orc_nested_golden(spark):
    """The stripe-parallel source handles the fully-nested golden file
    (struct/list/map/ts/decimal) and matches the local reader."""
    from orc_rs_spark.orcfile.spark_source import read_orc

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = read_orc(spark, f"{GOLD}/orc-file-11-format.orc")
    assert df.count() == 7500
    import pyspark.sql.functions as F

    row = df.select(
        F.sum("int1").alias("s"),
        F.sum(F.size("list")).alias("l"),
        F.count(F.col("middle.list")).alias("m"),
    ).collect()[0]
    local = OrcFileReader(f"{GOLD}/orc-file-11-format.orc").read_all()
    import pyarrow.compute as pc

    assert row["s"] == pc.sum(local.column("int1")).as_py()
    assert row["m"] == 7500


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as hst  # noqa: E402


@given(
    rows=hst.lists(
        hst.tuples(
            hst.one_of(hst.none(), hst.integers(-(2**62), 2**62)),
            hst.one_of(hst.none(), hst.text(max_size=12)),
            hst.one_of(hst.none(), hst.floats(allow_nan=False, width=64)),
            hst.one_of(hst.none(), hst.lists(hst.one_of(hst.none(), hst.integers(-100, 100)), max_size=4)),
        ),
        min_size=1,
        max_size=50,
    ),
    codec=hst.sampled_from(["zlib", "none", "snappy", "lz4", "zstd"]),
)
@settings(max_examples=40, deadline=None)
def test_writer_reader_fuzz(rows, codec, tmp_path_factory):
    """Property: any (nullable) table of longs/strings/doubles/int-lists
    round-trips through the ORC writer + reader bit-exactly — under every
    block codec, including the round-5 from-spec/pyarrow encoders."""
    import pyarrow as pa

    from orc_rs_spark.orcfile.writer import write_orc

    tbl = pa.table({
        "i": pa.array([r[0] for r in rows], type=pa.int64()),
        "s": pa.array([r[1] for r in rows], type=pa.string()),
        "f": pa.array([r[2] for r in rows], type=pa.float64()),
        "l": pa.array([r[3] for r in rows], type=pa.list_(pa.int64())),
    })
    path = str(tmp_path_factory.mktemp("fuzz") / "f.orc")
    write_orc(tbl, path, compression=codec, stripe_rows=17)
    got = OrcFileReader(path).read_all()
    assert got.cast(tbl.schema).combine_chunks().equals(tbl.combine_chunks())


def test_reader_corruption_paths(tmp_path):
    """Corrupted inputs fail loudly with clear errors, never silently."""
    import pyarrow as pa

    from orc_rs_spark.orcfile.writer import write_orc

    tbl = pa.table({"a": pa.array(range(100), type=pa.int64())})
    path = str(tmp_path / "ok.orc")
    write_orc(tbl, path)
    data = open(path, "rb").read()
    # bad magic in postscript
    bad = data[:-4] + b"XXX" + data[-1:]
    p_bad = str(tmp_path / "bad_magic.orc")
    open(p_bad, "wb").write(bad)
    with pytest.raises(ValueError, match="magic"):
        read_tail(p_bad)
    # truncated tail (footer length points past file start)
    p_tr = str(tmp_path / "trunc.orc")
    open(p_tr, "wb").write(data[-30:])
    with pytest.raises(Exception):
        read_tail(p_tr)
    # zero-length file
    p_zero = str(tmp_path / "zero.orc")
    open(p_zero, "wb").write(b"")
    with pytest.raises(Exception):
        read_tail(p_zero)


def test_writer_rejects_nullable_union(tmp_path):
    import pyarrow as pa

    from orc_rs_spark.orcfile.writer import write_orc

    types = pa.array([0, 1], type=pa.int8())
    offsets = pa.array([0, 0], type=pa.int32())
    u = pa.UnionArray.from_dense(types, offsets, [pa.array([1], type=pa.int64()),
                                                  pa.array(["x"], type=pa.string())])
    # wrap with a validity mask via a struct trick is awkward; unions with
    # nulls are rare — construct one via take with a null index
    tbl = pa.table({"u": u})
    path = str(tmp_path / "u.orc")
    write_orc(tbl, path)  # non-null unions fine
    got = OrcFileReader(path).read_all()
    assert got.column("u").to_pylist() == [1, "x"]


def test_empty_table_roundtrip(tmp_path):
    import pyarrow as pa

    from orc_rs_spark.orcfile.writer import write_orc

    tbl = pa.table({"a": pa.array([], type=pa.int64()), "s": pa.array([], type=pa.string())})
    path = str(tmp_path / "empty.orc")
    write_orc(tbl, path)
    got = OrcFileReader(path).read_all()
    assert got.num_rows == 0
    assert got.schema.equals(tbl.schema)


def test_column_projection_local():
    """Stream-level projection: only requested columns decode; bytes of
    unselected streams are never decompressed."""
    t = OrcFileReader(f"{GOLD}/demo-12-zlib.orc").read_all(columns=["_col0", "_col6"])
    assert t.column_names == ["_col0", "_col6"]
    assert t.num_rows == 1920800
    full = OrcFileReader(f"{GOLD}/demo-12-zlib.orc").read_all()
    assert t.column("_col0").equals(full.column("_col0"))
    with pytest.raises(ValueError, match="unknown ORC columns"):
        OrcFileReader(f"{GOLD}/demo-12-zlib.orc").read_all(columns=["nope"])


@pytest.mark.spark
def test_column_projection_spark(spark):
    from orc_rs_spark.orcfile.spark_source import read_orc

    df = read_orc(spark, f"{GOLD}/TestOrcFile.testSnappy.orc", columns=["int1"])
    assert df.columns == ["int1"]
    import pyspark.sql.functions as F

    got = df.agg(F.sum("int1")).collect()[0][0]
    local = OrcFileReader(f"{GOLD}/TestOrcFile.testSnappy.orc").read_all()
    assert got == pc.sum(local.column("int1")).as_py()


def test_stripe_pruning_string_stats():
    """String min/max stripe stats prune too (demo-11 _col1 is VARCHAR)."""
    from orc_rs_spark.orcfile.reader import prune_stripes

    path = f"{GOLD}/demo-11-zlib.orc"
    keep_all = prune_stripes(path, "_col1", "A", "zzzz")
    assert len(keep_all) == 385  # full range keeps everything
    keep_none = prune_stripes(path, "_col1", "\x7f\x7f", "\x7f\x7f\x7f")
    assert len(keep_none) < 385  # beyond-max range prunes


@pytest.mark.spark
def test_read_orc_predicate_plus_projection(spark):
    from orc_rs_spark.orcfile.spark_source import read_orc

    path = f"{GOLD}/demo-11-zlib.orc"
    import pyspark.sql.functions as F

    df = read_orc(spark, path, predicate=("_col0", 1, 50), columns=["_col0", "_col6"])
    assert df.columns == ["_col0", "_col6"]
    got = df.where(F.col("_col0").between(1, 50)).count()
    full = spark.read.orc(path).where(F.col("_col0").between(1, 50)).count()
    assert got == full and full > 0


def test_scan_partitions_scales_with_cluster():
    """The old hard cap (256) squeezed millions of stripes through 256
    concurrent tasks on any cluster; scan now follows defaultParallelism."""
    from orc_rs_spark.orcfile.spark_source import scan_partitions

    assert scan_partitions(10, 32) == 10  # few stripes: one task each
    assert scan_partitions(300, 8) == 32  # 4x core count
    assert scan_partitions(1_000_000, 1000) == 4000  # was 256 before
    assert scan_partitions(0, 32) == 1
    assert scan_partitions(500, 256) == 500


@pytest.mark.spark
def test_read_orc_task_count_follows_parallelism(spark, tmp_path):
    """A >256-stripe scan gets one task per stripe up to 4x cluster cores."""
    import pyarrow as pa

    from orc_rs_spark.orcfile.spark_source import read_orc, scan_partitions
    from orc_rs_spark.orcfile.writer import write_orc

    n = 300 * 8
    tbl = pa.table({"a": pa.array(np.arange(n, dtype=np.int64))})
    path = str(tmp_path / "many_stripes.orc")
    write_orc(tbl, path, compression="none", stripe_rows=8)  # 300 stripes
    assert len(read_tail(path).footer.stripes) == 300
    df = read_orc(spark, path)
    dp = spark.sparkContext.defaultParallelism
    assert df.rdd.getNumPartitions() == scan_partitions(300, dp)
    assert df.count() == n


def test_orc_writer_streams_stripes(tmp_path):
    """Incremental sink path: stripes flush as batches arrive; peak buffer
    stays under one stripe + one batch across a 100-batch write."""
    import pyarrow as pa

    from orc_rs_spark.orcfile.writer import OrcWriter

    path = str(tmp_path / "streamed.orc")
    schema = pa.schema([pa.field("a", pa.int64()), pa.field("s", pa.string())])
    w = OrcWriter(path, schema, compression="zlib", stripe_rows=4096)
    for i in range(100):  # 100 batches x 1000 rows
        a = np.arange(i * 1000, (i + 1) * 1000, dtype=np.int64)
        b = pa.record_batch(
            [pa.array(a), pa.array([f"s{v % 7}" for v in a])], schema=schema
        )
        w.write_batch(b)
    w.close()
    assert w.max_buffered_rows < 4096 + 1000  # bounded, not whole-partition
    r = OrcFileReader(path)
    assert len(r.tail.footer.stripes) == -(-100_000 // 4096)
    got = r.read_all()
    assert got.num_rows == 100_000
    av = got.column("a").to_numpy()
    assert np.array_equal(av, np.arange(100_000, dtype=np.int64))
    assert got.column("s")[12345].as_py() == f"s{12345 % 7}"


# ----------------------------------------------------- ROW_INDEX row groups


def _mixed_indexed_table(n=50_000):
    import pyarrow as pa

    return pa.table({
        "k": pa.array(np.arange(n, dtype=np.int64)),
        "s": pa.array([None if i % 13 == 0 else f"word{i % 97}" for i in range(n)]),
        "f": pa.array(np.sin(np.arange(n)).astype(np.float64)),
        "b": pa.array((np.arange(n) % 3 == 0)),
        "toks": pa.array([list(range(i % 5)) for i in range(n)], type=pa.list_(pa.int32())),
        "dct": pa.array([f"cat{i % 7}" for i in range(n)]),
    })


@pytest.fixture(scope="module")
def indexed_orc(tmp_path_factory):
    from orc_rs_spark.orcfile.writer import write_orc

    path = str(tmp_path_factory.mktemp("rowidx") / "indexed.orc")
    write_orc(_mixed_indexed_table(), path, compression="zlib",
              stripe_rows=20000, row_index_stride=1000)
    return path


def test_row_index_written_and_parsed(indexed_orc):
    r = OrcFileReader(indexed_orc)
    assert r.tail.footer.row_index_stride == 1000
    assert r.tail.footer.stripes[0].index_length > 0
    idx = r.read_row_index(0)
    # one RowIndex per column (root included), one entry per group
    assert set(idx) == set(range(len(r.tail.footer.types)))
    assert all(len(v) == 20 for v in idx.values())


def test_row_group_decode_equals_slices(indexed_orc):
    import pyarrow as pa

    r = OrcFileReader(indexed_orc)
    full = pa.Table.from_batches([r.read_stripe(0)])
    for g in (0, 7, 19):
        got = r.read_stripe(0, row_groups=[g])
        exp = full.slice(g * 1000, 1000)
        for c in full.column_names:
            assert got.column(c).to_pylist() == exp.column(c).to_pylist(), (g, c)
    # a multi-group run plus the final partial stripe's last group
    got = r.read_stripe(2, row_groups=[2, 3, 4, 9])
    full2 = pa.Table.from_batches([r.read_stripe(2)])
    import pyarrow as pa2

    exp2 = pa2.concat_tables([full2.slice(2000, 3000), full2.slice(9000, 1000)])
    assert got.num_rows == 4000
    assert got.column("k").to_pylist() == exp2.column("k").to_pylist()


def test_row_group_decode_is_positional_not_fallback(indexed_orc):
    """The group path must actually use positions (a silent fallback would
    still produce right answers but decode the whole stripe)."""
    import pyarrow as pa

    r = OrcFileReader(indexed_orc)
    reader, stripe = r._open_stripe(0)
    names, subs = r._select(None)
    index = reader.row_index()
    stride = r.tail.footer.row_index_stride
    n_groups = -(-stripe.number_of_rows // stride)
    for sub in subs:
        r._check_group_support(reader, index, sub, n_groups)  # raises on fallback path
    batches = list(r._decode_group_runs(reader, stripe, names, subs, [5], 1))
    assert len(batches) == 1 and batches[0].num_rows == 1000
    assert batches[0].column(0).to_pylist() == list(range(5000, 6000))


def test_prune_row_groups_minmax(indexed_orc):
    r = OrcFileReader(indexed_orc)
    assert r.prune_row_groups(0, "k", 4500, 5500) == [4, 5]
    assert r.prune_row_groups(0, "k", 10**9, 2 * 10**9) == []
    # string column stats prune too
    keep = r.prune_row_groups(0, "dct", "cat3", "cat3")
    assert keep == list(range(20))  # every group holds every cat -> no prune


def test_our_metadata_stripe_stats_prune(indexed_orc):
    """The writer now emits the Metadata section, so stripe pruning works
    on our own files (round 2: JVM files only)."""
    from orc_rs_spark.orcfile.reader import prune_stripes, read_stripe_statistics

    stats = read_stripe_statistics(indexed_orc)
    assert len(stats) == 3
    assert prune_stripes(indexed_orc, "k", 25000, 26000) == [1]
    assert prune_stripes(indexed_orc, "k", 0, 10) == [0]


def test_read_stripe_batches_bounded(indexed_orc):
    r = OrcFileReader(indexed_orc)
    sizes = [b.num_rows for b in r.read_stripe_batches(0, batch_rows=3000)]
    assert sum(sizes) == 20000
    assert max(sizes) <= 3000
    # group-restricted batching
    sel = [b.num_rows for b in r.read_stripe_batches(0, batch_rows=2000, row_groups=[1, 2, 3, 4, 10])]
    assert sum(sel) == 5000 and max(sel) <= 2000


@pytest.mark.parametrize("name", [
    "TestOrcFile.testSnappy.orc", "TestVectorOrcFile.testLz4.orc",
    "TestVectorOrcFile.testZstd.0.12.orc", "demo-12-zlib.orc",
    "demo-11-zlib.orc", "nulls-at-end-snappy.orc", "orc-file-11-format.orc",
])
def test_golden_row_index_positional_decode(name):
    """Group-by-group positional decode of JVM-written files equals the
    full decode — validates our position semantics (compressed chunk
    offsets, RLE run skips, PRESENT bit offsets) against the Java writer."""
    import pyarrow as pa

    r = OrcFileReader(f"{GOLD}/{name}")
    reader, stripe = r._open_stripe(0)
    names, subs = r._select(None)
    index = reader.row_index()
    stride = r.tail.footer.row_index_stride
    n_groups = -(-stripe.number_of_rows // stride)
    for sub in subs:
        r._check_group_support(reader, index, sub, n_groups)
    got = pa.Table.from_batches(
        list(r._decode_group_runs(reader, stripe, names, subs, list(range(n_groups)), 1))
    )
    full = pa.Table.from_batches([r.read_stripe(0)])
    for c in full.column_names:
        assert got.column(c).to_pylist() == full.column(c).to_pylist(), (name, c)


@pytest.mark.spark
def test_jvm_reads_our_indexed_file_with_pushdown(spark, indexed_orc):
    """Spark's JVM reader consumes our ROW_INDEX positions during filtered
    reads (orc.filterPushdown seeks via recorded positions)."""
    spark.conf.set("spark.sql.orc.filterPushdown", "true")
    df = spark.read.orc(indexed_orc)
    assert df.count() == 50000
    rows = df.filter("k >= 25500 AND k < 26500").orderBy("k").collect()
    assert len(rows) == 1000
    assert rows[0].k == 25500 and rows[-1].k == 26499
    assert rows[0].toks == list(range(25500 % 5))
    assert rows[17].s == (None if (25517 % 13 == 0) else f"word{25517 % 97}")
    n_cat = df.filter("dct = 'cat3' AND k < 100").count()
    assert n_cat == len([i for i in range(100) if i % 7 == 3])


@pytest.mark.spark
def test_read_orc_row_group_pruning(spark, indexed_orc):
    """read_orc(predicate=...) prunes stripes AND row groups; result equals
    an unpruned scan filtered row-level."""
    from orc_rs_spark.orcfile.spark_source import read_orc

    df = read_orc(spark, indexed_orc, predicate=("k", 25500, 26499))
    got = df.filter("k BETWEEN 25500 AND 26499").orderBy("k").collect()
    assert len(got) == 1000
    assert [r.k for r in got[:3]] == [25500, 25501, 25502]
    # pruned scan reads only the covering groups, not the whole file
    assert df.count() < 5000  # 2 x 1000-row groups kept (+ boundary slack)


# ----------------------------------------------------- varchar/char + misc


def test_varchar_char_maximum_length(tmp_path):
    import pyarrow as pa

    from orc_rs_spark.orcfile.spark_source import orc_schema_ddl
    from orc_rs_spark.orcfile.writer import write_orc

    path = str(tmp_path / "vc.orc")
    schema = pa.schema([
        pa.field("v", pa.string(), metadata={b"orc_type": b"varchar(5)"}),
        pa.field("c", pa.string(), metadata={b"orc_type": b"char(3)"}),
        pa.field("k", pa.int32()),
    ])
    tbl = pa.table(
        {"v": ["ab", "cdefg", "x"], "c": ["abc", "def", "ghi"], "k": [1, 2, 3]},
        schema=schema,
    )
    write_orc(tbl, path)
    assert orc_schema_ddl(path) == "v varchar(5), c char(3), k int"
    r = OrcFileReader(path)
    kinds = [(t.kind, t.maximum_length) for t in r.tail.footer.types]
    assert ("varchar", 5) in kinds and ("char", 3) in kinds
    assert r.read_all().column("v").to_pylist() == ["ab", "cdefg", "x"]


@pytest.mark.spark
def test_varchar_file_scans_as_string(spark, tmp_path):
    import pyarrow as pa

    from orc_rs_spark.orcfile.spark_source import read_orc
    from orc_rs_spark.orcfile.writer import write_orc

    path = str(tmp_path / "vc2.orc")
    schema = pa.schema([pa.field("v", pa.string(), metadata={b"orc_type": b"varchar(5)"})])
    write_orc(pa.table({"v": ["aa", "bb"]}, schema=schema), path)
    df = read_orc(spark, path)  # scan DDL degrades to string (Arrow has no varchar)
    assert df.schema.simpleString() == "struct<v:string>"
    assert sorted(r.v for r in df.collect()) == ["aa", "bb"]
    assert spark.read.orc(path).schema.simpleString() == "struct<v:string>"


def test_encrypted_footer_rejected(tmp_path):
    from orc_rs_spark.orcfile import writer as W

    footer = W._field_varint(1, 3) + W._field_varint(2, 3)
    # one long column type tree: struct root + long child
    footer += W._field_bytes(4, W._field_varint(1, 12) + W._field_packed(2, [1]) + W._field_bytes(3, b"x"))
    footer += W._field_bytes(4, W._field_varint(1, 4))
    footer += W._field_varint(6, 0)
    footer += W._field_bytes(10, b"")  # Footer.encryption present
    ps = W._field_varint(1, len(footer)) + W._field_varint(2, 0)
    ps += W._field_packed(4, [0, 12]) + W._field_varint(5, 0)
    ps += W._field_bytes(8000, b"ORC")
    blob = b"ORC" + footer + ps + bytes([len(ps)])
    path = tmp_path / "enc.orc"
    path.write_bytes(blob)
    with pytest.raises(ValueError, match="[Ee]ncrypted"):
        read_tail(str(path))


# ----------------------------------------------------- byte-range sources


def test_memory_source_reads_identical(indexed_orc):
    """Reader over bytes (MemorySource) == reader over the file path."""
    from orc_rs_spark.orcfile import MemorySource

    blob = open(indexed_orc, "rb").read()
    rm = OrcFileReader(MemorySource(blob))
    rf = OrcFileReader(indexed_orc)
    a = rm.read_all()
    b = rf.read_all()
    assert a.num_rows == b.num_rows
    assert a.column("k").to_pylist() == b.column("k").to_pylist()
    got = rm.read_stripe(0, row_groups=[4])
    assert got.column("k").to_pylist() == list(range(4000, 5000))


def test_reader_issues_bounded_range_reads(indexed_orc):
    """Every reader access is a positional (offset, length) range read —
    an object-store source slots in with no whole-file scans. A pruned
    point lookup must NOT read the whole file."""
    import os

    class CountingSource:
        def __init__(self, path):
            self.path = path
            self.reads = []  # (offset, length)

        def size(self):
            return os.path.getsize(self.path)

        def read_at(self, offset, length):
            self.reads.append((offset, length))
            with open(self.path, "rb") as f:
                f.seek(offset)
                return f.read(length)

    src = CountingSource(indexed_orc)
    r = OrcFileReader(src)
    tail_reads = list(src.reads)
    assert len(tail_reads) <= 2  # speculative 16 KiB (+1 if footer larger)
    groups = r.prune_row_groups(1, "k", 25500, 25700)
    assert groups == [5]
    batch = r.read_stripe(1, row_groups=groups)
    assert batch.num_rows == 1000
    total_read = sum(ln for _, ln in src.reads)
    fsize = src.size()
    # index region + one stripe's bytes, never a whole-file scan pattern
    assert all(ln < fsize for _, ln in src.reads)
    assert total_read < fsize


# ----------------------------------------------------- bloom filter index


@pytest.fixture(scope="module")
def jvm_bloom_orc(tmp_path_factory):
    """A JVM-written ORC file with bloom filters — ground truth for the
    hash contracts."""
    import glob as _glob

    from orc_rs_spark.session import get_spark

    s = get_spark(master="local[2]", shuffle_partitions=2, app_name="bloom-gold")
    d = str(tmp_path_factory.mktemp("bloomjvm") / "g")
    df = s.range(0, 30000).selectExpr(
        "id AS k", "concat('word', cast(id % 997 AS string)) AS s"
    )
    df.coalesce(1).write.option("orc.bloom.filter.columns", "k,s").option(
        "orc.row.index.stride", "10000"
    ).orc(d)
    return sorted(_glob.glob(d + "/*.orc"))[0]


@pytest.mark.spark
def test_bloom_hashes_match_java_writer(jvm_bloom_orc):
    """Zero false negatives probing Java-written blooms proves our
    Thomas Wang (SIGNED shifts — bytecode-verified) and Murmur3 hash64
    implementations match the Java writer bit-for-bit."""
    r = OrcFileReader(jvm_bloom_orc)
    bl = r.read_bloom_index(0)
    k_col, s_col = 1, 2
    for g in range(3):
        lo = g * 10000
        assert all(bl[k_col][g].test_long(v) for v in range(lo, lo + 10000, 37))
        assert all(
            bl[s_col][g].test_bytes(f"word{i}".encode()) for i in range(0, 997, 7)
        )
    # absent values overwhelmingly rejected (fpp 0.05)
    fp = sum(bl[k_col][0].test_long(v) for v in range(10**6, 10**6 + 1000))
    assert fp < 100
    # and prune_row_groups drives the probe end-to-end on the Java file
    assert r.prune_row_groups(0, "k", 25000, 25000) == [2]
    assert r.prune_row_groups(0, "s", "wordXYZ", "wordXYZ") == []


@pytest.mark.spark
def test_our_blooms_roundtrip_and_prune(spark, tmp_path):
    import pyarrow as pa

    from orc_rs_spark.orcfile.writer import write_orc

    p = str(tmp_path / "b.orc")
    n = 30000
    tbl = pa.table({
        "k": pa.array(np.arange(n, dtype=np.int64)),
        "s": pa.array([f"word{i % 997}" for i in range(n)]),
    })
    write_orc(tbl, p, stripe_rows=30000, row_index_stride=1000,
              bloom_columns=["k", "s"])
    r = OrcFileReader(p)
    assert r.prune_row_groups(0, "k", 5555, 5555) == [5]
    # string stats can't prune (every group spans word0..word996
    # lexically) but the bloom rejects an absent value outright
    assert r.prune_row_groups(0, "s", "word_nope", "word_nope") == []
    assert len(r.prune_row_groups(0, "s", "word123", "word123")) == 30
    assert r.read_all().num_rows == n  # data region untouched by blooms
    # JVM consumes our blooms during pushdown without row loss
    spark.conf.set("spark.sql.orc.filterPushdown", "true")
    df = spark.read.orc(p)
    assert df.filter("k = 5555").count() == 1
    assert df.filter("s = 'word123'").count() == len([i for i in range(n) if i % 997 == 123])
    assert df.filter("s = 'word_nope'").count() == 0


def test_bloom_type_dispatch():
    from orc_rs_spark.kernels.orc_bloom import OrcBloom
    from orc_rs_spark.orcfile.reader import _bloom_test

    bf = OrcBloom(640, 3)
    bf.add_longs(np.array([42, -7], dtype=np.int64))
    bf.add_bytes_many([b"hello"])
    assert _bloom_test(bf, 42) and _bloom_test(bf, -7)
    assert _bloom_test(bf, "hello") and _bloom_test(bf, b"hello")
    assert not _bloom_test(bf, 4343)
    assert not _bloom_test(bf, "absent-string")
    assert _bloom_test(bf, True)  # booleans never prune


@pytest.mark.spark
def test_read_orc_rejects_mixed_schemas(spark, tmp_path):
    import pyarrow as pa

    from orc_rs_spark.orcfile.spark_source import read_orc
    from orc_rs_spark.orcfile.writer import write_orc

    write_orc(pa.table({"a": pa.array([1, 2], type=pa.int64())}),
              str(tmp_path / "x1.orc"))
    write_orc(pa.table({"a": pa.array(["s"], type=pa.string())}),
              str(tmp_path / "x2.orc"))
    with pytest.raises(ValueError, match="schema mismatch"):
        read_orc(spark, [str(tmp_path / "x1.orc"), str(tmp_path / "x2.orc")])


def test_column_projection_prunes_io(indexed_orc):
    """Selecting 1 of 6 columns must READ (not just decode) far fewer
    bytes: stream ranges of unselected columns are never fetched."""
    import os

    class CountingSource:
        def __init__(self, path):
            self.path = path
            self.bytes_read = 0

        def size(self):
            return os.path.getsize(self.path)

        def read_at(self, offset, length):
            self.bytes_read += length
            with open(self.path, "rb") as f:
                f.seek(offset)
                return f.read(length)

    full_src = CountingSource(indexed_orc)
    OrcFileReader(full_src).read_stripe(0)
    one_src = CountingSource(indexed_orc)
    batch = OrcFileReader(one_src).read_stripe(0, columns=["k"])
    assert batch.num_rows == 20000 and batch.column_names == ["k"]
    assert one_src.bytes_read < full_src.bytes_read / 2, (
        one_src.bytes_read, full_src.bytes_read
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_row_group_decode_fuzz(seed, tmp_path):
    """Randomized schema/content fuzz: positional group decode must equal
    full-decode slices for every random group selection, across nulls,
    dictionaries, floats, lists and strings."""
    import pyarrow as pa

    from orc_rs_spark.orcfile.writer import write_orc

    rng = np.random.default_rng(seed)
    n = int(rng.integers(3000, 12000))
    stride = int(rng.choice([512, 1000, 1777]))

    def maybe_null(values, p):
        return [None if rng.random() < p else v for v in values]

    tbl = pa.table({
        "i": pa.array(maybe_null(rng.integers(-2**40, 2**40, n).tolist(), 0.1),
                      type=pa.int64()),
        "sm": pa.array(maybe_null(rng.integers(0, 7, n).tolist(), 0.0),
                       type=pa.int16()),
        "f": pa.array(maybe_null(rng.standard_normal(n).tolist(), 0.2),
                      type=pa.float64()),
        "s": pa.array(maybe_null([f"v{int(x)}" for x in rng.zipf(1.5, n)], 0.15)),
        "b": pa.array(maybe_null((rng.random(n) < 0.5).tolist(), 0.05)),
        "lst": pa.array([rng.integers(0, 100, int(rng.integers(0, 6))).tolist()
                         for _ in range(n)], type=pa.list_(pa.int32())),
    })
    p = str(tmp_path / f"fuzz{seed}.orc")
    write_orc(tbl, p, stripe_rows=n, row_index_stride=stride,
              compression=str(rng.choice(["zlib", "none"])))
    r = OrcFileReader(p)
    full = pa.Table.from_batches([r.read_stripe(0)])
    n_groups = -(-n // stride)
    for _ in range(4):
        k = int(rng.integers(1, n_groups + 1))
        sel = sorted(rng.choice(n_groups, size=k, replace=False).tolist())
        got = r.read_stripe(0, row_groups=sel)
        from orc_rs_spark.orcfile.reader import _runs

        parts = [full.slice(g0 * stride, min(gl * stride, n - g0 * stride))
                 for g0, gl in _runs(sel)]
        exp = pa.concat_tables(parts)
        assert got.num_rows == exp.num_rows
        for c in tbl.column_names:
            assert got.column(c).to_pylist() == exp.column(c).to_pylist(), (seed, sel, c)


@pytest.mark.spark
def test_read_orc_conjunctive_predicates(spark, tmp_path):
    """A predicate LIST prunes with AND semantics at both tiers: the
    group set is the intersection of each predicate's surviving groups."""
    import pyarrow as pa

    from orc_rs_spark.orcfile.spark_source import read_orc
    from orc_rs_spark.orcfile.writer import write_orc

    n = 40000
    tbl = pa.table({
        "k": pa.array(np.arange(n, dtype=np.int64)),
        "r": pa.array(np.arange(n, dtype=np.int64)[::-1]),  # reversed: opposite order
    })
    p = str(tmp_path / "conj.orc")
    write_orc(tbl, p, stripe_rows=40000, row_index_stride=1000)
    # k in [5000,6000) selects groups 5-6; r in [5000,6000) selects 33-35;
    # conjunction is empty -> zero rows decoded, zero scanned
    both = read_orc(spark, p, predicate=[("k", 5000, 5999), ("r", 5000, 5999)])
    assert both.count() == 0
    # overlapping conjunction: k in [10000,11000) AND r >= 28000 (same rows)
    df = read_orc(spark, p, predicate=[("k", 10000, 10999), ("r", 29000, 29999)])
    rows = df.filter("k between 10000 and 10999 and r between 29000 and 29999")
    assert rows.count() == 1000
    assert df.count() <= 2000  # only the covering groups decode


def test_date_timestamp_group_pruning(tmp_path):
    """DateStatistics (epoch days) and TimestampStatistics (UTC millis)
    round the stats matrix out: time-range scans prune row groups."""
    import datetime as dt

    import pyarrow as pa

    from orc_rs_spark.orcfile.writer import write_orc

    n = 10000
    base = dt.date(2026, 1, 1)
    days = pa.array([base + dt.timedelta(days=i // 100) for i in range(n)],
                    type=pa.date32())
    t0 = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    ts = pa.array([t0 + dt.timedelta(minutes=i) for i in range(n)],
                  type=pa.timestamp("us", tz="UTC"))
    p = str(tmp_path / "dt.orc")
    write_orc(pa.table({"d": days, "t": ts}), p,
              stripe_rows=n, row_index_stride=1000)
    r = OrcFileReader(p)
    # rows with d == 2026-01-31 live at i in [3000, 3100) -> group 3 only
    keep_d = r.prune_row_groups(0, "d", dt.date(2026, 1, 31), dt.date(2026, 1, 31))
    assert keep_d == [3]
    # timestamp range minutes [5500, 5600) -> group 5
    lo = t0 + dt.timedelta(minutes=5500)
    hi = t0 + dt.timedelta(minutes=5599)
    keep_t = r.prune_row_groups(0, "t", lo, hi)
    assert keep_t == [5]
    # far-future range prunes everything
    assert r.prune_row_groups(0, "t", t0 + dt.timedelta(days=900),
                              t0 + dt.timedelta(days=901)) == []
    # decoded values round-trip intact
    got = r.read_stripe(0, row_groups=[3])
    assert got.column("d")[0].as_py() == dt.date(2026, 1, 31)


@pytest.mark.spark
def test_jvm_filtered_read_nested_nullable_indexed(spark, tmp_path):
    """The hardest position case: nested NULLABLE columns in an indexed
    file — child PRESENT streams are continuous bit streams whose group
    positions carry in-byte bit offsets; the JVM reader must seek them
    correctly during filtered reads, and our positional decode must match
    full-decode slices."""
    import pyarrow as pa

    from orc_rs_spark.orcfile.writer import write_orc

    n = 30000
    lst = pa.array(
        [[None if (i + j) % 7 == 0 else f"w{j}" for j in range(i % 4)] for i in range(n)],
        type=pa.list_(pa.string()),
    )
    st = pa.array(
        [{"a": None if i % 5 == 0 else i, "b": f"s{i % 3}"} for i in range(n)],
        type=pa.struct([("a", pa.int64()), ("b", pa.string())]),
    )
    tbl = pa.table({"k": pa.array(np.arange(n, dtype=np.int64)), "lst": lst, "st": st})
    p = str(tmp_path / "nested_idx.orc")
    write_orc(tbl, p, stripe_rows=n, row_index_stride=1000)

    r = OrcFileReader(p)
    full = pa.Table.from_batches([r.read_stripe(0)])
    got = r.read_stripe(0, row_groups=[13])
    for c in tbl.column_names:
        assert got.column(c).to_pylist() == full.slice(13000, 1000).column(c).to_pylist(), c

    spark.conf.set("spark.sql.orc.filterPushdown", "true")
    df = spark.read.orc(p)
    assert df.count() == n
    rows = df.filter("k >= 17500 AND k < 17510").orderBy("k").collect()
    assert len(rows) == 10
    for row in rows:
        i = row.k
        assert list(row.lst) == [None if (i + j) % 7 == 0 else f"w{j}" for j in range(i % 4)]
        assert row.st.a == (None if i % 5 == 0 else i) and row.st.b == f"s{i % 3}"
    agg = df.filter("k >= 25000").selectExpr("sum(size(lst))").collect()[0][0]
    assert agg == sum(i % 4 for i in range(25000, n))


def test_orc_writer_context_manager(tmp_path):
    import pyarrow as pa

    from orc_rs_spark.orcfile.writer import OrcWriter

    p = str(tmp_path / "cm.orc")
    schema = pa.schema([("a", pa.int64())])
    with OrcWriter(p, schema, stripe_rows=100) as w:
        w.write_batch(pa.record_batch([pa.array(range(250), type=pa.int64())],
                                      schema=schema))
    assert OrcFileReader(p).read_all().num_rows == 250
    # an exception mid-write aborts: no footer, file rejected cleanly
    p2 = str(tmp_path / "aborted.orc")
    try:
        with OrcWriter(p2, schema) as w:
            w.write_batch(pa.record_batch([pa.array([1], type=pa.int64())],
                                          schema=schema))
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    with pytest.raises(ValueError):
        read_tail(p2)


def test_typed_error_surface(tmp_path):
    """The OrcError hierarchy mirrors the reference's enum
    (src/lib.rs:25-66) and stays ValueError-compatible."""
    from orc_rs_spark.orcfile import (
        OrcBoundsError,
        OrcError,
        OrcFormatError,
        OrcUnsupportedError,
    )

    p = tmp_path / "junk.orc"
    p.write_bytes(b"definitely not orc bytes" * 10)
    with pytest.raises(OrcFormatError):
        read_tail(str(p))
    with pytest.raises(ValueError):  # back-compat
        read_tail(str(p))
    assert issubclass(OrcUnsupportedError, OrcError)
    assert issubclass(OrcBoundsError, IndexError)
    # bounds: row_groups without a stride
    import pyarrow as pa

    from orc_rs_spark.orcfile.writer import write_orc

    q = str(tmp_path / "nostride.orc")
    write_orc(pa.table({"a": pa.array([1, 2, 3], type=pa.int64())}), q,
              row_index_stride=0)
    with pytest.raises(OrcBoundsError):
        OrcFileReader(q).read_stripe(0, row_groups=[0])


def test_read_stripe_batches_rejects_groups_without_stride(tmp_path):
    import pyarrow as pa

    from orc_rs_spark.orcfile import OrcBoundsError
    from orc_rs_spark.orcfile.writer import write_orc

    p = str(tmp_path / "ns.orc")
    write_orc(pa.table({"a": pa.array([1, 2, 3], type=pa.int64())}), p,
              row_index_stride=0)
    with pytest.raises(OrcBoundsError):
        list(OrcFileReader(p).read_stripe_batches(0, row_groups=[0]))


def test_nested_leaf_group_stats_prune_token_ranges(tmp_path):
    """List-child min/max in the row index + Metadata: a token-range scan
    prunes row groups AND stripes without touching token bytes."""
    import pyarrow as pa

    from orc_rs_spark.orcfile.reader import prune_stripes, resolve_column_path
    from orc_rs_spark.orcfile.writer import write_orc

    n = 20000
    toks = pa.array([[i, i + 1, i + 2] for i in range(n)], type=pa.list_(pa.int32()))
    tbl = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)), "tokens": toks})
    p = str(tmp_path / "tok.orc")
    write_orc(tbl, p, stripe_rows=5000, row_index_stride=1000)
    r = OrcFileReader(p)
    # dotted path resolves to the list child id
    assert resolve_column_path(r.tail.footer.types, "tokens.item") is not None
    assert resolve_column_path(r.tail.footer.types, "tokens.nope") is None
    assert prune_stripes(p, "tokens.item", 12000, 12010) == [2]
    keep = r.prune_row_groups(2, "tokens.item", 12000, 12010)
    # stripe 2 covers rows 10000..14999; group 1's last row (11999) holds
    # token 12001, so groups 1 AND 2 legitimately overlap the range
    assert keep == [1, 2]
    got = r.read_stripe(2, row_groups=keep)
    vals = [v for row in got.column("tokens").to_pylist() for v in row]
    assert 12000 in vals and got.num_rows == 2000


# ---------------------------------------------- round 4: vectorized decimal


def test_wire_decimal_decode_is_vectorized(tmp_path, monkeypatch):
    """The wire decimal path must take the whole-array i128 varint route —
    never the per-value python-int loop — whenever per-value scales match
    the column scale (i.e. every file our writer or the JVM writer emits).
    Monkeypatching the fallback to raise makes any per-value decode fail
    loudly instead of silently passing slow."""
    from decimal import Decimal

    import pyarrow as pa

    from orc_rs_spark.orcfile import reader as reader_mod
    from orc_rs_spark.orcfile.writer import write_orc

    vals = [Decimal("12345678901234567890.1234567891"), Decimal("-1.0000000000"),
            None, Decimal("0.0000000001")] * 2500
    tbl = pa.table({"amount": pa.array(vals, type=pa.decimal128(38, 10))})
    p = str(tmp_path / "dec.orc")
    write_orc(tbl, p, compression="zlib", stripe_rows=4000, row_index_stride=1000)

    def boom(self, buf, n):
        raise AssertionError("per-value python decimal decode reached")

    monkeypatch.setattr(reader_mod._StripeColumnReader, "_varint_bigints", boom)
    r = OrcFileReader(p)
    got = r.read_all()
    assert got.column("amount").to_pylist() == vals
    # positional (row-group) path takes the vectorized route too
    g = r.read_stripe(0, row_groups=[2])
    assert g.column("amount").to_pylist() == vals[2000:3000]


def test_hive11_unbounded_decimal_still_decodes():
    """precision-0 (Hive 0.11 unbounded) decimals use the per-value
    fallback — the one case whose per-value scales genuinely vary."""
    r = OrcFileReader(f"{GOLD}/orc-file-11-format.orc")
    t = r.read_all(columns=["decimal1"])
    assert str(t.column("decimal1")[0].as_py()) == "12345678.6547456"


# --------------------------------------------- round 4: planning + indexes


def test_scan_planning_single_pass(tmp_path, spark, monkeypatch):
    """Planning reads each file's tail once and its Metadata section once
    REGARDLESS of predicate count (round-3 read it once per predicate),
    and tails are read in parallel, not in a driver for-loop."""
    import pyarrow as pa

    from orc_rs_spark.orcfile import spark_source as src_mod
    from orc_rs_spark.orcfile.writer import write_orc

    files = []
    for i in range(6):
        tbl = pa.table({
            "a": pa.array(np.arange(i * 100, i * 100 + 100, dtype=np.int64)),
            "b": pa.array(np.arange(100, dtype=np.int64)),
        })
        p = str(tmp_path / f"part-{i}.orc")
        write_orc(tbl, p, compression="zlib")
        files.append(p)

    tails, stats = [], []
    real_tail, real_stats = src_mod.read_tail, src_mod.read_stripe_statistics
    monkeypatch.setattr(src_mod, "read_tail",
                        lambda f: (tails.append(f), real_tail(f))[1])
    monkeypatch.setattr(src_mod, "read_stripe_statistics",
                        lambda f, t=None: (stats.append(f), real_stats(f, t))[1])
    df = src_mod.read_orc(
        spark, files,
        predicate=[("a", 120, 180), ("b", 0, 50), ("a", 0, 10**6)],
    )
    rows = df.filter("a BETWEEN 120 AND 180 AND b <= 50").collect()
    assert len(rows) == 31  # a in [120, 150]: b = a - 100 caps at 50
    # one tail per file in planning + one for the DDL derivation
    assert len([f for f in tails if f in files]) <= len(files) + 1
    # ONE Metadata parse per file for all three predicates
    assert sorted(stats) == sorted(files)


def test_scan_planning_distributed_path(tmp_path, spark, monkeypatch):
    """Above the file-count threshold, planning fans out as a Spark job;
    results (rows AND mixed-schema rejection) match the driver path."""
    import pyarrow as pa

    from orc_rs_spark.orcfile import spark_source as src_mod
    from orc_rs_spark.orcfile.writer import write_orc

    files = []
    for i in range(5):
        tbl = pa.table({"a": pa.array(np.arange(i * 10, i * 10 + 10, dtype=np.int64))})
        p = str(tmp_path / f"p{i}.orc")
        write_orc(tbl, p, compression="zlib")
        files.append(p)
    monkeypatch.setattr(src_mod, "DISTRIBUTED_PLAN_THRESHOLD", 2)
    df = src_mod.read_orc(spark, files, predicate=("a", 12, 33))
    got = sorted(r["a"] for r in df.filter("a BETWEEN 12 AND 33").collect())
    assert got == list(range(12, 34))
    # mixed schema still rejected with file names (raised inside the
    # distributed planning task, surfaced through the Spark job)
    other = str(tmp_path / "mixed.orc")
    write_orc(pa.table({"z": pa.array([1.5])}), other, compression="zlib")
    with pytest.raises(Exception, match="schema mismatch"):
        src_mod.read_orc(spark, files + [other]).collect()


def test_index_region_cached_per_stripe(indexed_orc, monkeypatch):
    """Conjunctive predicates probe the same stripe once per column; the
    index region must be range-read + parsed only once."""
    calls = []
    real = OrcFileReader._read_index_region_uncached

    def counting(self, i):
        calls.append(i)
        return real(self, i)

    monkeypatch.setattr(OrcFileReader, "_read_index_region_uncached", counting)
    r = OrcFileReader(indexed_orc)
    for col, lo, hi in [("k", 4500, 5500), ("k", 0, 9000), ("dct", "cat1", "cat4")]:
        assert r.prune_row_groups(0, col, lo, hi) is not None
    assert calls == [0]


def test_group_support_validates_every_entry(indexed_orc):
    """_check_group_support must reject an index whose entry count doesn't
    cover the stripe's row groups BEFORE any batch is yielded (a mid-yield
    fallback would duplicate rows)."""
    from orc_rs_spark.orcfile.reader import RowIndexUnsupported

    r = OrcFileReader(indexed_orc)
    reader, stripe = r._open_stripe(0)
    index = reader.row_index()
    names, subs = r._select(None)
    with pytest.raises(RowIndexUnsupported, match="index entries"):
        for sub in subs:
            r._check_group_support(reader, index, sub, n_groups=9999)


def test_stats_overlap_type_mismatch_keeps_everything(indexed_orc):
    """A type-mismatched predicate (string range on an int column) must
    disable pruning, not abort the scan with a TypeError."""
    r = OrcFileReader(indexed_orc)
    n_stripes = len(r.tail.footer.stripes)
    from orc_rs_spark.orcfile.reader import prune_stripes

    assert prune_stripes(indexed_orc, "k", "zzz", "zzz") == list(range(n_stripes))
    keep = r.prune_row_groups(0, "k", "aaa", "zzz")
    assert keep is None or len(keep) == 20


# ------------------------------------------- round 4: writer bloom upgrades


def test_string_bloom_build_matches_java_and_scalar(tmp_path, monkeypatch):
    """The Arrow-buffer string bloom build must produce the SAME wire
    bytes the per-value path produced (murmur3_hash64_many == scalar
    murmur3_hash64 on every value) and never touch python objects."""
    import pyarrow as pa

    from orc_rs_spark.kernels import orc_bloom as ob
    from orc_rs_spark.orcfile.writer import write_orc

    vals = [f"key-{i:06d}" * (1 + i % 4) for i in range(5000)]
    vals[7] = ""  # empty string edge
    tbl = pa.table({"s": pa.array(vals)})

    def boom(values):
        raise AssertionError("per-value string bloom build reached")

    monkeypatch.setattr(ob.OrcBloom, "add_bytes_many", staticmethod(boom))
    p = str(tmp_path / "sbloom.orc")
    write_orc(tbl, p, compression="zlib", stripe_rows=5000,
              row_index_stride=1000, bloom_columns=["s"])
    r = OrcFileReader(p)
    # every present value probes positive in its own group's bloom
    # (values at i % 4 == 0 are the unrepeated "key-%06d" form)
    assert r.prune_row_groups(0, "s", "key-000124", "key-000124") == [0]
    assert r.prune_row_groups(0, "s", "key-004996", "key-004996") == [4]
    # absent value inside the lexical range is bloom-rejected
    assert r.prune_row_groups(0, "s", "key-000123x", "key-000123x") == []


def test_float_bloom_write_and_probe(tmp_path):
    """Float/double bloom columns: doubleToLongBits hashing end-to-end —
    the round-3 gap where a float column fell into the utf8 branch."""
    import pyarrow as pa

    from orc_rs_spark.orcfile.writer import write_orc

    v = np.linspace(-100.0, 100.0, 4000)
    tbl = pa.table({"f": pa.array(v, type=pa.float64()),
                    "f32": pa.array(v.astype(np.float32))})
    p = str(tmp_path / "fbloom.orc")
    write_orc(tbl, p, compression="zlib", stripe_rows=4000,
              row_index_stride=1000, bloom_columns=["f", "f32"])
    r = OrcFileReader(p)
    probe = float(v[1234])
    assert 1 in r.prune_row_groups(0, "f", probe, probe)
    # a double absent from the data but inside every group's min/max
    absent = 0.123456789101112
    assert r.prune_row_groups(0, "f", absent, absent) == []


def test_bloom_on_union_column_raises(tmp_path):
    """Bloom filters target hashable leaf kinds; requesting one ON a union
    column raises instead of writing a meaningless filter."""
    import pyarrow as pa

    from orc_rs_spark.orcfile.writer import OrcWriter

    schema = pa.schema([
        ("k", pa.int64()),
        ("u", pa.dense_union([pa.field("a", pa.int64()), pa.field("b", pa.string())])),
    ])
    with pytest.raises(ValueError, match="unsupported for union"):
        OrcWriter(str(tmp_path / "u.orc"), schema, bloom_columns=["u"])


def _union_table(n: int) -> "pa.Table":
    import pyarrow as pa

    tags = pa.array([i % 3 for i in range(n)], type=pa.int8())
    offsets = pa.array([i // 3 for i in range(n)], type=pa.int32())
    k = n // 3
    ints = pa.array(list(range(k)), type=pa.int64())
    strs = pa.array([f"s{i}" for i in range(k)], type=pa.string())
    dbls = pa.array([i * 0.5 for i in range(k)], type=pa.float64())
    u = pa.UnionArray.from_dense(tags, offsets, [ints, strs, dbls])
    return pa.table({"k": pa.array(range(n), type=pa.int64()), "u": u})


def test_union_positional_group_decode(tmp_path):
    """Round-3's last RowIndexUnsupported gap: union columns now decode
    positionally — TAG stream via the byte-RLE position contract, each
    child sought through its own index entry. Every group must equal the
    full decode's slice (no JVM ground truth exists — Spark has no union
    type — so the contract is validated self-consistently plus the
    Java-verified byte/child position contracts it reuses)."""
    import pyarrow as pa

    from orc_rs_spark.orcfile.writer import write_orc

    n = 9000
    tbl = _union_table(n)
    p = str(tmp_path / "u_idx.orc")
    write_orc(tbl, p, compression="zlib", stripe_rows=6000, row_index_stride=1000)
    r = OrcFileReader(p)
    assert r.tail.footer.stripes[0].index_length > 0
    full = r.read_stripe(0)
    stride = 1000
    for g in range(6):
        got = r.read_stripe(0, row_groups=[g])
        want = pa.Table.from_batches([full]).slice(g * stride, stride)
        assert got.column("u").to_pylist() == want.column("u").to_pylist(), f"group {g}"
        assert got.column("k").to_pylist() == want.column("k").to_pylist()
    # positional path actually used (not the full-decode fallback)
    reader, stripe = r._open_stripe(0)
    names, subs = r._select(None)
    index = reader.row_index()
    for sub in subs:
        r._check_group_support(reader, index, sub, n_groups=6)
    # bounded-batch reads agree too, across both stripes
    got_all = pa.Table.from_batches(
        [b for i in range(2) for b in r.read_stripe_batches(i, batch_rows=1500)]
    )
    assert got_all.column("u").to_pylist() == tbl.column("u").to_pylist()


def test_bloom_probe_coerces_by_column_kind(tmp_path):
    """An INT point predicate against a double column's bloom must hash
    doubleToLongBits(float(v)) like the writer did — round-4 review bug:
    the python-type dispatch silently pruned groups containing the value."""
    import pyarrow as pa

    from orc_rs_spark.orcfile.writer import write_orc

    v = np.arange(2000, dtype=np.float64)  # integral doubles: 0.0, 1.0, ...
    p = str(tmp_path / "fb.orc")
    write_orc(pa.table({"d": pa.array(v)}), p, compression="zlib",
              stripe_rows=2000, row_index_stride=1000, bloom_columns=["d"])
    r = OrcFileReader(p)
    assert r.prune_row_groups(0, "d", 5, 5) == [0]          # int probe
    assert r.prune_row_groups(0, "d", 1500.0, 1500.0) == [1]  # float probe
    # float probe against an INT column's bloom: integral coerces, a
    # non-integral value provably can't match but must not crash
    p2 = str(tmp_path / "ib.orc")
    write_orc(pa.table({"i": pa.array(np.arange(2000, dtype=np.int64))}), p2,
              compression="zlib", stripe_rows=2000, row_index_stride=1000,
              bloom_columns=["i"])
    r2 = OrcFileReader(p2)
    assert r2.prune_row_groups(0, "i", 7.0, 7.0) == [0]
    assert r2.prune_row_groups(0, "i", 7.5, 7.5) in ([], [0])  # stats may keep


@pytest.mark.spark
def test_write_orc_dir_task_commit_protocol(spark, tmp_path):
    """Sinks write attempt-unique temp names and atomically rename on
    success: no .inprogress files survive a clean job, and stale temp
    files from failed/speculative attempts are invisible to read_orc."""
    import pyarrow as pa

    from orc_rs_spark.orcfile.spark_source import read_orc, write_orc_dir

    df = spark.range(0, 1000).selectExpr("id AS a", "id * 2 AS b")
    out = str(tmp_path / "commit")
    n = write_orc_dir(df.repartition(3), out)
    assert n == 1000
    import glob as g
    import os

    names = sorted(os.path.basename(p) for p in g.glob(f"{out}/*"))
    assert all(x.endswith(".orc") for x in names), names
    # plant a stale temp file from a hypothetical failed attempt
    with open(f"{out}/part-00000.orc.inprogress-99", "wb") as f:
        f.write(b"garbage not orc")
    back = read_orc(spark, out)
    assert back.count() == 1000
    assert back.agg({"a": "sum"}).collect()[0][0] == 499500


def test_user_metadata_roundtrip_and_lineage(tmp_path):
    """Footer field 5 (UserMetadataItem) both directions: caller KV pairs
    plus the automatic writer-lineage stamp round-trip through our own
    tail parser AND the ORC C++ reader (pyarrow.orc); binary values are
    byte-exact. Reference surface: src/tail.rs:100-104, Reader::metadata
    (src/reader.rs:52,148)."""
    import pyarrow as pa
    import pyarrow.orc as po

    from orc_rs_spark.orcfile.reader import read_tail
    from orc_rs_spark.orcfile.writer import write_orc

    blob = bytes(range(256))
    t = pa.table({"x": pa.array([1, 2], pa.int64())})
    p = str(tmp_path / "md.orc")
    write_orc(t, p, user_metadata={"k.a": b"v1", "bin": blob})
    md = read_tail(p).footer.metadata
    assert md["k.a"] == b"v1" and md["bin"] == blob
    assert md["orc_rs_spark.writer"].startswith(b"orc_rs_spark/")
    cpp = dict(po.ORCFile(p).metadata.items())
    key = "bin" if "bin" in cpp else b"bin"
    assert bytes(cpp[key]) == blob
    # default write carries only the lineage stamp
    p2 = str(tmp_path / "plain.orc")
    write_orc(t, p2)
    md2 = read_tail(p2).footer.metadata
    assert list(md2) == ["orc_rs_spark.writer"]


def test_zlib_blocks_respect_declared_block_size(tmp_path):
    """The postscript declares compressionBlockSize = 256 KiB; every
    compressed chunk's DECOMPRESSED size must stay within it. Round-5
    ADVICE: zlib used to chunk at the 8 MiB header limit while the other
    codecs honoured 256 KiB, so readers sizing decode buffers from the
    declaration could reject large zlib streams."""
    import zlib as _z

    import pyarrow as pa

    from orc_rs_spark.kernels.blockcomp import LZ_BLOCK
    from orc_rs_spark.orcfile.writer import write_orc

    # ~2 MiB of per-row-distinct strings in one stripe -> raw DATA > 256 KiB
    vals = [("row-%06d " % i) * 20 for i in range(10_000)]
    path = str(tmp_path / "big_zlib.orc")
    write_orc(pa.table({"s": pa.array(vals)}), path, compression="zlib")
    r = OrcFileReader(path)
    rd, _ = r._open_stripe(0)
    most_blocks = 0
    for (col, kind), raw in rd.streams.items():
        pos, blocks = 0, 0
        while pos < len(raw):
            header = int.from_bytes(raw[pos : pos + 3], "little")
            pos += 3
            ln = header >> 1
            blk = raw[pos : pos + ln]
            pos += ln
            out = blk if header & 1 else _z.decompress(blk, wbits=-15)
            assert len(out) <= LZ_BLOCK, (col, kind, len(out))
            blocks += 1
        most_blocks = max(most_blocks, blocks)
    assert most_blocks >= 2  # non-vacuous: some stream actually spans blocks
    assert r.read_all().column("s").to_pylist() == vals
