"""Spark Python Data Source for the ORC wire format — ``spark.read
.format("orc_rs")`` / ``df.write.format("orc_rs")`` over the same
stripe-parallel machinery as ``read_orc`` / ``write_orc_dir``.

This is the idiomatic integration surface PySpark 4 provides for
Python-implemented formats (pyspark.sql.datasource): the format name
participates in standard ``spark.read`` / ``spark.sql`` pipelines, and
Catalyst PUSHES FILTERS into the source via ``pushFilters`` — the scan
receives ``EqualTo``/``In``/comparison filters, prunes stripes and row
groups with them (statistics + blooms), fully absorbs the exactly-
representable ones (equality, IN) by residual-filtering in-task, and
hands the rest back for Spark to re-apply. Usage::

    from orc_rs_spark.orcfile.datasource import OrcRsDataSource
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(OrcRsDataSource)

    spark.read.format("orc_rs").load("/data/orders_orc") \\
        .where("o_custkey = 371").show()          # pruned + absorbed
    df.write.format("orc_rs").option("bloom_columns", "o_custkey") \\
        .mode("overwrite").save("/data/orders_orc")

Options: ``compression`` (zlib|none, write), ``stripe_rows``,
``row_index_stride``, ``bloom_columns`` (comma-separated, write),
``batch_rows`` (read).

Planning runs on the driver with the thread-pooled tail reader (the
data source API plans inside Spark's job machinery, so the distributed
planning job of ``read_orc`` does not apply here); reads are one task
per (file, stripe) like every other scan in this package.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from dataclasses import dataclass

import pyarrow as pa
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)


def _resolve_files(options) -> list[str]:
    import glob as _glob

    path = options.get("path")
    if not path:
        raise ValueError("orc_rs: a path is required (use .load(path))")
    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, "*.orc")))
        if not files:
            raise ValueError(f"orc_rs: no ORC files in {path}")
        return files
    return [path]


@dataclass
class OrcStripePartition(InputPartition):
    path: str
    stripe: int


@dataclass
class OrcWriteMessage(WriterCommitMessage):
    tmp: str | None
    final: str | None
    rows: int


class OrcRsReader(DataSourceReader):
    def __init__(self, options, schema):
        self.options = options
        self.files = _resolve_files(options)
        self.batch_rows = int(options.get("batch_rows", 65536))
        self.columns = [f.name for f in schema.fields]
        # predicates pushed by Catalyst: absorbed (exact in-task residual)
        # vs hint-only (pruning superset; Spark re-applies the filter)
        self._absorbed: list[tuple] = []
        self._hints: list[tuple] = []
        # (column, want_null) null tests, absorbed exactly: ORC group
        # stats prove both directions (hasNull / numberOfValues)
        self._null_preds: list[tuple[str, bool]] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        # materialized (not a generator): the absorbed/hint lists must be
        # complete no matter how Spark consumes the returned iterable
        unsupported: list[Filter] = []
        for f in filters:
            attr = getattr(f, "attribute", None)
            top = attr[0] if attr and len(attr) == 1 else None
            if top is None or top not in self.columns:
                unsupported.append(f)
            elif isinstance(f, EqualTo) and f.value is not None:
                self._absorbed.append((top, f.value, f.value))
            elif isinstance(f, In) and f.value and all(v is not None for v in f.value):
                self._absorbed.append((top, list(f.value)))
            elif isinstance(f, (GreaterThan, GreaterThanOrEqual)) and f.value is not None:
                # inclusive superset of the strict bound — prune only,
                # Spark re-applies the exact comparison
                self._hints.append((top, f.value, None))
                unsupported.append(f)
            elif isinstance(f, (LessThan, LessThanOrEqual)) and f.value is not None:
                self._hints.append((top, None, f.value))
                unsupported.append(f)
            elif isinstance(f, IsNotNull):
                self._null_preds.append((top, False))
            elif isinstance(f, IsNull):
                self._null_preds.append((top, True))
            else:
                unsupported.append(f)
        return unsupported

    def partitions(self):
        from orc_rs_spark.orcfile.spark_source import _plan_scan_threaded

        work = _plan_scan_threaded(self.files, self._absorbed + self._hints or None)
        return [OrcStripePartition(f, i) for f, i in work] or [
            OrcStripePartition(self.files[0], -1)  # all stripes pruned
        ]

    def read(self, partition: OrcStripePartition):
        from orc_rs_spark.orcfile.reader import OrcFileReader, predicate_form
        from orc_rs_spark.orcfile.spark_source import _apply_residual, _spark_friendly

        if partition.stripe < 0:
            return
        r = OrcFileReader(partition.path)
        groups = None
        for p in self._absorbed + self._hints:
            form = predicate_form(p)
            if form[0] == "range":
                g = r.prune_row_groups(partition.stripe, form[1], form[2], form[3])
            else:
                g = r.prune_row_groups_in(partition.stripe, form[1], form[2])
            if g is not None:
                groups = g if groups is None else sorted(set(groups) & set(g))
        for col, want_null in self._null_preds:
            g = r.prune_row_groups_null(partition.stripe, col, want_null)
            if g is not None:
                groups = g if groups is None else sorted(set(groups) & set(g))
        if groups == []:
            return
        for batch in r.read_stripe_batches(
            partition.stripe, self.columns, batch_rows=self.batch_rows,
            row_groups=groups,
        ):
            if self._absorbed:
                batch = _apply_residual(batch, self._absorbed)
            if self._null_preds:
                batch = self._null_residual(batch)
            if batch.num_rows:
                yield _spark_friendly(batch)

    def _null_residual(self, batch: pa.RecordBatch) -> pa.RecordBatch:
        import pyarrow.compute as pc

        mask = None
        for col_name, want_null in self._null_preds:
            col = batch.column(batch.schema.get_field_index(col_name))
            m = pc.is_null(col) if want_null else pc.is_valid(col)
            mask = m if mask is None else pc.and_(mask, m)
        return batch.filter(mask) if mask is not None else batch


class OrcRsWriter(DataSourceArrowWriter):
    """Per-task streaming ORC writer with a rename-on-commit protocol:
    tasks write attempt-unique temp files and report them; the DRIVER
    renames them into place in ``commit`` (and, for overwrite mode,
    clears pre-existing part files first), so a failed or speculative
    task never leaves a visible partial file."""

    def __init__(self, options, schema, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("orc_rs: a path is required (use .save(path))")
        self.overwrite = overwrite
        self.compression = options.get("compression", "zlib")
        self.stripe_rows = int(options.get("stripe_rows", 65536))
        self.row_index_stride = int(options.get("row_index_stride", 10000))
        blooms = options.get("bloom_columns")
        self.bloom_columns = blooms.split(",") if blooms else None

    def write(self, iterator: Iterator[pa.RecordBatch]) -> OrcWriteMessage:
        from pyspark import TaskContext

        from orc_rs_spark.orcfile.writer import OrcWriter

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        os.makedirs(self.path, exist_ok=True)
        final = os.path.join(self.path, f"part-{pid:05d}.orc")
        tmp = f"{final}.{attempt}.tmp"
        writer: OrcWriter | None = None
        try:
            for b in iterator:
                if b.num_rows == 0:
                    continue
                if writer is None:
                    writer = OrcWriter(
                        tmp, b.schema, compression=self.compression,
                        stripe_rows=self.stripe_rows,
                        row_index_stride=self.row_index_stride,
                        bloom_columns=self.bloom_columns,
                    )
                writer.write_batch(b)
        except BaseException:
            if writer is not None:
                writer.abort()
            if os.path.exists(tmp):
                os.remove(tmp)
            raise
        if writer is None:
            return OrcWriteMessage(None, None, 0)
        writer.close()
        return OrcWriteMessage(tmp, final, writer.num_rows)

    def commit(self, messages) -> None:
        import glob as _glob

        if self.overwrite:
            keep = {m.tmp for m in messages if m and m.tmp}
            for f in _glob.glob(os.path.join(self.path, "*.orc")):
                os.remove(f)
            for f in _glob.glob(os.path.join(self.path, "*.tmp")):
                if f not in keep:
                    os.remove(f)
        for m in messages:
            if m and m.tmp:
                os.replace(m.tmp, m.final)

    def abort(self, messages) -> None:
        for m in messages:
            if m and m.tmp and os.path.exists(m.tmp):
                os.remove(m.tmp)


class OrcRsStreamWriter(DataSourceStreamArrowWriter):
    """Structured Streaming sink for the ORC wire: ``writeStream
    .format("orc_rs")``. Exactly-once by construction — tasks write
    attempt-unique temp files, and the driver's per-micro-batch
    ``commit(messages, batchId)`` renames them to batch-id-keyed names
    (``part-{batch:08d}-{pid:05d}.orc``), so a REPLAYED batch (restart
    between sink commit and checkpoint write) republishes the same
    final names instead of duplicating rows — the same idempotent
    overwrite contract as streaming.py's foreachBatch sink."""

    def __init__(self, options, schema):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("orc_rs: a path is required (use .option('path', ...))")
        self.compression = options.get("compression", "zlib")
        self.stripe_rows = int(options.get("stripe_rows", 65536))
        self.row_index_stride = int(options.get("row_index_stride", 10000))
        blooms = options.get("bloom_columns")
        self.bloom_columns = blooms.split(",") if blooms else None

    def write(self, iterator: Iterator[pa.RecordBatch]) -> OrcWriteMessage:
        from pyspark import TaskContext

        from orc_rs_spark.orcfile.writer import OrcWriter

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".stream-{pid:05d}.{attempt}.tmp")
        writer: OrcWriter | None = None
        try:
            for b in iterator:
                if b.num_rows == 0:
                    continue
                if writer is None:
                    writer = OrcWriter(
                        tmp, b.schema, compression=self.compression,
                        stripe_rows=self.stripe_rows,
                        row_index_stride=self.row_index_stride,
                        bloom_columns=self.bloom_columns,
                    )
                writer.write_batch(b)
        except BaseException:
            if writer is not None:
                writer.abort()
            if os.path.exists(tmp):
                os.remove(tmp)
            raise
        if writer is None:
            return OrcWriteMessage(None, None, 0)
        writer.close()
        # final name is assigned at COMMIT time (it needs the batch id)
        return OrcWriteMessage(tmp, f"{pid:05d}", writer.num_rows)

    def commit(self, messages, batchId: int) -> None:
        for m in messages:
            if m and m.tmp:
                final = os.path.join(
                    self.path, f"part-{batchId:08d}-{m.final}.orc"
                )
                os.replace(m.tmp, final)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m and m.tmp and os.path.exists(m.tmp):
                os.remove(m.tmp)


class OrcRsDataSource(DataSource):
    """``spark.dataSource.register(OrcRsDataSource)`` then read/write
    with ``.format("orc_rs")``."""

    @classmethod
    def name(cls) -> str:
        return "orc_rs"

    def schema(self):
        from orc_rs_spark.orcfile.reader import read_tail
        from orc_rs_spark.orcfile.spark_source import _orc_type_ddl

        tail = read_tail(_resolve_files(self.options)[0])
        root = tail.footer.types[0]
        return ", ".join(
            f"{n} {_orc_type_ddl(tail.footer.types, s, scan=True)}"
            for n, s in zip(root.field_names, root.subtypes)
        )

    def reader(self, schema) -> OrcRsReader:
        return OrcRsReader(self.options, schema)

    def writer(self, schema, overwrite: bool) -> OrcRsWriter:
        return OrcRsWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> OrcRsStreamWriter:
        return OrcRsStreamWriter(self.options, schema)
