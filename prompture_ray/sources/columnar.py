"""ORC and Feather (Arrow IPC) source/sink built on pyarrow's columnar
codecs, with the repo's resume-safe sink contract (content-derived shard
names, tmp+rename atomic writes — the TFRecord/Avro pattern,
sources/tfrecord.py).

The reference's loaders cover JSON/CSV/HTML (prompture/rag/loaders);
these extend the tabular source surface to the two remaining mainstream
columnar formats. Scale model: one file per read task (both formats are
stripe/block-splittable in principle, but shard-per-task parallelism is
what the sink produces and what a 100-TB layout wants anyway).
"""

from __future__ import annotations

import io
import os

import pyarrow as pa


def _content_sink(render, ext: str, out_dir: str, prefix: str):
    os.makedirs(out_dir, exist_ok=True)

    def sink(t: pa.Table, ctx=None) -> pa.Table:
        blob = render(t)
        import hashlib
        digest = hashlib.sha1(blob).hexdigest()[:16]
        path = os.path.join(out_dir, f"{prefix}-{digest}.{ext}")
        if not (os.path.exists(path)
                and os.path.getsize(path) == len(blob)):
            tmp = f"{path}.{os.getpid()}.tmp"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, path)
        return pa.table({"path": pa.array([path]),
                         "n_records": pa.array([len(t)], type=pa.int64()),
                         "n_bytes": pa.array([len(blob)],
                                             type=pa.int64())})

    return sink


def write_orc(ds, out_dir: str, prefix: str = "part",
              compression: str = "zstd"):
    """Sink: one ``.orc`` shard per block. Returns the shard manifest."""
    from pyarrow import orc

    def render(t: pa.Table) -> bytes:
        buf = io.BytesIO()
        orc.write_table(t, buf, compression=compression)
        return buf.getvalue()

    return ds.map_batches(_content_sink(render, "orc", out_dir, prefix),
                          batch_format="pyarrow")


def write_feather(ds, out_dir: str, prefix: str = "part",
                  compression: str = "zstd"):
    """Sink: one ``.feather`` (Arrow IPC file) shard per block."""
    from pyarrow import feather

    def render(t: pa.Table) -> bytes:
        buf = io.BytesIO()
        feather.write_feather(t, buf, compression=compression)
        return buf.getvalue()

    return ds.map_batches(
        _content_sink(render, "feather", out_dir, prefix),
        batch_format="pyarrow")


def _binary_reader(parse_blob):
    def parse(t: pa.Table) -> pa.Table:
        tables = [parse_blob(blob) for blob in t["bytes"].to_pylist()]
        tables = [x for x in tables if x.num_rows]
        if not tables:
            return pa.table({})
        # stable column order across shards
        first = sorted(tables[0].column_names)
        return pa.concat_tables([x.select(first) for x in tables])
    return parse


def read_orc(paths):
    """Source: ORC shards → Dataset (one file per task)."""
    import ray.data as rd
    from pyarrow import orc

    def parse_blob(blob: bytes) -> pa.Table:
        return orc.read_table(io.BytesIO(blob))

    return rd.read_binary_files(paths).map_batches(
        _binary_reader(parse_blob), batch_format="pyarrow")


def read_feather(paths, columns=None):
    """Source: Feather/Arrow-IPC shards → Dataset (one file per task).
    ``columns`` prunes at the decode (IPC is random-access per column)."""
    import ray.data as rd
    from pyarrow import feather

    def parse_blob(blob: bytes) -> pa.Table:
        return feather.read_table(io.BytesIO(blob), columns=columns)

    return rd.read_binary_files(paths).map_batches(
        _binary_reader(parse_blob), batch_format="pyarrow")
