"""Pure-stdlib Avro Object Container File codec + a Spark Python
DataSource over it — closing the Avro hole in the source matrix
without the classpath-blocked spark-avro module (io/formats.py
::read_avro documents the production deploy; this module reads and
writes real .avro container files for the common record shapes).

Implements the public Apache Avro 1.11 specification:

* container grammar: ``Obj\\x01`` magic, file-metadata map
  (``avro.schema`` JSON + ``avro.codec``), 16-byte sync marker, then
  data blocks of (record count, byte length, serialized records,
  sync) — spec "Object Container Files";
* binary encoding: zigzag base-128 varints for int/long, IEEE
  little-endian float/double, length-prefixed bytes/string, 1-byte
  boolean, union = branch index varint then value — spec "Binary
  Encoding";
* codecs: ``null`` and ``deflate`` (raw zlib, no header — spec
  "Required Codecs");
* schemas: records of primitives, nullable ``["null", X]`` unions,
  and the ``date`` / ``timestamp-micros`` logical types (mapped to
  Spark DateType/TimestampType). Arrays/maps/enums/fixed/nested
  records fail fast with the spark-avro remedy — the long tail
  belongs to the real module.

Scale note: one input partition per FILE (Avro blocks are
sync-delimited and could split further; per-file keeps the reader
simple — shard .avro files like CSV chunks, writer.go-style). Reads
decode straight into Arrow batches.
"""

from __future__ import annotations

import io as _io
import json
import os
import struct
import zlib
from collections.abc import Iterator

MAGIC = b"Obj\x01"

_UNSUPPORTED = (
    "avro_local supports records of primitives, [null, X] unions, and "
    "date/timestamp-micros logical types; for {kind!r} deploy the real "
    "spark-avro module (--packages org.apache.spark:spark-avro_2.13:"
    "<spark-version>)"
)


# -- varint / zigzag (spec: Binary Encoding > Primitive Types) ---------


def _write_long(n: int, out: _io.BytesIO) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes((b | 0x80,)))
        else:
            out.write(bytes((b,)))
            return


def _read_long(buf: memoryview, pos: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (n >> 1) ^ -(n & 1), pos


# -- schema handling ---------------------------------------------------


def _field_kind(sch) -> tuple[str, int | None]:
    """Returns (primitive kind, null-branch index or None if the field
    is not nullable). Avro permits the 'null' branch at EITHER position
    of a two-branch union (["null", X] and ["long", "null"] are both
    legal) — encode/decode must use the schema's actual branch index,
    not assume 0, or a value-first file desyncs the record stream
    (ADVICE r6). Raises on unsupported shapes."""
    null_idx = None
    if isinstance(sch, list):  # union
        branches = [s for s in sch if s != "null"]
        if len(sch) != 2 or len(branches) != 1:
            raise NotImplementedError(
                _UNSUPPORTED.format(kind=f"union {sch}")
            )
        null_idx, sch = sch.index("null"), branches[0]
    if isinstance(sch, dict):
        logical = sch.get("logicalType")
        if logical == "date" and sch.get("type") == "int":
            return "date", null_idx
        if logical == "timestamp-micros" and sch.get("type") == "long":
            return "timestamp-micros", null_idx
        sch = sch.get("type")
    if sch in ("null", "boolean", "int", "long", "float", "double",
               "string", "bytes"):
        return sch, null_idx
    raise NotImplementedError(_UNSUPPORTED.format(kind=sch))


_SPARK_TYPES = {
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "bytes": "binary",
    "date": "date",
    "timestamp-micros": "timestamp",
}


def schema_to_ddl(schema: dict) -> str:
    if schema.get("type") != "record":
        raise NotImplementedError(
            _UNSUPPORTED.format(kind=schema.get("type"))
        )
    cols = []
    for f in schema["fields"]:
        kind, _ = _field_kind(f["type"])
        cols.append(f"{f['name']} {_SPARK_TYPES[kind]}")
    return ", ".join(cols)


# -- record codec ------------------------------------------------------


def _decode_value(kind: str, buf: memoryview, pos: int):
    if kind == "null":
        return None, pos
    if kind == "boolean":
        return buf[pos] == 1, pos + 1
    if kind in ("int", "long"):
        return _read_long(buf, pos)
    if kind == "date":
        n, pos = _read_long(buf, pos)
        import datetime

        return datetime.date(1970, 1, 1) + datetime.timedelta(days=n), pos
    if kind == "timestamp-micros":
        n, pos = _read_long(buf, pos)
        import datetime

        return (
            datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
            + datetime.timedelta(microseconds=n)
        ).replace(tzinfo=None), pos
    if kind == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if kind == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if kind in ("string", "bytes"):
        ln, pos = _read_long(buf, pos)
        raw = bytes(buf[pos : pos + ln])
        return (raw.decode() if kind == "string" else raw), pos + ln
    raise NotImplementedError(_UNSUPPORTED.format(kind=kind))


def _encode_value(kind: str, v, out: _io.BytesIO) -> None:
    if kind == "null":
        return
    if kind == "boolean":
        out.write(b"\x01" if v else b"\x00")
    elif kind in ("int", "long"):
        _write_long(int(v), out)
    elif kind == "date":
        import datetime

        _write_long((v - datetime.date(1970, 1, 1)).days, out)
    elif kind == "timestamp-micros":
        import datetime

        # integer division of the timedelta avoids float precision on
        # distant dates (total_seconds() is a double)
        micros = (v - datetime.datetime(1970, 1, 1)) // datetime.timedelta(
            microseconds=1
        )
        _write_long(micros, out)
    elif kind == "float":
        out.write(struct.pack("<f", v))
    elif kind == "double":
        out.write(struct.pack("<d", v))
    elif kind == "string":
        raw = v.encode()
        _write_long(len(raw), out)
        out.write(raw)
    elif kind == "bytes":
        _write_long(len(v), out)
        out.write(v)
    else:
        raise NotImplementedError(_UNSUPPORTED.format(kind=kind))


# -- container read ----------------------------------------------------


def read_container(path: str) -> tuple[dict, list[tuple]]:
    """Parse one Avro Object Container File → (schema, record tuples).
    Verifies magic and per-block sync markers; supports null/deflate."""
    data = memoryview(open(path, "rb").read())
    if bytes(data[:4]) != MAGIC:
        raise ValueError(f"{path}: not an Avro container (bad magic)")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:  # metadata map: blocks terminated by count 0
        cnt, pos = _read_long(data, pos)
        if cnt == 0:
            break
        if cnt < 0:  # negative count: abs count + a byte-size long
            cnt = -cnt
            _, pos = _read_long(data, pos)
        for _ in range(cnt):
            kl, pos = _read_long(data, pos)
            key = bytes(data[pos : pos + kl]).decode()
            pos += kl
            vl, pos = _read_long(data, pos)
            meta[key] = bytes(data[pos : pos + vl])
            pos += vl
    sync = bytes(data[pos : pos + 16])
    pos += 16
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(_UNSUPPORTED.format(kind=f"codec {codec}"))
    kinds = [_field_kind(f["type"]) for f in schema["fields"]]
    rows: list[tuple] = []
    while pos < len(data):
        n_rec, pos = _read_long(data, pos)
        blen, pos = _read_long(data, pos)
        block = data[pos : pos + blen]
        pos += blen
        if bytes(data[pos : pos + 16]) != sync:
            raise ValueError(f"{path}: sync marker mismatch (corrupt block)")
        pos += 16
        if codec == "deflate":
            block = memoryview(zlib.decompress(bytes(block), -15))
        bp = 0
        for _ in range(n_rec):
            row = []
            for kind, null_idx in kinds:
                if null_idx is not None:
                    branch, bp = _read_long(block, bp)
                    if branch == null_idx:
                        row.append(None)
                        continue
                v, bp = _decode_value(kind, block, bp)
                row.append(v)
            rows.append(tuple(row))
    return schema, rows


def write_container(
    path: str,
    schema: dict,
    rows: list[tuple],
    codec: str = "deflate",
    records_per_block: int = 1000,
) -> None:
    """Write an Avro Object Container File (null/deflate codec)."""
    kinds = [_field_kind(f["type"]) for f in schema["fields"]]
    sync = os.urandom(16)
    out = _io.BytesIO()
    out.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    _write_long(len(meta), out)
    for k, v in meta.items():
        kb = k.encode()
        _write_long(len(kb), out)
        out.write(kb)
        _write_long(len(v), out)
        out.write(v)
    _write_long(0, out)
    out.write(sync)
    for lo in range(0, len(rows), records_per_block):
        chunk = rows[lo : lo + records_per_block]
        body = _io.BytesIO()
        for row in chunk:
            for (kind, null_idx), v in zip(kinds, row):
                if null_idx is not None:
                    _write_long(
                        null_idx if v is None else 1 - null_idx, body
                    )
                    if v is None:
                        continue
                _encode_value(kind, v, body)
        raw = body.getvalue()
        if codec == "deflate":
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            raw = co.compress(raw) + co.flush()
        _write_long(len(chunk), out)
        _write_long(len(raw), out)
        out.write(raw)
        out.write(sync)
    with open(path, "wb") as f:
        f.write(out.getvalue())


# -- Spark Python DataSource ------------------------------------------

from pyspark.sql.datasource import (  # noqa: E402
    DataSource,
    DataSourceReader,
    InputPartition,
)


class _AvroFile(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _list_avro(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, n)
        for n in os.listdir(path)
        if n.endswith(".avro")
    )


class AvroLocalReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("avro_local requires .option('path', ...)")

    def partitions(self) -> list[InputPartition]:
        files = _list_avro(self.path)
        if not files:
            raise FileNotFoundError(f"no .avro files under {self.path}")
        return [_AvroFile(f) for f in files]

    def read(self, partition: _AvroFile) -> Iterator:
        schema, rows = read_container(partition.path)
        for row in rows:
            yield row


class AvroLocalDataSource(DataSource):
    """``spark.dataSource.register(AvroLocalDataSource)`` then
    ``spark.read.format("avro_local").option("path", p).load()`` —
    real Avro container files through the stdlib codec above, one
    input partition per file. Production deployments with the
    spark-avro jar should prefer the JVM source (vectorized, full
    type matrix); this closes the gap where that jar is absent."""

    @classmethod
    def name(cls) -> str:
        return "avro_local"

    def schema(self) -> str:
        files = _list_avro(self.options.get("path", ""))
        if not files:
            raise FileNotFoundError(
                f"no .avro files under {self.options.get('path')}"
            )
        sch, _ = read_container(files[0])
        return schema_to_ddl(sch)

    def reader(self, schema) -> AvroLocalReader:
        return AvroLocalReader(self.options)
