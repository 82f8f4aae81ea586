"""HARP binary stream codec (public Harp protocol; SURVEY S1/K2).

The reference stores streams as chunked ``.bin`` files of concatenated Harp
messages and decodes them with ``swc.aeon`` readers. Here the decode is a
one-time distributed ingest: ``spark.read.format("binaryFile")`` over the
chunk files → ``mapInPandas`` framing each file's bytes into message rows →
Parquet. After ingest everything is columnar (SURVEY §1.2: a strict upgrade —
the reference is row-oriented only because pandas is).

Message framing (Harp protocol, public spec):
  [type(1) length(1) address(1) port(1) payloadType(1)
   [timestamp: seconds u32le + micros u16le * 32µs, if payloadType & 0x10]
   payload... checksum(1)]
``length`` counts bytes from ``address`` through ``checksum``.
Harp epoch is 1904-01-01 UTC (``api.to_seconds`` equivalence,
`combine_pose_id_chunk.py:324`).

Payload interpretation is register-specific; this codec exposes the raw bytes
plus a float32-vector view (the layout used by SLEAP pose registers). Schema
binding of float vectors to named pose columns lives in the caller.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = [
    "HARP_EPOCH",
    "decode_harp_bytes",
    "encode_harp_messages",
    "read_harp",
    "to_harp_seconds",
    "from_harp_seconds",
]

HARP_EPOCH = pd.Timestamp("1904-01-01 00:00:00")
_HAS_TS = 0x10

HARP_MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("msg_type", T.IntegerType()),
        T.StructField("address", T.IntegerType()),
        T.StructField("port", T.IntegerType()),
        T.StructField("payload_type", T.IntegerType()),
        T.StructField("time", T.TimestampType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("vector", T.ArrayType(T.FloatType())),
    ]
)


def to_harp_seconds(ts: pd.Series) -> pd.Series:
    """Timestamps → float seconds since the Harp epoch."""
    return (ts - HARP_EPOCH).dt.total_seconds()


def from_harp_seconds(sec: float) -> pd.Timestamp:
    return HARP_EPOCH + pd.Timedelta(seconds=sec)


def decode_harp_bytes(raw: bytes, path: str = "") -> pd.DataFrame:
    """Frame one file's bytes into message rows (NumPy, vector-friendly)."""
    rows = []
    buf = memoryview(raw)
    i = 0
    n = len(buf)
    while i + 2 <= n:
        msg_type = buf[i]
        length = buf[i + 1]
        end = i + 2 + length
        if end > n:
            break  # truncated trailing message
        address = buf[i + 2]
        port = buf[i + 3]
        ptype = buf[i + 4]
        off = i + 5
        ts = None
        if ptype & _HAS_TS:
            sec = int.from_bytes(buf[off : off + 4], "little")
            micro32 = int.from_bytes(buf[off + 4 : off + 6], "little")
            ts = HARP_EPOCH + pd.Timedelta(seconds=sec, microseconds=micro32 * 32)
            off += 6
        payload = bytes(buf[off : end - 1])  # excludes checksum
        values = (
            np.frombuffer(payload, dtype="<f4").tolist()
            if len(payload) % 4 == 0 and len(payload) > 0
            else None
        )
        rows.append(
            {
                "path": path,
                "msg_type": int(msg_type),
                "address": int(address),
                "port": int(port),
                "payload_type": int(ptype & ~_HAS_TS),
                "time": ts,
                "payload": payload,
                "vector": values,
            }
        )
        i = end
    return pd.DataFrame(
        rows,
        columns=["path", "msg_type", "address", "port", "payload_type", "time", "payload", "vector"],
    )


def encode_harp_messages(
    times: pd.Series, payloads: list[bytes], address: int, payload_type: int = 0x01
) -> bytes:
    """Inverse of :func:`decode_harp_bytes` for write-message streams (K2
    byte-compat sink). Checksum = low byte of the sum of all preceding
    message bytes (Harp spec)."""
    out = bytearray()
    harp_secs = to_harp_seconds(pd.Series(pd.to_datetime(times)))
    for ts_sec, payload in zip(harp_secs, payloads):
        sec = int(ts_sec)
        micro32 = int(round((ts_sec - sec) * 1_000_000 / 32))
        body = bytearray()
        body.append(2)  # write message
        length = 3 + 6 + len(payload) + 1  # addr..checksum
        body.append(length)
        body.append(address & 0xFF)
        body.append(0xFF)  # port
        body.append(payload_type | _HAS_TS)
        body += sec.to_bytes(4, "little")
        body += micro32.to_bytes(2, "little")
        body += payload
        checksum = sum(body) & 0xFF
        body.append(checksum)
        out += body
    return bytes(out)


def read_harp(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed decode: binaryFile scan → mapInPandas framing.

    Each input file becomes one task; at 100 TB the chunk layout (1-hour
    files) gives natural parallelism and partition pruning happens at the
    file-listing level (``pathGlobFilter``/modifiedAfter options compose)."""
    binf = spark.read.format("binaryFile").load(path_glob)

    def frame(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                yield decode_harp_bytes(row["content"], row["path"])

    return binf.select("path", "content").mapInPandas(frame, HARP_MESSAGE_SCHEMA)
