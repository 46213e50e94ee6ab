"""Wire-format codec for the Trade message (SURVEY §2.2 P7).

The reference moves trades through Kafka as proto3
(proto/currencymarket.proto:7-15; encode consumer/consuming/
service.go:29-31, decode importer/importing/service.go:117-121):

    message Trade {
      string user_id = 1;            string currency_from = 2;
      string currency_to = 3;        int64 amount_sell_micros = 4;
      int64 amount_buy_micros = 5;   int64 time_placed_ms = 6;
      string originating_country = 7;
    }

This module implements that exact wire format in pure Python (proto3
is varints + length-delimited fields — 40 lines for a flat message),
exposed as Arrow-batched pandas UDFs, so the engine produces/consumes
byte-identical Kafka payloads without the spark-protobuf jar or
generated bindings.  When the spark-protobuf connector IS on the
classpath, `from_protobuf`/`to_protobuf` with a descriptor file is the
JVM-side fast path; the UDFs are the dependency-free fallback and the
differential check on it.

proto3 canonical encoding notes honored here:
- fields serialized in field-number order;
- default values (empty string / zero int) are OMITTED;
- int64 encodes as 10-byte two's-complement varint when negative.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_STRING_FIELDS = {1: "user_id", 2: "currency_from", 3: "currency_to",
                  7: "originating_country"}
_INT_FIELDS = {4: "amount_sell_micros", 5: "amount_buy_micros",
               6: "time_placed_ms"}

DECODED_SCHEMA = T.StructType([
    T.StructField("user_id", T.StringType()),
    T.StructField("currency_from", T.StringType()),
    T.StructField("currency_to", T.StringType()),
    T.StructField("amount_sell_micros", T.LongType()),
    T.StructField("amount_buy_micros", T.LongType()),
    T.StructField("time_placed_ms", T.LongType()),
    T.StructField("originating_country", T.StringType()),
])


def _present(v) -> bool:
    """proto3 presence test, null-tolerant: None and NaN (what a null
    long column becomes in a pandas batch) encode as the proto3 default,
    i.e. the field is omitted — same as zero/empty.  Decode returns
    ''/0 for omitted fields, so null and default are indistinguishable
    on the wire, for strings and ints symmetrically (ADVICE r1)."""
    if v is None:
        return False
    if isinstance(v, float) and math.isnan(v):
        return False
    return bool(v)


def _varint(n: int) -> bytes:
    if n < 0:
        n += 1 << 64  # int64 negative -> 10-byte varint (proto3)
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def encode_trade(user_id: str, currency_from: str, currency_to: str,
                 amount_sell_micros: int, amount_buy_micros: int,
                 time_placed_ms: int, originating_country: str) -> bytes:
    """One Trade -> proto3 bytes, byte-identical to proto.Marshal of
    the reference's message."""
    vals = {1: user_id, 2: currency_from, 3: currency_to,
            4: amount_sell_micros, 5: amount_buy_micros,
            6: time_placed_ms, 7: originating_country}
    out = bytearray()
    for tag in sorted(vals):
        v = vals[tag]
        if not _present(v):  # proto3 omits defaults (and nulls/NaN)
            continue
        if tag in _STRING_FIELDS:
            data = v.encode("utf-8")
            out += _varint(tag << 3 | 2) + _varint(len(data)) + data
        else:
            out += _varint(tag << 3 | 0) + _varint(int(v))
    return bytes(out)


def decode_trade(data: bytes) -> dict:
    """proto3 bytes -> Trade dict (defaults for omitted fields);
    raises ValueError on malformed input (the reference log.Fatals —
    importing/service.go:119-121; we surface it to the dead letter)."""
    out = {name: "" for name in _STRING_FIELDS.values()}
    out.update({name: 0 for name in _INT_FIELDS.values()})
    i, n = 0, len(data)

    def read_varint() -> int:
        nonlocal i
        shift = result = 0
        while True:
            if i >= n:
                raise ValueError("truncated varint")
            b = data[i]
            i += 1
            result |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift > 70:
                raise ValueError("varint too long")
        return result

    while i < n:
        key = read_varint()
        tag, wire = key >> 3, key & 7
        if wire == 0:
            v = read_varint()
            if v >= 1 << 63:
                v -= 1 << 64
            if tag in _INT_FIELDS:
                out[_INT_FIELDS[tag]] = v
        elif wire == 2:
            ln = read_varint()
            if i + ln > n:
                raise ValueError("truncated field")
            chunk = data[i:i + ln]
            i += ln
            if tag in _STRING_FIELDS:
                out[_STRING_FIELDS[tag]] = chunk.decode("utf-8")
        else:
            raise ValueError(f"unsupported wire type {wire}")
    return out


def to_trade_proto(trades: DataFrame, out_col: str = "value") -> DataFrame:
    """Normalized trades (storage schema minus rate) -> proto3 payload
    column, Arrow-batched."""
    cols = ["user_id", "currency_from", "currency_to",
            "amount_sell_micros", "amount_buy_micros",
            "time_placed_ms", "originating_country"]
    src = trades.withColumn("time_placed_ms", F.unix_millis("time_placed")) \
        if "time_placed_ms" not in trades.columns else trades

    @F.pandas_udf(T.BinaryType())
    def enc(*series: pd.Series) -> pd.Series:
        return pd.Series([
            encode_trade(*(s.iloc[j] for s in series))
            for j in range(len(series[0]))])

    return src.withColumn(out_col, enc(*[F.col(c) for c in cols]))


def from_trade_proto(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Proto3 payload column -> typed Trade columns (mapInPandas;
    malformed payloads yield a NULL user_id row for dead-lettering)."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw in pdf[value_col]:
                try:
                    rows.append(decode_trade(bytes(raw)))
                except (ValueError, UnicodeDecodeError):
                    rows.append({name: None for name in DECODED_SCHEMA.names})
            yield pd.DataFrame(rows, columns=DECODED_SCHEMA.names)

    return df.select(value_col).mapInPandas(kernel, DECODED_SCHEMA)
