"""External push sinks (SURVEY §2.1 S11/S12/S14/S15).

The reference pushed results OUT of the cluster four ways:

- S12 Redis rank lists — ``jedis.hset("t_rank_list", key, varint(topN))``
  with the hand-rolled LEB128 varint pack (`rank/reports/StarRank.scala:
  113-143`), plus pipelined ``zadd``+``expire`` in the dead realtime
  variant (`homed/realtime/UserStatistics.scala:166-207`).
- S14 HTTP push — POST a small JSON to the recommender
  (`rank/reports/StarRank.scala:94-110`, `utils/PushTools.java`).
- S11 HBase raw cells — ``rdd.saveAsNewAPIHadoopDataset`` with
  ``TableOutputFormat`` (`utils/DBUtils.scala:115-132`): each row becomes
  Put mutations of (rowkey, column-family:qualifier, value) cells.
- S15 local report file — a ``PrintWriter`` monitor summary
  (`monitor/MonitorApp.scala:45-48`).

None of those servers exists in this container, so the TRANSPORT is
injectable (the multimodal-codec precedent: the Spark-side shape — row →
cell/payload encoding, per-partition client lifecycle, batched pipeline
flushes, bounded driver-side collects — is real and tested; the socket is
a boundary).  The default transport is a file-backed client that appends
JSON-line records from EXECUTOR Python workers, which both makes the
side-effects verifiable (read the records back as a DataFrame and
oracle-check the roundtrip) and mirrors how a real client would be used:
one connection per partition, batched writes, close in ``finally``.

Scale notes (how each behaves on a 1000-executor cluster):

- Rank-list publish is ``foreachPartition`` over an already-bounded topN
  frame (K keys × N entries); each partition opens ONE client and flushes
  in ``pipeline_size`` batches — the jedis-pipeline shape, never one RTT
  per row.
- HBase cell encode is a pure native-expression transform (explode of a
  struct array — no Python in the row path) and the rowkey carries a
  hash salt prefix so Puts spread across region servers instead of
  hot-spotting one (the classic monotonic-rowkey failure); the cell frame
  is repartitioned by rowkey so one partition's Puts land in few regions.
- HTTP push collects a BOUNDED topN (asserted) to the driver and POSTs
  one JSON — the reference's own shape; retries with backoff.
- The report file renders bounded per-section summaries driver-side.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Callable, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import hash64

# --------------------------------------------------------------------------
# S12: varint rank-list codec (the reference's encodeToRedisDD byte format,
# `rank/reports/StarRank.scala:135-143`): LEB128-style unsigned varints —
# 7-bit groups, low group first, high bit = continuation — encoding
# [len*2, a_0, b_0, a_1, b_1, ...] for a list of (a, b) pairs.


def varint_bytes(n: int) -> bytes:
    """LEB128 unsigned varint of a non-negative int (plain Python)."""
    if n < 0:
        raise ValueError(f"varint encodes non-negative ints, got {n}")
    out = bytearray()
    while n & ~0x7F:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)
    return bytes(out)


def varint_decode_all(buf: bytes) -> list[int]:
    """Decode a concatenation of LEB128 varints."""
    vals, cur, shift = [], 0, 0
    for byte in buf:
        cur |= (byte & 0x7F) << shift
        if byte & 0x80:
            shift += 7
        else:
            vals.append(cur)
            cur, shift = 0, 0
    if shift:
        raise ValueError("truncated varint stream")
    return vals


def pack_rank_list_col(ns: str | Column, uids: str | Column) -> Column:
    """Arrow-batched encode of two parallel bigint arrays into the
    reference's rank-list payload (len*2 varint, then (n, uid) varint
    pairs).  A vectorized pandas UDF: byte-string assembly is the one
    thing `pyspark.sql.functions` cannot express; the lists are bounded
    topN so the Python cost is per-key, not per-event."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _pack(ns_s: pd.Series, uids_s: pd.Series) -> pd.Series:
        out = []
        for ns_v, uids_v in zip(ns_s, uids_s):
            buf = bytearray(varint_bytes(2 * len(ns_v)))
            for a, b in zip(ns_v, uids_v):
                buf += varint_bytes(int(a))
                buf += varint_bytes(int(b))
            out.append(bytes(buf))
        return pd.Series(out)

    return _pack(ns, uids)


def unpack_rank_list_col(payload: str | Column) -> Column:
    """Inverse of :func:`pack_rank_list_col`: payload → struct of the two
    parallel arrays (validates the length header)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<ns:array<bigint>, uids:array<bigint>>")
    def _unpack(payload_s: pd.Series) -> pd.DataFrame:
        ns_out, uid_out = [], []
        for buf in payload_s:
            vals = varint_decode_all(bytes(buf))
            # header = pairs*2 = the number of varints that follow
            if not vals or vals[0] != len(vals[1:]) or len(vals[1:]) % 2:
                raise ValueError("corrupt rank-list payload")
            ns_out.append(vals[1::2])
            uid_out.append(vals[2::2])
        return pd.DataFrame({"ns": ns_out, "uids": uid_out})

    return _unpack(payload)


# --------------------------------------------------------------------------
# File-backed KV client: the injectable transport.  Mimics the slice of
# the jedis surface the reference used (hset + expire, pipelined); every
# record is one JSON line so executor workers can append concurrently
# (one file per partition, uuid-named — no coordination needed) and Spark
# can read the "database" back for verification.


class FileBackedKVClient:
    """hset/expire/put recorded as JSON lines under ``root`` — one file
    per client (= per partition), flushed in pipeline batches."""

    def __init__(self, root: str, pipeline_size: int = 128):
        self.root = root
        self.pipeline_size = pipeline_size
        self._buf: list[dict] = []
        os.makedirs(root, exist_ok=True)
        self._path = os.path.join(root, f"part-{uuid.uuid4().hex}.jsonl")

    def hset(self, table: str, key: str, value: bytes) -> None:
        self._buf.append(
            {"op": "hset", "table": table, "key": key, "value_hex": value.hex()}
        )
        if len(self._buf) >= self.pipeline_size:
            self.flush()

    def put_cell(self, table: str, rowkey: str, qualifier: str, value: str) -> None:
        self._buf.append(
            {
                "op": "put",
                "table": table,
                "key": rowkey,
                "qualifier": qualifier,
                "cell": value,
            }
        )
        if len(self._buf) >= self.pipeline_size:
            self.flush()

    def expire(self, table: str, ttl_sec: int) -> None:
        self._buf.append({"op": "expire", "table": table, "ttl": ttl_sec})

    def flush(self) -> None:
        if not self._buf:
            return
        with open(self._path, "a", encoding="utf-8") as f:
            for rec in self._buf:
                f.write(json.dumps(rec, sort_keys=True) + "\n")
        self._buf = []

    def close(self) -> None:
        self.flush()


_RECORD_SCHEMA = (
    "op string, table string, key string, value_hex string,"
    " qualifier string, cell string, ttl bigint"
)


def read_kv_records(spark: SparkSession, root: str) -> DataFrame:
    """Read a file-backed client's records back as a DataFrame."""
    return spark.read.schema(_RECORD_SCHEMA).json(root)


# --------------------------------------------------------------------------
# S12: the publish operator.


def publish_rank_lists(
    df: DataFrame,
    client_factory: Callable[[], FileBackedKVClient],
    table: str = "t_rank_list",
    ttl_sec: int = 86400,
    key_col: str = "rank_key",
    payload_col: str = "payload",
) -> None:
    """S12: ``hset(table, key, payload)`` for every row, executor-side.

    One client per partition, pipelined flushes, ``expire`` issued once
    per partition after its rows (the reference called it per job,
    `homed/realtime/UserStatistics.scala:200-205`; per-partition is the
    idempotent distributed equivalent), close in ``finally``."""

    def _publish(rows) -> None:
        client = client_factory()
        try:
            any_row = False
            for r in rows:
                client.hset(table, r[key_col], bytes(r[payload_col]))
                any_row = True
            if any_row:
                client.expire(table, ttl_sec)
        finally:
            client.close()

    df.select(key_col, payload_col).foreachPartition(_publish)


# --------------------------------------------------------------------------
# S11: HBase cell encode (pure native expressions) + Put sink.


def encode_hbase_cells(
    df: DataFrame,
    rowkey_cols: Sequence[str],
    value_cols: Sequence[str],
    cf: str = "d",
    salt_buckets: int = 16,
) -> DataFrame:
    """Row → HBase cells, fully in native expressions (no Python in the
    row path): rowkey = zero-padded hash salt ++ ':' ++ rowkey cols
    (salting spreads monotonic keys across region servers — the S11
    at-scale correction the reference's raw ``TableOutputFormat`` write
    lacked), one output row per (rowkey, cf:qualifier, value) cell.

    ``value_cols`` values should render identically via CAST AS STRING in
    every engine (integers; pre-format decimals upstream)."""
    key_str = F.concat_ws("|", *[F.col(c).cast("string") for c in rowkey_cols])
    salt = F.lpad(
        (hash64(key_str, "hbase_salt") % salt_buckets).cast("string"), 2, "0"
    )
    cells = F.array(
        *[
            F.struct(
                F.lit(f"{cf}:{c}").alias("qualifier"),
                F.col(c).cast("string").alias("cell"),
            )
            for c in value_cols
        ]
    )
    return (
        df.withColumn("rowkey", F.concat(salt, F.lit(":"), key_str))
        .select("rowkey", F.explode(cells).alias("c"))
        .select("rowkey", "c.qualifier", "c.cell")
    )


def write_hbase_cells(
    cells: DataFrame,
    client_factory: Callable[[], FileBackedKVClient],
    table: str,
    n_partitions: int | None = None,
) -> None:
    """S11: batched Put mutations, executor-side.  Repartitioning by
    rowkey keeps one partition's Puts clustered in few regions (fewer
    server round-trips per flush batch)."""
    out = cells
    if n_partitions:
        out = cells.repartition(n_partitions, "rowkey")

    def _put(rows) -> None:
        client = client_factory()
        try:
            for r in rows:
                client.put_cell(table, r["rowkey"], r["qualifier"], r["cell"])
        finally:
            client.close()

    out.foreachPartition(_put)


# --------------------------------------------------------------------------
# S14: HTTP push (driver-side bounded topN POST, injectable poster).


def default_poster(url: str, payload: str) -> int:  # pragma: no cover
    """Real-transport boundary: no network egress exists in the test
    container, so the live POST is a documented stub — inject a poster
    (tests use a recording fake) exactly as multimodal injects codecs."""
    raise NotImplementedError(
        "no network in the test container; inject poster=... "
        "(any callable (url, json_str) -> status_code)"
    )


def push_topn_json(
    df: DataFrame,
    url: str,
    topn: int = 10,
    poster: Callable[[str, str], int] = default_poster,
    max_retries: int = 3,
    order_cols: Sequence[str] = (),
) -> str:
    """S14: POST a bounded topN as one JSON document (the reference's
    recommender push, `rank/reports/StarRank.scala:94-110`).

    The collect is bounded by construction — ``limit(topn + 1)`` then an
    assert, so a mis-sized upstream fails loudly instead of OOMing the
    driver (the bounded-collect rule).  Retries with linear backoff;
    returns the payload for test inspection."""
    import time

    ordered = df.orderBy(*order_cols) if order_cols else df
    rows = ordered.limit(topn + 1).collect()
    assert len(rows) <= topn, (
        f"push_topn_json expected ≤{topn} rows, upstream produced more — "
        "bound the frame before pushing"
    )
    payload = json.dumps(
        {"type": 10, "value": [r.asDict() for r in rows]}, sort_keys=True
    )
    last: Exception | None = None
    for attempt in range(max_retries):
        try:
            status = poster(url, payload)
            if 200 <= status < 300:
                return payload
            last = RuntimeError(f"HTTP {status}")
        except NotImplementedError:
            raise
        except Exception as e:  # noqa: BLE001 — transport errors retry
            last = e
        time.sleep(0.01 * (attempt + 1))
    raise RuntimeError(f"push failed after {max_retries} attempts: {last}")


# --------------------------------------------------------------------------
# S15: local report file (PrintWriter analog).


def write_report_file(path: str, sections: Sequence[tuple[str, str]]) -> str:
    """S15: the monitor summary file (`monitor/MonitorApp.scala:45-48`) —
    titled sections joined by the reference's separator line, written
    atomically (tmp + rename) so a crashed writer never leaves a torn
    report.  Returns the rendered content."""
    sep = "\n" + "=" * 60 + "\n"
    content = sep.join(f"[{title}]\n{body}" for title, body in sections)
    tmp = f"{path}.__tmp_{uuid.uuid4().hex}"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(content)
    os.replace(tmp, path)
    return content


def render_section(df: DataFrame, max_rows: int = 100) -> str:
    """Bounded, deterministic text rendering of a summary frame (the
    reference built section strings from collected report rows)."""
    rows = df.limit(max_rows + 1).collect()
    assert len(rows) <= max_rows, f"report section exceeds {max_rows} rows"
    cols = df.columns
    lines = ["\t".join(cols)]
    for r in rows:
        lines.append("\t".join(str(r[c]) for c in cols))
    return "\n".join(lines)
