"""KREC framed-record binary source — the "another source format" surface.

Web-scale corpora arrive as framed record files (WARC/ARC, TFRecord,
RecordIO): large immutable shards holding length-prefixed records with a
per-record checksum. This module defines a minimal deterministic format
of that family (KREC), a synthesizer that derives shards from the
driver's ``documents`` table (so a static SQL oracle can recompute every
expected aggregate from ``documents`` alone — no side-channel truth), and
a Ray Data ``FileBasedDatasource`` that parses the shards as a streaming
per-file read.

Record layout (little-endian)::

    magic   4s   b"KREC"
    doc_id  u64
    lang    2s   ascii language code
    crc32   u32  of the payload bytes
    plen    u32
    payload plen bytes (document text, utf-8)

Planted corruption: every record whose ``doc_id % 37 == 5`` is written
with ``crc ^ 0xDEADBEEF`` — the reader must surface it as an in-band
``crc_ok = 0`` row (the reference's error-row convention: bad inputs
become data, they never raise; see /root/reference/app.py error dicts).

Scale notes (100 TB): one read TASK per shard file (Ray's file-based
read planning), records stream through a bounded chunk buffer
(``CHUNK_RECORDS``) so a shard never materializes whole; the per-record
framing walk is O(1) header decode + one crc32 (a C call) per record —
the same cost class as any record-framed format, and the place a
deployment would drop in a compiled framing parser. Shards are immutable
and independently parseable, so a failed read retries one file, not the
corpus.
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import TYPE_CHECKING, Iterator, List

import pyarrow as pa
import pyarrow.parquet as pq

from ray.data.datasource import FileBasedDatasource

if TYPE_CHECKING:
    from ray.data.block import Block

MAGIC = b"KREC"
HEADER = struct.Struct("<4sQ2sII")  # magic, doc_id, lang, crc32, plen
CRC_CORRUPT_MOD = 37
CRC_CORRUPT_REM = 5
CRC_FLIP = 0xDEADBEEF
N_SHARDS = 8
CHUNK_RECORDS = 65536


def _fingerprint(path: str) -> str:
    st = os.stat(path)
    return f"{st.st_size}:{st.st_mtime_ns}"


def recfile_cache_dir(sf_dir: str) -> str:
    key = _fingerprint(os.path.join(sf_dir, "documents.parquet")).replace(":", "_")
    return os.path.join("/tmp/khlray_cache", f"recfiles_v1_{key}")


def synthesize_recfiles(sf_dir: str) -> str:
    """Write (once, cached) KREC shards derived from documents.parquet.

    Round-robin by doc_id across N_SHARDS files; deterministic bytes, so
    the shard set is a pure function of the source table. Returns the
    shard directory."""
    from ..state.atomic import ensure_published

    def _build(tmp_dir: str) -> None:
        os.makedirs(tmp_dir, exist_ok=True)
        t = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "lang", "text"],
        )
        doc_ids = t["doc_id"].to_pylist()
        langs = t["lang"].to_pylist()
        texts = t["text"].to_pylist()
        handles = [
            open(os.path.join(tmp_dir, f"shard-{i:03d}.krec"), "wb")
            for i in range(N_SHARDS)
        ]
        try:
            for doc_id, lang, text in zip(doc_ids, langs, texts):
                payload = (text or "").encode("utf-8")
                crc = zlib.crc32(payload) & 0xFFFFFFFF
                if doc_id % CRC_CORRUPT_MOD == CRC_CORRUPT_REM:
                    crc ^= CRC_FLIP
                handles[doc_id % N_SHARDS].write(
                    HEADER.pack(
                        MAGIC,
                        doc_id,
                        (lang or "??").encode("ascii")[:2].ljust(2, b"?"),
                        crc,
                        len(payload),
                    )
                    + payload
                )
        finally:
            for h in handles:
                h.close()

    return ensure_published(recfile_cache_dir(sf_dir), _build)


def parse_krec_bytes(buf: bytes, path: str = "") -> pa.Table:
    """Parse one shard's bytes into (doc_id, lang, n_bytes, crc_ok) —
    shared by the datasource and the sequential tests. A malformed frame
    (bad magic / truncated payload) raises: shard corruption that breaks
    FRAMING is a read error (retry the file), unlike a payload crc
    mismatch which is in-band data."""
    doc_ids: List[int] = []
    langs: List[str] = []
    n_bytes: List[int] = []
    crc_ok: List[int] = []
    mv = memoryview(buf)
    off, end, hsz = 0, len(buf), HEADER.size
    while off < end:
        if off + hsz > end:
            raise ValueError(f"truncated KREC header at {off} in {path!r}")
        magic, doc_id, lang, crc, plen = HEADER.unpack_from(mv, off)
        if magic != MAGIC:
            raise ValueError(f"bad KREC magic at {off} in {path!r}")
        off += hsz
        if off + plen > end:
            raise ValueError(f"truncated KREC payload at {off} in {path!r}")
        payload = mv[off : off + plen]
        off += plen
        doc_ids.append(doc_id)
        langs.append(lang.decode("ascii"))
        n_bytes.append(plen)
        crc_ok.append(int((zlib.crc32(payload) & 0xFFFFFFFF) == crc))
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "lang": pa.array(langs, pa.string()),
            "n_bytes": pa.array(n_bytes, pa.int64()),
            "crc_ok": pa.array(crc_ok, pa.int64()),
        }
    )


class KrecDatasource(FileBasedDatasource):
    """Streaming KREC reader: one read task per shard, records emitted in
    CHUNK_RECORDS-row Arrow blocks so a shard never materializes whole."""

    _FILE_EXTENSIONS = ["krec"]

    def __init__(self, paths, **kwargs):
        kwargs.setdefault("file_extensions", self._FILE_EXTENSIONS)
        super().__init__(paths, **kwargs)

    def _read_stream(self, f: "pa.NativeFile", path: str) -> Iterator["Block"]:
        hsz = HEADER.size
        pending = b""
        chunk: List[bytes] = []
        chunk_rows = 0
        while True:
            data = f.read(8 << 20)
            if not data:
                break
            pending += data if isinstance(data, bytes) else data.to_pybytes()
            # cut pending at the last complete record boundary
            off, end = 0, len(pending)
            while off + hsz <= end:
                _, _, _, _, plen = HEADER.unpack_from(pending, off)
                if off + hsz + plen > end:
                    break
                off += hsz + plen
                chunk_rows += 1
                if chunk_rows >= CHUNK_RECORDS:
                    chunk.append(pending[:off])
                    pending = pending[off:]
                    off, end = 0, len(pending)
                    yield parse_krec_bytes(b"".join(chunk), path)
                    chunk, chunk_rows = [], 0
            if off:
                chunk.append(pending[:off])
                pending = pending[off:]
        if pending:
            raise ValueError(f"trailing partial KREC record in {path!r}")
        if chunk:
            yield parse_krec_bytes(b"".join(chunk), path)
