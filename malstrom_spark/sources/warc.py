"""WARC / WET crawl-archive source — the container format web-scale
training corpora actually arrive in (ISO 28500; Common Crawl's
.warc/.warc.gz and the text-extracted .wet form).

Spark-first shape: `spark.read.format("binaryFile")` lists and
distributes the archive FILES (Common Crawl ships ~1 GB-gzipped
segments, ~100k files per crawl — file-level parallelism is the
standard unit; a 100 TB crawl saturates any executor count), and a
`mapInPandas` parser expands each file into its records. Gzip is
handled member-wise (crawl archives are multi-member gzip, one member
per record, precisely so consumers can stream them); plain WARC is
parsed by offset. Malformed tails never kill the job: parsing stops
at the corruption point and emits a single `parse_error` record
carrying the file path and a bounded snippet, mirroring
`jsonl_corpus_source`'s quarantine contract.

Batch only by design: crawl segments are immutable once written, so
incremental ingestion is "new files in the prefix" — point
`file_stream` at the same glob for the streaming variant.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_SCHEMA = (
    "warc_file string, record_id string, warc_type string, "
    "warc_date string, target_uri string, content_type string, "
    "content_length long, payload binary"
)

_MAX_ERR_SNIPPET = 1024


def _gunzip_members(blob: bytes) -> tuple[bytes, str | None]:
    """Decompress a multi-member gzip blob MEMBER BY MEMBER (zlib
    wbits=31 stops at each member boundary; unused_data carries the
    rest). Returns (all bytes decompressed up to the first corrupt or
    truncated member, error message or None) — so every record in the
    well-formed prefix survives a damaged tail, the contract the
    quarantine promises."""
    import zlib

    out = bytearray()
    # memoryview: slicing must not copy — a ~1 GB segment holds tens of
    # thousands of one-record members, and a bytes-slice per member
    # would make the loop quadratic in segment size.
    view = memoryview(blob)
    pos, n = 0, len(blob)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        try:
            member = d.decompress(view[pos:])
        except zlib.error as e:
            return bytes(out), f"gzip member at byte {pos}: {e}"
        if not d.eof:
            # partial member: do NOT commit its bytes — records must
            # come only from complete members
            return bytes(out), f"gzip member at byte {pos}: truncated"
        out += member
        pos = n - len(d.unused_data)
        # tolerate (and stop at) trailing garbage that is not another
        # gzip member
        if pos < n and view[pos : pos + 2] != b"\x1f\x8b":
            return bytes(out), f"trailing non-gzip bytes at {pos}"
    return bytes(out), None


def _parse_warc_bytes(path: str, blob: bytes):
    """Yield record dicts from one (possibly multi-member gzip) WARC
    blob; on malformed input, yield every well-formed record BEFORE
    the corruption point, then one terminal parse_error record."""
    gz_err = None
    tail = blob[-_MAX_ERR_SNIPPET:]
    if blob[:2] == b"\x1f\x8b":
        blob, gz_err = _gunzip_members(blob)
    emitted_err = False
    for rec in _records(path, blob):
        emitted_err = rec["warc_type"] == "parse_error"
        yield rec
    if gz_err is not None and not emitted_err:
        yield _err(path, gz_err, tail)


def _records(path: str, blob: bytes):
    pos, n = 0, len(blob)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and blob[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        if not blob[pos:].startswith(b"WARC/"):
            yield _err(path, "expected WARC/ version line",
                       blob[pos : pos + _MAX_ERR_SNIPPET])
            return
        hdr_end = blob.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            yield _err(path, "unterminated header block",
                       blob[pos : pos + _MAX_ERR_SNIPPET])
            return
        headers: dict[str, str] = {}
        for line in blob[pos:hdr_end].split(b"\r\n")[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().lower().decode("ascii", "replace")] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            yield _err(path, "missing/invalid Content-Length",
                       blob[pos : pos + _MAX_ERR_SNIPPET])
            return
        body_start = hdr_end + 4
        if body_start + length > n:
            yield _err(path, "truncated payload",
                       blob[pos : pos + _MAX_ERR_SNIPPET])
            return
        yield {
            "warc_file": path,
            "record_id": headers.get("warc-record-id"),
            "warc_type": headers.get("warc-type"),
            "warc_date": headers.get("warc-date"),
            "target_uri": headers.get("warc-target-uri"),
            "content_type": headers.get("content-type"),
            "content_length": length,
            "payload": blob[body_start : body_start + length],
        }
        pos = body_start + length


def _err(path: str, msg: str, snippet: bytes) -> dict:
    return {
        "warc_file": path,
        "record_id": None,
        "warc_type": "parse_error",
        "warc_date": None,
        "target_uri": msg,
        "content_type": None,
        "content_length": None,
        "payload": snippet,
    }


def warc_source(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC/WET archives under `path` (glob ok) into one row per
    record: (warc_file, record_id, warc_type, warc_date, target_uri,
    content_type, content_length, payload binary). `warc_type =
    'parse_error'` rows mark corrupt files (target_uri carries the
    reason) — filter or alert on them; well-formed records BEFORE the
    corruption point are preserved.

    Scale note: one task per archive file (binaryFile source); memory
    per task is one decompressed segment, the same envelope any
    Common Crawl reader budgets for."""
    raw = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches):
        for pdf in batches:
            for path_, blob in zip(pdf["path"], pdf["content"]):
                recs = list(_parse_warc_bytes(path_, bytes(blob)))
                if recs:
                    yield pd.DataFrame(recs)

    return raw.mapInPandas(parse, WARC_SCHEMA)


def wet_text(records: DataFrame) -> DataFrame:
    """Extract the text documents from a WET read: conversion records
    decoded as UTF-8 (invalid bytes replaced, the crawl-standard
    lenient decode), keyed by target URI. Output: (warc_file,
    record_id, target_uri, warc_date, text) — feed straight into the
    doc_* quality/dedup pipelines.

    The decode is Python-side (Arrow-batched pandas_udf with
    errors='replace') deliberately: Spark's `F.decode(_, 'UTF-8')`
    raises MALFORMED_CHARACTER_CODING on invalid bytes (Spark 3.5+),
    and real crawl payloads routinely contain them — one bad record
    must not fail the job."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _utf8_replace(payload: pd.Series) -> pd.Series:
        return payload.map(
            lambda b: None if b is None else bytes(b).decode("utf-8", errors="replace")
        )

    return records.where(F.col("warc_type") == "conversion").select(
        "warc_file",
        "record_id",
        "target_uri",
        "warc_date",
        _utf8_replace(F.col("payload")).alias("text"),
    )


_META_CHARSET = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)""", re.IGNORECASE
)
_HEADER_CHARSET = re.compile(
    rb"content-type:[^\r\n]*charset\s*=\s*\"?([A-Za-z0-9_\-]+)", re.IGNORECASE
)


def sniff_charset(headers: bytes, body: bytes) -> str:
    """Charset detection for captured HTTP bodies, WHATWG priority
    order: byte-order mark, then the Content-Type header's charset
    parameter, then a <meta charset> / http-equiv declaration in the
    first 1024 body bytes, else UTF-8. Unknown/garbage labels fall
    back to UTF-8 (decode is errors='replace' anyway — wrong guesses
    degrade, never fail)."""
    import codecs

    if body.startswith(codecs.BOM_UTF8):
        return "utf-8-sig"
    # UTF-32 BOMs first: BOM_UTF32_LE (ff fe 00 00) has BOM_UTF16_LE
    # (ff fe) as a prefix, so the 4-byte checks must win the race or
    # UTF-32-LE pages decode as NUL-riddled UTF-16.
    if body.startswith(codecs.BOM_UTF32_LE) or body.startswith(
        codecs.BOM_UTF32_BE
    ):
        return "utf-32"  # stdlib consumes the BOM itself
    if body.startswith(codecs.BOM_UTF16_LE) or body.startswith(
        codecs.BOM_UTF16_BE
    ):
        return "utf-16"  # stdlib consumes the BOM itself
    m = _HEADER_CHARSET.search(headers) or _META_CHARSET.search(body[:1024])
    if m:
        label = m.group(1).decode("ascii", "replace").strip().lower()
        try:
            info = codecs.lookup(label)
            # codecs.lookup also resolves NON-text codecs (rot13,
            # hex_codec, zlib_codec...); bytes.decode() raises
            # LookupError('not a text encoding') on those, so a page
            # declaring <meta charset=rot13> would kill the task —
            # violating the one-bad-page-degrades contract. Only
            # accept real text encodings.
            if getattr(info, "_is_text_encoding", True):
                return label
        except LookupError:
            pass
    return "utf-8"


def response_text(records: DataFrame, extract: bool = True) -> DataFrame:
    """Extract text from WARC *response* records — the form crawls
    actually capture (raw HTTP exchange: status line + headers +
    CRLFCRLF + HTML body), upstream of WET. Strips the HTTP header
    block, decodes the body in its DECLARED charset (BOM > header
    charset > meta charset > UTF-8, `sniff_charset`) with
    errors='replace' (same leniency contract as wet_text — one bad
    page must not fail the job), and when `extract`, runs
    functions/html.html_to_text over it. Output: (warc_file,
    record_id, target_uri, warc_date, html[, text]).

    Header strip + sniff + decode share ONE Arrow batch pass;
    extraction is a second pandas_udf over the same scan — still a
    zero-shuffle projection at file parallelism. A record with no
    CRLFCRLF (header block truncated in capture) is treated as
    all-body rather than dropped."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _http_body(payload: pd.Series) -> pd.Series:
        def body(b) -> str | None:
            if b is None:
                return None
            raw = bytes(b)
            hdrs = b""
            cut = raw.find(b"\r\n\r\n")
            if cut >= 0 and raw[:5] in (b"HTTP/", b"http/"):
                hdrs, raw = raw[:cut], raw[cut + 4 :]
            try:
                return raw.decode(sniff_charset(hdrs, raw), errors="replace")
            except LookupError:
                # last-ditch: a label that resolved at sniff time but
                # is not decodable must still not fail the batch
                return raw.decode("utf-8", errors="replace")

        return payload.map(body)

    out = records.where(F.col("warc_type") == "response").select(
        "warc_file",
        "record_id",
        "target_uri",
        "warc_date",
        _http_body(F.col("payload")).alias("html"),
    )
    if extract:
        from ..functions.html import html_to_text

        out = out.withColumn("text", html_to_text(F.col("html")))
    return out


# --------------------------------------------------------------- writer


def _serialize_warc_record(
    warc_type: str | None,
    record_id: str | None,
    warc_date: str | None,
    target_uri: str | None,
    content_type: str | None,
    payload: bytes,
) -> bytes:
    """One ISO 28500 record: WARC/1.0 version line, the headers that
    are present, Content-Length computed from the payload, then
    CRLFCRLF + payload + CRLFCRLF — byte-symmetric with `_records`,
    so write -> read returns the same
    (record_id, warc_type, warc_date, target_uri, content_type,
    content_length, payload) tuple."""
    lines = [b"WARC/1.0"]
    for key, val in (
        (b"WARC-Type", warc_type),
        (b"WARC-Record-ID", record_id),
        (b"WARC-Date", warc_date),
        (b"WARC-Target-URI", target_uri),
        (b"Content-Type", content_type),
    ):
        if val is None:
            continue
        v = str(val)
        if "\r" in v or "\n" in v:
            raise ValueError(f"WARC header {key.decode()} contains CR/LF: {v!r}")
        lines.append(key + b": " + v.encode("utf-8"))
    lines.append(b"Content-Length: " + str(len(payload)).encode("ascii"))
    return b"\r\n".join(lines) + b"\r\n\r\n" + payload + b"\r\n\r\n"


#: manifest row emitted per written archive file
WARC_SINK_MANIFEST_SCHEMA = (
    "warc_file string, n_records long, n_skipped long, n_bytes long"
)


def warc_sink(
    records: DataFrame,
    out_dir: str,
    gzip_output: bool = True,
    n_files: int | None = None,
) -> DataFrame:
    """Write records as WARC archives under `out_dir` — the crawl
    round-trip's other half (reader: `warc_source`; the reference's
    stateful file sink analog, sinks/stateful.rs:26). One archive per
    partition, each record ITS OWN gzip member (the Common Crawl
    layout `_gunzip_members` depends on), so the output is re-read
    by `warc_source` record-for-record (round-trip pytest-pinned,
    gzip member-wise).

    Input: any frame with (warc_type, record_id, warc_date,
    target_uri, content_type, payload) — extra columns ignored,
    NULL headers omitted, Content-Length recomputed from the payload.
    `warc_type = 'parse_error'` rows (quarantine records from a prior
    read) are SKIPPED and counted in the manifest, never re-written
    as if they were captures.

    Exactly-once: each task writes to a temp name and os.replace()s
    it to the deterministic `part-{partition:05d}` target — a retried
    task overwrites its own file, never duplicates it (the
    StatefulSink commit-protocol discipline, local/NFS paths; for
    object stores put a committer in front). The returned manifest
    (one row per archive: path, n_records, n_skipped, n_bytes) is
    eagerly materialized, so the write has happened exactly once by
    the time this returns.

    Scale: file-level parallelism on the way out, exactly as on the
    way in — `n_files` repartitions round-robin to bound archive
    count (Common Crawl targets ~1 GB per segment; pick
    n_files ~ total_bytes / 1 GB)."""
    import gzip as _gzip
    import os
    import uuid

    cols = ["warc_type", "record_id", "warc_date",
            "target_uri", "content_type", "payload"]
    missing = [c for c in cols if c not in records.columns]
    if missing:
        raise ValueError(f"warc_sink input is missing columns: {missing}")
    df = records.select(*cols)
    if n_files is not None:
        df = df.repartition(n_files)
    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if gzip_output else ".warc"

    def write(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        target = os.path.join(out_dir, f"part-{pid:05d}{ext}")
        tmp = f"{target}.inprogress-{uuid.uuid4().hex}"
        n_rec = n_skip = 0
        try:
            with open(tmp, "wb") as fh:
                for pdf in batches:
                    for wt, rid, wd, uri, ct, pl in zip(
                        pdf["warc_type"], pdf["record_id"], pdf["warc_date"],
                        pdf["target_uri"], pdf["content_type"], pdf["payload"],
                    ):
                        if wt == "parse_error":
                            n_skip += 1
                            continue
                        raw = _serialize_warc_record(
                            wt, rid, wd, uri, ct,
                            b"" if pl is None else bytes(pl),
                        )
                        fh.write(
                            _gzip.compress(raw, mtime=0) if gzip_output else raw
                        )
                        n_rec += 1
        except BaseException:
            if os.path.exists(tmp):
                os.remove(tmp)
            raise
        size = os.path.getsize(tmp)
        if size == 0:
            os.remove(tmp)  # empty partition: no archive
            if n_skip:
                # all rows were quarantine records: no archive, but
                # the skip count must not vanish from the manifest
                yield pd.DataFrame(
                    [(None, 0, n_skip, 0)],
                    columns=["warc_file", "n_records", "n_skipped", "n_bytes"],
                )
            return
        os.replace(tmp, target)
        yield pd.DataFrame(
            [(target, n_rec, n_skip, size)],
            columns=["warc_file", "n_records", "n_skipped", "n_bytes"],
        )

    manifest = df.mapInPandas(write, WARC_SINK_MANIFEST_SCHEMA)
    return manifest.localCheckpoint(eager=True)
