"""WARC/WET source: record parsing, gzip members, quarantine."""

import gzip

from malstrom_spark.sources.warc import warc_source, wet_text


def _record(rec_id, rtype, uri, payload: bytes, date="2026-01-02T03:04:05Z"):
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rec_id}>\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"Content-Type: text/plain\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def test_warc_source_plain_and_gzip(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    plain = _record("a1", "warcinfo", "-", b"info") + _record(
        "a2", "conversion", "http://x.example/p", "téxt one".encode()
    )
    (d / "seg0.warc").write_bytes(plain)
    # multi-member gzip: one member per record, the Common Crawl layout
    gz = gzip.compress(
        _record("b1", "conversion", "http://y.example/q", b"text two")
    ) + gzip.compress(_record("b2", "request", "http://y.example/q", b"GET /q"))
    (d / "seg1.warc.gz").write_bytes(gz)

    recs = warc_source(spark, str(d)).collect()
    by_id = {r.record_id: r for r in recs if r.record_id}
    assert len(recs) == 4 and len(by_id) == 4
    assert by_id["<urn:uuid:a2>"].warc_type == "conversion"
    assert by_id["<urn:uuid:a2>"].content_length == len("téxt one".encode())
    assert bytes(by_id["<urn:uuid:b1>"].payload) == b"text two"
    assert by_id["<urn:uuid:b2>"].target_uri == "http://y.example/q"

    texts = {r.target_uri: r.text for r in wet_text(warc_source(spark, str(d))).collect()}
    assert texts == {"http://x.example/p": "téxt one", "http://y.example/q": "text two"}


def test_warc_source_quarantines_corruption_keeps_prefix(spark, tmp_path):
    d = tmp_path / "bad"
    d.mkdir()
    good = _record("g1", "conversion", "http://ok.example", b"fine")
    # truncated second record: claims 100 bytes, provides 3
    trunc = good + (
        b"WARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: 100\r\n\r\nabc"
    )
    (d / "seg.warc").write_bytes(trunc)
    (d / "junk.warc").write_bytes(b"NOT A WARC FILE AT ALL")

    recs = warc_source(spark, str(d)).collect()
    errs = [r for r in recs if r.warc_type == "parse_error"]
    ok = [r for r in recs if r.warc_type == "conversion"]
    # the well-formed record before the truncation survives
    assert len(ok) == 1 and bytes(ok[0].payload) == b"fine"
    assert len(errs) == 2
    reasons = {r.target_uri for r in errs}
    assert "truncated payload" in reasons
    assert "expected WARC/ version line" in reasons


def test_warc_gzip_truncated_member_preserves_prefix(spark, tmp_path):
    """A .warc.gz cut off mid-member (the canonical crawl corruption)
    must quarantine, not crash, and every record from the complete
    members before it must survive."""
    d = tmp_path / "gz"
    d.mkdir()
    m1 = gzip.compress(_record("g1", "conversion", "http://ok.example/1", b"one"))
    m2 = gzip.compress(_record("g2", "conversion", "http://ok.example/2", b"two"))
    (d / "trunc.warc.gz").write_bytes(m1 + m2[: len(m2) // 2])
    # corrupt deflate bytes inside a member (zlib.error path)
    (d / "garbage.warc.gz").write_bytes(
        m1 + b"\x1f\x8b\x08\x00" + b"\xff" * 20
    )
    recs = warc_source(spark, str(d)).collect()
    by_file = {}
    for r in recs:
        by_file.setdefault(r.warc_file.rsplit("/", 1)[-1], []).append(r)
    for fname in ("trunc.warc.gz", "garbage.warc.gz"):
        rows = by_file[fname]
        ok = [r for r in rows if r.warc_type == "conversion"]
        errs = [r for r in rows if r.warc_type == "parse_error"]
        assert len(ok) == 1 and bytes(ok[0].payload) == b"one", fname
        assert len(errs) == 1, (fname, errs)
        assert "gzip" in errs[0].target_uri, (fname, errs[0].target_uri)


def test_wet_text_lenient_on_invalid_utf8(spark, tmp_path):
    """ADVICE r7: F.decode(_, 'UTF-8') raises on malformed bytes in
    Spark 3.5+; crawl payloads routinely contain them. wet_text must
    replace, not fail."""
    from malstrom_spark.sources.warc import warc_source, wet_text

    body = b"good text \xff\xfe bad bytes"
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Record-ID: <urn:uuid:1>\r\n"
        b"WARC-Target-URI: http://ex.com/\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n"
        b"\r\n" + body + b"\r\n\r\n"
    )
    p = tmp_path / "a.warc"
    p.write_bytes(rec)
    rows = wet_text(warc_source(spark, str(p))).collect()
    assert len(rows) == 1
    assert rows[0].text == "good text \ufffd\ufffd bad bytes"


def test_sniff_charset_rejects_non_text_codecs():
    """ADVICE r9: codecs.lookup() resolves non-text codecs (rot13,
    hex_codec...), so an adversarial <meta charset=rot13> page passed
    validation and then killed the decode task with LookupError. The
    sniffer must fall back to utf-8 for anything bytes.decode() cannot
    actually use."""
    from malstrom_spark.sources.warc import sniff_charset

    for label in (b"rot13", b"hex_codec", b"zlib_codec", b"base64_codec"):
        body = b'<meta charset="' + label + b'"><p>x</p>'
        enc = sniff_charset(b"", body)
        assert body.decode(enc, errors="replace")  # must not raise
        assert enc == "utf-8"
    # real text encodings still honored
    assert sniff_charset(b"", b'<meta charset="latin-1">') == "latin-1"


def test_sniff_charset_utf32_bom_beats_utf16_prefix():
    """ADVICE r9: BOM_UTF32_LE (ff fe 00 00) has BOM_UTF16_LE (ff fe)
    as a prefix; the 4-byte checks must run first or UTF-32-LE pages
    decode as NUL-riddled UTF-16."""
    import codecs

    from malstrom_spark.sources.warc import sniff_charset

    for enc, bom in (("utf-32-le", codecs.BOM_UTF32_LE),
                     ("utf-32-be", codecs.BOM_UTF32_BE)):
        body = bom + "héllo".encode(enc)
        label = sniff_charset(b"", body)
        assert body.decode(label) == "héllo", (enc, label)
    # UTF-16 BOMs still sniff as utf-16
    body16 = codecs.BOM_UTF16_LE + "héllo".encode("utf-16-le")
    assert body16.decode(sniff_charset(b"", body16)) == "héllo"


def test_warc_sink_roundtrip_gzip_memberwise(spark, tmp_path):
    # write -> read returns identical records, and each record is its
    # own gzip member (the Common Crawl layout warc_source depends on)
    from malstrom_spark.sources.warc import warc_sink

    rows = [
        ("conversion", "<urn:uuid:r1>", "2026-01-02T03:04:05Z",
         "http://a.example/p", "text/plain", "téxt one".encode()),
        ("response", "<urn:uuid:r2>", "2026-01-02T03:04:06Z",
         "http://b.example/q", "application/http; msgtype=response",
         b"HTTP/1.1 200 OK\r\n\r\nbody"),
        ("warcinfo", "<urn:uuid:r3>", None, None, None, b"info"),
    ]
    df = spark.createDataFrame(
        rows,
        "warc_type string, record_id string, warc_date string, "
        "target_uri string, content_type string, payload binary",
    ).coalesce(1)
    out = str(tmp_path / "out")
    manifest = warc_sink(df, out).collect()
    assert len(manifest) == 1
    assert manifest[0].n_records == 3 and manifest[0].n_skipped == 0
    path = manifest[0].warc_file
    assert path.endswith(".warc.gz")

    # gzip member-wise: 3 records -> 3 members
    blob = open(path, "rb").read()
    import zlib
    members = 0
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(wbits=31)
        d.decompress(blob[pos:])
        assert d.eof
        members += 1
        pos = len(blob) - len(d.unused_data)
    assert members == 3

    back = {r.record_id: r for r in warc_source(spark, out).collect()}
    assert len(back) == 3
    for wt, rid, wd, uri, ct, pl in rows:
        r = back[rid]
        assert (r.warc_type, r.warc_date, r.target_uri, r.content_type) == (
            wt, wd, uri, ct
        )
        assert bytes(r.payload) == pl and r.content_length == len(pl)


def test_warc_sink_plain_multifile_and_quarantine_skip(spark, tmp_path):
    from malstrom_spark.sources.warc import warc_sink

    rows = [
        ("conversion", f"<urn:uuid:d{i}>", "2026-01-01T00:00:00Z",
         f"http://x.example/{i}", "text/plain", f"doc {i}".encode())
        for i in range(10)
    ] + [("parse_error", None, None, "gzip member at byte 0: bad", None, b"x")]
    df = spark.createDataFrame(
        rows,
        "warc_type string, record_id string, warc_date string, "
        "target_uri string, content_type string, payload binary",
    )
    out = str(tmp_path / "plain")
    manifest = warc_sink(df, out, gzip_output=False, n_files=3).collect()
    files = [r for r in manifest if r.warc_file]
    assert 1 <= len(files) <= 3
    assert sum(r.n_records for r in manifest) == 10
    assert sum(r.n_skipped for r in manifest) == 1  # quarantine row skipped
    back = warc_source(spark, out).collect()
    assert sorted(r.target_uri for r in back) == sorted(
        f"http://x.example/{i}" for i in range(10)
    )
    assert all(r.warc_type == "conversion" for r in back)


def test_warc_sink_rejects_header_crlf_and_missing_columns(spark, tmp_path):
    import pytest as _pytest

    from malstrom_spark.sources.warc import _serialize_warc_record, warc_sink

    with _pytest.raises(ValueError, match="CR/LF"):
        _serialize_warc_record("conversion", "id", None,
                               "http://x/\r\nWARC-Type: smuggled", None, b"")
    df = spark.createDataFrame([(1,)], "doc_id long")
    with _pytest.raises(ValueError, match="missing columns"):
        warc_sink(df, str(tmp_path / "nope"))
