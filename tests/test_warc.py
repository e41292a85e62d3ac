"""WARC source (sources/warc.py): reader round-trips through the
writer, splits HTTP payloads, filters record types, parallelizes
across files, and feeds the curation pipeline head."""

import gzip

import pytest

from osm2pgsql_spark.sources import warc as W


def _mk_records(n, tag=""):
    recs = []
    for i in range(n):
        body = f"<html>doc {tag}{i} body text</html>".encode()
        recs.append({
            "record_id": f"<urn:uuid:{tag}{i:08d}>",
            "warc_type": "response",
            "target_uri": f"https://example.org/{tag}{i}",
            "warc_date": "2026-08-16T00:00:00Z",
            "payload": W.http_response_payload(body),
        })
    # a non-response record the type filter must drop
    recs.append({
        "record_id": f"<urn:uuid:{tag}meta>",
        "warc_type": "warcinfo",
        "target_uri": "",
        "warc_date": "2026-08-16T00:00:00Z",
        "payload": b"software: test",
        "content_type": "application/warc-fields",
    })
    return recs


def test_roundtrip_and_http_split(spark, tmp_path):
    p = str(tmp_path / "a.warc.gz")
    W.write_warc_gz(_mk_records(5), p)
    df = W.read_warc(spark, p)
    rows = {r["record_id"]: r for r in df.collect()}
    assert len(rows) == 6  # 5 responses + warcinfo
    r0 = rows["<urn:uuid:00000000>"]
    assert r0["warc_type"] == "response"
    assert r0["target_uri"] == "https://example.org/0"
    assert r0["http_status"] == 200
    assert r0["http_content_type"] == "text/html"
    assert bytes(r0["payload"]) == b"<html>doc 0 body text</html>"
    meta = rows["<urn:uuid:meta>"]
    assert meta["http_status"] is None
    assert bytes(meta["payload"]) == b"software: test"


def test_type_filter_and_multi_file_parallelism(spark, tmp_path):
    for name, tag in (("a", "a"), ("b", "b"), ("c", "c")):
        W.write_warc_gz(_mk_records(3, tag), str(tmp_path / f"{name}.warc.gz"))
    df = W.read_warc(spark, str(tmp_path), warc_types=("response",))
    assert df.rdd.getNumPartitions() == 3  # one task per file
    rows = df.collect()
    assert len(rows) == 9
    assert {r["file"] for r in rows} == {"a.warc.gz", "b.warc.gz", "c.warc.gz"}
    assert all(r["warc_type"] == "response" for r in rows)


def test_plain_warc_and_truncated_tail(spark, tmp_path):
    # uncompressed .warc plus a truncated trailing gzip member: the
    # reader must stop cleanly, keeping the complete records
    recs = _mk_records(4)
    plain = str(tmp_path / "p.warc")
    with open(plain, "wb") as f:
        for r in recs:
            payload = r["payload"]
            f.write(b"WARC/1.0\r\nWARC-Type: " + r["warc_type"].encode()
                    + b"\r\nWARC-Record-ID: " + r["record_id"].encode()
                    + b"\r\nContent-Length: " + str(len(payload)).encode()
                    + b"\r\n\r\n" + payload + b"\r\n\r\n")
    assert W.read_warc(spark, plain).count() == 5

    gz = str(tmp_path / "t.warc.gz")
    W.write_warc_gz(recs[:3], gz)
    whole = gzip.compress(b"WARC/1.0\r\nWARC-Type: response\r\n"
                          b"Content-Length: 100\r\n\r\nshort")
    with open(gz, "ab") as f:
        f.write(whole[: len(whole) // 2])
    got = W.read_warc(spark, gz).count()
    assert got == 3  # the 3 intact members survive; the torn tail drops


def test_within_file_split_row_identical(spark, tmp_path):
    """One .warc.gz read as N byte-range shards must yield exactly
    the rows of the serial (unsplit) read — shard ownership at gzip
    member boundaries partitions the file's records."""
    recs = _mk_records(120)
    p = str(tmp_path / "big.warc.gz")
    W.write_warc_gz(recs, p)
    size = __import__("os").path.getsize(p)
    serial = sorted(
        (r["record_id"], r["warc_type"], bytes(r["payload"]))
        for r in W.read_warc(spark, p, split_size=None).collect())
    assert len(serial) == 121
    for split in (size // 7, size // 3, 64):
        df = W.read_warc(spark, p, split_size=split)
        assert df.rdd.getNumPartitions() > 1
        got = sorted((r["record_id"], r["warc_type"], bytes(r["payload"]))
                     for r in df.collect())
        assert got == serial, f"split_size={split}"


def test_split_with_torn_tail_and_plain_truncation(spark, tmp_path):
    # torn trailing member under split reading: intact records survive
    recs = _mk_records(40)
    gz = str(tmp_path / "torn.warc.gz")
    W.write_warc_gz(recs, gz)
    import gzip as _g
    whole = _g.compress(b"WARC/1.0\r\nWARC-Type: response\r\n"
                        b"Content-Length: 100\r\n\r\nshort")
    with open(gz, "ab") as f:
        f.write(whole[: len(whole) // 2])
    size = __import__("os").path.getsize(gz)
    assert W.read_warc(spark, gz, split_size=size // 4).count() == 41

    # truncated plain .warc: the short trailing record drops whole
    plain = str(tmp_path / "trunc.warc")
    with open(plain, "wb") as f:
        for r in recs[:3]:
            payload = r["payload"]
            f.write(b"WARC/1.0\r\nWARC-Type: " + r["warc_type"].encode()
                    + b"\r\nWARC-Record-ID: " + r["record_id"].encode()
                    + b"\r\nContent-Length: " + str(len(payload)).encode()
                    + b"\r\n\r\n" + payload + b"\r\n\r\n")
        f.write(b"WARC/1.0\r\nWARC-Type: response\r\n"
                b"WARC-Record-ID: <urn:uuid:torn>\r\n"
                b"Content-Length: 500\r\n\r\nonly a few bytes")
    rows = W.read_warc(spark, plain).collect()
    assert len(rows) == 3
    assert all(r["record_id"] != "<urn:uuid:torn>" for r in rows)


def test_warc_to_documents_pipeline_head(spark, tmp_path):
    from osm2pgsql_spark.operators.pii import pii_scrub

    p = str(tmp_path / "d.warc.gz")
    W.write_warc_gz(_mk_records(4), p)
    docs = W.warc_to_documents(W.read_warc(spark, p))
    rows = docs.collect()
    assert len(rows) == 4  # warcinfo filtered out
    assert all(r["text"].startswith("<html>doc ") for r in rows)
    assert len({r["doc_id"] for r in rows}) == 4  # stable distinct ids
    # the curation pipeline accepts the frame directly
    out = pii_scrub(docs)
    assert out.count() == 4


def test_bad_input_raises(spark, tmp_path):
    bad = tmp_path / "x.warc"
    bad.write_bytes(b"NOT A WARC\r\n")
    with pytest.raises(Exception, match="version line"):
        W.read_warc(spark, str(bad)).count()
    with pytest.raises(ValueError, match="no input files"):
        W.read_warc(spark, [])


def _record_bytes(rec):
    """The exact member plaintext write_warc_gz produces for one
    record (kept in sync with sources/warc.py:write_warc_gz)."""
    payload = rec["payload"]
    headers = [
        b"WARC/1.0",
        b"WARC-Type: " + rec["warc_type"].encode(),
        b"WARC-Record-ID: " + rec["record_id"].encode(),
        b"WARC-Date: " + rec.get("warc_date", "").encode(),
        b"WARC-Target-URI: " + rec.get("target_uri", "").encode(),
        b"Content-Type: " + rec.get(
            "content_type", "application/http; msgtype=response").encode(),
        b"Content-Length: " + str(len(payload)).encode(),
    ]
    return b"\r\n".join(headers) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _gz_member_with_fname(plain, fname_len):
    """A VALID gzip member whose header carries an fname_len-byte
    FNAME field — the decompressor must consume all of it before the
    first plaintext byte appears, which is exactly the adversarial
    shape the bounded boundary probe defends against."""
    import struct
    import zlib as z

    header = b"\x1f\x8b\x08\x08" + b"\x00" * 4 + b"\x00\x03"  # FLG=FNAME
    name = b"A" * fname_len + b"\x00"
    co = z.compressobj(9, z.DEFLATED, -15)
    body = co.compress(plain) + co.flush()
    tail = struct.pack("<II", z.crc32(plain) & 0xFFFFFFFF,
                       len(plain) & 0xFFFFFFFF)
    return header + name + body + tail


@pytest.mark.slow
def test_pathological_member_probe_bounded_and_rows_identical(
        spark, tmp_path):
    """r12 VERDICT #6: a member whose gzip header defers the first
    plaintext byte past the probe bound (multi-MB FNAME) must (a) be
    REFUSED as a split boundary by the bounded probe instead of
    costing O(member) per probe, and (b) still be read exactly once —
    the shard that owns the preceding boundary keeps it, because the
    range reader's stop rule applies the same probe."""
    import os

    p1 = str(tmp_path / "part1.warc.gz")
    p2 = str(tmp_path / "part2.warc.gz")
    W.write_warc_gz(_mk_records(15, "a"), p1)
    W.write_warc_gz(_mk_records(15, "b"), p2)
    patho_rec = {
        "record_id": "<urn:uuid:pathological>",
        "warc_type": "response",
        "target_uri": "https://example.org/patho",
        "warc_date": "2026-08-16T00:00:00Z",
        "payload": W.http_response_payload(b"<html>pathological</html>"),
    }
    patho = _gz_member_with_fname(_record_bytes(patho_rec),
                                  W._PROBE_MAX_COMPRESSED + (1 << 16))
    out = str(tmp_path / "mixed.warc.gz")
    patho_off = os.path.getsize(p1)
    with open(out, "wb") as o:
        o.write(open(p1, "rb").read())
        o.write(patho)
        o.write(open(p2, "rb").read())

    with open(out, "rb") as f:
        # a normal boundary validates; the pathological one is refused
        assert W._member_starts_warc(f, 0)
        assert not W._member_starts_warc(f, patho_off)
        # ...but IS a decompressible member (the refusal is a split
        # decision, not a corruption verdict)
        import gzip as _g
        with open(out, "rb") as g2:
            g2.seek(patho_off)
            assert _g.GzipFile(fileobj=g2).read(5) == b"WARC/"

    serial = sorted(
        (r["record_id"], bytes(r["payload"]))
        for r in W.read_warc(spark, out, split_size=None).collect())
    assert len(serial) == 33  # 15+meta, patho, 15+meta
    # payload column carries the split-out HTTP body
    assert ("<urn:uuid:pathological>",
            b"<html>pathological</html>") in serial
    size = os.path.getsize(out)
    for split in (size // 5, size // 2, patho_off, 512):
        got = sorted(
            (r["record_id"], bytes(r["payload"]))
            for r in W.read_warc(spark, out, split_size=split).collect())
        assert got == serial, f"split_size={split}"
