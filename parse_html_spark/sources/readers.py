"""Span-document source readers: parquet (native), JSONL, and WARC.

The canonical input is the parquet span-doc table (BASELINE.json
input_hint). Real web-scale corpora additionally arrive as:

- JSONL: one {"doc_id": ..., "spans": [...]} object per line --
  spark.read.json with the explicit schema (never schema inference at
  100 TB: one pass saved, and a malformed line cannot silently widen a
  column type).
- WARC (ISO 28500): the standard web-crawl archive format
  (Common-Crawl-style). Parsed here with a pure-Python record splitter
  over ``binaryFile`` rows inside mapInPandas -- each 'response' record
  becomes a single-text-span document whose doc_id is the WARC-Target-URI
  (+ record offset for uniqueness). Gzip members (the usual .warc.gz
  member-per-record layout) are handled by stdlib zlib multi-member
  decompression.

Scale note: binaryFile materializes one whole archive per task, which is
the standard unit for WARC (Common Crawl ships ~1 GB files; one file per
task is exactly how Hadoop/Spark WARC pipelines shard). Parallelism
comes from the number of archives, which at crawl scale is millions.
"""

from __future__ import annotations

import zlib

SPAN_DOC_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>, n_chars long"
)


def read_span_docs_jsonl(spark, path: str):
    """JSONL span-docs with the pinned schema (no inference pass).
    Lines without the n_chars field get it derived from span lengths, so
    downstream skew routing never sees NULL sizes."""
    from pyspark.sql import functions as F

    from ..pipeline import doc_size_col

    df = spark.read.schema(SPAN_DOC_SCHEMA).json(path)
    return df.withColumn(
        "n_chars", F.coalesce(F.col("n_chars"), doc_size_col().cast("long"))
    )


def _gunzip_members(data: bytes) -> tuple[bytes, str | None]:
    """Decompress concatenated gzip members (stdlib only).

    Returns (bytes decompressed so far, error string or None). A
    truncated final member, a corrupt stream mid-member, or trailing
    garbage after the last member never raises: at 100k-archive crawl
    scale one bad file must degrade to partial records + a census
    entry, not a permanently dead task (the caller decides whether to
    raise via its on_error mode)."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        if data[pos : pos + 2] != b"\x1f\x8b":
            return bytes(out), f"trailing garbage at byte {pos}"
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        try:
            out.extend(d.decompress(data[pos:]))
            out.extend(d.flush())
        except zlib.error as exc:
            return bytes(out), f"corrupt gzip member at byte {pos}: {exc}"
        if not d.eof:
            # ran out of input mid-member: decompress() returned what
            # it could without raising
            return bytes(out), f"truncated gzip member at byte {pos}"
        tail = d.unused_data
        if not tail:
            break
        pos = len(data) - len(tail)
    return bytes(out), None


def parse_warc_records(data: bytes, status: dict | None = None):
    """Yield (headers: dict, body: bytes, offset: int) per WARC record.

    Pure-Python WARC/1.x splitter: records are 'WARC/1.' header blocks
    terminated by CRLFCRLF with an exact Content-Length body, separated
    by CRLFCRLF. Tolerates trailing junk between records. Pass a dict
    as ``status`` to learn about corruption the record stream itself
    cannot show: a 'WARC/1.' start whose header block never terminates
    (archive cut mid-header) sets status['truncated_header'] to its
    offset instead of being silently dropped; trailing bytes ending in
    a proper prefix of the magic set status['suspected_truncation']."""
    pos = 0
    n = len(data)
    while True:
        start = data.find(b"WARC/1.", pos)
        if start < 0:
            # an archive cut INSIDE the magic itself (data ends with
            # e.g. b'WAR') leaves no full 'WARC/1.' to find -- report a
            # trailing proper prefix of the magic. This is only a
            # SUSPICION (ADVICE r5): legitimate trailing junk can also
            # end with 'W'/'WA'/..., so it goes under a separate key,
            # and the census gives it its own status class so operators
            # can separate it from confirmed corruption
            if status is not None and pos < n:
                tail = data[pos:]
                for plen in range(min(6, len(tail)), 0, -1):
                    if tail.endswith(b"WARC/1."[:plen]):
                        status["suspected_truncation"] = n - plen
                        break
            return
        hdr_end = data.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            if status is not None:
                status["truncated_header"] = start
            return
        headers: dict[str, str] = {}
        for line in data[start:hdr_end].split(b"\r\n")[1:]:
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.decode("latin-1").strip().lower()] = (
                    v.decode("latin-1").strip()
                )
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        if length < 0:
            # a negative Content-Length would move the parser BACKWARD
            # (data[a:a-7] is empty but pos = a-7), re-parsing payload
            # bytes as phantom records
            length = 0
        body_start = hdr_end + 4
        body = data[body_start : body_start + length]
        yield headers, body, start
        pos = body_start + length
        if pos >= n:
            return


def _http_payload(body: bytes) -> bytes:
    """Strip the HTTP response envelope of a WARC 'response' record."""
    if body[:5] in (b"HTTP/", b"http/"):
        sep = body.find(b"\r\n\r\n")
        if sep >= 0:
            return body[sep + 4 :]
    return body


def read_span_docs_warc(
    spark,
    path: str,
    record_types: tuple[str, ...] = ("response", "resource"),
    on_error: str = "raise",
):
    """WARC archives -> span-doc table (doc_id, spans, n_chars).

    Each record whose WARC-Type is in ``record_types`` becomes one
    document with a single text span holding the payload decoded as
    UTF-8 (errors=replace; 'response' records get their HTTP envelope
    stripped, other types carry the body verbatim).
    doc_id = WARC-Target-URI#record-offset.

    on_error mirrors extract_media_features: 'raise' (default) turns a
    corrupt/truncated archive into a ValueError (fail fast -- right for
    curated inputs); 'flag' degrades GRACEFULLY for crawl-scale mixed
    corpora: records parsed before the corruption point are still
    yielded, the schema gains a ``status`` column ('ok',
    'truncated_record:<declared>/<got>', 'bad_content_length:<raw>'),
    and an archive-level problem -- failed decompression, or a WARC
    magic whose header block never terminates (archive cut mid-header)
    -- additionally yields ONE zero-span census row
    (doc_id='<path>#ARCHIVE_ERROR', status='archive_error:<reason>')
    so groupBy(status) -- or warc_decode_census() -- shows the
    corruption mix instead of a dead task. Filter status = 'ok' for
    the clean corpus. The unterminated-header case is reported in flag
    mode ONLY: the same byte pattern can be tolerated trailing junk
    that merely contains the magic, so raise mode keeps parsing
    archives it has always parsed.

    record_types=("conversion",) reads Common Crawl WET archives (the
    pre-extracted plain-text sibling of the crawl) -- see
    read_span_docs_wet."""
    import pandas as pd

    from ..session import ensure_py_files

    if on_error not in ("raise", "flag"):
        raise ValueError(f"on_error must be 'raise' or 'flag': {on_error!r}")
    flag = on_error == "flag"
    ensure_py_files(spark)
    files = spark.read.format("binaryFile").load(path)
    if isinstance(record_types, str):
        # tuple("conversion") would explode into single characters and
        # silently match nothing
        record_types = (record_types,)
    wanted = tuple(record_types)

    def run(batches):
        for pdf in batches:
            ids, spans, nchars, statuses = [], [], [], []

            def emit(doc_id, text, status):
                ids.append(doc_id)
                spans.append(
                    [
                        {
                            "kind": "text",
                            "text": text,
                            "media_ref": None,
                            "offset": 0,
                        }
                    ]
                    if text is not None
                    else []
                )
                nchars.append(len(text) if text is not None else 0)
                statuses.append(status)

            for fpath, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                arch_err = None
                if fpath.endswith(".gz") or data[:2] == b"\x1f\x8b":
                    data, arch_err = _gunzip_members(data)
                    if arch_err is not None and not flag:
                        raise ValueError(f"{fpath}: {arch_err}")
                split_status: dict = {}
                for headers, body, off in parse_warc_records(data, split_status):
                    rtype = headers.get("warc-type", "")
                    if rtype not in wanted:
                        continue
                    uri = headers.get("warc-target-uri", fpath)
                    raw_len = headers.get("content-length", "0")
                    status = "ok"
                    try:
                        declared = int(raw_len)
                    except ValueError:
                        declared = -1
                    if declared < 0:
                        # non-numeric OR negative: both are corrupt
                        declared = 0
                        status = f"bad_content_length:{raw_len}"
                    if len(body) < declared:
                        # archive ended mid-record: the slice came up
                        # short of the declared Content-Length
                        status = f"truncated_record:{declared}/{len(body)}"
                    if status != "ok" and not flag:
                        raise ValueError(f"{fpath}#{off}: {status}")
                    # only 'response' records carry an HTTP envelope;
                    # stripping others would corrupt e.g. WET text that
                    # happens to begin with 'HTTP/'
                    payload = _http_payload(body) if rtype == "response" else body
                    emit(
                        f"{uri}#{off}",
                        payload.decode("utf-8", errors="replace"),
                        status,
                    )
                if flag and arch_err is None and "truncated_header" in split_status:
                    # archive cut mid-WARC-header: the partial record
                    # vanishes from the record stream, so without this
                    # the census would read 'clean corpus'. FLAG MODE
                    # ONLY: the same byte pattern can be trailing junk
                    # that happens to contain the magic (which this
                    # reader has always tolerated), so raise mode must
                    # not start killing archives it used to parse --
                    # the census names the suspicion, the operator
                    # decides
                    arch_err = (
                        "truncated WARC header at byte "
                        f"{split_status['truncated_header']}"
                    )
                if arch_err is not None:
                    # flag mode (raise already fired): one census row
                    # per damaged archive, zero spans so it never leaks
                    # text into extraction
                    emit(f"{fpath}#ARCHIVE_ERROR", None, f"archive_error:{arch_err}")
                elif flag and "suspected_truncation" in split_status:
                    # trailing bytes that merely END with a 1-6 byte
                    # proper prefix of 'WARC/1.' -- could be an archive
                    # cut inside the magic OR legitimate trailing junk
                    # (ADVICE r5: a confirmed-corruption label here was
                    # a census false positive). Own status class so the
                    # operator can separate suspicion from confirmation
                    emit(
                        f"{fpath}#SUSPECT",
                        None,
                        "suspected_truncation:trailing WARC-magic prefix "
                        f"at byte {split_status['suspected_truncation']}",
                    )
            if not ids:
                # an archive with no matching records must yield NO
                # batch: Arrow cannot type an empty object column as
                # array<struct> and would fail the task
                continue
            out = {"doc_id": ids, "spans": spans, "n_chars": nchars}
            if flag:
                out["status"] = statuses
            yield pd.DataFrame(out)

    schema = SPAN_DOC_SCHEMA + (", status string" if flag else "")
    return files.select("path", "content").mapInPandas(run, schema=schema)


def read_span_docs_wet(spark, path: str, on_error: str = "raise"):
    """Common Crawl WET archives (WARC files of 'conversion' records
    holding pre-extracted plain text, no HTTP envelope) -> span-doc
    table. Same splitter, different record filter."""
    return read_span_docs_warc(
        spark, path, record_types=("conversion",), on_error=on_error
    )


def warc_decode_census(df):
    """Roll the on_error='flag' output of read_span_docs_warc /
    read_span_docs_wet into a per-status census: (status, n_docs,
    total_chars). Statuses carry variable detail after the first ':'
    (offsets, lengths), so they are bucketed by their class prefix --
    one row per failure MODE, not per failed record."""
    from pyspark.sql import functions as F

    return (
        df.groupBy(
            F.split(F.col("status"), ":").getItem(0).alias("status")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("status")
    )


def write_warc(
    path: str,
    pages: list[tuple[str, bytes]],
    gzip_members: bool = False,
    record_type: str = "response",
) -> None:
    """Minimal WARC/1.0 writer for tests/fixtures: one record per
    (uri, payload_bytes) page, optionally one gzip member per record
    (the .warc.gz convention). record_type='response' wraps payloads in
    an HTTP envelope; 'conversion' writes bare payloads (WET layout)."""
    import gzip as _gzip

    out = bytearray()
    for uri, payload in pages:
        if record_type == "response":
            body = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + payload
        else:
            body = payload
        hdr = (
            b"WARC/1.0\r\n"
            b"WARC-Type: " + record_type.encode("ascii") + b"\r\n"
            b"WARC-Target-URI: " + uri.encode("utf-8") + b"\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n"
            b"\r\n"
        )
        rec = hdr + body + b"\r\n\r\n"
        out.extend(_gzip.compress(rec) if gzip_members else rec)
    with open(path, "wb") as fh:
        fh.write(bytes(out))
