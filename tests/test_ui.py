"""UI parity surface: the reference Streamlit app's upload -> generate ->
bundle flow (``sttm2flink-ui-5_4/STTM_to_Flink_SQL.py:9-28``) served by
``confluent_data_ingestion_spark.ui``.  The handler is driven directly
(no sockets) with the reference's own v22 fixture workbook; the zip must
match ``emit_bundle``'s artifacts byte-for-byte, and the HTTP layer is
exercised once in-process through the stdlib test client pattern."""

from __future__ import annotations

import io
import os
import threading
import urllib.request
import uuid
import zipfile

import pytest

from confluent_data_ingestion_spark.ui import (
    handle_upload,
    make_server,
    render_index,
    render_result,
)

WB = "/root/reference/resources/STTM_v22.xlsx"
needs_wb = pytest.mark.skipif(
    not os.path.exists(WB), reason="reference workbook not present"
)


@needs_wb
def test_handle_upload_matches_emit_bundle():
    """The Generate-SQL action produces exactly the CLI pipeline's
    artifacts: same emit_bundle file set, and a zip whose grouped members
    are the same content the CLI's bundle.zip would hold."""
    from confluent_data_ingestion_spark.emit.render import (
        emit_bundle,
        emit_yaml_bundles,
    )
    from confluent_data_ingestion_spark.spec.detect import load_any_spec

    with open(WB, "rb") as f:
        data = f.read()
    res = handle_upload("STTM_v22.xlsx", data)

    spec = load_any_spec(WB)
    want = emit_bundle(spec)
    want.update(emit_yaml_bundles(spec))
    for name, content in want.items():
        assert res.files[name] == content
    assert "issues_v22.csv" in res.files

    with zipfile.ZipFile(io.BytesIO(res.zip_bytes)) as zf:
        names = set(zf.namelist())
        # grouped bundle layout (reference bundle_outputs_zip)
        assert "validation/issues.csv" in names
        for member, src in [
            ("bundle/create.sql", "tables.sql"),
            ("bundle/views.sql", "views.sql"),
            ("bundle/inserts_statement_set.sql", "inserts.sql"),
        ]:
            if want.get(src, "").strip():
                assert zf.read(member).decode() == want[src].strip() + "\n"


@needs_wb
def test_render_pages_are_selfcontained_html():
    assert "<form" in render_index()
    with open(WB, "rb") as f:
        res = handle_upload("STTM_v22.xlsx", f.read())
    page = render_result(res, token="0" * 32)
    assert f"/bundle/{'0' * 32}.zip" in page and "STTM_v22.xlsx" in page
    # statements preview includes the emitted SQL
    assert any(name.endswith(".sql") for name in res.files)


@needs_wb
def test_http_roundtrip_upload_and_download():
    """One in-process HTTP round trip: GET form, POST the workbook as
    multipart, GET the bundle — the server serves the same zip bytes the
    handler produced."""
    srv = make_server(port=0)  # OS-assigned free port
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        assert "<form" in urllib.request.urlopen(f"{base}/").read().decode()

        with open(WB, "rb") as f:
            payload = f.read()
        boundary = uuid.uuid4().hex
        body = (
            f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="sttm"; '
            'filename="STTM_v22.xlsx"\r\n'
            "Content-Type: application/octet-stream\r\n\r\n"
        ).encode() + payload + f"\r\n--{boundary}--\r\n".encode()
        req = urllib.request.Request(
            f"{base}/generate",
            data=body,
            headers={
                "Content-Type": f"multipart/form-data; boundary={boundary}"
            },
        )
        page = urllib.request.urlopen(req).read().decode()
        assert "Generated" in page

        # bundle downloads are keyed by a per-upload token so concurrent
        # clients can never fetch each other's artifacts
        import re

        m = re.search(r"/bundle/([0-9a-f]{32})\.zip", page)
        assert m, "result page must link a tokened bundle"
        got_zip = urllib.request.urlopen(
            f"{base}/bundle/{m.group(1)}.zip"
        ).read()
        want = handle_upload("STTM_v22.xlsx", payload).zip_bytes
        assert got_zip == want
        # an unknown token is a 404, not someone else's bundle
        try:
            urllib.request.urlopen(f"{base}/bundle/{'f' * 32}.zip")
            assert False, "unknown token must 404"
        except urllib.error.HTTPError as exc:
            assert exc.code == 404
    finally:
        srv.shutdown()
        srv.server_close()


def test_handle_connector_matches_render_connect_json():
    """The Connector-Config page action (reference
    pages/Connector_Config.py) routes through the artifact generator:
    same JSON as load_connect_spec -> render_connect_json."""
    from confluent_data_ingestion_spark.io.connect_json import (
        load_connect_spec,
        render_connect_json,
    )
    from confluent_data_ingestion_spark.ui import handle_connector

    props = (
        "name=gcs-sink-orders\n"
        "topics=orders_topic\n"
        "gcs.bucket.name=my-bucket\n"
        "input.data.format=AVRO\n"
        "output.data.format=PARQUET\n"
        "flush.size=1000\n"
        "# comment lines and blanks are skipped\n"
        "\n"
    )
    got = handle_connector("sink", props)
    want = render_connect_json(load_connect_spec({
        "connector_type": "sink",
        "name": "gcs-sink-orders",
        "topics": "orders_topic",
        "gcs.bucket.name": "my-bucket",
        "input.data.format": "AVRO",
        "output.data.format": "PARQUET",
        "flush.size": "1000",
    }))
    assert got == want
    assert got["connector.class"] == "GcsSink"

    with pytest.raises(ValueError, match="source or sink"):
        handle_connector("topic", props)
    with pytest.raises(ValueError, match="key=value"):
        handle_connector("sink", "not-a-property")
    # spec validation errors surface (flush.size must be positive)
    with pytest.raises(Exception, match="positive"):
        handle_connector("sink", props.replace("=1000", "=-5"))


def test_connector_http_roundtrip():
    from urllib.parse import urlencode

    srv = make_server(port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        assert "<form" in urllib.request.urlopen(f"{base}/connector").read().decode()
        body = urlencode({
            "ctype": "source",
            "props": "name=gcs-src\ntopics=t1\ngcs.bucket.name=b\n"
                     "input.data.format=JSON",
        }).encode()
        page = urllib.request.urlopen(
            urllib.request.Request(f"{base}/connector", data=body)
        ).read().decode()
        assert "GcsSource" in page and "gcs-src" in page
    finally:
        srv.shutdown()
        srv.server_close()


def test_upload_error_is_rendered_not_crashed():
    """Garbage upload -> 400 with a rendered error page (the Streamlit
    app's st.error path), not an unhandled exception."""
    srv = make_server(port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        boundary = uuid.uuid4().hex
        body = (
            f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="sttm"; '
            'filename="bad.xlsx"\r\n\r\n'
        ).encode() + b"not a workbook" + f"\r\n--{boundary}--\r\n".encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=body,
            headers={
                "Content-Type": f"multipart/form-data; boundary={boundary}"
            },
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400
        assert "<form" in ei.value.read().decode()  # page re-renders the form
    finally:
        srv.shutdown()
        srv.server_close()
