"""Minimal web UI: the reference's upload -> generate -> bundle flow.

The reference ships a Streamlit app (``sttm2flink-ui-5_4/
STTM_to_Flink_SQL.py:9-28``: upload a CSV/XLSX STTM workbook, press
"Generate SQL", preview statements + validation, download the zip
bundle).  Streamlit is not part of this environment, so the same flow is
served dependency-free: the core is :func:`handle_upload`, a pure
bytes-in / artifacts-out function (tests drive it directly, no sockets),
and :func:`serve` wraps it in a stdlib ``http.server`` app with an
upload form, a preview page, and a bundle download.

The artifacts are byte-identical to the CLI's: ``handle_upload`` routes
through the same ``load_any_spec`` -> validate -> ``emit_bundle`` /
``render_colspec_script`` pipeline as ``__main__.generate``, and the zip
uses the same grouped layout (``bundle/create.sql`` ...,
``validation/issues.csv`` — reference ``bundle_outputs_zip``,
``sttm2flink-ui-5_4/sttm2flink/utils.py:28-87``).
"""

from __future__ import annotations

import csv
import html
import io
import os
import tempfile
import zipfile
from dataclasses import dataclass, field


@dataclass
class UploadResult:
    filename: str
    files: dict[str, str] = field(default_factory=dict)  # name -> content
    errors: list[str] = field(default_factory=list)
    warnings: list[str] = field(default_factory=list)
    zip_bytes: bytes = b""


def _issues_csv_text(issues) -> str:
    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(["severity", "table", "message"])
    w.writerows(issues)
    return buf.getvalue()


def bundle_zip_bytes(files: dict[str, str], issues_csv: str) -> bytes:
    """Grouped three-file bundle + validation assets, omitting empty groups
    (reference ``bundle_outputs_zip``, ``utils.py:28-87``) — same layout
    the CLI's ``bundle.zip`` uses, as bytes."""
    groups = {
        "bundle/create.sql": files.get("tables.sql", ""),
        "bundle/views.sql": files.get("views.sql", ""),
        "bundle/inserts_statement_set.sql": files.get("inserts.sql", ""),
    }
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        for name, content in groups.items():
            if content.strip():
                zf.writestr(name, content.strip() + "\n")
        if issues_csv:
            zf.writestr("validation/issues.csv", issues_csv)
    return buf.getvalue()


def handle_upload(filename: str, data: bytes) -> UploadResult:
    """The Generate-SQL action: workbook bytes in, artifacts out.

    Dispatches on the uploaded name's suffix exactly like the CLI path
    (``load_any_spec`` auto-detects pipeline-stage vs column-spec
    dialects); a ``PipelineSpec`` produces the v22 artifact set +
    grouped zip, a ``ColSpec`` the single sectioned v4.5 script.
    """
    from .emit.colspec_render import render_colspec_script
    from .emit.render import emit_bundle, emit_yaml_bundles
    from .spec.colspec import ColSpec
    from .spec.detect import load_any_spec
    from .spec.models import PipelineSpec
    from .spec.validate import validate_spec

    suffix = os.path.splitext(filename)[1] or ".xlsx"
    fd, tmp = tempfile.mkstemp(suffix=suffix, prefix="cdis-ui-")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        spec = load_any_spec(tmp)
    finally:
        try:
            os.remove(tmp)
        except OSError:
            pass

    res = UploadResult(filename=filename)
    if isinstance(spec, PipelineSpec):
        issues = validate_spec(spec)
        issues_csv = _issues_csv_text(issues)
        res.errors = [f"{t}: {m}" for sev, t, m in issues if sev == "ERROR"]
        res.warnings = [f"{t}: {m}" for sev, t, m in issues if sev == "WARN"]
        res.files = emit_bundle(spec)
        res.files.update(emit_yaml_bundles(spec))
        res.files["issues_v22.csv"] = issues_csv
        res.zip_bytes = bundle_zip_bytes(res.files, issues_csv)
    elif isinstance(spec, ColSpec):
        script = render_colspec_script(spec, dialect="spark")
        res.files = {"00_all.sql": script}
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_DEFLATED) as zf:
            zf.writestr("bundle/00_all.sql", script)
        res.zip_bytes = buf.getvalue()
    else:  # pragma: no cover - load_any_spec returns one of the two
        raise TypeError(f"unsupported spec type {type(spec).__name__}")
    return res


def handle_connector(ctype: str, props_text: str) -> dict[str, str]:
    """The Connector-Config page's action (reference
    ``pages/Connector_Config.py``): connector type + ``key=value`` lines
    in (the reference's custom-properties convention), validated
    Kafka-Connect worker config JSON out.  Routes through the same
    ``load_connect_spec`` -> ``render_connect_json`` pipeline the
    artifact generator uses, so the UI emits field-for-field the
    reference's config artifact."""
    from .io.connect_json import load_connect_spec, render_connect_json

    if ctype not in ("source", "sink"):
        raise ValueError(f"connector type must be source or sink, got {ctype!r}")
    raw: dict[str, str] = {"connector_type": ctype}
    for line in props_text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        if "=" not in line:
            raise ValueError(f"expected key=value, got {line!r}")
        k, v = line.split("=", 1)
        raw[k.strip()] = v.strip()
    return render_connect_json(load_connect_spec(raw))


# -- HTML rendering (server-side only, no JS dependencies) -------------------

_PAGE = """<!doctype html><html><head><meta charset="utf-8">
<title>STTM to Spark SQL</title>
<style>
 body {{ font-family: sans-serif; margin: 2rem auto; max-width: 60rem; }}
 pre {{ background: #f6f6f6; padding: 1rem; overflow-x: auto; }}
 .err {{ color: #a00; }} .warn {{ color: #850; }}
</style></head><body>
<h1>STTM to Spark SQL</h1>
{body}
</body></html>"""

_FORM = """<form method="post" action="/generate" enctype="multipart/form-data">
<p><label>STTM workbook (CSV or XLSX):
<input type="file" name="sttm" required></label></p>
<p><button type="submit">Generate SQL</button></p>
</form>
<p><a href="/connector">Connector Config page</a></p>"""

_CONNECTOR_EXAMPLE = """name=gcs-sink-orders
topics=orders_topic
gcs.bucket.name=my-bucket
input.data.format=AVRO
output.data.format=PARQUET
flush.size=1000
"""

_CONNECTOR_FORM = """<form method="post" action="/connector">
<p><label>Connector type:
<select name="ctype">
<option value="source">GCS Source</option>
<option value="sink" selected>GCS Sink</option>
</select></label></p>
<p><label>Properties (key=value per line):<br>
<textarea name="props" rows="12" cols="70">{props}</textarea></label></p>
<p><button type="submit">Generate config JSON</button></p>
</form>
<p><a href="/">STTM generator page</a></p>"""


def render_index() -> str:
    return _PAGE.format(body=_FORM)


def render_connector_form(props: str = _CONNECTOR_EXAMPLE) -> str:
    return _PAGE.format(body=_CONNECTOR_FORM.format(props=html.escape(props)))


def render_connector_result(cfg: dict[str, str]) -> str:
    import json

    body = ("<h2>Connector config</h2><pre>"
            + html.escape(json.dumps(cfg, indent=2))
            + "</pre>" + _CONNECTOR_FORM.format(props=""))
    return _PAGE.format(body=body)


def render_result(res: UploadResult, token: str) -> str:
    parts = [f"<p>Generated {len(res.files)} artifacts from "
             f"<b>{html.escape(res.filename)}</b>.</p>"]
    if res.errors:
        parts.append("<h2 class='err'>Errors</h2><ul>" + "".join(
            f"<li class='err'>{html.escape(e)}</li>" for e in res.errors
        ) + "</ul>")
    if res.warnings:
        parts.append("<h2 class='warn'>Warnings</h2><ul>" + "".join(
            f"<li class='warn'>{html.escape(w)}</li>" for w in res.warnings
        ) + "</ul>")
    parts.append(f'<p><a href="/bundle/{html.escape(token)}.zip">'
                 'Download bundle.zip</a></p>')
    for name, content in res.files.items():
        parts.append(f"<h2>{html.escape(name)}</h2>"
                     f"<pre>{html.escape(content)}</pre>")
    parts.append('<p><a href="/">Upload another workbook</a></p>')
    return _PAGE.format(body="".join(parts))


# -- stdlib HTTP transport ---------------------------------------------------


def _parse_multipart(content_type: str, body: bytes) -> tuple[str, bytes]:
    """(filename, bytes) of the first file part — a minimal multipart
    reader for the single-field upload form (stdlib-only; the cgi module
    is deprecated)."""
    import email.parser
    import email.policy

    msg = email.parser.BytesParser(policy=email.policy.default).parsebytes(
        b"Content-Type: " + content_type.encode("latin-1") + b"\r\n\r\n" + body
    )
    for part in msg.iter_parts():
        fname = part.get_filename()
        if fname:
            return fname, part.get_payload(decode=True) or b""
    raise ValueError("no file part in upload")


_MAX_UPLOAD_BYTES = 32 << 20  # refuse runaway multipart bodies
_MAX_LIVE_RESULTS = 8  # per-token results kept for download, oldest evicted


def make_server(port: int = 8501, host: str = "127.0.0.1"):
    """The HTTP app.  Each generation is held in memory under a
    per-upload token and downloaded via ``/bundle/<token>.zip`` — the
    server is threaded, so a single shared "last result" slot would race
    under concurrent clients and could serve one user's artifacts to
    another.  The token table is capped at the newest
    ``_MAX_LIVE_RESULTS`` entries (insertion-ordered eviction)."""
    import http.server
    import re as _re

    state: dict[str, UploadResult] = {}
    lock = __import__("threading").Lock()
    bundle_re = _re.compile(r"^/bundle/([0-9a-f]{32})\.zip$")

    class Handler(http.server.BaseHTTPRequestHandler):
        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib handler contract)
            m = bundle_re.match(self.path)
            if m:
                with lock:
                    res = state.get(m.group(1))
                if res is None:
                    self._send(404, b"unknown or expired bundle token",
                               "text/plain")
                else:
                    self._send(200, res.zip_bytes, "application/zip")
            elif self.path == "/":
                self._send(200, render_index().encode(), "text/html")
            elif self.path == "/connector":
                self._send(200, render_connector_form().encode(), "text/html")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):  # noqa: N802
            length = int(self.headers.get("Content-Length", "0"))
            if length > _MAX_UPLOAD_BYTES:
                self._send(413, b"upload too large", "text/plain")
                return
            if self.path == "/generate":
                try:
                    fname, data = _parse_multipart(
                        self.headers.get("Content-Type", ""),
                        self.rfile.read(length),
                    )
                    res = handle_upload(fname, data)
                except Exception as exc:  # render, don't 500-blank
                    body = _PAGE.format(
                        body=f"<p class='err'>{html.escape(str(exc))}</p>"
                             f"{_FORM}"
                    )
                    self._send(400, body.encode(), "text/html")
                    return
                token = __import__("uuid").uuid4().hex
                with lock:
                    state[token] = res
                    while len(state) > _MAX_LIVE_RESULTS:
                        state.pop(next(iter(state)))
                self._send(200, render_result(res, token).encode(),
                           "text/html")
            elif self.path == "/connector":
                from urllib.parse import parse_qs

                form = parse_qs(
                    self.rfile.read(length).decode(), keep_blank_values=True
                )
                try:
                    cfg = handle_connector(
                        form.get("ctype", [""])[0],
                        form.get("props", [""])[0],
                    )
                except Exception as exc:
                    body = _PAGE.format(
                        body=f"<p class='err'>{html.escape(str(exc))}</p>"
                        + _CONNECTOR_FORM.format(
                            props=html.escape(form.get("props", [""])[0])
                        )
                    )
                    self._send(400, body.encode(), "text/html")
                    return
                self._send(
                    200, render_connector_result(cfg).encode(), "text/html"
                )
            else:
                self._send(404, b"not found", "text/plain")

        def log_message(self, *a):  # quiet
            pass

    return http.server.ThreadingHTTPServer((host, port), Handler)


def serve(port: int = 8501, host: str = "127.0.0.1") -> None:
    srv = make_server(port, host)
    print(f"serving on http://{host}:{port} (Ctrl-C to stop)")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()
