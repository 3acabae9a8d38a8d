"""CLI entry point: generate the full artifact set from an STTM spec.

Usage::

    python -m confluent_data_ingestion_spark generate <sttm.{xlsx,csv}> <out_dir>
        [--fail-on-error] [--no-zip]

Mirrors the reference generator's runnable surface — a workbook in, a
directory of artifacts out (``scripts/sttm_to_flink_v22.py:403-422``:
``00_all.sql`` + ``issues_v22.csv`` + stderr ERROR/WARNING summary, exit 2
on errors under ``--fail-on-error``) — plus the UI's grouped zip bundle
(``sttm2flink-ui-5_4/sttm2flink/utils.py:28-87``: ``bundle/create.sql``,
``bundle/views.sql``, ``bundle/inserts_statement_set.sql``, validation
assets under ``validation/``).  Both STTM dialects route through
``load_any_spec``; the emitted SQL is Spark SQL (this engine's dialect).
"""

from __future__ import annotations

import argparse
import sys
import zipfile
from pathlib import Path


def _write(out_dir: Path, name: str, content: str) -> None:
    (out_dir / name).write_text(content, encoding="utf-8")


def _zip_bundle(out_dir: Path, files: dict[str, str], issues_csv: str) -> None:
    """Grouped three-file bundle + validation assets, omitting empty groups
    (reference ``bundle_outputs_zip``, ``utils.py:28-87``) — same bytes the
    web UI serves (``ui.bundle_zip_bytes``)."""
    from .ui import bundle_zip_bytes

    (out_dir / "bundle.zip").write_bytes(bundle_zip_bytes(files, issues_csv))


def generate(sttm: str, out_dir: str, make_zip: bool = True) -> dict:
    """Load -> validate -> emit.  Returns {"errors": [...], "warnings": [...],
    "files": [names written]} (same summary shape the reference main prints).
    """
    from .emit.colspec_render import render_colspec_script
    from .emit.render import emit_bundle, emit_yaml_bundles
    from .spec.colspec import ColSpec
    from .spec.detect import load_any_spec
    from .spec.models import PipelineSpec
    from .spec.validate import validate_spec, write_issues_csv

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    spec = load_any_spec(sttm)
    written: list[str] = []
    errors: list[str] = []
    warnings: list[str] = []

    if isinstance(spec, PipelineSpec):
        issues = validate_spec(spec)
        write_issues_csv(issues, str(out / "issues_v22.csv"))
        written.append("issues_v22.csv")
        errors = [f"{t}: {m}" for sev, t, m in issues if sev == "ERROR"]
        warnings = [f"{t}: {m}" for sev, t, m in issues if sev == "WARN"]
        files = emit_bundle(spec)
        files.update(emit_yaml_bundles(spec))
        for name, content in files.items():
            _write(out, name, content)
            written.append(name)
        if make_zip:
            _zip_bundle(out, files, (out / "issues_v22.csv").read_text())
            written.append("bundle.zip")
    elif isinstance(spec, ColSpec):
        # column-spec dialect: single sectioned script (the v4.5 surface);
        # no issues CSV — colspec validation raises on load.
        script = render_colspec_script(spec, dialect="spark")
        _write(out, "00_all.sql", script)
        written.append("00_all.sql")
        if make_zip:
            with zipfile.ZipFile(out / "bundle.zip", "w",
                                 compression=zipfile.ZIP_DEFLATED) as zf:
                zf.writestr("bundle/00_all.sql", script)
            written.append("bundle.zip")
    else:  # pragma: no cover - load_any_spec returns one of the two
        raise TypeError(f"unsupported spec type {type(spec).__name__}")
    return {"errors": errors, "warnings": warnings, "files": written}


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="confluent_data_ingestion_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    gen = sub.add_parser(
        "generate", help="render SQL/YAML artifacts from an STTM workbook"
    )
    gen.add_argument("sttm", help="path to STTM workbook (.xlsx) or CSV")
    gen.add_argument("out_dir", help="output directory for artifacts")
    gen.add_argument("--fail-on-error", action="store_true",
                     help="exit 2 if validation errors are found")
    gen.add_argument("--no-zip", action="store_true",
                     help="skip writing bundle.zip")
    srv = sub.add_parser(
        "serve",
        help="web UI: upload workbook -> generate -> download bundle "
             "(the reference Streamlit app's flow, stdlib-only)",
    )
    srv.add_argument("--port", type=int, default=8501)
    srv.add_argument("--host", default="127.0.0.1")
    qp = sub.add_parser(
        "query",
        help="run a registry operator against a directory of the engine's "
             "parquet tables (region/nation/.../documents/embeddings)",
    )
    qp.add_argument("name", nargs="?", help="registry query name "
                    "(omit with --list)")
    qp.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                    help="directory holding the parquet tables")
    qp.add_argument("--limit", type=int, default=20,
                    help="rows to print (full result still computes)")
    qp.add_argument("--out", help="also write the FULL result as parquet "
                    "to this path")
    qp.add_argument("--list", action="store_true", dest="list_queries",
                    help="list registry query names and exit (no Spark)")
    args = ap.parse_args(argv)

    if args.cmd == "serve":
        from .ui import serve as run_serve

        run_serve(args.port, args.host)
        return 0

    if args.cmd == "query":
        from .queries import QUERIES

        if args.list_queries:
            for n in QUERIES:
                print(n)
            return 0
        if not args.name:
            ap.error("query: give a name or --list")
        if args.name not in QUERIES:
            print(f"unknown query {args.name!r}; see --list", file=sys.stderr)
            return 2
        from .session import get_spark

        spark = get_spark(f"cdis-query-{args.name}")
        spark.sparkContext.setLogLevel("ERROR")
        df = QUERIES[args.name](spark, args.sf_dir)
        if args.out:
            df.write.mode("overwrite").parquet(args.out)
            print("wrote:", args.out)
        df.show(args.limit, truncate=False)
        return 0

    summary = generate(args.sttm, args.out_dir, make_zip=not args.no_zip)
    if summary["errors"]:
        print("ERRORS:")
        for e in summary["errors"]:
            print(" -", e)
        print("See issues_v22.csv")
    if summary["warnings"]:
        print("WARNINGS:")
        for w in summary["warnings"]:
            print(" -", w)
        print("See issues_v22.csv")
    if not summary["errors"] and not summary["warnings"]:
        print("[done] OK (no validation issues).")
    print("wrote:", ", ".join(summary["files"]))
    if summary["errors"] and args.fail_on_error:
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
