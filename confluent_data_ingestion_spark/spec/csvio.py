"""Encoding-sniffing CSV spec input.

The reference UI accepts CSV STTMs and sniffs the byte encoding with
chardet before parsing (``sttm2flink-ui-5_4/sttm2flink/generator.py:19-31``).
This port uses chardet when importable (same behavior), else a deterministic
ladder: BOM signatures first (UTF-8-sig / UTF-16 LE / BE), then strict
UTF-8, then latin-1 (which decodes any byte string, like chardet's usual
fallback for single-byte encodings).
"""

from __future__ import annotations

import io
from typing import Any


def sniff_encoding(data: bytes) -> str:
    try:  # match the reference exactly when chardet is installed
        import chardet

        return chardet.detect(data).get("encoding") or "utf-8"
    except ImportError:
        pass
    if data.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig"
    if data.startswith(b"\xff\xfe") or data.startswith(b"\xfe\xff"):
        return "utf-16"
    try:
        data.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "latin-1"


def read_csv_records(path: str) -> list[dict[str, Any]]:
    """CSV spec file -> row dicts (all values strings, NaN -> '', headers
    whitespace-stripped), decoding via :func:`sniff_encoding`."""
    import pandas as pd

    with open(path, "rb") as f:
        data = f.read()
    text = data.decode(sniff_encoding(data))
    df = pd.read_csv(io.StringIO(text), dtype=str).fillna("")
    df.columns = [str(c).strip() for c in df.columns]
    return df.to_dict(orient="records")
