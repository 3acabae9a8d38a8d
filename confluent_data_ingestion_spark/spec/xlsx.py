"""Minimal dependency-free .xlsx sheet reader (stdlib zipfile + ElementTree).

The execution environment has no Excel engine (openpyxl), but STTM
workbooks are the reference's primary input format
(``scripts/sttm_to_flink_v22.py:283-288`` reads sheets with pandas).  An
xlsx file is a zip of XML parts; reading cell grids needs only:

 - ``xl/workbook.xml``            sheet name -> r:id
 - ``xl/_rels/workbook.xml.rels`` r:id -> worksheet part path
 - ``xl/sharedStrings.xml``       shared-string table
 - ``xl/worksheets/sheetN.xml``   rows of <c r="A1" t="s|str|inlineStr|b|n">

Only the features STTM workbooks use are implemented (shared strings,
inline strings, numbers, booleans, formula cached values).  Dates come back
as raw serial numbers — STTM sheets contain no date-typed cells.
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET

_NS = {
    "m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main",
    "r": "http://schemas.openxmlformats.org/officeDocument/2006/relationships",
    "pr": "http://schemas.openxmlformats.org/package/2006/relationships",
}

_CELL_REF = re.compile(r"^([A-Z]+)(\d+)$")


def _col_index(letters: str) -> int:
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def sheet_names(path: str) -> list[str]:
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
    return [
        s.attrib["name"] for s in wb.findall("m:sheets/m:sheet", _NS)
    ]


def _sheet_part(z: zipfile.ZipFile, sheet_name: str | None) -> str:
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {
        rel.attrib["Id"]: rel.attrib["Target"]
        for rel in rels.findall("pr:Relationship", _NS)
    }
    sheets = wb.findall("m:sheets/m:sheet", _NS)
    if not sheets:
        raise ValueError("workbook has no sheets")
    chosen = None
    if sheet_name is None:
        chosen = sheets[0]
    else:
        for s in sheets:
            if s.attrib["name"] == sheet_name:
                chosen = s
                break
    if chosen is None:
        raise KeyError(f"sheet {sheet_name!r} not found; have "
                       f"{[s.attrib['name'] for s in sheets]}")
    rid = chosen.attrib[f"{{{_NS['r']}}}id"]
    target = rid_to_target[rid]
    return target if target.startswith("xl/") else f"xl/{target}"


def _shared_strings(z: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(z.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    out = []
    for si in root.findall("m:si", _NS):
        # plain <t> or rich-text runs <r><t>
        out.append("".join(t.text or "" for t in si.iter(f"{{{_NS['m']}}}t")))
    return out


def _cell_value(c: ET.Element, shared: list[str]):
    t = c.attrib.get("t", "n")
    if t == "inlineStr":
        return "".join(x.text or "" for x in c.iter(f"{{{_NS['m']}}}t"))
    v = c.find("m:v", _NS)
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return v.text == "1"
    if t in ("str", "e"):  # formula cached string / error
        return v.text
    # numeric: return int when integral so IDs don't become '7.0'
    try:
        f = float(v.text)
        return int(f) if f.is_integer() else f
    except ValueError:
        return v.text


def read_sheet(path: str, sheet_name: str | None = None) -> list[list]:
    """Read one sheet as a dense list-of-rows grid (None for empty cells)."""
    with zipfile.ZipFile(path) as z:
        part = _sheet_part(z, sheet_name)
        shared = _shared_strings(z)
        root = ET.fromstring(z.read(part))
    rows: list[list] = []
    max_cols = 0
    for row in root.findall("m:sheetData/m:row", _NS):
        cells: dict[int, object] = {}
        for c in row.findall("m:c", _NS):
            ref = c.attrib.get("r", "")
            m = _CELL_REF.match(ref)
            idx = _col_index(m.group(1)) if m else len(cells)
            cells[idx] = _cell_value(c, shared)
        width = max(cells) + 1 if cells else 0
        max_cols = max(max_cols, width)
        rows.append([cells.get(i) for i in range(width)])
    return [r + [None] * (max_cols - len(r)) for r in rows]


def read_records(path: str, sheet_name: str | None = None) -> list[dict]:
    """Sheet -> list of {header: value} dicts (first row = header; empty
    header columns dropped; values stringified and trimmed like the
    reference's ``norm_cols``, 'nan' -> '')."""
    grid = read_sheet(path, sheet_name)
    if not grid:
        return []
    headers = [str(h).strip() if h is not None else "" for h in grid[0]]
    records = []
    for row in grid[1:]:
        if all(v is None or str(v).strip() == "" for v in row):
            continue
        rec = {}
        for h, v in zip(headers, row):
            if not h:
                continue
            s = "" if v is None else str(v).strip()
            rec[h] = "" if s.lower() == "nan" else s
        records.append(rec)
    return records


# ---------------------------------------------------------------------------
# Minimal writer (the inverse surface): sheets of rows -> .xlsx.  Strings go
# as inline strings (no sharedStrings part needed), ints/floats as numbers,
# bools as booleans — exactly the cell types the reader above parses.  No
# styling / data validation (the reference template's dropdowns are an
# authoring nicety, not part of the data contract).
# ---------------------------------------------------------------------------
def _col_letters(idx: int) -> str:
    out = ""
    n = idx + 1
    while n:
        n, r = divmod(n - 1, 26)
        out = chr(ord("A") + r) + out
    return out


def _esc(s: str) -> str:
    return (str(s).replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def _cell_xml(ref: str, v) -> str:
    if v is None or (isinstance(v, str) and v == ""):
        return ""
    if isinstance(v, bool):
        return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
    if isinstance(v, (int, float)):
        return f'<c r="{ref}"><v>{v}</v></c>'
    return (f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
            f"{_esc(v)}</t></is></c>")


def write_workbook(path: str, sheets: dict[str, list[list]]) -> None:
    """Write ``{sheet_name: grid}`` as a minimal .xlsx (round-trips through
    :func:`read_sheet` / :func:`read_records`)."""
    names = list(sheets)
    sheet_xml = {}
    for si, name in enumerate(names, start=1):
        rows_xml = []
        for ri, row in enumerate(sheets[name], start=1):
            cells = "".join(
                _cell_xml(f"{_col_letters(ci)}{ri}", v)
                for ci, v in enumerate(row)
            )
            rows_xml.append(f'<row r="{ri}">{cells}</row>')
        sheet_xml[si] = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<worksheet xmlns="{_NS["m"]}">'
            f"<sheetData>{''.join(rows_xml)}</sheetData></worksheet>"
        )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            for i in range(1, len(names) + 1)
        )
        + "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_NS["pr"]}">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    wb_sheets = "".join(
        f'<sheet name="{_esc(n)}" sheetId="{i}" r:id="rId{i}"/>'
        for i, n in enumerate(names, start=1)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS["m"]}" xmlns:r="{_NS["r"]}">'
        f"<sheets>{wb_sheets}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_NS["pr"]}">'
        + "".join(
            f'<Relationship Id="rId{i}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i}.xml"/>'
            for i in range(1, len(names) + 1)
        )
        + "</Relationships>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i in range(1, len(names) + 1):
            z.writestr(f"xl/worksheets/sheet{i}.xml", sheet_xml[i])
