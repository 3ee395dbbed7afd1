"""Minimal stdlib-only .xlsx writer + reader (S1 support).

The reference ingests real Excel workbooks through
``pd.read_excel(header=None, dtype=str, keep_default_na=False)``
(`/root/reference/src/etl/extractors.py:22-46`). pandas needs openpyxl
for .xlsx, which this sandbox doesn't ship — but .xlsx is just a zip of
small XML parts (ECMA-376 / ISO 29500 SpreadsheetML, public spec), so a
few dozen lines of ``zipfile`` + ``xml.etree`` cover the subset the
reference's read call consumes: one grid of cell values per sheet. That
lets the production ``read_excel`` path execute END TO END on a real
.xlsx file here (writer produces the fixture, reader is the fallback
loader), instead of only via an injected pandas frame.

Scope on purpose: inline strings + shared strings + plain numeric cells,
multiple sheets by index or name. No styles/formulas/dates — the
reference reads ``dtype=str`` so a cell's displayed string is the whole
contract. Files produced by this writer open fine in Excel/LibreOffice
and are read by ``pd.read_excel`` identically (asserted in
tests/test_sources.py when openpyxl is available).
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"

_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheet_overrides}
</Types>"""

_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""


def _col_letter(idx0: int) -> str:
    s = ""
    n = idx0 + 1
    while n:
        n, r = divmod(n - 1, 26)
        s = chr(ord("A") + r) + s
    return s


def _col_index(ref: str) -> int:
    """'BC12' -> 0-based column index of 'BC'."""
    n = 0
    for ch in ref:
        if not ch.isalpha():
            break
        n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
    return n - 1


def write_xlsx(path: str, sheets: dict[str, list[list]] | list[list]) -> None:
    """Write a workbook. ``sheets`` is {name: grid} or a single grid
    (sheet 'Sheet1'); grid cells may be str/int/float/None (None = empty
    cell, omitted from the XML like real writers do)."""
    if isinstance(sheets, list):
        sheets = {"Sheet1": sheets}
    names = list(sheets)
    sheet_xml = []
    for grid in sheets.values():
        rows = []
        for ri, row in enumerate(grid, start=1):
            cells = []
            for ci, v in enumerate(row):
                if v is None:
                    continue
                ref = f"{_col_letter(ci)}{ri}"
                if isinstance(v, (int, float)) and not isinstance(v, bool):
                    cells.append(f'<c r="{ref}"><v>{v}</v></c>')
                else:
                    cells.append(
                        f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                        f"{escape(str(v))}</t></is></c>"
                    )
            rows.append(f'<row r="{ri}">{"".join(cells)}</row>')
        sheet_xml.append(
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            f'<sheetData>{"".join(rows)}</sheetData></worksheet>'
        )
    wb_sheets = "".join(
        f'<sheet name={quoteattr(n)} sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, n in enumerate(names)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{wb_sheets}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        + "</Relationships>"
    )
    ct = _CT.format(
        sheet_overrides="".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            for i in range(len(names))
        )
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", ct)
        z.writestr("_rels/.rels", _RELS)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, xml in enumerate(sheet_xml):
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml", xml)


def _fmt_number(raw: str) -> str:
    """Mirror how ``dtype=str`` renders a numeric cell: xlsx stores every
    number as float text; pandas shows ints as '7', floats as '7.5'."""
    try:
        f = float(raw)
    except ValueError:
        return raw
    return str(int(f)) if f == int(f) and "e" not in raw.lower() else str(f)


def read_xlsx_grid(path: str, sheet_name=0) -> list[list]:
    """Read one sheet as a dense row-major grid of ``str | None`` —
    the same cell-for-cell content ``pd.read_excel(header=None,
    dtype=str, keep_default_na=False)`` yields (missing cells None,
    present-but-empty strings kept). ``sheet_name``: index or name."""
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rel_ns = "{http://schemas.openxmlformats.org/package/2006/relationships}"
        r_ns = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
        targets = {r.get("Id"): r.get("Target") for r in rels.findall(f"{rel_ns}Relationship")}
        sheets = wb.find(f"{_NS}sheets").findall(f"{_NS}sheet")
        if isinstance(sheet_name, int):
            sheet = sheets[sheet_name]
        else:
            by_name = {s.get("name"): s for s in sheets}
            if sheet_name not in by_name:
                raise KeyError(f"no sheet named {sheet_name!r}")
            sheet = by_name[sheet_name]
        target = targets[sheet.get(f"{r_ns}id")].lstrip("/")
        if not target.startswith("xl/"):
            target = "xl/" + target
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            sst = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in sst.findall(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        ws = ET.fromstring(z.read(target))
        cells: dict[tuple[int, int], str] = {}
        max_r = max_c = -1
        for ri, row in enumerate(ws.iter(f"{_NS}row")):
            r = int(row.get("r", ri + 1)) - 1
            for ci, c in enumerate(row.findall(f"{_NS}c")):
                ref = c.get("r")
                col = _col_index(ref) if ref else ci
                t = c.get("t", "n")
                if t == "inlineStr":
                    is_el = c.find(f"{_NS}is")
                    val = "".join(tt.text or "" for tt in is_el.iter(f"{_NS}t")) if is_el is not None else ""
                else:
                    v = c.find(f"{_NS}v")
                    if v is None or v.text is None:
                        continue
                    if t == "s":
                        val = shared[int(v.text)]
                    elif t == "b":
                        val = "True" if v.text.strip() == "1" else "False"
                    else:
                        val = _fmt_number(v.text)
                cells[(r, col)] = val
                max_r, max_c = max(max_r, r), max(max_c, col)
    return [
        [cells.get((r, c)) for c in range(max_c + 1)] for r in range(max_r + 1)
    ]


def stdlib_xlsx_loader(path: str, sheet_name=0, **kwargs):
    """``frame_loader``-compatible fallback for :func:`readers.read_excel`:
    returns the pandas frame the reference's ``pd.read_excel`` call would
    (header=None positional columns, string cells, missing cells NaN so
    the downstream ``where(notna)`` masks them to null)."""
    import pandas as pd

    grid = read_xlsx_grid(path, sheet_name)
    return pd.DataFrame(grid, dtype=object)
