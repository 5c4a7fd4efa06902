"""Deterministic stdlib-only generator for ``participants.xlsx`` — a REAL
Excel binary for the S1 end-to-end test (FIXTURES.md §1): 3 junk rows, the
actual header at row index 3 (incl. the trailing-space ``Nombres `` cell),
data from row index 4, with the dirty-data cases the reference handles
(app.py:236–255): accents, multi-email cells, null rut/nombres, multi-token
surnames, apostrophes.

The container this repo is built in ships no Excel wheel, so the fixture is
written with ``zipfile`` + hand-assembled OOXML (SpreadsheetML is a public
ECMA-376 format; inline strings keep it to 5 parts). Regenerate with:

    python tests/fixtures/make_participants_xlsx.py

The output is byte-stable (fixed zip timestamps, ZIP_STORED so the bytes
do not depend on which zlib build compresses — deflate output varies
across zlib/zlib-ng versions).
"""

from __future__ import annotations

import os
import zipfile
from xml.sax.saxutils import escape

HEADER = [
    "Rut (con punto y con guión)",
    "Nombres ",  # trailing space is part of the real contract
    "Apellidos",
    "Correo electrónico",
    "ExtraCol1",
]

JUNK_ROWS = [
    ["Listado de participantes", None, None, None, None],
    [None, None, None, None, None],
    ["Exportado: curso demo", None, None, None, None],
]

DATA_ROWS = [
    ["12.345.678-9", "María José", "Pérez Soto", "mjperez@u.cl", "x"],
    ["9.876.543-2", "Ángel", "O'Higgins", "angel@u.cl; backup@u.cl", None],
    [None, "Pedro", "Rojas", "pedro@u.cl", "y"],  # null rut → dropped
    ["11.111.111-1", None, "Muñoz", "sin.nombre@u.cl", None],  # null nombres
    ["22.222.222-2", "josé", "núñez", " jn@u.cl ", None],
    ["33.333.333-3", "Ana", "Lee", "no-arroba-garbage", None],
    ["44.444.444-4", "Luz", "Díaz Paz", "luz@u.cl,otra@u.cl", "z"],
    ["55.555.555-5", "Juan Pablo", "Castro", "jp@u.cl", None],
]


def _cell(ref: str, value: str) -> str:
    return (
        f'<c r="{ref}" t="inlineStr"><is>'
        f'<t xml:space="preserve">{escape(value)}</t></is></c>'
    )


def _row(idx: int, values: list[str | None]) -> str:
    cells = "".join(
        _cell(f"{chr(ord('A') + c)}{idx}", v)
        for c, v in enumerate(values)
        if v is not None
    )
    return f'<row r="{idx}">{cells}</row>'


def build(path: str) -> None:
    rows = JUNK_ROWS + [HEADER] + DATA_ROWS
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
        + "".join(_row(i + 1, r) for i, r in enumerate(rows))
        + "</sheetData></worksheet>"
    )
    parts = {
        "[Content_Types].xml": (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
            'content-types">'
            '<Default Extension="rels" ContentType="application/vnd.'
            'openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/'
            'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
            'worksheet+xml"/>'
            "</Types>"
        ),
        "_rels/.rels": (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
            '2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
            'officeDocument/2006/relationships/officeDocument" '
            'Target="xl/workbook.xml"/>'
            "</Relationships>"
        ),
        "xl/workbook.xml": (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main" xmlns:r="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships">'
            '<sheets><sheet name="Participantes" sheetId="1" r:id="rId1"/>'
            "</sheets></workbook>"
        ),
        "xl/_rels/workbook.xml.rels": (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
            '2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
            'officeDocument/2006/relationships/worksheet" '
            'Target="worksheets/sheet1.xml"/>'
            "</Relationships>"
        ),
        "xl/worksheets/sheet1.xml": sheet,
    }
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as z:
        for name, content in parts.items():
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_STORED
            z.writestr(info, content)


if __name__ == "__main__":
    out = os.path.join(os.path.dirname(__file__), "participants.xlsx")
    build(out)
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")
