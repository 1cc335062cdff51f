#!/usr/bin/env python3
"""Convert the reference's Stocks.xlsx dim sheet to stocks_dim.parquet.

Makes the SURVEY S1 lineage reproducible from the repo: the reference
reads the wide company->ticker sheet directly
(intra_day_arbitrage.ipynb:188, pandas.read_excel); the Spark engine
pre-converts it to parquet per SURVEY S1 (no xlsx datasource in a stock
Spark distribution) and scans it with Tables/queries.Relational S1.

Dependency-free xlsx reader: an .xlsx is a zip of XML, and the dim sheet
only uses shared strings + inline numbers, so stdlib zipfile +
xml.etree suffice (the sandbox ships no openpyxl). Output schema matches
graft.RefFixtureGen's synthetic dim: a string `Company` column plus one
sparse string column per exchange, one row per company.

Usage:
    python3 tools/xlsx_to_parquet.py /root/reference/Stocks.xlsx /tmp/out
    # -> /tmp/out/stocks_dim.parquet
"""
import re
import sys
import xml.etree.ElementTree as ET
import zipfile

NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def read_sheet(path):
    """Return the first worksheet as a list of rows (lists of str|None)."""
    with zipfile.ZipFile(path) as z:
        shared = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.iter(f"{NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{NS}t")))
        sheet_name = sorted(n for n in z.namelist()
                            if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n))[0]
        root = ET.fromstring(z.read(sheet_name))

    def col_index(ref):  # "BC12" -> 0-based column 54
        letters = re.match(r"[A-Z]+", ref).group(0)
        i = 0
        for ch in letters:
            i = i * 26 + (ord(ch) - 64)
        return i - 1

    rows = []
    for row in root.iter(f"{NS}row"):
        cells = {}
        for c in row.iter(f"{NS}c"):
            ref, typ = c.get("r"), c.get("t")
            v = c.find(f"{NS}v")
            if typ == "inlineStr":
                text = "".join(t.text or "" for t in c.iter(f"{NS}t"))
            elif v is None:
                text = None
            elif typ == "s":
                text = shared[int(v.text)]
            else:
                text = v.text
            if text is not None and text != "":
                cells[col_index(ref)] = text
        width = max(cells) + 1 if cells else 0
        rows.append([cells.get(i) for i in range(width)])
    return rows


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/Stocks.xlsx"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stocks_dim_out"
    rows = read_sheet(src)
    header, body = rows[0], rows[1:]
    # headerless spacer columns get pandas.read_excel's names, so the
    # parquet matches what the reference notebook actually sees
    header = [h if h is not None else f"Unnamed: {i}"
              for i, h in enumerate(header)]
    width = len(header)
    # pad ragged rows to the header width (trailing empty cells are omitted
    # from the xml), keep only non-empty rows
    table = {h: [] for h in header}
    n = 0
    for r in body:
        if not any(r):
            continue
        padded = (r + [None] * width)[:width]
        for h, v in zip(header, padded):
            table[h].append(v)
        n += 1

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pathlib
    pathlib.Path(out_dir).mkdir(parents=True, exist_ok=True)
    out = f"{out_dir}/stocks_dim.parquet"
    pq.write_table(
        pa.table({h: pa.array(vs, type=pa.string()) for h, vs in table.items()}),
        out)
    print(f"{out}: {n} rows x {width} cols ({', '.join(header)})")


if __name__ == "__main__":
    main()
