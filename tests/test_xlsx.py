"""S5 — multi-sheet Excel ingestion on the stdlib OOXML parser
(sources/xlsx.py): writer↔reader round-trip, shared-string decoding,
the reference's first-6-column BA projection, and the parsed BA sheet
feeding clean_hourly's semi-join (EIA930PipelineHourlyData.py:33-34,
96-108)."""

from __future__ import annotations

import zipfile

import pytest

from batch_processing_etl_orchestration_spark.pipelines.eia930 import clean_hourly
from batch_processing_etl_orchestration_spark.sources.files import read_excel_sheets
from batch_processing_etl_orchestration_spark.sources.xlsx import (
    _col_index,
    _col_ref,
    read_workbook,
    write_workbook,
)

BA_HEADER = [
    "BA Code", "BA Name", "Time Zone", "Region", "Active", "Generation Only",
    "Demand by BA Subregion", "U.S. BA",  # >6 cols: projection must drop these
]
BA_ROWS = [
    ["AEC", "PowerSouth Energy", "Central", "SE", "Yes", False, None, "Yes"],
    ["AZPS", "Arizona Public Service", "Arizona", "SW", "Yes", False, None, "Yes"],
    ["CISO", "California ISO", "Pacific", "CAL", "Yes", True, "Yes", "Yes"],
]
ES_HEADER = ["Code", "Energy Source", "Share"]
ES_ROWS = [["NG", "Natural gas", 0.397], ["SUN", "Solar", 0.058]]


@pytest.fixture(scope="module")
def workbook(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("xlsx") / "reference_tables.xlsx")
    write_workbook(
        path,
        {"BAs": [BA_HEADER] + BA_ROWS, "Energy Sources": [ES_HEADER] + ES_ROWS},
    )
    return path


def test_col_ref_round_trip():
    for idx in [0, 1, 25, 26, 27, 51, 52, 701, 702, 16383]:
        assert _col_index(f"{_col_ref(idx)}1") == idx


def test_round_trip_grids(workbook):
    grids = read_workbook(workbook)
    assert list(grids) == ["BAs", "Energy Sources"]
    assert grids["BAs"] == [BA_HEADER] + BA_ROWS
    assert grids["Energy Sources"] == [ES_HEADER] + ES_ROWS


def test_missing_sheet_raises(workbook):
    with pytest.raises(KeyError, match="Nope"):
        read_workbook(workbook, ["Nope"])


def test_quoted_sheet_name_round_trips(tmp_path):
    """Sheet names land in an XML attribute — a double quote must be
    escaped as &quot; or workbook.xml is malformed."""
    path = str(tmp_path / "quoted.xlsx")
    name = 'My "Q1" & <Final> Sheet'
    write_workbook(path, {name: [["h"], ["v"]]})
    grids = read_workbook(path)
    assert list(grids) == [name]
    assert grids[name] == [["h"], ["v"]]


def test_control_chars_stripped_from_cells(tmp_path):
    """XML 1.0 cannot represent most C0 controls even escaped; the
    writer strips them (keeping tab/newline) instead of emitting an
    unparseable part."""
    path = str(tmp_path / "ctrl.xlsx")
    write_workbook(path, {"S": [["a\x00b\x07c\td\ne"]]})
    assert read_workbook(path)["S"] == [["abc\td\ne"]]


def test_shared_strings_and_sparse_cells(tmp_path):
    """Hand-built part set exercising what our writer doesn't emit:
    a sharedStrings table (t="s"), skipped cells, and a skipped row."""
    path = str(tmp_path / "shared.xlsx")
    write_workbook(path, {"S": [["x"]]})  # scaffold parts, then overwrite
    with zipfile.ZipFile(path, "a") as zf:
        zf.writestr(
            "xl/sharedStrings.xml",
            '<?xml version="1.0"?><sst xmlns='
            '"http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            "<si><t>alpha</t></si><si><r><t>be</t></r><r><t>ta</t></r></si></sst>",
        )
        zf.writestr(
            "xl/worksheets/sheet1.xml",
            '<?xml version="1.0"?><worksheet xmlns='
            '"http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
            '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="C1" t="s"><v>1</v></c></row>'
            '<row r="3"><c r="B3"><v>7</v></c></row>'
            "</sheetData></worksheet>",
        )
    grid = read_workbook(path, ["S"])["S"]
    assert grid == [["alpha", None, "beta"], [None, 7, None]]


def test_read_excel_sheets_schema_and_projection(spark, workbook):
    frames = read_excel_sheets(spark, workbook, ["BAs", "Energy Sources"], max_cols=6)
    bas = frames["BAs"]
    assert bas.columns == BA_HEADER[:6]  # .iloc[:, :6] parity
    types = dict(bas.dtypes)
    assert types["BA Code"] == "string"
    assert types["Generation Only"] == "boolean"
    assert bas.count() == 3
    es = frames["Energy Sources"]
    assert dict(es.dtypes)["Share"] == "double"
    assert es.where("Code = 'SUN'").first()["Share"] == 0.058


def test_ba_sheet_feeds_clean_hourly(spark, workbook):
    """The parsed BAs sheet is the J1 semi-join dimension: bronze rows
    whose respondent is not a known BA code must drop, rows past the
    retention cutoff must trim."""
    ba_dim = (
        read_excel_sheets(spark, workbook, ["BAs"], max_cols=6)["BAs"]
        .withColumnRenamed("BA Code", "ba_code")
    )
    raw = spark.createDataFrame(
        [
            ("2024-01-05T10", "CISO", None, "D", "101.5"),
            ("2024-01-05T11", None, "AZPS", "NG", "55"),   # fromba fallback
            ("2024-01-05T12", "ZZZZ", None, "D", "9"),     # unknown BA → dropped
            ("2024-01-09T00", "CISO", None, "D", "1"),     # past cutoff → trimmed
        ],
        "period STRING, respondent STRING, fromba STRING, type STRING, value STRING",
    )
    out = clean_hourly(raw, ba_dim, cutoff_ts="2024-01-08 00:00:00")
    rows = {r["respondent"]: r["value"] for r in out.collect()}
    assert rows == {"CISO": 101.5, "AZPS": 55.0}


# ---------------------------------------------------------------------------
# Property: writer→reader round-trip over arbitrary typed grids
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

_cell = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(10**12), max_value=10**12),
    st.floats(allow_nan=False, allow_infinity=False, width=64).filter(
        lambda x: x != 0 or str(x)[0] != "-"  # exclude -0.0 (== 0.0 but repr-differs)
    ),
    st.text(
        alphabet=st.characters(
            codec="utf-8", categories=("L", "N", "P", "S", "Zs")
        ),
        min_size=1,
        max_size=20,
    ),
)


def _normalize_widths(grid):
    """Sheet XML stores cells sparsely: fully-empty trailing COLUMNS
    are unrepresentable, so the round-trip contract pads/truncates
    every row to the grid's last non-None column. Empty ROWS survive
    (their <row> elements are written); a grid with no cells at all
    reads back as []."""
    width = 0
    for row in grid:
        for i in range(len(row) - 1, -1, -1):
            if row[i] is not None:
                width = max(width, i + 1)
                break
    if width == 0:
        return []
    return [list(row[:width]) + [None] * (width - len(row)) for row in grid]


@settings(max_examples=40, deadline=None)
@given(
    grid=st.lists(
        st.lists(_cell, min_size=1, max_size=6), min_size=1, max_size=8
    )
)
def test_write_read_round_trip_property(tmp_path_factory, grid):
    path = str(tmp_path_factory.mktemp("xlsx_prop") / "wb.xlsx")
    write_workbook(path, {"S": grid})
    got = read_workbook(path, ["S"])["S"]
    assert got == _normalize_widths(grid)
