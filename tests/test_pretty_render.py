"""Pretty-family renderer unit tests (tools/golden._render_pretty) — layout
pinned by the reference's 00405_pretty_formats / 00476 / 01509 / 01293."""

from __future__ import annotations

from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from tools.golden import _render_pretty

SCHEMA = StructType(
    [StructField("n", IntegerType()), StructField("s", StringType())]
)


def fmt_cell(j, v):
    return str(v)


ROWS = [(1, "a"), (10, "bb")]


def test_pretty_full_grid():
    out = _render_pretty("pretty", ROWS, SCHEMA, fmt_cell, {})
    assert out == [
        "┏━━━━┳━━━━┓",
        "┃ \x1b[1m n\x1b[0m ┃ \x1b[1ms \x1b[0m ┃",
        "┡━━━━╇━━━━┩",
        "│  1 │ a  │",
        "├────┼────┤",
        "│ 10 │ bb │",
        "└────┴────┘",
    ]


def test_pretty_compact_noescapes_names_embedded():
    out = _render_pretty("prettycompactnoescapes", ROWS, SCHEMA, fmt_cell, {})
    assert out == [
        "┌──n─┬─s──┐",
        "│  1 │ a  │",
        "│ 10 │ bb │",
        "└────┴────┘",
    ]


def test_pretty_space():
    out = _render_pretty("prettyspacenoescapes", ROWS, SCHEMA, fmt_cell, {})
    assert out == ["  n   s ", "", "  1   a  ", " 10   bb "]


def test_pretty_blocks_and_max_rows():
    settings = {"max_block_size": "1", "output_format_pretty_max_rows": "1"}
    out = _render_pretty(
        "prettycompactnoescapes", ROWS, SCHEMA, fmt_cell, settings
    )
    assert out == [
        "┌─n─┬─s─┐",
        "│ 1 │ a │",
        "└───┴───┘",
        "  Showed first 1.",
    ]


def test_pretty_ascii_grid_and_null():
    rows = [(None, "x")]
    out = _render_pretty(
        "prettycompactnoescapes", rows, SCHEMA, fmt_cell,
        {"output_format_pretty_grid_charset": "ASCII"},
    )
    assert out == ["+----n-+-s-+", "| NULL | x |", "+------+---+"]


def test_pretty_row_numbers():
    out = _render_pretty(
        "prettycompactnoescapes", ROWS, SCHEMA, fmt_cell,
        {"output_format_pretty_row_numbers": "1"},
    )
    assert out == [
        "   ┌──n─┬─s──┐",
        "1. │  1 │ a  │",
        "2. │ 10 │ bb │",
        "   └────┴────┘",
    ]


def test_pretty_max_value_width_cut():
    out = _render_pretty(
        "prettycompactnoescapes", [(1, "abcdef")], SCHEMA, fmt_cell,
        {"output_format_pretty_max_value_width": "3"},
    )
    assert out == ["┌─n─┬─s───┐", "│ 1 │ abc⋯│", "└───┴─────┘"]
