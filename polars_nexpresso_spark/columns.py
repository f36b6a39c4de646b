"""Column-name utilities: backtick quoting and separator escaping.

The engine's *flat* representation names columns with separator-qualified
hierarchy paths (e.g. ``country.city.id`` — cf. reference
``nexpresso/hierarchical_packer.py:39-40`` for the separator/escape-char
conventions). Spark's column-reference parser treats dots as struct-field
access, so every reference to a literally-dotted column name must go through
:func:`qcol` (backtick quoting). This module also ports the escape /
split / join path state machine (reference ``hierarchical_packer.py:43-81``,
``2264-2337``) — pure Python, engine-agnostic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_SEPARATOR = "."
DEFAULT_ESCAPE_CHAR = "\\"

ROW_ID_COLUMN = "__hier_row_id"
ORDER_TEMP_COLUMN_PREFIX = "__hier_order_"


def quote_name(name: str) -> str:
    """Backtick-quote a column name so Spark treats it as a literal name.

    Backticks inside the name are doubled, per Spark's identifier rules.
    """
    return "`" + name.replace("`", "``") + "`"


def qcol(name: str) -> Column:
    """Reference a top-level column whose name may contain dots/specials."""
    return F.col(quote_name(name))


def with_field(col: Column, field_name: str, value: Column) -> Column:
    """``Column.withField`` with the field name treated literally.

    ``withField`` parses dots as nested paths; quote when the short field
    name itself contains separators or backticks.
    """
    if "." in field_name or "`" in field_name:
        return col.withField(quote_name(field_name), value)
    return col.withField(field_name, value)


def escape_field(
    name: str,
    separator: str = DEFAULT_SEPARATOR,
    escape_char: str = DEFAULT_ESCAPE_CHAR,
) -> str:
    """Escape escape-chars then separators in a field name."""
    escaped = name.replace(escape_char, escape_char + escape_char)
    return escaped.replace(separator, escape_char + separator)


def unescape_field(
    name: str,
    separator: str = DEFAULT_SEPARATOR,
    escape_char: str = DEFAULT_ESCAPE_CHAR,
) -> str:
    """Inverse of :func:`escape_field`."""
    unescaped = name.replace(escape_char + separator, separator)
    return unescaped.replace(escape_char + escape_char, escape_char)


def split_path(
    path: str,
    separator: str = DEFAULT_SEPARATOR,
    escape_char: str = DEFAULT_ESCAPE_CHAR,
) -> list[str]:
    """Split a path on unescaped separators (state machine, escape-aware)."""
    if not path:
        return []
    components: list[str] = []
    current: list[str] = []
    i = 0
    n = len(path)
    while i < n:
        ch = path[i]
        if ch == escape_char and i + 1 < n:
            current.append(path[i + 1])
            i += 2
        elif ch == separator:
            components.append("".join(current))
            current = []
            i += 1
        else:
            current.append(ch)
            i += 1
    components.append("".join(current))
    return components


def join_path(
    components: Sequence[str],
    separator: str = DEFAULT_SEPARATOR,
    escape_char: str = DEFAULT_ESCAPE_CHAR,
) -> str:
    """Join components with the separator, escaping embedded separators."""
    return separator.join(escape_field(c, separator, escape_char) for c in components)
