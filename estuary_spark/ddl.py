"""SQL-string DDL ingestion: parse the DDL statements a binlog-derived
feed delivers as text and lower them onto the engine's structured
table-level operations.

The reference parses MySQL DDL with a full ANTLR grammar
(``MysqlParser.g4`` ~797 lines) into typed ``SchemaChange`` ops
(``SchemaChange.java:70-110``, ``mysql/schema/Parser.scala:29-64`` in
/root/reference) and applies them to its schema holder. This engine's
native surface is already structured (truncate/drop events, additive
``evolve_schema`` — SURVEY.md §7.5), but a real Canal/Debezium/Maxwell
feed carries DDL as SQL text in a query event; this module is the shim
from that text to the structured ops, covering the statements a CDC
pipeline must act on:

* ``ALTER TABLE t ADD COLUMN c TYPE [, ADD COLUMN ...]`` → additive
  schema evolution (column masked NULL for events at/below the DDL's LSN
  — pre-DDL binlog rows physically had no such column, so any value a
  connector back-fills there is noise; this also makes replay
  batch-boundary-independent, see multi.py).
* ``TRUNCATE [TABLE] t`` → the structured truncate op (empty fenced
  snapshot).
* ``DROP TABLE [IF EXISTS] t`` → the structured logical drop.
* ``RENAME TABLE a TO b`` / ``ALTER TABLE a RENAME [TO|AS] b`` → the
  destination table directory moves so existing data follows the rename;
  subsequent events arrive under the new source name and route there.
* ``ALTER TABLE t MODIFY|CHANGE COLUMN ...`` → parsed and surfaced as a
  ``modify_column`` op; the engine deliberately does NOT rewrite data on
  type changes — per-batch schema reconciliation handles them under the
  ``on_type_change`` policy (fail/cast, apply.py) when the DATA changes
  type, which is the observable event that matters.

Statements are parsed with anchored regexes, not a grammar: the goal is
the operational subset above with MySQL-style quoting (backticks),
qualified names (``db.tb``), and common type spellings — unknown
statements return ``op='unsupported'`` so callers can log-and-skip
rather than crash the pipeline (the reference likewise ignores DDL kinds
its SchemaChange enum lacks)."""

from __future__ import annotations

import re

from pyspark.sql import types as T

# MySQL type name -> Spark type. Parameterized char/text widths all map to
# string (parquet has no fixed-width strings); integer display widths are
# ignored, as the reference's schema holder does.
_TYPE_MAP = {
    "tinyint": T.IntegerType(),
    "smallint": T.IntegerType(),
    "mediumint": T.IntegerType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "bigint": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "real": T.DoubleType(),
    "bit": T.BooleanType(),
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "char": T.StringType(),
    "varchar": T.StringType(),
    "tinytext": T.StringType(),
    "text": T.StringType(),
    "mediumtext": T.StringType(),
    "longtext": T.StringType(),
    "json": T.StringType(),
    "enum": T.StringType(),
    "date": T.DateType(),
    "datetime": T.TimestampType(),
    "timestamp": T.TimestampType(),
    "time": T.StringType(),
    "blob": T.BinaryType(),
    "tinyblob": T.BinaryType(),
    "mediumblob": T.BinaryType(),
    "longblob": T.BinaryType(),
    "binary": T.BinaryType(),
    "varbinary": T.BinaryType(),
}

_IDENT = r"`?([A-Za-z0-9_$.]+)`?"
_TYPE = r"([A-Za-z]+(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)"

_TRUNCATE = re.compile(rf"^\s*TRUNCATE\s+(?:TABLE\s+)?{_IDENT}\s*;?\s*$", re.I)
_DROP = re.compile(
    rf"^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?{_IDENT}\s*;?\s*$", re.I
)
_RENAME = re.compile(
    rf"^\s*RENAME\s+TABLE\s+{_IDENT}\s+TO\s+{_IDENT}\s*;?\s*$", re.I
)
_ALTER_RENAME = re.compile(
    rf"^\s*ALTER\s+TABLE\s+{_IDENT}\s+RENAME\s+(?:TO\s+|AS\s+)?{_IDENT}\s*;?\s*$", re.I
)
_ALTER = re.compile(rf"^\s*ALTER\s+TABLE\s+{_IDENT}\s+(.*?)\s*;?\s*$", re.I | re.S)
_ADD_COL = re.compile(
    rf"^ADD\s+(?:COLUMN\s+)?(?:IF\s+NOT\s+EXISTS\s+)?{_IDENT}\s+{_TYPE}"
    r"(?:\s+(?:NOT\s+NULL|NULL|DEFAULT\s+\S+|COMMENT\s+'[^']*'|AFTER\s+\S+|FIRST))*\s*$",
    re.I,
)
_MODIFY_COL = re.compile(
    rf"^(?:MODIFY|CHANGE)\s+(?:COLUMN\s+)?{_IDENT}\b", re.I
)
_DECIMAL = re.compile(r"^\s*(decimal|numeric)\s*\(\s*(\d+)\s*(?:,\s*(\d+))?\s*\)\s*$", re.I)


def _map_type(raw: str) -> T.DataType:
    m = _DECIMAL.match(raw)
    if m:
        return T.DecimalType(int(m.group(2)), int(m.group(3) or 0))
    base = re.match(r"\s*([A-Za-z]+)", raw)
    name = (base.group(1) if base else raw).lower()
    if name in ("decimal", "numeric"):
        return T.DecimalType(10, 0)
    return _TYPE_MAP.get(name, T.StringType())


def _split_alter_clauses(body: str) -> list[str]:
    """Split an ALTER body on top-level commas (commas inside parens —
    type params — don't split)."""
    out, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return [c for c in out if c]


def parse_ddl(sql: str) -> dict:
    """Parse one DDL statement into a structured op dict.

    Returns one of::

        {"op": "truncate",      "table": t}
        {"op": "drop_table",    "table": t}
        {"op": "rename_table",  "table": a, "to": b}
        {"op": "add_column",    "table": t,
         "columns": [(name, pyspark DataType), ...]}
        {"op": "modify_column", "table": t, "column": c}
        {"op": "unsupported",   "sql": sql}

    Never raises on malformed input — a poison DDL statement must not
    kill the pipeline (callers log-and-skip ``unsupported``)."""
    if not sql or not sql.strip():
        return {"op": "unsupported", "sql": sql}
    m = _TRUNCATE.match(sql)
    if m:
        return {"op": "truncate", "table": m.group(1)}
    m = _DROP.match(sql)
    if m:
        return {"op": "drop_table", "table": m.group(1)}
    m = _RENAME.match(sql)
    if m:
        return {"op": "rename_table", "table": m.group(1), "to": m.group(2)}
    m = _ALTER_RENAME.match(sql)
    if m:
        return {"op": "rename_table", "table": m.group(1), "to": m.group(2)}
    m = _ALTER.match(sql)
    if m:
        table, body = m.group(1), m.group(2)
        cols: list[tuple[str, T.DataType]] = []
        for clause in _split_alter_clauses(body):
            am = _ADD_COL.match(clause)
            if am:
                cols.append((am.group(1), _map_type(am.group(2))))
                continue
            mm = _MODIFY_COL.match(clause)
            if mm:
                return {"op": "modify_column", "table": table, "column": mm.group(1)}
        if cols:
            return {"op": "add_column", "table": table, "columns": cols}
    return {"op": "unsupported", "sql": sql}
