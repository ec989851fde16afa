"""MySQL-dump INSERT parser → Spark DataFrames (SURVEY.md §2.1 S2).

The reference loads Sakila with 17 multi-row ``INSERT INTO t VALUES``
statements (``sql/sakila-data.sql``); this is the ingest operator that
lets our engine replay the reference's workload on its own data and
check the golden CSVs. Plain Python (runs once on the driver, ~3 MB of
SQL text) — the parsed rows become a ``spark.createDataFrame`` per
table with the declared Sakila schema (SURVEY.md §1.2 type mapping).

Parser scope: exactly the dump dialect Sakila uses — single-quoted
strings with ``\\`` escapes and ``''`` doubling, NULL, numeric literals,
``/*!...*/`` version-gated spans (the conditional GEOMETRY column,
``sql/sakila-data.sql:252``) which we strip.
"""

from __future__ import annotations

import re
from decimal import Decimal
from typing import Any

#: Tables the analytical surface needs (view + q1-q11 reach exactly
#: these, ``queries_shan.sql:15-41``).
SAKILA_TABLES = (
    "category",
    "city",
    "country",
    "customer",
    "address",
    "film",
    "film_category",
    "inventory",
    "payment",
    "rental",
    "actor",
    "film_actor",
    "staff",
    "store",
)

_VERSION_COMMENT = re.compile(r"/\*!\d+ .*?\*/", re.DOTALL)


def _parse_values(text: str, start: int) -> tuple[list[tuple], int]:
    """Parse ``(...),(...),...;`` starting at ``start``; return rows and
    the index just past the terminating ``;``."""
    rows, idx, _terminated = _parse_values_impl(text, start)
    return rows, idx


def _parse_values_impl(
    text: str, start: int
) -> tuple[list[tuple], int, bool]:
    """As :func:`_parse_values`, plus a ``terminated`` flag: True iff
    the parse ended by consuming the statement's ``;`` (as opposed to
    running off the end of ``text``). Byte-range readers use the flag
    to detect a slice that was truncated mid-payload — e.g. by a
    statement-boundary scan fooled by ``INSERT INTO ... VALUES`` text
    inside a quoted value — instead of silently returning partial
    rows."""
    rows: list[tuple] = []
    i, n = start, len(text)
    while i < n:
        while i < n and text[i] in " \n\r\t,":
            i += 1
        if i < n and text[i] == ";":
            return rows, i + 1, True
        assert text[i] == "(", f"expected '(' at {i}: {text[i:i+40]!r}"
        i += 1
        row: list[Any] = []
        token_start = i
        in_str = False
        buf: list[str] = []
        while i < n:
            c = text[i]
            if in_str:
                if c == "\\":
                    esc = text[i + 1]
                    buf.append(
                        {"n": "\n", "t": "\t", "r": "\r", "0": "\0"}.get(esc, esc)
                    )
                    i += 2
                    continue
                if c == "'":
                    if i + 1 < n and text[i + 1] == "'":
                        buf.append("'")
                        i += 2
                        continue
                    in_str = False
                    row.append("".join(buf))
                    buf = []
                    i += 1
                    token_start = None
                    continue
                buf.append(c)
                i += 1
                continue
            if c == "'":
                in_str = True
                buf = []
                i += 1
                continue
            if c in ",)":
                if token_start is not None:
                    tok = text[token_start:i].strip()
                    if tok:
                        row.append(None if tok.upper() == "NULL" else _num(tok))
                if c == ")":
                    i += 1
                    break
                token_start = i + 1
                i += 1
                continue
            if token_start is None and c not in " \n\r\t":
                token_start = i
            i += 1
        rows.append(tuple(row))
    return rows, i, False


def _num(tok: str) -> Any:
    if re.fullmatch(r"-?\d+", tok):
        return int(tok)
    if re.fullmatch(r"-?\d+\.\d+", tok):
        return float(tok)
    if re.fullmatch(r"0[xX][0-9a-fA-F]+", tok):  # BLOB literal (staff.picture)
        return bytes.fromhex(tok[2:])
    return tok  # unquoted keyword (shouldn't occur in this dump)


def parse_dump(path: str, tables: tuple[str, ...] = SAKILA_TABLES) -> dict[str, list[tuple]]:
    """Parse INSERT statements for the requested tables."""
    with open(path, encoding="utf-8") as fh:
        text = fh.read()
    text = _VERSION_COMMENT.sub("", text)
    out: dict[str, list[tuple]] = {t: [] for t in tables}
    consumed = 0  # end of the last parsed statement (past its ';')
    for m in re.finditer(r"INSERT INTO `?(\w+)`? VALUES", text):
        # a match starting inside an already-parsed statement is
        # INSERT-looking text within a quoted value, not a statement —
        # the quote-aware parser consumed it as string content
        if m.start() < consumed:
            continue
        table = m.group(1)
        if table not in out:
            # still advance past this foreign statement so in-string
            # INSERT text inside ITS payload can't spawn a bogus parse
            _, consumed = _parse_values(text, m.end())
            continue
        rows, consumed = _parse_values(text, m.end())
        out[table].extend(rows)
    return out


# --------------------------------------------------------------------------
# Declared schemas (SURVEY.md §1.2/§1.3) for the analytical tables —
# column orders match the dump tuples (with GEOMETRY stripped).
# --------------------------------------------------------------------------

SAKILA_SCHEMAS: dict[str, str] = {
    "category": "category_id int, name string, last_update timestamp",
    "city": "city_id int, city string, country_id int, last_update timestamp",
    "country": "country_id int, country string, last_update timestamp",
    "customer": (
        "customer_id int, store_id int, first_name string, last_name string, "
        "email string, address_id int, active boolean, create_date timestamp, "
        "last_update timestamp"
    ),
    "address": (
        "address_id int, address string, address2 string, district string, "
        "city_id int, postal_code string, phone string, last_update timestamp"
    ),
    "film": (
        "film_id int, title string, description string, release_year int, "
        "language_id int, original_language_id int, rental_duration int, "
        "rental_rate decimal(4,2), length int, replacement_cost decimal(5,2), "
        "rating string, special_features string, last_update timestamp"
    ),
    "film_category": "film_id int, category_id int, last_update timestamp",
    "inventory": (
        "inventory_id int, film_id int, store_id int, last_update timestamp"
    ),
    "payment": (
        "payment_id int, customer_id int, staff_id int, rental_id int, "
        "amount decimal(5,2), payment_date timestamp, last_update timestamp"
    ),
    "rental": (
        "rental_id int, rental_date timestamp, inventory_id int, "
        "customer_id int, return_date timestamp, staff_id int, "
        "last_update timestamp"
    ),
    "actor": "actor_id int, first_name string, last_name string, last_update timestamp",
    "film_actor": "actor_id int, film_id int, last_update timestamp",
    "staff": (
        "staff_id int, first_name string, last_name string, address_id int, "
        "picture binary, email string, store_id int, active boolean, "
        "username string, password string, last_update timestamp"
    ),
    "store": (
        "store_id int, manager_staff_id int, address_id int, last_update timestamp"
    ),
}

_TS_COLS = {"last_update", "create_date", "payment_date", "rental_date", "return_date"}


def _coerce(rows: list[tuple], schema: str) -> list[tuple]:
    from datetime import datetime

    # split on commas outside parentheses ("decimal(4,2)" stays whole)
    fields = [f.strip().split() for f in re.split(r",(?![^()]*\))", schema)]
    coerced = []
    for row in rows:
        vals: list[Any] = []
        for (name, typ), v in zip(fields, row):
            if v is None:
                vals.append(None)
            elif typ == "timestamp":
                vals.append(datetime.strptime(str(v), "%Y-%m-%d %H:%M:%S"))
            elif typ.startswith("decimal"):
                vals.append(Decimal(str(v)))
            elif typ == "int":
                vals.append(int(v))
            elif typ == "boolean":
                vals.append(bool(int(v)))
            elif typ == "binary":
                vals.append(bytes(v) if isinstance(v, (bytes, bytearray)) else bytes(str(v), "utf-8"))
            else:
                vals.append(str(v))
        coerced.append(tuple(vals))
    return coerced


def load_sakila_tables(spark, dump_path: str, register: bool = True):
    """Parse the dump and register each table as a temp view.

    ``film.special_features`` is MySQL's one non-scalar type (a SET,
    ``sql/sakila-schema.sql:149``), stored comma-joined in the dump —
    surfaced as ``special_features_arr ArrayType(StringType)`` next to
    the raw string (SURVEY.md §1.2).
    """
    from pyspark.sql import functions as F

    raw = parse_dump(dump_path)
    dfs = {}
    for table, rows in raw.items():
        schema = SAKILA_SCHEMAS[table]
        df = spark.createDataFrame(_coerce(rows, schema), schema)
        if table == "film":
            df = df.withColumn(
                "special_features_arr",
                F.when(
                    F.col("special_features").isNotNull(),
                    F.split("special_features", ","),
                ),
            )
        dfs[table] = df
        if register:
            df.createOrReplaceTempView(table)
    return dfs
