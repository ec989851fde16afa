"""Sources & sinks (SURVEY.md §2.1).

parquet: the warehouse storage (S3 scans via catalog.load_tables)
csv.py: header/inferSchema CSV source + single-file CSV sink (S5/S6/S8)
mysql_dump.py: INSERT-statement parser for the reference's Sakila dump
               (S2 bulk load — the ingest operator that lets the golden
               replay run the reference's own data)
"""

from .csv import read_csv, write_csv_single
from .mysql_dump import load_sakila_tables, parse_dump

__all__ = ["read_csv", "write_csv_single", "parse_dump", "load_sakila_tables"]
