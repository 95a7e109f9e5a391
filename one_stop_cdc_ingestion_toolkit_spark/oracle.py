"""Driver-style result comparison against the DuckDB oracle.

Mirrors the harness contract (/root/repo/__spark_entry__.py docstring):
row count + column-name set + order-insensitive value hash, where columns
are sorted by name and cells normalized (ints widened, temporals → ISO,
Decimals collapsed, floats via repr).
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import math


def norm_cell(v: object, side: str = "spark") -> str:
    """Driver-faithful cell rendering (r1 forensics): the driver's compare
    keeps Spark DECIMAL as ``decimal.Decimal`` (scale-preserving str,
    '126074.00') but DuckDB DECIMAL/HUGEINT collapse to float64
    ('126074.0'). Emulating that asymmetry here means a query whose output
    types are ambiguous fails locally exactly as it would at the driver;
    tests/test_output_types.py bans such types outright."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v) if side == "spark" else repr(float(v))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def _esc(s: str) -> str:
    """Escape the join/line separators inside a cell: without this,
    cells containing '|' or newlines could make two DIFFERENT tables
    serialize to identical bytes — a false PASS in a correctness gate
    (review r7). Escaping applies identically to both sides, so a true
    match still hashes equal; only a masked divergence becomes visible."""
    return s.replace("\\", "\\\\").replace("|", "\\p").replace("\n", "\\n")


def _norm_lines(cols: list[str], rows: list[tuple], side: str) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        "|".join(_esc(norm_cell(row[i], side)) for i in order) for row in rows
    )


def table_hash(cols: list[str], rows: list[tuple], side: str = "spark") -> str:
    """Order-insensitive: row strings are sorted before hashing, so a
    query whose ORDER BY is only a partial order cannot flake on
    tie-ordering differences between engines."""
    h = hashlib.md5()
    for line in _norm_lines(cols, rows, side):
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def compare(
    scols: list[str],
    srows: list[tuple],
    dcols: list[str],
    drows: list[tuple],
    max_diffs: int = 3,
) -> list[str]:
    """Return a list of problems (empty = match)."""
    problems: list[str] = []
    if len(srows) != len(drows):
        problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
    if sorted(scols) != sorted(dcols):
        problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
    if problems:
        return problems
    slines = _norm_lines(scols, srows, "spark")
    dlines = _norm_lines(dcols, drows, "duck")
    if slines != dlines:
        problems.append("value hash mismatch")
        # diff the SORTED multisets — the hash is order-insensitive, so
        # a positional zip over collect order flagged rows that differ
        # only by position and could miss the real divergence (review r7)
        dset, sset = set(dlines), set(slines)
        only_s = [ln for ln in slines if ln not in dset]
        only_d = [ln for ln in dlines if ln not in sset]
        for ln in only_s[:max_diffs]:
            problems.append(f"only in spark: {ln}")
        for ln in only_d[:max_diffs]:
            problems.append(f"only in duck:  {ln}")
        if not only_s and not only_d:
            # same value multiset, different multiplicities
            problems.append("same values, different row multiplicities")
    return problems


def duck_connect(sf_dir: str, tables: tuple[str, ...] | None = None):
    """DuckDB connection with the driver's parquet views registered —
    THE single definition of the oracle-side table setup (it was
    hand-copied in bench.py, tools/verify_oracle.py and two test
    fixtures; a drifted copy would make the gates verify different
    table sets, review r7)."""
    import os

    import duckdb

    from one_stop_cdc_ingestion_toolkit_spark.catalog import TABLES

    con = duckdb.connect()
    for t in tables or TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{p}')"
            )
    return con
